"""Deterministic sampling operators for training-data pipelines.

Everything derives from md5 of the row id — reproducible bit-for-bit across
Spark and the DuckDB oracle (unlike rand(), which can never be oracle-checked,
or xxhash64, which differs between engines), and stable under repartitioning
or re-runs: a row's split assignment is a pure function of its id.

Scale: all pure column expressions (whole-stage codegen), no shuffle beyond
what the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def _id_bucket(id_col):
    """md5(id) -> bucket in [0, BUCKETS) — same arithmetic as the oracle's
    ('0x' || substr(md5(id::varchar),1,8))::bigint % BUCKETS."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def train_test_split(df: DataFrame, id_col: str = "doc_id",
                     test_frac: float = 0.1) -> DataFrame:
    """Adds a deterministic `split` column: 'test' for ~test_frac of rows."""
    cut = int(round(test_frac * BUCKETS))
    return df.withColumn(
        "split",
        F.when(_id_bucket(id_col) < cut, F.lit("test")).otherwise(F.lit("train")),
    )


def deterministic_sample(df: DataFrame, frac: float,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep ~frac of rows, stable across runs/partitioning."""
    cut = int(round(frac * BUCKETS))
    return df.filter(_id_bucket(id_col) < cut)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_frac: float = 0.0,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction (e.g. downsample dominant languages, keep all of rare ones)."""
    cut = F.lit(int(round(default_frac * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == value,
                     F.lit(int(round(frac * BUCKETS)))).otherwise(cut)
    return df.filter(_id_bucket(id_col) < cut)
