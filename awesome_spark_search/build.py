"""Index build pipeline — the Spark-native equivalent of the reference's
index()/compressIndex() (ref: src/SearchEngine/AwesomeSearchEngine.java:326-340,
src/indexing/DocumentIndexer.java:141-173, InvertedIndexMerger.java:34-112).

The reference's shape — per-document posting accumulation, memory-bounded
spill runs, external k-way merge by term — *is* Spark's map/combine/shuffle/
reduce. We express it declaratively and let Catalyst/Tungsten own spilling and
merging; what stays explicit is what the optimizer cannot infer:

* **skew**: hot terms (``import``/``def``-class tokens hit >30% of docs) are
  aggregated two-level — ``groupBy(term, salt)`` partials then a final
  ``groupBy(term)`` — so no single reducer materializes an unbounded state.
* **bounded posting rows**: packed postings are keyed ``(term, doc_shard)``
  where ``doc_shard = doc_id // shard_size``. A term over 10^12 docs never
  produces one giant array row; every row is <= shard_size entries and the
  query side intersects per-shard (embarrassingly parallel WAND).
* **term-bucket layout**: the final index is hash-bucketed on term
  (``term_bucket`` partition column), so a query's term lookup prunes to
  q buckets (the role of the reference's seek list, via partition pruning +
  Parquet min/max stats).

At 100 TB: tokenize is a narrow map (Arrow batches), the single wide shuffle
is groupBy(term, doc_id) with map-side partial aggregation, and every later
stage groups on keys that include doc_shard/term_bucket, keeping state bounded.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from .lineage import StageRunner
from .textproc import tokenized

K1 = 1.2
B = 0.75
DEFAULT_TERM_BUCKETS = 64
DEFAULT_DOC_SHARD_SIZE = 1 << 20  # 1M docs per shard row at scale
DEFAULT_SALT = 16


@dataclass
class IndexStats:
    n_docs: int
    total_tokens: int
    avgdl: float


@dataclass
class Index:
    """The queryable index: a set of DataFrames + tiny driver-side stats.

    Columnar split mirrors the reference's frequency/positional file split
    (ref: src/SearchEngine/AwesomeSearchEngine.java:91-100): ``positions`` is
    its own column, so keyword queries never read it (Parquet column pruning).
    """

    doc_map: DataFrame      # doc_id, repo, path, commit, lang, doc_len, content_sha256
    postings: DataFrame     # term_bucket, term, doc_id, tf, positions
    term_stats: DataFrame   # term_bucket, term, df, cf
    packed: DataFrame       # term_bucket, term, doc_shard, n, doc_ids_vb, tfs_vb, pos_vb, block_max
    stats: IndexStats
    do_stem: bool = True
    build_metrics: list = field(default_factory=list)


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_shard", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("doc_ids_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        T.StructField("pos_vb", T.BinaryType(), False),
        T.StructField("block_max", T.ArrayType(T.DoubleType()), False),
    ]
)


def _pack_group_factory(avgdl: float, n_buckets: int):
    """applyInPandas packer for one (term, doc_shard) group.

    Input rows: term, doc_shard, doc_id, tf, positions(list[int]), doc_len.
    Output: one packed row — delta+VByte docIDs, VByte tfs, positions packed
    as [len, gap...] per doc, block-max array (BM25 tf-norm upper bounds).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["doc_len"].to_numpy(dtype=np.int64)
        # positions: concat [n_pos, gap0(=pos0), gap1...] per doc
        pos_stream: list[int] = []
        for plist in pdf["positions"]:
            arr = np.asarray(plist, dtype=np.int64)
            pos_stream.append(len(arr))
            if len(arr):
                pos_stream.append(int(arr[0]))
                pos_stream.extend(np.diff(arr).tolist())
        term = pdf["term"].iloc[0]
        bucket = _py_term_bucket(term, n_buckets)
        return pd.DataFrame(
            {
                "term_bucket": [bucket],
                "term": [term],
                "doc_shard": [int(pdf["doc_shard"].iloc[0])],
                "n": [len(doc_ids)],
                "doc_ids_vb": [codec.delta_vbyte_encode(doc_ids)],
                "tfs_vb": [codec.vbyte_encode(tfs.astype(np.uint64))],
                "pos_vb": [codec.vbyte_encode(np.asarray(pos_stream, dtype=np.uint64))],
                "block_max": [codec.block_max_scores(tfs, dls, avgdl, K1, B).tolist()],
            }
        )

    return pack


def _py_term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term->bucket hash shared by build (JVM crc32 expression)
    and query (driver-side pruning). CRC32 is identical across zlib and Spark;
    Python's hash() is process-salted and unusable here."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col, n_buckets: int):
    """JVM-side bucket id == _py_term_bucket, pure codegen (no UDF)."""
    return F.pmod(F.crc32(F.encode(term_col, "UTF-8")), F.lit(n_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    source_df: DataFrame,
    *,
    do_stem: bool = True,
    checkpoint_dir: str | None = None,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
    doc_shard_size: int = DEFAULT_DOC_SHARD_SIZE,
    salt: int = DEFAULT_SALT,
    build_packed: bool = True,
    cache: bool = True,
) -> Index:
    """Build the full index from a source table.

    ``source_df`` must carry (doc_id, content) and may carry
    (repo, path, commit, lang). ``checkpoint_dir`` enables stage-resumable
    materialization (see lineage.py); None keeps everything lazy/cached
    (test mode — same plan shapes).
    """
    runner = StageRunner(spark, checkpoint_dir)
    meta_cols = [c for c in ("repo", "path", "commit", "lang") if c in source_df.columns]

    toks = runner.run(
        "tokens",
        lambda: tokenized(source_df.select("doc_id", "content", *meta_cols), do_stem=do_stem)
        .select("doc_id", "n_tokens", "term", "pos"),
    )

    def _doc_map():
        lens = toks.groupBy("doc_id").agg(F.first("n_tokens").alias("doc_len"))
        return (
            source_df.select(
                "doc_id",
                *meta_cols,
                F.sha2(F.col("content"), 256).alias("content_sha256"),
            )
            .join(lens, "doc_id", "left")
            .na.fill({"doc_len": 0})
        )

    doc_map = runner.run("doc_map", _doc_map)

    def _postings():
        return (
            toks.filter(F.col("term").isNotNull())
            .groupBy("term", "doc_id")
            .agg(
                F.count(F.lit(1)).cast("int").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
            .withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))
        )

    postings = runner.run("postings", _postings, partition_by=["term_bucket"])
    if cache and checkpoint_dir is None:
        postings = postings.persist()

    def _term_stats():
        # two-level salted aggregation: partials on (term, salt) bound any
        # single reducer's input even for a term present in most documents
        partial = (
            postings.groupBy("term", F.pmod(F.col("doc_id"), F.lit(salt)).alias("_salt"))
            .agg(F.count(F.lit(1)).alias("pdf"), F.sum("tf").alias("pcf"))
        )
        return (
            partial.groupBy("term")
            .agg(F.sum("pdf").alias("df"), F.sum("pcf").alias("cf"))
            .withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))
        )

    term_stats = runner.run("term_stats", _term_stats, partition_by=["term_bucket"])

    def _stats_df():
        return doc_map.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("doc_len"), F.lit(0)).alias("total_tokens"),
            F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("avgdl"),
        )

    stats_row = runner.run("stats", _stats_df).collect()[0]
    stats = IndexStats(
        n_docs=stats_row["n_docs"],
        total_tokens=stats_row["total_tokens"],
        avgdl=float(stats_row["avgdl"]) or 1.0,
    )

    packed = None
    if build_packed:
        def _packed():
            with_len = (
                postings.withColumn(
                    "doc_shard", (F.col("doc_id") / F.lit(doc_shard_size)).cast("long")
                )
                .join(doc_map.select("doc_id", "doc_len"), "doc_id")
            )
            return with_len.groupBy("term", "doc_shard").applyInPandas(
                _pack_group_factory(stats.avgdl, n_term_buckets), PACKED_SCHEMA
            )

        packed = runner.run("packed", _packed, partition_by=["term_bucket"])

    if cache and checkpoint_dir is None:
        doc_map = doc_map.persist()
        term_stats = term_stats.persist()

    return Index(
        doc_map=doc_map,
        postings=postings,
        term_stats=term_stats,
        packed=packed,
        stats=stats,
        do_stem=do_stem,
        build_metrics=runner.metrics,
    )
