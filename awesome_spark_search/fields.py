"""Field/zone-weighted retrieval — the reference's ContentType weights
(Title 0.5 / Abstract 0.25 / Claims 0.15 / Description 0.1,
ref: src/postings/ContentType.java:6-9; applied per field in
src/querying/ranking/DocumentRanker.java:138-167).

The code corpus collapses to one ``content`` field, but the engine keeps the
reference's multi-field capability: each field tokenizes independently, the
posting table carries a ``field`` column, per-field lengths/avgdl feed a
weighted-sum-of-BM25 scorer:

    score(d) = sum_f w_f * sum_t idf(t) * tfnorm_{t,d,f}

idf is field-independent (df = docs containing t in ANY field — the
reference's seek is also per-term, not per-(term,field)).

All the same scale properties as build.py: one narrow tokenize pass per
field, no (term, doc) shuffle, salted term stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import K1, B, term_bucket_col, DEFAULT_TERM_BUCKETS
from .scoring import idf_col
from .textproc import doc_postings_flat, doc_len_col

# The reference's exact patent-zone weighting, pinned as a preset
# (ref: src/postings/ContentType.java:6-9 — Title 0.5, Abstract 0.25,
# Claims 0.15, Description 0.1). Pass as BOTH field_cols and field_weights
# to reproduce the reference's four-zone ranking over a corpus with those
# columns; the golden in tests/test_fields.py pins the resulting scores.
REFERENCE_ZONES: dict[str, float] = {
    "title": 0.5,
    "abstract": 0.25,
    "claims": 0.15,
    "description": 0.1,
}


def build_fielded_postings(
    source_df: DataFrame,
    field_cols: dict[str, float],
    *,
    do_stem: bool = False,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (postings, field_lens, term_stats) for a multi-field corpus.

    postings:   (field, doc_id, term, tf, positions, term_bucket)
    field_lens: (doc_id, field, doc_len) — stopword-inclusive per field
    term_stats: (term, df, cf, term_bucket) — df over docs (any field)
    """
    parts = []
    for col in field_cols:
        p = doc_postings_flat(
            source_df.select("doc_id", F.col(col).alias("content")),
            do_stem=do_stem,
        ).withColumn("field", F.lit(col))
        parts.append(p)
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)
    postings = postings.withColumn(
        "term_bucket", term_bucket_col(F.col("term"), n_term_buckets)
    )
    # per-field lengths over ALL docs (pure JVM; a doc with only stopwords
    # in a field still contributes its stopword-inclusive length to avgdl)
    len_parts = [
        source_df.select(
            "doc_id", F.lit(col).alias("field"), doc_len_col(col).alias("doc_len")
        )
        for col in field_cols
    ]
    field_lens = len_parts[0]
    for p in len_parts[1:]:
        field_lens = field_lens.unionByName(p)
    term_stats = (
        postings.groupBy("term", F.pmod(F.col("doc_id"), F.lit(16)).alias("_s"))
        .agg(
            F.countDistinct("doc_id").alias("pdf"),
            F.sum("tf").alias("pcf"),
        )
        .groupBy("term")
        .agg(F.sum("pdf").alias("df"), F.sum("pcf").alias("cf"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))
    )
    return postings, field_lens, term_stats


def fielded_bm25_topk(
    spark: SparkSession,
    postings: DataFrame,
    field_lens: DataFrame,
    term_stats: DataFrame,
    field_weights: dict[str, float],
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Weighted-per-field BM25 top-k: (doc_id, score)."""
    stats = field_lens.groupBy("field").agg(
        F.avg("doc_len").alias("avgdl")
    )
    n_docs = field_lens.select("doc_id").distinct().count()
    w_map = F.create_map(
        *[x for f, w in sorted(field_weights.items()) for x in (F.lit(f), F.lit(float(w)))]
    )
    matched = (
        postings.filter(F.col("term").isin(terms))
        .select("field", "doc_id", "term", "tf")
        .join(F.broadcast(term_stats.filter(F.col("term").isin(terms)).select("term", "df")), "term")
        .join(field_lens, ["doc_id", "field"])
        .join(F.broadcast(stats), "field")
    )
    tfnorm = F.col("tf") / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.col("avgdl"))
    )
    contrib = w_map[F.col("field")] * idf_col(F.col("df"), n_docs) * tfnorm
    return (
        matched.groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
