"""Citation graph operators: edge inversion + PageRank as iterative DataFrame
algebra.

Reference: inverse citation index (ref: src/indexing/citations/
CitationIndexConstructor.java:44-78) and power-iteration PageRank with
damping 0.85, 45 fixed iterations, dangling + damping mass (1-d)/n
(ref: src/querying/ranking/PageRankCalculator.java:23-28,53-82). The reference
computes pagerank but never uses it in scoring (DocumentRanker.java:138-146) —
the rebuild keeps that contract: pagerank is a stored doc_map column only.

Scale: each iteration is one join edges⋈ranks + one groupBy(dst) — the
canonical distributed PageRank. localCheckpoint() every few iterations cuts
the lineage chain so the plan doesn't grow with iteration count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DAMPING = 0.85
ITERATIONS = 45
CHECKPOINT_EVERY = 5
CITATION_SHARD_SIZE = 1 << 20  # citing-src ids per packed row (bounds rows)


def invert_citations(out_links: DataFrame) -> DataFrame:
    """(doc_id, out:array<long>) -> sorted distinct edge list (src, dst)."""
    return (
        out_links.select(F.col("doc_id").alias("src"), F.explode("out").alias("dst"))
        .distinct()
    )


def citations_of(edges: DataFrame, target: int) -> DataFrame:
    """Docs citing `target`, descending doc_id (recency ordering,
    ref: QueryProcessor.java:314-319 + DocumentRanker.java:105-114)."""
    return (
        edges.filter(F.col("dst") == target)
        .select(F.col("src").alias("doc_id"))
        .orderBy(F.col("doc_id").desc())
    )


def pack_citations(
    edges: DataFrame, shard_size: int = CITATION_SHARD_SIZE
) -> DataFrame:
    """Delta+VByte-packed per-target citing lists — the storage parity of the
    reference's compressed citation index (ref: src/indexing/citations/
    CitationIndexConstructor.java:64-74 writes each target's sorted citing
    ids as gap+varint), keyed (dst, src_shard) so one hub cited by 10^9 docs
    still packs into bounded rows (same sharding rationale as postings).

    Returns (dst, src_shard, n, srcs_vb). collect_set state is bounded by
    shard_size; the varint encode is one Arrow-batched pass."""
    sharded = edges.withColumn(
        "src_shard", (F.col("src") / F.lit(shard_size)).cast("long")
    )
    grouped = sharded.groupBy("dst", "src_shard").agg(
        F.sort_array(F.collect_set("src")).alias("_srcs")
    )

    @F.pandas_udf(T.BinaryType())
    def enc(srcs: pd.Series) -> pd.Series:
        from awesome_spark_search import codec as _c

        return srcs.map(
            lambda a: _c.delta_vbyte_encode(np.asarray(a, dtype=np.int64))
        )

    return grouped.select(
        "dst", "src_shard", F.size("_srcs").alias("n"), enc("_srcs").alias("srcs_vb")
    )


def unpack_citations(packed: DataFrame) -> DataFrame:
    """Packed citing lists -> (src, dst) edge rows (round-trip inverse of
    pack_citations; the external gate for the citation codec)."""
    from . import codec

    def gen(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                srcs = codec.delta_vbyte_decode(bytes(r["srcs_vb"]))
                yield pd.DataFrame(
                    {"src": srcs.astype(np.int64), "dst": int(r["dst"])}
                )

    return packed.mapInPandas(gen, "src long, dst long")


def citations_of_packed(packed: DataFrame, target: int) -> DataFrame:
    """LinkTo served off the PACKED citation index: dst-filter prunes to the
    target's few rows before any decode; per-row decode is one varint pass."""
    return (
        unpack_citations(packed.filter(F.col("dst") == target))
        .select(F.col("src").alias("doc_id"))
        .orderBy(F.col("doc_id").desc())
    )


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    n_docs: int,
    *,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    doc_ids: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, pagerank). Column-stochastic power iteration matching the
    reference: rank = (1-d)/n + d * (M @ rank + dangling_mass/n)."""
    if doc_ids is None:
        doc_ids = (
            edges.select(F.col("src").alias("doc_id"))
            .unionByName(edges.select(F.col("dst").alias("doc_id")))
            .distinct()
        )
    doc_ids = doc_ids.persist()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e = edges.join(out_deg, "src").persist()

    ranks = doc_ids.withColumn("rank", F.lit(1.0 / n_docs))
    base = (1.0 - damping) / n_docs
    iterates: list[DataFrame] = []  # persisted intermediates of this interval
    for it in range(iterations):
        # each iteration references `ranks` twice (contrib + dangling); the
        # lazy persist makes the branches share one materialization inside
        # the checkpoint job instead of recomputing the whole interval twice
        ranks = ranks.persist()
        iterates.append(ranks)
        contrib = (
            e.join(ranks, e.src == ranks.doc_id)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass (rank held by nodes with no out-edges) stays IN the
        # plan as a broadcast 1-row aggregate — no per-iteration collect;
        # the only actions are the periodic localCheckpoints below
        dangling = (
            ranks.join(out_deg, ranks.doc_id == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        ranks = (
            doc_ids.join(contrib, doc_ids.doc_id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("_dangling") / F.lit(float(n_docs))
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint()  # one action per interval
            for df in iterates:
                df.unpersist()
            iterates.clear()
    return ranks.select("doc_id", F.col("rank").alias("pagerank"))
