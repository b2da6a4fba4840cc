"""Packed citation adjacency: delta+VByte round-trip and LinkTo parity
(ref storage analog: src/indexing/citations/CitationIndexConstructor.java:
64-74 writes each target's sorted citing list gap+varint-encoded)."""

import numpy as np
from pyspark.sql import functions as F

from awesome_spark_search.pagerank import (
    citations_of,
    citations_of_packed,
    invert_citations,
    pack_citations,
    unpack_citations,
)


def _edges(spark, n_docs=60, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [int(x) for x in rng.choice(n_docs, rng.integers(0, 6), replace=False)])
        for i in range(n_docs)
    ]
    return invert_citations(
        spark.createDataFrame(rows, "doc_id long, out array<long>")
    )


def test_pack_unpack_roundtrip(spark):
    edges = _edges(spark).persist()
    packed = pack_citations(edges, shard_size=16)  # small shard: multi-row dsts
    got = {(r["src"], r["dst"]) for r in unpack_citations(packed).collect()}
    want = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == want
    # shard bound holds
    assert all(r["n"] <= 16 for r in packed.collect())


def test_linkto_off_packed_matches_edge_filter(spark):
    edges = _edges(spark).persist()
    packed = pack_citations(edges, shard_size=16)
    for target in (0, 7, 42):
        a = [r["doc_id"] for r in citations_of_packed(packed, target).collect()]
        b = [r["doc_id"] for r in citations_of(edges, target).collect()]
        assert a == b
