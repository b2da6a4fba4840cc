"""Edge cases: empty/null/stopword-only documents, a term present in every
document (worst-case skew), single-doc corpus."""

import pytest
from pyspark.sql import functions as F

from awesome_spark_search.build import build_index
from awesome_spark_search.executor import QueryExecutor


def _build(spark, rows, **kw):
    src = spark.createDataFrame(rows, "doc_id long, content string")
    return build_index(spark, src, do_stem=False, build_packed=True,
                       doc_shard_size=4, **kw)


def test_empty_null_and_stopword_only_docs(spark):
    idx = _build(
        spark,
        [
            (0, "buffer merge"),
            (1, ""),             # empty
            (2, None),           # null
            (3, "the a of"),     # stopwords only ('a' is len-1, dropped)
            (4, "x y z"),        # all tokens below length 2
        ],
    )
    lens = {r["doc_id"]: r["doc_len"] for r in idx.doc_map.collect()}
    assert lens == {0: 2, 1: 0, 2: 0, 3: 2, 4: 0}
    assert idx.stats.n_docs == 5
    # only doc 0 produced postings
    assert {r["doc_id"] for r in idx.postings.select("doc_id").distinct().collect()} == {0}
    ex = QueryExecutor(spark, idx)
    rows = ex.search("buffer", k=10).collect()
    assert [r["doc_id"] for r in rows] == [0]


def test_term_in_every_document_bounded_groups(spark):
    """Worst-case skew: one term in 100% of docs. Pack groups stay bounded by
    doc_shard_size and df/cf are exact."""
    n = 40
    rows = [(i, f"common uniq{chr(97 + i % 26)}{chr(97 + i // 26)} common") for i in range(n)]
    idx = _build(spark, rows)
    ts = {r["term"]: (r["df"], r["cf"]) for r in idx.term_stats.collect()}
    assert ts["common"] == (n, 2 * n)
    packed = idx.packed.filter(F.col("term") == "common").collect()
    # shard_size=4 -> 10 bounded groups for the 100%-df term
    assert len(packed) == n // 4
    assert all(r["n"] <= 4 for r in packed)
    ex = QueryExecutor(spark, idx)
    assert len(ex.search("common", k=50).collect()) == n


def test_single_doc_corpus(spark):
    idx = _build(spark, [(0, "lonely document text")])
    assert idx.stats.n_docs == 1
    ex = QueryExecutor(spark, idx)
    rows = ex.search("lonely", k=5).collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["score"] > 0
