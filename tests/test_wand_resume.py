"""Block-max WAND rank-parity vs the DataFrame BM25 path, and
checkpoint-resume semantics of the stage runner (SURVEY.md §5 items 4-5)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from awesome_spark_search import corpus
from awesome_spark_search.build import build_index
from awesome_spark_search.executor import QueryExecutor
from awesome_spark_search.textproc import preprocess_query_terms
from awesome_spark_search.wand import wand_topk

N_DOCS = 250


@pytest.fixture(scope="module")
def packed_index(spark):
    src = spark.createDataFrame(corpus.generate_pandas(N_DOCS, seed=42))
    # tiny doc_shard_size so the test actually exercises multi-shard merging
    return build_index(spark, src, do_stem=True, build_packed=True, doc_shard_size=64)


@pytest.mark.parametrize(
    "query",
    ["buffer", "buffer merge scan", "compress encode varint", "posting list merge sort"],
)
def test_wand_matches_dataframe_bm25(spark, packed_index, query):
    terms = preprocess_query_terms(query, do_stem=True)
    ex = QueryExecutor(spark, packed_index)
    want = ex.search(query, k=10).collect()
    # doc_shard_size must match the index build's
    packed_index.doc_shard_size = 64
    got = wand_topk(spark, packed_index, terms, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9


@pytest.mark.parametrize("query", ['"merge sort buffer"', '"merge sort"'])
def test_phrase_topk_matches_dataframe_path(spark, packed_index, query):
    from awesome_spark_search.wand import phrase_topk

    terms = preprocess_query_terms(query.strip('"'), do_stem=True)
    ex = QueryExecutor(spark, packed_index)
    want = ex.search(query, k=10).collect()
    packed_index.doc_shard_size = 64
    got = phrase_topk(spark, packed_index, terms, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9


@pytest.mark.parametrize(
    "query",
    [
        "buffer merge scan",
        '"merge sort buffer"',
        "mrege",
        "buffer AND merge",
        "buffer NOT merge",
        "varint OR atomic",
        "token*",
    ],
)
def test_packed_serving_mode_matches_dataframe_path(spark, packed_index, query):
    """QueryExecutor(use_packed=True) must agree with the DataFrame path for
    every dispatchable query type, including the spelling-correction retry
    and the boolean fallback."""
    packed_index.doc_shard_size = 64
    df_ex = QueryExecutor(spark, packed_index)
    pk_ex = QueryExecutor(spark, packed_index, use_packed=True)
    want = df_ex.search(query, k=10).collect()
    got = pk_ex.search(query, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
    for g, w in zip(got, want):
        if w["score"] is not None:
            assert abs(g["score"] - w["score"]) < 1e-9, query


@pytest.fixture(scope="module")
def packed_src(spark):
    # same generator + seed as packed_index's corpus: doc_ids line up
    return spark.createDataFrame(corpus.generate_pandas(N_DOCS, seed=42))


@pytest.mark.parametrize(
    "query",
    [
        '"merge sort" buffer',        # Mixed: phrase + keyword
        '"merge" buffer scan',        # Mixed with one-word phrase
        '"merge sort buffer" token*', # Mixed with prefix keyword
        "buffer merge #3",            # PRF keyword two-pass
        "buffer merge scan #5",
    ],
)
def test_packed_mixed_and_prf_match_dataframe_path(
    spark, packed_index, packed_src, query
):
    """Mixed and PRF queries must produce identical rankings and scores off
    the packed index (mixed_topk seeded-WAND / weighted two-pass WAND) as off
    the long postings table."""
    packed_index.doc_shard_size = 64
    df_ex = QueryExecutor(spark, packed_index, source_df=packed_src)
    pk_ex = QueryExecutor(
        spark, packed_index, source_df=packed_src, use_packed=True
    )
    want = df_ex.search(query, k=10).collect()
    got = pk_ex.search(query, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9, query


@pytest.mark.parametrize("query", ["buffer", "buffer merge scan", "token*"])
def test_packed_ql_matches_dataframe_path(spark, packed_index, query):
    """The QL/JM scorer must rank+score identically off the packed index
    (wand.ql_topk: per-shard decode, dl from dls_vb, broadcast cf) as off
    the long postings table (scoring.ql_jm_score)."""
    packed_index.doc_shard_size = 64
    df_ex = QueryExecutor(spark, packed_index, scorer="ql")
    pk_ex = QueryExecutor(spark, packed_index, scorer="ql", use_packed=True)
    want = df_ex.search(query, k=10).collect()
    got = pk_ex.search(query, k=10).collect()
    assert len(want) > 0
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9, query


@pytest.mark.parametrize("scorer", ["bm25", "ql"])
def test_packed_serving_never_scans_long_postings(
    spark, packed_index, packed_src, monkeypatch, scorer
):
    """In packed serving mode (the cache_postings=False deployment) NO query
    type may touch the long postings table — keyword, phrase, boolean, mixed,
    and PRF all dispatch to the packed plans, under BOTH scorers for the
    query types each scorer serves."""
    packed_index.doc_shard_size = 64
    ex = QueryExecutor(
        spark, packed_index, source_df=packed_src, use_packed=True,
        scorer=scorer,
    )

    def boom(*a, **k):
        raise AssertionError("long postings table scanned in packed mode")

    monkeypatch.setattr(ex, "_postings_for_terms", boom)
    monkeypatch.setattr(ex, "_postings_for_prefix", boom)
    queries = ["buffer merge scan", "token*"]
    if scorer == "bm25":
        queries += [
            '"merge sort"',
            "buffer AND merge",
            '"merge sort" buffer',
            "buffer merge #3",
        ]
    for query in queries:
        ex.search(query, k=5).collect()


def test_packed_linkto_via_search(spark, packed_index):
    """LinkTo through the full search() pipeline with ONLY the packed
    citation index registered (ref: CitationIndexReader.java:61-112 —
    serving happens off the compressed index)."""
    from awesome_spark_search.pagerank import pack_citations

    edges = spark.createDataFrame(
        [(1, 42), (7, 42), (3, 5), (42, 7)], "src long, dst long"
    )
    ex = QueryExecutor(
        spark, packed_index,
        packed_citations=pack_citations(edges), use_packed=True,
    )
    got = ex.search("LinkTo:42", k=10).collect()
    assert [r["doc_id"] for r in got] == [7, 1]  # recency: doc_id DESC
    assert all(r["score"] is None for r in got)


def test_phrase_topk_no_match(spark, packed_index):
    from awesome_spark_search.wand import phrase_topk

    packed_index.doc_shard_size = 64
    assert phrase_topk(spark, packed_index, ["buffer", "zzznope"], k=10).collect() == []


def test_decode_postings_roundtrip(spark, packed_index):
    from awesome_spark_search.wand import decode_postings

    want = {
        (r["doc_id"], r["tf"])
        for r in packed_index.postings.filter(F.col("term") == "buffer")
        .select("doc_id", "tf").collect()
    }
    got = {
        (r["doc_id"], r["tf"])
        for r in decode_postings(packed_index, "buffer").collect()
    }
    assert got == want and len(got) > 0

    want_pos = {
        (r["doc_id"], r["pos"])
        for r in packed_index.postings.filter(F.col("term") == "buffer")
        .select("doc_id", F.explode("positions").alias("pos")).collect()
    }
    got_pos = {
        (r["doc_id"], r["pos"])
        for r in decode_postings(packed_index, "buffer", with_positions=True).collect()
    }
    assert got_pos == want_pos


def test_wand_unknown_term_empty(spark, packed_index):
    packed_index.doc_shard_size = 64
    got = wand_topk(spark, packed_index, ["zzzznotaterm"], k=10).collect()
    assert got == []


# ---------------------------------------------------------------------------
# checkpoint-resume
# ---------------------------------------------------------------------------


def _manifests(d):
    return sorted(f for f in os.listdir(d) if f.endswith("._manifest.json"))


def test_checkpoint_resume_skips_completed_stages(spark, tmp_path):
    src = spark.createDataFrame(corpus.generate_pandas(80, seed=3))
    ckpt = str(tmp_path / "stages")

    idx1 = build_index(spark, src, do_stem=False, checkpoint_dir=ckpt, build_packed=False)
    first = {r["term"]: (r["df"], r["cf"]) for r in idx1.term_stats.collect()}
    manifests = _manifests(ckpt)
    assert {"doc_map._manifest.json",
            "postings._manifest.json", "term_stats._manifest.json"} <= set(manifests)

    # every manifest records per-partition lineage
    with open(os.path.join(ckpt, "postings._manifest.json")) as f:
        m = json.load(f)
    assert m["complete"] and m["rows"] > 0 and len(m["partitions"]) > 0
    assert sum(p["rows"] for p in m["partitions"]) == m["rows"]

    # simulate a kill AFTER postings but BEFORE term_stats: delete downstream
    # manifests, corrupt nothing else
    for name in ("term_stats._manifest.json", "stats._manifest.json"):
        p = os.path.join(ckpt, name)
        if os.path.exists(p):
            os.remove(p)
    postings_mtime = os.path.getmtime(os.path.join(ckpt, "postings._manifest.json"))

    idx2 = build_index(spark, src, do_stem=False, checkpoint_dir=ckpt, build_packed=False)
    second = {r["term"]: (r["df"], r["cf"]) for r in idx2.term_stats.collect()}

    # identical results after resume
    assert first == second
    # completed upstream stages were skipped (manifest untouched)
    assert os.path.getmtime(os.path.join(ckpt, "postings._manifest.json")) == postings_mtime
    # only the re-run stages appear in the second run's metrics
    rerun = {m["stage"] for m in idx2.build_metrics}
    assert "postings" not in rerun and "doc_map" not in rerun
    assert "term_stats" in rerun


def test_checkpoint_idempotent_rebuild(spark, tmp_path):
    """Full rerun over a complete checkpoint dir re-runs nothing."""
    src = spark.createDataFrame(corpus.generate_pandas(40, seed=5))
    ckpt = str(tmp_path / "stages2")
    build_index(spark, src, do_stem=False, checkpoint_dir=ckpt, build_packed=False)
    idx2 = build_index(spark, src, do_stem=False, checkpoint_dir=ckpt, build_packed=False)
    assert idx2.build_metrics == []
