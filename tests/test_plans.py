"""Physical-plan quality gates: the optimizations we rely on at 100 TB must
be visible in the plan at any scale — partition pruning on term_bucket,
Parquet filter pushdown, column pruning (positions never read for keyword
queries), broadcast of per-query term stats."""

import re

import pytest
from pyspark.sql import functions as F

from awesome_spark_search import corpus
from awesome_spark_search.build import build_index
from awesome_spark_search.executor import QueryExecutor


@pytest.fixture(scope="module")
def ckpt_index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("plan_idx"))
    src = spark.createDataFrame(corpus.generate_pandas(120, seed=21))
    return build_index(
        spark, src, do_stem=True, checkpoint_dir=ckpt, build_packed=False
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_lookup_prunes_partitions_and_pushes_filters(spark, ckpt_index):
    ex = QueryExecutor(spark, ckpt_index)
    matches = ex._postings_for_terms(["buffer"], with_positions=False)
    plan = _plan(matches)
    # partition pruning: term_bucket is a partition column of the parquet
    # stage output; the filter must appear as a partition filter, not a scan
    assert "PartitionFilters" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan[:2000]
    # data filter pushed to the reader
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf and "term" in pf.group(1), plan[:2000]


def test_keyword_plan_never_reads_positions(spark, ckpt_index):
    ex = QueryExecutor(spark, ckpt_index)
    matches = ex._postings_for_terms(["buffer", "merge"], with_positions=False)
    plan = _plan(matches)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert schemas and all("positions" not in s for s in schemas), schemas


def test_phrase_plan_reads_positions(spark, ckpt_index):
    ex = QueryExecutor(spark, ckpt_index)
    matches = ex._postings_for_terms(["buffer"], with_positions=True)
    plan = _plan(matches)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert schemas and any("positions" in s for s in schemas), schemas


def test_bm25_broadcasts_term_stats(spark, ckpt_index):
    from awesome_spark_search import queries as Q
    from awesome_spark_search import scoring

    ex = QueryExecutor(spark, ckpt_index)
    pq = Q.parse("buffer merge scan", tokenize=ex._tokenize_query)
    ex._corrections, ex._query_terms = {}, Q.collect_terms(pq.ast)
    scored = scoring.top_k(ex._score(ex._matches(pq.ast)), 10)
    plan = _plan(scored)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    # the broadcast side must be filtered to the query's terms, not the
    # whole dictionary (fatal at a 100M-term vocabulary)
    assert re.search(r"term#\d+ IN \(buffer,merg,scan\)|term.* IN ", plan), plan[:3000]


@pytest.fixture(scope="module")
def packed_ckpt_index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("plan_idx_packed"))
    src = spark.createDataFrame(corpus.generate_pandas(120, seed=21))
    return build_index(
        spark, src, do_stem=True, checkpoint_dir=ckpt, build_packed=True,
        doc_shard_size=32,
    )


def test_batch_plan_shape(spark, packed_ckpt_index):
    """The batched multi-query plan must stay the single-action shape at any
    batch size: broadcast idf join (never a shuffle join), term_bucket
    partition pruning + pushed term filters on the ONE shared packed scan,
    and exactly TWO shuffle exchanges regardless of how many queries ride
    the batch — the per-shard applyInPandas repartition and the tiny
    (n_shards * k * n_queries rows) window for the per-query global top-k."""
    from awesome_spark_search.wand import wand_topk_many

    df = wand_topk_many(
        spark, packed_ckpt_index,
        {"q0": ["buffer", "merge"], "q1": ["scan"], "q2": ["buffer", "scan"]},
        k=5,
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan[:2000]
    pf = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf and any("term" in x for x in pf), plan[:2000]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan[:3000]
    rows = df.collect()
    assert {r["query_id"] for r in rows} == {"q0", "q1", "q2"}
    assert all(r["score"] > 0 for r in rows)


def test_wand_plan_single_action_shape(spark, packed_ckpt_index):
    """The packed WAND query must (a) broadcast the term-filtered idf side
    (no driver-side collect exists to check, but the join must be a
    broadcast, not a shuffle join), (b) prune packed partitions on
    term_bucket, and (c) push the term filter to the packed scan."""
    from awesome_spark_search.wand import wand_topk

    df = wand_topk(spark, packed_ckpt_index, ["buffer", "merge"], k=10)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1), plan[:2000]
    pf = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf and any("term" in x for x in pf), plan[:2000]
    # and it returns the right thing
    rows = df.collect()
    assert rows and rows[0]["score"] > 0
