"""spark-submit entrypoint: run queries against a built index.

Usage:
    spark-submit --py-files awesome_spark_search.zip jobs/query.py \
        --index /path/to/index_root --source /path/to/source_table \
        [--k 10] [--scorer bm25|ql] [--wand] "query one" '"a phrase"' ...

Prints one JSON line per query: {"query", "k", "wall_ms", "corrections",
"results": [{"doc_id", "score"}, ...]}. With --batch, every query serves in
ONE Spark action (search_many) and each line carries the shared
"batch_wall_ms" instead of a per-query "wall_ms"; "corrections" stays
per-query (the batch map filtered to that query's tokens).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from awesome_spark_search.build import Index, IndexStats
from awesome_spark_search.executor import QueryExecutor
from awesome_spark_search.wand import wand_topk


def load_index(spark: SparkSession, root: str) -> Index:
    stages = os.path.join(root, "stages")
    doc_map = spark.read.parquet(os.path.join(stages, "doc_map"))
    postings = spark.read.parquet(os.path.join(stages, "postings"))
    term_stats = spark.read.parquet(os.path.join(stages, "term_stats"))
    packed_dir = os.path.join(stages, "packed")
    packed = spark.read.parquet(packed_dir) if os.path.isdir(packed_dir) else None
    row = doc_map.selectExpr(
        "count(1) as n", "coalesce(sum(doc_len),0) as t", "coalesce(avg(doc_len),0.0) as a"
    ).collect()[0]
    stats = IndexStats(n_docs=row["n"], total_tokens=row["t"], avgdl=float(row["a"]) or 1.0)
    kw = {}
    summary_path = os.path.join(root, "build_summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            s = json.load(f)
        if s.get("doc_shard_size"):
            kw["doc_shard_size"] = s["doc_shard_size"]
    return Index(
        doc_map=doc_map, postings=postings, term_stats=term_stats,
        packed=packed, stats=stats, **kw,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--source", default=None, help="source table (PRF/snippets)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--scorer", choices=["bm25", "ql"], default="bm25")
    ap.add_argument("--wand", action="store_true", help="block-max WAND path")
    ap.add_argument(
        "--batch", action="store_true",
        help="serve ALL queries in ONE Spark action (search_many over the "
        "packed index; ranked one-pass types only - keyword/phrase/mixed)",
    )
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args(argv)

    if args.batch and args.scorer != "bm25":
        ap.error("--batch serves the BM25 scorer only")

    spark = SparkSession.builder.appName("ass-query").getOrCreate()
    idx = load_index(spark, args.index)
    idx.do_stem = not args.no_stem
    src = spark.read.parquet(args.source) if args.source else None
    if args.batch and idx.packed is None:
        print(
            f"error: --batch needs packed postings, but the index at "
            f"{args.index!r} was built without them (no stages/packed)",
            file=sys.stderr,
        )
        return 2
    ex = QueryExecutor(
        spark, idx, source_df=src, scorer=args.scorer, use_packed=args.batch,
    )

    if args.batch:
        qmap = {f"q{i}": q for i, q in enumerate(args.queries)}
        t0 = time.perf_counter()
        rows = ex.search_many(qmap, k=args.k).collect()
        wall = round((time.perf_counter() - t0) * 1000, 1)
        by_qid: dict[str, list] = {}
        for r in rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        for i, q in enumerate(args.queries):
            # corrections restricted to THIS query's tokens (the batch map
            # covers every query; per-line output mirrors single-query mode)
            q_terms = set(ex._tokenize_query(q))
            out = {
                "query": q,
                "k": args.k,
                "batch_wall_ms": wall,  # ONE action served the whole batch
                "corrections": {
                    t: c for t, c in ex.last_corrections.items() if t in q_terms
                },
                "results": [
                    {"doc_id": r["doc_id"], "score": r["score"]}
                    for r in by_qid.get(f"q{i}", [])
                ],
            }
            print(json.dumps(out))
        return 0

    for q in args.queries:
        t0 = time.perf_counter()
        if args.wand:
            terms = ex._tokenize_query(q)
            rows = wand_topk(spark, idx, terms, k=args.k).collect()
        else:
            rows = ex.search(q, k=args.k).collect()
        out = {
            "query": q,
            "k": args.k,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
            # applied spelling corrections, surfaced like the reference's
            # result-object corrections map (UnrankedQueryResult.java)
            "corrections": {} if args.wand else ex.last_corrections,
            "results": [
                {"doc_id": r["doc_id"], "score": r["score"]} for r in rows
            ],
        }
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
