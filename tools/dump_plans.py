"""Dump formatted physical plans of the headline operators to PLANS.md —
the .explain('formatted') evidence behind the plan-gate tests
(tests/test_plans.py): partition pruning, filter pushdown, column pruning,
query-term-filtered broadcasts, single-shuffle shapes.

Usage: python tools/dump_plans.py [out.md]
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import tempfile

    from pyspark.sql import functions as F

    from awesome_spark_search import corpus, dedup
    from awesome_spark_search.build import build_index
    from awesome_spark_search.executor import QueryExecutor
    from awesome_spark_search.session import get_spark
    from awesome_spark_search.wand import (
        mixed_topk,
        ql_topk_many,
        wand_topk,
        wand_topk_many,
    )

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "PLANS.md")
    spark = get_spark("plans", cores=4, shuffle_partitions=8)
    ckpt = tempfile.mkdtemp(prefix="ass_plans_")
    src = spark.createDataFrame(corpus.generate_pandas(300, seed=21))
    idx = build_index(spark, src, do_stem=True, checkpoint_dir=ckpt,
                      build_packed=True, doc_shard_size=64)
    ex = QueryExecutor(spark, idx)

    def fmt(df) -> str:
        s = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip exploded per-run temp paths for readability
        return re.sub(r"file:[^\s,\]]*", "file:<ckpt>", s)

    def _fielded_plan(spark, src):
        from awesome_spark_search.fields import (
            build_fielded_packed, fielded_wand_topk,
        )

        fielded_src = src.select("doc_id", "content", "path")
        fidx = build_fielded_packed(
            spark, fielded_src, {"content": 1.0, "path": 0.5}, do_stem=False
        )
        return fielded_wand_topk(spark, fidx, ["buffer", "merge"], k=10)

    sections = [
        ("Pruned term lookup (keyword postings scan)",
         "PartitionFilters on term_bucket + PushedFilters on term; ReadSchema "
         "has no positions column (the frequency/positional split).",
         ex._postings_for_terms(["buffer", "merge"], with_positions=False)),
        ("Block-max WAND top-10 over the packed index",
         "ONE action: broadcast of the term-filtered idf rows joined onto "
         "bucket-pruned packed blobs, per-shard applyInPandas, global "
         "TakeOrderedAndProject.",
         wand_topk(spark, idx, ["buffer", "merge", "scan"], k=10)),
        ("Batched multi-query top-k (3 queries, ONE action)",
         "The whole workload shares one bucket-pruned packed scan (union of "
         "all terms) and one per-shard applyInPandas running each query's "
         "block-max WAND loop; the per-query global top-k is a window over "
         "n_shards*k*n_queries local rows. Exactly TWO shuffle exchanges at "
         "any batch size (the per-shard repartition and the tiny window).",
         wand_topk_many(
             spark, idx,
             {"q0": ["buffer", "merge"], "q1": ["scan"],
              "q2": ["buffer", "scan"]},
             k=10,
         )),
        ("Batched QL/JM (keyword bags, shared per-term decode)",
         "Same two-exchange batch shape under the QL scorer: broadcast of "
         "the term-filtered GLOBAL cf rows, per-shard decode shared by every "
         "query that uses a term (exact for QL - nothing skips), window "
         "top-k.",
         ql_topk_many(
             spark, idx,
             {"q0": ["buffer", "merge"], "q1": ["scan", "buffer"]},
             k=10,
         )),
        ("Mixed phrase+keyword over the packed index (one per-shard pass)",
         "Same ONE-action shape as WAND: every term's packed rows arrive in "
         "one bucket-pruned scan and each doc_shard runs phrase-eval + "
         "candidate-seeded WAND inside a single applyInPandas.",
         mixed_topk(spark, idx, ["buffer", "merge"], ["scan"], k=10)),
        ("Weighted WAND (PRF pass-2, expansion terms at 0.25)",
         "Identical plan shape to plain WAND — the 0.25 expansion weight "
         "folds into the broadcast idf column, so PRF's second pass costs "
         "exactly one more WAND action, nothing new in the plan.",
         wand_topk(spark, idx, ["buffer", "merge", "scan"], k=10,
                   weights={"scan": 0.25})),
        ("Fielded (zone-weighted) BM25 over the packed fielded index",
         "Same one-action WAND shape with two extra codegen columns: w_f "
         "multiplies the broadcast idf, a field->avgdl literal map supplies "
         "the per-row dl normalizer. No joins beyond the tiny idf broadcast.",
         _fielded_plan(spark, src)),
        ("SimHash (single groupBy, 32 codegen sums)",
         "No per-bit row expansion: one exchange keyed doc_id carrying 32 "
         "partial sums.",
         dedup.simhash(src.select("doc_id", F.col("content").alias("text")))),
        ("LSH candidate pairs (guarded path)",
         "Exact-dup collapse, one banding explode, ONE shuffle to bucket "
         "arrays, JVM pair expansion bounded by the bucket cap.",
         dedup.lsh_candidate_pairs(
             src.select("doc_id", F.col("content").alias("text")))),
    ]
    lines = [
        "# PLANS — formatted physical plans of the headline operators",
        "",
        "Generated by `python tools/dump_plans.py` over a 300-doc seeded",
        "corpus with a checkpointed (Parquet-backed) index — the same plan",
        "shapes the plan-gate tests assert (tests/test_plans.py). Regenerate",
        "after any operator change.",
        "",
    ]
    for title, note, df in sections:
        lines += [f"## {title}", "", note, "", "```", fmt(df).rstrip(), "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
