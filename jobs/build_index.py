"""spark-submit entrypoint: build (or resume) the inverted index.

Usage:
    spark-submit --py-files awesome_spark_search.zip jobs/build_index.py \
        --source /path/to/source_table_parquet \
        --out    /path/to/index_root \
        [--no-stem] [--term-buckets 64] [--doc-shard-size 1048576]

The source table must carry (repo, path, commit, lang, content) per the
input_hint shape; ``doc_id`` is assigned deterministically by
(repo, path, commit) order if absent. Every stage checkpoints to
``<out>/stages/<name>`` with a ``_manifest.json`` (per-partition lineage +
metrics); a rerun after a kill skips completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from awesome_spark_search import corpus
from awesome_spark_search.build import build_index


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="parquet dir of the source table")
    ap.add_argument("--out", required=True, help="index root (stages + manifests)")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--doc-shard-size", type=int, default=1 << 20)
    ap.add_argument("--no-packed", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("ass-build-index").getOrCreate()
    src = spark.read.parquet(args.source)
    if "doc_id" not in src.columns:
        src = corpus.assign_doc_ids(src, ["repo", "path", "commit"])

    t0 = time.time()
    idx = build_index(
        spark,
        src,
        do_stem=not args.no_stem,
        checkpoint_dir=os.path.join(args.out, "stages"),
        n_term_buckets=args.term_buckets,
        doc_shard_size=args.doc_shard_size,
        build_packed=not args.no_packed,
    )
    summary = {
        "n_docs": idx.stats.n_docs,
        "total_tokens": idx.stats.total_tokens,
        "avgdl": idx.stats.avgdl,
        "doc_shard_size": args.doc_shard_size,
        "term_buckets": args.term_buckets,
        "wall_sec": round(time.time() - t0, 3),
        "docs_per_sec": round(idx.stats.n_docs / max(time.time() - t0, 1e-9), 2),
        "stages": idx.build_metrics,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "build_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
