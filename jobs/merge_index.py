"""spark-submit entrypoint: fold k built indexes into one (delta compaction).

Usage:
    spark-submit --py-files awesome_spark_search.zip jobs/merge_index.py \
        --out /path/to/merged_index_root \
        /path/to/base_index_root /path/to/delta_index_root [...]

Every input is an index root written by jobs/build_index.py (or a previous
merge). Content is never re-read and tokenization never re-runs: packed
bytes move through one (term, doc_shard) shuffle
(awesome_spark_search.merge.merge_packed_indexes — single-source groups
pass through byte-identical, block_max refreshed against the merged
avgdl). The output root uses the same stage layout, so jobs/query.py
serves it unchanged. Doc sets must be disjoint (re-ingest/tombstone
resolution belongs to the streaming path, upstream of packing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="merged index root")
    ap.add_argument(
        "--term-buckets", type=int, default=None,
        help="defaults to the sources' recorded bucket count; a different "
        "value is rejected (the copied postings stage keeps the sources' "
        "term_bucket values, so re-bucketing only packed/term_stats would "
        "leave long-table bucket pruning inconsistent with the layout)",
    )
    ap.add_argument(
        "--assume-disjoint", action="store_true",
        help="skip the doc_map duplicate probe (monotonic doc_id guarantee)",
    )
    ap.add_argument("roots", nargs="+", help="2+ input index roots")
    args = ap.parse_args(argv)
    if len(args.roots) < 2:
        ap.error("need at least two index roots to merge")

    from awesome_spark_search.merge import merge_packed_indexes
    from query import load_index  # same jobs/ dir

    spark = SparkSession.builder.appName("ass-merge-index").getOrCreate()
    indexes = [load_index(spark, r) for r in args.roots]
    for r, ix in zip(args.roots, indexes):
        if ix.packed is None:
            raise SystemExit(f"{r}: no packed stage — rebuild with packing on")

    # bucket-count validation (ADVICE r4): every stage must agree on the
    # term_bucket layout. Sources record theirs in build_summary.json
    # (jobs/build_index.py); absent a record, fall back to the on-disk
    # max(term_bucket)+1 being <= the requested count is NOT enough — the
    # only safe default is the recorded value itself.
    recorded = set()
    for r in args.roots:
        sp = os.path.join(r, "build_summary.json")
        if os.path.exists(sp):
            with open(sp) as f:
                tb = json.load(f).get("term_buckets")
            if tb:
                recorded.add(int(tb))
    if len(recorded) > 1:
        raise SystemExit(f"sources were built with different --term-buckets: {sorted(recorded)}")
    src_buckets = recorded.pop() if recorded else 64
    if args.term_buckets is not None and args.term_buckets != src_buckets:
        raise SystemExit(
            f"--term-buckets {args.term_buckets} != sources' bucket count "
            f"{src_buckets}; re-bucketing a merge is not supported (the "
            "postings stage is copied with its original term_bucket values)"
        )
    n_term_buckets = src_buckets

    t0 = time.time()
    merged = merge_packed_indexes(
        spark, indexes,
        check_disjoint=not args.assume_disjoint,
        n_term_buckets=n_term_buckets,
        # persist the merged packed table: the term_stats rollup below reads
        # the cache the packed write just filled instead of re-running the
        # merge shuffle per output stage
        cache=True,
    )
    stages = os.path.join(args.out, "stages")
    (
        merged.packed.repartition("term_bucket")
        .sortWithinPartitions("term", "doc_shard")
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(os.path.join(stages, "packed"))
    )
    merged.doc_map.write.mode("overwrite").parquet(
        os.path.join(stages, "doc_map")
    )
    (
        merged.term_stats.repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(os.path.join(stages, "term_stats"))
    )
    merged.postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(stages, "postings")
    )
    summary = {
        "n_docs": merged.stats.n_docs,
        "total_tokens": merged.stats.total_tokens,
        "avgdl": merged.stats.avgdl,
        "doc_shard_size": merged.doc_shard_size,
        "term_buckets": n_term_buckets,
        "merged_from": args.roots,
        "wall_sec": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.out, "build_summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
