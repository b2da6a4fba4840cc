"""End-to-end spark-submit entrypoints: build an index on disk with
jobs/build_index.py, resume it, then query it with jobs/query.py — each in a
fresh subprocess (the spark-submit execution model minus the wrapper)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    proc = subprocess.run(
        [sys.executable, *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    import pandas  # noqa: F401  (pyarrow write below)
    from awesome_spark_search import corpus

    d = tmp_path_factory.mktemp("jobs_corpus")
    pdf = corpus.generate_pandas(150, seed=9)
    path = str(d / "src.parquet")
    pdf.to_parquet(path, index=False)
    return path


def test_build_then_query_jobs(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jobs_index"))

    stdout = _run(["jobs/build_index.py", "--source", corpus_dir, "--out", out])
    summary = json.loads(stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 150
    assert {m["stage"] for m in summary["stages"]} >= {
        "postings", "doc_map", "term_stats", "packed"
    }
    assert os.path.exists(os.path.join(out, "build_summary.json"))

    # resume: a second run must skip every stage
    stdout2 = _run(["jobs/build_index.py", "--source", corpus_dir, "--out", out])
    summary2 = json.loads(stdout2.strip().splitlines()[-1])
    assert summary2["stages"] == []
    assert summary2["n_docs"] == 150

    # query the on-disk index from a fresh process
    stdout3 = _run([
        "jobs/query.py", "--index", out, "--source", corpus_dir,
        "buffer merge", '"merge sort buffer"',
    ])
    lines = [json.loads(l) for l in stdout3.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 2
    assert all(len(l["results"]) > 0 for l in lines)
    # deterministic ordering: score desc, doc_id asc
    for l in lines:
        scores = [r["score"] for r in l["results"]]
        assert scores == sorted(scores, reverse=True)

    # WAND path against the same on-disk index must agree on ranking
    stdout4 = _run([
        "jobs/query.py", "--index", out, "--source", corpus_dir, "--wand",
        "buffer merge",
    ])
    wand_line = [json.loads(l) for l in stdout4.strip().splitlines() if l.startswith("{")][0]
    assert [r["doc_id"] for r in wand_line["results"]] == [
        r["doc_id"] for r in lines[0]["results"]
    ]

    # --batch: BOTH queries (a keyword bag + a phrase) in ONE Spark action
    # off the on-disk packed index, result parity with the per-query lines
    stdout5 = _run([
        "jobs/query.py", "--index", out, "--source", corpus_dir, "--batch",
        "buffer merge", '"merge sort buffer"',
    ])
    blines = [json.loads(l) for l in stdout5.strip().splitlines() if l.startswith("{")]
    assert len(blines) == 2
    for batch_l, per_q in zip(blines, lines):
        assert [r["doc_id"] for r in batch_l["results"]] == [
            r["doc_id"] for r in per_q["results"]
        ]
        for b, p in zip(batch_l["results"], per_q["results"]):
            assert abs(b["score"] - p["score"]) < 1e-9

    # --- delta compaction deployment: split the corpus by doc parity, build
    # two half indexes, fold them with jobs/merge_index.py, and the merged
    # root must serve IDENTICAL results to the full index above through
    # jobs/query.py (fresh processes throughout)
    import pandas as pd

    d = tmp_path_factory.mktemp("jobs_merge")
    full_pdf = pd.read_parquet(corpus_dir)
    a_path, b_path = str(d / "a.parquet"), str(d / "b.parquet")
    full_pdf[full_pdf.doc_id % 2 == 0].to_parquet(a_path, index=False)
    full_pdf[full_pdf.doc_id % 2 == 1].to_parquet(b_path, index=False)
    out_a, out_b, out_m = str(d / "ix_a"), str(d / "ix_b"), str(d / "ix_m")
    _run(["jobs/build_index.py", "--source", a_path, "--out", out_a])
    _run(["jobs/build_index.py", "--source", b_path, "--out", out_b])
    mout = _run(["jobs/merge_index.py", "--out", out_m, out_a, out_b])
    msummary = json.loads(mout.strip().splitlines()[-1])
    assert msummary["n_docs"] == 150
    assert os.path.exists(os.path.join(out_m, "build_summary.json"))

    stdout5 = _run([
        "jobs/query.py", "--index", out_m, "--source", corpus_dir,
        "buffer merge", '"merge sort buffer"',
    ])
    mlines = [
        json.loads(l) for l in stdout5.strip().splitlines() if l.startswith("{")
    ]
    for merged_line, full_line in zip(mlines, lines):
        assert [r["doc_id"] for r in merged_line["results"]] == [
            r["doc_id"] for r in full_line["results"]
        ]
        for mr, fr in zip(merged_line["results"], full_line["results"]):
            assert abs(mr["score"] - fr["score"]) < 1e-9
