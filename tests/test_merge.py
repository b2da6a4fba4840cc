"""Packed-index merge (merge.merge_packed_indexes): fold delta indexes into
a base without re-tokenizing. Gate: a merged index must be observationally
IDENTICAL to the index built over the union corpus — postings round-trip,
term_stats, stats, WAND top-k rank+score, phrase results."""

import numpy as np
import pytest

from awesome_spark_search import corpus
from awesome_spark_search.build import build_index
from awesome_spark_search.merge import merge_packed_indexes
from awesome_spark_search.wand import decode_postings, phrase_topk, wand_topk


def _split_indexes(spark, n=120, parity=True, shard=16):
    """Full corpus index + two half-corpus indexes. parity=True interleaves
    doc_ids so every doc_shard holds rows from BOTH sources (the full
    decode+re-encode merge path); parity=False splits contiguously so every
    group is single-source (the byte-passthrough path)."""
    pdf = corpus.generate_pandas(n, seed=7)
    src = spark.createDataFrame(pdf)
    if parity:
        a = src.filter("doc_id % 2 = 0")
        b = src.filter("doc_id % 2 = 1")
    else:
        a = src.filter(f"doc_id < {n // 2}")
        b = src.filter(f"doc_id >= {n // 2}")
    kw = dict(do_stem=False, build_packed=True, doc_shard_size=shard)
    full = build_index(spark, src, **kw)
    ia = build_index(spark, a, **kw)
    ib = build_index(spark, b, **kw)
    return full, ia, ib


@pytest.mark.parametrize("parity", [True, False])
def test_merged_equals_rebuilt(spark, parity):
    full, ia, ib = _split_indexes(spark, parity=parity)
    merged = merge_packed_indexes(spark, [ia, ib])

    assert merged.stats.n_docs == full.stats.n_docs
    assert merged.stats.total_tokens == full.stats.total_tokens
    assert abs(merged.stats.avgdl - full.stats.avgdl) < 1e-12

    # term_stats identical
    ts_m = {r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()}
    ts_f = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    assert ts_m == ts_f

    # postings round-trip identical for a frequent and a rare term
    terms = sorted(ts_f, key=lambda t: -ts_f[t][0])
    for term in (terms[0], terms[len(terms) // 2]):
        got = {
            r["doc_id"]: r["tf"]
            for r in decode_postings(merged, term).collect()
        }
        want = {
            r["doc_id"]: r["tf"] for r in decode_postings(full, term).collect()
        }
        assert got == want, term
        gp = {
            (r["doc_id"], r["pos"])
            for r in decode_postings(merged, term, with_positions=True).collect()
        }
        wp = {
            (r["doc_id"], r["pos"])
            for r in decode_postings(full, term, with_positions=True).collect()
        }
        assert gp == wp, term

    # serving parity: WAND + phrase rank AND score identical to the rebuild
    q = [terms[0], terms[2], terms[5]]
    got = wand_topk(spark, merged, q, k=10).collect()
    want = wand_topk(spark, full, q, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert np.allclose([r["score"] for r in got], [r["score"] for r in want])
    gph = phrase_topk(spark, merged, [terms[0], terms[1]], k=10).collect()
    wph = phrase_topk(spark, full, [terms[0], terms[1]], k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in gph] == [
        (r["doc_id"], round(r["score"], 9)) for r in wph
    ]


def test_contiguous_split_passes_bytes_through(spark):
    """Disjoint doc_shard ranges: every merged group must carry the SOURCE
    blob bytes verbatim (only block_max refreshed)."""
    full, ia, ib = _split_indexes(spark, parity=False)
    merged = merge_packed_indexes(spark, [ia, ib])
    blobs_a = {
        (r["term"], r["doc_shard"]): bytes(r["doc_ids_vb"]) + bytes(r["pos_vb"])
        for r in ia.packed.collect()
    }
    blobs_b = {
        (r["term"], r["doc_shard"]): bytes(r["doc_ids_vb"]) + bytes(r["pos_vb"])
        for r in ib.packed.collect()
    }
    # the split boundary (doc 60 with shard=16) lands inside shard 3: groups
    # present in BOTH sources legitimately re-encode; every other group must
    # be byte-identical to its single source
    both = set(blobs_a) & set(blobs_b)
    assert both and all(s == 3 for _, s in both)  # only the boundary shard
    checked = 0
    for r in merged.packed.collect():
        key = (r["term"], r["doc_shard"])
        if key in both:
            continue
        src = blobs_a.get(key) or blobs_b.get(key)
        assert bytes(r["doc_ids_vb"]) + bytes(r["pos_vb"]) == src, key
        checked += 1
    assert checked > 50  # the passthrough path is the common case


def test_block_max_refreshed_against_merged_avgdl(spark):
    """Sources with very different avgdl: the merged block_max must bound
    tfnorm under the MERGED avgdl (stale source bounds would break WAND
    exactness) — compare against the rebuilt index's bounds."""
    full, ia, ib = _split_indexes(spark, parity=True)
    assert abs(ia.stats.avgdl - ib.stats.avgdl) > 1e-9  # premise: they differ
    merged = merge_packed_indexes(spark, [ia, ib])
    bm_m = {
        (r["term"], r["doc_shard"]): np.asarray(r["block_max"])
        for r in merged.packed.collect()
    }
    for r in full.packed.collect():
        got = bm_m[(r["term"], r["doc_shard"])]
        assert np.allclose(got, np.asarray(r["block_max"])), r["term"]


def test_empty_delta_merge_is_identity(spark):
    """Compacting with an EMPTY delta (a no-new-docs day) must leave serving
    identical to the base — stats unchanged, bounds still exact."""
    pdf = corpus.generate_pandas(60, seed=3)
    src = spark.createDataFrame(pdf)
    kw = dict(do_stem=False, build_packed=True, doc_shard_size=16)
    base = build_index(spark, src, **kw)
    empty = build_index(spark, src.filter("doc_id < 0"), **kw)
    merged = merge_packed_indexes(spark, [base, empty])
    assert merged.stats.n_docs == base.stats.n_docs
    assert abs(merged.stats.avgdl - base.stats.avgdl) < 1e-12
    terms = sorted(
        r["term"] for r in base.term_stats.orderBy("df", ascending=False)
        .limit(3).collect()
    )
    got = wand_topk(spark, merged, terms, k=10).collect()
    want = wand_topk(spark, base, terms, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_overlapping_doc_ids_rejected(spark):
    full, ia, _ = _split_indexes(spark)
    with pytest.raises(ValueError, match="share doc_ids"):
        merge_packed_indexes(spark, [ia, ia])


def test_streamed_delta_merges_onto_batch_base(spark, tmp_path):
    """The incremental-deployment composition: a batch-built base + a
    streamed delta (IncrementalIndexer.to_index(build_packed=True)) fold
    with merge_packed_indexes into an index that serves identically to a
    full rebuild — delta compaction without re-reading the base corpus."""
    from awesome_spark_search.executor import QueryExecutor
    from awesome_spark_search.streaming import IncrementalIndexer

    base_docs = [
        (0, "merge buffer scan merge"),
        (1, "buffer table scan"),
        (2, "merge table value table"),
    ]
    delta_docs = [
        (3, "merge value buffer value"),
        (4, "table scan scan"),
    ]
    base = build_index(
        spark, spark.createDataFrame(base_docs, "doc_id long, content string"),
        do_stem=False, build_packed=True, doc_shard_size=2,
    )
    ingest = IncrementalIndexer(spark, str(tmp_path / "delta"), do_stem=False)
    ingest.foreach_batch(
        spark.createDataFrame(delta_docs, "doc_id long, content string"), 0
    )
    delta = ingest.to_index(build_packed=True, doc_shard_size=2)
    merged = merge_packed_indexes(spark, [base, delta])

    full = build_index(
        spark,
        spark.createDataFrame(
            base_docs + delta_docs, "doc_id long, content string"
        ),
        do_stem=False, build_packed=True, doc_shard_size=2,
    )
    assert merged.stats.n_docs == 5
    assert abs(merged.stats.avgdl - full.stats.avgdl) < 1e-12
    ex_m = QueryExecutor(spark, merged, use_packed=True)
    ex_f = QueryExecutor(spark, full, use_packed=True)
    for q in ["merge buffer", '"table value"', "merge AND value", "scan OR value"]:
        got = [(r["doc_id"], r["score"]) for r in ex_m.search(q, k=10).collect()]
        want = [(r["doc_id"], r["score"]) for r in ex_f.search(q, k=10).collect()]
        assert got == want, q


def test_fielded_merge_matches_rebuild(spark):
    """merge_fielded_packed: zone-weighted serving off the merged fielded
    index must match the index rebuilt over the union corpus (per-field
    weighted-mean avgdl, summed global term_stats)."""
    from awesome_spark_search.fields import build_fielded_packed, fielded_wand_topk
    from awesome_spark_search.merge import merge_fielded_packed

    def _word(i):
        return ["merge", "buffer", "sort", "alpha", "beta", "gamma", "delta"][i % 7]

    rows = []
    for d in range(40):
        body = " ".join(_word(d + j) for j in range(1 + (d * 3) % 9))
        title = " ".join(_word(d * 2 + j) for j in range(1 + d % 3))
        rows.append((d, body, title))
    df = spark.createDataFrame(rows, "doc_id long, body string, title string")
    weights = {"body": 1.0, "title": 0.5}
    kw = dict(do_stem=False, doc_shard_size=8)
    full = build_fielded_packed(spark, df, weights, **kw)
    fa = build_fielded_packed(spark, df.filter("doc_id % 2 = 0"), weights, **kw)
    fb = build_fielded_packed(spark, df.filter("doc_id % 2 = 1"), weights, **kw)
    merged = merge_fielded_packed(spark, [fa, fb])
    assert merged.n_docs == 40
    for f in weights:
        assert abs(merged.avgdl_by_field[f] - full.avgdl_by_field[f]) < 1e-9
    ts_m = {r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()}
    ts_f = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    assert ts_m == ts_f
    for terms in (["merge"], ["merge", "buffer", "gamma"]):
        got = fielded_wand_topk(spark, merged, terms, k=10).collect()
        want = fielded_wand_topk(spark, full, terms, k=10).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], terms
        for g, w in zip(got, want):
            assert abs(g["score"] - w["score"]) < 1e-9


def test_fielded_merge_with_empty_field_source_matches_rebuild(spark):
    """Degenerate case (ADVICE r4): one source's field is EMPTY everywhere.
    build_fielded_packed floors that source's avgdl to 1.0 for scoring, but
    the merge must combine the RAW (unfloored) means — averaging the floored
    values would diverge from a full rebuild's avgdl, silently shifting
    every merged score and block_max."""
    from awesome_spark_search.fields import build_fielded_packed, fielded_wand_topk
    from awesome_spark_search.merge import merge_fielded_packed

    def _word(i):
        return ["merge", "buffer", "sort", "alpha", "beta", "gamma"][i % 6]

    rows = []
    for d in range(30):
        body = " ".join(_word(d + j) for j in range(2 + (d * 3) % 7))
        # title empty for the even half — source A has an all-empty field
        title = "" if d % 2 == 0 else " ".join(_word(d * 2 + j) for j in range(2))
        rows.append((d, body, title))
    df = spark.createDataFrame(rows, "doc_id long, body string, title string")
    weights = {"body": 1.0, "title": 0.5}
    kw = dict(do_stem=False, doc_shard_size=8)
    full = build_fielded_packed(spark, df, weights, **kw)
    fa = build_fielded_packed(spark, df.filter("doc_id % 2 = 0"), weights, **kw)
    fb = build_fielded_packed(spark, df.filter("doc_id % 2 = 1"), weights, **kw)
    assert fa.avgdl_raw_by_field["title"] == 0.0  # the degenerate source
    assert fa.avgdl_by_field["title"] == 1.0      # scoring floor intact
    merged = merge_fielded_packed(spark, [fa, fb])
    for f in weights:
        assert abs(merged.avgdl_by_field[f] - full.avgdl_by_field[f]) < 1e-9, f
        assert abs(
            merged.avgdl_raw_by_field[f] - full.avgdl_raw_by_field[f]
        ) < 1e-9, f
    for terms in (["merge"], ["merge", "gamma"]):
        got = fielded_wand_topk(spark, merged, terms, k=10).collect()
        want = fielded_wand_topk(spark, full, terms, k=10).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], terms
        for g, w in zip(got, want):
            assert abs(g["score"] - w["score"]) < 1e-9


def test_three_way_merge(spark):
    pdf = corpus.generate_pandas(90, seed=11)
    src = spark.createDataFrame(pdf)
    kw = dict(do_stem=False, build_packed=True, doc_shard_size=8)
    full = build_index(spark, src, **kw)
    parts = [
        build_index(spark, src.filter(f"doc_id % 3 = {i}"), **kw)
        for i in range(3)
    ]
    merged = merge_packed_indexes(spark, parts)
    ts_m = {r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()}
    ts_f = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    assert ts_m == ts_f
    t = max(ts_f, key=lambda x: ts_f[x][0])
    got = wand_topk(spark, merged, [t], k=5).collect()
    want = wand_topk(spark, full, [t], k=5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


# ---------------------------------------------------------------------------
# kernel-level property: for ANY split of a posting group across sources,
# _merge_rows produces byte-identical output to packing the union directly
# (the merged == rebuilt invariant at codec granularity, incl. groups that
# cross the 128-posting block boundary)
# ---------------------------------------------------------------------------

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _split_groups(draw):
    n_srcs = draw(st.integers(min_value=2, max_value=3))
    ids = sorted(draw(st.sets(
        st.integers(min_value=0, max_value=600), min_size=n_srcs, max_size=300
    )))
    src_of = [draw(st.integers(min_value=0, max_value=n_srcs - 1)) for _ in ids]
    # every source must own at least one doc
    for s in range(n_srcs):
        if s not in src_of:
            src_of[s] = s
    docs = []
    for d in ids:
        tf = draw(st.integers(min_value=1, max_value=5))
        first = draw(st.integers(min_value=0, max_value=50))
        gaps = [draw(st.integers(min_value=1, max_value=9)) for _ in range(tf - 1)]
        positions = [first]
        for g in gaps:
            positions.append(positions[-1] + g)
        dl = draw(st.integers(min_value=1, max_value=300))
        docs.append((d, tf, dl, positions))
    avgdl = draw(st.floats(min_value=1.0, max_value=250.0))
    return n_srcs, src_of, docs, avgdl


def _pack_group(rows):
    from awesome_spark_search.build import _pack_many

    pdf = pd.DataFrame(
        {
            "term": ["t"] * len(rows),
            "doc_shard": [0] * len(rows),
            "doc_id": [r[0] for r in rows],
            "tf": [r[1] for r in rows],
            "doc_len": [r[2] for r in rows],
            "positions": [r[3] for r in rows],
        }
    ).sort_values("doc_id")
    return _pack_many(pdf, 10.0, 8)  # pack-time avgdl irrelevant to blobs


@given(_split_groups())
@settings(max_examples=40, deadline=None)
def test_merge_rows_equals_direct_pack_property(case):
    from awesome_spark_search.build import _pack_many
    from awesome_spark_search.merge import _merge_rows

    n_srcs, src_of, docs, avgdl = case
    per_src = [[d for d, s in zip(docs, src_of) if s == i] for i in range(n_srcs)]
    rows = [_pack_group(p).iloc[0] for p in per_src if p]
    merged = _merge_rows(rows, avgdl, 8)

    want = _pack_many(
        pd.DataFrame(
            {
                "term": ["t"] * len(docs),
                "doc_shard": [0] * len(docs),
                "doc_id": [d[0] for d in docs],
                "tf": [d[1] for d in docs],
                "doc_len": [d[2] for d in docs],
                "positions": [d[3] for d in docs],
            }
        ).sort_values("doc_id"),
        avgdl, 8,
    ).iloc[0]
    for col in ("n", "cf", "doc_ids_vb", "tfs_vb", "dls_vb", "pos_vb"):
        assert merged[col] == want[col], col
    for col in ("blk_doc_off", "blk_tf_off", "blk_dl_off", "blk_pos_off",
                "blk_first_doc"):
        assert list(merged[col]) == list(want[col]), col
    assert np.allclose(merged["block_max"], list(want["block_max"]))
