"""Block-max WAND top-k over the packed (compressed) index.

The reference prunes scoring candidates with a most-distinct-terms-first
heuristic (ref: src/querying/ranking/DocumentRanker.java:66-78). The rebuild's
block-max WAND strictly generalizes it (north rule): per posting block we have
an upper bound on the BM25 contribution (idf * block_max), so whole terms and
blocks that cannot reach the running top-k threshold are skipped before
decoding.

Spark shape — scalable by construction:
* packed postings are keyed (term, doc_shard) and carry their doc lengths
  inside the blob (dls_vb), so a query is ONE applyInPandas over the few
  matching packed rows — no doc_map join; every Python invocation sees one
  shard's worth of data (bounded by shard_size regardless of corpus size).
* each shard emits its local top-k; the global top-k is a tiny
  TakeOrderedAndProject over n_shards*k rows.
* inside a shard the evaluation is numpy-vectorized document-at-a-time over
  terms ordered by descending bound: once the k-th best exact score exceeds
  the cumulative bound of the remaining terms, docs not already seen cannot
  enter the top-k (the WAND admission invariant) and those terms only update
  existing candidates; blocks whose bound falls below the threshold are
  skipped entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from .build import Index, _py_term_bucket, K1, B
from .scoring import idf_col

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


# decoded-postings instrumentation (per-process; in distributed runs each
# Python worker counts its own shards — the test calls the shard fn directly)
DECODE_STATS = {"postings": 0, "pos_entries": 0, "dl_entries": 0}


def reset_decode_stats() -> None:
    DECODE_STATS["postings"] = 0
    DECODE_STATS["pos_entries"] = 0
    DECODE_STATS["dl_entries"] = 0


def _sorted_member(sorted_ids: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Boolean membership of ids (any order) in a sorted unique array."""
    if sorted_ids.size == 0 or ids.size == 0:
        return np.zeros(ids.size, dtype=bool)
    pos = np.searchsorted(sorted_ids, ids)
    pos_c = np.minimum(pos, sorted_ids.size - 1)
    return sorted_ids[pos_c] == ids


def _merge_scores(
    aid: np.ndarray, aval: np.ndarray, bid: np.ndarray, bval: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Merge-add two (sorted unique ids, values) score vectors."""
    if bid.size == 0:
        return aid, aval
    if aid.size == 0:
        return bid, bval
    mid = np.union1d(aid, bid)
    out = np.zeros(mid.size, dtype=np.float64)
    out[np.searchsorted(mid, aid)] += aval
    out[np.searchsorted(mid, bid)] += bval
    return mid, out


def _decode_term_blocks(
    r, need: np.ndarray | None, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """Decode a packed term row's (doc_ids, tfs, dls); when ``need`` is given,
    only blocks flagged True are decoded (contiguous runs sliced off the blob
    via the block directory — skipped blocks' bytes are never touched).
    Returns (doc_ids, tfs, dls, block_idx_per_posting or None for all)."""
    ids_buf = bytes(r["doc_ids_vb"])
    tf_buf = bytes(r["tfs_vb"])
    dl_buf = bytes(r["dls_vb"])
    if need is None or need.all():
        doc_ids = codec.delta_vbyte_decode_blocked(ids_buf)
        tfs = codec.vbyte_decode(tf_buf).astype(np.float64)
        dls = codec.vbyte_decode(dl_buf).astype(np.float64)
        return doc_ids, tfs, dls, None
    doc_off = np.asarray(r["blk_doc_off"], dtype=np.int64)
    tf_off = np.asarray(r["blk_tf_off"], dtype=np.int64)
    dl_off = np.asarray(r["blk_dl_off"], dtype=np.int64)
    idx = np.flatnonzero(need)
    # contiguous runs of needed blocks -> one byte-slice decode per run
    run_starts = idx[np.r_[True, np.diff(idx) > 1]]
    run_ends = idx[np.r_[np.diff(idx) > 1, True]] + 1
    id_parts, tf_parts, dl_parts, blk_parts = [], [], [], []
    for bi, bj in zip(run_starts.tolist(), run_ends.tolist()):
        gaps = codec.decode_block_slice(ids_buf, doc_off, bi, bj).astype(np.int64)
        id_parts.append(codec.cumsum_block_restart(gaps, codec.BLOCK))
        tf_parts.append(codec.decode_block_slice(tf_buf, tf_off, bi, bj))
        dl_parts.append(codec.decode_block_slice(dl_buf, dl_off, bi, bj))
        blk_parts.append(np.repeat(np.arange(bi, bj), counts[bi:bj]))
    return (
        np.concatenate(id_parts),
        np.concatenate(tf_parts).astype(np.float64),
        np.concatenate(dl_parts).astype(np.float64),
        np.concatenate(blk_parts),
    )



def _wand_pass(
    term_rows: list,
    avgdl: float,
    k: int,
    cand_ids: np.ndarray,
    cand_scores: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """The block-max WAND loop over ``term_rows`` (list of
    ``(idf, block_max ndarray, packed row)``), merge-adding contributions
    into the seed score vectors ``(cand_ids sorted unique, cand_scores)``.
    Seeds let a caller pre-score docs from another plan (phrase survivors in
    a Mixed query) — the admission invariant still holds because after
    seeding, the only remaining score mass is the listed terms' bounds.

    Block-level skipping (exact — returned scores are bit-identical to the
    exhaustive plan): terms iterate in descending bound order; once k
    candidates exist with running threshold theta, block b of term i is
    decoded only if

    * ``idf_i * block_max[b] + sum(bounds of terms after i) >= theta``
      (a doc first appearing in b could still reach the top-k), OR
    * the block's doc_id range [blk_first_doc[b], blk_first_doc[b+1])
      contains an existing candidate (whose exact score must keep growing).

    Skipped blocks' bytes are never decoded (the delta stream restarts per
    block, so surviving blocks decode standalone). Postings decoded from a
    candidate-range-only block are masked to existing candidates, which is
    score-safe: such a doc's max achievable total from term i onward is
    below theta <= the final k-th best."""
    # order terms by bound desc
    rows = []
    for idf, bm, r in term_rows:
        bound = idf * (bm.max() if bm.size else 0.0)
        rows.append((bound, idf, bm, r))
    rows.sort(key=lambda x: -x[0])
    bounds = np.array([b for b, _, _, _ in rows], dtype=np.float64)
    # suffix_after[i] = sum of bounds of terms AFTER i
    suffix_after = np.zeros(len(rows), dtype=np.float64)
    if len(rows) > 1:
        suffix_after[:-1] = np.cumsum(bounds[::-1])[::-1][1:]

    theta = (  # k-th best so far (seeds may already hold >= k candidates)
        float(np.partition(cand_scores, -k)[-k])
        if cand_ids.size >= k
        else -np.inf
    )
    for i, (bound, idf, bm, r) in enumerate(rows):
        rest_after = float(suffix_after[i])
        n = int(r["n"])
        nb = bm.size
        counts = np.full(nb, codec.BLOCK, dtype=np.int64)
        if nb:
            counts[-1] = n - codec.BLOCK * (nb - 1)
        if cand_ids.size >= k:
            admit = idf * bm + rest_after >= theta
            if admit.all():
                need = None
            else:
                first_doc = np.asarray(r["blk_first_doc"], dtype=np.int64)
                lo = np.searchsorted(cand_ids, first_doc)
                hi = np.append(lo[1:], cand_ids.size)
                need = admit | (hi > lo)
                if not need.any():
                    continue
        else:
            admit = None  # decode + admit everything until k candidates
            need = None
        doc_ids, tfs, dls, blk = _decode_term_blocks(r, need, counts)
        DECODE_STATS["postings"] += doc_ids.size
        # a row may carry its own dl normalizer (fielded lists pack each
        # zone against that ZONE's avgdl — fields.fielded_wand_topk); the
        # block_max bounds above were computed with the same value at pack
        # time, so skipping stays exact
        adl = float(r["avgdl"]) if "avgdl" in r.index else avgdl
        contrib = idf * tfs / (tfs + K1 * (1 - B + B * dls / adl))
        if admit is not None and not admit.all():
            # mask candidate-range-only blocks' postings to existing
            # candidates (blk is None when every block was decoded)
            posting_admit = (
                np.repeat(admit, counts) if blk is None else admit[blk]
            )
            keep = posting_admit | _sorted_member(cand_ids, doc_ids)
            doc_ids, contrib = doc_ids[keep], contrib[keep]
        cand_ids, cand_scores = _merge_scores(
            cand_ids, cand_scores, doc_ids, contrib
        )
        if cand_ids.size >= k:
            theta = float(np.partition(cand_scores, -k)[-k])
    return cand_ids, cand_scores


def _local_topk(cand_ids: np.ndarray, cand_scores: np.ndarray, k: int) -> pd.DataFrame:
    """Score vectors -> the shard-local top-k frame (score DESC, doc_id ASC)."""
    if cand_ids.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
    take = min(k, cand_ids.size)
    sel = np.lexsort((cand_ids, -cand_scores))[:take]
    return pd.DataFrame({"doc_id": cand_ids[sel], "score": cand_scores[sel]})


def _term_rows(left: pd.DataFrame) -> list:
    """Packed pandas rows -> [(idf, block_max ndarray, row), ...]."""
    return [
        (float(r["idf"]), np.asarray(r["block_max"], dtype=np.float64), r)
        for _, r in left.iterrows()
    ]


def _shard_topk_factory(avgdl: float, k: int):
    """Returns the applyInPandas fn: packed rows of one doc_shard ->
    local top-k (the ``_wand_pass`` loop with empty seeds). Doc lengths are
    decoded from the blob itself (dls_vb), so no doc_map join/cogroup happens
    at query time; per-term idf arrives as a column (broadcast-joined) so the
    whole query is ONE Spark action."""

    def shard_topk(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _local_topk(np.zeros(0, np.int64), np.zeros(0, np.float64), k)
        cand_ids, cand_scores = _wand_pass(
            _term_rows(left), avgdl, k,
            np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64),
        )
        return _local_topk(cand_ids, cand_scores, k)

    return shard_topk


def _packed_with_idf(
    index: Index, terms: list[str], n_term_buckets: int,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Bucket-pruned packed rows of ``terms`` with a broadcast-joined idf
    column (weights, when given, are folded into idf — BM25 contributions
    are linear in idf, so ``w * idf`` IS the weighted score; the PRF pass-2
    down-weights its expansion terms this way, ref DocumentRanker.java:38)."""
    st = index.stats
    buckets = sorted({_py_term_bucket(t, n_term_buckets) for t in terms})
    ts = (
        index.term_stats.filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .withColumn("idf", idf_col(F.col("df"), st.n_docs))
        .select("term", "idf")
    )
    if weights:
        wmap = F.create_map(
            *[F.lit(x) for t, w in weights.items() for x in (t, float(w))]
        )
        ts = ts.withColumn(
            "idf", F.col("idf") * F.coalesce(wmap[F.col("term")], F.lit(1.0))
        )
    return (
        index.packed.filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(ts), "term")
    )


def wand_topk(
    spark: SparkSession,
    index: Index,
    terms: list[str],
    k: int = 10,
    n_term_buckets: int = 64,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k BM25 via block-max WAND on the packed index. Result is
    rank-identical to the DataFrame BM25 path (verified in tests).
    ``weights`` scales per-term contributions (PRF expansion terms at 0.25);
    unlisted terms default to 1.0.

    ONE Spark action: the per-term idf is attached via a broadcast join of
    the (bucket-pruned, term-filtered) term_stats rows onto the packed rows
    instead of a separate driver-side collect — halves the per-query fixed
    cost on the serving path."""
    assert index.packed is not None, "index built without packed postings"
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    packed = _packed_with_idf(index, terms, n_term_buckets, weights)
    local = packed.groupBy("doc_shard").applyInPandas(
        _shard_topk_factory(index.stats.avgdl, k), RESULT_SCHEMA
    )
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


BATCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# the FINAL batch result shape (shard-local rows get a rank from the global
# window); the empty-batch early return must match it so downstream selects
# of 'rank' work on degenerate batches too
BATCH_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _batch_shard_factory(
    specs: dict[str, tuple[list[str], list[str]]], avgdl: float, k: int
):
    """applyInPandas: the UNION of all batch queries' packed rows in one
    doc_shard -> per-query local top-k. ``specs`` maps query_id ->
    (phrase_terms, keyword_terms): keyword-only queries run their own
    ``_wand_pass`` (block skipping stays per-query exact), phrase-only
    queries run ``_phrase_eval``, Mixed queries seed WAND with the phrase
    survivors — each exactly the single-query kernel. What is shared is the
    expensive part: the single bucket-pruned scan, the shuffle, and the
    per-action fixed cost."""
    ordered = [
        (qid, list(ph), list(dict.fromkeys(kw)))
        for qid, (ph, kw) in specs.items()
    ]

    def shard_batch(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _empty_batch_pdf()
        rows = {r["term"]: r for _, r in left.iterrows()}
        triples = {
            t: (float(r["idf"]), np.asarray(r["block_max"], dtype=np.float64), r)
            for t, r in rows.items()
        }
        parts = []
        for qid, ph, kw in ordered:
            if ph:
                cand_ids, cand_scores = _phrase_eval(rows, ph, avgdl)
                if not kw and cand_ids.size == 0:
                    continue
            else:
                cand_ids = np.zeros(0, dtype=np.int64)
                cand_scores = np.zeros(0, dtype=np.float64)
            kw_rows = [triples[t] for t in kw if t in rows]
            if kw_rows:
                cand_ids, cand_scores = _wand_pass(
                    kw_rows, avgdl, k, cand_ids, cand_scores
                )
            elif kw and cand_ids.size == 0:
                continue  # keyword terms absent from this shard, no phrase seeds
            pdf = _local_topk(cand_ids, cand_scores, k)
            if len(pdf):
                pdf.insert(0, "query_id", qid)
                parts.append(pdf)
        return pd.concat(parts, ignore_index=True) if parts else _empty_batch_pdf()

    return shard_batch


def _batch_global_topk(local: DataFrame, k: int) -> DataFrame:
    """Per-query global top-k over the shard-local batch rows: one window
    (n_shards * k * n_queries tiny rows; Spark pushes a WindowGroupLimit
    below the exchange so each partition pre-prunes to k)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def batch_topk(
    spark: SparkSession,
    index: Index,
    specs: dict[str, tuple[list[str], list[str]]],
    k: int = 10,
    n_term_buckets: int = 64,
) -> DataFrame:
    """Batched top-k over MIXED query types in ONE Spark action: each
    ``specs`` value is (phrase_terms, keyword_terms) — ([], kw) is a plain
    keyword query, (ph, []) an exact phrase, (ph, kw) a Mixed query. One
    bucket-pruned packed scan of the union of every query's terms, one
    per-shard applyInPandas running each query's own kernel, one window for
    the per-query global top-k. Per-query results are rank+score identical
    to wand_topk / phrase_topk / mixed_topk (tests/test_batch.py)."""
    assert index.packed is not None, "index built without packed postings"
    all_terms = sorted(
        {t for ph, kw in specs.values() for t in [*ph, *kw]}
    )
    if not all_terms:
        return spark.createDataFrame([], BATCH_TOPK_SCHEMA)
    packed = _packed_with_idf(index, all_terms, n_term_buckets)
    local = packed.groupBy("doc_shard").applyInPandas(
        _batch_shard_factory(specs, index.stats.avgdl, k),
        BATCH_RESULT_SCHEMA,
    )
    return _batch_global_topk(local, k)


def wand_topk_many(
    spark: SparkSession,
    index: Index,
    term_sets: dict[str, list[str]],
    k: int = 10,
    n_term_buckets: int = 64,
) -> DataFrame:
    """Batched top-k BM25: the whole query BATCH in ONE Spark action.

    The serving cost of a single query at scale is dominated by fixed
    per-action work (job scheduling, the packed scan's task launch, one
    shuffle) — amortizing it across a workload is the real queries/sec lever
    on a 1000-executor cluster (the reference serves queries one at a time
    from a REPL, src/SearchCli.java; batching is the Spark-first upgrade of
    that loop). Every batch query's packed rows arrive in one bucket-pruned
    scan (union of all terms), each doc_shard runs the per-query block-max
    WAND loops over the SAME scanned rows, and the global per-query top-k is
    a single window over n_shards * k * n_queries tiny local rows. Results
    are rank+score identical to per-query ``wand_topk`` (pinned by
    tests/test_batch.py). Keyword-only sugar over ``batch_topk``, which also
    carries phrase and Mixed queries in the same action."""
    return batch_topk(
        spark, index, {qid: ([], ts) for qid, ts in term_sets.items()},
        k=k, n_term_buckets=n_term_buckets,
    )


def _ql_decode_row(r, lam: float, C: float) -> tuple[np.ndarray, np.ndarray]:
    """One packed row -> (doc_ids, per-doc QL/JM contributions). THE
    single-vs-batched exactness contract: both shard factories score through
    this one expression (ref formula: DocumentRanker.java:33 —
    log((1-l)*tf/dl + l*cf/C), dl floored at 1)."""
    ids = codec.delta_vbyte_decode_blocked(bytes(r["doc_ids_vb"]))
    tfs = codec.vbyte_decode(bytes(r["tfs_vb"])).astype(np.float64)
    dls = codec.vbyte_decode(bytes(r["dls_vb"])).astype(np.float64)
    DECODE_STATS["postings"] += ids.size
    contrib = np.log(
        (1.0 - lam) * tfs / np.maximum(dls, 1.0)
        + lam * float(r["cf_global"]) / C
    )
    return ids, contrib


def _packed_with_cf(
    index: Index, terms: list[str], n_term_buckets: int
) -> DataFrame:
    """Bucket-pruned packed rows of ``terms`` with the broadcast-joined
    GLOBAL collection frequency (aliased cf_global: packed group rows carry
    a per-(term, doc_shard) cf; the JM background model needs the term's
    corpus-wide cf). The QL analog of ``_packed_with_idf``, shared by the
    single-query and batched plans."""
    buckets = sorted({_py_term_bucket(t, n_term_buckets) for t in terms})
    ts = (
        index.term_stats.filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", F.col("cf").alias("cf_global"))
    )
    return (
        index.packed.filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(ts), "term")
    )


def _empty_batch_pdf() -> pd.DataFrame:
    return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
        {"query_id": "object", "doc_id": "int64", "score": "float64"}
    )


def _ql_shard_factory(lam: float, total_tokens: int, k: int):
    """applyInPandas: packed rows of one doc_shard -> local QL/JM top-k.
    No block skipping: QL contributions are negative log-mixtures, so there
    is no admission bound like BM25's idf*block_max — the pass is a full
    decode of the (bucket-pruned) query terms' lists, still one bounded
    shard per Python invocation."""
    C = float(max(total_tokens, 1))

    def shard_ql(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _local_topk(np.zeros(0, np.int64), np.zeros(0, np.float64), k)
        cand_ids = np.zeros(0, dtype=np.int64)
        cand_scores = np.zeros(0, dtype=np.float64)
        for _, r in left.iterrows():
            ids, contrib = _ql_decode_row(r, lam, C)
            cand_ids, cand_scores = _merge_scores(
                cand_ids, cand_scores, ids, contrib
            )
        return _local_topk(cand_ids, cand_scores, k)

    return shard_ql


def ql_topk(
    spark: SparkSession,
    index: Index,
    terms: list[str],
    k: int = 10,
    n_term_buckets: int = 64,
    lam: float | None = None,
) -> DataFrame:
    """Query-likelihood / Jelinek-Mercer top-k entirely off the packed index
    (ref scorer: src/querying/ranking/DocumentRanker.java:33, 138-167 —
    score(d) = sum_t log((1-l)*tf/dl + l*cf/C)). ONE Spark action, identical
    shape to ``wand_topk``: bucket-pruned packed scan, broadcast-joined cf
    column, per-shard decode (dl rides in dls_vb, so no doc_map join), tiny
    global top-k. Rank+score identical to ``scoring.ql_jm_score`` over the
    long table — sum over MATCHED terms only, dl floored at 1."""
    from .scoring import JM_LAMBDA

    assert index.packed is not None, "index built without packed postings"
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    if lam is None:
        lam = JM_LAMBDA
    st = index.stats
    packed = _packed_with_cf(index, terms, n_term_buckets)
    local = packed.groupBy("doc_shard").applyInPandas(
        _ql_shard_factory(lam, st.total_tokens, k), RESULT_SCHEMA
    )
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def _ql_batch_shard_factory(
    term_sets: dict[str, list[str]], lam: float, total_tokens: int, k: int
):
    """applyInPandas: batched QL/JM over one doc_shard. Unlike the WAND
    batch (where block skipping is per-query), QL always decodes a term's
    full lists — so the decode is done ONCE per term and SHARED by every
    query in the batch that uses it (exact: contributions are per-(term,
    doc) values independent of the query mix)."""
    C = float(max(total_tokens, 1))
    ordered = [(qid, list(dict.fromkeys(ts))) for qid, ts in term_sets.items()]

    def shard_ql(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _empty_batch_pdf()
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for _, r in left.iterrows():
            decoded[r["term"]] = _ql_decode_row(r, lam, C)
        parts = []
        for qid, terms in ordered:
            cand_ids = np.zeros(0, dtype=np.int64)
            cand_scores = np.zeros(0, dtype=np.float64)
            for t in terms:
                if t in decoded:
                    ids, contrib = decoded[t]
                    cand_ids, cand_scores = _merge_scores(
                        cand_ids, cand_scores, ids, contrib
                    )
            pdf = _local_topk(cand_ids, cand_scores, k)
            if len(pdf):
                pdf.insert(0, "query_id", qid)
                parts.append(pdf)
        return pd.concat(parts, ignore_index=True) if parts else _empty_batch_pdf()

    return shard_ql


def ql_topk_many(
    spark: SparkSession,
    index: Index,
    term_sets: dict[str, list[str]],
    k: int = 10,
    n_term_buckets: int = 64,
    lam: float | None = None,
) -> DataFrame:
    """Batched QL/JM keyword top-k in ONE Spark action — the ``ql_topk``
    shape (bucket-pruned packed scan, broadcast global cf, per-shard decode)
    shared by the whole batch, with each term's lists decoded once per shard
    regardless of how many queries use it. Per-query rank+score identical to
    ``ql_topk`` (tests/test_batch.py)."""
    from .scoring import JM_LAMBDA

    assert index.packed is not None, "index built without packed postings"
    all_terms = sorted({t for ts in term_sets.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], BATCH_TOPK_SCHEMA)
    if lam is None:
        lam = JM_LAMBDA
    st = index.stats
    packed = _packed_with_cf(index, all_terms, n_term_buckets)
    local = packed.groupBy("doc_shard").applyInPandas(
        _ql_batch_shard_factory(term_sets, lam, st.total_tokens, k),
        BATCH_RESULT_SCHEMA,
    )
    return _batch_global_topk(local, k)


def mixed_topk(
    spark: SparkSession,
    index: Index,
    phrase_terms: list[str],
    keyword_terms: list[str],
    k: int = 10,
    n_term_buckets: int = 64,
) -> DataFrame:
    """Mixed-query top-k ('"exact phrase" extra words') entirely off the
    packed index, ONE Spark action: every term's packed rows arrive in one
    bucket-pruned scan, and each doc_shard runs phrase-eval + seeded WAND in
    a single applyInPandas pass (ref: QueryProcessor.java:328-331)."""
    assert index.packed is not None, "index built without packed postings"
    if not phrase_terms and not keyword_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    all_terms = list(dict.fromkeys([*phrase_terms, *keyword_terms]))
    packed = _packed_with_idf(index, all_terms, n_term_buckets)
    local = packed.groupBy("doc_shard").applyInPandas(
        _mixed_shard_factory(phrase_terms, keyword_terms, index.stats.avgdl, k),
        RESULT_SCHEMA,
    )
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def _positions_for_docs(
    r, ids_t: np.ndarray, tfs_t: np.ndarray, docs: np.ndarray
) -> dict[int, np.ndarray]:
    """Positions of ``docs`` (sorted, all present in this term's posting
    list) decoded from ONLY the position-stream blocks that contain them —
    the blk_pos_off directory slices the [tf, gaps...] stream at 128-doc
    block heads, so untouched blocks' bytes are never inflated. Returns
    {doc_id: absolute positions}."""
    buf = bytes(r["pos_vb"])
    pos_off = np.asarray(r["blk_pos_off"], dtype=np.int64)
    nb = pos_off.size
    pos_in_t = np.searchsorted(ids_t, docs)
    blk = pos_in_t // codec.BLOCK
    idx = np.unique(blk)
    run_starts = idx[np.r_[True, np.diff(idx) > 1]]
    run_ends = idx[np.r_[np.diff(idx) > 1, True]] + 1
    out: dict[int, np.ndarray] = {}
    for bi, bj in zip(run_starts.tolist(), run_ends.tolist()):
        end = int(pos_off[bj]) if bj < nb else len(buf)
        seg = codec.vbyte_decode(buf[int(pos_off[bi]): end]).astype(np.int64)
        DECODE_STATS["pos_entries"] += seg.size
        j0 = bi * codec.BLOCK
        j1 = min(bj * codec.BLOCK, ids_t.size)
        tf_seg = tfs_t[j0:j1]
        # marker offset of doc j (relative to the run) = sum of (tf+1) before it
        marks = np.zeros(j1 - j0, dtype=np.int64)
        np.cumsum(tf_seg[:-1] + 1, out=marks[1:])
        in_run = (blk >= bi) & (blk < bj)
        for p, d in zip(pos_in_t[in_run].tolist(), docs[in_run].tolist()):
            m = marks[p - j0]
            tf = int(tf_seg[p - j0])
            out[int(d)] = np.cumsum(seg[m + 1: m + 1 + tf])
    return out


def _sliced_posting_values(
    buf: bytes, off: np.ndarray, pos_in_t: np.ndarray
) -> np.ndarray:
    """Per-posting values (a non-delta varint stream: dls or tfs) at posting
    positions ``pos_in_t`` within one term's list, decoding ONLY the
    128-posting blocks that contain them via the per-block byte-offset
    directory — untouched blocks' bytes are never inflated."""
    blk = pos_in_t // codec.BLOCK
    idx = np.unique(blk)
    run_starts = idx[np.r_[True, np.diff(idx) > 1]]
    run_ends = idx[np.r_[np.diff(idx) > 1, True]] + 1
    out = np.empty(pos_in_t.size, dtype=np.int64)
    for bi, bj in zip(run_starts.tolist(), run_ends.tolist()):
        seg = codec.decode_block_slice(buf, off, bi, bj)
        DECODE_STATS["dl_entries"] += seg.size
        in_run = (blk >= bi) & (blk < bj)
        out[in_run] = seg[pos_in_t[in_run] - bi * codec.BLOCK]
    return out


def _phrase_eval(
    rows: dict, terms: list[str], avgdl: float
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-phrase evaluation within one doc_shard (ref adjacency
    semantics: QueryProcessor.java:223-293). ``rows`` maps term -> packed
    pandas row (idf joined in). Returns (survivor doc_ids sorted ASC, their
    summed BM25 scores over the phrase's distinct terms) — empty arrays when
    a term is missing from the shard or no doc holds the phrase.

    Two-stage decode, scalable at 1M-posting shards: stage 1 intersects the
    cheap doc_id blobs of all phrase terms (docs missing any term can never
    match); stage 2 decodes POSITIONS only for the blocks that contain the
    surviving docs, via the blk_pos_off directory — the position stream is
    the largest blob and for selective phrases almost none of it is read."""
    no_match = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64))
    distinct_terms = list(dict.fromkeys(terms))
    if any(t not in rows for t in distinct_terms):
        return no_match
    # stage 1: doc-level intersection from the doc_id blobs only
    ids = {
        t: codec.delta_vbyte_decode_blocked(bytes(rows[t]["doc_ids_vb"]))
        for t in distinct_terms
    }
    surv = ids[distinct_terms[0]]
    for t in distinct_terms[1:]:
        surv = np.intersect1d(surv, ids[t], assume_unique=True)
        if surv.size == 0:
            return no_match
    tfs = {
        t: codec.vbyte_decode(bytes(rows[t]["tfs_vb"])).astype(np.int64)
        for t in distinct_terms
    }
    if len(terms) > 1:
        # stage 2: candidate-block-only position decode per term
        pos = {
            t: _positions_for_docs(rows[t], ids[t], tfs[t], surv)
            for t in distinct_terms
        }
        # ordered positional adjacency: cur = positions where a prefix of
        # the phrase ends; survive docs where every step keeps a match
        cur = {int(d): pos[terms[0]][int(d)] for d in surv}
        for t in terms[1:]:
            nxt = pos[t]
            cur = {
                d: hits
                for d, p in cur.items()
                if len(hits := np.intersect1d(p + 1, nxt[d], assume_unique=True))
            }
            if not cur:
                return no_match
        survivors = np.fromiter(sorted(cur), np.int64)
    else:
        # a one-word "phrase" matches wherever the word occurs — no
        # adjacency to check, so the position stream is never touched
        survivors = surv
    # doc lengths decode from the first term's blob (survivors are a
    # subset of every phrase term's posting list), sliced to survivors'
    # blocks via blk_dl_off — at 1M-posting shards the full-blob varint
    # pass this replaces was the last per-term O(n) decode on this path
    r0 = rows[distinct_terms[0]]
    dls = _sliced_posting_values(
        bytes(r0["dls_vb"]),
        np.asarray(r0["blk_dl_off"], dtype=np.int64),
        np.searchsorted(ids[distinct_terms[0]], survivors),
    ).astype(np.float64)
    scores = np.zeros(len(survivors), np.float64)
    for t in distinct_terms:
        tf = tfs[t][np.searchsorted(ids[t], survivors)].astype(np.float64)
        scores += float(rows[t]["idf"]) * tf / (
            tf + K1 * (1 - B + B * dls / avgdl)
        )
    return survivors, scores


def _phrase_shard_factory(terms: list[str], avgdl: float, k: int):
    """applyInPandas: packed rows of the phrase terms in one doc_shard ->
    local top-k of docs containing the exact phrase (``_phrase_eval``). idf
    arrives as a joined column (one Spark action per query, like wand_topk)."""

    def shard_phrase(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _local_topk(np.zeros(0, np.int64), np.zeros(0, np.float64), k)
        rows = {r["term"]: r for _, r in left.iterrows()}
        survivors, scores = _phrase_eval(rows, terms, avgdl)
        return _local_topk(survivors, scores, k)

    return shard_phrase


def _mixed_shard_factory(
    phrase_terms: list[str], keyword_terms: list[str], avgdl: float, k: int
):
    """applyInPandas: packed rows of ALL the query's terms in one doc_shard
    -> local top-k of the Mixed query (ref: QueryProcessor.java:328-331
    dispatches phrase + remaining keywords against the same index).

    Semantics mirror the DataFrame plan (``QueryExecutor._matches`` unions
    phrase-survivor postings with keyword postings before scoring): phrase
    survivors seed the candidate set with their phrase-term BM25 mass, then
    the block-max WAND loop adds every keyword term's contributions — to all
    matching docs, survivors included (a term in both lists counts twice for
    survivors, exactly like the unioned long-table plan). Seeding first keeps
    the skip criterion exact: after the seeds, keyword bounds are the only
    remaining mass, so the standard admission invariant applies unchanged."""
    kw_distinct = list(dict.fromkeys(keyword_terms))

    def shard_mixed(left: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _local_topk(np.zeros(0, np.int64), np.zeros(0, np.float64), k)
        rows = {r["term"]: r for _, r in left.iterrows()}
        cand_ids, cand_scores = _phrase_eval(rows, phrase_terms, avgdl)
        kw_rows = [
            (
                float(rows[t]["idf"]),
                np.asarray(rows[t]["block_max"], dtype=np.float64),
                rows[t],
            )
            for t in kw_distinct
            if t in rows
        ]
        if kw_rows:
            cand_ids, cand_scores = _wand_pass(
                kw_rows, avgdl, k, cand_ids, cand_scores
            )
        return _local_topk(cand_ids, cand_scores, k)

    return shard_mixed


def phrase_topk(
    spark: SparkSession,
    index: Index,
    terms: list[str],
    k: int = 10,
    n_term_buckets: int = 64,
) -> DataFrame:
    """Exact-phrase top-k BM25 entirely off the packed (compressed) index:
    positions decode only for the phrase's terms, per doc-shard, and each
    shard emits a bounded local top-k (north rule: positional query support
    over the delta+VByte posting blobs)."""
    assert index.packed is not None, "index built without packed postings"
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    distinct_terms = list(dict.fromkeys(terms))
    # a phrase term missing from the whole index means no shard has all the
    # terms, so every shard returns empty via its own completeness check —
    # no driver-side existence collect needed
    packed = _packed_with_idf(index, distinct_terms, n_term_buckets)
    local = packed.groupBy("doc_shard").applyInPandas(
        _phrase_shard_factory(terms, index.stats.avgdl, k), RESULT_SCHEMA
    )
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


DOCSET_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType(), False)])


def _eval_docset(spec, by_term: dict) -> np.ndarray:
    """Evaluate a boolean spec against per-term sorted doc_id arrays of ONE
    doc_shard. spec = ("terms", [t...]) | (op, left, right), op in and/or/not.
    Doc-sets partition cleanly by shard, so shard-local evaluation is exact."""
    if spec[0] == "terms":
        arrs = [by_term[t] for t in spec[1] if t in by_term]
        if not arrs:
            return np.zeros(0, np.int64)
        out = arrs[0]
        for a in arrs[1:]:
            out = np.union1d(out, a)
        return out
    left = _eval_docset(spec[1], by_term)
    right = _eval_docset(spec[2], by_term)
    if spec[0] == "and":
        return np.intersect1d(left, right, assume_unique=True)
    if spec[0] == "or":
        return np.union1d(left, right)
    if spec[0] == "not":
        return np.setdiff1d(left, right, assume_unique=True)
    raise ValueError(spec[0])


def boolean_docs(
    spark: SparkSession,
    index: Index,
    spec,
    k: int = 10,
    n_term_buckets: int = 64,
) -> DataFrame:
    """Boolean doc-set query over the packed index: per-shard decode of the
    involved terms' doc_id blobs, numpy set algebra, recency top-k
    (doc_id DESC — ref: QueryProcessor.java:112-114). Returns (doc_id, score
    NULL)."""
    assert index.packed is not None

    def all_terms(s):
        return list(s[1]) if s[0] == "terms" else all_terms(s[1]) + all_terms(s[2])

    terms = sorted(set(all_terms(spec)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    buckets = sorted({_py_term_bucket(t, n_term_buckets) for t in terms})
    packed = (
        index.packed.filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("doc_shard", "term", "doc_ids_vb")
    )

    def shard_eval(left: pd.DataFrame) -> pd.DataFrame:
        by_term: dict = {}
        for _, r in left.iterrows():
            by_term[r["term"]] = codec.delta_vbyte_decode_blocked(bytes(r["doc_ids_vb"]))
        out = _eval_docset(spec, by_term)
        out = np.sort(out)[::-1][:k]  # shard-local recency top-k
        return pd.DataFrame({"doc_id": out})

    local = packed.groupBy("doc_shard").applyInPandas(shard_eval, DOCSET_SCHEMA)
    return (
        local.orderBy(F.col("doc_id").desc())
        .limit(k)
        .withColumn("score", F.lit(None).cast("double"))
    )


def decode_postings(index: Index, term: str, n_term_buckets: int = 64,
                    with_positions: bool = False) -> DataFrame:
    """Decode one term's packed blobs back to (doc_id, tf[, pos]) rows —
    the external round-trip gate for the delta+VByte+position-stream codec
    (ref semantics: src/postings/TokenPostings.java:201-243,
    EagerPositionMap.java:128-171)."""
    bucket = _py_term_bucket(term, n_term_buckets)
    rows = index.packed.filter(
        (F.col("term_bucket") == bucket) & (F.col("term") == term)
    ).select("doc_ids_vb", "tfs_vb", "pos_vb")

    if not with_positions:
        def gen(batches):
            for pdf in batches:
                for _, r in pdf.iterrows():
                    ids = codec.delta_vbyte_decode_blocked(bytes(r["doc_ids_vb"]))
                    tfs = codec.vbyte_decode(bytes(r["tfs_vb"]))
                    yield pd.DataFrame(
                        {"doc_id": ids.astype(np.int64), "tf": tfs.astype(np.int32)}
                    )

        return rows.mapInPandas(gen, "doc_id long, tf int")

    def gen_pos(batches):
        for pdf in batches:
            for _, r in pdf.iterrows():
                ids = codec.delta_vbyte_decode_blocked(bytes(r["doc_ids_vb"]))
                stream = codec.vbyte_decode(bytes(r["pos_vb"])).astype(np.int64)
                out_ids, out_pos = [], []
                i = 0
                for d in ids:
                    n = int(stream[i]); i += 1
                    gaps = stream[i: i + n]; i += n
                    out_pos.extend(np.cumsum(gaps).tolist())
                    out_ids.extend([int(d)] * n)
                yield pd.DataFrame({"doc_id": out_ids, "pos": out_pos})

    return rows.mapInPandas(gen_pos, "doc_id long, pos int")

