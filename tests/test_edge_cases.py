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


def test_spell_correction_exact_at_any_vocab_size(spark):
    """With the driver vocabulary cache disabled (VOCAB_CACHE_MAX=0, the
    10^8-term-corpus regime), a PARTIALLY matching query must still get its
    misspelled token corrected via the per-query term_stats existence
    semi-filter — reference corrects every posting-less token, not only fully
    empty results (ref: QueryProcessor.java:397-417)."""
    idx = _build(
        spark,
        [
            (0, "buffer merge stream"),
            (1, "buffer compact stream"),
            (2, "merge window stream"),
        ],
    )
    ex = QueryExecutor(spark, idx)
    ex.VOCAB_CACHE_MAX = 0  # force the no-dictionary path
    assert ex._get_vocab() is None
    rows = ex.search("buffer mrege", k=10).collect()
    assert ex.last_corrections == {"mrege": "merge"}
    # identical to the well-spelled query on the cached-vocab path
    ex2 = QueryExecutor(spark, idx)
    want = ex2.search("buffer merge", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_batched_spelling_one_job_for_three_typos(spark):
    """A query with 3 misspelled tokens runs ONE correction job (batched
    dictionary scan + pair-distance pass), not one per typo — asserted via
    the Spark status tracker on a dedicated job group. Results match the
    per-term API exactly."""
    from awesome_spark_search.spell import correct_term, correct_terms

    idx = _build(
        spark,
        [
            (0, "buffer merge stream window"),
            (1, "buffer compact stream scan"),
            (2, "merge window stream batch"),
        ],
    )
    # batched == per-term, including the (distance, cf desc, term asc) tie-break
    typos = ["mrege", "bufer", "windwo"]
    batched = correct_terms(typos, idx.term_stats)
    singles = {t: correct_term(t, idx.term_stats) for t in typos}
    assert batched == {t: c for t, c in singles.items() if c is not None}
    assert batched == {"mrege": "merge", "bufer": "buffer", "windwo": "window"}

    # ONE action either way — AQE splits an action into a few jobs, so the
    # invariant is: job count does NOT scale with typo count (was 3 jobs per
    # typo with the per-term loop)
    sc = spark.sparkContext

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j3 = jobs_for("spellbatch3", lambda: correct_terms(typos, idx.term_stats))
    j1 = jobs_for("spellbatch1", lambda: correct_terms(typos[:1], idx.term_stats))
    assert j3 == j1, (j3, j1)

    # end-to-end: multi-typo search applies all corrections
    ex = QueryExecutor(spark, idx)
    ex.search("bufer mrege", k=10).collect()
    assert ex.last_corrections == {"bufer": "buffer", "mrege": "merge"}


def test_unrestricted_dl_variant_changes_candidate_choice(spark):
    """The 'dl' variant (the reference's true Damerau-Levenshtein) admits
    corrections OSA rejects: 'aab' -> 'abcca' is distance 3 under
    unrestricted DL (edits across the transposed pair are allowed) but 4
    under OSA — only the 'dl' variant corrects it within MAX_DISTANCE=3.
    Both candidates share the first char and are within the length band, so
    the divergence is in the distance itself, not the candidate filter."""
    from awesome_spark_search.spell import correct_terms

    ts = spark.createDataFrame(
        [("abcca", 5, 0)], "term string, cf long, term_bucket int"
    )
    assert correct_terms(["aab"], ts, variant="dl") == {"aab": "abcca"}
    assert correct_terms(["aab"], ts, variant="osa") == {}


def test_localize_null_scores_without_arrow(spark):
    """Boolean/unranked scores must come back NULL (not NaN) regardless of
    the caller session's Arrow conf — the external driver's session is not
    ours to configure, and with arrow disabled a pandas Float64 NA lands as
    NaN unless the plan folds it back to NULL."""
    idx = _build(spark, [(0, "alpha beta"), (1, "beta gamma")])
    ex = QueryExecutor(spark, idx)
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key)
    try:
        for flag in ("false", "true"):
            spark.conf.set(key, flag)
            rows = ex.search("alpha AND beta", k=5).collect()
            assert [r["doc_id"] for r in rows] == [0]
            assert all(r["score"] is None for r in rows), (flag, rows)
    finally:
        spark.conf.set(key, old)


def test_lsh_exact_dup_prepass_and_bucket_cap(spark):
    """Boilerplate skew: k byte-identical docs alone would make a k^2 LSH
    bucket. The exact-dedup pre-pass collapses them to one canonical doc, and
    the bucket cap drops any oversized bucket (observable via
    lsh_bucket_sizes, never silent)."""
    from awesome_spark_search import dedup

    boiler = "copyright header license boilerplate text repeated everywhere"
    rows = [(i, boiler) for i in range(30)] + [
        (100, "unique document alpha beta gamma delta content here"),
        (101, "unique document alpha beta gamma delta content there"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # default guards: identical docs collapse -> no quadratic pair blowup;
    # the two genuine near-dups still pair
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    assert (100, 101) in pairs
    assert not any(a < 30 and b < 30 for a, b in pairs)

    # guards off: the boilerplate bucket exists and is k-sized (diagnostic
    # run with dedup_exact matching the capped run below)
    sizes = dedup.lsh_bucket_sizes(docs, dedup_exact=False)
    assert sizes.agg(F.max("n_docs")).collect()[0][0] == 30
    # with the default pre-pass the diagnostic sees the collapsed buckets
    assert (
        dedup.lsh_bucket_sizes(docs).agg(F.max("n_docs")).collect()[0][0] <= 2
    )

    # cap without dedup: the oversized bucket emits no pairs and is listed
    capped = dedup.lsh_candidate_pairs(
        docs, max_bucket_size=8, dedup_exact=False
    )
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert not any(a < 30 and b < 30 for a, b in got)
    assert (100, 101) in got
    dropped = sizes.filter(F.col("n_docs") > 8).count()
    assert dropped > 0

    # uncapped + no dedup: the quadratic blowup the guards prevent
    raw = dedup.lsh_candidate_pairs(
        docs, max_bucket_size=None, dedup_exact=False
    ).count()
    assert raw >= 30 * 29 // 2


def test_prf_terms_come_from_snippets_not_full_content(spark):
    """Snippet-parity discriminator: 'zzfiller' dominates the full document
    text but never shares a sentence with the query term, so the generated
    snippet (and therefore the PRF expansion, QueryProcessor.java:427-438)
    must exclude it — the old full-content PRF would rank it first."""
    from awesome_spark_search import queries as Q

    rows = [
        (i, "alpha signal beacon here. zzfiller zzfiller zzfiller zzfiller.")
        for i in range(3)
    ] + [(3, "beacon signal unrelated.")]
    src = spark.createDataFrame(rows, "doc_id long, content string")
    from awesome_spark_search.build import build_index as _bi

    idx = _bi(spark, src, do_stem=False, build_packed=False)
    ex = QueryExecutor(spark, idx, source_df=src)
    top = ex.search("alpha", k=3).collect()
    pq = Q.parse("alpha #3", tokenize=ex._tokenize_query)
    terms = ex._prf_terms(pq, top, 3)
    assert "zzfiller" not in terms
    assert {"beacon", "signal"} <= set(terms)
