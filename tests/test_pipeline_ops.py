"""PII redaction and benchmark-contamination operators (training-data
pipeline family): targeted fixtures beyond the driver's oracle gate."""

from pyspark.sql import functions as F

from awesome_spark_search.dedup import contamination_scores
from awesome_spark_search.textstats import redact_pii


def test_redact_pii_counts_and_replacement(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail bob.jones+x@sub.example.co.uk and carol@ex.org today"),
            (1, "call 555-123-4567 or 800.555.1212 now"),
            (2, "hosts 10.0.0.1 and 192.168.255.254 up"),
            (3, "clean text with no pii at all"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ipv4"]) == (2, 0, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (0, 2, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (0, 0, 0)
    # md5 of the redacted text matches a direct replacement
    import hashlib

    want = hashlib.md5(b"call <PHONE> or <PHONE> now").hexdigest()
    assert out[1]["redacted_md5"] == want
    want0 = hashlib.md5(b"mail <EMAIL> and <EMAIL> today").hexdigest()
    assert out[0]["redacted_md5"] == want0


def test_contamination_scores_math(spark):
    # bench doc shares exactly its text with doc 10; doc 11 half-overlaps;
    # doc 12 disjoint; doc 13 too short for any shingle
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),       # identical to bench
            (11, "alpha beta gamma zeta eta theta"),      # partial overlap
            (12, "one two three four five six"),          # disjoint
            (13, "xx yy"),                                # < k tokens
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in contamination_scores(docs, bench).collect()}
    # doc 10: all 3 shingles in bench
    assert out[10]["n_shingles"] == 3 and out[10]["n_contaminated"] == 3
    assert out[10]["contamination"] == 1.0
    # doc 11: shingles = (alpha beta gamma), (beta gamma zeta), ... only the
    # first appears in bench -> 1/4
    assert out[11]["n_shingles"] == 4 and out[11]["n_contaminated"] == 1
    assert out[11]["contamination"] == 0.25
    assert out[12]["n_contaminated"] == 0 and out[12]["contamination"] == 0.0
    assert out[13]["n_shingles"] == 0 and out[13]["contamination"] == 0.0


def test_contamination_includes_every_doc(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb cc dd"), (1, "")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "zz yy xx ww")], "doc_id long, text string")
    got = {r["doc_id"] for r in contamination_scores(docs, bench).collect()}
    assert got == {0, 1}


def test_repetition_stats_golden(spark):
    """Hand-computed Gopher-style repetition ratios (length->=2 tokens)."""
    from awesome_spark_search.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "aa aa aa bb"),          # n=4 nd=2 top=3; bigrams 3, distinct 2
            (1, "xx yy zz"),             # no repetition at all
            (2, "solo"),                 # single token -> no bigrams
            (3, ""),                     # empty
            (4, "ab ab ab ab"),          # fully repeated
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 4
    assert abs(got[0]["dup_token_ratio"] - 0.5) < 1e-9
    assert abs(got[0]["top_token_ratio"] - 0.75) < 1e-9
    assert abs(got[0]["dup_2gram_ratio"] - 0.333333) < 1e-9
    assert got[1]["dup_token_ratio"] == 0.0
    assert got[1]["top_token_ratio"] == 0.333333
    assert got[2]["n_tokens"] == 1 and got[2]["dup_2gram_ratio"] == 0.0
    assert got[3]["n_tokens"] == 0
    assert got[3]["dup_token_ratio"] == 0.0 == got[3]["top_token_ratio"]
    assert got[4]["dup_token_ratio"] == 0.75
    assert got[4]["top_token_ratio"] == 1.0
    assert got[4]["dup_2gram_ratio"] == 0.666667  # 3 bigrams, 1 distinct


def test_repetition_top_token_adversarial_high_distinct(spark):
    """The O(n) sorted-run top-token fold against a Python Counter reference
    on an adversarial almost-all-distinct doc (the shape that made the old
    per-distinct filter scan quadratic-ish — VERDICT r4 #7)."""
    import math
    from collections import Counter

    from awesome_spark_search.textstats import repetition_stats

    # letters-only ids (the tokenizer keeps [a-z-_]+ runs: digits would
    # collapse every token to the same "tk" prefix)
    def _w(i):
        s = ""
        for _ in range(4):
            s += chr(ord("a") + i % 26)
            i //= 26
        return "tk" + s

    toks = [_w(i) for i in range(3000)] + ["dupe"] * 7 + ["pair"] * 2
    # deterministic interleave so the duplicates are scattered, not adjacent
    toks = [toks[(i * 1031) % len(toks)] for i in range(len(toks))]
    text = " ".join(toks)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = repetition_stats(docs).collect()[0]
    c = Counter(toks)
    n = len(toks)
    want_top = math.floor(max(c.values()) / n * 1e6 + 0.5) / 1e6
    want_dup = math.floor((1.0 - len(c) / n) * 1e6 + 0.5) / 1e6
    assert row["n_tokens"] == n
    assert row["top_token_ratio"] == want_top
    assert row["dup_token_ratio"] == want_dup


def test_dup_clusters_transitivity_and_survivors(spark):
    """Connected components over near-dup pairs: a 5-chain (diameter 4 —
    forces multiple propagation rounds) collapses to ONE cluster with one
    survivor; disjoint components keep distinct min-id labels."""
    from awesome_spark_search.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5),  # chain 1-2-3-4-5 (mixed order)
         (10, 11),                         # isolated pair
         (20, 22), (21, 22)],              # star around 22
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dup_clusters(pairs).collect()
    }
    want = {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False), 5: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False), 22: (20, False),
    }
    assert got == want


def test_dup_clusters_empty_pairs(spark):
    from awesome_spark_search.dedup import dup_clusters

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dup_clusters(pairs).collect() == []
