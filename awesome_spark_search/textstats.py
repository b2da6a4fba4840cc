"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen; zero Python in the path) and
all reproducible in ANSI SQL, so each ships with a DuckDB oracle entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker sets for the n-gram/stopword-ratio heuristic;
# deterministic and embedded (shared constant with the oracle SQL)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}


def _tokens(text_col):
    return F.filter(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z-_]+', 0)"),
        lambda t: F.length(t) >= 2,
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax over marker-hit counts; ties -> lang asc;
    no hits -> 'und'."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(ws))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    # max_by over (hits DESC, lang ASC): array_max on struct compares fieldwise;
    # negate nothing — pick via sort: highest hits, then lexicographically
    # smallest lang among ties. Invert lang order by sorting desc on struct
    # (hits, reversed lang) is messy; use filter+reduce instead:
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"]),
            s,
        ).otherwise(acc),
    )
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stopword_ratio, mean_token_len, score).

    score = heuristic in [0,1]: rewards mid-range length, presence of
    stop words (natural-language-ness), sane mean token length.
    """
    toks = _tokens(text_col)
    from .stopwords import STOPWORDS

    stop_arr = sorted(STOPWORDS)
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stop_arr)))
    mean_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_toks,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop.cast("double") / n_toks).otherwise(F.lit(0.0))
    length_term = F.least(F.length(F.col(text_col)).cast("double") / F.lit(500.0), F.lit(1.0))
    len_term = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    raw_score = 0.4 * length_term + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)) + 0.3 * len_term
    # floor(x*1e6+0.5)/1e6 instead of round(): both engines compute x with
    # identical IEEE ops, but their round() tie-breaking differs at exact
    # half-way decimals — floor-based rounding is bit-deterministic
    score = F.floor(raw_score * 1e6 + F.lit(0.5)) / F.lit(1e6)
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        score.alias("quality"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_token_ratio, top_token_ratio, dup_2gram_ratio)
    — Gopher-style repetition signals (Rae et al. 2021, public): training
    docs dominated by repeated tokens or bigrams are boilerplate/templated
    content a curation pipeline filters out.

    * dup_token_ratio  = 1 - distinct_tokens / tokens
    * top_token_ratio  = max token frequency / tokens
    * dup_2gram_ratio  = 1 - distinct_bigrams / bigrams

    Pure codegen: ratios derive from array ops over the token list — rows
    are independent, no shuffle, no Python. The top-frequency fold sorts the
    token array and takes the longest equal-run (O(n log n) per row,
    adversarial-doc safe; the previous per-distinct filter scan was
    O(n * distinct) — VERDICT r4 #7). floor(x*1e6+0.5)/1e6 rounding per
    the engine-parity float convention."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    # max token frequency == longest run in the sorted array; the fold
    # carries (prev token, current run, best run). Tokens are length>=2, so
    # the "" sentinel never matches a real token.
    _run = lambda acc, t: F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            _run(acc, t).alias("run"),
            F.greatest(acc["best"], _run(acc, t)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    pair_len = F.greatest(n - 1, F.lit(0))
    g2 = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n2 = F.size(g2)
    nd2 = F.size(F.array_distinct(g2))

    def _r6(x):
        return F.floor(x * 1e6 + F.lit(0.5)) / F.lit(1e6)

    dup_tok = F.when(n > 0, 1.0 - nd.cast("double") / n).otherwise(F.lit(0.0))
    top_tok = F.when(n > 0, top.cast("double") / n).otherwise(F.lit(0.0))
    dup_2g = F.when(n2 > 0, 1.0 - nd2.cast("double") / n2).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        _r6(dup_tok).alias("dup_token_ratio"),
        _r6(top_tok).alias("top_token_ratio"),
        _r6(dup_2g).alias("dup_2gram_ratio"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, chars): whitespace split count and a
    BPE-ish proxy (alnum runs + non-space punctuation marks counted singly)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    alnum_runs = F.size(F.expr(f"regexp_extract_all({text_col}, '[A-Za-z0-9]+', 0)"))
    punct = F.size(F.expr(f"regexp_extract_all({text_col}, '[^A-Za-z0-9\\\\s]', 0)"))
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col(text_col))) > 0, ws).otherwise(0).alias("ws_tokens"),
        (alnum_runs + punct).alias("bpe_ish_tokens"),
        F.length(F.col(text_col)).alias("chars"),
    )


# PII patterns written WITHOUT backslashes or alternation so the same literal
# compiles identically under Java regex (Spark) and RE2 (DuckDB) and both
# engines produce the same match set (no leftmost-first vs leftmost-longest
# divergence without alternation; greedy quantifiers agree).
#
# KNOWN LIMITATION (deliberate): PII_IPV4 has no word-boundary guards and no
# per-octet <=255 check — it matches digit-run substrings (inside
# '12345.6.7.8901' or the semver '1.2.3.4') and accepts '999.999.999.999'.
# Boundary anchors need lookaround (absent from RE2) or alternation (breaks
# the leftmost-first/leftmost-longest parity above), so the pattern stays
# symmetric-but-loose on BOTH engines: redaction slightly over-matches,
# which is the safe direction for PII scrubbing (never under-redacts a real
# dotted quad). Consumers needing exact IPv4 semantics should post-filter
# the redacted spans JVM-side.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, redacted_md5) — PII scrubbing for
    training corpora: counts on the ORIGINAL text, then email -> phone -> ip
    replacement IN THAT ORDER (order is part of the contract; the oracle
    mirrors it). Pure column expressions — whole-stage codegen, a narrow map
    at any scale; the redacted text itself is surfaced as an md5 so the
    driver compare stays compact (the full redacted column is one
    regexp_replace chain away for consumers)."""
    t = F.col(text_col)

    def _count(pat: str):
        return F.size(F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)"))

    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IPV4,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        _count(PII_EMAIL).alias("n_emails"),
        _count(PII_PHONE).alias("n_phones"),
        _count(PII_IPV4).alias("n_ipv4"),
        F.md5(red).alias("redacted_md5"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp_norm, fp_prefix): md5 fingerprints of the normalized token
    stream and of its first 16 tokens (cheap near-dup blocking key)."""
    toks = _tokens(text_col)
    joined = F.concat_ws(" ", toks)
    prefix = F.concat_ws(" ", F.slice(toks, 1, 16))
    return docs.select(
        "doc_id",
        F.md5(joined).alias("fp_norm"),
        F.md5(prefix).alias("fp_prefix"),
    )
