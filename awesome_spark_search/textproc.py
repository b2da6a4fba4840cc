"""Tokenization pipeline as Arrow-vectorized pandas UDFs.

Semantic contract (ref: src/textprocessing/PatentAnalyzer.java:18-23,55-62 and
src/indexing/DocumentIndexer.java:220-242):

1. regex tokenize ``([a-zA-Z-_]+)`` (query mode may preserve a trailing ``*``)
2. LengthFilter: drop tokens shorter than 2 chars
3. lowercase
4. EnglishPossessiveFilter: strip trailing ``'s`` (a no-op for this regex —
   kept for contract fidelity)
5. positions are the token's index in the post-filter token list *before*
   stop-word removal, and the per-doc length counts *include* stop words
   (ref: DocumentIndexer.java:225,238) — both replicated here
6. stop-word removal (broadcast frozenset, case-insensitive)
7. Porter2 stem (optional; the oracle-checked path runs unstemmed because the
   DuckDB oracle cannot stem)

Everything is batch-vectorized: one Python call per Arrow batch, memoized
stemming per distinct token. No per-row Python UDFs anywhere.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .stemmer import stem
from .stopwords import STOPWORDS

TOKEN_RE = re.compile(r"[a-zA-Z\-_]+")
TOKEN_RE_WILDCARD = re.compile(r"[a-zA-Z\-_]+\*?")

# Arrow-side schema of one tokenized document
TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("n_tokens", T.IntegerType(), False),  # stopword-inclusive length
        T.StructField(
            "terms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("pos", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def tokenize_text(text: str, *, do_stem: bool, preserve_wildcards: bool = False):
    """Pure-Python single-doc tokenizer (shared by UDF + oracle tests).

    Returns (n_tokens, [(term, pos), ...]) with positions assigned before
    stop-word removal.
    """
    if text is None:
        return 0, []
    rx = TOKEN_RE_WILDCARD if preserve_wildcards else TOKEN_RE
    raw = rx.findall(text)
    # length filter (>=2) runs before lowercase; lengths are case-insensitive
    # for this alphabet so the order is observationally equivalent
    toks = [t.lower() for t in raw if len(t) >= 2]
    out = []
    for pos, tok in enumerate(toks):
        if tok.endswith("'s"):  # possessive strip (no-op for this regex)
            tok = tok[:-2]
        if tok in STOPWORDS:
            continue
        if do_stem and not tok.endswith("*"):
            tok = stem(tok)
        out.append((tok, pos))
    return len(toks), out


def make_tokenize_udf(do_stem: bool):
    """pandas UDF: content -> struct(n_tokens, terms:array<struct<term,pos>>)."""

    @F.pandas_udf(TOKENIZED_SCHEMA)
    def tokenize_udf(content: pd.Series) -> pd.DataFrame:
        n_tokens = []
        terms = []
        for text in content:
            n, pairs = tokenize_text(text, do_stem=do_stem)
            n_tokens.append(n)
            terms.append(pairs)
        return pd.DataFrame({"n_tokens": n_tokens, "terms": terms})

    return tokenize_udf


def tokenized(source_df, *, do_stem: bool, content_col: str = "content"):
    """source -> (doc cols..., n_tokens, term, pos) long format.

    The explode happens JVM-side after one Arrow round-trip per batch;
    downstream groupBys get map-side partial aggregation from Catalyst.
    """
    tok = make_tokenize_udf(do_stem)
    df = source_df.withColumn("_tok", tok(F.col(content_col)))
    return (
        df.withColumn("n_tokens", F.col("_tok.n_tokens"))
        .withColumn("_t", F.explode_outer("_tok.terms"))
        .drop("_tok")
        .withColumn("term", F.col("_t.term"))
        .withColumn("pos", F.col("_t.pos"))
        .drop("_t")
    )


def preprocess_query_terms(text: str, *, do_stem: bool) -> list[str]:
    """Query-token pipeline: tokenize(preserve wildcards) + stopword removal;
    stemming skipped for prefix terms (ref: QueryProcessor.java:382-388)."""
    _, pairs = tokenize_text(text, do_stem=do_stem, preserve_wildcards=True)
    return [t for t, _ in pairs]
