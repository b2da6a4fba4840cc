"""Spelling correction: Damerau-Levenshtein over the term dictionary.

Reference semantics (ref: src/querying/spellingcorrection/SpellingCorrector
.java:38-48, MostSimilarTokenProcedure.java:10-15,49-70): candidates are all
indexed terms sharing the misspelled term's **first character**, with absolute
length difference <= 2; keep those with Damerau-Levenshtein distance <= 3
(unit costs, ref: AwesomeSearchEngine.java:190); pick minimum distance, ties
broken by higher collection frequency (the rebuild adds term ASC as a final
deterministic tie-break).

Spark shape: the candidate filter is a codegen'd dictionary scan
(first-char + length band); the distance runs as an Arrow-batched pandas UDF
because Spark's builtin ``levenshtein()`` lacks the transposition edit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_DISTANCE = 3
MAX_LENGTH_DIFF = 2


def damerau_levenshtein(a: str, b: str) -> int:
    """Optimal-string-alignment Damerau-Levenshtein, unit costs."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = np.arange(lb + 1)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return int(prev[lb])


def make_distance_udf(target: str):
    @F.pandas_udf(T.IntegerType())
    def dist(terms: pd.Series) -> pd.Series:
        from awesome_spark_search.spell import damerau_levenshtein

        return terms.map(lambda t: damerau_levenshtein(t, target))

    return dist


def correct_term(term: str, term_stats: DataFrame) -> str | None:
    """Best correction for a term absent from the index, or None."""
    if not term:
        return None
    first, tlen = term[0], len(term)
    cands = term_stats.filter(
        (F.substring("term", 1, 1) == first)
        & (F.abs(F.length("term") - tlen) <= MAX_LENGTH_DIFF)
    ).select("term", "cf")
    dist = make_distance_udf(term)
    best = (
        cands.withColumn("distance", dist(F.col("term")))
        .filter(F.col("distance") <= MAX_DISTANCE)
        .orderBy(F.col("distance").asc(), F.col("cf").desc(), F.col("term").asc())
        .limit(1)
        .collect()
    )
    return best[0]["term"] if best else None
