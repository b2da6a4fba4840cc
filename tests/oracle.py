"""Pure pandas/numpy oracle implementing the spec'd pipeline — no Spark.

Independent reference for golden end-to-end tests (SURVEY.md §5): same
tokenize→stopword→stem→postings→BM25 semantics, tie-break (score DESC,
doc_id ASC), float64 throughout.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from awesome_spark_search.textproc import tokenize_text

K1, B = 1.2, 0.75
JM_LAMBDA = 0.2


class OracleIndex:
    def __init__(self, docs: dict[int, str], *, do_stem: bool = True):
        self.do_stem = do_stem
        self.doc_len: dict[int, int] = {}
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        for doc_id, content in docs.items():
            n, pairs = tokenize_text(content, do_stem=do_stem)
            self.doc_len[doc_id] = n
            for term, pos in pairs:
                self.postings[term].setdefault(doc_id, []).append(pos)
        self.n_docs = len(docs)
        self.total_tokens = sum(self.doc_len.values())
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 1.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(len(v) for v in self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)

    def match_terms(self, terms: list[str]) -> set[str]:
        """Expand prefix terms against the dictionary."""
        out: set[str] = set()
        for t in terms:
            if t.endswith("*"):
                p = t[:-1]
                out.update(w for w in self.postings if w.startswith(p))
            elif t in self.postings:
                out.add(t)
        return out

    def bm25_topk(self, terms: list[str], k: int = 10,
                  restrict: set[int] | None = None,
                  weights: dict[str, float] | None = None):
        scores: dict[int, float] = defaultdict(float)
        for t in sorted(self.match_terms(terms)):
            w = (weights or {}).get(t, 1.0)
            idf = self.idf(t)
            for doc_id, poss in self.postings[t].items():
                if restrict is not None and doc_id not in restrict:
                    continue
                tf = len(poss)
                dl = self.doc_len[doc_id]
                scores[doc_id] += w * idf * tf / (tf + K1 * (1 - B + B * dl / self.avgdl))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def ql_topk(self, terms: list[str], k: int = 10):
        scores: dict[int, float] = defaultdict(float)
        for t in sorted(self.match_terms(terms)):
            cf = self.cf(t)
            for doc_id, poss in self.postings[t].items():
                tf = len(poss)
                dl = max(self.doc_len[doc_id], 1)
                scores[doc_id] += math.log(
                    (1 - JM_LAMBDA) * tf / dl + JM_LAMBDA * cf / max(self.total_tokens, 1)
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_docs(self, terms: list[str]) -> set[int]:
        terms = [t for t in terms if t in self.postings]
        if not terms:
            return set()
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        out = set()
        for d in docs:
            cur = set(self.postings[terms[0]][d])
            ok = True
            for t in terms[1:]:
                nxt = {p + 1 for p in cur} & set(self.postings[t][d])
                if not nxt:
                    ok = False
                    break
                cur = nxt
            if ok:
                out.add(d)
        return out
