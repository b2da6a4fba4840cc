"""Snippet generation + NDCG evaluation (driver-side; operates on the
collected top-k only — k rows, never the corpus).

Snippet: sentence-split, map query-term hits to sentences, greedy set-cover
picking sentences covering the most uncovered query terms (ties -> more total
occurrences, then earlier sentence), join with '..'
(ref: src/visualization/SnippetGenerator.java:80-259).

NDCG: gain(rank) = 1 + floor(10 * 0.5^(0.1*rank)); DCG = g1 + sum_{i>=2}
g_i/log2(i); NDCG = DCG/IDCG (ref: src/evaluation/NdcgCalculator.java:22-62).
"""

from __future__ import annotations

import math
import re

from .textproc import tokenize_text

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")
MAX_SENTENCES = 2


def generate_snippet(content: str, query_terms: list[str], *, do_stem: bool = True,
                     max_sentences: int = MAX_SENTENCES) -> str:
    if not content:
        return ""
    qset = set(query_terms)
    sentences = _SENTENCE_RE.split(content.strip()) or [content]
    per_sentence: list[tuple[int, set, int]] = []  # (idx, covered terms, occurrences)
    for i, s in enumerate(sentences):
        _, pairs = tokenize_text(s, do_stem=do_stem)
        terms = [t for t, _ in pairs]
        hit = {t for t in terms if t in qset}
        occ = sum(1 for t in terms if t in qset)
        per_sentence.append((i, hit, occ))
    chosen: list[int] = []
    covered: set = set()
    while len(chosen) < max_sentences:
        best = None
        for i, hit, occ in per_sentence:
            if i in chosen:
                continue
            new = len(hit - covered)
            key = (new, occ, -i)
            if new > 0 and (best is None or key > best[0]):
                best = (key, i, hit)
        if best is None:
            break
        chosen.append(best[1])
        covered |= best[2]
    if not chosen:
        chosen = [0]
    chosen.sort()
    return " .. ".join(sentences[i].strip() for i in chosen)


# ANSI constants mirror the reference (ref: src/visualization/ResultStyle.java:4-11)
ANSI_BOLD = "\033[1m"
ANSI_BOLD_RESET = "\033[0m"
ANSI_GREEN = "\033[32m"
ANSI_GREEN_RESET = "\033[39m"


def highlight_terms(text: str, query_terms: list[str], *,
                    color: str = ANSI_GREEN, reset: str = ANSI_GREEN_RESET) -> str:
    """Wrap every case-insensitive word-boundary occurrence of each query
    term in ANSI green (ref: ResultFormatter.java:93-133 formatTitle — the
    reference regex is ``(?i)\\b<token>\\b`` per matched token)."""
    for term in sorted(set(t for t in query_terms if t)):
        pattern = re.compile(r"(?i)\b" + re.escape(term) + r"\b")
        text = pattern.sub(lambda m: f"{color}{m.group(0)}{reset}", text)
    return text


def format_results(rows, contents: dict[int, str], query_terms: list[str],
                   *, do_stem: bool = True,
                   corrections: dict[str, str] | None = None,
                   ansi: bool = True) -> list[str]:
    """ANSI formatter matching the reference's shape: bold head line, matched
    query terms highlighted green in the snippet, applied spelling
    corrections surfaced to the user
    (ref: src/visualization/ResultFormatter.java:48-133 + the corrections map
    carried in querying/results/UnrankedQueryResult.java). ``ansi=False``
    yields the plain-text form (tests / non-tty sinks)."""
    effective = [corrections.get(t, t) for t in query_terms] if corrections else query_terms
    out = []
    if corrections:
        for orig, fixed in sorted(corrections.items()):
            out.append(f'corrected: "{orig}" -> "{fixed}"')
    for r in rows:
        doc_id = r["doc_id"]
        snippet = generate_snippet(contents.get(doc_id, ""), effective, do_stem=do_stem)
        score = r["score"]
        head = f"{doc_id}" + (f"  (score={score:.6f})" if score is not None else "")
        if ansi:
            head = f"{ANSI_BOLD}{head}{ANSI_BOLD_RESET}"
            snippet = highlight_terms(snippet, effective)
        out.append(f"{head}\n{snippet}")
    return out


def ndcg_gain(rank: int) -> int:
    return 1 + math.floor(10 * 0.5 ** (0.1 * rank))


def dcg(ranks_gains: list[int]) -> float:
    total = 0.0
    for i, g in enumerate(ranks_gains, start=1):
        total += g if i == 1 else g / math.log2(i)
    return total


def ndcg(gold: list[int], results: list[int], p: int) -> float:
    """NDCG@p of `results` against the gold ranking (doc ids in ideal order)."""
    gold_pos = {d: i + 1 for i, d in enumerate(gold)}
    gains = [ndcg_gain(gold_pos[d]) if d in gold_pos else 0 for d in results[:p]]
    ideal = [ndcg_gain(i + 1) for i in range(min(p, len(gold)))]
    idcg = dcg(ideal)
    return dcg(gains) / idcg if idcg > 0 else 0.0
