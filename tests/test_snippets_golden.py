"""Golden unit tests pinning the snippet set-cover, NDCG gain curve, and
result formatting against HAND-COMPUTED fixtures.

Snippet tie-break order (ref: src/visualization/SnippetGenerator.java:80-259,
getSnippetSentences): most uncovered query terms first, then more total query
term occurrences, then the earlier sentence (the rebuild's deterministic pin
for the reference's hash-iteration-order dependence); fallback = first
sentence; at most MAX_SENTENCES sentences, emitted in document order joined
by ' .. '.

NDCG (ref: src/evaluation/NdcgCalculator.java:22-62):
gain(rank) = 1 + floor(10 * 0.5^(0.1*rank)); DCG = g1 + sum_{i>=2} g_i/log2(i).
"""

import math

import pytest

from awesome_spark_search.snippets import (
    ANSI_BOLD,
    ANSI_GREEN,
    ANSI_GREEN_RESET,
    dcg,
    format_results,
    generate_snippet,
    highlight_terms,
    ndcg,
    ndcg_gain,
)

# ---- greedy set-cover goldens (do_stem=False isolates the algorithm) ------


def _snip(content, terms):
    return generate_snippet(content, terms, do_stem=False)


def test_sentence_covering_both_terms_beats_higher_occurrence():
    # s2 covers {alpha, beta} (2 new) and wins over s1's 4 occurrences of beta
    content = "alpha here. beta beta beta beta here. alpha beta here."
    assert _snip(content, ["alpha", "beta"]) == "alpha beta here."


def test_occurrence_tiebreak_on_equal_coverage():
    # both sentences cover {alpha}; s1 has 2 occurrences > s0's 1
    content = "alpha one. alpha alpha two. nothing here."
    assert _snip(content, ["alpha"]) == "alpha alpha two."


def test_earlier_sentence_on_full_tie():
    content = "alpha one. alpha two."
    assert _snip(content, ["alpha"]) == "alpha one."


def test_two_sentences_needed_joined_in_document_order():
    content = "alpha only here. filler sentence. beta only here."
    # greedy picks s0 then s2; output sorted to document order, ' .. ' joined
    assert _snip(content, ["alpha", "beta"]) == "alpha only here. .. beta only here."


def test_max_two_sentences_drops_third_term():
    content = "alpha a. beta b. gamma c."
    assert _snip(content, ["alpha", "beta", "gamma"]) == "alpha a. .. beta b."


def test_fallback_first_sentence_when_no_term_matches():
    content = "first sentence. second sentence."
    assert _snip(content, ["zulu"]) == "first sentence."


def test_empty_content_yields_empty_snippet():
    assert _snip("", ["alpha"]) == ""


# ---- NDCG goldens (hand-computed from the reference gain formula) ---------


def test_gain_curve_golden_values():
    # gain(r) = 1 + floor(10 * 0.5^(0.1 r)); closed-form spot values
    assert [ndcg_gain(r) for r in (1, 2, 3, 4, 5, 10, 23, 24, 50, 100)] == [
        10, 9, 9, 8, 8, 6, 3, 2, 1, 1,
    ]


def test_dcg_golden():
    # dcg([10, 9, 9]) = 10 + 9/log2(2) + 9/log2(3) = 19 + 5.678367782143117
    assert dcg([10, 9, 9]) == pytest.approx(24.678367782143117, abs=1e-12)


def test_ndcg_perfect_ranking_is_one():
    assert ndcg([7, 8, 9], [7, 8, 9], 3) == pytest.approx(1.0, abs=1e-12)


def test_ndcg_missing_doc_golden():
    # results [gold1, absent, gold3]: gains [10, 0, 9]
    # dcg = 10 + 0 + 9/log2(3); idcg = 10 + 9 + 9/log2(3)
    assert ndcg([1, 2, 3], [1, 99, 3], 3) == pytest.approx(
        0.6353081338502354, abs=1e-12
    )


def test_ndcg_rank_swap_at_positions_1_2_is_dcg_neutral():
    # the i=2 divisor is log2(2)=1, so swapping ranks 1<->2 keeps DCG equal —
    # a property of the reference formula worth pinning
    assert ndcg([1, 2, 3], [2, 1, 3], 3) == pytest.approx(1.0, abs=1e-12)


# ---- highlighting + corrections surfacing ---------------------------------


def test_highlight_terms_case_insensitive_word_boundary():
    out = highlight_terms("Merge the batch, not merges", ["merge"])
    assert out == (
        f"{ANSI_GREEN}Merge{ANSI_GREEN_RESET} the batch, not merges"
    )
    # substring inside a longer word is not highlighted
    assert highlight_terms("batch", ["bat"]) == "batch"


def test_format_results_highlights_and_surfaces_corrections():
    rows = [{"doc_id": 7, "score": 1.5}]
    contents = {7: "merge here. other sentence."}
    out = format_results(
        rows, contents, ["mrege"], do_stem=False,
        corrections={"mrege": "merge"},
    )
    assert out[0] == 'corrected: "mrege" -> "merge"'
    assert out[1].startswith(ANSI_BOLD)
    assert f"{ANSI_GREEN}merge{ANSI_GREEN_RESET}" in out[1]


def test_format_results_plain_mode():
    rows = [{"doc_id": 3, "score": None}]
    out = format_results(rows, {3: "alpha beta."}, ["alpha"], do_stem=False,
                         ansi=False)
    assert out == ["3\nalpha beta."]
