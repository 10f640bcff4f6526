"""Differential fuzz of the vectorized subword kernels against
row-at-a-time Python references: WordPiece greedy MaxMatch and the
unigram Viterbi DP share the char-matrix machinery, so a padding or
advanced-indexing slip would show up as a count/cost mismatch on some
random vocabulary."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dcs_ray.functions.wordpiece import (
    unigram_segment_costs,
    wordpiece_segment_counts,
)

_WORD = st.text(alphabet="abcd01", min_size=1, max_size=12)
_GRAM = st.text(alphabet="abcd01", min_size=2, max_size=4)


def _greedy_brute(w: str, vocab: set[str]) -> int:
    pos, pieces = 0, 0
    while pos < len(w):
        for L in (4, 3, 2, 1):
            if L == 1 or w[pos : pos + L] in vocab:
                pos += L
                pieces += 1
                break
    return pieces


def _viterbi_brute(w: str, costs: dict[str, int]) -> int:
    BIG = 1 << 60
    dp = [0] + [BIG] * len(w)
    for p in range(1, len(w) + 1):
        for L in range(1, min(4, p) + 1):
            c = costs.get(w[p - L : p])
            if c is not None:
                dp[p] = min(dp[p], dp[p - L] + c)
    return dp[len(w)]


@settings(max_examples=150, deadline=None)
@given(
    words=st.lists(_WORD, min_size=1, max_size=30),
    grams=st.lists(_GRAM, min_size=0, max_size=25),
)
def test_wordpiece_greedy_matches_brute(words, grams):
    vocab = set(grams) | set("abcd01")
    got = wordpiece_segment_counts(np.array(words, dtype=object), sorted(vocab))
    want = [_greedy_brute(w, vocab) for w in words]
    assert got.tolist() == want


@settings(max_examples=150, deadline=None)
@given(
    words=st.lists(_WORD, min_size=1, max_size=30),
    grams=st.lists(st.tuples(_GRAM, st.integers(1, 1000)), min_size=0, max_size=25),
    single_cost=st.integers(1, 500),
)
def test_unigram_viterbi_matches_brute(words, grams, single_cost):
    costs = {c: single_cost for c in "abcd01"}
    for g, c in grams:
        costs[g] = c
    got = unigram_segment_costs(np.array(words, dtype=object), costs)
    want = [_viterbi_brute(w, costs) for w in words]
    assert got.tolist() == want
