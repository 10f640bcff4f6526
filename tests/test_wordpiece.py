"""WordPiece-style MaxMatch segmentation: greedy longest-first rule,
vocab determinism, and per-lang fertility arithmetic."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.wordpiece import (
    SINGLE_CHARS,
    wordpiece_fertility,
    wordpiece_segment_counts,
    wordpiece_vocab,
)


def test_greedy_longest_match_first():
    vocab = ["ab", "abc", "a", "b", "c", "bcab"]
    # 'abcab': greedy takes 'abc' (len 3) not 'ab', leaving 'ab' → 2 pieces
    # (an optimal-split tokenizer could do ab+cab differently — greedy is the rule)
    got = wordpiece_segment_counts(
        np.array(["abcab", "cab", "zzz", "ab"], dtype=object), vocab
    )
    assert got.tolist() == [2, 2, 3, 1]


def test_single_chars_always_segment():
    got = wordpiece_segment_counts(np.array(["q0z"], dtype=object), [])
    assert got.tolist() == [3]


def test_vocab_deterministic_and_ranked(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["banana bandana", "banana banana"], pa.string()),
        }
    )
    v1 = wordpiece_vocab(ray.data.from_arrow(docs), top_k=5)
    v2 = wordpiece_vocab(ray.data.from_arrow(docs), top_k=5)
    assert v1 == v2
    assert set(SINGLE_CHARS) <= set(v1)
    assert "an" in v1  # the most frequent 2-gram of banana/bandana


def test_fertility_arithmetic(ray_session):
    # vocab that splits 'banana' as ban+ana (2) and leaves 'go' whole (1)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["banana go", "banana banana"], pa.string()),
            "lang": pa.array(["en", "de"], pa.string()),
        }
    )
    vocab = sorted(set(SINGLE_CHARS) | {"ban", "ana", "go"})
    t = wordpiece_fertility(ray.data.from_arrow(docs), vocab)
    rows = {
        r["lang"]: (r["n_words"], r["n_pieces"], r["fertility"])
        for r in t.to_pylist()
    }
    assert rows["en"] == (2, 3, 1.5)  # banana(2) + go(1)
    assert rows["de"] == (2, 4, 2.0)  # banana(2) × 2


def test_unigram_viterbi_beats_greedy():
    """Viterbi min-cost can pick a split greedy MaxMatch would not:
    'abc' under {ab:5, c:50, a:1, bc:1} → a+bc = 2, not ab+c = 55."""
    from dcs_ray.functions.wordpiece import unigram_segment_costs

    costs = {"ab": 5, "c": 50, "a": 1, "bc": 1, "b": 90}
    got = unigram_segment_costs(np.array(["abc"], dtype=object), costs)
    assert got.tolist() == [2]


def test_unigram_matches_brute_force_dp():
    from dcs_ray.functions.wordpiece import unigram_segment_costs

    rng = np.random.default_rng(3)
    alphabet = list("abcd")
    pieces = {"a": 7, "b": 9, "c": 4, "d": 11}
    for g in ["ab", "bc", "cd", "abc", "bcd", "abcd", "aa", "dd"]:
        pieces[g] = int(rng.integers(1, 40))
    words = [
        "".join(rng.choice(alphabet, size=int(rng.integers(1, 9))))
        for _ in range(200)
    ]

    def brute(w):
        BIG = 1 << 60
        dp = [0] + [BIG] * len(w)
        for p in range(1, len(w) + 1):
            for L in range(1, min(4, p) + 1):
                c = pieces.get(w[p - L : p])
                if c is not None:
                    dp[p] = min(dp[p], dp[p - L] + c)
        return dp[len(w)]

    got = unigram_segment_costs(np.array(words, dtype=object), pieces)
    assert got.tolist() == [brute(w) for w in words]


def test_unigram_costs_singles_guarantee(ray_session):
    """Every piece inventory contains all 36 singles, so any alnum word
    has a finite cost even when no multi-gram matches."""
    from dcs_ray.functions.wordpiece import unigram_piece_costs, unigram_segment_costs

    docs = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["hello world"], pa.string()),
        }
    )
    costs, T = unigram_piece_costs(ray.data.from_arrow(docs))
    assert T > 0
    got = unigram_segment_costs(np.array(["zzqqxx"], dtype=object), costs)
    assert 0 < got[0] < (1 << 59)
