"""SymSpell suggestion: deletion-key probe is COMPLETE for edit
distance ≤ 1 (vs a brute-force levenshtein over the vocabulary) and the
verify step drops shared-deletion distance-2 pairs."""

import pyarrow as pa
import ray.data

from dcs_ray.functions.spell import deletions, levenshtein, suggest

VOCAB = [
    ("merge", 40),
    ("merged", 12),
    ("merges", 9),
    ("marge", 7),
    ("mere", 5),
    ("merj", 2),
    ("spark", 33),
    ("spork", 1),
    ("stark", 6),
    ("spar", 8),
    ("sparks", 4),
    ("join", 50),
    ("coin", 3),
    ("jon", 2),
    ("completely", 1),
    ("ab", 9),  # shared-deletion distance-2 probe: 'ab' vs 'ba' share ''? no:
    ("ba", 9),  # deletions are 'a','b' for both → disjoint? 'ab'→{b,a}, 'ba'→{a,b} — SHARED, lev=2
]


def test_levenshtein_reference():
    assert levenshtein("merge", "merje") == 1
    assert levenshtein("spark", "spork") == 1
    assert levenshtein("ab", "ba") == 2
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0


def test_suggest_complete_vs_bruteforce(ray_session):
    vocab = ray.data.from_arrow(
        pa.table(
            {
                "term": [t for t, _ in VOCAB],
                "df": pa.array([d for _, d in VOCAB], pa.int64()),
            }
        )
    ).repartition(4)
    words = ["merje", "spork", "joiin", "ab"]
    got = suggest(vocab, words, k=10)
    rows = list(
        zip(got["word"].to_pylist(), got["term"].to_pylist(), got["df"].to_pylist())
    )
    want = []
    for w in sorted(set(words)):
        cand = [(t, d) for t, d in VOCAB if levenshtein(w, t) <= 1]
        cand.sort(key=lambda td: (-td[1], td[0]))
        want.extend((w, t, d) for t, d in cand[:10])
    assert rows == want
    # the distance-2 shared-deletion pair was probed but verified away
    assert ("ab", "ba", 9) not in rows and ("ab", "ab", 9) in rows


def test_deletions():
    assert deletions("abc") == ["bc", "ac", "ab"]
    assert deletions("a") == [""]
    assert deletions("") == []


def test_probe_table_matches_reference_loop():
    """The vectorized sliced-concat probe must emit exactly the rows the
    row-at-a-time reference produces (modulo order) — randomized small
    vocab with adversarial near-duplicates."""
    import random

    import pyarrow as pa

    from dcs_ray.functions.spell import _probe_table, deletions

    rng = random.Random(7)
    alpha = "abcde"
    vocab = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
         for _ in range(300)}
    )
    batch = pa.table(
        {
            "term": pa.array(vocab, pa.string()),
            "df": pa.array([rng.randint(1, 99) for _ in vocab], pa.int64()),
        }
    )
    words = ["abc", "de", "abcdef", "xyz", "a"]
    qk = {w: frozenset([w, *deletions(w)]) for w in words}

    got = _probe_table(batch, qk)
    got_rows = sorted(zip(got["word"].to_pylist(), got["term"].to_pylist(),
                          got["df"].to_pylist()))

    want = []
    for t, d in zip(vocab, batch["df"].to_pylist()):
        tkeys = frozenset([t, *deletions(t)])
        for w, wk in qk.items():
            if abs(len(t) - len(w)) > 1:
                continue
            if not wk.isdisjoint(tkeys):
                want.append((w, t, d))
    assert got_rows == sorted(want)
    assert got_rows  # the generator must actually produce matches


def test_probe_table_large_string_and_long_term_window():
    """Review r5b: a large_string vocab column must not crash the
    vectorized probe, and a long outlier term (URL/hash token) must be
    window-pruned instead of forcing len(outlier)+1 key columns."""
    import pyarrow as pa

    from dcs_ray.functions.spell import _probe_table, deletions

    batch = pa.table(
        {
            "term": pa.array(
                ["spark", "spork", "x" * 60, "merge"], pa.large_string()
            ),
            "df": pa.array([5, 3, 1, 7], pa.int64()),
        }
    )
    qk = {w: frozenset([w, *deletions(w)]) for w in ["spark"]}
    got = _probe_table(batch, qk)
    rows = sorted(zip(got["word"].to_pylist(), got["term"].to_pylist()))
    assert rows == [("spark", "spark"), ("spark", "spork")]
    assert got.schema.field("term").type == pa.string()
