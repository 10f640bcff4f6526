"""best_passage_windows (grep.py): fixed-width passage retrieval —
vectorized window-hit counts must match a brute-force reference, with
earliest-start tie-breaking and (0,0) for hitless rows."""

import random

import pyarrow as pa

from dcs_ray.grep import best_passage_windows


def test_known_windows():
    t = best_passage_windows(
        pa.array(["a b q a a q q end", "no hits here", ""]), ["q"], window=3
    )
    assert t["pass_start"].to_pylist() == [5, 0, 0]
    assert t["pass_hits"].to_pylist() == [2, 0, 0]


def test_matches_bruteforce_random():
    rng = random.Random(7)
    voc = ["q", "w", "e", "r", "t"]
    docs = [
        " ".join(rng.choice(voc) for _ in range(rng.randint(0, 40)))
        for _ in range(300)
    ]
    terms = {"q", "t"}
    w = 5
    got = best_passage_windows(pa.array(docs), sorted(terms), window=w)
    for d, s, h in zip(
        docs, got["pass_start"].to_pylist(), got["pass_hits"].to_pylist()
    ):
        toks = d.split()
        hits = [i for i, x in enumerate(toks) if x in terms]
        if not hits:
            assert (s, h) == (0, 0)
            continue
        n_best, neg_start = max(
            (sum(1 for j in hits if i <= j < i + w), -i) for i in hits
        )
        assert h == n_best and s == -neg_start
