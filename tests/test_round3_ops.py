"""Round-3 coverage batch: Adamic–Adar, event n-grams, winnowing."""

import collections
import itertools

import numpy as np
import pyarrow as pa
import ray.data


def test_adamic_adar_matches_bruteforce(ray_session):
    """Bucketed distinct-pair AA == brute force over distinct edges."""
    from dcs_ray.functions.links import adamic_adar_topk

    srcs = [0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 0, 4]
    dsts = [5, 6, 7, 5, 6, 5, 6, 7, 7, 9, 5, 9]  # dups: (0→5)x2, (2→7)x2
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(srcs, pa.int64()),
                "dst": pa.array(dsts, pa.int64()),
                "anchor": pa.array(["x"] * len(srcs)),
            }
        )
    )
    got = adamic_adar_topk(edges, k=50)

    by_src = collections.defaultdict(set)
    for s, d in zip(srcs, dsts):
        by_src[s].add(d)
    ref = collections.defaultdict(float)
    for s, vals in by_src.items():
        if len(vals) < 2:
            continue
        w = 1.0 / np.log(len(vals))
        for a, b in itertools.combinations(sorted(vals), 2):
            ref[(a, b)] += w
    want = sorted(
        ((round(v, 6), a, b) for (a, b), v in ref.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    rows = list(
        zip(
            got["aa_score"].to_pylist(),
            got["id_a"].to_pylist(),
            got["id_b"].to_pylist(),
        )
    )
    assert rows == [(v, a, b) for v, a, b in want]


def test_event_ngrams_matches_bruteforce(ray_session):
    """Bucketed trigram counts == per-user sorted brute force,
    including (ts, event_id) tie ordering."""
    from dcs_ray.functions.windows import event_ngrams

    rng = np.random.default_rng(7)
    n = 400
    users = rng.integers(0, 12, n)
    ts = rng.integers(0, 50, n)  # many ties → event_id order matters
    types = rng.choice(["a", "b", "c"], n)
    eids = np.arange(n)
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "event_type": pa.array(types),
            }
        )
    ).repartition(7)

    out = pa.concat_tables(
        pa.table(b)
        for b in event_ngrams(events, n=3, ts_col="ts").iter_batches(
            batch_format="pyarrow"
        )
    )
    got = {
        (r["e1"], r["e2"], r["e3"]): r["cnt"] for r in out.to_pylist()
    }

    ref = collections.Counter()
    for u in np.unique(users):
        idx = np.flatnonzero(users == u)
        order = np.lexsort((eids[idx], ts[idx]))
        seq = [types[idx[j]] for j in order]
        for i in range(len(seq) - 2):
            ref[tuple(seq[i : i + 3])] += 1
    assert got == dict(ref)


def _brute_winnow(tokens, k=3, w=4):
    from dcs_ray.functions.textstats import fnv1a_bytes_rows

    th = [int(x) for x in fnv1a_bytes_rows(pa.array(tokens))] if tokens else []
    OFF, P, M = 0xCBF29CE484222325, 1099511628211, 1 << 64
    grams = []
    for i in range(len(th) - k + 1):
        g = OFF
        for j in range(k):
            g = (g * P + th[i + j]) % M
        grams.append(g)
    sel = {min(grams[q : q + w]) for q in range(len(grams) - w + 1)}
    return sel


def test_winnow_fingerprints_matches_bruteforce():
    from dcs_ray.functions.textstats import winnow_fingerprint_batch

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten one two three",
        "tiny doc",  # < k+w-1 tokens → no full window
        "",
    ]
    b = pa.table(
        {"doc_id": pa.array(list(range(4)), pa.int64()), "text": pa.array(texts)}
    )
    out = winnow_fingerprint_batch(b).to_pylist()
    for row, text in zip(out, texts):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split()]
        sel = _brute_winnow(toks)
        assert row["n_fp"] == len(sel)
        x = 0
        for v in sel:
            x ^= v
        assert row["fp_xor"] == np.uint64(x).astype(np.int64)


def test_winnow_shared_substring_guarantee():
    """Docs sharing ≥ w+k−1 consecutive tokens share a fingerprint —
    the winnowing guarantee the near-dup pipeline relies on."""
    from dcs_ray.functions.textstats import winnow_fingerprint_batch
    from dcs_ray.tokenize import word_tokens_flat
    from dcs_ray.functions.textstats import fnv1a_bytes_rows

    shared = "quick brown fox jumps over lazy dog"  # 7 tokens ≥ 4+3-1
    a = "intro words here " + shared + " tail one"
    bt = "totally different prefix " + shared + " other ending"
    b = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([a, bt])})
    # brute-force per-doc selected sets must intersect
    s0 = _brute_winnow(a.split())
    s1 = _brute_winnow(bt.split())
    assert s0 & s1
    out = winnow_fingerprint_batch(b).to_pylist()
    assert out[0]["n_fp"] == len(s0) and out[1]["n_fp"] == len(s1)
