"""Sketch operators: HLL approximate distinct, exact distinct, heavy
hitters. HLL has no SQL oracle (hash-specific) — bound its error vs the
exact count here instead."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from dcs_ray.functions.sketches import (
    _hash64_column,
    approx_distinct_hll,
    exact_distinct,
    heavy_hitters,
    hll_estimate,
    hll_fold_batch,
)

SF = "/root/testdata/sf0.001"


def test_hash64_deterministic_across_layouts():
    a = pa.chunked_array([pa.array(["abc", "", "a much longer string spanning words"])])
    b = pa.chunked_array([pa.array(["xx", "abc"]), pa.array(["a much longer string spanning words"])])
    ha, hb = _hash64_column(a), _hash64_column(b)
    assert ha[0] == hb[1]
    assert ha[2] == hb[2]
    # empty string is not absent-value
    assert ha[1] != 0
    # int column: same value hashes the same in different arrays
    i1 = _hash64_column(pa.chunked_array([pa.array([7, 9], pa.int64())]))
    i2 = _hash64_column(pa.chunked_array([pa.array([9], pa.int32())]))
    assert i1[1] == i2[0]


def test_hll_fold_merge_associative():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**64, size=3000, dtype=np.uint64)
    whole = hll_fold_batch(h, 10)
    parts = np.maximum(hll_fold_batch(h[:1000], 10),
                       np.maximum(hll_fold_batch(h[1000:1700], 10),
                                  hll_fold_batch(h[1700:], 10)))
    assert np.array_equal(whole, parts)


def test_hll_estimate_error_bound():
    rng = np.random.default_rng(11)
    for n in (100, 5000, 100_000):
        h = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        est = hll_estimate(hll_fold_batch(h, 12))
        # 1.04/sqrt(4096) ≈ 1.6% std error; allow 4 sigma
        assert abs(est - n) / n < 0.07, (n, est)


def test_sketches_on_events(ray_session):
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    truth = len(pc.unique(t["user_id"]))

    assert exact_distinct(ev, "user_id").take_all() == [{"n_distinct": truth}]

    est, regs = approx_distinct_hll(ev, "user_id", p=12)
    assert abs(est - truth) / truth < 0.07
    # determinism: a second run produces identical registers
    est2, regs2 = approx_distinct_hll(ev, "user_id", p=12)
    assert est2 == est and np.array_equal(regs, regs2)

    hh = heavy_hitters(ev, "event_type", k=3)
    vc = t.group_by(["event_type"]).aggregate([("event_type", "count")])
    want = sorted(
        zip(vc["event_type"].to_pylist(), vc["event_type_count"].to_pylist()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    got = list(zip(hh["event_type"].to_pylist(), hh["n_rows"].to_pylist()))
    assert got == want


def test_hash64_column_matches_python_reference():
    """The vectorized word-gather hash equals a per-row pure-Python
    FNV-word fold for arbitrary strings (odd lengths, unicode, empties)
    and is invariant to chunk layout."""
    from hypothesis import given, settings, strategies as st

    M = (1 << 64) - 1

    def splitmix(x):
        x = (x + 0x9E3779B97F4A7C15) & M
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & M
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & M
        x ^= x >> 31
        return x

    def ref_hash(s: str) -> int:
        b = s.encode()
        out = 0xCBF29CE484222325
        for w in range(0, max(len(b), 0), 8):
            word = int.from_bytes(b[w:w + 8].ljust(8, b"\0")[:8], "little") if len(b) > w else 0
            out = ((out ^ word) * 0x100000001B3) & M
        out = (out + len(b)) & M
        return splitmix(out)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
    def prop(strs):
        got = _hash64_column(pa.chunked_array([pa.array(strs, pa.string())]))
        want = [ref_hash(s) for s in strs]
        assert got.tolist() == want
        # split into two chunks: same per-row hashes
        half = len(strs) // 2
        got2 = _hash64_column(
            pa.chunked_array([pa.array(strs[:half], pa.string()),
                              pa.array(strs[half:], pa.string())])
        )
        assert got2.tolist() == want

    prop()


def test_grouped_hll_error_and_layout(ray_session):
    """Per-group estimates within HLL error of exact counts; identical
    across block layouts (max-merge associativity)."""
    import numpy as np

    from dcs_ray.functions.sketches import grouped_approx_distinct_hll

    rng = np.random.default_rng(6)
    n = 20_000
    t = pa.table(
        {
            "g": pa.array(["a" if i % 3 else "b" for i in range(n)]),
            "v": pa.array(rng.integers(0, 5000, n), pa.int64()),
        }
    )
    out = grouped_approx_distinct_hll(ray.data.from_arrow(t), "g", "v", p=8)
    exact = {
        "a": len({int(v) for i, v in enumerate(t["v"].to_pylist()) if i % 3}),
        "b": len({int(v) for i, v in enumerate(t["v"].to_pylist()) if not i % 3}),
    }
    for g, est in zip(out["g"].to_pylist(), out["approx_distinct"].to_pylist()):
        assert abs(est - exact[g]) / exact[g] < 0.25, (g, est, exact[g])
    out2 = grouped_approx_distinct_hll(
        ray.data.from_arrow(t).repartition(7), "g", "v", p=8
    )
    assert out.to_pydict() == out2.to_pydict()


def test_hll_set_algebra_tracks_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sketches import hll_set_algebra

    rng = np.random.default_rng(17)
    # A = 0..599, B = 300..899 → |A|=600 |B|=600 |A∩B|=300 |A∪B|=900
    ua = rng.permutation(np.arange(0, 600))
    ub = rng.permutation(np.arange(300, 900))
    t = pa.table(
        {
            "event_type": pa.array(["view"] * len(ua) + ["click"] * len(ub)),
            "user_id": pa.array(np.concatenate([ua, ub]), pa.int64()),
        }
    )
    out = hll_set_algebra(
        ray.data.from_arrow(t).repartition(5),
        "event_type", "user_id", "view", "click", p=10,
    )
    a = out["approx_a"].to_pylist()[0]
    b = out["approx_b"].to_pylist()[0]
    u = out["approx_union"].to_pylist()[0]
    i = out["approx_intersection"].to_pylist()[0]
    # p=10 → ~3.3% std error on each; intersection compounds
    assert abs(a - 600) < 0.15 * 600
    assert abs(b - 600) < 0.15 * 600
    assert abs(u - 900) < 0.15 * 900
    assert abs(i - 300) < 0.4 * 300
    assert abs((a + b - u) - i) < 1e-6


def test_hll_set_algebra_empty_slice(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sketches import hll_set_algebra

    t = pa.table(
        {
            "event_type": pa.array(["view"] * 5),
            "user_id": pa.array(range(5), pa.int64()),
        }
    )
    out = hll_set_algebra(
        ray.data.from_arrow(t), "event_type", "user_id", "view", "click", p=8
    )
    assert out["approx_b"].to_pylist() == [0.0]
    assert out["approx_intersection"].to_pylist() == [0.0]


def test_kmv_distinct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sketches import kmv_distinct

    # small-cardinality branch: fewer distinct than k → exact count
    t = pa.table({"v": pa.array([1, 2, 3, 2, 1] * 10, pa.int64())})
    est, kept = kmv_distinct(ray.data.from_arrow(t), "v", k=8)
    assert est == 3.0 and len(kept) == 3

    # estimator branch: accuracy within KMV's ~1/sqrt(k-1) error band,
    # and block layout must not change the result (merge determinism)
    vals = pa.table({"v": pa.array(np.arange(5000) % 1000, pa.int64())})
    est1, kept1 = kmv_distinct(
        ray.data.from_arrow(vals).repartition(1), "v", k=64
    )
    est2, kept2 = kmv_distinct(
        ray.data.from_arrow(vals).repartition(13), "v", k=64
    )
    assert est1 == est2
    assert np.array_equal(kept1, kept2)
    assert abs(est1 - 1000) < 0.5 * 1000
