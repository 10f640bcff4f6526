"""Exact distributed group quantiles vs numpy / DuckDB semantics."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.quantiles import group_quantiles


def _disc_quantile(vals: np.ndarray, q: float):
    s = np.sort(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def test_group_quantiles_matches_reference(ray_session):
    rng = np.random.default_rng(9)
    keys = rng.choice(["a", "b", "c"], size=5000).tolist()
    vals = rng.integers(0, 300, size=5000)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})
    ).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    out = pa.concat_tables(
        pa.table(b)
        for b in group_quantiles(ds, "k", "v", qs).iter_batches(batch_format="pyarrow")
    ).sort_by([("k", "ascending"), ("q", "ascending")])
    kv = np.array(keys)
    i = 0
    for k in ["a", "b", "c"]:
        grp = vals[kv == k]
        for q in qs:
            row = out.slice(i, 1)
            assert row["k"][0].as_py() == k and row["q"][0].as_py() == q
            assert row["value"][0].as_py() == _disc_quantile(grp, q), (k, q)
            i += 1
    assert i == len(out)


def test_group_quantiles_duckdb_parity(ray_session):
    import duckdb

    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "k": rng.choice(["x", "y"], size=777).tolist(),
            "v": rng.integers(-50, 50, size=777),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = pa.concat_tables(
        pa.table(b)
        for b in group_quantiles(ds, "k", "v", [0.25, 0.5, 0.75]).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by([("k", "ascending"), ("q", "ascending")])
    want = duckdb.arrow(t).query(
        "t",
        """SELECT k, 0.25 AS q, quantile_disc(v, 0.25) AS value FROM t GROUP BY k
           UNION ALL
           SELECT k, 0.5 AS q, quantile_disc(v, 0.5) AS value FROM t GROUP BY k
           UNION ALL
           SELECT k, 0.75 AS q, quantile_disc(v, 0.75) AS value FROM t GROUP BY k
           ORDER BY k, q""",
    ).arrow()
    assert out["k"].to_pylist() == want["k"].to_pylist()
    assert out["q"].to_pylist() == want["q"].to_pylist()
    assert out["value"].to_pylist() == want["value"].to_pylist()


def test_filter_by_group_quantile(ray_session):
    from dcs_ray.functions.quantiles import filter_by_group_quantile

    rng = np.random.default_rng(2)
    keys = rng.choice(["a", "b"], size=2000).tolist()
    vals = rng.integers(0, 1000, size=2000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(6)
    out = pa.concat_tables(
        pa.table(b)
        for b in filter_by_group_quantile(ds, "k", "v", 0.25).iter_batches(
            batch_format="pyarrow"
        )
    )
    kv = np.array(keys)
    for k in ["a", "b"]:
        grp = vals[kv == k]
        cut = _disc_quantile(grp, 0.25)
        got = out.filter(pa.compute.equal(out["k"], k))["v"].to_numpy()
        assert (got >= cut).all()
        assert len(got) == int((grp >= cut).sum())


def test_group_quantiles_ignores_nulls(ray_session):
    import duckdb

    t = pa.table(
        {
            "k": ["a"] * 6,
            "v": pa.array([1, None, 3, None, 5, 7], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = pa.concat_tables(
        pa.table(b)
        for b in group_quantiles(ds, "k", "v", [0.5]).iter_batches(
            batch_format="pyarrow"
        )
    )
    want = duckdb.arrow(t).query(
        "t", "SELECT quantile_disc(v, 0.5) AS value FROM t"
    ).fetchone()[0]
    assert out["value"].to_pylist() == [want]


def test_exact_distinct_empty(ray_session):
    from dcs_ray.functions.sketches import exact_distinct

    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert exact_distinct(empty, "x").take_all() == [{"n_distinct": 0}]


def test_approx_quantiles_histogram(ray_session):
    from dcs_ray.functions.quantiles import approx_quantiles_histogram

    rng = np.random.default_rng(21)
    vals = rng.normal(100.0, 25.0, size=50_000)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(12)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = approx_quantiles_histogram(ds, "v", qs, bins=4096)
    span = vals.max() - vals.min()
    for q, v in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        exact = np.quantile(vals, q)
        assert abs(v - exact) <= span / 4096 * 2, (q, v, exact)
    # deterministic across runs and batch layouts
    out2 = approx_quantiles_histogram(
        ray.data.from_arrow(pa.table({"v": vals})).repartition(5), "v", qs, bins=4096
    )
    assert out.equals(out2)
    # empty input
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert len(approx_quantiles_histogram(empty, "v", [0.5])) == 0


def test_grouped_hist_quantiles_error_bound_and_layout(ray_session):
    """Per-group sketch within range/bins of the exact quantile;
    identical across block layouts (sum-merge associativity)."""
    import numpy as np

    from dcs_ray.functions.quantiles import grouped_quantiles_histogram

    rng = np.random.default_rng(8)
    n = 6000
    t = pa.table(
        {
            "g": pa.array(["x" if i % 2 else "y" for i in range(n)]),
            "v": pa.array(
                np.where(np.arange(n) % 2, rng.normal(10, 2, n), rng.normal(50, 9, n))
            ),
        }
    )
    out = grouped_quantiles_histogram(
        ray.data.from_arrow(t), "g", "v", [0.5, 0.9], bins=512
    ).to_pandas()
    df = t.to_pandas()
    for g, sub in df.groupby("g"):
        rng_w = sub.v.max() - sub.v.min()
        for q in (0.5, 0.9):
            got = out[(out.g == g) & (out.q == q)].value.iloc[0]
            exact = np.quantile(sub.v, q)
            assert abs(got - exact) <= rng_w / 512 * 2 + 1e-9, (g, q, got, exact)
    out2 = grouped_quantiles_histogram(
        ray.data.from_arrow(t).repartition(9), "g", "v", [0.5, 0.9], bins=512
    ).to_pandas()
    assert out.value.tolist() == out2.value.tolist()
