"""Property tests for the distribution-statistics batch: Benford digit
profile, Spearman midranks, two-sample KS, Markov stationary iteration,
and session-level type-pair co-occurrence."""

import collections
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_first_digit_counts(ray_session):
    from dcs_ray.functions.stats import first_digit_counts

    rng = np.random.default_rng(7)
    vals = np.round(rng.lognormal(5, 2, 500), 2) + 0.01
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    t = first_digit_counts(ds, "x")
    want = collections.Counter(
        int(str(int(np.floor(v * 100 + 0.5)))[0]) for v in vals
    )
    got = dict(zip(t["digit"].to_pylist(), t["n"].to_pylist()))
    assert got == dict(want)
    assert abs(sum(t["share"].to_pylist()) - 1.0) < 1e-4
    # benford_p is the closed form, independent of the data
    bp = dict(zip(t["digit"].to_pylist(), t["benford_p"].to_pylist()))
    for d, p in bp.items():
        assert abs(p - np.log10(1 + 1 / d)) < 1e-6


def test_spearman_rho_matches_pandas(ray_session):
    from dcs_ray.functions.stats import spearman_rho

    rng = np.random.default_rng(11)
    x = rng.integers(0, 40, 300)  # heavy ties
    y = (x * 3 + rng.integers(0, 25, 300)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
    )
    rho, n = spearman_rho(ds, "x", "y")
    assert n == 300
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(rho - want) < 1e-6


def test_ks_two_sample_bruteforce(ray_session):
    from dcs_ray.functions.stats import ks_two_sample

    rng = np.random.default_rng(3)
    ga = rng.integers(0, 50, 200)
    gb = rng.integers(10, 60, 150)
    t = pa.table(
        {
            "g": pa.array(["a"] * 200 + ["b"] * 150),
            "v": pa.array(np.concatenate([ga, gb]), pa.int64()),
        }
    )
    ks, na, nb = ks_two_sample(ray.data.from_arrow(t), "g", "v", "a", "b")
    assert (na, nb) == (200, 150)
    grid = np.unique(np.concatenate([ga, gb]))
    fa = np.searchsorted(np.sort(ga), grid, side="right") / 200
    fb = np.searchsorted(np.sort(gb), grid, side="right") / 150
    assert abs(ks - np.max(np.abs(fa - fb))) < 1e-6


def test_markov_stationary_properties():
    from dcs_ray.functions.stats import markov_stationary

    trans = pa.table(
        {
            "prev_type": pa.array(["a", "a", "b", "c"]),
            "next_type": pa.array(["b", "c", "a", "a"]),
            "n": pa.array([3, 1, 4, 2], pa.int64()),
        }
    )
    t = markov_stationary(trans, ["a", "b", "c", "d"], iters=5)
    pr = dict(zip(t["event_type"].to_pylist(), t["pr"].to_pylist()))
    assert abs(sum(pr.values()) - 1.0) < 1e-5
    assert pr["d"] == 0.0  # no incoming mass after the first step
    # direct dense replay
    types = ["a", "b", "c", "d"]
    mat = np.zeros((4, 4))
    for p, q, n in zip(["a", "a", "b", "c"], ["b", "c", "a", "a"], [3, 1, 4, 2]):
        mat[types.index(p), types.index(q)] = n
    row = mat.sum(1, keepdims=True)
    np.divide(mat, row, out=mat, where=row > 0)
    v = np.full(4, 0.25)
    for _ in range(5):
        v = v @ mat
        v /= v.sum()
    for i, ty in enumerate(types):
        assert abs(pr[ty] - v[i]) < 1e-6


def test_session_type_pairs_bruteforce(ray_session):
    from dcs_ray.functions.windows import session_type_pairs

    rng = np.random.default_rng(5)
    n = 400
    users = rng.integers(0, 12, n)
    ts = rng.integers(0, 100_000, n) * 1_000_000  # µs, gaps span 30 min
    types = rng.choice(["x", "y", "z", "w"], n)
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types),
        }
    )
    got_t = pa.concat_tables(
        pa.table(b)
        for b in session_type_pairs(ray.data.from_arrow(t), n_buckets=4).iter_batches(
            batch_format="pyarrow"
        )
    )
    got = dict(
        zip(
            zip(got_t["type_a"].to_pylist(), got_t["type_b"].to_pylist()),
            got_t["n"].to_pylist(),
        )
    )
    # brute force: per user sort by ts, split at >30min, distinct types
    want: collections.Counter = collections.Counter()
    df = pd.DataFrame({"u": users, "t": ts, "ty": types}).sort_values(["u", "t"])
    for _, g in df.groupby("u"):
        gap = g["t"].diff().fillna(0) > 1800 * 1_000_000
        sid = gap.cumsum()
        for _, s in g.groupby(sid):
            for a, b in itertools.combinations(sorted(set(s["ty"])), 2):
                want[(a, b)] += 1
    assert got == dict(want)


def test_hapax_ratio_bruteforce():
    from __ray_entry__ import _q_hapax_ratio_by_lang
    import duckdb

    t = _q_hapax_ratio_by_lang("/root/testdata/sf0.001")
    want = duckdb.sql("""
        WITH tok AS (SELECT doc_id, lang, unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
             FROM '/root/testdata/sf0.001/documents.parquet'),
        lt AS (SELECT lang, term, count(*) AS n FROM tok GROUP BY 1, 2)
        SELECT lang, count(*) AS vocab, sum(CASE WHEN n=1 THEN 1 ELSE 0 END) AS hapax
        FROM lt GROUP BY lang ORDER BY lang
    """).fetchall()
    got = list(zip(t["lang"].to_pylist(), t["vocab"].to_pylist(), t["hapax"].to_pylist()))
    assert got == [(l, int(v), int(h)) for l, v, h in want]
    for v, h, r in zip(t["vocab"].to_pylist(), t["hapax"].to_pylist(),
                       t["hapax_ratio"].to_pylist()):
        assert abs(r - h / v) < 1e-6


def test_roc_auc_quality_bruteforce(ray_session):
    """Rank-sum AUC == the O(n²) pairwise definition with 0.5 for ties."""
    from __ray_entry__ import (
        _q_log_loss_quality, _q_quality_classifier, _q_roc_auc_quality,
    )
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    t = _q_roc_auc_quality(sf)
    q = _q_quality_classifier(sf).to_pandas().sort_values("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang"]).sort_values("doc_id")
    p = q["quality_prob"].to_numpy()
    y = (docs["lang"] == "en").to_numpy()
    pos, neg = p[y], p[~y]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    want = wins / (len(pos) * len(neg))
    assert abs(t["auc"][0].as_py() - want) < 1e-6
    assert t["n_pos"][0].as_py() == int(y.sum())

    ll = _q_log_loss_quality(sf)
    pc_ = np.clip(p, 1e-6, 1 - 1e-6)
    want_ll = -(y * np.log(pc_) + (~y) * np.log1p(-pc_))
    np.testing.assert_allclose(
        np.asarray(ll["loss"]), np.round(want_ll, 6), atol=1.1e-6
    )


def test_host_split_group_integrity(ray_session):
    from __ray_entry__ import _q_host_split

    t = _q_host_split("/root/testdata/sf0.001").to_pandas()
    per_host = t.groupby("source")["split"].nunique()
    assert (per_host == 1).all()  # no host straddles splits
    assert set(t["split"]) <= {"train", "val", "test"}
    assert (t["split"] == "train").mean() > 0.2  # 80% in expectation


def test_theil_sen_and_mann_kendall_known_series():
    """Closed-form checks on tiny hand series (no Ray needed)."""
    from dcs_ray.functions.stats import mann_kendall, theil_sen_slope

    day = np.array([0, 1, 2, 3], np.int64)
    n = np.array([1, 3, 2, 8], np.int64)
    slope, n_pairs = theil_sen_slope(day, n)
    # slopes: (3-1)/1=2, (2-1)/2=.5, (8-1)/3=7/3, (2-3)/1=-1,
    #         (8-3)/2=2.5, (8-2)/1=6 -> sorted [-1,.5,2,7/3,2.5,6]
    assert n_pairs == 6
    assert abs(slope - (2 + 7 / 3) / 2) < 1e-6
    s, npairs, tau = mann_kendall(n)
    assert (s, npairs) == (4, 6)  # signs: +,+,+,-,+,+
    assert abs(tau - 4 / 6) < 1e-6

    # strictly increasing -> slope>0, tau=1
    s2, np2, tau2 = mann_kendall(np.arange(10, dtype=np.int64))
    assert s2 == np2 and tau2 == 1.0


def test_acf_matches_float_estimator():
    """Integer-moment ACF == the textbook float computation."""
    from dcs_ray.functions.stats import acf

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1000, size=40).astype(np.int64)
    lags, r = acf(x, max_lag=7)
    xc = x.astype(np.float64) - x.mean()
    den = float((xc * xc).sum())
    for k, rk in zip(lags, r):
        want = float((xc[k:] * xc[:-k]).sum()) / den
        assert abs(rk - round(want, 6)) < 1.1e-6
    # lag list clips at n-1
    lags2, _ = acf(np.array([1, 5, 2], np.int64), max_lag=7)
    assert list(lags2) == [1, 2]


def test_weighted_median_quantile_cont_semantics():
    from dcs_ray.functions.stats import weighted_median

    v = np.array([1.0, 2.0, 10.0])
    assert weighted_median(v, np.array([1, 1, 1])) == 2.0
    assert weighted_median(v, np.array([1, 1, 2])) == 6.0  # (2+10)/2
    assert weighted_median(v[:1], np.array([0])) != weighted_median(v[:1], np.array([0]))  # nan


def test_daily_counts_fold(ray_session):
    import ray.data
    from dcs_ray.functions.stats import daily_counts

    us = np.array([0, 1, 86_400_000_000, 86_400_000_001, 2 * 86_400_000_000],
                  np.int64)
    ds = ray.data.from_arrow(pa.table({"ts": pa.array(us, pa.timestamp("us"))}))
    t = daily_counts(ds, "ts")
    assert t["day"].to_pylist() == [0, 1, 2]
    assert t["n"].to_pylist() == [2, 2, 1]
