"""As-of join and deterministic sampling vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from dcs_ray.functions.joins import asof_join
from dcs_ray.functions.sampling import (
    sample_fraction,
    sample_stratified,
    splitmix64,
)


def _collect(ds) -> pa.Table:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tables) if tables else pa.table({})


def _mk(rows, **cols):
    return ray.data.from_arrow(pa.table(cols))


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    nl, nr = 300, 400
    lk = rng.integers(0, 20, nl).astype(np.int64)
    lt = rng.integers(0, 10_000, nl).astype(np.int64)
    rk = rng.integers(0, 20, nr).astype(np.int64)
    rt = np.sort(rng.choice(np.arange(50_000), size=nr, replace=False)).astype(np.int64) % 10_000
    # make right (key, ts) unique so the match is well-defined
    seen = set()
    keep = []
    for i in range(nr):
        if (rk[i], rt[i]) in seen:
            keep.append(False)
        else:
            seen.add((rk[i], rt[i]))
            keep.append(True)
    rk, rt = rk[keep], rt[keep]
    rv = np.arange(len(rk), dtype=np.int64) * 10
    left = _mk(None, lid=pa.array(np.arange(nl), pa.int64()),
               k=pa.array(lk, pa.int64()), ts_us=pa.array(lt, pa.int64()))
    right = _mk(None, rid=pa.array(np.arange(len(rk)), pa.int64()),
                k=pa.array(rk, pa.int64()), ts_us=pa.array(rt, pa.int64()),
                v=pa.array(rv, pa.int64()))
    out = _collect(
        asof_join(left, right, on="k", ts_col="ts_us", right_cols=("rid", "v"),
                  num_buckets=7)
    ).to_pandas().set_index("lid").sort_index()
    assert len(out) == nl
    for lid in range(nl):
        cands = [
            (rt[j], j) for j in range(len(rk)) if rk[j] == lk[lid] and rt[j] <= lt[lid]
        ]
        want = max(cands)[1] if cands else None
        got = out.loc[lid, "rid"]
        got = None if pd.isna(got) else int(got)
        assert got == want, (lid, got, want)


def test_asof_join_tolerance_and_tie(ray_session):
    left = _mk(None, lid=pa.array([0, 1, 2], pa.int64()),
               k=pa.array([1, 1, 1], pa.int64()),
               ts_us=pa.array([100, 200, 1000], pa.int64()))
    right = _mk(None, rid=pa.array([10, 11], pa.int64()),
                k=pa.array([1, 1], pa.int64()),
                ts_us=pa.array([100, 150], pa.int64()))
    out = _collect(
        asof_join(left, right, on="k", ts_col="ts_us", right_cols=("rid",),
                  tolerance_us=100)
    ).to_pandas().set_index("lid").sort_index()
    # equal ts matches (tie); 200-150 ≤ 100 matches; 1000-150 > 100 does not
    assert int(out.loc[0, "rid"]) == 10
    assert int(out.loc[1, "rid"]) == 11
    assert pd.isna(out.loc[2, "rid"])


def test_asof_join_no_right_rows(ray_session):
    left = _mk(None, lid=pa.array([0], pa.int64()), k=pa.array([1], pa.int64()),
               ts_us=pa.array([5], pa.int64()))
    right = _mk(None, rid=pa.array([], pa.int64()), k=pa.array([], pa.int64()),
                ts_us=pa.array([], pa.int64()))
    out = _collect(
        asof_join(left, right, on="k", ts_col="ts_us", right_cols=("rid",))
    ).to_pandas()
    assert len(out) == 1 and pd.isna(out.rid.iloc[0])


def test_sample_fraction_deterministic(ray_session):
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(_collect(sample_fraction(docs, 0.3, seed=9))["doc_id"].to_pylist())
    b = sorted(_collect(sample_fraction(docs, 0.3, seed=9))["doc_id"].to_pylist())
    assert a == b
    ids = np.arange(500, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(9))
    want = sorted(ids[h < np.uint64(int(0.3 * 2**64))].tolist())
    assert a == want
    # a different seed gives a different (but similar-sized) sample
    c = sorted(_collect(sample_fraction(docs, 0.3, seed=10))["doc_id"].to_pylist())
    assert c != a
    assert abs(len(c) - len(a)) < 100


def test_sample_stratified_exact_n(ray_session):
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = _collect(sample_stratified(docs, "lang", 7, seed=3)).to_pandas()
    counts = out.groupby("lang").size()
    assert (counts == 7).all()
    # oracle: smallest (hash, id) per lang
    dp = docs.to_pandas()
    dp["h"] = splitmix64(dp.doc_id.to_numpy().astype(np.uint64) ^ np.uint64(3))
    want = set()
    for _, grp in dp.groupby("lang"):
        want |= set(grp.sort_values(["h", "doc_id"]).head(7).doc_id)
    assert set(out.doc_id) == want


def test_sample_stratified_small_stratum(ray_session):
    # n larger than a stratum keeps the whole stratum
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(10), pa.int64()),
            "lang": pa.array(["a"] * 8 + ["b"] * 2),
        }
    )
    out = _collect(
        sample_stratified(ray.data.from_arrow(t), "lang", 5)
    ).to_pandas()
    assert (out.lang == "b").sum() == 2
    assert (out.lang == "a").sum() == 5


def test_interval_join_matches_bruteforce(ray_session):
    """Windowed interval join == per-row brute force on random data,
    including empty-window rows (inner semantics) and exact bounds."""
    import numpy as np
    import pandas as pd

    from dcs_ray.functions.joins import interval_join

    rng = np.random.default_rng(4)
    nl, nr = 200, 400
    left = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 15, nl), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 5_000, nl), pa.int64()),
            "lid": pa.array(np.arange(nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 15, nr), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 5_000, nr), pa.int64()),
            "rid": pa.array(np.arange(nr), pa.int64()),
        }
    )
    out = interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "user_id", "ts_us", before_us=300, after_us=100,
        right_cols=("rid",), num_buckets=7,
    ).to_pandas()
    l, r = left.to_pandas(), right.to_pandas()
    want = sorted(
        (a.lid, b.rid)
        for _, a in l.iterrows()
        for _, b in r[
            (r.user_id == a.user_id)
            & (r.ts_us >= a.ts_us - 300)
            & (r.ts_us <= a.ts_us + 100)
        ].iterrows()
    )
    assert sorted(zip(out.lid, out.rid)) == want
    assert len(want) > 0


def test_split_dataset_disjoint_stable(ray_session):
    """Splits are disjoint, exhaustive, deterministic, and roughly
    proportional."""
    import numpy as np

    from dcs_ray.functions.sampling import split_dataset

    t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    out = split_dataset(ray.data.from_arrow(t), seed=3).to_pandas()
    assert len(out) == 5000
    vc = out.split.value_counts()
    assert set(vc.index) == {"train", "val", "test"}
    assert abs(vc["train"] / 5000 - 0.8) < 0.03
    assert abs(vc["val"] / 5000 - 0.1) < 0.02
    out2 = split_dataset(
        ray.data.from_arrow(t).repartition(7), seed=3
    ).to_pandas().sort_values("doc_id")
    assert out.sort_values("doc_id").split.tolist() == out2.split.tolist()


def test_global_shuffle_rank_is_exact_permutation(ray_session):
    """shuffle_rank is a 0..N-1 permutation equal to the rank in the
    (splitmix64(id^seed), id) order, regardless of block layout, and
    a different seed yields a different permutation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sampling import _row_hash, global_shuffle_rank

    ids = np.arange(0, 3000, 3, dtype=np.int64)
    rng = np.random.default_rng(1)
    rng.shuffle(ids)
    t = pa.table({"doc_id": pa.array(ids)})
    want_sorted_ids = np.sort(ids)
    h = _row_hash(want_sorted_ids.astype(np.uint64), 7)
    want = np.empty(len(ids), np.int64)
    want[np.lexsort((want_sorted_ids, h))] = np.arange(len(ids))
    for parts in (1, 5, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (
            global_shuffle_rank(ds, seed=7, n_buckets=256)
            .to_pandas()
            .sort_values("doc_id")
        )
        np.testing.assert_array_equal(out.shuffle_rank.to_numpy(), want)
    other = (
        global_shuffle_rank(ray.data.from_arrow(t), seed=8, n_buckets=256)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (other.shuffle_rank.to_numpy() != want).any()
    assert sorted(other.shuffle_rank) == list(range(len(ids)))


def test_weighted_sample_matches_local_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sampling import _row_hash, weighted_sample

    rng = np.random.default_rng(3)
    ids = np.arange(500, dtype=np.int64)
    w = rng.integers(1, 1000, 500).astype(np.int64)
    w[::50] = 0  # zero weights excluded
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    got = weighted_sample(
        ray.data.from_arrow(t).repartition(8), n=50, weight_col="n_chars", seed=9
    )
    pos = w > 0
    u = (_row_hash(ids[pos], 9).astype(np.float64) + 0.5) / np.float64(1 << 64)
    k = np.log(u) / w[pos]
    order = np.lexsort((ids[pos], -k))[:50]
    assert got["doc_id"].to_pylist() == ids[pos][order].tolist()
    assert got["weight"].to_pylist() == w[pos][order].tolist()
    # heavier rows are overrepresented: mean selected weight > mean weight
    assert np.mean(got["weight"].to_pylist()) > 1.2 * w[pos].mean()


def test_weighted_sample_layout_independent(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.sampling import weighted_sample

    ids = np.arange(300, dtype=np.int64)
    w = (ids % 97 + 1).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    a = weighted_sample(ray.data.from_arrow(t), n=30, weight_col="n_chars")
    b = weighted_sample(
        ray.data.from_arrow(t).repartition(16), n=30, weight_col="n_chars"
    )
    assert a.equals(b)


def test_retention_cohorts_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.windows import retention_cohorts

    week = 7 * 86400 * 1_000_000
    # u0 first in week 0, returns weeks 0 (twice) and 2; u1 first week 1
    rows = pa.table(
        {
            "user_id": pa.array([0, 0, 0, 1], pa.int64()),
            "ts": pa.array(
                [10, 20, 2 * week + 5, week + 3], pa.timestamp("us")
            ),
        }
    )
    ds = retention_cohorts(ray.data.from_arrow(rows).repartition(3))
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    ).sort_by([("cohort_week", "ascending"), ("week_offset", "ascending")])
    assert t["cohort_week"].to_pylist() == [0, 0, 1]
    assert t["week_offset"].to_pylist() == [0, 2, 0]
    assert t["n_users"].to_pylist() == [1, 1, 1]
