"""Broadcast join and combiner groupby vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from dcs_ray.functions.relational import broadcast_join, combiner_groupby


def _collect(ds) -> pa.Table:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tables) if tables else pa.table({})


@pytest.fixture
def sides():
    rng = np.random.default_rng(2)
    big = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, 500).astype(np.int64), pa.int64()),
            "x": pa.array(np.arange(500), pa.int64()),
        }
    )
    small = pa.table(
        {
            "k": pa.array(np.arange(0, 40, 2).astype(np.int64), pa.int64()),
            "name": pa.array([f"s{v}" for v in range(0, 40, 2)]),
        }
    )
    return big, small


def test_broadcast_join_inner(ray_session, sides):
    big, small = sides
    out = _collect(
        broadcast_join(
            ray.data.from_arrow(big), ray.data.from_arrow(small), on="k",
            small_cols=("name",),
        )
    ).to_pandas()
    want = big.to_pandas().merge(small.to_pandas(), on="k", how="inner")
    assert sorted(out.x) == sorted(want.x)
    lookup = dict(zip(small["k"].to_pylist(), small["name"].to_pylist()))
    assert all(out.name == out.k.map(lookup))


def test_broadcast_join_left_nulls(ray_session, sides):
    big, small = sides
    out = _collect(
        broadcast_join(
            ray.data.from_arrow(big), ray.data.from_arrow(small), on="k",
            small_cols=("name",), how="left",
        )
    ).to_pandas()
    assert len(out) == len(big)
    odd = out[out.k % 2 == 1]
    assert odd.name.isna().all()
    assert out[out.k % 2 == 0].name.notna().all()


def test_broadcast_join_right_on_and_collision(ray_session):
    big = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "name": pa.array(["a", "b"])})
    )
    small = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, 2], pa.int64()), "name": pa.array(["x", "y"])})
    )
    out = _collect(
        broadcast_join(big, small, on="k", right_on="rk", small_cols=("name",))
    ).to_pandas().sort_values("k")
    assert list(out.columns) == ["k", "name", "name_r"]
    assert list(out.name_r) == ["x", "y"]


def test_broadcast_join_duplicate_small_keys_raises(ray_session):
    big = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    small = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 2], pa.int64())})
    )
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(big, small, on="k", small_cols=("v",))


def test_combiner_groupby_matches_pandas(ray_session):
    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], 1000)),
            "h": pa.array(rng.integers(0, 2, 1000).astype(np.int64), pa.int64()),
            "v": pa.array(rng.integers(0, 100, 1000).astype(np.int64), pa.int64()),
            "w": pa.array(rng.integers(0, 9, 1000).astype(np.int64), pa.int64()),
        }
    )
    # many small blocks to force real partial merging
    ds = ray.data.from_arrow(t).repartition(16)
    out = _collect(combiner_groupby(ds, ["g", "h"], ["v", "w"])).to_pandas()
    out = out.sort_values(["g", "h"]).reset_index(drop=True)
    want = (
        t.to_pandas().groupby(["g", "h"], as_index=False)
        .agg(v=("v", "sum"), w=("w", "sum"), n_rows=("v", "size"))
        .sort_values(["g", "h"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["g", "h", "v", "w", "n_rows"]].astype({"n_rows": "int64"}),
        want.astype({"n_rows": "int64"}),
    )


def test_shuffle_join_inner_matches_pandas(ray_session, sides):
    from dcs_ray.functions.relational import shuffle_join

    big, small = sides
    out = _collect(
        shuffle_join(
            ray.data.from_arrow(big), ray.data.from_arrow(small),
            on="k", num_partitions=4,
        )
    ).to_pandas().sort_values(["x"]).reset_index(drop=True)
    want = (
        big.to_pandas().merge(small.to_pandas(), on="k", how="inner")
        .sort_values(["x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[sorted(out.columns)], want[sorted(want.columns)])


def test_shuffle_join_right_on_and_left(ray_session):
    from dcs_ray.functions.relational import shuffle_join

    left = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                     "v": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"b": pa.array([2, 3, 4], pa.int64()),
                      "w": pa.array([200, 300, 400], pa.int64())})
    out = _collect(
        shuffle_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     on="a", right_on="b", how="left_outer", num_partitions=2)
    ).to_pandas().sort_values("a").reset_index(drop=True)
    assert out["a"].tolist() == [1, 2, 3]
    assert out["w"].fillna(-1).astype(int).tolist() == [-1, 200, 300]


def test_broadcast_semi_and_anti_join(ray_session):
    import numpy as np

    from dcs_ray.functions.relational import broadcast_semi_join

    big = ray.data.from_arrow(
        pa.table({"k": list(range(10)), "x": list(range(100, 110))})
    ).repartition(3)
    small = ray.data.from_arrow(pa.table({"j": [2, 5, 5, 7, 99]}))
    semi = pa.concat_tables(
        pa.table(b) for b in broadcast_semi_join(big, small, on="k", right_on="j")
        .iter_batches(batch_format="pyarrow")
    ).sort_by("k")
    assert semi["k"].to_pylist() == [2, 5, 7]
    anti = pa.concat_tables(
        pa.table(b) for b in broadcast_semi_join(big, small, on="k", right_on="j", anti=True)
        .iter_batches(batch_format="pyarrow")
    ).sort_by("k")
    assert anti["k"].to_pylist() == [0, 1, 3, 4, 6, 8, 9]
    # empty small side: semi keeps nothing, anti keeps everything
    empty = ray.data.from_arrow(pa.table({"j": pa.array([], pa.int64())}))
    assert broadcast_semi_join(big, empty, on="k", right_on="j").count() == 0
    assert broadcast_semi_join(big, empty, on="k", right_on="j", anti=True).count() == 10


def test_grouped_topn_matches_pandas(ray_session):
    import numpy as np

    from dcs_ray.functions.relational import grouped_topn

    rng = np.random.default_rng(13)
    t = pa.table(
        {
            "k": rng.integers(0, 20, size=3000),
            "id": np.arange(3000),
            "v": rng.integers(0, 50, size=3000),  # many ties
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)
    out = pa.concat_tables(
        pa.table(b)
        for b in grouped_topn(ds, "k", "v", 4, tie_col="id").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by([("k", "ascending"), ("v", "descending"), ("id", "ascending")])
    df = t.to_pandas().sort_values(["k", "v", "id"], ascending=[True, False, True])
    want = df.groupby("k").head(4).reset_index(drop=True)
    got = out.to_pandas()
    assert got[["k", "id", "v"]].reset_index(drop=True).equals(want[["k", "id", "v"]])


def test_group_zscore_constant_group_and_layout(ray_session):
    """Constant groups get z=0; partials fold identically across block
    layouts."""
    import numpy as np

    from dcs_ray.functions.relational import group_zscore

    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "g": pa.array(["a", "a", "a", "a", "b", "b", "b", "b"]),
            "v": pa.array([1, 2, 3, 4, 7, 7, 7, 7], pa.int64()),
        }
    )
    out = group_zscore(ray.data.from_arrow(t), "g", "v").to_pandas().sort_values("doc_id")
    a = out[out.g == "a"].z.to_numpy()
    m, sd = 2.5, np.sqrt(np.mean((np.array([1, 2, 3, 4]) - 2.5) ** 2))
    np.testing.assert_allclose(a, np.round((np.array([1, 2, 3, 4]) - m) / sd, 6))
    assert (out[out.g == "b"].z == 0.0).all()
    out2 = (
        group_zscore(ray.data.from_arrow(t).repartition(5), "g", "v")
        .to_pandas().sort_values("doc_id")
    )
    assert out.z.tolist() == out2.z.tolist()
