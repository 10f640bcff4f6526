"""Distributed k-means: planted clusters recovered, empty-cluster
carry-over, partition stability of the canonical fold."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.kmeans import kmeans_fit


def _emb_table(X, ids=None):
    ids = ids if ids is not None else range(len(X))
    return pa.table(
        {
            "vec_id": pa.array(list(ids), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_kmeans_recovers_planted_clusters():
    rng = np.random.RandomState(5)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    X = np.concatenate(
        [c + 0.01 * rng.randn(30, 8) for c in centers]
    )
    # seed ids 0..2 land one in each planted cluster
    ids = np.arange(len(X))
    ids[0], ids[30], ids[60] = 0, 1, 2
    ids[1], ids[31], ids[61] = 3, 4, 5
    out = kmeans_fit(
        ray.data.from_arrow(_emb_table(X, ids)).repartition(4), k=3, n_iter=4
    )
    assert out.column_names == ["cid", "n_members", "dim", "centroid"]
    assert len(out) == 3 * 8
    got = out.to_pandas()
    sizes = got.groupby("cid").n_members.first()
    assert sorted(sizes.tolist()) == [30, 30, 30]
    # each learned centroid sits within noise of a planted center
    learned = got.pivot(index="cid", columns="dim", values="centroid").to_numpy()
    for c in centers:
        assert (np.abs(learned - c).max(axis=1) < 0.1).any()


def test_kmeans_empty_cluster_keeps_previous_centroid():
    # two tight points far from the third seed; k=3 with seeds 0,1,2:
    # after one step the cluster seeded at an outlier keeps its centroid
    X = np.array(
        [[0.0, 0.0], [0.1, 0.0], [100.0, 100.0], [0.05, 0.0], [0.0, 0.1]]
    )
    out = kmeans_fit(ray.data.from_arrow(_emb_table(X)), k=3, n_iter=2)
    got = out.to_pandas()
    sizes = got.groupby("cid").n_members.first().tolist()
    assert 0 not in sizes or all(
        np.isfinite(got.centroid.to_numpy())
    )  # no NaN from a 0-member division
    assert np.isfinite(got.centroid.to_numpy()).all()


def test_pca_top_component_matches_numpy_eig():
    from dcs_ray.functions.kmeans import pca_top_component

    rng = np.random.RandomState(11)
    # anisotropic cloud: dominant axis along (1,1,0,...)/sqrt(2)
    d = 8
    base = rng.randn(300, d)
    base[:, 0] = base[:, 1] = 5.0 * rng.randn(300)
    out = pca_top_component(
        ray.data.from_arrow(_emb_table(base)).repartition(3), n_iter=50
    )
    assert out.column_names == ["dim", "loading", "eigenvalue"]
    v = out["loading"].to_numpy()
    lam = out["eigenvalue"].to_numpy()[0]
    # numpy reference on the float32-quantized data (the engine reads
    # float32 parquet-typed vectors)
    X = base.astype(np.float32).astype(np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    ref = V[:, -1]
    if ref[np.argmax(np.abs(ref))] < 0:
        ref = -ref
    np.testing.assert_allclose(v, ref, atol=1e-3)
    np.testing.assert_allclose(lam, w[-1], rtol=1e-3)
    # unit norm
    assert abs(float((v ** 2).sum()) - 1.0) < 1e-4
