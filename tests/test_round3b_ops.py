"""Round-3 batch-2 operators: SALSA vs a dense numpy reference,
Calinski–Harabasz / simplified silhouette vs brute-force recomputation
on planted clusters, and boolean AND-NOT set semantics."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.graph import salsa
from dcs_ray.functions.kmeans import (
    _train_centroids,
    calinski_harabasz,
    silhouette_simplified,
)


def _edges_ds(pairs):
    s, d = zip(*pairs)
    return ray.data.from_arrow(
        pa.table(
            {"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())}
        )
    )


def _salsa_dense(pairs, n_iter=5):
    """Driver-side dense reference: same update order and L1 norms."""
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    ind = np.zeros(n)
    for s, d in pairs:
        out[idx[s]] += 1
        ind[idx[d]] += 1
    a = np.full(n, 1.0 / n)
    h = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        na = np.zeros(n)
        for s, d in pairs:
            na[idx[d]] += h[idx[s]] / out[idx[s]]
        a = na / na.sum() if na.sum() > 0 else na
        nh = np.zeros(n)
        for s, d in pairs:
            nh[idx[s]] += a[idx[d]] / ind[idx[d]]
        h = nh / nh.sum() if nh.sum() > 0 else nh
    return nodes, a, h


def test_salsa_matches_dense_reference(ray_session):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 0), (2, 4)]
    t = salsa(_edges_ds(pairs), n_iter=5, src="src", dst="dst")
    nodes, a, h = _salsa_dense(pairs)
    assert t["node"].to_pylist() == nodes
    np.testing.assert_allclose(
        t["authority"].to_numpy(), np.round(a, 6), atol=1.1e-6
    )
    np.testing.assert_allclose(t["hub"].to_numpy(), np.round(h, 6), atol=1.1e-6)


def test_salsa_duplicate_edges_weight_multiply(ray_session):
    # a duplicated edge doubles its walk weight on both sides
    single = salsa(_edges_ds([(0, 1), (2, 1), (1, 0)]), n_iter=3)
    doubled = salsa(
        _edges_ds([(0, 1), (0, 1), (2, 1), (1, 0)]), n_iter=3
    )
    # authority of node 1 must differ (0's push now splits differently)
    nodes, a, h = _salsa_dense([(0, 1), (0, 1), (2, 1), (1, 0)], n_iter=3)
    np.testing.assert_allclose(
        doubled["authority"].to_numpy(), np.round(a, 6), atol=1.1e-6
    )
    assert single["authority"].to_pylist() != doubled["authority"].to_pylist() or (
        single["hub"].to_pylist() != doubled["hub"].to_pylist()
    )


def _emb_table(X):
    return pa.table(
        {
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in X], pa.list_(pa.float32())
            ),
        }
    )


def _planted(seed=7, k=3, per=25, d=8, spread=0.05):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 10
    X = np.concatenate([c + spread * rng.randn(per, d) for c in centers])
    # seed rows 0..k-1 land one in each planted cluster
    order = np.arange(len(X)).reshape(k, per).T.reshape(-1)
    return X[order]


def test_calinski_harabasz_matches_bruteforce(ray_session):
    X = _planted()
    ds = ray.data.from_arrow(_emb_table(X))
    t = calinski_harabasz(ds, k=3, n_iter=3)
    # brute-force with the SAME trained centroids
    C, _, _ = _train_centroids(
        ray.data.from_arrow(_emb_table(X)), 3, 3, "embedding", "vec_id"
    )
    Xf = X.astype(np.float32).astype(np.float64)
    dist = ((Xf[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(dist, axis=1)
    W = dist[np.arange(len(Xf)), a].sum()
    gm = Xf.mean(axis=0)
    present, counts = np.unique(a, return_counts=True)
    B = (counts * ((C[present] - gm) ** 2).sum(axis=1)).sum()
    kk, n = len(present), len(Xf)
    ch = (B / (kk - 1)) / (W / (n - kk))
    row = t.to_pylist()[0]
    assert row["n_points"] == n and row["k_clusters"] == kk
    # engine output is round-6: compare with the matching tolerance
    np.testing.assert_allclose(row["within_ss"], W, atol=1.1e-6)
    np.testing.assert_allclose(row["ch_index"], ch, rtol=1e-6, atol=1.1e-6)
    assert row["ch_index"] > 1000  # planted clusters are very separable


def test_silhouette_planted_clusters_near_one(ray_session):
    X = _planted()
    t = silhouette_simplified(ray.data.from_arrow(_emb_table(X)), k=3, n_iter=3)
    assert len(t) == 3
    assert all(s > 0.95 for s in t["mean_silhouette"].to_pylist())
    ov = t["overall_silhouette"].to_pylist()
    assert len(set(ov)) == 1 and ov[0] > 0.95


def test_silhouette_identical_points_zero(ray_session):
    # every point sits ON its centroid and ties break to cid 0; the
    # 0/0 guard must yield s = 0, not NaN
    X = np.zeros((8, 4))
    t = silhouette_simplified(ray.data.from_arrow(_emb_table(X)), k=2, n_iter=2)
    assert t["mean_silhouette"].to_pylist() == [0.0]
    assert t["overall_silhouette"].to_pylist() == [0.0]
