"""Distributed k-means TRAINING (Lloyd's algorithm, fixed iterations)
over an embedding column — the full-corpus counterpart of the bounded
sample k-means inside ``simsearch.IvfAnnIndex``; the iterative
centroid-training shape every embedding pipeline needs (IVF list
training, cluster-balanced mixtures, diversity sampling).

Scale shape: centroids (k × d floats) broadcast once per iteration via
``ray.put``; each iteration is ONE streaming pass where a batch emits
≤ k partial rows (cid, per-dim sums, member count) — the exchange is
k·d-sized, never corpus-sized; partials fold on the driver in a
CANONICAL sorted order so a given block layout reproduces exactly.

Determinism contract (what the SQL oracle replays):
- init: the embeddings of the k smallest ids, cid in id order;
- assignment: argmin squared L2, ties to the smallest cid;
- update: per-dim mean of members; an EMPTY cluster keeps its previous
  centroid;
- output: (cid, n_members, dim, centroid round 6) sorted (cid, dim),
  sizes from the LAST assignment pass.

Float caveat: per-dim sums are order-sensitive at the ULP level; the
final round(·, 6) absorbs it (same contract as pagerank/HITS). Exact
assignment ties across ULP-diverged distances would need exact
arithmetic — measure-zero for real embeddings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_f64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _train_centroids(
    ds: ray.data.Dataset,
    k: int,
    n_iter: int,
    vec_col: str,
    id_col: str,
) -> tuple[np.ndarray, np.ndarray, ray.data.Dataset]:
    """Lloyd's training core shared by ``kmeans_fit`` and
    ``davies_bouldin``: returns (UNROUNDED centroids (k,d), member
    counts from the last assignment pass, the materialized input)."""
    ds = ds.materialize()  # consumed n_iter + 1 times

    # deterministic seeds: embeddings of the k smallest ids
    def local_seed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                vec_col: b[vec_col].take(pa.array(order)),
            }
        )

    cand = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(local_seed, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    cand = cand.sort_by(id_col).slice(0, k)
    if len(cand) < k:
        raise ValueError(f"need at least k={k} rows to seed k-means")
    C = _emb_f64(cand[vec_col])  # (k, d)
    d = C.shape[1]

    counts = np.zeros(k, np.int64)
    for _ in range(n_iter):
        cref = ray.put(C.copy())

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            cc = ray.get(_cref)
            E = _emb_f64(b[vec_col])
            # squared L2 to every centroid; argmin ties -> smallest cid
            dist = ((E[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(dist, axis=1)
            cids, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(cids), E.shape[1]), np.float64)
            np.add.at(sums, inv, E)
            n = np.bincount(inv).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(cids.astype(np.int64), pa.int64()),
                    "s": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(n, pa.int64()),
                }
            )

        rows = pa.concat_tables(
            pa.table(b)
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
        cids = rows["cid"].to_numpy(zero_copy_only=False)
        ns = rows["n"].to_numpy(zero_copy_only=False)
        S = _emb_f64(rows["s"])
        counts = np.zeros(k, np.int64)
        newC = C.copy()  # empty clusters keep their previous centroid
        for cid in np.unique(cids):
            m = cids == cid
            # canonical fold order: sort this cluster's partial rows by
            # their values so the float sum is arrival-order-independent
            sub = S[m]
            order = np.lexsort(tuple(sub[:, j] for j in range(d - 1, -1, -1)))
            tot = sub[order].sum(axis=0)
            cnt = int(ns[m].sum())
            counts[cid] = cnt
            newC[cid] = tot / float(cnt)
        C = newC
    return C, counts, ds


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Train k centroids; see module docstring for the contract."""
    C, counts, _ = _train_centroids(ds, k, n_iter, vec_col, id_col)
    d = C.shape[1]
    out_cid, out_n, out_dim, out_v = [], [], [], []
    for cid in range(k):
        for j in range(d):
            out_cid.append(cid)
            out_n.append(int(counts[cid]))
            out_dim.append(j + 1)  # 1-based, matching SQL list indexing
            out_v.append(round(float(C[cid, j]), 6))
    return pa.table(
        {
            "cid": pa.array(out_cid, pa.int64()),
            "n_members": pa.array(out_n, pa.int64()),
            "dim": pa.array(out_dim, pa.int64()),
            "centroid": pa.array(out_v, pa.float64()),
        }
    )


def davies_bouldin(
    ds: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Davies–Bouldin clustering-quality index over the trained k-means
    partition: per-cluster scatter S_i = mean ‖x − c_i‖ of members,
    centroid separation M_ij = ‖c_i − c_j‖, and the per-cluster worst
    ratio term_i = max_{j≠i} (S_i+S_j)/M_ij; DB = mean_i term_i (lower
    is better). One extra streaming assignment pass after training —
    each batch emits ≤k (cid, Σ‖x−c‖, n) partials, folded in canonical
    sorted order; everything after is k² driver floats. Empty clusters
    are excluded (no scatter is defined). Output: one row per non-empty
    cluster plus the constant db_index column, round 6 (same ULP
    contract as the centroid means)."""
    C, _, ds = _train_centroids(ds, k, n_iter, vec_col, id_col)
    cref = ray.put(C.copy())

    def partial(b: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        E = _emb_f64(b[vec_col])
        dist = ((E[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)  # ties -> smallest cid
        dmin = np.sqrt(dist[np.arange(len(E)), a])
        cids, inv = np.unique(a, return_inverse=True)
        ssq = np.zeros(len(cids), np.float64)
        np.add.at(ssq, inv, dmin)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(cids.astype(np.int64), pa.int64()),
                "ssq": pa.array(ssq, pa.float64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by([("cid", "ascending"), ("ssq", "ascending")])  # canonical fold
    cids = rows["cid"].to_numpy(zero_copy_only=False)
    ssq = rows["ssq"].to_numpy(zero_copy_only=False)
    ns = rows["n"].to_numpy(zero_copy_only=False)
    present = np.unique(cids)
    S = np.zeros(len(present), np.float64)
    N = np.zeros(len(present), np.int64)
    for idx, cid in enumerate(present):
        m = cids == cid
        S[idx] = ssq[m].sum() / float(ns[m].sum())
        N[idx] = int(ns[m].sum())
    # centroid separations and worst-ratio terms over PRESENT clusters
    sub = C[present]
    diff = sub[:, None, :] - sub[None, :, :]
    M = np.sqrt((diff * diff).sum(axis=2))
    terms = np.empty(len(present), np.float64)
    for i in range(len(present)):
        r = (S[i] + S) / np.where(M[i] > 0, M[i], np.inf)
        r[i] = -np.inf
        terms[i] = r.max()
    db = float(terms.sum() / len(terms))
    return pa.table(
        {
            "cid": pa.array(present.astype(np.int64), pa.int64()),
            "n_members": pa.array(N, pa.int64()),
            "scatter": pa.array(np.round(S, 6) + 0.0, pa.float64()),
            "db_term": pa.array(np.round(terms, 6) + 0.0, pa.float64()),
            "db_index": pa.array(
                np.full(len(present), round(db, 6) + 0.0), pa.float64()
            ),
        }
    )


def calinski_harabasz(
    ds: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Calinski–Harabasz (variance-ratio) index of the trained k-means
    partition: CH = (B/(k−1)) / (W/(N−k)) with W = Σ‖x − c_assigned‖²
    (squared L2 to the FINAL centroids, argmin assignment, ties to the
    smallest cid), B = Σ_i n_i‖c_i − x̄‖² against the grand mean of ALL
    points, and k = the number of NON-EMPTY clusters (the same rule the
    Davies–Bouldin gate uses). Higher is better — the between/within
    variance-ratio companion to DB's worst-pair ratio.

    Scale shape: after training, ONE extra streaming pass emits ≤k
    (cid, ΣW, n) partials plus a per-dim sum row for the grand mean;
    everything after is k·d driver floats, folded in canonical sorted
    order."""
    C, _, ds = _train_centroids(ds, k, n_iter, vec_col, id_col)
    d = C.shape[1]
    cref = ray.put(C.copy())

    def partial(b: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        E = _emb_f64(b[vec_col])
        dist = ((E[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)  # ties -> smallest cid
        w = dist[np.arange(len(E)), a]
        cids, inv = np.unique(a, return_inverse=True)
        ws = np.zeros(len(cids), np.float64)
        np.add.at(ws, inv, w)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(cids.astype(np.int64), pa.int64()),
                "w": pa.array(ws, pa.float64()),
                "n": pa.array(n, pa.int64()),
                "gs": pa.array([E.sum(axis=0).tolist()] * len(cids),
                               pa.list_(pa.float64())),
                "gn": pa.array(
                    np.where(np.arange(len(cids)) == 0, len(E), 0), pa.int64()
                ),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by([("cid", "ascending"), ("w", "ascending")])  # canonical fold
    cids = rows["cid"].to_numpy(zero_copy_only=False)
    ws = rows["w"].to_numpy(zero_copy_only=False)
    ns = rows["n"].to_numpy(zero_copy_only=False)
    gns = rows["gn"].to_numpy(zero_copy_only=False)
    GS = _emb_f64(rows["gs"])
    # grand mean: one sum row per BATCH (gn > 0 marks it), canonical order
    bm = gns > 0
    sub = GS[bm]
    order = np.lexsort(tuple(sub[:, j] for j in range(d - 1, -1, -1)))
    g_sum = sub[order].sum(axis=0)
    n_tot = int(gns.sum())
    gmean = g_sum / float(n_tot)

    present = np.unique(cids)
    W = 0.0
    N = np.zeros(len(present), np.int64)
    for idx, cid in enumerate(present):
        m = cids == cid
        W += float(ws[m].sum())
        N[idx] = int(ns[m].sum())
    diff = C[present] - gmean[None, :]
    B = float((N.astype(np.float64) * (diff * diff).sum(axis=1)).sum())
    kk = len(present)
    ch = (
        (B / (kk - 1)) / (W / (n_tot - kk))
        if kk > 1 and n_tot > kk and W > 0
        else 0.0
    )
    return pa.table(
        {
            "n_points": pa.array([n_tot], pa.int64()),
            "k_clusters": pa.array([kk], pa.int64()),
            "within_ss": pa.array([round(W, 6) + 0.0], pa.float64()),
            "between_ss": pa.array([round(B, 6) + 0.0], pa.float64()),
            "ch_index": pa.array([round(ch, 6) + 0.0], pa.float64()),
        }
    )


def silhouette_simplified(
    ds: ray.data.Dataset,
    k: int = 4,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Simplified (centroid-based) silhouette of the trained k-means
    partition: per point a = ‖x − c_assigned‖, b = min over OTHER
    centroids ‖x − c_j‖, s = (b − a)/max(a, b) (0 when both are 0) —
    the O(N·k) silhouette every large-scale clustering report uses
    instead of the O(N²) pairwise original. Per-cluster mean s plus the
    overall mean as a constant column, round 6.

    One streaming pass after training (≤k partial rows per batch,
    canonical driver fold); assignment is argmin squared L2 with ties
    to the smallest cid, identical to the other k-means gates."""
    C, _, ds = _train_centroids(ds, k, n_iter, vec_col, id_col)
    cref = ray.put(C.copy())

    def partial(b: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        E = _emb_f64(b[vec_col])
        dist = ((E[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
        a_idx = np.argmin(dist, axis=1)  # ties -> smallest cid
        dsorted = np.sort(dist, axis=1)
        a = np.sqrt(dsorted[:, 0])
        bb = np.sqrt(dsorted[:, 1])
        mx = np.maximum(a, bb)
        s = np.where(mx > 0, (bb - a) / np.where(mx > 0, mx, 1.0), 0.0)
        cids, inv = np.unique(a_idx, return_inverse=True)
        ss = np.zeros(len(cids), np.float64)
        np.add.at(ss, inv, s)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(cids.astype(np.int64), pa.int64()),
                "s": pa.array(ss, pa.float64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by([("cid", "ascending"), ("s", "ascending")])  # canonical fold
    cids = rows["cid"].to_numpy(zero_copy_only=False)
    ss = rows["s"].to_numpy(zero_copy_only=False)
    ns = rows["n"].to_numpy(zero_copy_only=False)
    present = np.unique(cids)
    S = np.zeros(len(present), np.float64)
    N = np.zeros(len(present), np.int64)
    for idx, cid in enumerate(present):
        m = cids == cid
        S[idx] = ss[m].sum()
        N[idx] = int(ns[m].sum())
    overall = float(S.sum() / N.sum()) if N.sum() else 0.0
    return pa.table(
        {
            "cid": pa.array(present.astype(np.int64), pa.int64()),
            "n_members": pa.array(N, pa.int64()),
            "mean_silhouette": pa.array(
                np.round(S / N.astype(np.float64), 6) + 0.0, pa.float64()
            ),
            "overall_silhouette": pa.array(
                np.full(len(present), round(overall, 6) + 0.0), pa.float64()
            ),
        }
    )


def pca_top_component(
    ds: ray.data.Dataset,
    n_iter: int = 10,
    vec_col: str = "embedding",
) -> pa.Table:
    """Distributed PCA, top principal component: ONE streaming pass
    folds the covariance moments (per batch: n, Σx, upper-triangle
    Σxxᵀ — a d(d+3)/2-float partial row, never the corpus), then
    ``n_iter`` power iterations on the d×d covariance run driver-side
    (d² floats — trivially small). Population covariance
    C = Σxxᵀ/N − μμᵀ.

    Determinism: partials fold in canonical sorted order; the power
    iteration starts from the uniform vector, L2-normalizes each step
    (sums in dim order), and the final component's sign is
    canonicalized so the largest-|loading| dim (ties → smallest dim)
    is positive. The SQL oracle replays the moments, every matvec +
    normalize, the sign rule, and the Rayleigh-quotient eigenvalue.
    Output: (dim 1-based, loading round 6, eigenvalue round 6)."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        E = _emb_f64(b[vec_col])
        n, d = E.shape
        s = E.sum(axis=0)
        Q = E.T @ E
        iu = np.triu_indices(d)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.float64())),
                "q": pa.array([Q[iu].tolist()], pa.list_(pa.float64())),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    S = _emb_f64(rows["s"])
    Qf = _emb_f64(rows["q"])
    N = int(rows["n"].to_numpy(zero_copy_only=False).sum())
    d = S.shape[1]
    # canonical fold order (sort partial rows by their s values)
    order = np.lexsort(tuple(S[:, j] for j in range(d - 1, -1, -1)))
    s_tot = S[order].sum(axis=0)
    q_tot = Qf[order].sum(axis=0)
    iu = np.triu_indices(d)
    Q = np.zeros((d, d), np.float64)
    Q[iu] = q_tot
    Q = Q + np.triu(Q, 1).T
    mu = s_tot / float(N)
    C = Q / float(N) - np.outer(mu, mu)

    v = np.full(d, 1.0 / math.sqrt(d), np.float64)
    for _ in range(n_iter):
        w = C @ v
        nrm = math.sqrt(float(np.sum(w * w)))
        if nrm == 0.0:
            break
        v = w / nrm
    # sign canonicalization: largest |loading|, ties -> smallest dim
    lead = int(np.lexsort((np.arange(d), -np.abs(v)))[0])
    if v[lead] < 0:
        v = -v
    eig = float(v @ (C @ v))
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
            "loading": pa.array(np.round(v, 6), pa.float64()),
            "eigenvalue": pa.array(np.full(d, round(eig, 6)), pa.float64()),
        }
    )
