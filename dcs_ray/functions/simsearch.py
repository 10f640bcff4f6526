"""Similarity search over an embedding column (``list<float>``):
brute-force cosine top-k (baseline) and an LSH-bucketed variant (scale
path).

Brute force: the query matrix is broadcast once (``ray.put`` via closure
capture of a small ndarray); each ``map_batches`` task does one
``numpy`` matmul of its batch's embedding matrix against the queries and
emits per-batch top-k — the global top-k is a tiny sort. Nothing ever
materializes the full corpus on the driver.

LSH variant: signed-random-projection signatures bucket vectors; the
query probes only its own bucket(s) — at 100 TB this turns a full scan
into a bucket-local scan. Recall is measured against brute force in
tests (not exact by design)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column (float64 so cosine
    values match a DuckDB double-precision oracle)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = len(flat) // n
    return flat.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def knn_cosine_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k per query row. Returns
    (query_id, rank, id, cos_sim) sorted; ties break by ascending id."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy()
        sims = m @ q.T  # (batch, nq)
        out_q, out_i, out_s = [], [], []
        for j in range(q.shape[0]):
            s = sims[:, j]
            if len(s) > k:
                kth = np.partition(s, len(s) - k)[len(s) - k]
                sel = np.flatnonzero(s >= kth)
            else:
                sel = np.arange(len(s))
            out_q.append(np.full(len(sel), j, dtype=np.int32))
            out_i.append(ids[sel])
            out_s.append(s[sel].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int32()),
                id_col: pa.array(np.concatenate(out_i)),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        sims = group["cos_sim"].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, np.int32), pa.int32()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()),
                id_col: pa.array(ids[order]),
                "cos_sim": pa.array(np.round(sims[order], 6), pa.float64()),
            }
        )

    out_tables = [
        pa.table(b)
        for b in partial.groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not out_tables:
        return pa.schema(
            [
                ("query_id", pa.int32()),
                ("rank", pa.int32()),
                (id_col, pa.int64()),
                ("cos_sim", pa.float64()),
            ]
        ).empty_table()
    return pa.concat_tables(out_tables).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


# ---------------------------------------------------------------------------
# LSH (signed random projection) — the scale path
# ---------------------------------------------------------------------------


def near_dup_pairs_exact(
    ds: ray.data.Dataset,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Exact embedding-cosine near-duplicate pairs: all ``(id_a < id_b)``
    with cosine ≥ threshold.

    The normalized corpus matrix is broadcast ONCE via ``ray.put``; each
    ``map_batches`` task matmuls its batch against it (read from the
    object store zero-copy in every task, never re-shipped per batch).
    At 10^12-vector scale the same pair generation runs per LSH bucket
    (``knn_cosine_lsh``'s ``srp_signatures`` → bucket groupby); this is
    the exact, oracle-checkable base."""
    import pyarrow.parquet  # noqa: F401

    import ray

    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    full = pa.concat_tables(tables)
    all_ids = full[id_col].to_numpy().astype(np.int64)
    ref = ray.put((_normalize(_emb_matrix(full[emb_col])), all_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        M, ids_all = ray.get(ref)
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy().astype(np.int64)
        sims = m @ M.T
        bi, bj = np.nonzero(sims >= threshold)
        ia, ib = ids[bi], ids_all[bj]
        keep = ia < ib  # each unordered pair exactly once
        return pa.table(
            {
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
                "cos_sim": pa.array(np.round(sims[bi, bj][keep], 6), pa.float64()),
            }
        )

    out = [
        pa.table(b)
        for b in ds.map_batches(pairs, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_sim", pa.float64())]
    )
    if not out:
        return schema.empty_table()
    return pa.concat_tables(out).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def srp_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket id per row: sign bits against random hyperplanes."""
    bits = (m @ planes.T) > 0
    weights = np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64)
    return bits.astype(np.uint64) @ weights


def knn_cosine_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_planes: int = 4,
    probe_hamming: int = 1,
    seed: int = 13,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: scan only vectors whose SRP bucket is within
    ``probe_hamming`` bits of the query's (multiprobe). Same output
    schema as brute force; recall measured vs brute force in tests."""
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    d = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, d))
    q_sigs = srp_signatures(q, planes)

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy()
        sigs = srp_signatures(m, planes)
        out_q, out_i, out_s = [], [], []
        for j in range(q.shape[0]):
            xor = sigs ^ q_sigs[j]
            ham = np.zeros(len(xor), dtype=np.int64)
            for bit in range(num_planes):
                ham += ((xor >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
            sel = np.flatnonzero(ham <= probe_hamming)
            if len(sel) == 0:
                continue
            s = m[sel] @ q[j]
            out_q.append(np.full(len(sel), j, dtype=np.int32))
            out_i.append(ids[sel])
            out_s.append(s.astype(np.float64))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int32()),
                id_col: pa.array(np.concatenate(out_i)),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        sims = group["cos_sim"].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, np.int32), pa.int32()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()),
                id_col: pa.array(ids[order]),
                "cos_sim": pa.array(np.round(sims[order], 6), pa.float64()),
            }
        )

    tables = [
        pa.table(b)
        for b in partial.groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not tables:
        return pa.schema(
            [
                ("query_id", pa.int32()),
                ("rank", pa.int32()),
                (id_col, pa.int64()),
                ("cos_sim", pa.float64()),
            ]
        ).empty_table()
    return pa.concat_tables(tables).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )
