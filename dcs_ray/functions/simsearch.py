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

import json
import os

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


# per-worker cache of staged normalized blocks (path+mtime → (ids, matrix));
# each block participates in ~num_blocks pair tasks, so a warm worker
# re-reads nothing
_BLOCK_CACHE: dict = {}


def _load_block(path: str, id_col: str, emb_col: str):
    import pyarrow.parquet as pq

    key = (path, os.path.getmtime(path))
    hit = _BLOCK_CACHE.get(key)
    if hit is None:
        t = pq.read_table(path, columns=[id_col, emb_col])
        hit = (
            t[id_col].to_numpy().astype(np.int64),
            _normalize(_emb_matrix(t[emb_col])),
        )
        _BLOCK_CACHE.clear()  # keep at most a few blocks per worker
        _BLOCK_CACHE[key] = hit
    return hit


def near_dup_pairs_exact(
    ds: ray.data.Dataset,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_blocks: int = 8,
    stage_dir: str | None = None,
) -> pa.Table:
    """Exact embedding-cosine near-duplicate pairs: all ``(id_a < id_b)``
    with cosine ≥ threshold, as a distributed **block-pair cross
    product** — nothing ever materializes on the driver.

    The corpus is staged once to ``num_blocks`` Parquet blocks (a
    streaming distributed write), then one Ray task per block pair
    (i ≤ j) loads two blocks (per-worker cached) and does one matmul.
    Exact all-pairs is inherently O(N²) compute, but it is O(N²/B²) per
    task and O(N/B) per-task memory, with the driver touching only the
    (small) qualifying pairs. For the sub-quadratic approximate path at
    web scale use ``near_dup_pairs_lsh``."""
    import glob
    import shutil
    import tempfile

    tmp = stage_dir or tempfile.mkdtemp(prefix="dcs_neardup_", dir="/tmp")
    ds.select_columns([id_col, emb_col]).repartition(num_blocks).write_parquet(tmp)
    files = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
    spec = [
        {"fa": files[i], "fb": files[j], "same": i == j}
        for i in range(len(files))
        for j in range(i, len(files))
    ]

    def run(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for row in batch.to_pylist():
            ids_a, A = _load_block(row["fa"], id_col, emb_col)
            if row["same"]:
                ids_b, B = ids_a, A
            else:
                ids_b, B = _load_block(row["fb"], id_col, emb_col)
            if A.size == 0 or B.size == 0:
                continue
            sims = A @ B.T
            bi, bj = np.nonzero(sims >= threshold)
            ia, ib = ids_a[bi], ids_b[bj]
            keep = ia != ib
            ia, ib, s = ia[keep], ib[keep], sims[bi, bj][keep]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            if row["same"]:  # symmetric matmul saw each pair twice
                once = ia < ib
                lo, hi, s = lo[once], hi[once], s[once]
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(s)
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cos_sim": pa.array(np.round(np.concatenate(out_s), 6), pa.float64()),
            }
        )

    res = ray.data.from_items(spec).map_batches(run, batch_size=1, batch_format="pyarrow")
    out = [pa.table(b) for b in res.iter_batches(batch_format="pyarrow")]
    schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_sim", pa.float64())]
    )
    if stage_dir is None:
        shutil.rmtree(tmp, ignore_errors=True)
    if not out:
        return schema.empty_table()
    return pa.concat_tables(out).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def near_dup_pairs_lsh(
    ds: ray.data.Dataset,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_tables: int | None = None,
    bits_per_table: int | None = None,
    seed: int = 13,
    max_bucket: int = 4096,
    target_recall: float = 0.95,
) -> pa.Table:
    """Approximate near-dup pairs via OR-amplified SRP banding — the
    sub-quadratic scale path. ``num_tables`` independent SRP tables of
    ``bits_per_table`` hyperplanes each; vectors sharing a (table, sig)
    bucket compare pairwise inside the bucket only. A pair at cosine c
    is missed with probability (1-(1-θ/π)^b)^L (θ=acos(c)); recall is
    measured against the exact path in tests, never assumed.

    SIZE-AWARE banding (the defaults): when ``bits_per_table`` is None
    it is derived from a cheap corpus row count so the EXPECTED bucket
    size ≈ ``max_bucket``/4 — at web scale more hyperplanes split the
    space finer instead of every bucket slamming into the cap; when
    ``num_tables`` is None it is then sized from the banding model so a
    pair AT the threshold is still caught with ``target_recall``
    probability. Buckets that still exceed ``max_bucket`` (skew) are
    truncated, and the counts are SURFACED in the returned table's
    schema metadata (``capped_buckets``, ``dropped_ids``) — not just a
    log line."""
    schema_empty = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_sim", pa.float64())]
    )
    n_rows = ds.count()  # parquet metadata / block-count — never a scan
    if not n_rows:
        return schema_empty.empty_table()
    if bits_per_table is None:
        # E[bucket] = n / 2^bits ≈ max_bucket/4  →  bits = log2(4n/cap)
        bits_per_table = int(
            np.clip(np.ceil(np.log2(max(4.0 * n_rows / max_bucket, 4.0))), 2, 24)
        )
    if num_tables is None:
        # P[miss at threshold] = (1 - p^b)^L ≤ 1-target_recall,
        # p = 1 - acos(threshold)/π  (Charikar SRP collision probability)
        p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
        pb = max(p**bits_per_table, 1e-12)
        num_tables = int(
            np.clip(np.ceil(np.log(max(1.0 - target_recall, 1e-9)) / np.log(1.0 - pb)), 2, 64)
        )
    first = ds.take(1)
    if not first:
        return schema_empty.empty_table()
    d = len(first[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables * bits_per_table, d))

    def band_rows(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy().astype(np.int64)
        bits = (m @ planes.T) > 0  # (n, L*b)
        keys, out_ids, out_emb = [], [], []
        emb = batch[emb_col]
        idx_all = pa.array(np.arange(len(ids)))
        for t in range(num_tables):
            chunk = bits[:, t * bits_per_table : (t + 1) * bits_per_table]
            sig = chunk @ (1 << np.arange(bits_per_table))
            keys.append((np.int64(t) << np.int64(bits_per_table + 1)) | sig.astype(np.int64))
            out_ids.append(ids)
            out_emb.append(emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(keys), pa.int64()),
                id_col: pa.array(np.concatenate(out_ids), pa.int64()),
                emb_col: pa.concat_arrays([e.take(idx_all) for e in out_emb]),
            }
        )

    banded = ds.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        ids = group[id_col].to_numpy().astype(np.int64)
        if len(ids) < 2:
            return empty
        sentinel = None
        if len(ids) > max_bucket:
            import logging

            logging.getLogger("dcs_ray.simsearch").warning(
                "lsh bucket capped: %d ids > %d", len(ids), max_bucket
            )
            # sentinel row (id_a = -1) carries the drop count downstream —
            # (bucket key is unique, so the pair-dedup groupby keeps it)
            sentinel = pa.table(
                {
                    "id_a": pa.array([-1], pa.int64()),
                    "id_b": pa.array([int(group["bucket"][0].as_py())], pa.int64()),
                    "cos_sim": pa.array([float(len(ids) - max_bucket)], pa.float64()),
                }
            )
            order = np.argsort(ids, kind="stable")[:max_bucket]
            group = group.take(pa.array(order))
            ids = ids[order]
        M = _normalize(_emb_matrix(group[emb_col]))
        sims = M @ M.T
        bi, bj = np.nonzero(sims >= threshold)
        keep = ids[bi] < ids[bj]
        pairs = pa.table(
            {
                "id_a": pa.array(ids[bi][keep], pa.int64()),
                "id_b": pa.array(ids[bj][keep], pa.int64()),
                "cos_sim": pa.array(np.round(sims[bi, bj][keep], 6), pa.float64()),
            }
        )
        return pa.concat_tables([sentinel, pairs]) if sentinel is not None else pairs

    cand = banded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    dedup = cand.groupby(["id_a", "id_b"]).max("cos_sim")
    out = [pa.table(b) for b in dedup.iter_batches(batch_format="pyarrow")]
    meta = {
        b"num_tables": str(num_tables).encode(),
        b"bits_per_table": str(bits_per_table).encode(),
        b"capped_buckets": b"0",
        b"dropped_ids": b"0",
    }
    if not out:
        return schema_empty.with_metadata(meta).empty_table()
    t = pa.concat_tables(out)
    import pyarrow.compute as pc2

    is_sent = pc2.equal(t["id_a"], -1)
    sent = t.filter(is_sent)
    t = t.filter(pc2.invert(is_sent))
    meta[b"capped_buckets"] = str(len(sent)).encode()
    meta[b"dropped_ids"] = str(int(sum(sent["max(cos_sim)"].to_pylist()))).encode()
    return pa.table(
        {"id_a": t["id_a"], "id_b": t["id_b"], "cos_sim": t["max(cos_sim)"]}
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")]).replace_schema_metadata(meta)


def srp_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket id per row: sign bits against random hyperplanes."""
    bits = (m @ planes.T) > 0
    weights = np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64)
    return bits.astype(np.uint64) @ weights


class LshAnnIndex:
    """Persistent SRP-bucketed ANN index — a real index, not a filtered
    scan: ``build`` partitions the corpus by SRP bucket ONCE
    (bucket-partitioned Parquet via a distributed write); ``query`` reads
    ONLY the partitions within ``probe_hamming`` bits of each query's
    bucket, so probed I/O shrinks ~2^num_planes-fold vs a full scan.

    Layout::

        index_dir/
          bucket=<sig>/*.parquet     (vec_id, embedding)
          lsh_meta.json              (num_planes, seed, dim, id/emb cols)
          planes.npy
    """

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "lsh_meta.json")) as f:
            self.meta = json.load(f)
        planes = np.load(os.path.join(index_dir, "planes.npy"))
        # single-table indexes persist 2-D planes (back-compat layout)
        self.tables = planes[None, :, :] if planes.ndim == 2 else planes
        self.planes = self.tables[0]
        self.num_tables = self.meta.get("num_tables", 1)
        self.index_dir = index_dir
        self.last_probed_rows = 0
        self.total_rows = self.meta["n_rows"]

    @staticmethod
    def build(
        ds: ray.data.Dataset,
        index_dir: str,
        num_planes: int = 6,
        num_tables: int = 1,
        seed: int = 13,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> "LshAnnIndex":
        """``num_tables`` > 1 builds L independent SRP tables (the
        classic recall lever: a neighbor missed by one table's buckets
        is caught by another). The index stores each row once per table
        (L× space, the standard LSH trade); queries probe a budget of
        buckets per table and the scorer dedups across tables."""
        first = ds.take(1)
        assert first, "empty corpus"
        d = len(first[0][emb_col])
        rng = np.random.default_rng(seed)
        tables = rng.standard_normal((num_tables, num_planes, d))

        def add_bucket(b: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(b[emb_col]))
            base = b.select([id_col, emb_col])
            outs = []
            for li in range(num_tables):
                sig = srp_signatures(m, tables[li])
                t = base.append_column(
                    "bucket", pa.array(sig.astype(np.int64), pa.int64())
                )
                if num_tables > 1:
                    t = t.append_column(
                        "tbl", pa.array(np.full(len(b), li, np.int64), pa.int64())
                    )
                outs.append(t)
            return pa.concat_tables(outs)

        part_cols = ["tbl", "bucket"] if num_tables > 1 else ["bucket"]
        bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
        bucketed.write_parquet(index_dir, partition_cols=part_cols)
        # row count from partition footer metadata — no corpus pass
        import pyarrow.parquet as pq

        n_rows = 0
        for root, _dirs, files in os.walk(index_dir):
            for f in files:
                if f.endswith(".parquet"):
                    n_rows += pq.read_metadata(os.path.join(root, f)).num_rows
        np.save(
            os.path.join(index_dir, "planes.npy"),
            tables[0] if num_tables == 1 else tables,
        )
        meta = {
            "num_planes": num_planes,
            "num_tables": num_tables,
            "seed": seed,
            "dim": d,
            "id_col": id_col,
            "emb_col": emb_col,
            "n_rows": n_rows,
        }
        with open(os.path.join(index_dir, "lsh_meta.json"), "w") as f:
            json.dump(meta, f)
        return LshAnnIndex(index_dir)

    def _probe_set(self, sig: int, probe_hamming: int) -> list[int]:
        """All bucket ids within the hamming radius (blind multiprobe)."""
        from itertools import combinations

        p = self.meta["num_planes"]
        out = [sig]
        for r in range(1, probe_hamming + 1):
            for flip in combinations(range(p), r):
                v = sig
                for b in flip:
                    v ^= 1 << b
                out.append(v)
        return out

    def _directed_probe_set(self, sig: int, proj: np.ndarray, probe_t: int) -> list[int]:
        """Query-directed multiprobe (Lv et al., VLDB'07): rank every
        bucket by the summed |projection| of the planes whose bit must
        flip to reach it — a query close to a hyperplane makes that flip
        cheap — and probe the ``probe_t`` cheapest. Strictly dominates a
        blind hamming ball at equal probe budget. 2**num_planes stays
        small (≤256 here) so full enumeration is exact and vectorized."""
        p = self.meta["num_planes"]
        masks = np.arange(1 << p, dtype=np.uint32)
        bits = (masks[:, None] >> np.arange(p)) & 1
        cost = bits @ np.abs(proj)
        order = np.argsort(cost, kind="stable")[:probe_t]
        return [int(sig ^ m) for m in masks[order]]

    def query(
        self,
        queries: np.ndarray,
        k: int = 10,
        probe_hamming: int | None = None,
        probe_t: int | None = None,
    ) -> pa.Table:
        """Approximate top-k per query; same output schema as
        ``knn_cosine_bruteforce``. Sets ``last_probed_rows``.

        ``probe_t`` selects query-directed multiprobe (that many buckets,
        best-first); ``probe_hamming`` the blind hamming ball. Default is
        directed with a budget of 1/8 of the bucket space (min 4)."""
        id_col, emb_col = self.meta["id_col"], self.meta["emb_col"]
        nplanes = self.meta["num_planes"]
        if probe_hamming is None and probe_t is None:
            # fixed total probe budget of ~1/8 of one table's bucket
            # space, split across tables
            probe_t = max(2, (1 << nplanes) // (8 * self.num_tables))
        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        # want keys combine (table, bucket) so the scorer can tell the
        # same bucket id apart across tables
        want: dict[int, set[int]] = {}
        for li in range(self.num_tables):
            q_sigs = srp_signatures(q, self.tables[li]).astype(np.int64)
            projs = q @ self.tables[li].T
            for j, s in enumerate(q_sigs):
                probes = (
                    self._directed_probe_set(int(s), projs[j], probe_t)
                    if probe_t is not None
                    else self._probe_set(int(s), probe_hamming)
                )
                for b in probes:
                    want.setdefault((li << nplanes) | b, set()).add(j)
        # open ONLY the needed partitions (directory names carry the bucket)
        dirs = []
        for key in want:
            li, b = key >> nplanes, key & ((1 << nplanes) - 1)
            sub = f"tbl={li}/bucket={b}" if self.num_tables > 1 else f"bucket={b}"
            p = os.path.join(self.index_dir, sub)
            if os.path.isdir(p):
                dirs.append((key, p))
        if not dirs:
            self.last_probed_rows = 0
            return pa.schema(
                [
                    ("query_id", pa.int32()),
                    ("rank", pa.int32()),
                    (id_col, pa.int64()),
                    ("cos_sim", pa.float64()),
                ]
            ).empty_table()
        import pyarrow.parquet as pq

        files = []
        bucket_of_dir = {}
        for b, p in dirs:
            bucket_of_dir[p] = b
            files += [
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            ]
        self.last_probed_rows = sum(pq.read_metadata(f).num_rows for f in files)
        return _partitioned_topk(files, bucket_of_dir, want, q, k, id_col, emb_col)


def _partitioned_topk(
    files: list[str],
    bucket_of_dir: dict[str, int],
    want: dict[int, set[int]],
    q: np.ndarray,
    k: int,
    id_col: str,
    emb_col: str,
) -> pa.Table:
    """Score only the given partition files; each query sees rows of its
    allowed partitions only (per-batch matmul + per-batch top-k, tiny
    global merge). Shared by the LSH- and IVF-partitioned ANN indexes."""
    sub = ray.data.read_parquet(files, include_paths=True)

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy()
        paths = batch["path"].to_pylist()
        bks = np.array(
            [bucket_of_dir[os.path.dirname(pth)] for pth in paths], dtype=np.int64
        )
        out_q, out_i, out_s = [], [], []
        for j in range(q.shape[0]):
            allowed = {b for b, qs in want.items() if j in qs}
            sel = np.flatnonzero(np.isin(bks, list(allowed)))
            if len(sel) == 0:
                continue
            # multi-table layouts store a vec once per table: dedup ids
            # BEFORE the top-k cut so copies can't displace real members
            _, first = np.unique(ids[sel], return_index=True)
            sel = sel[np.sort(first)]
            s = m[sel] @ q[j]
            if len(s) > k:
                kth = np.partition(s, len(s) - k)[len(s) - k]
                top = np.flatnonzero(s >= kth)
                sel, s = sel[top], s[top]
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

    partial = sub.map_batches(score, batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        sims = group["cos_sim"].to_numpy()
        order = np.lexsort((ids, -sims))
        # multi-table probes can surface the same vec twice: keep the
        # first (identical-score) occurrence per id, in score order
        _, first_idx = np.unique(ids[order], return_index=True)
        order = order[np.sort(first_idx)[:k]]
        qid = group["query_id"][0].as_py()
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, np.int32), pa.int32()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()
                ),
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


def _hash_min_rows(
    ds: ray.data.Dataset, k: int, id_col: str, emb_col: str
) -> pa.Table:
    """The ``k`` corpus rows with the smallest (splitmix64(id), id) —
    a deterministic, order-independent "sample" computed as a
    distributed bottom-k: each batch keeps its own k smallest, the
    driver merges |blocks|·k tiny rows. Rows return sorted by
    (hash, id), so row position IS the centroid id."""
    from dcs_ray.functions.sketches import _hash64_column

    def partial(b: pa.Table) -> pa.Table:
        h = _hash64_column(b[id_col])
        order = np.lexsort((b[id_col].to_numpy(), h))[:k]
        t = b.select([id_col, emb_col]).take(pa.array(order))
        return t.append_column("__h", pa.array(h[order], pa.uint64()))

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table({id_col: pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    order = np.lexsort((t[id_col].to_numpy(), t["__h"].to_numpy()))[:k]
    return t.take(pa.array(order)).drop_columns(["__h"])


class IvfAnnIndex:
    """Persistent IVF (inverted-file) ANN index — the k-means sibling of
    ``LshAnnIndex``: a spherical-k-means coarse quantizer is trained on a
    deterministic corpus sample (the standard IVF recipe — at 10^12 rows
    you never train on the full corpus), then ONE distributed pass
    assigns every vector to its nearest centroid and writes
    centroid-partitioned Parquet. ``query`` reads only the ``nprobe``
    nearest lists per query, so probed I/O shrinks ~num_lists/nprobe-fold
    vs a full scan.

    Layout::

        index_dir/
          list=<cid>/*.parquet      (vec_id, embedding)
          ivf_meta.json             (num_lists, seed, dim, id/emb cols)
          centroids.npy             (num_lists, dim) unit rows
    """

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "ivf_meta.json")) as f:
            self.meta = json.load(f)
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self.index_dir = index_dir
        self.last_probed_rows = 0
        self.total_rows = self.meta["n_rows"]

    @staticmethod
    def build(
        ds: ray.data.Dataset,
        index_dir: str,
        num_lists: int = 16,
        train_sample: int = 4096,
        n_iter: int = 10,
        seed: int = 29,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        init: str = "kmeans++",
    ) -> "IvfAnnIndex":
        """``init="kmeans++"`` (default): k-means++ seeding over a
        bounded sample, then Lloyd. ``init="hash_min"``: centroids are
        the ``num_lists`` corpus rows with the smallest
        splitmix64(id) — fully deterministic and replayable in integer
        SQL, which makes the assignment pass ORACLE-CHECKABLE (the
        correctness gate for the IVF path); combine with ``n_iter=0``
        to gate pure assignment, or leave Lloyd on for production."""
        if init == "hash_min":
            picked = _hash_min_rows(ds, num_lists, id_col, emb_col)
            assert len(picked), "empty corpus"
            x = _normalize(_emb_matrix(picked[emb_col]))
            # centroids must NOT alias the training matrix: Lloyd's
            # `cent[c] = x[m].mean(...)` would otherwise overwrite
            # training rows mid-iteration, feeding later centroids (and
            # every later iteration) self-referential garbage whenever
            # n_iter > 0 (review r5 finding #1)
            cent = x.copy()
            num_lists = len(cent)
        else:
            sample = ds.limit(train_sample).take_all()
            assert sample, "empty corpus"
            x = _normalize(np.asarray([r[emb_col] for r in sample], dtype=np.float64))
            rng = np.random.default_rng(seed)
            num_lists = min(num_lists, len(x))
            # k-means++ seeding, then Lloyd with unit-normalized centroids
            # (spherical k-means == cosine geometry)
            cent = x[rng.integers(len(x))][None, :]
            for _ in range(num_lists - 1):
                d2 = 1.0 - (x @ cent.T).max(axis=1)  # cosine distance to set
                probs = np.maximum(d2, 0)
                s = probs.sum()
                pick = rng.choice(len(x), p=probs / s) if s > 0 else rng.integers(len(x))
                cent = np.vstack([cent, x[pick]])
        for _ in range(n_iter):
            assign = (x @ cent.T).argmax(axis=1)
            for c in range(num_lists):
                m = assign == c
                if m.any():
                    cent[c] = x[m].mean(axis=0)
            cent = _normalize(cent)

        def add_list(b: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(b[emb_col]))
            cid = (m @ cent.T).argmax(axis=1)
            return b.select([id_col, emb_col]).append_column(
                "list", pa.array(cid.astype(np.int64), pa.int64())
            )

        ds.map_batches(add_list, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["list"]
        )
        import pyarrow.parquet as pq

        n_rows = 0
        for root, _dirs, fs in os.walk(index_dir):
            for f in fs:
                if f.endswith(".parquet"):
                    n_rows += pq.read_metadata(os.path.join(root, f)).num_rows
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        meta = {
            "num_lists": num_lists,
            "seed": seed,
            "dim": int(x.shape[1]),
            "id_col": id_col,
            "emb_col": emb_col,
            "n_rows": n_rows,
        }
        with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
            json.dump(meta, f)
        return IvfAnnIndex(index_dir)

    def query(self, queries: np.ndarray, k: int = 10, nprobe: int = 3) -> pa.Table:
        """Approximate top-k per query; same output schema as
        ``knn_cosine_bruteforce``. Sets ``last_probed_rows``."""
        id_col, emb_col = self.meta["id_col"], self.meta["emb_col"]
        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        nearest = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        want: dict[int, set[int]] = {}
        for j in range(q.shape[0]):
            for c in nearest[j]:
                want.setdefault(int(c), set()).add(j)
        import pyarrow.parquet as pq

        files, bucket_of_dir = [], {}
        for c in want:
            p = os.path.join(self.index_dir, f"list={c}")
            if os.path.isdir(p):
                bucket_of_dir[p] = c
                files += [
                    os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
                ]
        if not files:
            self.last_probed_rows = 0
            return pa.schema(
                [
                    ("query_id", pa.int32()),
                    ("rank", pa.int32()),
                    (id_col, pa.int64()),
                    ("cos_sim", pa.float64()),
                ]
            ).empty_table()
        self.last_probed_rows = sum(pq.read_metadata(f).num_rows for f in files)
        return _partitioned_topk(files, bucket_of_dir, want, q, k, id_col, emb_col)


def knn_cosine_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_lists: int = 16,
    nprobe: int = 3,
    seed: int = 29,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    index_dir: str | None = None,
    init: str = "kmeans++",
    n_iter: int = 10,
) -> pa.Table:
    """Approximate top-k through a persistent ``IvfAnnIndex`` (build or
    reuse), probing only the nprobe nearest inverted lists per query.
    ``init``/``n_iter`` pass through to ``IvfAnnIndex.build`` —
    ``init="hash_min", n_iter=0`` gives the fully SQL-replayable
    deterministic quantizer the correctness gate uses. Recall vs brute
    force is measured in tests, never assumed."""
    import shutil
    import tempfile

    tmp = None
    if index_dir is None:
        tmp = index_dir = tempfile.mkdtemp(prefix="dcs_ivfidx_", dir="/tmp")
    try:
        if os.path.exists(os.path.join(index_dir, "ivf_meta.json")):
            idx = IvfAnnIndex(index_dir)
        else:
            idx = IvfAnnIndex.build(
                ds, index_dir, num_lists=num_lists, seed=seed,
                id_col=id_col, emb_col=emb_col, init=init, n_iter=n_iter,
            )
        return idx.query(queries, k=k, nprobe=nprobe)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


def knn_cosine_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 1,
    probe_hamming: int | None = None,
    probe_t: int | None = None,
    seed: int = 13,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    index_dir: str | None = None,
) -> pa.Table:
    """Approximate top-k through a real ``LshAnnIndex``: builds (or
    reuses, when ``index_dir`` already holds one) the bucket-partitioned
    index, then probes only matching partitions. Recall vs brute force is
    measured in tests, never assumed."""
    import shutil
    import tempfile

    tmp = None
    if index_dir is None:
        tmp = index_dir = tempfile.mkdtemp(prefix="dcs_lshidx_", dir="/tmp")
    try:
        if os.path.exists(os.path.join(index_dir, "lsh_meta.json")):
            idx = LshAnnIndex(index_dir)
        else:
            idx = LshAnnIndex.build(
                ds, index_dir, num_planes=num_planes, num_tables=num_tables,
                seed=seed, id_col=id_col, emb_col=emb_col,
            )
        return idx.query(queries, k=k, probe_hamming=probe_hamming, probe_t=probe_t)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)


def group_centroids(
    ds: ray.data.Dataset, key_col: str = "label", vec_col: str = "embedding"
) -> ray.data.Dataset:
    """Per-key centroid (mean vector) in LONG form: one row per
    (key, dim) with the centroid component and the key's vector count —
    the class-prototype / k-means-style aggregate over an embedding
    column. Combiner shape: each batch collapses to |keys-in-batch|×dim
    partial-sum rows (pure floats+ints), one small groupby merges —
    vectors never cross the exchange whole, nothing driver-sized."""

    def partial(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b[vec_col])
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0 or m.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uk, inv = np.unique(keys, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uk), d), np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(np.repeat(uk, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uk))),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "dim"])
        .sum(["s", "n"])
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy()
        return pa.table(
            {
                key_col: b[key_col],
                "dim": b["dim"],
                "centroid": pa.array(b["sum(s)"].to_numpy() / n, pa.float64()),
                "n_vecs": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def knn_classify(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> pa.Table:
    """k-nearest-neighbor majority-vote classification (Cover & Hart
    '67) over the embedding corpus: each query vector's ``k`` nearest
    corpus vectors by cosine (the query's OWN row excluded) vote with
    their labels; ties break by highest count then smallest label →
    ``(query_vec_id, pred_label, votes)``.

    Scale shape: ranking is the existing brute-force per-batch matmul
    + tiny per-query merge; the ≤ Q·k winning ids then pull their
    labels in ONE streaming pass with the id set broadcast — labels
    never join through a shuffle."""
    import ray as _ray

    query_ids = np.asarray(query_ids, np.int64)
    ds = ds.materialize()
    t = knn_cosine_bruteforce(ds, queries, k=k + 1, id_col=id_col, emb_col=emb_col)
    qidx = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rank = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((rank, qidx))
    qidx, ids = qidx[order], ids[order]
    keep = ids != query_ids[qidx]
    qidx, ids = qidx[keep], ids[keep]
    # first k survivors per query (rows are rank-ascending within query)
    runs = np.concatenate(([0], np.flatnonzero(qidx[1:] != qidx[:-1]) + 1))
    within = np.arange(len(qidx)) - np.repeat(
        runs, np.diff(np.concatenate((runs, [len(qidx)])))
    )
    sel = within < k
    qidx, ids = qidx[sel], ids[sel]

    # one streaming label lookup with the candidate-id set broadcast
    cand_ref = _ray.put(np.unique(ids))

    def lookup(b: pa.Table, _c=cand_ref) -> pa.Table:
        cand = _ray.get(_c)
        v = b[id_col].to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(cand, v), 0, max(len(cand) - 1, 0))
        hit = (cand[pos] == v) if len(cand) else np.zeros(len(v), bool)
        return pa.table(
            {
                id_col: pa.array(v[hit], pa.int64()),
                "lbl": b[label_col].filter(pa.array(hit)).cast(pa.int64()),
            }
        )

    li, ll = [], []
    for b in ds.map_batches(lookup, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        li.append(b[id_col].to_numpy(zero_copy_only=False))
        ll.append(b["lbl"].to_numpy(zero_copy_only=False))
    lut_ids = np.concatenate(li) if li else np.empty(0, np.int64)
    lut_lbl = np.concatenate(ll) if ll else np.empty(0, np.int64)
    o = np.argsort(lut_ids)
    lut_ids, lut_lbl = lut_ids[o], lut_lbl[o]
    lbl = lut_lbl[np.searchsorted(lut_ids, ids)]

    # majority vote per query: (count desc, label asc)
    out_q, out_l, out_v = [], [], []
    for j in np.unique(qidx):
        labs = lbl[qidx == j]
        u, c = np.unique(labs, return_counts=True)
        w = np.lexsort((u, -c))[0]
        out_q.append(int(query_ids[j]))
        out_l.append(int(u[w]))
        out_v.append(int(c[w]))
    return pa.table(
        {
            "query_vec_id": pa.array(out_q, pa.int64()),
            "pred_label": pa.array(out_l, pa.int64()),
            "votes": pa.array(out_v, pa.int64()),
        }
    )


def centroid_classify(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    key_col: str = "label",
    vec_col: str = "embedding",
) -> pa.Table:
    """Nearest-centroid (Rocchio '71) classification: each query vector
    takes the label of the class centroid it is most cosine-similar to
    (ties → smallest label) → ``(query_vec_id, pred_label, cos_sim)``.

    Scale shape: the centroids come from :func:`group_centroids`'s
    combiner aggregate (|labels|×dim partial rows, vectors never cross
    the exchange whole); classification is a (labels × dim) matmul on
    the driver — model-sized, corpus never touched again."""
    rows = pa.concat_tables(
        pa.table(b)
        for b in group_centroids(ds, key_col=key_col, vec_col=vec_col).iter_batches(
            batch_format="pyarrow"
        )
    )
    if len(rows) == 0:
        return pa.table(
            {
                "query_vec_id": pa.array([], pa.int64()),
                "pred_label": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    lab = rows[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dim = rows["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    cen = rows["centroid"].to_numpy(zero_copy_only=False).astype(np.float64)
    labels = np.unique(lab)
    d = int(dim.max()) + 1
    C = np.zeros((len(labels), d), np.float64)
    C[np.searchsorted(labels, lab), dim] = cen
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    q = np.atleast_2d(np.asarray(queries, np.float64))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ Cn.T  # (Q, labels)
    best = np.zeros(len(q), np.int64)
    for i in range(len(q)):
        best[i] = np.lexsort((labels, -sims[i]))[0]
    return pa.table(
        {
            "query_vec_id": pa.array(np.asarray(query_ids, np.int64), pa.int64()),
            "pred_label": pa.array(labels[best], pa.int64()),
            "cos_sim": pa.array(
                np.round(sims[np.arange(len(q)), best], 6), pa.float64()
            ),
        }
    )


def centroid_outlier_scores(
    ds: ray.data.Dataset,
    n: int = 50,
    key_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Embedding-quality triage: the ``n`` vectors LEAST cosine-similar
    to their own label's centroid → ``(vec_id, label, cos_to_centroid)``
    ascending — the standard mislabeled/outlier sweep over a labeled
    embedding corpus.

    Scale shape: centroids come from the combiner aggregate
    (:func:`group_centroids`), broadcast once as a |labels|×dim matrix;
    scoring is one streaming pass with a row-gathered dot product; each
    block emits only its local bottom-``n``."""
    import ray as _ray

    ds = ds.materialize()
    rows = pa.concat_tables(
        pa.table(b)
        for b in group_centroids(ds, key_col=key_col, vec_col=vec_col).iter_batches(
            batch_format="pyarrow"
        )
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "cos_to_centroid": pa.array([], pa.float64()),
        }
    )
    if len(rows) == 0:
        return empty
    lab = rows[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dim = rows["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
    cen = rows["centroid"].to_numpy(zero_copy_only=False).astype(np.float64)
    labels = np.unique(lab)
    d = int(dim.max()) + 1
    C = np.zeros((len(labels), d), np.float64)
    C[np.searchsorted(labels, lab), dim] = cen
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    ref = _ray.put((labels, Cn))

    def local_bottom(b: pa.Table, _r=ref) -> pa.Table:
        labs, cn = _ray.get(_r)
        m = _normalize(_emb_matrix(b[vec_col]))
        ids = b[id_col].to_numpy().astype(np.int64)
        ky = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(labs, ky)
        cs = np.einsum("ij,ij->i", m, cn[li])
        order = np.lexsort((ids, cs))[:n]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                key_col: pa.array(ky[order], pa.int64()),
                "cs": pa.array(cs[order], pa.float64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(local_bottom, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return empty
    m = pa.concat_tables(parts)
    ids = m[id_col].to_numpy(zero_copy_only=False)
    ky = m[key_col].to_numpy(zero_copy_only=False)
    cs = m["cs"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, cs))[:n]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            key_col: pa.array(ky[order], pa.int64()),
            "cos_to_centroid": pa.array(np.round(cs[order], 6), pa.float64()),
        }
    )
