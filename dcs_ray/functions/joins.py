"""Temporal joins the Dataset API lacks: as-of (point-in-time) join.

Scale shape (100 TB story): both sides are bucketed by a hash of the
join key — ONE all-to-all each — then the per-bucket merge is fully
vectorized: sort the union of both sides by (key, ts) with right rows
ordering before left rows at equal timestamps, take a running count of
right rows, and each left row's match is simply "the last right row
seen" — valid iff it carries the same key (and is within tolerance).
No per-key Python loop, no per-row probe; a bucket costs one lexsort.

The partitioning assumption: a single (bucket) group fits in one
worker. Buckets are salted key hashes, so only a single key hotter
than a whole bucket breaks this — raise ``num_buckets`` to shrink
buckets (keys never straddle buckets, which the merge requires).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)


def _key_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = keys.astype(np.uint64) * _MIX1
        x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int32)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    ts_col: str = "ts_us",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
    tolerance_us: int | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """For every left row, attach the latest right row of the same key
    with ``right.ts <= left.ts`` (backward as-of join; ties match).

    ``ts_col`` must be int64 microseconds on BOTH sides (convert
    timestamps upstream — keeps the kernel dtype-stable). Unmatched
    left rows survive with nulls in the attached columns (left join
    semantics). ``right_cols`` are the right-side columns to attach,
    renamed ``<col><suffix>`` on collision with a left column name.
    """
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    out_names = {
        c: (c + suffix if c in left_names or c == "__asof_side" else c)
        for c in right_cols
    }

    rs = right.schema()
    right_types = dict(zip(rs.names, rs.types))
    right_types = {c: right_types[c] for c in right_cols}

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_names}
        cols["__asof_side"] = pa.array(np.ones(len(b), np.int8), pa.int8())
        for c in right_cols:
            cols["__r_" + c] = pa.nulls(len(b), right_types[c])
        t = pa.table(cols)
        return t.append_column(
            "bucket", pa.array(_key_bucket(b[on].to_numpy(), num_buckets), pa.int32())
        )

    def tag_right(b: pa.Table) -> pa.Table:
        n = len(b)
        cols: dict[str, pa.Array] = {}
        for c in left_names:
            if c == on or c == ts_col:
                cols[c] = b[c]
            else:
                cols[c] = pa.nulls(n, left_types[c])
        cols["__asof_side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        for c in right_cols:
            cols["__r_" + c] = b[c]
        t = pa.table(cols)
        return t.append_column(
            "bucket", pa.array(_key_bucket(b[on].to_numpy(), num_buckets), pa.int32())
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        key = g[on].to_numpy().astype(np.int64)
        ts = g[ts_col].to_numpy().astype(np.int64)
        side = g["__asof_side"].to_numpy()  # 0 = right, 1 = left
        # right before left at equal (key, ts) so ties are matchable
        order = np.lexsort((side, ts, key))
        key_s, ts_s, side_s = key[order], ts[order], side[order]
        is_right = side_s == 0
        # running count of right rows seen → index of the LAST right row
        # (in sorted order) at or before each position
        rcount = np.cumsum(is_right)
        r_sorted_pos = np.flatnonzero(is_right)  # sorted-pos of each right row
        left_pos = np.flatnonzero(~is_right)
        match = rcount[left_pos] - 1  # index into r_sorted_pos, or -1
        if len(r_sorted_pos) == 0:
            have = np.zeros(len(left_pos), bool)
            cand = np.zeros(len(left_pos), np.int64)
            valid = have
        else:
            have = match >= 0
            cand = np.where(have, r_sorted_pos[np.maximum(match, 0)], 0)
            valid = have & (key_s[cand] == key_s[left_pos])
            if tolerance_us is not None:
                valid &= ts_s[left_pos] - ts_s[cand] <= tolerance_us
        # gather: left rows in sorted order, right attachment where valid
        take_left = pa.array(order[left_pos])
        out = {c: g[c].take(take_left) for c in left_names}
        ridx = np.where(valid, order[cand], -1)
        take_right = pa.array(
            np.where(ridx >= 0, ridx, 0), type=pa.int64()
        )
        mask = pa.array(~valid)
        for c in right_cols:
            col = g["__r_" + c].take(take_right)
            out[out_names[c]] = pa.compute.if_else(
                mask, pa.nulls(len(valid), right_types[c]), col
            )
        return pa.table(out)

    return both.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    ts_col: str = "ts_us",
    before_us: int = 0,
    after_us: int = 0,
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Windowed interval join: for every left row emit ONE ROW PER right
    row of the same key with ``right.ts in [left.ts - before_us,
    left.ts + after_us]`` (inner semantics — no matches, no row).

    Same bucketed shape as :func:`asof_join` (one all-to-all per side,
    per-bucket vectorized merge) but all matches in the window instead
    of the latest one. Per bucket: sort right once by (key, ts), find
    each left row's contiguous match slice with two union lexsorts
    (queries ordered before/after right rows at equal ts give the
    exclusive/inclusive bounds), then expand pairs with one
    run-length arange — no per-key loop, no per-row probe. Output size
    is the true match count; a pathological window covering everything
    is the user's O(n·m) to ask for."""
    left_schema = left.schema()
    left_names = list(left_schema.names)
    rs = right.schema()
    right_types = dict(zip(rs.names, rs.types))
    right_types = {c: right_types[c] for c in right_cols}
    out_names = {
        c: (c + suffix if c in left_names or c == "__ij_side" else c)
        for c in right_cols
    }
    left_types = dict(zip(left_schema.names, left_schema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_names}
        cols["__ij_side"] = pa.array(np.ones(len(b), np.int8), pa.int8())
        for c in right_cols:
            cols["__r_" + c] = pa.nulls(len(b), right_types[c])
        return pa.table(cols).append_column(
            "bucket", pa.array(_key_bucket(b[on].to_numpy(), num_buckets), pa.int32())
        )

    def tag_right(b: pa.Table) -> pa.Table:
        n = len(b)
        cols: dict[str, pa.Array] = {}
        for c in left_names:
            cols[c] = b[c] if c in (on, ts_col) else pa.nulls(n, left_types[c])
        cols["__ij_side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        for c in right_cols:
            cols["__r_" + c] = b[c]
        return pa.table(cols).append_column(
            "bucket", pa.array(_key_bucket(b[on].to_numpy(), num_buckets), pa.int32())
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def _count_before(
        key_r: np.ndarray, ts_r: np.ndarray, key_q: np.ndarray,
        ts_q: np.ndarray, queries_first: bool,
    ) -> np.ndarray:
        """Per query: number of right rows lexicographically before it;
        ``queries_first`` puts queries ahead of rights at equal (key,
        ts) (exclusive bound), else after (inclusive bound)."""
        nr, nq = len(key_r), len(key_q)
        key = np.concatenate([key_r, key_q])
        ts = np.concatenate([ts_r, ts_q])
        tag = np.concatenate(
            [np.full(nr, 1 if queries_first else 0, np.int8),
             np.full(nq, 0 if queries_first else 1, np.int8)]
        )
        order = np.lexsort((tag, ts, key))
        is_right = order < nr
        rcount = np.cumsum(is_right)
        out = np.zeros(nq, np.int64)
        qpos = np.flatnonzero(~is_right)
        # exclusive count of rights before each query position
        out[order[qpos] - nr] = rcount[qpos] - 0 - is_right[qpos]
        return out

    def merge(g: pa.Table) -> pa.Table:
        side = g["__ij_side"].to_numpy()
        key = g[on].to_numpy().astype(np.int64)
        ts = g[ts_col].to_numpy().astype(np.int64)
        l_idx = np.flatnonzero(side == 1)
        r_idx = np.flatnonzero(side == 0)
        empty_cols = {c: left_types[c] for c in left_names} | {
            out_names[c]: right_types[c] for c in right_cols
        }
        if len(l_idx) == 0 or len(r_idx) == 0:
            return pa.table(
                {name: pa.array([], t) for name, t in empty_cols.items()}
            )
        r_order = r_idx[np.lexsort((ts[r_idx], key[r_idx]))]
        key_r, ts_r = key[r_order], ts[r_order]
        lo = _count_before(key_r, ts_r, key[l_idx], ts[l_idx] - before_us, True)
        hi = _count_before(key_r, ts_r, key[l_idx], ts[l_idx] + after_us, False)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {name: pa.array([], t) for name, t in empty_cols.items()}
            )
        li = np.repeat(np.arange(len(l_idx)), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        ri = np.repeat(lo, counts) + (np.arange(total) - starts)
        take_left = pa.array(l_idx[li], pa.int64())
        take_right = pa.array(r_order[ri], pa.int64())
        out = {c: g[c].take(take_left) for c in left_names}
        for c in right_cols:
            out[out_names[c]] = g["__r_" + c].take(take_right)
        return pa.table(out)

    return both.groupby("bucket").map_groups(merge, batch_format="pyarrow")
