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
