"""Relational building blocks: broadcast hash join and combiner-first
aggregation.

Scale shapes (100 TB story):
- ``broadcast_join``: the small side is materialized ONCE on the
  driver, sorted by key, and shipped to the object store with a single
  ``ray.put`` — every map task reads it zero-copy and probes with
  ``np.searchsorted``. No shuffle of the big side at all. This is the
  right join whenever one side fits in a worker's heap (dimension
  tables, doc→meta maps); for two big sides use ``shuffle_join``.
- ``shuffle_join``: big ⋈ big via a hash-partitioned exchange — both
  sides are bucketed by key hash into ``num_partitions`` and each
  bucket pair joins independently (Ray Data's native hash-shuffle
  join operator). Each aggregator holds only |input| / num_partitions
  rows, so sizing num_partitions to the data keeps per-worker memory
  flat as the corpus grows; no side is ever materialized whole.
- ``combiner_groupby``: per-batch partial aggregation (one vectorized
  groupby per batch, emitting one row per key present in the batch)
  followed by a global ``groupby().sum()`` over partials only. The
  all-to-all carries |keys| × |batches| rows, never the corpus — the
  classic map-side-combine recipe that keeps a wide aggregation from
  becoming a full shuffle.

Exactness note: sum columns are int64 on both the partial and final
hop, so results are order-independent and bit-reproducible (callers
scale fixed-decimal values to integers; see the TPC-H-style pricing
summary in ``__ray_entry__``). At 100 TB widen to decimal128 before
int64 overflow (~9.2e18).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    small_cols: tuple[str, ...],
    how: str = "inner",
    suffix: str = "_r",
    right_on: str | None = None,
) -> ray.data.Dataset:
    """Join ``big`` against a driver-materialized ``small`` side.

    ``small`` must have unique values in its key column (``right_on``,
    defaulting to ``on``). ``how`` is "inner" or "left" (left keeps
    unmatched big rows with nulls). Attached columns are renamed
    ``<col><suffix>`` on collision.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    right_on = right_on or on
    tables = [pa.table(b) for b in small.iter_batches(batch_format="pyarrow")]
    st = (
        pa.concat_tables(tables)
        if tables
        else pa.schema([(right_on, pa.int64())]).empty_table()
    )
    keys = st[right_on].to_numpy().astype(np.int64) if len(st) else np.empty(0, np.int64)
    order = np.argsort(keys)
    keys_sorted = keys[order]
    if len(keys_sorted) > 1 and np.any(keys_sorted[1:] == keys_sorted[:-1]):
        raise ValueError(f"broadcast_join: small side has duplicate {right_on} keys")
    cols_sorted = {
        c: (st[c].combine_chunks().take(pa.array(order)) if len(st) else pa.array([]))
        for c in small_cols
    }
    small_ref = ray.put((keys_sorted, cols_sorted))
    big_names = set(big.schema().names)
    out_names = {c: (c + suffix if c in big_names else c) for c in small_cols}

    def probe(b: pa.Table) -> pa.Table:
        ks, cs = ray.get(small_ref)
        bk = b[on].to_numpy().astype(np.int64)
        if len(ks):
            pos = np.searchsorted(ks, bk)
            pos_c = np.minimum(pos, len(ks) - 1)
            hit = ks[pos_c] == bk
        else:
            pos_c = np.zeros(len(bk), np.int64)
            hit = np.zeros(len(bk), bool)
        if how == "inner":
            sel = np.flatnonzero(hit)
            out = {c: b[c].take(pa.array(sel)) for c in b.column_names}
            take = pa.array(pos_c[sel])
            for c in small_cols:
                out[out_names[c]] = cs[c].take(take)
            return pa.table(out)
        out = {c: b[c] for c in b.column_names}
        take = pa.array(pos_c)
        miss = pa.array(~hit)
        for c in small_cols:
            col = cs[c].take(take) if len(ks) else pa.nulls(len(bk))
            out[out_names[c]] = pc.if_else(miss, pa.nulls(len(bk), col.type), col)
        return pa.table(out)

    return big.map_batches(probe, batch_format="pyarrow")


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Hash-partitioned join for two BIG sides.

    Both inputs are exchanged by ``hash(key) % num_partitions``; each
    partition pair joins independently on its own aggregator, so the
    working set per worker is bounded by the largest partition, not by
    either input. Use ``broadcast_join`` instead whenever one side fits
    in a worker's heap — it skips the exchange entirely.

    ``num_partitions`` defaults to the current cluster CPU count
    (each aggregator then owns ~1/num_cpus of the keyspace); at 100 TB
    pass input_bytes / target_partition_bytes instead. Skewed hot keys
    should be salted by the caller before the join.
    """
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
        right_suffix=suffix,
    )


def combiner_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> ray.data.Dataset:
    """Sum + count grouped by ``keys`` with map-side combining: each
    batch collapses to one partial row per key it contains, then ONE
    small ``groupby().sum()`` merges partials. ``sum_cols`` must be
    integer or float; int64 stays int64 (exact, order-independent)."""

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    **{k: b[k] for k in keys},
                    **{c: b[c] for c in sum_cols},
                    count_col: pa.array([], pa.int64()),
                }
            )
        gb = b.select(keys + sum_cols).group_by(keys)
        agg = gb.aggregate([(c, "sum") for c in sum_cols] + [(keys[0], "count")])
        cols = {k: agg[k] for k in keys}
        for c in sum_cols:
            cols[c] = agg[f"{c}_sum"]
        cols[count_col] = agg[f"{keys[0]}_count"].cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(keys).sum(sum_cols + [count_col])

    def rename(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        for c in sum_cols + [count_col]:
            cols[c] = b[f"sum({c})"]
        return pa.table(cols)

    return final.map_batches(rename, batch_format="pyarrow")


def broadcast_semi_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi-join (keep big rows whose key EXISTS in small) or anti-join
    (``anti=True``: keep rows whose key does NOT exist). The small
    side's unique keys are materialized once, broadcast via ``ray.put``,
    and probed with a vectorized searchsorted per batch — the big side
    streams through with no shuffle. Duplicate small-side keys are fine
    (existence only)."""
    right_on = right_on or on
    tables = [
        pa.table(b)
        for b in small.select_columns([right_on]).iter_batches(batch_format="pyarrow")
    ]
    keys = (
        np.unique(pa.concat_tables(tables)[right_on].to_numpy().astype(np.int64))
        if tables and sum(len(t) for t in tables)
        else np.empty(0, np.int64)
    )
    ref = ray.put(keys)

    def probe(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        bk = b[on].to_numpy().astype(np.int64)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, bk), len(ks) - 1)
            hit = ks[pos] == bk
        else:
            hit = np.zeros(len(bk), bool)
        return b.filter(pa.array(~hit if anti else hit))

    return big.map_batches(probe, batch_format="pyarrow")


def grouped_topn(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    n: int,
    ascending: bool = False,
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Top-n rows per key by ``order_col`` (ties broken by ``tie_col``
    ascending — required for determinism when order values repeat).

    Each batch is first cut to its own per-key top-n (one vectorized
    lexsort + run-length head), so the groupby exchange carries at most
    n rows per (batch, key) — never the corpus; the final per-key cut
    runs in ``map_groups``."""
    if tie_col is None:
        tie_col = key

    def sort_keys(b: pa.Table) -> list[tuple[str, str]]:
        return [
            (key, "ascending"),
            (order_col, "ascending" if ascending else "descending"),
            (tie_col, "ascending"),
        ]

    def local_cut(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        b = b.take(pc.sort_indices(b, sort_keys=sort_keys(b)))
        k = b[key].to_numpy(zero_copy_only=False)
        new = np.ones(len(k), bool)
        new[1:] = k[1:] != k[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank_in_run = np.arange(len(k)) - starts[run_id]
        return b.filter(pa.array(rank_in_run < n))

    pre = ds.map_batches(local_cut, batch_format="pyarrow")
    return pre.groupby(key).map_groups(local_cut, batch_format="pyarrow")


def combiner_stats(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    count_col: str = "n_rows",
) -> ray.data.Dataset:
    """Per-key count/sum/min/max of one numeric column with map-side
    combining — each batch collapses to one partial row per key, so the
    exchange carries |keys-per-batch| rows. Sum of int64 stays int64
    (exact); min/max are order-free by definition. Output columns:
    keys + (n_rows, sum_<col>, min_<col>, max_<col>)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        b = b.select(keys + [col])
        if len(b) == 0:
            return pa.table(
                {
                    **{k: b[k] for k in keys},
                    f"sum_{col}": b[col],
                    f"min_{col}": b[col],
                    f"max_{col}": b[col],
                    count_col: pa.array([], pa.int64()),
                }
            )
        agg = b.group_by(keys).aggregate(
            [(col, "sum"), (col, "min"), (col, "max"), (keys[0], "count")]
        )
        cols = {k: agg[k] for k in keys}
        cols[f"sum_{col}"] = agg[f"{col}_sum"]
        cols[f"min_{col}"] = agg[f"{col}_min"]
        cols[f"max_{col}"] = agg[f"{col}_max"]
        cols[count_col] = agg[f"{keys[0]}_count"].cast(pa.int64())
        return pa.table(cols)

    final = ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(
        Sum(f"sum_{col}", alias_name=f"sum_{col}_f"),
        Min(f"min_{col}", alias_name=f"min_{col}_f"),
        Max(f"max_{col}", alias_name=f"max_{col}_f"),
        Sum(count_col, alias_name=f"{count_col}_f"),
    )

    def rename(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keys}
        cols[count_col] = b[f"{count_col}_f"].cast(pa.int64())
        cols[f"sum_{col}"] = b[f"sum_{col}_f"]
        cols[f"min_{col}"] = b[f"min_{col}_f"]
        cols[f"max_{col}"] = b[f"max_{col}_f"]
        return pa.table(cols)

    return final.map_batches(rename, batch_format="pyarrow")


def group_zscore(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Standardize ``col`` within each ``key`` group:
    ``z = (x - mean_g) / std_g`` (population std; z = 0 where a group
    is constant). The feature-normalization step before cross-group
    quality thresholds.

    Two passes, no shuffle: per-batch (key, n, sum, sumsq) partials
    fold on the driver (group cardinality = langs/hosts, tiny), the
    (mean, std) table broadcasts in the closure, and the second pass is
    one vectorized probe per batch."""
    stats: dict = {}
    for b in ds.select_columns([key, col]).map_batches(
        lambda t: _zscore_partials(t, key, col), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for k, n, s, s2 in zip(
            b["k"].to_pylist(), b["n"].to_pylist(), b["s"].to_pylist(),
            b["s2"].to_pylist(),
        ):
            cur = stats.get(k, (0, 0, 0))
            stats[k] = (cur[0] + n, cur[1] + s, cur[2] + s2)
    keys = sorted(stats)
    means = np.array([stats[k][1] / stats[k][0] for k in keys])
    variances = np.array(
        [stats[k][2] / stats[k][0] - (stats[k][1] / stats[k][0]) ** 2 for k in keys]
    )
    stds = np.sqrt(np.maximum(variances, 0.0))
    key_arr = pa.array(keys)

    def apply(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b[key], value_set=key_arr).to_numpy(zero_copy_only=False)
        idx = np.asarray(idx, np.int64)
        x = b[col].to_numpy().astype(np.float64)
        m, sd = means[idx], stds[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (x - m) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table(
            {
                id_col: b[id_col],
                key: b[key],
                col: b[col],
                "z": pa.array(np.round(z, 6), pa.float64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def _zscore_partials(t: pa.Table, key: str, col: str) -> pa.Table:
    x = t[col].to_numpy().astype(np.float64)
    enc = pc.dictionary_encode(
        t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
    )
    codes = np.asarray(enc.indices)
    nk = len(enc.dictionary)
    n = np.bincount(codes, minlength=nk)
    s = np.bincount(codes, weights=x, minlength=nk)
    s2 = np.bincount(codes, weights=x * x, minlength=nk)
    return pa.table(
        {
            "k": enc.dictionary,
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.float64()),
            "s2": pa.array(s2, pa.float64()),
        }
    )


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    values: list[str],
) -> ray.data.Dataset:
    """Pivot: one row per ``key`` with a count column per value of
    ``col`` (the fixed ``values`` list defines the output schema —
    explicit, so the schema is known before execution, which a
    distributed pivot needs). Per-batch partial count matrices keyed by
    key, then one groupby-sum — the exchange is |keys| x |values| ints
    per block."""
    val_arr = pa.array(values)

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b[key].combine_chunks() if isinstance(b[key], pa.ChunkedArray) else b[key]
        )
        kcodes = np.asarray(enc.indices)
        nk = len(enc.dictionary)
        vidx = pc.index_in(b[col], value_set=val_arr).to_numpy(zero_copy_only=False)
        known = ~np.isnan(vidx.astype(np.float64)) if vidx.dtype.kind == "f" else vidx >= 0
        vi = np.where(known, vidx, 0).astype(np.int64)
        mat = np.zeros((nk, len(values)), np.int64)
        np.add.at(mat, (kcodes[known], vi[known]), 1)
        cols = {key: enc.dictionary}
        for j, v in enumerate(values):
            cols[f"n_{v}"] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols)

    agg = combiner_groupby(
        ds.select_columns([key, col]).map_batches(partial, batch_format="pyarrow"),
        [key],
        [f"n_{v}" for v in values],
    )
    # n_rows counts PARTIAL rows here, not events — drop it
    return agg.select_columns([key] + [f"n_{v}" for v in values])
