"""Deterministic sampling: hash-fraction and stratified top-n.

Both are driven by a splitmix64 finalizer over (id XOR seed), so the
sample is a pure function of the row id — reproducible across runs,
cluster sizes and block layouts, and replayable in SQL for the oracle
gate (unlike ``Dataset.random_sample``).

Scale shapes:
- ``sample_fraction``: stateless per-batch filter — embarrassingly
  parallel, no shuffle at all.
- ``sample_stratified``: per-batch partial top-n per stratum (each
  batch emits <= n rows per stratum it contains) → one ``groupby``
  over the pruned remainder → final top-n. The shuffle carries at
  most n × (strata present per batch) rows per batch, never the
  corpus — the standard combiner-before-groupby recipe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _MIX1
        x = (x ^ (x >> np.uint64(27))) * _MIX2
        x ^= x >> np.uint64(31)
    return x


def _row_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    return splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))


def sample_fraction(
    ds: ray.data.Dataset, frac: float, id_col: str = "doc_id", seed: int = 0
) -> ray.data.Dataset:
    """Keep a row iff splitmix64(id ^ seed) < frac·2^64 — a fixed,
    id-determined ~frac subsample."""
    threshold = np.uint64(min(int(frac * float(1 << 64)), (1 << 64) - 1))

    def keep(b: pa.Table) -> pa.Table:
        h = _row_hash(b[id_col].to_numpy(), seed)
        return b.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def _topn_per_stratum(
    b: pa.Table, strata_col: str, id_col: str, n: int, seed: int
) -> pa.Table:
    """Rows with the n smallest (hash, id) per stratum within this
    table — used both as the per-batch combiner and the final reducer
    (idempotent, associative)."""
    if len(b) == 0:
        return b
    strata = b[strata_col]
    # dense-rank strata via dictionary encoding (works for any dtype)
    enc = pa.compute.dictionary_encode(
        strata.combine_chunks() if isinstance(strata, pa.ChunkedArray) else strata
    )
    codes = np.asarray(enc.indices)
    ids = b[id_col].to_numpy().astype(np.int64)
    h = _row_hash(ids, seed)
    order = np.lexsort((ids, h, codes))
    codes_s = codes[order]
    starts = np.concatenate(([0], np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1))
    rank = np.arange(len(order)) - np.repeat(starts, np.diff(np.concatenate((starts, [len(order)]))))
    keep_sorted = order[rank < n]
    return b.take(pa.array(np.sort(keep_sorted)))


def sample_stratified(
    ds: ray.data.Dataset,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic n-per-stratum sample: the n rows with the smallest
    (splitmix64(id ^ seed), id) per stratum value."""

    pruned = ds.map_batches(
        lambda b: _topn_per_stratum(b, strata_col, id_col, n_per_stratum, seed),
        batch_format="pyarrow",
    )
    return pruned.groupby(strata_col).map_groups(
        lambda g: _topn_per_stratum(g, strata_col, id_col, n_per_stratum, seed),
        batch_format="pyarrow",
    )


def rebalance_to_weights(
    ds: ray.data.Dataset,
    group_col: str,
    weights: dict[str, int],
    total_target: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic mixture rebalancing: sample each group at the rate
    that makes the expected output match ``total_target`` split by the
    integer ``weights`` (the training-mixture step of CCNet/RefinedWeb
    style pipelines — cap over-represented domains, keep the rest).

    Two passes, neither a shuffle: (1) exact per-group counts (the group
    cardinality is hosts/langs — tiny — so per-batch partials fold on
    the driver); (2) keep a row iff ``splitmix64(id ^ seed) <
    threshold[group]`` where ``threshold = floor(2^64 * total * w_g /
    (sum_w * count_g))`` computed in exact integer arithmetic (so a SQL
    oracle reproduces it bit-for-bit), capped at keep-everything.
    Groups without a weight are dropped."""
    counts: dict = {}
    for b in (
        ds.select_columns([group_col])
        .map_batches(
            lambda t: pa.table(
                {
                    "g": pa.compute.value_counts(t[group_col]).field("values"),
                    "c": pa.compute.value_counts(t[group_col]).field("counts"),
                }
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        for g, c in zip(b["g"].to_pylist(), b["c"].to_pylist()):
            counts[g] = counts.get(g, 0) + c
    wden = sum(weights.values())
    groups = sorted(weights)
    thresholds = np.array(
        [
            min(
                ((1 << 64) * total_target * weights[g]) // (wden * counts.get(g, 1)),
                (1 << 64) - 1,
            )
            for g in groups
        ],
        dtype=np.uint64,
    )
    group_arr = pa.array(groups)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        idx = pc2.index_in(b[group_col], value_set=group_arr).to_numpy(
            zero_copy_only=False
        )
        h = _row_hash(b[id_col].to_numpy(), seed)
        known = ~np.isnan(idx.astype(np.float64)) if idx.dtype.kind == "f" else idx >= 0
        idx_i = np.where(known, idx, 0).astype(np.int64)
        ok = known & (h < thresholds[idx_i])
        return b.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_dataset(
    ds: ray.data.Dataset,
    fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    id_col: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic disjoint split: row → the bucket whose cumulative
    hash-threshold range contains splitmix64(id ^ seed). Same id, same
    split, on every run and cluster size; no shuffle, no state."""
    assert len(fractions) == len(names) and abs(sum(fractions) - 1.0) < 1e-9
    cum = np.cumsum(fractions)
    thresholds = np.array(
        [min(int(c * float(1 << 64)), (1 << 64) - 1) for c in cum], np.uint64
    )
    name_arr = pa.array(list(names))

    def assign(b: pa.Table) -> pa.Table:
        h = _row_hash(b[id_col].to_numpy(), seed)
        idx = np.searchsorted(thresholds, h, side="right")
        idx = np.minimum(idx, len(names) - 1)
        return b.append_column("split", name_arr.take(pa.array(idx, pa.int64())))

    return ds.map_batches(assign, batch_format="pyarrow")


def global_shuffle_rank(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    seed: int = 7,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """Deterministic training shuffle: assign every row its 0-based
    position in the global order (splitmix64(id ^ seed), id) — a
    reproducible pseudo-random permutation, identical at any
    parallelism or block layout (the "global shuffle before epoch 0"
    a training-data pipeline ends with, without a random_shuffle).

    Distributed rank, two bounded passes (no corpus-sized driver state):

    1. combiner histogram over the hash's top-log2(n_buckets) bits —
       an ORDER-PRESERVING prefix, so bucket boundaries are rank
       boundaries; one ``groupby(bucket).sum`` → n_buckets totals →
       exclusive cumsum broadcast via ``ray.put``.
    2. ``groupby(bucket).map_groups``: one lexsort of the bucket's
       (hash, id) rows (E[bucket] = N/n_buckets), rank = bucket offset
       + local position. The exchange carries pure int rows.

    Returns (id_col, shuffle_rank int64). Size ``n_buckets`` so a
    bucket's rows fit one worker: at 10^12 docs, n_buckets=2^20 →
    ~10^6 rows (~16 MB) per group.
    """
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
    shift = np.uint64(64 - int(np.log2(n_buckets)))

    def hist(b: pa.Table) -> pa.Table:
        h = _row_hash(b[id_col].to_numpy(), seed)
        cnt = np.bincount((h >> shift).astype(np.int64), minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    totals = np.zeros(n_buckets, np.int64)
    for t in (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .sum("cnt")
        .iter_batches(batch_format="pyarrow")
    ):
        t = pa.table(t)
        totals[t["bucket"].to_numpy()] += t["sum(cnt)"].to_numpy()
    offsets = np.zeros(n_buckets, np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])
    ref = ray.put(offsets)

    def occurrences(b: pa.Table) -> pa.Table:
        h = _row_hash(b[id_col].to_numpy(), seed)
        return pa.table(
            {
                id_col: b[id_col],
                "h": pa.array(h.view(np.int64), pa.int64()),
                "bucket": pa.array((h >> shift).astype(np.int64), pa.int64()),
            }
        )

    def rank_group(g: pa.Table) -> pa.Table:
        off = ray.get(ref)
        ids = g[id_col].to_numpy()
        h = g["h"].to_numpy().view(np.uint64)
        order = np.lexsort((ids, h))
        rank = np.empty(len(ids), np.int64)
        rank[order] = off[int(g["bucket"][0].as_py())] + np.arange(
            len(ids), dtype=np.int64
        )
        return pa.table({id_col: g[id_col], "shuffle_rank": pa.array(rank, pa.int64())})

    return (
        ds.map_batches(occurrences, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def weighted_sample(
    ds: ray.data.Dataset,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    '06, A-ES): each row draws ``u = (splitmix64(id ^ seed) + 0.5) /
    2^64`` and the ``n`` rows with the LARGEST ``ln(u) / w`` keys are
    an exact weighted sample — the standard one-pass distributed
    recipe for quality-weighted training-data selection. Deterministic:
    same ids + seed → same sample at any parallelism. Rows with
    ``weight ≤ 0`` are excluded.

    Scale shape: one streaming pass; each block contributes only its
    local top-``n`` (key desc, id asc) partial, the driver merges
    |blocks|·n rows — nothing corpus-sized anywhere. Both ``u`` and the
    key are pure functions of integers, so the SQL oracle replays the
    selection exactly (splitmix in hugeint limbs, one ln per row)."""

    def local_top(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        w = b[weight_col].to_numpy().astype(np.float64)
        pos = w > 0
        ids, w = ids[pos], w[pos]
        h = _row_hash(ids, seed)
        u = (h.astype(np.float64) + 0.5) / np.float64(1 << 64)
        k = np.log(u) / w
        order = np.lexsort((ids, -k))[:n]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "weight": pa.array(
                    b[weight_col].to_numpy()[pos][order].astype(np.int64), pa.int64()
                ),
                "k": pa.array(k[order], pa.float64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "weight": pa.array([], pa.int64()),
                "sel_key": pa.array([], pa.float64()),
            }
        )
    m = pa.concat_tables(parts)
    ids = m[id_col].to_numpy(zero_copy_only=False)
    w = m["weight"].to_numpy(zero_copy_only=False)
    k = m["k"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -k))[:n]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order], pa.int64()),
            "sel_key": pa.array(np.round(k[order], 6), pa.float64()),
        }
    )


def weighted_sample_grouped(
    ds: ray.data.Dataset,
    n_per_group: int,
    group_col: str,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> pa.Table:
    """Stratified weighted sampling without replacement: the A-ES
    ``ln(u)/w`` key (:func:`weighted_sample`) cut to the top
    ``n_per_group`` WITHIN each group — per-language/per-source
    quality-weighted selection in one pass. Each block emits its local
    per-group top-n partial, so the driver merges |blocks|·|groups|·n
    rows; weight ≤ 0 rows are excluded."""

    def local_top(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        w = b[weight_col].to_numpy().astype(np.float64)
        g = b[group_col]
        pos = w > 0
        ids, w = ids[pos], w[pos]
        g = g.filter(pa.array(pos)).combine_chunks()
        h = _row_hash(ids, seed)
        u = (h.astype(np.float64) + 0.5) / np.float64(1 << 64)
        k = np.log(u) / w
        codes = pa.compute.dictionary_encode(g)
        gi = codes.indices.to_numpy(zero_copy_only=False)
        rank = pa.compute.sort_indices(codes.dictionary).to_numpy(
            zero_copy_only=False
        )
        grank = np.empty(len(rank), np.int64)
        grank[rank] = np.arange(len(rank))
        order = np.lexsort((ids, -k, grank[gi]))
        gs, within = gi[order], np.zeros(len(order), np.int64)
        if len(gs):
            runs = np.concatenate(([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
            within = np.arange(len(gs)) - np.repeat(
                runs, np.diff(np.concatenate((runs, [len(gs)])))
            )
        sel = order[within < n_per_group]
        return pa.table(
            {
                group_col: g.take(pa.array(sel)),
                id_col: pa.array(ids[sel], pa.int64()),
                "weight": pa.array(
                    b[weight_col].to_numpy()[pos][sel].astype(np.int64), pa.int64()
                ),
                "k": pa.array(k[sel], pa.float64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "weight": pa.array([], pa.int64()),
            "sel_key": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    m = pa.concat_tables(parts)
    order_keys = [
        (group_col, "ascending"),
        ("k", "descending"),
        (id_col, "ascending"),
    ]
    m = m.sort_by(order_keys)
    g = m[group_col].combine_chunks()
    codes = pa.compute.dictionary_encode(g).indices.to_numpy(zero_copy_only=False)
    runs = (
        np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        if len(codes)
        else np.empty(0, np.int64)
    )
    within = np.arange(len(codes)) - np.repeat(
        runs, np.diff(np.concatenate((runs, [len(codes)])))
    ) if len(codes) else np.empty(0, np.int64)
    keep = pa.array(within < n_per_group)
    m = m.filter(keep)
    return pa.table(
        {
            group_col: m[group_col],
            id_col: m[id_col],
            "weight": m["weight"],
            "sel_key": pa.array(
                np.round(m["k"].to_numpy(zero_copy_only=False), 6), pa.float64()
            ),
        }
    )
