"""Exact distributed quantiles per group — the percentile-cutoff
primitive of corpus quality filtering (e.g. "drop docs below the
per-language p10 quality score").

Scale shape: the column is first collapsed to per-batch ``(key, value,
count)`` partials (one small group_by per batch), merged by ONE
combiner groupby — the exchange carries |key × batch-distinct values|
rows, never the corpus. The quantile walk then runs per key over its
sorted value histogram (``map_groups``), so per-worker memory is
bounded by one key's distinct-value count. For genuinely continuous
columns with unbounded distinct values, quantize upstream (round to
the precision you need) or use a mergeable sketch; for the usual
integer-ish features (lengths, token counts, scaled scores) the
histogram is tiny.

Discrete-quantile semantics match DuckDB ``quantile_disc``: the value
at sorted index ``max(0, ceil(q*n) - 1)`` — verified empirically so
the SQL oracle compares exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .relational import combiner_groupby


def group_quantiles(
    ds: ray.data.Dataset, key: str, col: str, qs: list[float]
) -> ray.data.Dataset:
    """Exact per-``key`` discrete quantiles of ``col`` at each q in
    ``qs``. Returns rows (key, q, value)."""
    qs = sorted(qs)

    def partial(b: pa.Table) -> pa.Table:
        # quantile semantics ignore null values (as SQL aggregates do);
        # Arrow group_by would otherwise keep null as its own group
        b = b.select([key, col]).drop_null()
        vc = b.group_by([key, col]).aggregate([(col, "count")])
        return pa.table(
            {
                key: vc[key],
                col: vc[col],
                "cnt": vc[f"{col}_count"].cast(pa.int64()),
            }
        )

    hist = combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), [key, col], ["cnt"]
    )

    def pick(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=[(col, "ascending")]))
        cnt = g["cnt"].to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        targets = np.array([max(1, math.ceil(q * n)) for q in qs], np.int64)
        idx = np.searchsorted(cum, targets, side="left")
        vals = g[col].combine_chunks().take(pa.array(idx))
        return pa.table(
            {
                key: pa.array([g[key][0].as_py()] * len(qs), g.schema.field(key).type),
                "q": pa.array(qs, pa.float64()),
                "value": vals,
            }
        )

    return hist.groupby(key).map_groups(pick, batch_format="pyarrow")


def filter_by_group_quantile(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    q: float,
    keep: str = "ge",
) -> ray.data.Dataset:
    """Keep rows whose ``col`` is >= (``keep='ge'``) or < (``'lt'``)
    their group's q-quantile — the "drop below per-language p10" shape
    of corpus quality filtering.

    The cutoff table is |groups| rows: computed once, broadcast via
    ``ray.put``, applied with a vectorized searchsorted probe per batch
    — no join shuffle, the corpus streams through untouched."""
    import ray

    cuts = pa.concat_tables(
        pa.table(b)
        for b in group_quantiles(ds, key, col, [q]).iter_batches(
            batch_format="pyarrow"
        )
    )
    order = pc.sort_indices(cuts, sort_keys=[(key, "ascending")])
    cuts = cuts.take(order)
    keys_np = cuts[key].to_numpy(zero_copy_only=False)
    vals_np = cuts["value"].to_numpy(zero_copy_only=False)
    ref = ray.put((keys_np, vals_np))

    def apply(b: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        bk = b[key].to_numpy(zero_copy_only=False)
        cut = vs[np.searchsorted(ks, bk)]
        v = b[col].to_numpy(zero_copy_only=False)
        mask = v >= cut if keep == "ge" else v < cut
        return b.filter(pa.array(mask))

    return ds.map_batches(apply, batch_format="pyarrow")


def approx_quantiles_histogram(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    bins: int = 4096,
) -> pa.Table:
    """Approximate quantiles for CONTINUOUS columns with unbounded
    distinct values — the scale path `group_quantiles` points to.

    Two deterministic passes:
    1. global (min, max) via one combiner aggregate;
    2. per-batch fixed-width bin counts (one ``np.bincount`` each),
       merged by elementwise sum — associative, so the result is
       independent of batch layout and merge order.

    The quantile is read off the cumulative histogram with linear
    interpolation inside the hit bin; absolute error ≤ (max-min)/bins.
    The exchange is ONE ``bins``-long int64 vector per batch regardless
    of corpus size. Returns (q, value) rows.
    """
    import ray

    lo_hi = ds.map_batches(
        lambda b: pa.table(
            {
                "lo": pa.array([pc.min(b[col]).as_py()], pa.float64()),
                "hi": pa.array([pc.max(b[col]).as_py()], pa.float64()),
            }
        )
        if len(b)
        else pa.table({"lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64())}),
        batch_format="pyarrow",
    )
    lo = lo_hi.min("lo")
    hi = lo_hi.max("hi")
    if lo is None or hi is None:
        return pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())})
    lo, hi = float(lo), float(hi)
    width = (hi - lo) or 1.0

    def fold(b: pa.Table) -> pa.Table:
        v = b[col].combine_chunks().drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(((v - lo) / width * bins).astype(np.int64), bins - 1)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"h": pa.array([counts], pa.list_(pa.int64()))})

    def premerge(t: pa.Table) -> pa.Table:
        m = (
            t["h"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(-1, bins).sum(axis=0)
        )
        return pa.table({"h": pa.array([m], pa.list_(pa.int64()))})

    folded = ds.map_batches(fold, batch_format="pyarrow").map_batches(
        premerge, batch_size=64, batch_format="pyarrow"
    )
    hist = np.zeros(bins, np.int64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            hist += (
                t["h"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
                .astype(np.int64).reshape(-1, bins).sum(axis=0)
            )
    cum = np.cumsum(hist)
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in sorted(qs):
        target = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, target, side="left"))
        prev = int(cum[i - 1]) if i else 0
        frac = (target - prev) / max(int(hist[i]), 1)
        out_q.append(q)
        out_v.append(lo + (i + frac) * width / bins)
    return pa.table({"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())})


def grouped_quantiles_histogram(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    qs: list[float],
    bins: int = 1024,
) -> pa.Table:
    """Per-group approximate quantiles via the mergeable fixed-bin
    histogram — the scale path of ``group_quantiles`` for continuous
    columns: per-group (lo, hi) fold, then per-batch (group, histogram)
    rows sum-merged by one small groupby. The exchange is
    |groups| x bins ints per block; error ≤ per-group range / bins.
    Returns (key, q, value) rows sorted."""
    import pyarrow.compute as _pc

    # pass 1: per-group lo/hi (group cardinality tiny — driver fold)
    lohi: dict = {}
    for b in (
        ds.select_columns([key, col])
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t.group_by([key]).aggregate([(col, "min"), (col, "max")])[c]
                    for c in (key, f"{col}_min", f"{col}_max")
                ],
                names=[key, "lo", "hi"],
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        for k, lo, hi in zip(b[key].to_pylist(), b["lo"].to_pylist(), b["hi"].to_pylist()):
            cur = lohi.get(k)
            lohi[k] = (
                (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
            )
    keys = sorted(lohi)
    lo_arr = np.array([float(lohi[k][0]) for k in keys])
    w_arr = np.array(
        [float(lohi[k][1]) - float(lohi[k][0]) or 1.0 for k in keys]
    )
    key_arr = pa.array(keys)

    def fold(b: pa.Table) -> pa.Table:
        idx = _pc.index_in(b[key], value_set=key_arr).to_numpy(zero_copy_only=False)
        codes = np.asarray(idx, np.int64)
        v = b[col].to_numpy().astype(np.float64)
        bi = np.minimum(
            ((v - lo_arr[codes]) / w_arr[codes] * bins).astype(np.int64), bins - 1
        )
        mat = np.zeros((len(keys), bins), np.int64)
        np.add.at(mat, (codes, bi), 1)
        used = np.flatnonzero(mat.any(axis=1))
        return pa.table(
            {
                key: key_arr.take(pa.array(used, pa.int64())),
                "h": pa.array(list(mat[used]), pa.list_(pa.int64())),
            }
        )

    folded = ds.select_columns([key, col]).map_batches(fold, batch_format="pyarrow")

    def merge_group(g: pa.Table) -> pa.Table:
        m = (
            g["h"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(-1, bins).sum(axis=0)
        )
        return pa.table({key: g[key].slice(0, 1), "h": pa.array([m], pa.list_(pa.int64()))})

    merged = folded.groupby(key).map_groups(merge_group, batch_format="pyarrow")
    out_k, out_q, out_v = [], [], []
    hist_by_key: dict = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(len(t)):
            hist_by_key[t[key][i].as_py()] = np.asarray(t["h"][i].as_py(), np.int64)
    for ki, k in enumerate(keys):
        hist = hist_by_key[k]
        cum = np.cumsum(hist)
        n = int(cum[-1])
        for q in sorted(qs):
            target = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, target, side="left"))
            prev = int(cum[i - 1]) if i else 0
            frac = (target - prev) / max(int(hist[i]), 1)
            out_k.append(k)
            out_q.append(q)
            out_v.append(lo_arr[ki] + (i + frac) * w_arr[ki] / bins)
    return pa.table(
        {
            key: pa.array(out_k),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )
