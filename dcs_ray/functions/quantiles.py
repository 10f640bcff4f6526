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
