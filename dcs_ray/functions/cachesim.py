"""Search result-cache policy evaluation over a query log.

Baeza-Yates et al., SIGIR '07 ("The impact of caching on search
engines"): because query popularity is heavily skewed, a SMALL static
cache of the most-popular queries' results absorbs a large share of
traffic; the static-vs-dynamic trade-off is evaluated by replaying a
log. This module reproduces the static-cache side: fold the log into
per-query frequencies, cache the top-m, report the cumulative hit
rate curve.

The log here is synthesized deterministically (two splitmix64 draws
per request, ``qid = min(h1 % K, h2 % K)`` — a linearly-skewed
popularity profile, every bit SQL-replayable). The frequency fold is
the usual vectorized per-block bincount partial + integer driver
merge; everything after is ≤ K-row arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.sampling import splitmix64


def synth_query_stream(
    n_requests: int, n_queries: int, seed: int = 21
) -> ray.data.Dataset:
    """Deterministic skewed query stream: request i asks query
    ``min(splitmix64(i ^ seed) % K, splitmix64(i ^ (seed+1)) % K)``."""

    def f(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy().astype(np.uint64)
        h1 = splitmix64(i ^ np.uint64(seed)) % np.uint64(n_queries)
        h2 = splitmix64(i ^ np.uint64(seed + 1)) % np.uint64(n_queries)
        qid = np.minimum(h1, h2).astype(np.int64)
        return pa.table(
            {
                "request": pa.array(i.astype(np.int64), pa.int64()),
                "query_id": pa.array(qid, pa.int64()),
            }
        )

    return ray.data.range(n_requests).map_batches(f, batch_format="pyarrow")


def static_cache_hit_curve(
    log: ray.data.Dataset, n_queries: int, cache_m: int = 20
) -> pa.Table:
    """Top-``cache_m`` static cache: (rank, query_id, freq,
    cum_hit_rate) with the cumulative hit-rate curve — integer folds,
    one 6-dp division per row. Cache membership ranks by (freq desc,
    query_id asc)."""

    def partial(b: pa.Table) -> pa.Table:
        q = b["query_id"].to_numpy()
        f = np.bincount(q, minlength=n_queries).astype(np.int64)
        return pa.table(
            {"f": pa.array([f.tolist()], pa.list_(pa.int64()))}
        )

    freq = np.zeros(n_queries, np.int64)
    total = 0
    for b in log.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in b["f"].to_pylist():
            a = np.asarray(row, np.int64)
            freq += a
            total += int(a.sum())
    order = np.lexsort((np.arange(n_queries), -freq))[:cache_m]
    f_top = freq[order]
    cum = np.cumsum(f_top)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "query_id": pa.array(order.astype(np.int64), pa.int64()),
            "freq": pa.array(f_top, pa.int64()),
            "cum_hit_rate": pa.array(
                np.round(cum / max(total, 1), 6) + 0.0, pa.float64()
            ),
        }
    )
