"""Kleinberg burst detection over a daily event stream.

Kleinberg, "Bursty and Hierarchical Structure in Streams" (KDD '02),
two-state batch variant: each day t has ``r_t`` target events out of
``n_t`` total; the quiet state emits at the global rate
``p0 = R/N`` and the burst state at ``p1 = min(2·p0, 0.9999)``. Day
cost in state q is the binomial negative log-likelihood

    cost_q(t) = -( r_t·ln(p_q) + (n_t - r_t)·ln(1 - p_q) )

entering the burst state costs ``gamma·ln(T)`` extra; Viterbi gives
the cheapest state sequence — the canonical "when did this term/event
burst" primitive of trend detection over logs.

Scale shape: the per-day (r, n) sufficient statistics fold with one
``groupby(day)`` over the event stream (integer partials); the DP is
O(T) driver arithmetic over the tiny aggregate. Determinism: the DP
runs day-by-day with a fixed expression tree and ties broken toward
the quiet state / the 0→1 transition, so a recursive-CTE SQL replay
reproduces every comparison."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def daily_type_counts(
    events: ray.data.Dataset,
    target_type: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pa.Table:
    """(day, r, n) per day: target-type count and total count — one
    vectorized per-block fold + integer groupby."""

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64()).to_numpy()
        day = us // 86_400_000_000
        is_t = pc.equal(b[type_col], target_type).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(uniq, pa.int64()),
                "r": pa.array(
                    np.bincount(inv, weights=is_t.astype(np.float64))
                    .astype(np.int64),
                    pa.int64(),
                ),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    agg = events.select_columns([ts_col, type_col]).map_batches(
        partial, batch_format="pyarrow"
    ).groupby("day").sum(["r", "n"])
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    ).sort_by("day")
    return pa.table(
        {
            "day": t["day"],
            "r": t["sum(r)"].cast(pa.int64()),
            "n": t["sum(n)"].cast(pa.int64()),
        }
    )


def kleinberg_bursts(
    daily: pa.Table, s: float = 2.0, gamma: float = 1.0
) -> pa.Table:
    """Two-state Viterbi over (day, r, n) rows → (day, r, n, state).

    Recurrence (day-by-day, left-associated, ties to quiet / to the
    0→1 transition — mirrored exactly by the SQL recursive CTE):

        c0' = cost0(t) + min(c0, c1)
        c1' = cost1(t) + min(c0 + gamma·ln(T), c1)
    """
    days = daily["day"].to_numpy()
    r = daily["r"].to_numpy().astype(np.int64)
    n = daily["n"].to_numpy().astype(np.int64)
    T = len(days)
    R, N = int(r.sum()), int(n.sum())
    p0 = R / N
    p1 = min(s * p0, 0.9999)
    g = gamma * math.log(T)

    def cost(rt: int, nt: int, p: float) -> float:
        return -(rt * math.log(p) + (nt - rt) * math.log(1.0 - p))

    c0 = cost(int(r[0]), int(n[0]), p0)
    c1 = g + cost(int(r[0]), int(n[0]), p1)  # burst entry on day 1 pays γ·lnT
    seq0, seq1 = "0", "1"
    for t in range(1, T):
        f0 = cost(int(r[t]), int(n[t]), p0)
        f1 = cost(int(r[t]), int(n[t]), p1)
        n0 = f0 + (c0 if c0 <= c1 else c1)
        s0 = (seq0 if c0 <= c1 else seq1) + "0"
        n1 = f1 + ((c0 + g) if (c0 + g) <= c1 else c1)
        s1 = (seq0 if (c0 + g) <= c1 else seq1) + "1"
        c0, c1, seq0, seq1 = n0, n1, s0, s1
    best = seq0 if c0 <= c1 else seq1
    return pa.table(
        {
            "day": daily["day"],
            "r": daily["r"],
            "n": daily["n"],
            "state": pa.array([int(ch) for ch in best], pa.int64()),
        }
    )
