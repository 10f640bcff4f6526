"""Pairwise learning-to-rank: linear RankNet-style logistic training.

The re-ranking layer of a web stack: given per-(query, doc) FEATURES
(lexical score, length, static prior, ...) and preference PAIRS
(relevant ≻ non-relevant), learn a linear scoring function by gradient
ascent on the pairwise logistic likelihood (Burges '05 RankNet with a
linear scorer; equivalently Herbrich '99 ranking SVM's logistic
sibling):

    P(i ≻ j) = σ(w·(x_i − x_j))
    w_{t+1}  = w_t + lr · Σ_pairs Δx·σ(−w·Δx) / n_pairs

Scale shape mirrors ``linreg.logreg_fit_gd``: w is broadcast per
iteration, each iteration is one streaming pass over the pairs Dataset
emitting per-block partial gradients folded in a canonical sorted
order. Pair GENERATION at scale is per-query local (relevant ×
non-relevant within one query's candidate list — never a corpus-wide
cross product); here the caller builds the pairs Dataset explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def pairwise_ltr_fit(
    pairs: ray.data.Dataset,
    d_cols: list[str],
    n_iter: int = 8,
    lr: float = 0.1,
) -> np.ndarray:
    """Fit w by full-batch pairwise-logistic gradient ascent over a
    Dataset of feature DIFFERENCES (one row per preference pair,
    columns ``d_cols`` = x_winner − x_loser). Returns the raw float64
    weight vector (callers round for gates).

    Every iteration: z = Δx·w (left-associated), coef = 1/(1+exp(z)),
    partial g_k = Σ Δx_k·coef per block, canonical-order driver fold —
    the same expression tree the SQL oracle unrolls per iteration."""
    p = len(d_cols)
    pairs = pairs.materialize()  # consumed n_iter times
    w = np.zeros(p, np.float64)
    for _ in range(n_iter):
        wref = ray.put(w.copy())

        def partial(b: pa.Table, _wref=wref) -> pa.Table:
            wt = ray.get(_wref)
            cols = [
                b[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in d_cols
            ]
            z = wt[0] * cols[0]
            for j in range(1, p):
                z = z + wt[j] * cols[j]
            coef = 1.0 / (1.0 + np.exp(z))
            out = {
                f"g_{j}": pa.array([float(np.sum(cols[j] * coef))], pa.float64())
                for j in range(p)
            }
            out["n"] = pa.array([len(b)], pa.int64())
            return pa.table(out)

        plist = [
            pa.table(b)
            for b in pairs.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
        if not plist:  # empty pairs Dataset → nothing to fit
            return w
        parts = pa.concat_tables(plist)
        gs = [parts[f"g_{j}"].to_numpy(zero_copy_only=False) for j in range(p)]
        n_total = int(parts["n"].to_numpy().sum())
        if n_total == 0:
            return w
        order = np.lexsort(tuple(gs[::-1]))
        for j in range(p):
            g = float(np.sum(gs[j][order]))
            w[j] = w[j] + lr * (g / float(n_total))
    return w


def pairwise_accuracy(
    deltas: np.ndarray, w: np.ndarray
) -> tuple[int, int]:
    """(n_pairs, n_correct): pairs the linear scorer orders correctly
    (w·Δx > 0). Callers pass the ROUNDED weights so the threshold test
    replays identically in SQL."""
    if len(deltas) == 0:
        return 0, 0
    s = w[0] * deltas[:, 0]
    for j in range(1, deltas.shape[1]):
        s = s + w[j] * deltas[:, j]  # left-assoc, same tree as the SQL
    return len(deltas), int((s > 0).sum())
