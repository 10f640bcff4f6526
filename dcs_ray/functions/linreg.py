"""Distributed linear-model training (ordinary least squares) via the
integer moment-matrix fold — the closed-form normal-equations route
that maps perfectly onto map_batches:

    β = (XᵀX)⁻¹ Xᵀy

Each batch contributes one partial row of XᵀX / Xᵀy (a single int64
``X.T @ X`` per batch — exact, so the fold is ORDER-INDEPENDENT and
bit-identical at any parallelism); the driver sums a #blocks-sized
table of (p+1)² integers. The tiny (p+1)-dim solve then uses Cramer's
rule with a FIXED-ORDER permutation expansion evaluated in float64 —
the same expression tree the SQL oracle evaluates, so even the float
coefficients replay bit-exactly (see ``_det_fixed`` / ``det_sql``).

Features must be pre-scaled to integers by the caller (the repo's
integer-units convention, e.g. ``round(price*100)``); that is what
makes the distributed fold exact. Magnitude budget: with int64, every
Σ xᵢxⱼ must stay below 2^63 and below 2^53 for the exact
int→double cast — fine for ~1e9-row folds of ≤1e4-scale features; a
100-TB fit should bucket the fold per feature pair or lift partials to
float with a tree reduce (documented trade-off).
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data


def _perm_sign(p: tuple[int, ...]) -> int:
    inv = sum(
        1
        for i in range(len(p))
        for j in range(i + 1, len(p))
        if p[i] > p[j]
    )
    return -1 if inv % 2 else 1


def _det_fixed(m: list[list[float]]) -> float:
    """Determinant via the permutation expansion in itertools order,
    left-associated products and sums — the shared expression tree
    (``det_sql`` emits the identical SQL)."""
    n = len(m)
    acc = 0.0
    for p in itertools.permutations(range(n)):
        prod = 1.0
        for i in range(n):
            prod = prod * m[i][p[i]]
        acc = acc + (float(_perm_sign(p)) * prod)
    return acc


def det_sql(names: list[list[str]]) -> str:
    """The same permutation expansion as a SQL expression over column
    names (each cast ``::double``), term order and associativity
    matching :func:`_det_fixed` exactly."""
    n = len(names)
    parts: list[str] = []
    for p in itertools.permutations(range(n)):
        term = " * ".join(f"{names[i][p[i]]}::double" for i in range(n))
        if not parts:
            parts.append(f"({term})")  # itertools order: first sign is +
        elif _perm_sign(p) > 0:
            parts.append(f"+ ({term})")
        else:
            parts.append(f"- ({term})")
    return " ".join(parts)


def linreg_fit_int(
    ds: ray.data.Dataset, x_cols: list[str], y_col: str
) -> pa.Table:
    """OLS fit of integer columns → (feature, coef) with an intercept
    row first; coef rounded to 6 decimals. See module docstring for the
    exactness contract."""
    p = len(x_cols) + 1  # + intercept
    flat_names = [f"m_{i}_{j}" for i in range(p) for j in range(i, p)] + [
        f"v_{i}" for i in range(p)
    ]

    def partial(b: pa.Table) -> pa.Table:
        n = len(b)
        X = np.empty((n, p), np.int64)
        X[:, 0] = 1
        for j, c in enumerate(x_cols):
            X[:, j + 1] = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        M = X.T @ X
        v = X.T @ y
        vals = [M[i, j] for i in range(p) for j in range(i, p)] + list(v)
        return pa.table(
            {nm: pa.array([int(x)], pa.int64()) for nm, x in zip(flat_names, vals)}
        )

    tot = {nm: 0 for nm in flat_names}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for nm in flat_names:
            s = b[nm].to_numpy(zero_copy_only=False).sum()
            tot[nm] += int(s)

    M = [[0.0] * p for _ in range(p)]
    for i in range(p):
        for j in range(i, p):
            M[i][j] = M[j][i] = float(tot[f"m_{i}_{j}"])
    v = [float(tot[f"v_{i}"]) for i in range(p)]
    det = _det_fixed(M)
    if det == 0.0:
        raise ValueError("singular moment matrix (collinear features)")
    coefs = []
    for i in range(p):
        Mi = [row[:] for row in M]
        for r in range(p):
            Mi[r][i] = v[r]
        coefs.append(round(_det_fixed(Mi) / det, 6))
    return pa.table(
        {
            "feature": pa.array(["intercept"] + list(x_cols), pa.string()),
            "coef": pa.array(coefs, pa.float64()),
        }
    )


def logreg_fit_gd(
    ds: ray.data.Dataset,
    x_cols: list[str],
    y_col: str,
    n_iter: int = 5,
    lr: float = 1e-3,
) -> pa.Table:
    """Distributed logistic-regression TRAINING: full-batch gradient
    descent for a FIXED ``n_iter`` iterations (the iterative
    complement of :func:`linreg_fit_int`'s closed form; the trained
    counterpart of ``textstats.QualityClassifier``'s inference-only
    actor).

        β_{t+1} = β_t − lr · ( Σ x·(σ(x·β_t) − y) / N )

    Scale shape: β is broadcast per iteration; each iteration is ONE
    streaming pass where a batch emits a single partial-gradient row
    ((p+1) floats + its row count); the driver folds #blocks rows in a
    CANONICAL sorted order, so a given block layout yields the same
    result at any parallelism / arrival order. z and the update use
    explicit left-associated arithmetic — the SQL oracle replays every
    iteration with the same expression tree, coefficients matching to
    the final round(·, 6) whenever lr·n_iter keeps the GD map
    contracting (ULP-level sum-order differences across DIFFERENT
    block layouts are unavoidable and amplify if lr is large enough to
    make iterates oscillate — keep lr modest for replayable fits).

    Inputs: integer (or float) feature columns, binary 0/1 ``y_col``;
    an intercept is prepended. Returns (feature, coef)."""
    import ray

    p = len(x_cols) + 1
    ds = ds.materialize()  # consumed n_iter times
    beta = np.zeros(p, np.float64)
    n_total = 0
    for t in range(n_iter):
        bref = ray.put(beta.copy())

        def partial(b: pa.Table, _bref=bref) -> pa.Table:
            bt = ray.get(_bref)
            n = len(b)
            cols = [np.ones(n, np.float64)] + [
                b[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in x_cols
            ]
            z = bt[0] * cols[0]
            for j in range(1, p):
                z = z + bt[j] * cols[j]
            r = 1.0 / (1.0 + np.exp(-z)) - b[y_col].to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            out = {
                f"g_{j}": pa.array([float(np.sum(cols[j] * r))], pa.float64())
                for j in range(p)
            }
            out["n"] = pa.array([n], pa.int64())
            return pa.table(out)

        parts = [
            pa.table(b)
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
        allp = pa.concat_tables(parts)
        gs = [allp[f"g_{j}"].to_numpy(zero_copy_only=False) for j in range(p)]
        ns = allp["n"].to_numpy(zero_copy_only=False)
        # canonical fold order: sort partial rows by their values so the
        # float sum never depends on block arrival order
        order = np.lexsort(tuple(gs[::-1]))
        g = np.array([float(np.sum(gj[order])) for gj in gs])
        n_total = int(ns.sum())
        for j in range(p):
            beta[j] = beta[j] - lr * (g[j] / float(n_total))
    return pa.table(
        {
            "feature": pa.array(["intercept"] + list(x_cols), pa.string()),
            "coef": pa.array([round(float(b), 6) for b in beta], pa.float64()),
        }
    )


def corr_matrix_int(ds: ray.data.Dataset, cols: list[str]) -> pa.Table:
    """Distributed Pearson correlation matrix over integer columns via
    the same exact int64 moment fold as :func:`linreg_fit_int` — one
    partial row per batch, order-independent integer sums, then the
    tiny closed form

        corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))

    evaluated in float64 with exactly this expression tree (the SQL
    oracle mirrors it term for term). Returns the upper triangle
    (col_a < col_b) sorted by (col_a, col_b), corr rounded to 6."""
    p = len(cols)
    names = [f"s_{i}" for i in range(p)] + [
        f"q_{i}_{j}" for i in range(p) for j in range(i, p)
    ]

    def partial(b: pa.Table) -> pa.Table:
        X = np.column_stack(
            [b[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in cols]
        )
        out = {"n": pa.array([len(b)], pa.int64())}
        for i in range(p):
            out[f"s_{i}"] = pa.array([int(X[:, i].sum())], pa.int64())
        Q = X.T @ X
        for i in range(p):
            for j in range(i, p):
                out[f"q_{i}_{j}"] = pa.array([int(Q[i, j])], pa.int64())
        return pa.table(out)

    tot = {nm: 0 for nm in names}
    n = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n += int(b["n"].to_numpy(zero_copy_only=False).sum())
        for nm in names:
            tot[nm] += int(b[nm].to_numpy(zero_copy_only=False).sum())

    rows_a, rows_b, rows_c = [], [], []
    import math

    for i in range(p):
        for j in range(i + 1, p):
            num = float(n) * float(tot[f"q_{i}_{j}"]) - float(tot[f"s_{i}"]) * float(
                tot[f"s_{j}"]
            )
            da = math.sqrt(
                float(n) * float(tot[f"q_{i}_{i}"]) - float(tot[f"s_{i}"]) * float(tot[f"s_{i}"])
            )
            db = math.sqrt(
                float(n) * float(tot[f"q_{j}_{j}"]) - float(tot[f"s_{j}"]) * float(tot[f"s_{j}"])
            )
            c = num / (da * db) if da > 0 and db > 0 else 0.0
            rows_a.append(cols[i])
            rows_b.append(cols[j])
            rows_c.append(round(c, 6))
    return pa.table(
        {
            "col_a": pa.array(rows_a, pa.string()),
            "col_b": pa.array(rows_b, pa.string()),
            "corr": pa.array(rows_c, pa.float64()),
        }
    ).sort_by([("col_a", "ascending"), ("col_b", "ascending")])
