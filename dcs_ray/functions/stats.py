"""Distribution-statistics operators over Dataset columns.

Each operator follows the repo's combiner discipline: per-batch
vectorized partials (value-count collapses or integer moment sums) so
the exchange is proportional to the DISTINCT domain or the block count,
never the row count. Driver-side folds here touch only those tiny
partials; the final statistic is one float expression, rounded to 6 so
the DuckDB oracle replay hashes identically.

Reference parity: these generalize the ranking-statistics family the
reference computes driver-side over its per-package metadata
(`cmd/dcs-compute-ranking/main.go`) to arbitrary Dataset columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.functions.relational import combiner_groupby

__all__ = [
    "first_digit_counts",
    "spearman_rho",
    "ks_two_sample",
    "markov_stationary",
    "daily_counts",
    "weighted_median",
    "theil_sen_slope",
    "mann_kendall",
    "acf",
]


def first_digit_counts(
    ds: ray.data.Dataset, col: str, scale: int = 100
) -> pa.Table:
    """Benford's-law first-significant-digit profile of a positive
    numeric column. The value is fixed to an exact integer
    (``floor(x*scale + 0.5)``) and the leading digit read off its
    decimal string — both steps replayable bit-exactly in SQL — so the
    observed share can be hash-compared against ``log10(1+1/d)``.

    Shape: one map-side digit extraction per batch, then a 9-row
    combiner exchange. Returns (digit, n, share, benford_p) sorted by
    digit; shares carry one float division each, rounded to 6."""

    def digits(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.floor(x * scale + 0.5).astype(np.int64)
        # exact leading digit via the decimal string (no float log10)
        d = pc.utf8_slice_codeunits(
            pc.cast(pa.array(v, pa.int64()), pa.string()), 0, 1
        )
        return pa.table({"digit": pc.cast(d, pa.int64())})

    counts = combiner_groupby(
        ds.map_batches(digits, batch_format="pyarrow"), ["digit"], [], count_col="n"
    )
    t = pa.concat_tables(
        pa.table(b) for b in counts.iter_batches(batch_format="pyarrow")
    ).sort_by("digit")
    n = t["n"].to_numpy().astype(np.int64)
    dig = t["digit"].to_numpy().astype(np.int64)
    total = int(n.sum())
    share = np.round(n.astype(np.float64) / float(total), 6) + 0.0
    benford = np.round(np.log10(1.0 + 1.0 / dig.astype(np.float64)), 6) + 0.0
    return pa.table(
        {
            "digit": pa.array(dig, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "share": pa.array(share, pa.float64()),
            "benford_p": pa.array(benford, pa.float64()),
        }
    )


def _midrank2_lookup(vals: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    """2× the midrank of each distinct value (sorted ``vals`` with tie
    counts ``cnts``): ``2*mid = 2*before + cnt + 1`` — an exact integer,
    so downstream moment sums stay order-independent."""
    before = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    return 2 * before + cnts + 1


def spearman_rho(
    ds: ray.data.Dataset, x_col: str, y_col: str
) -> tuple[float, int]:
    """Spearman rank correlation between two bounded-domain integer
    columns, tie-corrected via midranks.

    Distributed shape: two distinct-value combiner folds give each
    column's midrank table (broadcast once via ``ray.put``); a second
    pass emits ONE row of integer moment partials per batch
    (n, Σx, Σy, Σx², Σy², Σxy over 2×midranks, all exact int64); the
    driver folds block-count rows in arbitrary-precision Python ints
    and performs the single float Pearson expression at the end.
    At 10^12 rows the per-batch int64 partials would overflow — the
    fold is the place to switch the partial dtype to decimal128.
    """
    lut: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for col in (x_col, y_col):
        vc = pa.concat_tables(
            pa.table(b)
            for b in combiner_groupby(
                ds.select_columns([col]), [col], [], count_col="c"
            ).iter_batches(batch_format="pyarrow")
        ).sort_by(col)
        vals = vc[col].to_numpy().astype(np.int64)
        cnts = vc["c"].to_numpy().astype(np.int64)
        lut[col] = (vals, _midrank2_lookup(vals, cnts))
    ref = ray.put(lut)

    def partial(b: pa.Table) -> pa.Table:
        lu = ray.get(ref)
        vx, rx = lu[x_col]
        vy, ry = lu[y_col]
        x = rx[np.searchsorted(vx, b[x_col].to_numpy(zero_copy_only=False))]
        y = ry[np.searchsorted(vy, b[y_col].to_numpy(zero_copy_only=False))]
        return pa.table(
            {
                "n": pa.array([len(b)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    acc = {k: 0 for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        for k in acc:
            acc[k] += sum(t[k].to_pylist())  # python ints: exact
    n = acc["n"]
    num = n * acc["sxy"] - acc["sx"] * acc["sy"]
    den_x = n * acc["sxx"] - acc["sx"] * acc["sx"]
    den_y = n * acc["syy"] - acc["sy"] * acc["sy"]
    rho = float(num) / (float(den_x) ** 0.5 * float(den_y) ** 0.5)
    return round(rho, 6) + 0.0, n


def ks_two_sample(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
) -> tuple[float, int, int]:
    """Two-sample Kolmogorov–Smirnov statistic between ``val_col``'s
    distributions in two groups: sup over distinct values of the
    empirical-CDF gap. One (group, value) combiner fold — exchange is
    the distinct domain of the two groups — then exact integer
    cumulative counts on the driver with one float division per
    distinct value. Returns (ks_stat rounded to 6, n_a, n_b)."""
    keep_set = pa.array([group_a, group_b], pa.string())

    def keep(b: pa.Table) -> pa.Table:
        return b.select([group_col, val_col]).filter(
            pc.is_in(b[group_col], value_set=keep_set)
        )

    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ds.map_batches(keep, batch_format="pyarrow"),
            [group_col, val_col],
            [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by(val_col)
    g = np.asarray(vc[group_col].to_pylist())
    v = vc[val_col].to_numpy().astype(np.int64)
    c = vc["c"].to_numpy().astype(np.int64)
    uniq = np.unique(v)
    ca = np.zeros(len(uniq), np.int64)
    cb = np.zeros(len(uniq), np.int64)
    pos = np.searchsorted(uniq, v)
    np.add.at(ca, pos[g == group_a], c[g == group_a])
    np.add.at(cb, pos[g == group_b], c[g == group_b])
    na, nb = int(ca.sum()), int(cb.sum())
    fa = np.cumsum(ca).astype(np.float64) / float(na)
    fb = np.cumsum(cb).astype(np.float64) / float(nb)
    ks = float(np.max(np.abs(fa - fb))) if len(uniq) else 0.0
    return round(ks, 6) + 0.0, na, nb


def markov_stationary(
    transitions: pa.Table,
    all_types: list[str],
    iters: int = 5,
) -> pa.Table:
    """Power iteration toward the stationary distribution of the
    event-type Markov chain: rows of the transition-count matrix are
    normalized to probabilities, v₀ is uniform over ``all_types``, each
    step takes v·P and renormalizes (rows with no outgoing transitions
    shed their mass to the renormalization, the standard dangling-state
    treatment). The matrix is |types|² — driver-tiny at any corpus
    size; the distributed work is the transition-count fold feeding it
    (`windows.event_transitions`)."""
    types = sorted(all_types)
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    mat = np.zeros((k, k), np.float64)
    prev = transitions["prev_type"].to_pylist()
    nxt = transitions["next_type"].to_pylist()
    cnt = transitions["n"].to_numpy().astype(np.float64)
    for p, q, n in zip(prev, nxt, cnt):
        mat[idx[p], idx[q]] = n
    row = mat.sum(axis=1, keepdims=True)
    np.divide(mat, row, out=mat, where=row > 0)
    v = np.full(k, 1.0 / k)
    for _ in range(iters):
        v = v @ mat
        s = v.sum()
        if s == 0.0:
            v = np.full(k, 1.0 / k)
            break
        v = v / s
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "pr": pa.array(np.round(v, 6) + 0.0, pa.float64()),
        }
    )


def daily_counts(ds: ray.data.Dataset, ts_col: str = "ts") -> pa.Table:
    """(epoch-day, count) fold of a timestamp column, sorted by day —
    the tiny series every trend/seasonality operator consumes. Exchange
    is |days| combiner rows."""

    def to_day(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).to_numpy()
        return pa.table(
            {"day": pa.array((us // 86_400_000_000).astype(np.int64), pa.int64())}
        )

    return pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ds.map_batches(to_day, batch_format="pyarrow"), ["day"], [], count_col="n"
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("day")


def weighted_median(vals: np.ndarray, cnts: np.ndarray) -> float:
    """Interpolated median of a sorted value-count multiset — SQL
    ``quantile_cont(0.5)`` semantics (even n: mean of the two middle
    order statistics). ``vals`` must be ascending."""
    n = int(cnts.sum())
    if n == 0:
        return float("nan")
    cum = np.cumsum(cnts)
    if n % 2 == 1:
        return float(vals[np.searchsorted(cum, n // 2 + 1)])
    lo = float(vals[np.searchsorted(cum, n // 2)])
    hi = float(vals[np.searchsorted(cum, n // 2 + 1)])
    return (lo + hi) / 2.0


def theil_sen_slope(day: np.ndarray, n: np.ndarray) -> tuple[float, int]:
    """Theil–Sen estimator over a (day, count) series: the median of
    all pairwise slopes — the robust trend line for ingest volume. The
    pair set is |days|² on the DRIVER (days are bounded: a decade is
    <4k points → <8M pairs), fed by the distributed daily fold. The
    even-n median is the mean of the two middle order statistics,
    matching the explicit two-row ``avg`` the SQL replay uses."""
    d = day.astype(np.float64)
    y = n.astype(np.float64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = np.sort((y[j] - y[i]) / (d[j] - d[i]))
    m = weighted_median(slopes, np.ones(len(slopes), np.int64))
    return round(m, 6) + 0.0, len(slopes)


def mann_kendall(n: np.ndarray) -> tuple[int, int, float]:
    """Mann–Kendall trend statistic S = Σ sign(x_j − x_i) over ordered
    pairs and Kendall's tau-a = S / C(n,2) — exact integers until the
    single final division. Returns (S, n_pairs, tau)."""
    i, j = np.triu_indices(len(n), k=1)
    s = int(np.sign(n[j] - n[i]).astype(np.int64).sum())
    npairs = len(i)
    tau = float(s) / float(npairs) if npairs else 0.0
    return s, npairs, round(tau, 6) + 0.0


def acf(n: np.ndarray, max_lag: int) -> tuple[np.ndarray, np.ndarray]:
    """Autocorrelation of an integer series at lags 1..max_lag — the
    standard biased estimator r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²,
    expanded to EXACT integer moments (Python bigints; the series is a
    tiny driver-side daily fold) so the hugeint SQL replay hashes
    identically:

        r_k = (n²·P_k − n·S·(A_k+B_k) + (n−k)·S²) / (n·(n·Q − S²))

    with P_k = Σ x_t·x_{t−k}, A_k/B_k the lead/lag partial sums,
    S = Σx, Q = Σx². Each side of the final division is cast to
    float64 BEFORE dividing (hugeint→double then /), matching the SQL.
    Returns (lags, r) for lags 1..min(max_lag, n−1)."""
    x = [int(v) for v in n]
    nn = len(x)
    s = sum(x)
    q = sum(v * v for v in x)
    den = nn * (nn * q - s * s)
    lags, out = [], []
    for k in range(1, min(max_lag, nn - 1) + 1):
        a, b = x[k:], x[:-k]
        p = sum(u * v for u, v in zip(a, b))
        num = nn * nn * p - nn * s * (sum(a) + sum(b)) + (nn - k) * s * s
        lags.append(k)
        out.append(round(float(num) / float(den), 6) + 0.0 if den else 0.0)
    return np.asarray(lags, np.int64), np.asarray(out, np.float64)
