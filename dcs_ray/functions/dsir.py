"""Data Selection with Importance Resampling (DSIR) — the published
hashed-n-gram importance-weighting recipe for choosing pretraining data
that looks like a target corpus (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling").

Shape: two vocabulary-sized bigram count tables (target and raw), each
built with the same two-level combiner as ``lm.train_bigram_counts``
(per-batch ``np.unique`` partials → driver fold), broadcast ONCE via
``ray.put``; then one vectorized ``map_batches`` pass scores every doc's
log importance weight

    lw(doc) = Σ_bg [ ln((c_t(bg)+α)/(N_t+αV)) − ln((c_r(bg)+α)/(N_r+αV)) ]

under add-α smoothing, where V is the raw-table vocabulary size. High
weight = looks like the target distribution. Nothing corpus-sized
crosses an exchange and the corpus text never shuffles.

Scale knob: ``n_buckets`` folds the bigram hashes into a fixed-width
table (the paper's hashed feature space, default 2**16 there) so the
broadcast is O(buckets) no matter the corpus; ``None`` keeps exact raw
64-bit hashes, which is what the DuckDB oracle replays with string
bigrams (the gate doubles as a collision-freeness check at test scale,
same convention as ``decontaminate``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.lm import _token_and_bigram_hashes


def bigram_counts(
    ds: ray.data.Dataset, text_col: str = "text", n_buckets: int | None = None
) -> dict[str, np.ndarray | int]:
    """(sorted bigram-hash array, count array, total) over a corpus —
    vocabulary-sized exchange only."""

    def partial(batch: pa.Table) -> pa.Table:
        _, _, _, bh = _token_and_bigram_hashes(batch[text_col])
        if n_buckets is not None and len(bh):
            bh = bh % np.uint64(n_buckets)
        h, c = np.unique(bh, return_counts=True)
        return pa.table(
            {"h": pa.array(h, pa.uint64()), "c": pa.array(c, pa.int64())}
        )

    hs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not hs:
        return {"h": np.empty(0, np.uint64), "c": np.empty(0, np.int64), "total": 0}
    h = np.concatenate(hs)
    c = np.concatenate(cs)
    hh, inv = np.unique(h, return_inverse=True)
    cc = np.zeros(len(hh), np.int64)
    np.add.at(cc, inv, c)
    return {"h": hh, "c": cc, "total": int(cc.sum())}


def _lookup(table_h: np.ndarray, table_c: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if len(table_h) == 0:
        return np.zeros(len(keys), np.int64)
    idx = np.searchsorted(table_h, keys)
    idx_c = np.minimum(idx, len(table_h) - 1)
    hit = (idx < len(table_h)) & (table_h[idx_c] == keys)
    out = np.zeros(len(keys), np.int64)
    out[hit] = table_c[idx_c[hit]]
    return out


def _score_batch(
    batch: pa.Table,
    target_ref,
    raw_ref,
    alpha: float,
    text_col: str,
    n_buckets: int | None,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_bigrams, rounded log_weight) per row of ``batch``."""
    tgt = ray.get(target_ref)
    raw = ray.get(raw_ref)
    v = float(n_buckets if n_buckets is not None else len(raw["h"]))
    n_rows = len(batch)
    _, _, pp, bh = _token_and_bigram_hashes(batch[text_col])
    if n_buckets is not None and len(bh):
        bh = bh % np.uint64(n_buckets)
    n_bg = np.bincount(pp, minlength=n_rows).astype(np.int64)
    sums = np.zeros(n_rows, np.float64)
    if len(bh):
        ct = _lookup(tgt["h"], tgt["c"], bh)
        cr = _lookup(raw["h"], raw["c"], bh)
        lw = np.log((ct + alpha) / (tgt["total"] + alpha * v)) - np.log(
            (cr + alpha) / (raw["total"] + alpha * v)
        )
        np.add.at(sums, pp, lw)
    return n_bg, np.round(sums, 6)


def dsir_log_weights(
    ds: ray.data.Dataset,
    target_ref,
    raw_ref,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Score every doc's log importance weight against broadcast count
    tables (``ray.put`` handles to :func:`bigram_counts` outputs for the
    target and raw corpora). V = raw-table vocabulary size (the target
    corpus is a subset of raw in the selection setting, so raw's support
    covers the union)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        n_bg, w = _score_batch(batch, target_ref, raw_ref, alpha, text_col, n_buckets)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "log_weight": pa.array(w, pa.float64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def dsir_select(
    ds: ray.data.Dataset,
    target_ds: ray.data.Dataset,
    keep_frac: float = 0.25,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """End-to-end DSIR selection: keep docs whose log_weight >= the
    (1-keep_frac) discrete quantile of all log_weights — ties at the
    cutoff kept, the deterministic SQL-replayable rule (matches DuckDB
    ``quantile_disc``).

    Scale shape: the cutoff comes from the exact distributed value-count
    quantile over the ROUNDED weights (rounding to 1e-6 collapses the
    histogram, ``functions/quantiles.py`` shape); the filter pass then
    RECOMPUTES each batch's weights from the same broadcast count tables
    and filters in place — no weight↔text join, no shuffle, nothing
    corpus-sized on the driver."""
    from dcs_ray.functions.quantiles import group_quantiles

    t_ref = ray.put(bigram_counts(target_ds, text_col, n_buckets))
    r_ref = ray.put(bigram_counts(ds, text_col, n_buckets))
    weights = dsir_log_weights(
        ds, t_ref, r_ref, alpha, id_col, text_col, n_buckets
    ).map_batches(
        lambda b: b.append_column("g", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow",
    )
    cut_rows = pa.concat_tables(
        pa.table(b)
        for b in group_quantiles(
            weights, "g", "log_weight", [1.0 - keep_frac]
        ).iter_batches(batch_format="pyarrow")
    )
    cut = float(cut_rows["value"][0].as_py()) if len(cut_rows) else -np.inf

    # filter pass recomputes weights per batch from the same broadcast
    # tables — no weight↔text join, the corpus streams through once more
    def score_and_keep(batch: pa.Table) -> pa.Table:
        _, w = _score_batch(batch, t_ref, r_ref, alpha, text_col, n_buckets)
        return batch.filter(pa.array(w >= cut))

    return ds.map_batches(score_and_keep, batch_format="pyarrow")
