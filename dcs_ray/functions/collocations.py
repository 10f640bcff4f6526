"""Collocation extraction — Dunning's log-likelihood-ratio (G²) test
over consecutive word bigrams (Dunning '93, "Accurate Methods for the
Statistics of Surprise and Coincidence").

Distributed shape: per-batch bigram partial counts → one bigram-keyed
combiner merge; the two unigram marginals (word-as-first, word-as-
second) fold from the bigram table itself with two vocab-keyed
combiners, come back as ``ray.put`` broadcasts, and G² is a vectorized
per-block kernel with a local top-k — the driver merges ≤k rows per
block, never the bigram vocabulary. Extends the reference's per-term
ranking statistics (``cmd/dcs-compute-ranking``) to term PAIRS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.relational import combiner_groupby
from dcs_ray.tokenize import word_tokens_flat


def _xlogx(v: np.ndarray) -> np.ndarray:
    """x·ln(x) with the 0·ln(0)=0 convention (entropy form of G²)."""
    return np.where(v > 0, v * np.log(np.maximum(v, 1.0)), 0.0)


def bigram_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Global counts of consecutive word bigrams (t1, t2, c) — bigrams
    never cross document boundaries (parent-index equality mask)."""

    def partial(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        if len(flat) < 2:
            return pa.table(
                {
                    "t1": pa.array([], pa.large_string()),
                    "t2": pa.array([], pa.large_string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        same_doc = parents[1:] == parents[:-1]
        idx = np.flatnonzero(same_doc)
        t = pa.table(
            {
                "t1": flat.take(pa.array(idx, pa.int64())),
                "t2": flat.take(pa.array(idx + 1, pa.int64())),
            }
        )
        g = t.group_by(["t1", "t2"]).aggregate([("t1", "count")])
        return pa.table(
            {
                "t1": g["t1"],
                "t2": g["t2"],
                "c": g["t1_count"].cast(pa.int64()),
            }
        )

    return combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["t1", "t2"], ["c"]
    )


def _marginal(bg: ray.data.Dataset, key: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Fold one unigram marginal (sum of bigram counts grouped by one
    side) to sorted (terms, counts) plus the grand total N."""
    agg = combiner_groupby(bg.select_columns([key, "c"]), [key], ["c"])
    parts = [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.array([], dtype="U1"), np.array([], dtype=np.int64), 0
    t = pa.concat_tables(parts)
    terms = np.array(t[key].to_pylist())  # U-dtype → C-speed searchsorted
    counts = t["c"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    return terms[order], counts[order], int(counts.sum())


def bigram_llr_topk(
    ds: ray.data.Dataset,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> pa.Table:
    """Top-k collocations by G², ranked on ROUND(g2, 6) with (t1, t2)
    tie-break (the deterministic-gate convention). Contingency per
    bigram (w1, w2) over the population of N consecutive pairs:

        a = c(w1 w2)          b = c(w1 ·) − a
        c = c(· w2) − a       d = N − c(w1 ·) − c(· w2) + a

    G² = 2·(Σ xlogx(cell) − Σ xlogx(margin) + xlogx(N)).
    """
    import ray

    bg = bigram_counts(ds, text_col=text_col).materialize()  # 3 consumers
    t1_terms, t1_counts, n_total = _marginal(bg, "t1")
    t2_terms, t2_counts, _ = _marginal(bg, "t2")
    ref = ray.put((t1_terms, t1_counts, t2_terms, t2_counts, n_total))

    def score_block(b: pa.Table) -> pa.Table:
        m = b["c"].to_numpy() >= min_count
        b = b.filter(pa.array(m))
        if len(b) == 0:
            return pa.table(
                {
                    "t1": pa.array([], pa.large_string()),
                    "t2": pa.array([], pa.large_string()),
                    "cnt": pa.array([], pa.int64()),
                    "g2": pa.array([], pa.float64()),
                }
            )
        m1t, m1c, m2t, m2c, n = ray.get(ref)
        w1 = np.array(b["t1"].to_pylist())
        w2 = np.array(b["t2"].to_pylist())
        a = b["c"].to_numpy().astype(np.float64)
        c1 = m1c[np.searchsorted(m1t, w1)].astype(np.float64)
        c2 = m2c[np.searchsorted(m2t, w2)].astype(np.float64)
        bb = c1 - a
        cc = c2 - a
        dd = float(n) - c1 - c2 + a
        g2 = 2.0 * (
            _xlogx(a)
            + _xlogx(bb)
            + _xlogx(cc)
            + _xlogx(dd)
            - _xlogx(a + bb)
            - _xlogx(cc + dd)
            - _xlogx(a + cc)
            - _xlogx(bb + dd)
            + _xlogx(np.full(len(a), float(n)))
        )
        out = pa.table(
            {
                "t1": b["t1"],
                "t2": b["t2"],
                "cnt": b["c"],
                "g2": pa.array(np.round(g2, 6) + 0.0, pa.float64()),
            }
        )
        return out.sort_by(
            [("g2", "descending"), ("t1", "ascending"), ("t2", "ascending")]
        ).slice(0, k)

    parts = [
        pa.table(b)
        for b in bg.map_batches(score_block, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts) if parts else score_block(
        pa.table(
            {
                "t1": pa.array([], pa.large_string()),
                "t2": pa.array([], pa.large_string()),
                "c": pa.array([], pa.int64()),
            }
        )
    )
    return merged.sort_by(
        [("g2", "descending"), ("t1", "ascending"), ("t2", "ascending")]
    ).slice(0, k)
