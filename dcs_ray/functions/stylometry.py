"""Corpus stylometry — distributional distances between document
groups: per-language unigram KL divergence (Laplace-smoothed, the
cross-lingual drift monitor of a web crawl) and Burrows' Delta
(Burrows '02), the classic authorship / register distance over the
z-scored relative frequencies of the most frequent words.

Both fold the corpus to VOCABULARY-sized tables (per-group unigram
counts) with map-side combiners before anything leaves the workers —
the exchange is |groups| × |vocab| integers, never tokens. The dense
final formulas run driver-side over those bounded tables, mirrored
verbatim in the SQL oracles (same justification as the reference's
driver-side ranking-data fold, ``cmd/dcs-compute-ranking``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.functions.relational import combiner_groupby
from dcs_ray.tokenize import word_tokens_flat


def _collect(ds: ray.data.Dataset) -> pa.Table | None:
    parts = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(parts) if parts else None


def group_term_counts(
    ds: ray.data.Dataset, group_col: str, text_col: str = "text"
) -> ray.data.Dataset:
    """(group, term, c) unigram counts with map-side combining."""

    def partial(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        g = (
            pa.table(
                {"g": b[group_col].take(pa.array(parents, pa.int64())), "term": flat}
            )
            .group_by(["g", "term"])
            .aggregate([("term", "count")])
        )
        return pa.table(
            {
                "g": g["g"],
                "term": g["term"],
                "c": g["term_count"].cast(pa.int64()),
            }
        )

    return combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["g", "term"], ["c"]
    )


def _pivot(t: pa.Table, groups: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Dense |vocab| × |groups| count matrix from the (g, term, c) fold."""
    vocab = np.unique(np.array(t["term"].to_pylist()))
    mat = np.zeros((len(vocab), len(groups)), dtype=np.int64)
    gcol = np.array(t["g"].to_pylist())
    tcol = np.array(t["term"].to_pylist())
    ccol = t["c"].to_numpy().astype(np.int64)
    gidx = {g: i for i, g in enumerate(groups)}
    rows = np.searchsorted(vocab, tcol)
    cols = np.fromiter((gidx[g] for g in gcol), dtype=np.int64, count=len(gcol))
    mat[rows, cols] = ccol
    return vocab, mat


def lang_kl_matrix(
    ds: ray.data.Dataset, lang_col: str = "lang", text_col: str = "text"
) -> pa.Table:
    """Pairwise KL(P_a ‖ P_b) between per-language unigram distributions
    with add-one smoothing over the GLOBAL vocabulary:

        P_l(t) = (c_{l,t} + 1) / (n_l + |V|)

    Output: (lang_a, lang_b, kl) for every ordered pair a ≠ b, sorted.
    The lang universe comes from the documents table itself so a
    token-less language still appears (as the uniform distribution)."""
    counts = _collect(group_term_counts(ds, lang_col, text_col))
    lang_parts = _collect(
        ds.select_columns([lang_col]).map_batches(
            lambda b: pa.table({"lang": pc.unique(b[lang_col])}),
            batch_format="pyarrow",
        )
    )
    langs = sorted(set(lang_parts["lang"].to_pylist())) if lang_parts is not None else []
    if counts is None or not langs:
        return pa.table(
            {
                "lang_a": pa.array([], pa.string()),
                "lang_b": pa.array([], pa.string()),
                "kl": pa.array([], pa.float64()),
            }
        )
    vocab, mat = _pivot(counts, langs)
    v = len(vocab)
    n_l = mat.sum(axis=0).astype(np.float64)
    p = (mat + 1.0) / (n_l + v)  # |V| × |L|
    out_a, out_b, out_kl = [], [], []
    for i, la in enumerate(langs):
        for j, lb in enumerate(langs):
            if i == j:
                continue
            kl = float(np.sum(p[:, i] * np.log(p[:, i] / p[:, j])))
            out_a.append(la)
            out_b.append(lb)
            out_kl.append(round(kl, 6) + 0.0)
    return pa.table(
        {
            "lang_a": pa.array(out_a, pa.string()),
            "lang_b": pa.array(out_b, pa.string()),
            "kl": pa.array(out_kl, pa.float64()),
        }
    )


def top_corpus_terms(
    ds: ray.data.Dataset, k: int, text_col: str = "text"
) -> list[str]:
    """Top-k corpus terms by count (count desc, term asc): vocabulary-
    keyed combiner then per-block local top-k — the driver merges ≤k
    rows per block (the Zipf-fit fold shape)."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = word_tokens_flat(b[text_col])
        g = pa.table({"term": flat}).group_by(["term"]).aggregate([("term", "count")])
        return pa.table({"term": g["term"], "c": g["term_count"].cast(pa.int64())})

    counts = combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["term"], ["c"]
    )
    order = [("c", "descending"), ("term", "ascending")]
    parts = [
        pa.table(b)
        for b in counts.map_batches(
            lambda t: t.select(["term", "c"]).sort_by(order).slice(0, k),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return []
    top = pa.concat_tables(parts).sort_by(order).slice(0, k)
    return top["term"].to_pylist()


def burrows_delta(
    ds: ray.data.Dataset,
    top_terms: int = 50,
    source_col: str = "source",
    text_col: str = "text",
) -> pa.Table:
    """Burrows' Delta between every source pair: over the ``top_terms``
    most frequent corpus words, z-score each word's per-source relative
    frequency across sources (population σ; zero-variance words drop),
    then Δ(a, b) = mean_t |z_a,t − z_b,t|. Output (source_a, source_b,
    delta) for a < b, sorted. Two corpus passes: the top-term fold, then
    the (source, term ∈ top) counts restricted per batch with ``is_in``
    so the combiner only ever carries |sources| × k rows."""
    top = top_corpus_terms(ds, top_terms, text_col)
    top_set = pa.array(sorted(top), pa.large_string())

    def partial(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        src = b[source_col].take(pa.array(parents, pa.int64()))
        t = pa.table({"g": src, "term": flat})
        # per-source token totals ride along as the reserved '' term
        tot = t.group_by(["g"]).aggregate([("g", "count")])
        keep = pc.is_in(t["term"], value_set=top_set)
        t = t.filter(keep)
        g = t.group_by(["g", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "g": pa.concat_arrays(
                    [g["g"].combine_chunks().cast(pa.large_string()),
                     tot["g"].combine_chunks().cast(pa.large_string())]
                ),
                "term": pa.concat_arrays(
                    [g["term"].combine_chunks().cast(pa.large_string()),
                     pa.array([""] * len(tot), pa.large_string())]
                ),
                "c": pa.concat_arrays(
                    [g["term_count"].cast(pa.int64()).combine_chunks(),
                     tot["g_count"].cast(pa.int64()).combine_chunks()]
                ),
            }
        )

    folded = _collect(
        combiner_groupby(
            ds.map_batches(partial, batch_format="pyarrow"), ["g", "term"], ["c"]
        )
    )
    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "delta": pa.array([], pa.float64()),
        }
    )
    if folded is None or not top:
        return empty
    is_tot = pc.equal(folded["term"], "")
    totals = folded.filter(is_tot)
    counts = folded.filter(pc.invert(is_tot))
    sources = sorted(set(totals["g"].to_pylist()))
    n_s = dict(zip(totals["g"].to_pylist(), totals["c"].to_pylist()))
    term_order = np.array(sorted(top))
    mat = np.zeros((len(term_order), len(sources)), dtype=np.int64)
    gidx = {g: i for i, g in enumerate(sources)}
    rows = np.searchsorted(term_order, np.array(counts["term"].to_pylist()))
    cols = np.fromiter(
        (gidx[g] for g in counts["g"].to_pylist()), dtype=np.int64, count=len(counts)
    )
    mat[rows, cols] = counts["c"].to_numpy().astype(np.int64)
    n_vec = np.array([n_s[s] for s in sources], dtype=np.float64)
    f = mat / n_vec  # |top| × |sources| relative frequencies
    mu = f.mean(axis=1, keepdims=True)
    sd = f.std(axis=1, keepdims=True)  # population σ (ddof=0)
    keep = sd[:, 0] > 0
    z = (f[keep] - mu[keep]) / sd[keep]
    if not keep.any():
        return empty
    out_a, out_b, out_d = [], [], []
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            d = float(np.mean(np.abs(z[:, i] - z[:, j])))
            out_a.append(sa)
            out_b.append(sources[j])
            out_d.append(round(d, 6) + 0.0)
    return pa.table(
        {
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "delta": pa.array(out_d, pa.float64()),
        }
    )
