"""Self-trained bigram language-model scoring — the CCNet-style
"LM quality filter" shape without an external model: train counts on
the corpus itself (or any reference corpus), broadcast them once, score
every doc's average bigram log-probability in one vectorized pass.

Scale notes (100 TB): the count tables are (u64 hash → count) arrays —
the token/bigram *vocabulary*, not the corpus. A web-scale vocabulary
pruned to the top ~10M entries is a few hundred MB, broadcast once via
``ray.put`` and probed with ``searchsorted`` per batch; pruning rare
tail entries (or swapping in the count-min sketch from
``sketches.py``) bounds it. Nothing here shuffles the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.tokenize import word_tokens_flat


def _token_and_bigram_hashes(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(parents, token_hashes, pair_parents, bigram_hashes) for a batch;
    bigram hashes combine the two token hashes positionally (same
    constants as ``filtering.ngram_hashes``)."""
    from dcs_ray.functions.filtering import _C1, _C2, _mix64
    from dcs_ray.functions.sketches import _hash64_column

    flat, parents = word_tokens_flat(texts)
    th = _hash64_column(flat) if len(flat) else np.empty(0, np.uint64)
    if len(th) < 2:
        return parents, th, np.empty(0, np.int64), np.empty(0, np.uint64)
    acc = th[:-1] * _C1 + th[1:] * _C2
    same = parents[:-1] == parents[1:]
    return parents, th, parents[:-1][same], _mix64(acc[same])


def train_bigram_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> dict[str, np.ndarray]:
    """Global unigram and bigram hash-count tables from a corpus pass:
    per-block partial counts (np.unique per batch) summed on the driver
    — the exchange is vocabulary-sized, never corpus-sized."""

    def partial(batch: pa.Table) -> pa.Table:
        _, th, _, bh = _token_and_bigram_hashes(batch[text_col])
        uh, uc = np.unique(th, return_counts=True)
        bh2, bc = np.unique(bh, return_counts=True)
        kind = np.concatenate([np.zeros(len(uh), np.int8), np.ones(len(bh2), np.int8)])
        return pa.table(
            {
                "kind": pa.array(kind, pa.int8()),
                "h": pa.array(np.concatenate([uh, bh2]), pa.uint64()),
                "c": pa.array(np.concatenate([uc, bc]), pa.int64()),
            }
        )

    uni: dict = {}
    acc_h: list[np.ndarray] = []
    acc_c: list[np.ndarray] = []
    acc_k: list[np.ndarray] = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        acc_k.append(b["kind"].to_numpy(zero_copy_only=False))
        acc_h.append(b["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
        acc_c.append(b["c"].to_numpy(zero_copy_only=False))
    if not acc_h:
        z = np.empty(0, np.uint64)
        return {"uni_h": z, "uni_c": np.empty(0, np.int64), "bg_h": z,
                "bg_c": np.empty(0, np.int64)}
    kind = np.concatenate(acc_k)
    h = np.concatenate(acc_h)
    c = np.concatenate(acc_c)

    def fold(sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        hh, inv = np.unique(h[sel], return_inverse=True)
        cc = np.zeros(len(hh), np.int64)
        np.add.at(cc, inv, c[sel])
        return hh, cc

    uh, uc = fold(kind == 0)
    bh, bc = fold(kind == 1)
    return {"uni_h": uh, "uni_c": uc, "bg_h": bh, "bg_c": bc}


def bigram_lm_scores(
    ds: ray.data.Dataset,
    counts_ref,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Per-doc average bigram log-probability under add-alpha smoothing:
    mean over adjacent in-doc pairs of
    ``ln((c(w1 w2) + alpha) / (c(w1) + alpha * V))`` where V is the
    unigram vocabulary size. ``counts_ref`` is a ``ray.put`` handle to
    :func:`train_bigram_counts` output. Low scores flag gibberish /
    boilerplate — the classic perplexity quality filter."""

    def per_batch(batch: pa.Table) -> pa.Table:
        counts = ray.get(counts_ref)
        vocab = len(counts["uni_h"])
        parents, th, pp, bh = _token_and_bigram_hashes(batch[text_col])
        n_rows = len(batch)
        n_pairs = np.bincount(pp, minlength=n_rows).astype(np.int64)
        sums = np.zeros(n_rows, np.float64)
        if len(bh):
            same = parents[:-1] == parents[1:]
            w1h = th[:-1][same]

            def lookup(table_h, table_c, keys):
                if len(table_h) == 0:  # empty reference corpus → all misses
                    return np.zeros(len(keys), np.int64)
                idx = np.searchsorted(table_h, keys)
                idx_c = np.minimum(idx, len(table_h) - 1)
                hit = (idx < len(table_h)) & (table_h[idx_c] == keys)
                out = np.zeros(len(keys), np.int64)
                out[hit] = table_c[idx_c[hit]]
                return out

            c12 = lookup(counts["bg_h"], counts["bg_c"], bh)
            c1 = lookup(counts["uni_h"], counts["uni_c"], w1h)
            lp = np.log((c12 + alpha) / (c1 + alpha * vocab))
            np.add.at(sums, pp, lp)
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = np.where(n_pairs > 0, sums / np.maximum(n_pairs, 1), 0.0)
        cols = {
            id_col: batch[id_col],
            "n_bigrams": pa.array(n_pairs, pa.int64()),
            "avg_logprob": pa.array(np.round(avg, 6), pa.float64()),
        }
        for c in keep_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def ccnet_perplexity_buckets(
    ds: ray.data.Dataset,
    counts_ref,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> ray.data.Dataset:
    """CCNet-style head/middle/tail split (Wenzek '20): per language,
    rank docs by LM quality (round-6 avg bigram log-prob desc, id asc)
    and cut at exact thirds — bucket = ``(3·(rank-1)) // n``. The
    rank form is deterministic and SQL-replayable; at corpus scale the
    cut switches to per-lang quantile thresholds from the grouped
    histogram sketch (same output contract, documented approximation).
    Docs with no bigrams score 0.0 and rank with everything else (the
    fixed rule, not a special case)."""
    scored = bigram_lm_scores(
        ds, counts_ref, alpha=alpha, id_col=id_col, text_col=text_col,
        keep_cols=(lang_col,),
    )
    names = ("head", "middle", "tail")

    def cut(g: pa.Table) -> pa.Table:
        s = g["avg_logprob"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))  # score desc, id asc
        n = len(g)
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        b = (3 * rank) // max(n, 1)
        return pa.table(
            {
                id_col: g[id_col],
                lang_col: g[lang_col],
                "bucket": pa.array([names[i] for i in b], pa.string()),
            }
        )

    return scored.groupby(lang_col).map_groups(cut, batch_format="pyarrow")
