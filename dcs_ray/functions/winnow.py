"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD '03 — the MOSS local fingerprinting algorithm).

Every length-k character gram is hashed; within each sliding window of
w consecutive gram hashes the minimum is selected (ties to the
RIGHTMOST occurrence — a deterministic simplification of the paper's
robust rule), and selected
positions are deduplicated. The guarantee: any shared substring of
length ≥ w+k−1 between two documents yields at least one shared
fingerprint, with expected density 2/(w+1) — the third near-dup family
next to MinHash (set resemblance) and SimHash (vector angle), and the
one built for PARTIAL overlap detection (plagiarism / quotation /
mirror fragments).

Gram hashes reuse the engine's canonical string hash
(``sketches._hash64_column`` chain: little-endian byte word folded
FNV-style, length salt, GOLDEN-add splitmix64), computed here directly
on the concatenated UTF-8 byte buffer so a batch needs ONE gather per
byte lane — no per-gram Python strings. ASCII corpora only (the SQL
replay indexes characters; multi-byte text would diverge)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.sketches import _splitmix64

_H0 = np.uint64(0xCBF29CE484222325)
_P = np.uint64(0x100000001B3)


def _gram_hashes(buf: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """Hash k-byte grams at ``starts`` in ``buf`` with the canonical
    string-hash chain (k ≤ 8: one little-endian word)."""
    w0 = np.zeros(len(starts), np.uint64)
    for i in range(k):
        w0 |= buf[starts + i].astype(np.uint64) << np.uint64(8 * i)
    with np.errstate(over="ignore"):
        h = (_H0 ^ w0) * _P
        h = h + np.uint64(k)
    return _splitmix64(h)


def winnowing_fingerprint_counts(
    docs: ray.data.Dataset,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc count of winnowing-selected fingerprint positions →
    (doc_id, n_fingerprints). One vectorized pass per batch: byte
    concat, one hash per gram, a w-lane running min with rightmost
    ties, boundary-safe per doc; no shuffle."""
    from dcs_ray.tokenize import _concat_utf8

    def f(b: pa.Table) -> pa.Table:
        buf, offsets = _concat_utf8(b[text_col].combine_chunks())
        n = len(b)
        lens = np.diff(offsets)
        n_grams = np.maximum(lens - (k - 1), 0)
        n_wins = np.maximum(n_grams - (w - 1), 0)
        total_g = int(n_grams.sum())
        counts = np.zeros(n, np.int64)
        if total_g:
            doc_of_g = np.repeat(np.arange(n), n_grams)
            g0 = np.repeat(offsets[:-1], n_grams)
            within = np.arange(total_g) - np.repeat(
                np.concatenate(([0], np.cumsum(n_grams)[:-1])), n_grams
            )
            h = _gram_hashes(buf, (g0 + within).astype(np.int64), k)
            # windows: starts s where s+w-1 stays inside the same doc
            total_w = int(n_wins.sum())
            if total_w:
                wstart = np.repeat(
                    np.concatenate(([0], np.cumsum(n_grams)[:-1])), n_wins
                ) + (
                    np.arange(total_w)
                    - np.repeat(np.concatenate(([0], np.cumsum(n_wins)[:-1])), n_wins)
                )
                # rightmost argmin over the w lanes
                best_v = h[wstart]
                best_p = wstart.copy()
                for j in range(1, w):
                    vj = h[wstart + j]
                    take = vj <= best_v  # <= → later (rightmost) wins
                    best_v = np.where(take, vj, best_v)
                    best_p = np.where(take, wstart + j, best_p)
                sel = np.unique(best_p)  # dedup selected positions
                counts = np.bincount(doc_of_g[sel], minlength=n)
        return pa.table(
            {
                id_col: b[id_col],
                "n_fingerprints": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
