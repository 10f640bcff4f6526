"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (100 TB story):
- exact: per-batch 64-bit content hash (vectorized FNV-1a) → hash-partition
  ``groupby(hash)`` → keep min doc_id per group. The only wide step is a
  groupby on a 8-byte key — the classic exact-dedup recipe.
- MinHash+LSH: per-batch shingle→minhash signature (numpy, vectorized over
  a flattened shingle-hash array) → explode to (band_hash, doc_id) rows →
  ``groupby(band_hash)`` emits candidate pairs only inside buckets —
  no O(n²) compare. Exact-Jaccard verify runs per candidate pair.
- SimHash: 64-bit signature per doc; duplicates = equal signatures (or
  banded for hamming<=k) → same groupby pattern.
- embedding near-dup: cosine against bucketed neighbors (see simsearch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.textstats import content_hash_rows, fnv1a_bytes_rows
from dcs_ray.tokenize import word_tokens_flat

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_keep_min(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the minimum id per distinct text (hash-partition + per-group
    min — D4's recipe with content hash as the key)."""

    def hash_batch(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b["text"]).astype(np.int64)
        return pa.table({"text_hash": pa.array(h, pa.int64()), id_col: b[id_col]})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").min(id_col)


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per doc: hashes of word n-gram shingles. Returns (flat hashes,
    doc offsets). Vectorized: tokens hashed individually (FNV over the
    flat token array), shingle hash = polynomial combination of n
    consecutive token hashes."""
    flat, parents = word_tokens_flat(texts)
    ntexts = len(texts)
    tok_h = content_hash_rows(flat) if len(flat) else np.empty(0, np.uint64)
    counts = np.bincount(parents, minlength=ntexts)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # shingle windows within each doc
    if len(tok_h) == 0:
        return np.empty(0, np.uint64), np.zeros(ntexts + 1, np.int64)
    with np.errstate(over="ignore"):
        acc = tok_h.copy()
        for j in range(1, n):
            shifted = np.empty_like(tok_h)
            shifted[: len(tok_h) - j] = tok_h[j:]
            shifted[len(tok_h) - j :] = 0
            acc = acc * np.uint64(1099511628211) + shifted
    # window starting at i valid iff i+n <= doc_end
    doc_idx = parents  # parents is sorted
    w = np.arange(len(tok_h))
    doc_end = offsets[1:][doc_idx]
    valid = w + n <= doc_end
    sh = acc[valid]
    sh_doc = doc_idx[valid]
    sh_counts = np.bincount(sh_doc, minlength=ntexts)
    sh_offsets = np.concatenate(([0], np.cumsum(sh_counts)))
    return sh, sh_offsets


def minhash_signatures(
    texts, num_perm: int = 64, shingle_n: int = 3, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix, vectorized:
    signature[p] = min over shingles of (a_p * h + b_p mod 2^61-1)."""
    sh, offs = _shingle_hashes(texts, shingle_n)
    ntexts = len(offs) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    sig = np.full((ntexts, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    doc_of = np.repeat(np.arange(ntexts), np.diff(offs))
    base = sh % _MERSENNE
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hv = (a[p] * base + b[p]) % _MERSENNE
            np.minimum.at(sig[:, p], doc_of, hv)
    return sig


def minhash_band_rows(
    batch: pa.Table, num_perm: int = 64, bands: int = 16, id_col: str = "doc_id",
    shingle_n: int = 3, seed: int = 7,
) -> pa.Table:
    """Explode each doc into LSH band rows: (band_hash i64, id). Docs
    agreeing on any band land in the same groupby bucket."""
    sig = minhash_signatures(batch["text"], num_perm, shingle_n, seed)
    rows_per_band = num_perm // bands
    ids = batch[id_col].to_numpy()
    out_hash, out_id = [], []
    with np.errstate(over="ignore"):
        for bnd in range(bands):
            chunk = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = np.full(len(ids), np.uint64(1469598103934665603), dtype=np.uint64)
            for c in range(rows_per_band):
                h = (h ^ chunk[:, c]) * np.uint64(1099511628211)
            h = (h ^ np.uint64(bnd)) * np.uint64(1099511628211)
            out_hash.append(h.astype(np.int64))
            out_id.append(ids)
    return pa.table(
        {
            "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
            id_col: pa.array(np.concatenate(out_id)),
        }
    )


def minhash_candidate_pairs(
    ds: ray.data.Dataset, num_perm: int = 64, bands: int = 16, id_col: str = "doc_id",
) -> ray.data.Dataset:
    """LSH candidate pairs (id_a < id_b), deduped across bands."""
    band_ds = ds.map_batches(
        lambda b: minhash_band_rows(b, num_perm, bands, id_col), batch_format="pyarrow"
    )

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy())
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[ia].astype(np.int64), pa.int64()),
                "id_b": pa.array(ids[ib].astype(np.int64), pa.int64()),
            }
        )

    cand = band_ds.groupby("band_hash").map_groups(pairs, batch_format="pyarrow")
    # dedupe pairs discovered via multiple bands
    return cand.groupby(["id_a", "id_b"]).count().select_columns(["id_a", "id_b"])


def exact_jaccard(text_a: str, text_b: str, shingle_n: int = 3) -> float:
    """Exact shingle-set Jaccard (verify stage for LSH candidates)."""
    sh_a, off_a = _shingle_hashes(pa.array([text_a]), shingle_n)
    sh_b, off_b = _shingle_hashes(pa.array([text_b]), shingle_n)
    A, B = set(sh_a.tolist()), set(sh_b.tolist())
    if not A and not B:
        return 1.0
    return len(A & B) / len(A | B)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash per doc over token hashes: bit b of the signature is
    the sign of sum over tokens of (+1 if token_hash bit b else -1).
    Token hashing stays byte-serial FNV-1a (tokens are short) because the
    DuckDB oracle replicates that exact definition per token."""
    flat, parents = word_tokens_flat(batch["text"])
    n = len(batch)
    acc = np.zeros((n, 64), dtype=np.int64)
    if len(flat):
        th = fnv1a_bytes_rows(flat)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1
        np.add.at(acc, parents, bits)
    sig = (acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
    ids = batch[id_col]
    return pa.table({id_col: ids, "simhash": pa.array(sig.astype(np.int64), pa.int64())})


def simhash_duplicates(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Groups of docs sharing a SimHash signature (near-dup clusters)."""
    import pyarrow.compute as pc

    sigs = ds.map_batches(lambda b: simhash_batch(b, id_col), batch_format="pyarrow")
    agg = sigs.groupby("simhash").count()
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b["count()"], 1)), batch_format="pyarrow"
    )
