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


def exact_dedup_rows_keep_min(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Corpus-scale exact dedup that keeps the ENTIRE minimum-id row per
    distinct text — the hash-partitioned route with no driver-side id
    set of any size.

    One exchange: rows are grouped by a coarse bucket of the content
    hash (``hash % n_buckets``), then each bucket runs one vectorized
    keep-first kernel (single lexsort by (hash, id), boolean first-of-run
    mask) — O(buckets) Python calls, never O(distinct texts). Identical
    output set to ``exact_dedup_keep_min`` joined back on id, without
    materializing the kept ids anywhere. Size ``n_buckets`` ≈ a few ×
    cluster cores; per-bucket memory is corpus/n_buckets.
    """

    def hash_batch(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b[text_col])
        return b.append_column(
            "__text_hash", pa.array(h.astype(np.int64), pa.int64())
        ).append_column(
            "__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def keep_min(g: pa.Table) -> pa.Table:
        h = g["__text_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, h))  # within hash: smallest id first
        hs = h[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        return g.take(pa.array(order[first])).drop_columns(["__text_hash", "__bucket"])

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("__bucket").map_groups(keep_min, batch_format="pyarrow")


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
    base = sh % _MERSENNE
    counts = np.diff(offs)
    nonempty = np.flatnonzero(counts > 0)
    seg_starts = offs[:-1][nonempty]
    # per-perm scalar multiply (SIMD; an outer-product broadcast here is
    # ~50× slower in numpy's uint64 loop), then one segmented min per doc
    # (shingles are doc-contiguous) — minimum.reduceat over a contiguous
    # vector replaces minimum.at's unbuffered scatter
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hv = (a[p] * base + b[p]) % _MERSENNE
            sig[nonempty, p] = np.minimum.reduceat(hv, seg_starts)
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


def _pairs_per_band_run(group: pa.Table, id_col: str, max_bucket: int) -> pa.Table:
    """All (id_a < id_b) pairs of docs sharing a band hash, vectorized
    per run-length class over the group's sorted (band_hash, id) rows —
    a group holds MANY band buckets (salted-bucket groupby), so there
    is no per-bucket Python dispatch.

    Buckets larger than ``max_bucket`` emit star pairs to the bucket
    min id instead of the O(b²) clique: a degenerate bucket
    (boilerplate / identical crawls — guaranteed at web scale) stays
    O(b), and as a *dedup cluster* cover the star is equivalently
    connected. Capping is logged so truncation never reads as full
    coverage."""
    bh = group["band_hash"].to_numpy()
    ids = group[id_col].to_numpy().astype(np.int64)
    order = np.lexsort((ids, bh))
    bh, ids = bh[order], ids[order]
    # a doc may repeat inside one bucket (two bands colliding on the
    # same hash) — keep one row per (bucket, id)
    keep = np.ones(len(bh), bool)
    keep[1:] = (bh[1:] != bh[:-1]) | (ids[1:] != ids[:-1])
    bh, ids = bh[keep], ids[keep]
    starts = np.concatenate(([0], np.flatnonzero(bh[1:] != bh[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [len(bh)])))
    out_a, out_b = [], []
    for L in np.unique(lens):
        if L < 2:
            continue
        sel = starts[lens == L]
        M = ids[sel[:, None] + np.arange(L)]  # ids ascending within each run
        if L > max_bucket:
            import logging

            logging.getLogger("dcs_ray.dedup").warning(
                "minhash: %d bucket(s) of size %d capped (max_bucket=%d); "
                "emitting %d star pairs each instead of %d clique pairs",
                len(sel), int(L), max_bucket, int(L) - 1,
                int(L) * (int(L) - 1) // 2,
            )
            out_a.append(np.repeat(M[:, 0], int(L) - 1))
            out_b.append(M[:, 1:].ravel())
        else:
            ia, ib = np.triu_indices(int(L), k=1)
            out_a.append(M[:, ia].ravel())
            out_b.append(M[:, ib].ravel())
    if not out_a:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def minhash_candidate_pairs(
    ds: ray.data.Dataset, num_perm: int = 64, bands: int = 16, id_col: str = "doc_id",
    max_bucket: int = 256, shingle_n: int = 3, seed: int = 7,
    num_buckets: int = 128,
) -> ray.data.Dataset:
    """LSH candidate pairs (id_a < id_b), deduped across bands.

    The groupby key is a SALTED bucket (``band_hash mod num_buckets``),
    not the raw band hash: the exchange then has ``num_buckets`` groups
    instead of one per distinct band hash (millions at web scale), and
    each group's many band buckets are paired in one vectorized
    run-length pass (`_pairs_per_band_run`) with no per-bucket Python
    dispatch. Output is identical to the per-bucket formulation."""
    band_ds = ds.map_batches(
        lambda b: minhash_band_rows(b, num_perm, bands, id_col, shingle_n, seed),
        batch_format="pyarrow",
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        bh = b["band_hash"].to_numpy()
        return b.append_column(
            "bucket", pa.array(bh.view(np.uint64) % np.uint64(num_buckets), pa.int64())
        )

    cand = band_ds.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(
        lambda g: _pairs_per_band_run(g, id_col, max_bucket), batch_format="pyarrow"
    )
    # dedupe pairs discovered via multiple bands
    return cand.groupby(["id_a", "id_b"]).count().select_columns(["id_a", "id_b"])


def jaccard_verify_pairs(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    shingle_n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact shingle-set Jaccard for each candidate (id_a, id_b) pair →
    Dataset[(id_a, id_b, jaccard)] with jaccard >= threshold.

    Shape: the candidate *participant* id set (unique ids appearing in
    any pair — for dedup a small fraction of the corpus) is broadcast
    once with ``ray.put`` and used to semi-filter the docs table, so
    full-corpus text never enters a shuffle. Then a two-stage bucketed
    join: (1) texts meet their pair slots grouped by doc-id bucket,
    (2) both slots of a pair meet grouped by pair bucket, where shingle
    sets, intersections and Jaccard are computed vectorized across ALL
    pairs of the bucket (one lexsort, no per-pair Python). At extreme
    participant counts replace the broadcast with a partitioned
    semi-join keyed on the same bucket hash.
    """
    pair_batches = [pa.table(b) for b in pairs.iter_batches(batch_format="pyarrow")]
    pair_tbl = pa.concat_tables(pair_batches) if pair_batches else None
    if pair_tbl is None or len(pair_tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    pa_ids = pair_tbl["id_a"].to_numpy().astype(np.int64)
    pb_ids = pair_tbl["id_b"].to_numpy().astype(np.int64)
    # canonical unique pairs — the vectorized verify relies on exactly
    # two slot rows per pair
    lo, hi = np.minimum(pa_ids, pb_ids), np.maximum(pa_ids, pb_ids)
    uniq = np.unique(np.stack((lo, hi), axis=1), axis=0)
    pa_ids, pb_ids = uniq[:, 0], uniq[:, 1]
    participants = np.unique(np.concatenate((pa_ids, pb_ids)))
    part_ref = ray.put(participants)

    def msg_rows() -> pa.Table:
        return pa.table(
            {
                "join_key": pa.array(np.concatenate((pa_ids, pb_ids)), pa.int64()),
                "kind": pa.array(
                    np.concatenate(
                        (np.zeros(len(pa_ids), np.int8), np.ones(len(pb_ids), np.int8))
                    ),
                    pa.int8(),
                ),
                "id_a": pa.array(np.concatenate((pa_ids, pa_ids)), pa.int64()),
                "id_b": pa.array(np.concatenate((pb_ids, pb_ids)), pa.int64()),
                "text": pa.array([None] * (2 * len(pa_ids)), pa.string()),
            }
        )

    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        part = ray.get(part_ref)
        pos = np.searchsorted(part, ids)
        pos = np.minimum(pos, len(part) - 1)
        keep = part[pos] == ids
        return pa.table(
            {
                "join_key": pa.array(ids[keep], pa.int64()),
                "kind": pa.array(np.full(int(keep.sum()), -1, np.int8), pa.int8()),
                "id_a": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
                "id_b": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
                "text": b["text"].filter(pa.array(keep)),
            }
        )

    stage1_in = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        ray.data.from_arrow(msg_rows())
    )

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = ids.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(31)
        return (x % np.uint64(num_buckets)).astype(np.int32)

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(bucket_of(b["join_key"].to_numpy()), pa.int32())
        )

    def attach_text(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        keys = g["join_key"].to_numpy()
        is_doc = kind == -1
        doc_keys = keys[is_doc]
        texts = g["text"].filter(pa.array(is_doc))
        order = np.argsort(doc_keys)
        doc_keys_s = doc_keys[order]
        texts_s = texts.combine_chunks().take(pa.array(order))
        m_keys = keys[~is_doc]
        idx = np.searchsorted(doc_keys_s, m_keys)
        # every pair id exists in docs; guard anyway
        idx = np.minimum(idx, max(len(doc_keys_s) - 1, 0))
        found = len(doc_keys_s) > 0 and True
        valid = doc_keys_s[idx] == m_keys if found else np.zeros(len(m_keys), bool)
        sel = np.flatnonzero(~is_doc)[valid]
        return pa.table(
            {
                "id_a": g["id_a"].take(pa.array(sel)),
                "id_b": g["id_b"].take(pa.array(sel)),
                "slot": pa.array(kind[sel], pa.int8()),
                "text": texts_s.take(pa.array(idx[valid])),
            }
        )

    slotted = (
        stage1_in.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_text, batch_format="pyarrow")
    )

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            x = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            x += b["id_b"].to_numpy().astype(np.uint64)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(29)
        return b.append_column(
            "bucket", pa.array((x % np.uint64(num_buckets)).astype(np.int32), pa.int32())
        )

    def verify_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        n = len(g)
        if n == 0:
            return empty
        a = g["id_a"].to_numpy()
        b_ = g["id_b"].to_numpy()
        slot = g["slot"].to_numpy()
        # row order: (pair, slot) so each pair occupies 2 consecutive rows
        order = np.lexsort((slot, b_, a))
        a, b_, slot = a[order], b_[order], slot[order]
        texts = g["text"].combine_chunks().take(pa.array(order))
        sh, offs = _shingle_hashes(texts, shingle_n)
        row_of = np.repeat(np.arange(n), np.diff(offs))
        # dedupe shingles within each row
        o2 = np.lexsort((sh, row_of))
        r2, s2 = row_of[o2], sh[o2]
        keep = np.ones(len(s2), bool)
        keep[1:] = (r2[1:] != r2[:-1]) | (s2[1:] != s2[:-1])
        r2, s2 = r2[keep], s2[keep]
        sizes = np.bincount(r2, minlength=n)
        # pair index of each row: rows come in (slot0, slot1) pairs
        pair_idx_of_row = np.arange(n) // 2
        p3 = pair_idx_of_row[r2]
        # intersections: same (pair, shingle) from both slots ⇒ adjacent
        # after sorting by (pair, shingle) — each appears at most twice
        o3 = np.lexsort((s2, p3))
        p4, s4 = p3[o3], s2[o3]
        dup = (p4[1:] == p4[:-1]) & (s4[1:] == s4[:-1])
        npairs = n // 2
        inter = np.bincount(p4[1:][dup], minlength=npairs)
        szA = sizes[0::2]
        szB = sizes[1::2]
        union = szA + szB - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        sel = j >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[0::2][sel], pa.int64()),
                "id_b": pa.array(b_[0::2][sel], pa.int64()),
                "jaccard": pa.array(j[sel], pa.float64()),
            }
        )

    return (
        slotted.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )


def fuzzy_dedup_keep(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    cc_method: str = "distributed",
) -> ray.data.Dataset:
    """End-to-end fuzzy dedup — the canonical web-corpus pipeline:
    MinHash+LSH candidate pairs → exact-Jaccard verify (≥ threshold) →
    connected components over the verified near-dup graph → keep ONE
    canonical doc (the minimum id) per cluster. Returns the kept ids as
    Dataset[(doc_id,)] (block order unspecified — sort downstream if
    needed).

    Every stage is shuffle-native: LSH banding is a groupby on band
    hashes, verify is a bucketed join over pair participants only, and
    clustering is the alternating-star CC whose rounds shuffle the edge
    set, not the corpus. The only driver-resident state is the near-dup
    pair list and the drop set — both proportional to the duplicate
    count, not corpus size.
    """
    node, comp = _near_dup_label_arrays(
        docs, num_perm, bands, shingle_n, threshold, id_col, cc_method
    )
    # drop set: nodes labeled with a smaller component representative
    return _drop_filtered_ids(docs, node[comp < node], id_col)


def _near_dup_label_arrays(
    docs: ray.data.Dataset,
    num_perm: int,
    bands: int,
    shingle_n: int,
    threshold: float,
    id_col: str,
    cc_method: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared near-dup clustering prefix of every keep policy:
    MinHash+LSH candidates → exact-Jaccard verify → connected
    components, collected as (node, component) int64 arrays
    (duplicate-count-sized driver state)."""
    from dcs_ray.functions.graph import connected_components

    cand = minhash_candidate_pairs(
        docs, num_perm=num_perm, bands=bands, id_col=id_col, shingle_n=shingle_n
    )
    verified = jaccard_verify_pairs(
        docs, cand, shingle_n=shingle_n, threshold=threshold, id_col=id_col
    )
    labels = connected_components(verified, method=cc_method)
    lab_batches = [pa.table(b) for b in labels.iter_batches(batch_format="pyarrow")]
    lab_tbl = pa.concat_tables(lab_batches) if lab_batches else pa.table({})
    if len(lab_tbl):
        return (
            lab_tbl["node"].to_numpy().astype(np.int64),
            lab_tbl["component"].to_numpy().astype(np.int64),
        )
    return np.empty(0, np.int64), np.empty(0, np.int64)


def _drop_filtered_ids(
    docs: ray.data.Dataset, drop: np.ndarray, id_col: str
) -> ray.data.Dataset:
    """Stream the corpus once against a broadcast sorted drop set →
    Dataset[(id_col,)] of survivors (the shared tail of every keep
    policy)."""
    drop_ref = ray.put(np.sort(np.asarray(drop, np.int64)))

    def keep_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        d = ray.get(drop_ref)
        if len(d):
            pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
            keep = d[pos] != ids
        else:
            keep = np.ones(len(ids), bool)
        return pa.table({id_col: pa.array(ids[keep], pa.int64())})

    return docs.map_batches(keep_batch, batch_format="pyarrow")


def fuzzy_dedup_keep_best(
    docs: ray.data.Dataset,
    quality_col: str = "n_chars",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    cc_method: str = "distributed",
) -> ray.data.Dataset:
    """Quality-aware fuzzy dedup: same MinHash+LSH → verify → connected
    components pipeline as :func:`fuzzy_dedup_keep`, but each near-dup
    cluster keeps its BEST member — argmax(``quality_col``), ties to the
    smallest id — instead of the minimum id. This is the production
    web-corpus policy (keep the longest / highest-quality capture of a
    near-duplicate page, not an arbitrary representative).

    Scale shape: identical to ``fuzzy_dedup_keep`` plus ONE extra
    broadcast probe — the cluster-member id set (duplicate-count-sized,
    not corpus-sized) is sent to a filtered ``map_batches`` pass that
    returns (id, quality) for members only; the per-cluster argmax runs
    on that member-sized table driver-side, and the final keep mask is
    the same sorted-drop-set searchsorted probe.

    ``docs`` is consumed four times (pairs, verify, member quality,
    final keep) — pass a materialized Dataset if it is itself a
    computed pipeline; a plain parquet read just re-reads."""
    node, comp = _near_dup_label_arrays(
        docs, num_perm, bands, shingle_n, threshold, id_col, cc_method
    )
    if len(node):
        order = np.argsort(node)
        node, comp = node[order], comp[order]
        node_ref = ray.put(node)

        def member_quality(b: pa.Table, _n=node_ref) -> pa.Table:
            nd = ray.get(_n)
            ids = b[id_col].to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(nd, ids), len(nd) - 1)
            hit = nd[pos] == ids
            return pa.table(
                {
                    id_col: pa.array(ids[hit], pa.int64()),
                    "q": pa.array(
                        b[quality_col].to_numpy().astype(np.float64)[hit], pa.float64()
                    ),
                }
            )

        mq = pa.concat_tables(
            [
                pa.table(b)
                for b in docs.map_batches(member_quality, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        mids = mq[id_col].to_numpy().astype(np.int64)
        mqual = mq["q"].to_numpy()
        mo = np.argsort(mids)
        mids, mqual = mids[mo], mqual[mo]
        qual = mqual[np.searchsorted(mids, node)]  # node is sorted ⊆ mids
        # per-component argmax(quality), tie → min id: sort (comp, -q, id)
        csort = np.lexsort((node, -qual, comp))
        first = np.concatenate(([True], comp[csort][1:] != comp[csort][:-1]))
        best = node[csort][first]
        drop = np.setdiff1d(node, best, assume_unique=False)
    else:
        drop = np.empty(0, np.int64)
    return _drop_filtered_ids(docs, drop, id_col)


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


def _popcount64(x: np.ndarray) -> np.ndarray:
    v = x.copy()
    c = np.zeros(v.shape, dtype=np.int64)
    while True:
        nz = v != 0
        if not nz.any():
            return c
        c += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    bands: int = 4,
    max_bucket: int = 4096,
    mode: str = "exact",
    precomputed: bool = False,
) -> ray.data.Dataset:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ k, found
    WITHOUT an all-pairs compare over the corpus.

    Band the 64-bit signature into ``bands`` equal slices and group by
    each (band, slice-value): two signatures within hamming k < bands
    must agree on ≥ 1 band (pigeonhole), so for the default k=3 / 4×16-bit
    bands the banded probe finds **every** qualifying pair — it is exact,
    not probabilistic. Work is per-bucket quadratic, never corpus-quadratic.

    ``mode="exact"`` emits every qualifying (id_a < id_b, hamming) pair —
    the SQL-oracle semantics; buckets beyond ``max_bucket`` ids are
    truncated with a warning. ``mode="cover"`` is the web-scale shape:
    identical signatures collapse to a min-id representative (a crawl of
    N identical docs costs O(N) star pairs at hamming 0) and only
    distinct signatures pairwise-verify — output is a connected cover of
    the near-dup clusters rather than every clique edge.

    ``precomputed=True`` treats ``ds`` as an existing (id, simhash)
    table instead of computing signatures from ``text``.
    """
    assert max_hamming < bands, "pigeonhole exactness needs k < bands"
    assert 64 % bands == 0
    assert mode in ("exact", "cover")
    width = 64 // bands
    bmask = np.uint64((1 << width) - 1)
    sigs = (
        ds
        if precomputed
        else ds.map_batches(lambda b: simhash_batch(b, id_col), batch_format="pyarrow")
    )

    def band_rows(b: pa.Table) -> pa.Table:
        sig = b["simhash"].to_numpy().astype(np.uint64)
        ids = b[id_col].to_numpy().astype(np.int64)
        keys, out_ids, out_sigs = [], [], []
        for band in range(bands):
            sl = (sig >> np.uint64(band * width)) & bmask
            keys.append((np.int64(band) << np.int64(width)) | sl.astype(np.int64))
            out_ids.append(ids)
            out_sigs.append(sig.astype(np.int64))
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(keys), pa.int64()),
                id_col: pa.array(np.concatenate(out_ids), pa.int64()),
                "simhash": pa.array(np.concatenate(out_sigs), pa.int64()),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy().astype(np.int64)
        sig = group["simhash"].to_numpy().astype(np.uint64)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if len(ids) < 2:
            return empty
        out_a, out_b, out_h = [], [], []
        if mode == "exact":
            if len(ids) > max_bucket:
                import logging

                logging.getLogger("dcs_ray.dedup").warning(
                    "simhash bucket capped: %d ids > %d; comparing first %d by id",
                    len(ids), max_bucket, max_bucket,
                )
                order = np.argsort(ids, kind="stable")[:max_bucket]
                ids, sig = ids[order], sig[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = _popcount64(sig[ia] ^ sig[ib])
            keep = ham <= max_hamming
            if keep.any():
                a, bb = ids[ia[keep]], ids[ib[keep]]
                out_a.append(np.minimum(a, bb))
                out_b.append(np.maximum(a, bb))
                out_h.append(ham[keep])
        else:  # cover: collapse identical signatures to min-id reps
            order = np.lexsort((ids, sig))
            sig_s, ids_s = sig[order], ids[order]
            first = np.concatenate(([True], sig_s[1:] != sig_s[:-1]))
            reps_sig = sig_s[first]
            reps_id = ids_s[first]
            # star pairs only from band 0 so cross-band dedup can't multiply them
            is_first_band = int(group["band_key"][0].as_py()) >> width == 0
            if is_first_band and (~first).any():
                clique_rep = np.repeat(reps_id, np.diff(np.concatenate(
                    (np.flatnonzero(first), [len(sig_s)])
                )))
                members = ids_s[~first]
                out_a.append(np.minimum(clique_rep[~first], members))
                out_b.append(np.maximum(clique_rep[~first], members))
                out_h.append(np.zeros(int((~first).sum()), dtype=np.int64))
            n = len(reps_sig)
            if n > max_bucket:
                import logging

                logging.getLogger("dcs_ray.dedup").warning(
                    "simhash bucket capped: %d distinct sigs > %d; comparing first %d",
                    n, max_bucket, max_bucket,
                )
                reps_sig, reps_id = reps_sig[:max_bucket], reps_id[:max_bucket]
                n = max_bucket
            if n >= 2:
                ia, ib = np.triu_indices(n, k=1)
                ham = _popcount64(reps_sig[ia] ^ reps_sig[ib])
                keep = ham <= max_hamming
                if keep.any():
                    a, bb = reps_id[ia[keep]], reps_id[ib[keep]]
                    out_a.append(np.minimum(a, bb))
                    out_b.append(np.maximum(a, bb))
                    out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    cand = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several bands — keep one row
    return cand.groupby(["id_a", "id_b"]).min("hamming")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted shingle join)
# ---------------------------------------------------------------------------


def _doc_shingle_rows(batch: pa.Table, n: int, id_col: str, num_buckets: int) -> pa.Table:
    """(bucket, shingle, doc_id) rows, one per DISTINCT (doc, shingle).
    A doc's text is one row, so its full shingle set is computed (and
    deduped) inside the batch; ``bucket = shingle % num_buckets`` salts
    the downstream groupby so groups are few and fat (vectorizable)
    instead of one tiny group per distinct shingle."""
    sh, offs = _shingle_hashes(batch["text"], n)
    ids = batch[id_col].to_numpy()
    doc_of = np.repeat(ids, np.diff(offs))
    order = np.lexsort((sh, doc_of))
    sh, doc_of = sh[order], doc_of[order]
    keep = np.ones(len(sh), dtype=bool)
    keep[1:] = (sh[1:] != sh[:-1]) | (doc_of[1:] != doc_of[:-1])
    sh, doc_of = sh[keep], doc_of[keep]
    return pa.table(
        {
            "bucket": pa.array((sh % np.uint64(num_buckets)).astype(np.int32), pa.int32()),
            "shingle": pa.array(sh.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc_of.astype(np.int64), pa.int64()),
        }
    )


def _pairs_per_shingle_run(group: pa.Table, max_df: int | None) -> pa.Table:
    """All (id_a < id_b) pairs of docs sharing a shingle, one row per
    shared shingle, vectorized per run-length class (no per-shingle
    Python loop). ``max_df`` drops shingles present in more docs — the
    prefix-filter-style pruning needed at web scale (a boilerplate
    shingle in 10^6 docs would emit 10^12 pairs); None = exact."""
    sh = group["shingle"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, sh))
    sh, ids = sh[order], ids[order]
    starts = np.concatenate(([0], np.flatnonzero(sh[1:] != sh[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [len(sh)])))
    out_a, out_b = [], []
    dropped = 0
    for L in np.unique(lens):
        if L < 2:
            continue
        if max_df is not None and L > max_df:
            dropped += int((lens == L).sum())
            continue
        sel = starts[lens == L]
        M = ids[sel[:, None] + np.arange(L)]
        ia, ib = np.triu_indices(int(L), k=1)
        out_a.append(M[:, ia].ravel())
        out_b.append(M[:, ib].ravel())
    if dropped:
        import logging

        logging.getLogger("dcs_ray.dedup").warning(
            "ngram_jaccard: dropped %d shingles with df > %d from pair "
            "generation (prefix-filter pruning; intersection counts for "
            "pairs sharing ONLY such shingles are undercounted)",
            dropped, max_df,
        )
    if not out_a:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    shingle_n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    num_buckets: int = 128,
    max_shingle_df: int | None = None,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """EXACT word-n-gram Jaccard near-dup pairs ``(id_a, id_b, jaccard)``
    with ``jaccard >= threshold``, as an inverted shingle join — the
    set-similarity-join shape that scales: pairs are generated ONLY for
    docs sharing at least one shingle (``groupby`` on a salted shingle
    bucket), never an all-pairs scan, and the only wide steps are two
    groupbys on 8-byte keys. Per-doc set sizes are broadcast (``ray.put``)
    into the final scoring stage — at 10^12 docs that lookup becomes a
    partitioned join instead, and ``max_shingle_df`` pruning is mandatory
    (see ``_pairs_per_shingle_run``).

    Shingles are 64-bit hashes of word n-grams (collision-free in
    practice), so results equal string-set Jaccard — the DuckDB oracle
    computes the same ratio over literal n-gram strings.

    ``metric="containment"`` switches the score to max-containment
    |A∩B| / min(|A|, |B|) (Broder '97's resemblance vs containment
    split) — the asymmetric measure that catches a small page embedded
    verbatim inside a larger one, which Jaccard dilutes away; the
    output column is then named ``containment``.
    """
    import ray

    rows = ds.map_batches(
        lambda b: _doc_shingle_rows(b, shingle_n, id_col, num_buckets),
        batch_format="pyarrow",
    )
    pairs = rows.groupby("bucket").map_groups(
        lambda g: _pairs_per_shingle_run(g, max_shingle_df), batch_format="pyarrow"
    )
    inter = pairs.groupby(["id_a", "id_b"]).count()

    # per-doc distinct-shingle counts: small (one int per doc) → broadcast
    def doc_sizes(batch: pa.Table) -> pa.Table:
        sh, offs = _shingle_hashes(batch["text"], shingle_n)
        ids = batch[id_col].to_numpy()
        doc_of = np.repeat(np.arange(len(ids)), np.diff(offs))
        order = np.lexsort((sh, doc_of))
        s2, d2 = sh[order], doc_of[order]
        keep = np.ones(len(s2), dtype=bool)
        keep[1:] = (s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1])
        sizes = np.bincount(d2[keep], minlength=len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "sz": pa.array(sizes.astype(np.int64), pa.int64()),
            }
        )

    sz_tbl = pa.concat_tables(
        ds.map_batches(doc_sizes, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    order = np.argsort(sz_tbl["doc_id"].to_numpy())
    sz_ids = sz_tbl["doc_id"].to_numpy()[order]
    sz_vals = sz_tbl["sz"].to_numpy()[order]
    ref = ray.put((sz_ids, sz_vals))

    def score(batch: pa.Table) -> pa.Table:
        ids_s, vals = ray.get(ref)
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        c = batch["count()"].to_numpy().astype(np.int64)
        sa = vals[np.searchsorted(ids_s, a)]
        sb = vals[np.searchsorted(ids_s, b)]
        if metric == "containment":
            j = c / np.minimum(sa, sb)
        else:
            j = c / (sa + sb - c)
        keep = j >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                ("containment" if metric == "containment" else "jaccard"): pa.array(
                    j[keep], pa.float64()
                ),
            }
        )

    return inter.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (tile-approximated suffix-array dedup)
# ---------------------------------------------------------------------------


def tile_hash_rows(texts: pa.Array | pa.ChunkedArray, tile_bytes: int) -> tuple[
    np.ndarray, np.ndarray
]:
    """Cut every row into non-overlapping ``tile_bytes``-byte tiles and
    hash each tile with the house 64-bit hash (FNV word fold + length
    salt + splitmix64 — bit-identical to ``sketches._hash64_column`` on
    the tile's bytes, so the SQL replay CTEs apply). Returns
    ``(row_of, hashes)`` flat arrays over all tiles of the batch.

    Fully vectorized: one gather builds an (n_tiles, tile_bytes) uint8
    matrix, then ceil(tile_bytes/8) word folds over ALL tiles at once."""
    from dcs_ray.functions.sketches import _splitmix64

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = texts.cast(pa.large_utf8())
    buf = np.frombuffer(arr.buffers()[2] or b"", np.uint8)
    offs = np.frombuffer(arr.buffers()[1], np.int64)[: len(arr) + 1]
    lens = offs[1:] - offs[:-1]
    nt = lens // tile_bytes
    total = int(nt.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    row_of = np.repeat(np.arange(len(arr), dtype=np.int64), nt)
    cum = np.concatenate(([0], np.cumsum(nt)))
    within = np.arange(total, dtype=np.int64) - cum[row_of]
    starts = offs[:-1][row_of] + within * tile_bytes
    mat = buf[starts[:, None] + np.arange(tile_bytes)]
    nwords = -(-tile_bytes // 8)
    pad = nwords * 8 - tile_bytes
    if pad:
        mat = np.concatenate([mat, np.zeros((total, pad), np.uint8)], axis=1)
    mat64 = mat.astype(np.uint64)
    shifts = np.arange(8, dtype=np.uint64) * np.uint64(8)
    out = np.full(total, np.uint64(0xCBF29CE484222325), np.uint64)
    P = np.uint64(0x100000001B3)
    for w in range(nwords):
        word = (mat64[:, 8 * w : 8 * w + 8] << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out = (out ^ word) * P
    out = out + np.uint64(tile_bytes)  # length salt (all tiles full-length)
    return row_of, _splitmix64(out)


def duplicate_tile_spans(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    tile_bytes: int = 32,
    min_count: int = 2,
) -> ray.data.Dataset:
    """Exact duplicated-substring accounting a la Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    tile-approximated: text is cut into non-overlapping
    ``tile_bytes``-byte tiles; a tile position is DUPLICATED when its
    exact bytes occur at >= ``min_count`` tile positions corpus-wide
    (within or across docs). One row per doc:
    ``(doc_id, dup_tiles, total_tiles)`` — filter on
    ``dup_tiles/total_tiles`` to drop boilerplate-heavy docs, or feed a
    span-remover.

    Scale shape: per-batch vectorized tiling + 64-bit tile hash +
    per-batch (hash, doc) combiner, then ONE exchange — a groupby on a
    coarse bucket of the 8-byte hash (tile bytes never shuffle;
    exchange volume is ~corpus/tile_bytes x 24B). Each bucket runs ONE
    lexsort kernel (segment-sum per hash, duplicated-position test,
    per-doc bincount) — O(n_buckets) Python calls, never O(distinct
    tiles). Then a small combiner groupby(doc_id). Per-bucket memory =
    tile rows / n_buckets; size n_buckets to a few x cluster cores.
    The corpus itself is read twice (tiles + totals) but both are
    single column-pruned passes over the source, never a re-shuffle.
    """
    from dcs_ray.functions.relational import combiner_groupby

    n_buckets = 256

    def tiles(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        row_of, h = tile_hash_rows(b[text_col], tile_bytes)
        hs = h.view(np.int64)
        doc = ids[row_of]
        if len(hs) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((doc, hs))
        hs, doc = hs[order], doc[order]
        first = np.concatenate(([True], (hs[1:] != hs[:-1]) | (doc[1:] != doc[:-1])))
        idx = np.flatnonzero(first)
        cnt = np.diff(np.concatenate((idx, [len(hs)])))
        bucket = (hs[idx].view(np.uint64) % np.uint64(n_buckets)).view(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "h": pa.array(hs[idx], pa.int64()),
                id_col: pa.array(doc[idx], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def bucket_mark(g: pa.Table) -> pa.Table:
        """One vectorized kernel per bucket: segment totals per hash,
        duplicated test, per-doc bincount of duplicated positions."""
        hs = g["h"].to_numpy(zero_copy_only=False)
        doc = g[id_col].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "total_tiles": pa.array([], pa.int64()),
                "dup_tiles": pa.array([], pa.int64()),
            }
        )
        if len(hs) == 0:
            return empty
        order = np.argsort(hs, kind="stable")
        hs, doc, cnt = hs[order], doc[order], cnt[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        seg = np.cumsum(first) - 1
        totals_per_h = np.bincount(seg, weights=cnt).astype(np.int64)
        keep = totals_per_h[seg] >= min_count
        if not keep.any():
            return empty
        docs_k, inv = np.unique(doc[keep], return_inverse=True)
        dup = np.bincount(inv, weights=cnt[keep]).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(docs_k, pa.int64()),
                "total_tiles": pa.array(np.zeros(len(docs_k), np.int64), pa.int64()),
                "dup_tiles": pa.array(dup, pa.int64()),
            }
        )

    def totals(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nbytes = pc.binary_length(b[text_col]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "total_tiles": pa.array(
                    (nbytes // tile_bytes).astype(np.int64), pa.int64()
                ),
                "dup_tiles": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            }
        )

    dup = (
        ds.map_batches(tiles, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_mark, batch_format="pyarrow")
    )
    tot = ds.map_batches(totals, batch_format="pyarrow")
    merged = combiner_groupby(
        tot.union(dup), keys=[id_col], sum_cols=["total_tiles", "dup_tiles"]
    )
    return merged.select_columns([id_col, "dup_tiles", "total_tiles"])
