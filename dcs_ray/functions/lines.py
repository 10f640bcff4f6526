"""Line/paragraph-structured corpus ops: boilerplate removal and
global paragraph dedup — the CCNet/C4-style cleanup stages a web-text
training pipeline runs before tokenization.

Both operators share one vectorized line layer: ``pc.split_pattern``
explodes the text column into a flat Arrow string array + per-row
offsets (zero Python per line), lines are keyed by the word-wise
``content_hash_rows`` kernel (O(bytes/8)), and surviving lines are
reassembled with ``pa.ListArray.from_arrays`` + ``pc.binary_join`` —
no per-row string joins anywhere.

Scale notes (100 TB):
- ``remove_boilerplate`` is two streaming passes over the input: a
  combiner-style per-batch distinct-(line,doc) count → one small
  ``groupby(key).sum`` → the frequent-line KEY SET (a heavy-hitter
  set, bounded by template lines per source, NOT corpus size) is
  broadcast once via ``ray.put`` and probed with searchsorted.
- ``paragraph_dedup_keep_first`` never broadcasts anything
  corpus-sized: occurrences travel as pure int64 rows (hash, rank),
  winners are chosen per hash-bucket partition, reduced to per-doc
  ordinal lists, and hash-joined back to the docs — three bounded
  exchanges, the honest shape of a global argmin dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dcs_ray.functions.filtering import _mix64
from dcs_ray.functions.textstats import content_hash_rows

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# rank = doc_id * _MAX_LINES + ordinal must fit int64 → doc_id < 2^43,
# lines per doc < 2^20. Raise per deployment if a corpus breaks either.
_MAX_LINES = 1 << 20


def split_lines_flat(
    texts: pa.ChunkedArray | pa.Array, sep: str = "\n"
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Explode a string column into its lines: (flat line array,
    parent-row index per line, per-row line counts)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ls = pc.split_pattern(texts, pattern=sep)
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    flat = ls.flatten()  # offset-safe (unlike .values)
    counts = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(len(ls), dtype=np.int64), counts)
    return flat, row_idx, counts


def _rebuild_texts(
    flat: pa.Array, keep: np.ndarray, counts: np.ndarray, sep: str = "\n"
) -> tuple[pa.Array, np.ndarray]:
    """Reassemble per-row text from the kept lines (vectorized):
    (text array, kept-line count per row)."""
    n = len(counts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    kept_counts = np.bincount(row_idx[keep], minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    kept_flat = flat.filter(pa.array(keep))
    lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_flat)
    return pc.binary_join(lst, sep), kept_counts


def _line_keys(
    flat: pa.Array, src_hash_per_row: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """u64 key per line, scoped by source: mix(line_hash ^ GOLDEN*src)."""
    lh = content_hash_rows(flat)
    sh = np.repeat(src_hash_per_row, counts)
    return _mix64(lh ^ (sh * _GOLDEN))


def boilerplate_frequent_keys(
    ds: ray.data.Dataset,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    sep: str = "\n",
) -> np.ndarray:
    """Sorted u64 keys of lines appearing in ≥ ``min_docs`` distinct
    docs of the SAME source (site templates: menus, footers). Combiner
    shape: each batch emits one (key, distinct-doc count) partial row
    per key it contains; one small groupby sums them. The result is a
    heavy-hitter set — template lines per source — so collecting it on
    the driver is bounded regardless of corpus size."""

    def partial(b: pa.Table) -> pa.Table:
        flat, row_idx, counts = split_lines_flat(b[text_col], sep)
        if len(flat) == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        key = _line_keys(flat, content_hash_rows(b[source_col].combine_chunks()), counts)
        doc = np.repeat(
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64), counts
        )
        # distinct (key, doc) once per batch — a doc's lines never span
        # batches, so per-batch dedup is global dedup
        order = np.lexsort((doc, key))
        k2, d2 = key[order], doc[order]
        first = np.concatenate(
            ([True], (k2[1:] != k2[:-1]) | (d2[1:] != d2[:-1]))
        )
        ku = k2[first]
        uk, cnt = np.unique(ku, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk.view(np.int64), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .sum("cnt")
    )
    out = [np.empty(0, np.uint64)]
    for b in totals.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        c = t["sum(cnt)"].to_numpy(zero_copy_only=False)
        out.append(t["key"].to_numpy(zero_copy_only=False)[c >= min_docs].view(np.uint64))
    return np.sort(np.concatenate(out))


def remove_boilerplate(
    ds: ray.data.Dataset,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    sep: str = "\n",
) -> ray.data.Dataset:
    """Drop every line that appears in ≥ ``min_docs`` docs of the same
    source; returns (id, text, n_removed). The frequent-line key set is
    broadcast once (``ray.put``) and probed per batch with searchsorted
    — the corpus streams through exactly twice (profile + filter)."""
    keys = boilerplate_frequent_keys(ds, min_docs, text_col, id_col, source_col, sep)
    ref = ray.put(keys)

    def probe(b: pa.Table) -> pa.Table:
        flat, _row_idx, counts = split_lines_flat(b[text_col], sep)
        ks = ray.get(ref)
        if len(flat) and len(ks):
            key = _line_keys(
                flat, content_hash_rows(b[source_col].combine_chunks()), counts
            )
            pos = np.minimum(np.searchsorted(ks, key), len(ks) - 1)
            keep = ks[pos] != key
        else:
            keep = np.ones(len(flat), bool)
        text, kept_counts = _rebuild_texts(flat, keep, counts, sep)
        return pa.table(
            {
                id_col: b[id_col],
                "text": text,
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def paragraph_dedup_keep_first(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    n_buckets: int = 128,
) -> ray.data.Dataset:
    """Global paragraph-level dedup, keep-first: a paragraph (``sep``
    segment) survives only at its minimum (doc_id, ordinal) occurrence
    across the whole corpus — the C4/RefinedWeb cross-doc paragraph
    rule. Returns (id, text, n_dropped) with per-doc order preserved.

    Distributed shape (nothing corpus-sized on the driver):
    1. occurrences → pure-int rows (hash, rank=doc·2^20+ord, bucket);
    2. per hash-bucket: one lexsort keep-first-of-run → winner ranks;
    3. winners → per-doc ordinal lists (small groupby);
    4. hash-join lists back to the docs, rebuild text vectorized.
    """

    def occurrences(b: pa.Table) -> pa.Table:
        flat, row_idx, counts = split_lines_flat(b[text_col], sep)
        h = content_hash_rows(flat)
        doc = np.repeat(
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64), counts
        )
        total = len(flat)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ordinal = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        if total and (ordinal.max() >= _MAX_LINES or doc.max() >= (1 << 43)):
            raise ValueError("paragraph_dedup: doc_id/ordinal out of rank range")
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "rank": pa.array(doc * _MAX_LINES + ordinal, pa.int64()),
                "bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def keep_min(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        rank = g["rank"].to_numpy()
        order = np.lexsort((rank, h))
        hs, rs = h[order], rank[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        win = rs[first]
        doc = win // _MAX_LINES
        return pa.table(
            {
                id_col: pa.array(doc, pa.int64()),
                "ord": pa.array(win % _MAX_LINES, pa.int64()),
                # doc-bucket for the NEXT groupby: bounded group count,
                # never one Python group per doc
                "doc_bucket": pa.array(doc % np.int64(n_buckets), pa.int64()),
            }
        )

    def collect_bucket(g: pa.Table) -> pa.Table:
        # per-doc ordinal lists for a whole doc-bucket at once: one
        # lexsort + run-length offsets + Arrow binary_join — zero
        # per-doc Python. Comma-joined strings because Arrow's hash
        # join can't carry list payload columns; the probe side
        # re-splits vectorized.
        ids = g[id_col].to_numpy()
        ords = g["ord"].to_numpy()
        order = np.lexsort((ords, ids))
        ids_s, ords_s = ids[order], ords[order]
        first = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        starts = np.flatnonzero(first)
        offsets = np.concatenate((starts, [len(ids_s)])).astype(np.int64)
        ostr = pc.cast(pa.array(ords_s, pa.int64()), pa.string())
        lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), ostr)
        return pa.table(
            {
                id_col: pa.array(ids_s[starts], pa.int64()),
                "ords": pc.binary_join(lst, ","),
            }
        )

    winners = (
        ds.map_batches(occurrences, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_min, batch_format="pyarrow")
    )
    ordlists = winners.groupby("doc_bucket").map_groups(
        collect_bucket, batch_format="pyarrow"
    )

    from dcs_ray.functions.relational import shuffle_join

    joined = shuffle_join(
        ds.select_columns([id_col, text_col]), ordlists, on=id_col, how="left_outer"
    )

    def rebuild(b: pa.Table) -> pa.Table:
        flat, _row_idx, counts = split_lines_flat(b[text_col], sep)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ol = pc.split_pattern(
            b["ords"].combine_chunks().fill_null(""), pattern=","
        )
        if isinstance(ol, pa.ChunkedArray):
            ol = ol.combine_chunks()
        keep = np.zeros(len(flat), bool)
        if len(flat):
            oflat_s = ol.flatten()
            nonempty = pc.not_equal(oflat_s, "")
            ocounts = pc.list_value_length(ol).to_numpy(zero_copy_only=False)
            oparent = np.repeat(np.arange(len(counts), dtype=np.int64), ocounts)
            ne = nonempty.to_numpy(zero_copy_only=False)
            if ne.any():
                oflat = (
                    pc.cast(oflat_s.filter(nonempty), pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
                keep[starts[oparent[ne]] + oflat] = True
        text, kept_counts = _rebuild_texts(flat, keep, counts, sep)
        return pa.table(
            {
                id_col: b[id_col],
                "text": text,
                "n_dropped": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
