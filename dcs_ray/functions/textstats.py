"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` stages over the ``documents`` /
``pages`` text column — Arrow kernels and numpy only, no per-row Python
in the hot loop (language ID scores via per-language stopword-set
membership over the flattened token array)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.tokenize import word_tokens_flat

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

# tiny per-language function-word lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "it", "that"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "von"},
}


def token_count_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens) per document."""
    flat, parents = word_tokens_flat(batch["text"])
    n = np.bincount(parents, minlength=len(batch)).astype(np.int64)
    return pa.table({id_col: batch[id_col], "n_tokens": pa.array(n, pa.int64())})


def quality_score_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Quality features per doc: token count, stopword count/ratio,
    mean token length — the length/punct/stopword-ratio style heuristics
    used to filter web corpora. Ratios rounded to 6 digits so the SQL
    oracle compares exactly."""
    flat, parents = word_tokens_flat(batch["text"])
    n_rows = len(batch)
    n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(parents[is_stop], minlength=n_rows).astype(np.int64)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_len = np.zeros(n_rows, dtype=np.int64)
    np.add.at(sum_len, parents, tok_len)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
        mean_tok_len = np.where(n_tokens > 0, sum_len / np.maximum(n_tokens, 1), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "stopword_ratio": pa.array(np.round(stop_ratio, 6), pa.float64()),
            "mean_token_len": pa.array(np.round(mean_tok_len, 6), pa.float64()),
        }
    )


def langid_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Heuristic language ID: argmax over per-language function-word hit
    counts (deterministic tie-break by language code)."""
    flat, parents = word_tokens_flat(batch["text"])
    n_rows = len(batch)
    langs = sorted(LANG_MARKERS)
    scores = np.zeros((n_rows, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        hit = pc.is_in(flat, value_set=pa.array(sorted(LANG_MARKERS[lang]))).to_numpy(
            zero_copy_only=False
        )
        scores[:, j] = np.bincount(parents[hit], minlength=n_rows)
    best = np.argmax(scores, axis=1)  # first max wins → deterministic
    top = scores[np.arange(n_rows), best]
    pred = np.where(top > 0, np.array(langs, dtype=object)[best], "unknown")
    return pa.table(
        {
            id_col: batch[id_col],
            "pred_lang": pa.array(pred.tolist(), pa.string()),
            "lang_score": pa.array(top, pa.int64()),
        }
    )


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_bytes_rows(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of each row's UTF-8 bytes
    (document fingerprint; also the exact-dedup key). Iterates over
    byte *positions* (max doc length), vectorized across rows."""
    from dcs_ray.tokenize import _concat_utf8

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buf, offsets = _concat_utf8(texts)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    maxlen = int(lengths.max()) if n else 0
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            mask = lengths > j
            h[mask] = (h[mask] ^ buf[starts[mask] + j].astype(np.uint64)) * _FNV_PRIME
    return h


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, fingerprint) — FNV-1a over the document bytes."""
    h = fnv1a_bytes_rows(batch["text"])
    return pa.table(
        {id_col: batch[id_col], "fingerprint": pa.array(h.astype(np.int64), pa.int64())}
    )


def token_counts(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: token_count_batch(b, id_col), batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: quality_score_batch(b, id_col), batch_format="pyarrow")


def langid(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: langid_batch(b, id_col), batch_format="pyarrow")


def fingerprints(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: fingerprint_batch(b, id_col), batch_format="pyarrow")
