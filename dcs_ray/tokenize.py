"""Tokenizers: word-token mode (BM25) and trigram mode (dcs-faithful).

Word mode defines a term as a maximal run of ``[a-z0-9]`` in the
lowercased text — chosen to be expressible identically in DuckDB
(``regexp_split_to_array(lower(text), '[^a-z0-9]+')``) so the oracle gate
can verify tf/df/BM25 exactly.

Trigram mode reproduces dcs's tokenizer semantics (reference
``internal/index/write.go:170-219``): a rolling 3-byte window over the
UTF-8 bytes of the document, each trigram packed as
``t0<<16 | t1<<8 | t2`` (``internal/index/types.go:7``), with the
indexability heuristics of ``write.go:138-213``: size < 3 or > 1 GiB
rejected, any line longer than 2000 bytes rejected, > 20000 distinct
trigrams rejected. (Invalid-UTF-8 rejection is structural here: Arrow
strings are valid UTF-8 by construction.)

Everything is vectorized: Arrow compute kernels for the word path, one
numpy pass over a concatenated byte buffer for the trigram path. No
Python loop over rows in either.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WORD_SPLIT_PATTERN = "[^a-z0-9]+"

# dcs indexability limits, internal/index/write.go:138-147,163-213
MAX_FILE_BYTES = 1 << 30
MIN_FILE_BYTES = 3
MAX_LINE_BYTES = 2000
MAX_DISTINCT_TRIGRAMS = 20000
# the all-spaces trigram dropped from positional sections ("   "),
# internal/index/write.go:346,403 — hottest term in the corpus
SPACES_TRIGRAM = 0x202020


# ---------------------------------------------------------------------------
# word tokenizer (BM25 mode)
# ---------------------------------------------------------------------------


# byte lookup tables for the ASCII fast path: lowercase map + token-class
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A") : ord("Z") + 1] += 32
_ISTOK_LUT = np.zeros(256, dtype=bool)
for _c in range(ord("a"), ord("z") + 1):
    _ISTOK_LUT[_c] = _ISTOK_LUT[_c - 32] = True
for _c in range(ord("0"), ord("9") + 1):
    _ISTOK_LUT[_c] = True


def _word_tokens_flat_ascii(
    buf: np.ndarray, offsets: np.ndarray
) -> tuple[pa.Array, np.ndarray]:
    """Byte-level tokenizer for pure-ASCII batches: lowercase LUT + token
    run boundaries, one numpy pass — ~4× less work than the RE2 split and
    byte-identical output on ASCII (the only case it is used for)."""
    if len(buf) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    m = _ISTOK_LUT[buf]
    prev = np.empty_like(m)
    prev[0] = False
    prev[1:] = m[:-1]
    nxt = np.empty_like(m)
    nxt[-1] = False
    nxt[:-1] = m[1:]
    # token runs never span documents
    doc_starts = offsets[:-1][offsets[:-1] < len(buf)]
    prev[doc_starts] = False
    doc_lasts = offsets[1:] - 1
    doc_lasts = doc_lasts[(doc_lasts >= 0) & (doc_lasts < len(buf))]
    nxt[doc_lasts] = False
    starts = np.flatnonzero(m & ~prev)
    ends = np.flatnonzero(m & ~nxt) + 1
    lengths = ends - starts
    parents = np.searchsorted(offsets, starts, side="right") - 1
    # token bytes in order == all token-class bytes in order: one masked
    # extraction, no per-token index arithmetic
    values = _LOWER_LUT[buf[m]]
    tok_offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    flat = pa.Array.from_buffers(
        pa.large_string(),
        len(starts),
        [None, pa.py_buffer(tok_offsets.tobytes()), pa.py_buffer(values.tobytes())],
    ).cast(pa.string())
    return flat, parents


def word_tokens_flat(texts: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a column of texts → (flat token array, parent row indices).

    Pure-ASCII batches (the overwhelming case for web text after lang
    filtering) take the byte-LUT fast path; any non-ASCII byte falls back
    to the Arrow ``utf8_lower`` + RE2 split, whose Unicode lowercasing the
    fast path cannot reproduce (e.g. U+212A lowercases into ASCII 'k')."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buf, offsets = _concat_utf8(texts)
    if len(buf) == 0 or int(buf.max()) < 128:
        return _word_tokens_flat_ascii(buf, offsets)
    lowered = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lowered, WORD_SPLIT_PATTERN)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep), parents[keep_np]


def tokenize_batch_words(
    texts: pa.ChunkedArray | pa.Array, doc_ids: np.ndarray
) -> tuple[pa.Table, pa.Table]:
    """Tokenize one batch of docs in word mode.

    Returns ``(postings, doc_lens)``:
    - postings: Arrow table ``(term: string, doc_id: uint64, tf: uint32)``
    - doc_lens: Arrow table ``(doc_id: uint64, doc_len: uint32)``
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    flat, parents = word_tokens_flat(texts)
    n_docs = len(doc_ids)
    doc_len = np.bincount(parents, minlength=n_docs).astype(np.uint32)
    tok_tbl = pa.table(
        {"term": flat, "doc_id": pa.array(doc_ids[parents], type=pa.uint64())}
    )
    grouped = tok_tbl.group_by(["term", "doc_id"]).aggregate([("doc_id", "count")])
    postings = pa.table(
        {
            "term": grouped["term"],
            "doc_id": grouped["doc_id"],
            "tf": grouped["doc_id_count"].cast(pa.uint32()),
        }
    )
    doc_lens = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.uint64()),
            "doc_len": pa.array(doc_len, type=pa.uint32()),
        }
    )
    return postings, doc_lens


def tokenize_batch_words_grouped(
    texts: pa.ChunkedArray | pa.Array, doc_ids: np.ndarray
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize one partition of docs straight to term-grouped postings.

    Returns ``(uniq_terms_sorted, group_offsets, p_doc, p_tf, doc_len)``
    where term t's postings are ``p_doc[group_offsets[t]:group_offsets[t+1]]``
    (doc ids ascending) with parallel tf counts.

    Memory-lean hot path: terms are dictionary-encoded ONCE, then all
    grouping/sorting happens on packed int64 keys (term_rank·n_docs +
    doc_rank) with numpy — the only string operation is one sort of the
    *unique* terms. Replaces an Arrow string group_by + string sort of
    the full posting stream, which saturates memory bandwidth at high
    task concurrency (measured 2.3× per-task CPU inflation at 32 procs).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    n_docs = len(doc_ids)
    flat, parents = word_tokens_flat(texts)
    doc_len = np.bincount(parents, minlength=n_docs).astype(np.uint32)
    if len(flat) == 0:
        return (
            pa.array([], pa.string()),
            np.zeros(1, dtype=np.int64),
            np.empty(0, np.uint64),
            np.empty(0, np.uint64),
            doc_len,
        )
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    dict_arr = enc.dictionary
    n_terms = len(dict_arr)
    sort_idx = pc.sort_indices(dict_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(n_terms, dtype=np.int64)
    rank[sort_idx] = np.arange(n_terms)
    # doc_ids ascend within the partition, so parent row order == doc order
    key = rank[codes] * n_docs + parents
    # value sort (not argsort): stability is meaningless for values, and
    # the default introsort is measurably faster + less bandwidth-hungry
    # than mergesort on this 10^6-element hot path
    key.sort()
    boundaries = np.concatenate(([0], np.flatnonzero(key[1:] != key[:-1]) + 1))
    pair_key = key[boundaries]
    p_tf = np.diff(np.concatenate((boundaries, [len(key)]))).astype(np.uint64)
    term_of_pair = pair_key // n_docs
    p_doc = doc_ids[pair_key % n_docs]
    tb = np.flatnonzero(term_of_pair[1:] != term_of_pair[:-1]) + 1
    group_offsets = np.concatenate(([0], tb, [len(pair_key)])).astype(np.int64)
    uniq_terms = dict_arr.take(pa.array(sort_idx))
    return uniq_terms, group_offsets, p_doc, p_tf, doc_len


def tokenize_query_words(query: str) -> list[str]:
    """Tokenize a query string the same way documents are tokenized,
    deduplicated, order of first appearance."""
    import re

    seen: dict[str, None] = {}
    for tok in re.split(WORD_SPLIT_PATTERN, query.lower()):
        if tok:
            seen.setdefault(tok, None)
    return list(seen)


# ---------------------------------------------------------------------------
# trigram tokenizer (dcs mode)
# ---------------------------------------------------------------------------


def indexable_mask(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """dcs text-file heuristics F2 (``write.go:138-147,163-213``):
    size in [3, 1 GiB], no line > 2000 bytes. Vectorized."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    nbytes = pc.binary_length(texts.cast(pa.large_binary())).to_numpy(zero_copy_only=False)
    ok = (nbytes >= MIN_FILE_BYTES) & (nbytes <= MAX_FILE_BYTES)
    # longest line per doc: split on \n, max element length
    lines = pc.split_pattern(texts, "\n")
    line_lens = pc.binary_length(pc.list_flatten(lines).cast(pa.large_binary()))
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    ll = line_lens.to_numpy(zero_copy_only=False)
    max_line = np.zeros(len(texts), dtype=np.int64)
    if len(ll):
        np.maximum.at(max_line, parents, ll)
    return ok & (max_line <= MAX_LINE_BYTES)


def _concat_utf8(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate all docs' UTF-8 bytes → (byte buffer, doc offsets).
    Null rows are treated as empty documents (web corpora always carry
    some; a null's length would otherwise poison the offset arithmetic)."""
    if texts.null_count:
        texts = texts.fill_null("")
    arr = texts.cast(pa.large_binary())
    combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    lengths = pc.binary_length(combined).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    # zero-copy view of the values buffer of the large_binary array
    data_buf = combined.buffers()[2]
    if data_buf is None:
        return np.empty(0, np.uint8), offsets
    buf = np.frombuffer(data_buf, dtype=np.uint8)
    raw_off = np.frombuffer(combined.buffers()[1], dtype=np.int64)
    start = combined.offset
    return buf[raw_off[start] : raw_off[start + len(combined)]], offsets


def trigram_tokens(
    texts: pa.ChunkedArray | pa.Array, doc_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract positional trigrams for a batch of docs, vectorized.

    Returns ``(trigram u32, doc_id u64, position u32)`` sorted by
    (doc order, position). Docs failing the indexability heuristics or
    exceeding MAX_DISTINCT_TRIGRAMS contribute nothing, mirroring
    ``write.go:149-220``.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    ok = indexable_mask(texts)
    buf, offsets = _concat_utf8(texts)
    total = len(buf)
    if total < 3:
        e = np.empty(0, dtype=np.uint32)
        return e, np.empty(0, dtype=np.uint64), e
    tri = (
        buf[:-2].astype(np.uint32) << 16
        | buf[1:-1].astype(np.uint32) << 8
        | buf[2:].astype(np.uint32)
    )
    # window start index w belongs to doc d iff offsets[d] <= w <= offsets[d+1]-3
    w = np.arange(total - 2, dtype=np.int64)
    doc_idx = np.searchsorted(offsets, w, side="right") - 1
    pos = w - offsets[doc_idx]
    doc_end = offsets[doc_idx + 1]
    valid = (w + 3 <= doc_end) & ok[doc_idx]
    tri, doc_idx, pos = tri[valid], doc_idx[valid], pos[valid]
    # distinct-trigram cap per doc (write.go:213: > 20000 distinct → skip doc)
    if len(tri):
        key = doc_idx.astype(np.uint64) << np.uint64(24) | tri.astype(np.uint64)
        uniq_keys = np.unique(key)
        distinct_per_doc = np.bincount(
            (uniq_keys >> np.uint64(24)).astype(np.int64), minlength=len(doc_ids)
        )
        keep_doc = distinct_per_doc <= MAX_DISTINCT_TRIGRAMS
        m = keep_doc[doc_idx]
        tri, doc_idx, pos = tri[m], doc_idx[m], pos[m]
    return tri.astype(np.uint32), doc_ids[doc_idx], pos.astype(np.uint32)


def string_trigrams(s: str | bytes) -> list[int]:
    """Trigrams of a literal query string, in order (may repeat)."""
    b = s.encode() if isinstance(s, str) else s
    return [(b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(len(b) - 2)]
