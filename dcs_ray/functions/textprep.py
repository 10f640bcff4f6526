"""Text preparation operators for LM training pipelines: normalization,
n-gram (bigram) vocabulary counts, and sequence packing.

Scale shapes (100 TB story):
- ``normalize_text``: one vectorized Arrow pass per batch (NFC →
  lower → whitespace collapse → trim); embarrassingly parallel, no
  exchange. Kernels chosen for byte parity with DuckDB/RE2 so the
  oracle compares exact strings.
- ``bigram_counts``: per-batch bigram formation from the flat token
  array (zero-copy slices + one ``binary_join_element_wise``), then a
  map-side value_counts partial so the groupby exchange carries
  |distinct bigrams per batch| rows, never |token pairs|. Top-k cut on
  the driver over the |vocab|-sized aggregate.
- ``pack_sequences_chunked``: GPT-style concat-and-chunk — documents
  are laid head-to-tail per bucket (deterministic ``doc_id %
  num_buckets``) and cut into fixed token-budget sequences. The global
  token offset is an exclusive cumsum per bucket: computed as one
  sorted per-bucket pass inside ``map_groups`` (each group = one
  bucket; buckets bound memory, not the corpus).
- ``pack_sequences_greedy``: first-fit-in-order bin packing per bucket
  (documents never split). The reset-cumsum is sequential by nature;
  implemented as an O(num_sequences · log n) ``searchsorted`` walk
  over the cumsum, not a per-row Python loop.

Reference parity: the reference engine has no packing stage (it indexes
rather than trains), but its per-source grouping discipline
(internal/index write path) is the same bucket-then-local-order shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.tokenize import word_tokens_flat

from .relational import combiner_groupby

WHITESPACE_RUN = r"\s+"


def _nfc(texts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """NFC-compose a string column. Pure-ASCII batches (the common web
    case after lang filtering) are NFC by definition — returned as-is,
    zero work. Non-ASCII batches go through unicodedata per row:
    pyarrow's ``utf8_normalize`` DECOMPOSES regardless of the requested
    form (observed on 16.1), so it cannot produce composed NFC."""
    import unicodedata

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buf = texts.cast(pa.large_utf8()).buffers()[2]
    if buf is None or np.frombuffer(buf, np.uint8).max(initial=0) < 128:
        return texts
    return pa.array(
        [None if s is None else unicodedata.normalize("NFC", s) for s in texts.to_pylist()],
        pa.string(),
    )


def normalize_text_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, norm_text): NFC-normalize, lowercase, collapse whitespace
    runs to single spaces, trim. Arrow kernels throughout except the
    non-ASCII NFC slow path (see ``_nfc``); RE2 regex is
    byte-compatible with the DuckDB oracle's regexp_replace."""
    t = _nfc(batch[text_col])
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, pattern=WHITESPACE_RUN, replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({id_col: batch[id_col], "norm_text": t})


def normalize_text(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: normalize_text_batch(b, id_col, text_col),
        batch_format="pyarrow",
    )


def bigram_counts_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-batch partial: (bigram, n) value counts of adjacent token
    pairs within each document. Token pairs never cross documents."""
    flat, parents = word_tokens_flat(batch[text_col])
    if len(flat) < 2:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    same_doc = parents[1:] == parents[:-1]
    idx = np.flatnonzero(same_doc)
    first = flat.take(pa.array(idx))
    second = flat.take(pa.array(idx + 1))
    bigrams = pc.binary_join_element_wise(first, second, " ")
    vc = pa.table({"bigram": bigrams}).group_by(["bigram"]).aggregate(
        [("bigram", "count")]
    )
    return pa.table(
        {"bigram": vc["bigram"], "n": vc["bigram_count"].cast(pa.int64())}
    )


def bigram_counts(
    ds: ray.data.Dataset, text_col: str = "text", k: int | None = None
):
    """Exact bigram counts over the corpus. With ``k``: top-k (count
    desc, bigram asc) as a pa.Table — each aggregate block is cut to
    its local top-k first, so the driver merges |blocks|·k rows, never
    the vocabulary (bigram vocabs run to billions at web scale).
    Without ``k``: the full aggregate as a streaming Dataset (write it
    out, don't collect it)."""
    agg = combiner_groupby(
        ds.map_batches(
            lambda b: bigram_counts_batch(b, text_col), batch_format="pyarrow"
        ),
        ["bigram"],
        ["n"],
    ).map_batches(
        lambda b: b.select(["bigram", "n"]), batch_format="pyarrow"
    )
    if k is None:
        return agg

    def block_topk(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("bigram", "ascending")]
        )[: min(k, len(b))]
        return b.take(order)

    tables = [
        pa.table(b)
        for b in agg.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not tables or sum(len(t) for t in tables) == 0:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(tables)
    order = pc.sort_indices(
        t, sort_keys=[("n", "descending"), ("bigram", "ascending")]
    )[: min(k, len(t))]
    return t.take(order)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def _token_counts_batch(
    batch: pa.Table, id_col: str, text_col: str, num_buckets: int
) -> pa.Table:
    flat, parents = word_tokens_flat(batch[text_col])
    n = np.bincount(parents, minlength=len(batch)).astype(np.int64)
    ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n, pa.int64()),
            "bucket": pa.array(ids % num_buckets, pa.int64()),
        }
    )


def pack_sequences_chunked(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Concat-and-chunk packing (the GPT-pretraining layout): within
    each deterministic bucket (``id % num_buckets``), documents are
    laid head-to-tail in id order and cut into ``budget``-token
    sequences. Returns (id, bucket, n_tokens, seq_id, seq_offset):
    ``seq_id`` = which sequence the document STARTS in (bucket-local),
    ``seq_offset`` = token offset within it. A document may span
    sequences — that is the semantics of this layout.

    Exchange: one groupby on ``bucket`` over (id, n_tokens) rows —
    3 ints/doc, never text. Each group sorts its own bucket only.
    """
    counts = ds.map_batches(
        lambda b: _token_counts_batch(b, id_col, text_col, num_buckets),
        batch_format="pyarrow",
    )

    def chunk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(order)
        n = g["n_tokens"].to_numpy()
        prior = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                id_col: g[id_col],
                "bucket": g["bucket"],
                "n_tokens": g["n_tokens"],
                "seq_id": pa.array(prior // budget, pa.int64()),
                "seq_offset": pa.array(prior % budget, pa.int64()),
            }
        )

    return counts.groupby("bucket").map_groups(chunk, batch_format="pyarrow")


def greedy_boundaries(n_tokens: np.ndarray, budget: int) -> np.ndarray:
    """First-fit-in-order sequence ids for per-doc token counts: a new
    sequence starts when the accumulated count is positive and adding
    the next document would exceed ``budget``; oversized documents
    occupy a sequence alone. Walks sequence boundaries with
    searchsorted — O(num_seqs · log n).

    Matches the per-doc state machine ``if acc and acc + x > budget:
    new sequence`` exactly, including zero-token docs: a window whose
    accumulated weight is still zero absorbs the doc that overflowed it
    (acc==0 never splits), and docs after an oversize split because
    acc already exceeds the budget."""
    n = np.asarray(n_tokens, np.int64)
    cum = np.cumsum(n)
    seq = np.empty(len(n), np.int64)
    start, sid = 0, 0
    while start < len(n):
        base = cum[start - 1] if start else 0
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end == start:  # single doc larger than budget
            end = start + 1
        elif end < len(n) and cum[end - 1] == base:
            # window is all zero-weight so far: acc==0, the next doc
            # joins regardless of size
            end += 1
        seq[start:end] = sid
        sid += 1
        start = end
    return seq


def pack_sequences_greedy(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """First-fit bin packing per bucket (documents never split).
    Returns (id, bucket, n_tokens, seq_id) with seq_id bucket-local.
    Same tiny (id, n_tokens) exchange as the chunked variant."""
    counts = ds.map_batches(
        lambda b: _token_counts_batch(b, id_col, text_col, num_buckets),
        batch_format="pyarrow",
    )

    def pack(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(order)
        seq = greedy_boundaries(g["n_tokens"].to_numpy(), budget)
        return pa.table(
            {
                id_col: g[id_col],
                "bucket": g["bucket"],
                "n_tokens": g["n_tokens"],
                "seq_id": pa.array(seq, pa.int64()),
            }
        )

    return counts.groupby("bucket").map_groups(pack, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    chunk_tokens: int,
    stride_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Split every document into token windows of ``chunk_tokens`` with
    step ``stride_tokens`` (default = no overlap) — the
    context-window / RAG chunking step. Returns
    ``(id, chunk_id, start_token, n_chunk_tokens, chunk_text)`` where
    ``chunk_text`` is the window's tokens joined by single spaces
    (tokenizer-normalized text, byte-comparable to a SQL list-slice
    oracle).

    Fully per-batch: token offsets via one tokenize pass, window
    expansion via run-length arange, text materialization via one
    ``take`` + Arrow ``binary_join``. No exchange; a doc's chunks are
    emitted by the batch that holds it. Requires
    ``stride_tokens <= chunk_tokens`` (no gaps)."""
    stride = chunk_tokens if stride_tokens is None else stride_tokens
    assert 0 < stride <= chunk_tokens, "stride must be in (0, chunk_tokens]"

    def per_batch(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        n_rows = len(b)
        n = np.bincount(parents, minlength=n_rows).astype(np.int64)
        doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))
        n_chunks = np.where(n > 0, 1 + (-(-np.maximum(n - chunk_tokens, 0) // stride)), 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "chunk_id": pa.array([], pa.int64()),
                    "start_token": pa.array([], pa.int64()),
                    "n_chunk_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        row = np.repeat(np.arange(n_rows), n_chunks)
        starts_of_run = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        cid = np.arange(total) - starts_of_run
        st = cid * stride
        en = np.minimum(st + chunk_tokens, n[row])
        lens = en - st
        # gather token indices for every chunk window
        tok_total = int(lens.sum())
        run_start = np.repeat(doc_start[row] + st, lens)
        within = np.arange(tok_total) - np.repeat(np.cumsum(lens) - lens, lens)
        tok_idx = run_start + within
        toks = flat.take(pa.array(tok_idx, pa.int64()))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int64), pa.int64()
        )
        # large_list: chunk token totals in a batch can pass 2^31 at
        # production block sizes
        lists = pa.LargeListArray.from_arrays(offsets, toks)
        text = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: b[id_col].take(pa.array(row, pa.int64())),
                "chunk_id": pa.array(cid, pa.int64()),
                "start_token": pa.array(st, pa.int64()),
                "n_chunk_tokens": pa.array(lens, pa.int64()),
                "chunk_text": text,
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def next_word_suggest(
    ds: ray.data.Dataset, word: str, k: int = 5, text_col: str = "text"
) -> pa.Table:
    """Query suggestion: the top-``k`` continuations of ``word`` by
    corpus bigram frequency → ``(next_word, n)`` ranked (n desc, word
    asc) — the "searches related to" affordance, served straight from
    the distributed bigram counts.

    Scale shape: the ``word``-prefix filter runs INSIDE each batch's
    bigram partial, so the exchange carries only bigrams starting with
    the query word (vocabulary-of-one-row scale), never the corpus
    bigram vocabulary."""
    pref = word + " "

    def partial(b: pa.Table) -> pa.Table:
        t = bigram_counts_batch(b, text_col)
        return t.filter(pc.starts_with(t["bigram"], pref))

    agg = combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["bigram"], ["n"]
    )
    parts = [
        pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")
    ]
    t = (
        pa.concat_tables(parts).select(["bigram", "n"])
        if parts
        else pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    )
    t = t.sort_by([("n", "descending"), ("bigram", "ascending")]).slice(0, k)
    nxt = pc.utf8_slice_codeunits(t["bigram"], len(pref))
    return pa.table({"next_word": nxt, "n": t["n"]})


def chunk_dedup_stats(
    chunks: ray.data.Dataset,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Cross-document CHUNK-level exact dedup — the line/paragraph
    dedup step of CCNet/RefinedWeb-style curation lifted to token
    windows: a chunk survives iff it is the lexicographically first
    ``(doc_id, chunk_id)`` occurrence of its exact text in the whole
    corpus. Input is ``chunk_documents`` output; returns per-doc
    ``(doc_id, n_chunks, n_kept, kept_tokens)``.

    Shape: chunk texts hash per batch (``content_hash_rows`` — text
    never crosses the exchange twice), ONE groupby on the 64-bit hash
    whose group fold emits only the surviving row (min of the packed
    ``doc_id·2^20 + chunk_id`` key — integer-lexicographic), then a
    per-doc integer aggregate joined with the total chunk counts."""
    import pyarrow.compute as pc

    from dcs_ray.functions.textstats import content_hash_rows

    def with_hash(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b["chunk_text"])
        packed = (
            b[id_col].to_numpy().astype(np.int64) * 1048576
            + b["chunk_id"].to_numpy().astype(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "packed": pa.array(packed, pa.int64()),
                "n_tok": b["n_chunk_tokens"],
            }
        )

    hashed = chunks.map_batches(with_hash, batch_format="pyarrow")
    return _chunk_survivor_stats(hashed, chunks, id_col)


def _chunk_survivor_stats(
    hashed: ray.data.Dataset, chunk_rows: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """Shared survivor fold of every chunk-level dedup (fixed-window
    ``chunk_dedup_stats`` and content-defined ``cdc_chunk_stats``):
    ``hashed`` rows are ``(h, packed = id·2^20 + chunk_idx, n_tok)``;
    the minimum ``packed`` per hash survives; ``chunk_rows`` (one row
    per chunk carrying ``id_col``) supplies the per-doc totals. Both
    aggregates are doc-scale; the fold is a sorted merge."""

    def keep_first(g: pa.Table) -> pa.Table:
        packed = g["packed"].combine_chunks().to_numpy(zero_copy_only=False)
        i = int(np.argmin(packed))
        return pa.table(
            {
                id_col: pa.array([int(packed[i]) // 1048576], pa.int64()),
                "n_tok": pa.array([int(g["n_tok"][i].as_py())], pa.int64()),
            }
        )

    kept = hashed.groupby("h").map_groups(keep_first, batch_format="pyarrow")
    kept_stats = kept.groupby(id_col).aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Sum("n_tok")
    )
    totals = chunk_rows.groupby(id_col).count()
    kt = pa.concat_tables(
        [pa.table(b) for b in kept_stats.iter_batches(batch_format="pyarrow")]
    ).sort_by(id_col)
    tt = pa.concat_tables(
        [pa.table(b) for b in totals.iter_batches(batch_format="pyarrow")]
    ).sort_by(id_col)
    t_ids = tt[id_col].to_numpy().astype(np.int64)
    t_cnt = tt["count()"].to_numpy().astype(np.int64)
    k_ids = kt[id_col].to_numpy().astype(np.int64)
    k_cnt = kt["count()"].to_numpy().astype(np.int64)
    k_tok = kt["sum(n_tok)"].to_numpy().astype(np.int64)
    pos = np.searchsorted(t_ids, k_ids)
    n_kept = np.zeros(len(t_ids), np.int64)
    kept_tokens = np.zeros(len(t_ids), np.int64)
    n_kept[pos] = k_cnt
    kept_tokens[pos] = k_tok
    out = pa.table(
        {
            id_col: pa.array(t_ids, pa.int64()),
            "n_chunks": pa.array(t_cnt, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "kept_tokens": pa.array(kept_tokens, pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def cdc_chunk_stats(
    docs: ray.data.Dataset,
    mask_bits: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Content-defined chunking dedup (the LBFS/FastCDC idea at token
    granularity): a token ENDS a chunk iff ``hash64(token) ≡ 0 mod
    2^mask_bits`` (expected chunk length 2^mask_bits tokens) or the doc
    ends. Unlike :func:`chunk_documents`' fixed windows, boundaries are
    functions of CONTENT — inserting a sentence shifts every fixed
    window after it, but content-defined boundaries resynchronize at
    the next boundary token, so the chunks downstream of an edit still
    dedup against the original (why backup/storage dedup uses CDC).

    Chunk identity is a position-salted commutative fold,
    ``Σ splitmix64(h_tok + offset_in_chunk) mod 2^64`` — order-aware
    (the offset salt), segment-summable with ``np.add.reduceat`` (no
    per-chunk Python, no chunk-text materialization: token hashes never
    leave the batch as strings), and integer-replayable in SQL. First
    occurrence (min ``doc_id·2^20 + chunk_idx``) survives; output is
    per-doc ``(doc_id, n_chunks, n_kept, kept_tokens)`` (docs with zero
    tokens emit nothing, same as the tokenizer).

    Scale shape: one corpus pass emits chunk-sized integer rows; ONE
    groupby on the 64-bit chunk hash picks survivors; the per-doc
    aggregates are doc-scale. Nothing corpus-sized reaches the driver.
    """
    from dcs_ray.functions.sketches import _hash64_column, _splitmix64

    mask = np.uint64((1 << mask_bits) - 1)

    def chunkify(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        n = len(flat)
        if n == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "packed": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                }
            )
        ids = b[id_col].to_numpy().astype(np.int64)
        h = _hash64_column(flat)
        bnd = (h & mask) == np.uint64(0)
        doc_start = np.empty(n, bool)
        doc_start[0] = True
        doc_start[1:] = parents[1:] != parents[:-1]
        prev_bnd = np.empty(n, bool)
        prev_bnd[0] = False
        prev_bnd[1:] = bnd[:-1]
        start = doc_start | prev_bnd
        cid = np.cumsum(start) - 1  # global chunk id within batch
        starts_idx = np.flatnonzero(start)
        offset = (np.arange(n, dtype=np.int64) - starts_idx[cid]).astype(np.uint64)
        mixed = _splitmix64(h + offset)  # u64 adds wrap mod 2^64
        chunk_h = np.add.reduceat(mixed, starts_idx)
        chunk_len = np.diff(np.append(starts_idx, n)).astype(np.int64)
        # chunk index within its doc: distance to the doc's first chunk
        nc = len(starts_idx)
        chunk_is_doc_first = doc_start[starts_idx]
        first_of_doc = np.maximum.accumulate(
            np.where(chunk_is_doc_first, np.arange(nc), -1)
        )
        chunk_idx = np.arange(nc) - first_of_doc
        chunk_doc = ids[parents[starts_idx]]
        packed = chunk_doc * 1048576 + chunk_idx
        return pa.table(
            {
                "h": pa.array(chunk_h, pa.uint64()),
                "packed": pa.array(packed, pa.int64()),
                "n_tok": pa.array(chunk_len, pa.int64()),
                id_col: pa.array(chunk_doc, pa.int64()),
            }
        )

    chunks = docs.map_batches(chunkify, batch_format="pyarrow")
    # consumed by two aggregates in the shared tail; pinned so the
    # tokenize pass runs once (chunk rows are 32-byte integers ≈
    # bytes/500 of the text — spilling them is cheaper than
    # re-tokenizing the corpus)
    chunks = chunks.materialize()
    return _chunk_survivor_stats(chunks, chunks, id_col)
