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


# GPT-2-style pre-tokenizer shape (contractions, words, numbers,
# punctuation runs, whitespace), restricted to ASCII classes so the RE2
# engines in pyarrow and DuckDB agree byte-for-byte — the oracle runs
# the identical pattern through regexp_extract_all
BPE_PRETOKEN_PATTERN = r"'[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, n_bpe_tokens): subword-ish token count via the BPE
    pre-tokenizer regex — one vectorized RE2 count per batch, the usual
    proxy for LLM token budgets over a web corpus."""
    n = pc.count_substring_regex(batch["text"], pattern=BPE_PRETOKEN_PATTERN)
    return pa.table(
        {id_col: batch[id_col], "n_bpe_tokens": n.cast(pa.int64())}
    )


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
# odd multiplier + splitmix64 finalizer constants for the word-wise kernel
_POLY_P = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def fnv1a_bytes_rows(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of each row's UTF-8 bytes.

    Iterates over byte *positions* up to the LONGEST row, so it is only
    for **short strings** (word tokens — where the byte-serial FNV
    definition is what the DuckDB oracle replicates, see
    ``__ray_entry__.oracle_sql``). For documents use
    ``content_hash_rows`` — one 1 MB row would make this kernel run a
    10^6-iteration Python loop for the whole batch."""
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


def content_hash_rows(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized 64-bit content hash of each row's UTF-8 bytes — the
    exact-dedup / shingle key for *documents*.

    Total work is O(total_bytes/8) numpy ops regardless of row-length
    skew: each row's bytes are scattered into an 8-aligned zero-padded
    buffer, viewed as little-endian uint64 words, combined per row as a
    polynomial in an odd 64-bit constant (``np.add.reduceat`` over
    word·P^position contributions), then mixed with the row length and a
    splitmix64-style finalizer (length mixing keeps ``"a"`` and
    ``"a\\x00…"`` distinct despite tail padding). Temp arrays are ~8×
    input bytes — size batches accordingly."""
    from dcs_ray.tokenize import _concat_utf8

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buf, offsets = _concat_utf8(texts)
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, np.uint64)
    lengths = np.diff(offsets)
    nwords = np.maximum((lengths + 7) // 8, 1)  # >=1 word keeps reduceat segments non-empty
    woffs = np.concatenate(([0], np.cumsum(nwords)))
    total_words = int(woffs[-1])
    padded = np.zeros(total_words * 8, dtype=np.uint8)
    if len(buf):
        # per-row constant shift to the 8-aligned destination
        shift = woffs[:-1] * 8 - offsets[:-1]
        dst = np.arange(len(buf), dtype=np.int64) + np.repeat(shift, lengths)
        padded[dst] = buf
    words = padded.view("<u8")
    with np.errstate(over="ignore"):
        maxw = int(nwords.max())
        powers = np.empty(maxw + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        np.cumprod(np.full(maxw, _POLY_P, dtype=np.uint64), out=powers[1:])
        # h(row) = OFF·P^m_row + Σ_j w_j · P^(m_row-1-j)  (mod 2^64) —
        # every term depends only on the row itself, never on batch shape
        pos_in_row = np.arange(total_words, dtype=np.int64) - np.repeat(
            woffs[:-1], nwords
        )
        exp = np.repeat(nwords, nwords) - 1 - pos_in_row
        contrib = words * powers[exp]
        h = np.add.reduceat(contrib, woffs[:-1])
        h += _FNV_OFFSET * powers[nwords]
        h ^= lengths.astype(np.uint64)
        h ^= h >> np.uint64(30)
        h *= _MIX1
        h ^= h >> np.uint64(27)
        h *= _MIX2
        h ^= h >> np.uint64(31)
    return h


_FP_POLY = np.uint64(1099511628211)  # token-fold multiplier (shared with the SQL oracle)


def fingerprint_rows(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Rolling document fingerprint over word tokens:
    ``fp = OFF·P^m + Σ_j fnv1a(token_j)·P^(m-1-j) (mod 2^64)`` — the
    closed form of the left fold ``h = h·P + fnv1a(token)`` starting at
    the FNV offset basis, which is exactly what the DuckDB oracle's
    ``list_reduce`` computes. Token hashing is byte-serial FNV (tokens
    are short); the per-doc fold is vectorized (powers + reduceat),
    never a loop over token positions."""
    flat, parents = word_tokens_flat(texts)
    n = len(texts)
    counts = np.bincount(parents, minlength=n).astype(np.int64)
    th = fnv1a_bytes_rows(flat) if len(flat) else np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        maxm = int(counts.max()) if n else 0
        powers = np.empty(maxm + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if maxm:
            np.cumprod(np.full(maxm, _FP_POLY, dtype=np.uint64), out=powers[1:])
        toffs = np.concatenate(([0], np.cumsum(counts)))
        pos_in_doc = np.arange(len(th), dtype=np.int64) - np.repeat(toffs[:-1], counts)
        exp = np.repeat(counts, counts) - 1 - pos_in_doc
        contrib = th * powers[exp]
        h = np.zeros(n, dtype=np.uint64)
        nonempty = counts > 0
        if len(th):
            sums = np.add.reduceat(contrib, toffs[:-1][nonempty])
            h[nonempty] = sums
        h += _FNV_OFFSET * powers[counts]
    return h


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, fingerprint) — token-rolling fingerprint (``fingerprint_rows``)."""
    h = fingerprint_rows(batch["text"])
    return pa.table(
        {id_col: batch[id_col], "fingerprint": pa.array(h.astype(np.int64), pa.int64())}
    )


def token_counts(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: token_count_batch(b, id_col), batch_format="pyarrow")


def bpe_token_counts(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: bpe_token_count_batch(b, id_col), batch_format="pyarrow")


def quality_scores(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: quality_score_batch(b, id_col), batch_format="pyarrow")


def langid(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: langid_batch(b, id_col), batch_format="pyarrow")


def fingerprints(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(lambda b: fingerprint_batch(b, id_col), batch_format="pyarrow")


class QualityClassifier:
    """Actor-pool model-inference stage: a logistic quality classifier
    over the vectorized text features (the shape of a fastText/LR
    quality filter in web-corpus pipelines).

    The weight vector is "loaded" ONCE per actor in ``__init__`` — the
    slot where a real checkpoint read goes — and ``__call__`` scores a
    whole batch with numpy only. Use as
    ``ds.map_batches(QualityClassifier, concurrency=N, batch_size=B)``.

    Weights are fixed, public constants (not trained here) so the score
    is deterministic and the DuckDB oracle can replay the exact formula:
    ``p = sigmoid(b + w·[ln(1+n_tokens), stopword_ratio,
    mean_token_len])`` with features rounded to 6 digits first (the
    same rounding ``quality_score_batch`` applies)."""

    BIAS = -2.0
    W_LOG_TOKENS = 0.45
    W_STOP_RATIO = 4.0
    W_MEAN_LEN = -0.15
    THRESHOLD = 0.5

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col
        # checkpoint-load slot: one numpy weight vector per actor
        self.w = np.array(
            [self.W_LOG_TOKENS, self.W_STOP_RATIO, self.W_MEAN_LEN], np.float64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = quality_score_batch(batch, self.id_col)
        x = np.stack(
            [
                np.log1p(f["n_tokens"].to_numpy().astype(np.float64)),
                f["stopword_ratio"].to_numpy(),
                f["mean_token_len"].to_numpy(),
            ],
            axis=1,
        )
        z = self.BIAS + x @ self.w
        p = np.round(1.0 / (1.0 + np.exp(-z)), 6)
        return pa.table(
            {
                self.id_col: f[self.id_col],
                "quality_prob": pa.array(p, pa.float64()),
                "keep": pa.array(p >= self.THRESHOLD, pa.bool_()),
            }
        )


def quality_classify(
    ds: ray.data.Dataset, id_col: str = "doc_id", concurrency: int = 2
) -> ray.data.Dataset:
    return ds.map_batches(
        QualityClassifier,
        fn_constructor_kwargs={"id_col": id_col},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def corpus_df(
    ds: ray.data.Dataset, text_col: str = "text", min_df: int = 1
) -> tuple[pa.Array, np.ndarray]:
    """Document frequencies over a corpus → (sorted term array, df array).

    Per-batch partial: distinct (doc, term) pairs collapsed to per-term
    counts (each doc lives wholly inside one batch row, so a batch-local
    distinct is exact); the exchange is vocabulary-sized, never
    corpus-sized — the same two-level shape as the index's corpus-stats
    aggregation (A7, ``index/build.py``). ``min_df`` prunes the hapax
    tail before the result is broadcast: at web scale the hapax terms
    are typos/noise and dominate vocabulary bytes, so callers should
    raise it (documented trade-off, default keeps SQL-oracle parity)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = len(enc.dictionary)
        key = parents.astype(np.int64) * nd + codes
        cnt = np.bincount(np.unique(key) % nd, minlength=nd)
        return pa.table(
            {
                "term": enc.dictionary.cast(pa.string()),
                "df": pa.array(cnt, pa.int64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    agg = pa.concat_tables(parts).group_by("term").aggregate([("df", "sum")])
    order = pc.sort_indices(agg["term"])
    terms = agg["term"].take(order).combine_chunks()
    df = agg["df_sum"].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
    if min_df > 1:
        keep = df >= min_df
        terms = terms.filter(pa.array(keep))
        df = df[keep]
    return terms, df


def tfidf_keywords(
    ds: ray.data.Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """Per-document top-k TF-IDF keywords: ``score = tf · ln(N / df)``,
    ties broken by term ascending (deterministic, SQL-replayable).

    Two corpus passes: (1) :func:`corpus_df` builds the (term, df)
    dictionary — vocabulary-sized, broadcast ONCE via ``ray.put`` and
    probed per batch with an Arrow ``index_in``; (2) a single
    ``map_batches`` computes per-doc tf, scores, and the top-k selection
    fully vectorized (one ``np.unique`` + one ``np.lexsort`` per batch).
    No shuffle: each doc's terms never leave its batch. Callers with a
    transformed input should ``.materialize()`` it first (two consumers).

    Docs with zero tokens emit no rows (matching the SQL inner join).
    The keyword-extraction role of dcs's per-package "what matters in
    this result" summaries, generalized to the classic TF-IDF formula."""
    if n_docs is None:
        n_docs = ds.count()
    terms, df = corpus_df(ds, text_col=text_col, min_df=min_df)
    ref = ray.put((terms, df, float(n_docs)))

    def per_batch(batch: pa.Table) -> pa.Table:
        vocab, dfv, n = ray.get(ref)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tfidf": pa.array([], pa.float64()),
            }
        )
        flat, parents = word_tokens_flat(batch[text_col])
        if len(flat) == 0 or len(vocab) == 0:
            return empty
        codes = (
            pc.index_in(flat, value_set=vocab)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        valid = codes >= 0  # min_df-pruned terms are not keyword-eligible
        if not valid.any():
            return empty
        nv = len(vocab)
        key = parents[valid].astype(np.int64) * nv + codes[valid]
        uk, tf = np.unique(key, return_counts=True)
        upar = (uk // nv).astype(np.int64)
        ucode = (uk % nv).astype(np.int64)
        score = tf.astype(np.float64) * np.log(n / dfv[ucode])
        order = np.lexsort((ucode, -score, upar))
        up_sorted = upar[order]
        starts = np.flatnonzero(np.r_[True, up_sorted[1:] != up_sorted[:-1]])
        run_len = np.diff(np.r_[starts, len(order)])
        rank = np.arange(len(order)) - np.repeat(starts, run_len)
        sel = order[rank < k]  # keeps (doc, rank) order — output is sorted
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)[upar[sel]]
        return pa.table(
            {
                id_col: pa.array(doc_ids.astype(np.int64), pa.int64()),
                "rank": pa.array(rank[rank < k] + 1, pa.int64()),
                "term": vocab.take(pa.array(ucode[sel])),
                "tfidf": pa.array(np.round(score[sel], 6), pa.float64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def cooccur_pmi(
    ds: ray.data.Dataset,
    query_term: str,
    k: int = 20,
    text_col: str = "text",
    min_pair_df: int = 2,
) -> pa.Table:
    """Query-expansion candidates by document-level PMI: the top-``k``
    terms most associated with ``query_term`` across the corpus — the
    "related searches" signal behind web-search term suggestion
    (pointwise mutual information over document co-occurrence,
    Church & Hanks '90).

        pmi(t) = ln( (N · df_qt) / (df_t · df_q) )

    with df_qt = #docs containing both ``query_term`` and ``t``.
    ``min_pair_df`` prunes the unstable low-support tail (PMI's known
    hapax bias). Output: (term, pair_df, pmi) sorted by (pmi desc,
    term asc), pmi rounded to 6 decimals BEFORE the sort so the order
    is SQL-replayable.

    Scale shape: ONE streaming pass; per batch, distinct (doc, term)
    pairs collapse to per-term (df, co_df) partials — the co-counts
    condition on a batch-local "doc contains q" mask (every doc lives
    wholly inside one batch row, the same invariant
    :func:`corpus_df` uses). The exchange is vocabulary-sized partials,
    never corpus-sized; the driver folds term-stat rows only. df_q
    falls out of the aggregate as co_df[query_term] — no second pass."""
    n_docs = ds.count()

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "codf": pa.array([], pa.int64()),
            }
        )
        flat, parents = word_tokens_flat(batch[text_col])
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = len(enc.dictionary)
        # distinct (doc, term) pairs
        key = np.unique(parents.astype(np.int64) * nd + codes)
        upar, ucode = key // nd, key % nd
        df = np.bincount(ucode, minlength=nd)
        # docs (in this batch) containing the query term
        qcode = pc.index_in(
            pa.array([query_term]), value_set=enc.dictionary
        )[0].as_py()
        if qcode is None:
            codf = np.zeros(nd, np.int64)
        else:
            has_q = np.zeros(int(parents.max()) + 1 if len(parents) else 0, bool)
            has_q[upar[ucode == qcode]] = True
            codf = np.bincount(ucode[has_q[upar]], minlength=nd)
        return pa.table(
            {
                "term": enc.dictionary.cast(pa.string()),
                "df": pa.array(df.astype(np.int64), pa.int64()),
                "codf": pa.array(codf.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    out_schema = pa.schema(
        [("term", pa.string()), ("pair_df", pa.int64()), ("pmi", pa.float64())]
    )
    if not parts:
        return out_schema.empty_table()
    agg = (
        pa.concat_tables(parts)
        .group_by("term")
        .aggregate([("df", "sum"), ("codf", "sum")])
    )
    terms = agg["term"].combine_chunks().cast(pa.string())
    df = agg["df_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    codf = agg["codf_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    qi = pc.index_in(pa.array([query_term]), value_set=terms)[0].as_py()
    if qi is None:
        return out_schema.empty_table()
    nq = df[qi]
    keep = (
        (codf >= min_pair_df)
        & (np.arange(len(df)) != qi)
    )
    if not keep.any():
        return out_schema.empty_table()
    pmi = np.round(
        np.log((float(n_docs) * codf[keep]) / (df[keep] * nq)), 6
    )
    kept_terms = terms.filter(pa.array(keep))
    # sort by (pmi desc, term asc) on the ROUNDED value (SQL parity)
    order = pc.sort_indices(
        pa.table({"p": pa.array(pmi), "t": kept_terms}),
        sort_keys=[("p", "descending"), ("t", "ascending")],
    ).to_numpy(zero_copy_only=False)[:k]
    return pa.table(
        {
            "term": kept_terms.take(pa.array(order)),
            "pair_df": pa.array(
                codf[keep][order].astype(np.int64), pa.int64()
            ),
            "pmi": pa.array(pmi[order], pa.float64()),
        }
    )


def _complete_match(
    ds: ray.data.Dataset,
    match_kernel,
    k: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """Shared df-ranked term completion: ``match_kernel(dictionary)``
    → bool mask selects candidate terms per batch vocabulary BEFORE
    the distinct (doc, term) collapse, so the exchange carries only
    matching terms' (term, df) partials — a sliver of the vocabulary,
    not the corpus. Integer counts: exact under any fold order."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        flat, parents = word_tokens_flat(batch[text_col])
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        dict_match = match_kernel(enc.dictionary.cast(pa.string()))
        if not dict_match.any():
            return empty
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = dict_match[codes]
        nd = len(enc.dictionary)
        key = np.unique(parents[keep].astype(np.int64) * nd + codes[keep])
        df = np.bincount(key % nd, minlength=nd)
        sel = np.flatnonzero(dict_match)
        return pa.table(
            {
                "term": enc.dictionary.cast(pa.string()).take(pa.array(sel)),
                "df": pa.array(df[sel].astype(np.int64), pa.int64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    if not parts:
        return out_schema.empty_table()
    agg = pa.concat_tables(parts).group_by("term").aggregate([("df", "sum")])
    if len(agg) == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(
        agg, sort_keys=[("df_sum", "descending"), ("term", "ascending")]
    ).to_numpy(zero_copy_only=False)[:k]
    return pa.table(
        {
            "term": agg["term"].take(pa.array(order)).combine_chunks(),
            "df": agg["df_sum"].take(pa.array(order)).cast(pa.int64()),
        }
    )


def complete_prefix(
    ds: ray.data.Dataset,
    prefix: str,
    k: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """Query autocompletion: the top-``k`` corpus terms starting with
    ``prefix``, ranked by document frequency (df desc, term asc) — the
    search-box suggestion signal. See :func:`_complete_match` for the
    pushed-down-filter scale shape."""
    return _complete_match(
        ds,
        lambda d: pc.starts_with(d, prefix).to_numpy(zero_copy_only=False),
        k,
        text_col,
    )


def complete_suffix(
    ds: ray.data.Dataset,
    suffix: str,
    k: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """Leading-wildcard completion (``*suffix``): the top-``k`` corpus
    terms ENDING with ``suffix``, ranked (df desc, term asc) — the
    reversed-dictionary query every fulltext engine serves next to
    prefix completion. At index scale this probes a REVERSED term
    dictionary with an ordinary prefix pushdown; here the vocabulary
    streams with the ``ends_with`` filter pushed into each batch
    partial (same exchange bound as :func:`complete_prefix`)."""
    return _complete_match(
        ds,
        lambda d: pc.ends_with(d, suffix).to_numpy(zero_copy_only=False),
        k,
        text_col,
    )


def readability_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Flesch-reading-ease-style readability per doc, fully vectorized:
    words = tokenizer tokens, sentences = ``[.!?]+`` runs in the raw
    text (min 1), syllables = ``[aeiou]+`` vowel groups per token
    (min 1/word). ``flesch = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)``
    (Flesch '48 constants); zero-word docs score 0.0. Both regex
    kernels are RE2 (pyarrow here, DuckDB in the oracle)."""
    flat, parents = word_tokens_flat(batch["text"])
    n_rows = len(batch)
    n_words = np.bincount(parents, minlength=n_rows).astype(np.int64)
    if len(flat):
        groups = pc.count_substring_regex(flat, "[aeiou]+").to_numpy(
            zero_copy_only=False
        )
        syl_per_tok = np.maximum(groups, 1)
        n_syl = np.zeros(n_rows, np.int64)
        np.add.at(n_syl, parents, syl_per_tok)
    else:
        n_syl = np.zeros(n_rows, np.int64)
    sent = pc.fill_null(
        pc.count_substring_regex(batch["text"], "[.!?]+"), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_sent = np.maximum(sent, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        flesch = np.where(
            n_words > 0,
            206.835
            - 1.015 * (n_words / n_sent)
            - 84.6 * (n_syl / np.maximum(n_words, 1)),
            0.0,
        )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "n_syllables": pa.array(n_syl, pa.int64()),
            "flesch": pa.array(np.round(flesch, 6), pa.float64()),
        }
    )


def readability(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: readability_batch(b, id_col), batch_format="pyarrow"
    )


def token_entropy_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Shannon entropy of each doc's unigram distribution —
    ``H = −Σ (c/n)·ln(c/n)`` over per-doc term frequencies. Low entropy
    flags repetitive/templated text (the information-theoretic
    companion of the Gopher dup-token fractions); 0.0 for empty docs.
    One dictionary-encode + one lexsort per batch, no exchange."""
    flat, parents = word_tokens_flat(batch["text"])
    n_rows = len(batch)
    n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
    ent = np.zeros(n_rows, np.float64)
    if len(flat):
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, parents))
        p_s, c_s = parents[order], codes[order]
        new = np.concatenate(
            ([True], (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(p_s)))
        run_doc = p_s[starts]
        p = cnt / n_tok[run_doc]
        np.add.at(ent, run_doc, -(p * np.log(p)))
        ent = ent + 0.0  # -0.0 → +0.0 (single-term docs; hash-stable)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "entropy": pa.array(np.round(ent, 6), pa.float64()),
        }
    )


def token_entropy(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: token_entropy_batch(b, id_col), batch_format="pyarrow"
    )


def winnow_fingerprint_batch(
    batch: pa.Table, id_col: str = "doc_id", k: int = 3, w: int = 4
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    '03, the MOSS algorithm): hash every ``k``-gram of word tokens with
    the rolling FNV fold (``h = h·P + fnv1a(token)`` from the offset
    basis — the same fold :func:`fingerprint_rows` uses, so the DuckDB
    oracle replays it), then keep the MINIMUM hash of every window of
    ``w`` consecutive k-grams. The selected set is robust to edits:
    any shared substring of ≥ ``w + k − 1`` tokens guarantees a shared
    fingerprint. Output: one row per doc — ``(id, n_fp, fp_xor)``, the
    distinct-fingerprint count and their XOR (order-free, exact), so
    the gate stays one row per doc however dense the selection is.

    Everything is one numpy pass per batch: token FNV hashes, shifted
    gram folds, a ``w``-ary elementwise minimum for the sliding-window
    min, boundary masks so grams and windows never span documents."""
    from dcs_ray.tokenize import word_tokens_flat

    texts = batch["text"]
    flat, parents = word_tokens_flat(texts)
    n = len(batch)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    th = fnv1a_bytes_rows(flat) if len(flat) else np.empty(0, np.uint64)
    m = len(th)
    n_fp = np.zeros(n, np.int64)
    fp_xor = np.zeros(n, np.uint64)
    ng = m - k + 1
    if ng > 0:
        with np.errstate(over="ignore"):
            gh = np.full(ng, _FNV_OFFSET, np.uint64)
            for j in range(k):
                gh = gh * _FP_POLY + th[j : ng + j]
        gram_ok = parents[:ng] == parents[k - 1 : m]
        nw = ng - w + 1
        if nw > 0:
            wmin = gh[:nw].copy()
            for j in range(1, w):
                np.minimum(wmin, gh[j : nw + j], out=wmin)
            # full window ⇔ first and last gram share a doc
            win_ok = gram_ok[:nw] & (parents[:nw] == parents[w + k - 2 : m])
            doc = parents[:nw][win_ok]
            sel = wmin[win_ok]
            if len(sel):
                po = np.lexsort((sel, doc))
                doc, sel = doc[po], sel[po]
                new = np.empty(len(sel), bool)
                new[0] = True
                new[1:] = (doc[1:] != doc[:-1]) | (sel[1:] != sel[:-1])
                doc, sel = doc[new], sel[new]
                np.add.at(n_fp, doc, 1)
                np.bitwise_xor.at(fp_xor, doc, sel)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_fp": pa.array(n_fp, pa.int64()),
            "fp_xor": pa.array(fp_xor.astype(np.int64), pa.int64()),
        }
    )


def winnow_fingerprints(
    ds: ray.data.Dataset, id_col: str = "doc_id", k: int = 3, w: int = 4
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: winnow_fingerprint_batch(b, id_col, k, w), batch_format="pyarrow"
    )
