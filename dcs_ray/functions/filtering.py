"""Corpus-hygiene operators for web-scale training-data pipelines:
benchmark decontamination, PII redaction, and token-repetition stats.

These are the web-corpus analogues of the reference's candidate
filtering (Debian/dcs `internal/sourcebackend/sourcebackend.go`
FilterByKeywords: drop files the query must not see before ranking) —
here the "query" is a training run and the things that must not leak in
are benchmark n-grams, personal data, and degenerate repetition.

Scale notes (100 TB):
- Decontamination broadcasts the benchmark n-gram *hash set* once via
  ``ray.put`` (benchmark suites are MBs, corpora are TBs) and every
  batch does a vectorized ``searchsorted`` membership probe — no
  shuffle, no join, the corpus streams through untouched.
- PII scrubbing is a stateless ``map_batches`` over Arrow string
  kernels (``replace_substring_regex`` — RE2, the same engine DuckDB
  uses, which is what lets the oracle compare byte-for-byte).
- Repetition stats are per-doc only: dictionary-encode the flat token
  array, ``np.unique`` over (row, code) pairs — O(tokens log tokens)
  per batch, no cross-batch state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dcs_ray.tokenize import word_tokens_flat

# Odd multipliers for position-wise trigram combination (splitmix64
# constants); distinct per slot so "a b c" != "c b a".
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def ngram_hashes(
    texts: pa.ChunkedArray | pa.Array, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """(parent_row, u64 hash) for every word n-gram of every row,
    vectorized: hash each token once, then combine ``n`` consecutive
    token hashes where all belong to the same row."""
    from dcs_ray.functions.sketches import _hash64_column

    flat, parents = word_tokens_flat(texts)
    if len(flat) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = _hash64_column(flat)
    consts = (_C1, _C2, _C3)
    m = len(th) - n + 1
    acc = np.zeros(m, np.uint64)
    for j in range(n):
        acc += th[j : j + m] * consts[j % 3] ** np.uint64(j // 3 + 1)
    same_row = parents[:m] == parents[n - 1 :]
    return parents[:m][same_row], _mix64(acc[same_row])


def benchmark_ngram_set(ds: ray.data.Dataset, n: int = 3) -> np.ndarray:
    """Distinct n-gram hashes of a *benchmark* dataset (the held-out
    eval suites a training corpus must not contain). Benchmarks are
    small by construction — per-block distinct sets are unioned on the
    driver; the result is a sorted u64 array ready for ``ray.put``."""

    def per_block(batch: pa.Table) -> pa.Table:
        _, h = ngram_hashes(batch["text"], n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = ds.map_batches(per_block, batch_format="pyarrow")
    out: list[np.ndarray] = [np.empty(0, np.uint64)]
    for b in parts.iter_batches(batch_format="pyarrow"):
        out.append(b["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
    return np.unique(np.concatenate(out))


def decontaminate(
    ds: ray.data.Dataset,
    bench_hashes_ref,
    n: int = 3,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc contamination count against a broadcast benchmark n-gram
    set: ``(id, n_contaminated, contaminated)`` where ``n_contaminated``
    is the number of DISTINCT doc n-grams that appear in the benchmark.

    ``bench_hashes_ref`` is a ``ray.put`` handle to the sorted u64 hash
    array from :func:`benchmark_ngram_set` — fetched once per worker
    from the object store, never re-shipped per batch.
    """

    def per_batch(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_hashes_ref)
        parents, h = ngram_hashes(batch["text"], n)
        n_rows = len(batch)
        counts = np.zeros(n_rows, np.int64)
        if len(h) and len(bench):
            # distinct (row, ngram) pairs, then membership probe
            order = np.lexsort((h, parents))
            ps, hs = parents[order], h[order]
            first = np.ones(len(hs), bool)
            first[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
            ps, hs = ps[first], hs[first]
            idx = np.searchsorted(bench, hs)
            hit = (idx < len(bench)) & (bench[np.minimum(idx, len(bench) - 1)] == hs)
            np.add.at(counts, ps[hit], 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_contaminated": pa.array(counts, pa.int64()),
                "contaminated": pa.array(counts > 0, pa.bool_()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


# RE2 syntax (shared verbatim by pyarrow and the DuckDB oracle).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"


def pii_scrub_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Redact emails then phone-like digit runs, counting each; all
    Arrow RE2 kernels so the DuckDB ``regexp_replace(..., 'g')`` oracle
    matches byte-for-byte."""
    text = batch[text_col]
    n_emails = pc.count_substring_regex(text, EMAIL_RE)
    text = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    n_phones = pc.count_substring_regex(text, PHONE_RE)
    text = pc.replace_substring_regex(text, PHONE_RE, "<PHONE>")
    return pa.table(
        {
            id_col: batch[id_col],
            text_col: text,
            "n_emails": n_emails.cast(pa.int64()),
            "n_phones": n_phones.cast(pa.int64()),
        }
    )


def pii_scrub(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: pii_scrub_batch(b, id_col, text_col), batch_format="pyarrow"
    )


def repetition_stats_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Gopher/C4-style repetition signals per doc: token count, distinct
    token count, duplicate-token fraction (1 - distinct/total) and
    top-token fraction (most frequent token / total)."""
    flat, parents = word_tokens_flat(batch["text"])
    n_rows = len(batch)
    n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    dcodes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
    key = parents.astype(np.uint64) << np.uint64(32) | dcodes.astype(np.uint64)
    uniq, counts = np.unique(key, return_counts=True)
    urow = (uniq >> np.uint64(32)).astype(np.int64)
    n_distinct = np.bincount(urow, minlength=n_rows).astype(np.int64)
    max_c = np.zeros(n_rows, np.int64)
    np.maximum.at(max_c, urow, counts)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = np.maximum(n_tokens, 1)
        dup_frac = np.where(n_tokens > 0, 1.0 - n_distinct / denom, 0.0)
        top_frac = np.where(n_tokens > 0, max_c / denom, 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
            "dup_token_frac": pa.array(np.round(dup_frac, 6), pa.float64()),
            "top_token_frac": pa.array(np.round(top_frac, 6), pa.float64()),
        }
    )


def repetition_stats(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, id_col), batch_format="pyarrow"
    )


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """The MassiveText/Gopher quality-rule set (Rae et al. '21 §A1.1),
    per doc, every threshold as an INTEGER cross-multiplication so the
    SQL replay is bit-exact:

    1. 50 ≤ word count ≤ 100,000 (whitespace words)
    2. 3 ≤ mean word length ≤ 10            (3n ≤ Σlen ∧ Σlen ≤ 10n)
    3. symbol-to-word ratio ≤ 0.1 for '#'/'...'   (10·sym ≤ n)
    4. ≤ 90% of lines start with a bullet ('-'/'•')  (10·b ≤ 9·L)
    5. ≤ 30% of lines end with '...'               (10·e ≤ 3·L)
    6. ≥ 80% of words contain an alphabetic char   (5·alpha ≥ 4·n)
    7. ≥ 2 distinct words from the required stop set
    keep = all seven."""
    text = batch["text"]
    n_rows = len(batch)
    words = pc.split_pattern_regex(text, pattern=r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat_all = words.flatten()
    counts_all = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    parents_all = np.repeat(np.arange(n_rows, dtype=np.int64), counts_all)
    nonempty = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    flat = flat_all.filter(pa.array(nonempty))
    parents = parents_all[nonempty]
    n_words = np.bincount(parents, minlength=n_rows).astype(np.int64)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    sum_chars = np.bincount(parents, weights=wlen, minlength=n_rows).astype(np.int64)
    alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    alpha_words = np.bincount(parents[alpha], minlength=n_rows).astype(np.int64)
    lower = pc.utf8_lower(flat)
    req = pc.is_in(lower, value_set=pa.array(list(GOPHER_REQUIRED_WORDS)))
    req_np = req.to_numpy(zero_copy_only=False)
    # distinct required-word count per doc: unique (doc, word) pairs
    lw = lower.to_numpy(zero_copy_only=False)
    n_req = np.zeros(n_rows, np.int64)
    if req_np.any():
        pairs = np.unique(
            np.stack(
                [parents[req_np], np.searchsorted(
                    np.array(sorted(GOPHER_REQUIRED_WORDS)), lw[req_np]
                )],
                axis=1,
            ),
            axis=0,
        )
        n_req = np.bincount(pairs[:, 0], minlength=n_rows).astype(np.int64)
    n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False).astype(np.int64)
    n_ell = pc.count_substring(text, "...").to_numpy(zero_copy_only=False).astype(np.int64)
    n_sym = n_hash + n_ell
    lines = pc.split_pattern(text, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lflat = lines.flatten()
    lcounts = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    lparents = np.repeat(np.arange(n_rows, dtype=np.int64), lcounts)
    n_lines = np.bincount(lparents, minlength=n_rows).astype(np.int64)
    # trim the EXPLICIT ASCII whitespace set (space \t \r \f \v — \n
    # can't appear inside a split line) so the oracle's trim(l, <same
    # set>) matches by construction; utf8_trim_whitespace would also
    # eat Unicode spaces the SQL side never strips (ADVICE r4).
    _WS = " \t\r\f\v"
    trimmed = pc.utf8_trim(lflat, _WS)
    bullet = pc.or_(
        pc.starts_with(trimmed, "-"), pc.starts_with(trimmed, "•")
    ).to_numpy(zero_copy_only=False)
    bullet_lines = np.bincount(lparents[bullet], minlength=n_rows).astype(np.int64)
    rtrimmed = pc.utf8_rtrim(lflat, _WS)
    ell = pc.ends_with(rtrimmed, "...").to_numpy(zero_copy_only=False)
    ellipsis_lines = np.bincount(lparents[ell], minlength=n_rows).astype(np.int64)

    word_count_ok = (n_words >= 50) & (n_words <= 100_000)
    word_len_ok = (3 * n_words <= sum_chars) & (sum_chars <= 10 * n_words) & (n_words > 0)
    symbol_ok = 10 * n_sym <= n_words
    bullet_ok = 10 * bullet_lines <= 9 * n_lines
    ellipsis_ok = 10 * ellipsis_lines <= 3 * n_lines
    alpha_ok = (5 * alpha_words >= 4 * n_words) & (n_words > 0)
    stop_ok = n_req >= 2
    keep = (
        word_count_ok & word_len_ok & symbol_ok & bullet_ok & ellipsis_ok
        & alpha_ok & stop_ok
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "word_count_ok": pa.array(word_count_ok),
            "word_len_ok": pa.array(word_len_ok),
            "symbol_ok": pa.array(symbol_ok),
            "bullet_ok": pa.array(bullet_ok),
            "ellipsis_ok": pa.array(ellipsis_ok),
            "alpha_ok": pa.array(alpha_ok),
            "stop_ok": pa.array(stop_ok),
            "keep": pa.array(keep),
        }
    )


def gopher_rules(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: gopher_rules_batch(b, id_col), batch_format="pyarrow"
    )
