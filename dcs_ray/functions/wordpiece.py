"""WordPiece-style MaxMatch segmentation (greedy longest-prefix-first
subword tokenization — the BERT tokenizer's inference algorithm, Wu et
al. '16) with a deterministic corpus-derived vocabulary, plus the
per-language FERTILITY statistic (subword pieces per word) that
tokenizer evaluations report.

Simplifications that keep the whole thing integer-replayable in SQL:
no ``##`` continuation marking and no ``[UNK]`` fallback — every single
alnum char is in the vocabulary, so segmentation always succeeds and
greedy longest-match is the only rule. The vocabulary is the top-K
character n-grams (2..4) of token OCCURRENCES by (count desc, gram
asc) plus the 36 single chars — a pure function of the corpus.

Distributed shape: vocabulary counting is one corpus pass emitting
(gram, n) partials (n-gram-vocab-sized exchange, groupby-sum);
segmentation broadcasts the tiny vocab via ``ray.put`` and runs a
vectorized per-batch MaxMatch over the batch's DISTINCT words (a char
matrix + per-length sorted-vocab ``np.isin`` probes — no per-word
Python loop; iterations are bounded by the longest word). Fertility
partials are lang-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.tokenize import word_tokens_flat

SINGLE_CHARS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
    chr(c) for c in range(ord("0"), ord("9") + 1)
]


def _char_matrix(words: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(per-char 'U1' matrix (n, max_len), lengths, max_len)."""
    words = np.asarray(words, dtype="U")  # object → fixed-width unicode
    lens = np.char.str_len(words).astype(np.int64)
    ml = int(lens.max()) if len(lens) and lens.max() > 0 else 1
    arr = words.astype(f"U{ml}")
    chars = arr.view("U1").reshape(len(words), ml)
    return chars, lens, ml


def _gram_strings(chars: np.ndarray, i: int, n: int) -> np.ndarray:
    g = chars[:, i]
    for j in range(1, n):
        g = np.char.add(g, chars[:, i + j])
    return g


def wordpiece_vocab(
    docs: ray.data.Dataset,
    top_k: int = 300,
    min_n: int = 2,
    max_n: int = 4,
    text_col: str = "text",
) -> list[str]:
    """Corpus-derived MaxMatch vocabulary: all 36 single alnum chars
    plus the ``top_k`` character n-grams (``min_n..max_n``) of token
    occurrences ranked (count desc, gram asc)."""

    def grams(b: pa.Table) -> pa.Table:
        flat, _ = word_tokens_flat(b[text_col])
        if len(flat) == 0:
            return pa.table(
                {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        words = flat.to_numpy(zero_copy_only=False)
        chars, lens, ml = _char_matrix(words)
        parts = []
        for n in range(min_n, max_n + 1):
            for i in range(0, ml - n + 1):
                valid = lens >= i + n
                if valid.any():
                    parts.append(_gram_strings(chars[valid], i, n))
        if not parts:
            return pa.table(
                {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        allg = np.concatenate(parts)
        uniq, cnt = np.unique(allg, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(uniq, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = docs.map_batches(grams, batch_format="pyarrow").groupby("gram").sum("n")
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")])
    g = t["gram"].to_numpy(zero_copy_only=False)
    n = t["sum(n)"].to_numpy()
    order = np.lexsort((g, -n))[:top_k]
    return sorted(set(SINGLE_CHARS) | set(g[order].tolist()))


def wordpiece_segment_counts(
    words: np.ndarray, vocab: list[str], max_n: int = 4
) -> np.ndarray:
    """Pieces per word under greedy MaxMatch (longest piece first, left
    to right). Vectorized: one iteration per emitted piece position,
    each a handful of sorted-``np.isin`` membership probes."""
    nw = len(words)
    if nw == 0:
        return np.zeros(0, np.int64)
    by_len = {
        L: np.sort(np.array([v for v in vocab if len(v) == L], dtype="U8"))
        for L in range(2, max_n + 1)
    }
    chars, lens, ml = _char_matrix(words)
    pos = np.zeros(nw, np.int64)
    pieces = np.zeros(nw, np.int64)
    while True:
        active = pos < lens
        if not active.any():
            break
        chosen = np.zeros(nw, np.int64)
        for L in range(max_n, 1, -1):
            vl = by_len.get(L)
            if vl is None or len(vl) == 0:
                continue
            cand = active & (chosen == 0) & (lens - pos >= L)
            idx = np.flatnonzero(cand)
            if len(idx) == 0:
                continue
            g = chars[idx, pos[idx]]
            for j in range(1, L):
                g = np.char.add(g, chars[idx, pos[idx] + j])
            hit = np.isin(g, vl)
            chosen[idx[hit]] = L
        chosen[active & (chosen == 0)] = 1  # single chars always match
        pos += chosen
        pieces += active
    return pieces


def wordpiece_fertility(
    docs: ray.data.Dataset,
    vocab: list[str],
    text_col: str = "text",
    lang_col: str = "lang",
) -> pa.Table:
    """Per-language fertility: ``(lang, n_words, n_pieces, fertility)``
    where fertility = pieces/word over token OCCURRENCES — the standard
    multilingual-tokenizer quality metric (high fertility = the vocab
    splinters that language). Integer partials; one 6-dp division per
    lang at the end."""
    vref = ray.put(list(vocab))

    def fert(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_words": pa.array([], pa.int64()),
                    "n_pieces": pa.array([], pa.int64()),
                }
            )
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words, return_inverse=True)
        pieces_u = wordpiece_segment_counts(uniq, ray.get(vref))
        pieces_tok = pieces_u[inv]
        langs = b[lang_col].to_numpy(zero_copy_only=False)[parents]
        ul, linv = np.unique(langs, return_inverse=True)
        n_words = np.bincount(linv, minlength=len(ul)).astype(np.int64)
        n_pieces = np.bincount(linv, weights=pieces_tok, minlength=len(ul)).astype(
            np.int64
        )
        return pa.table(
            {
                "lang": pa.array(ul, pa.string()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_pieces": pa.array(n_pieces, pa.int64()),
            }
        )

    agg = (
        docs.map_batches(fert, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("n_words"), ray.data.aggregate.Sum("n_pieces")
        )
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    ).sort_by("lang")
    nw = t["sum(n_words)"].to_numpy().astype(np.int64)
    npc = t["sum(n_pieces)"].to_numpy().astype(np.int64)
    fert_v = np.round(npc / nw, 6) + 0.0
    return pa.table(
        {
            "lang": t["lang"],
            "n_words": pa.array(nw, pa.int64()),
            "n_pieces": pa.array(npc, pa.int64()),
            "fertility": pa.array(fert_v, pa.float64()),
        }
    )


def unigram_piece_costs(
    docs: ray.data.Dataset,
    top_k: int = 300,
    max_n: int = 4,
    text_col: str = "text",
) -> tuple[dict[str, int], int]:
    """Unigram-LM piece inventory with integer micro-nat costs: the
    WordPiece vocab's pieces (top-``top_k`` 2..4-grams + all singles)
    weighted by their corpus occurrence counts,
    ``cost(g) = floor(1e6 · ln(T / max(cnt_g, 1)))`` with
    ``T = Σ cnt over the inventory`` — the (unnormalized) negative
    log-likelihood a SentencePiece-style unigram model assigns a piece.
    Floor keeps both the engine and the SQL replay on the same integer
    (ln of a rational is never exactly an integer). Returns
    ``({piece: cost}, T)``."""

    def grams(b: pa.Table) -> pa.Table:
        flat, _ = word_tokens_flat(b[text_col])
        if len(flat) == 0:
            return pa.table(
                {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        words = flat.to_numpy(zero_copy_only=False)
        chars, lens, ml = _char_matrix(words)
        parts = []
        for n in range(1, max_n + 1):
            for i in range(0, ml - n + 1):
                valid = lens >= i + n
                if valid.any():
                    parts.append(_gram_strings(chars[valid], i, n))
        allg = np.concatenate(parts)
        uniq, cnt = np.unique(allg, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(uniq, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = docs.map_batches(grams, batch_format="pyarrow").groupby("gram").sum("n")
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")])
    g = t["gram"].to_numpy(zero_copy_only=False)
    n = t["sum(n)"].to_numpy().astype(np.int64)
    counts = dict(zip(g.tolist(), n.tolist()))
    multi = [(gram, c) for gram, c in counts.items() if len(gram) >= 2]
    multi.sort(key=lambda kv: (-kv[1], kv[0]))
    pieces = set(SINGLE_CHARS) | {gram for gram, _ in multi[:top_k]}
    T = sum(counts.get(p, 0) for p in pieces)
    costs = {
        p: int(np.floor(1e6 * np.log(T / max(counts.get(p, 0), 1)))) for p in pieces
    }
    return costs, T


def unigram_segment_costs(
    words: np.ndarray, costs: dict[str, int], max_n: int = 4
) -> np.ndarray:
    """Viterbi (min-cost) segmentation cost per word under the unigram
    piece inventory — the MDL/compression objective SentencePiece
    optimizes at inference. Vectorized DP over the char matrix: one
    (position, piece-length) pair per step, each a sorted-searchsorted
    cost lookup over the whole word set; singles are always present so
    every word has a finite cost."""
    nw = len(words)
    if nw == 0:
        return np.zeros(0, np.int64)
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for L in range(1, max_n + 1):
        ps = sorted(p for p in costs if len(p) == L)
        by_len[L] = (
            np.array(ps, dtype=f"U{L}"),
            np.array([costs[p] for p in ps], np.int64),
        )
    chars, lens, ml = _char_matrix(words)
    BIG = np.int64(1 << 60)
    dp = np.full((nw, ml + 1), BIG, np.int64)
    dp[:, 0] = 0
    for p in range(1, ml + 1):
        rows = lens >= p
        if not rows.any():
            break
        for L in range(1, min(max_n, p) + 1):
            keys, kcost = by_len[L]
            if len(keys) == 0:
                continue
            idx = np.flatnonzero(rows)
            g = chars[idx, p - L]
            for j in range(1, L):
                g = np.char.add(g, chars[idx, p - L + j])
            pos = np.searchsorted(keys, g)
            pos = np.minimum(pos, len(keys) - 1)
            hit = keys[pos] == g
            cand = np.where(hit, dp[idx, p - L] + kcost[pos], BIG)
            dp[idx, p] = np.minimum(dp[idx, p], cand)
    return dp[np.arange(nw), lens]


def unigram_lm_cost_by_lang(
    docs: ray.data.Dataset,
    costs: dict[str, int],
    text_col: str = "text",
    lang_col: str = "lang",
) -> pa.Table:
    """Per-language corpus encoding cost under the unigram piece model:
    ``(lang, n_words, total_cost_micronats, nats_per_word)`` over token
    occurrences — integer partials, one 6-dp division per lang."""
    cref = ray.put(dict(costs))

    def fold(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_words": pa.array([], pa.int64()),
                    "cost": pa.array([], pa.int64()),
                }
            )
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words, return_inverse=True)
        cost_u = unigram_segment_costs(uniq, ray.get(cref))
        cost_tok = cost_u[inv]
        langs = b[lang_col].to_numpy(zero_copy_only=False)[parents]
        ul, linv = np.unique(langs, return_inverse=True)
        n_words = np.bincount(linv, minlength=len(ul)).astype(np.int64)
        tot = np.zeros(len(ul), np.int64)
        np.add.at(tot, linv, cost_tok)
        return pa.table(
            {
                "lang": pa.array(ul, pa.string()),
                "n_words": pa.array(n_words, pa.int64()),
                "cost": pa.array(tot, pa.int64()),
            }
        )

    agg = (
        docs.map_batches(fold, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(ray.data.aggregate.Sum("n_words"), ray.data.aggregate.Sum("cost"))
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    ).sort_by("lang")
    nw = t["sum(n_words)"].to_numpy().astype(np.int64)
    tc = t["sum(cost)"].to_numpy().astype(np.int64)
    npw = np.round(tc / 1e6 / nw, 6) + 0.0
    return pa.table(
        {
            "lang": t["lang"],
            "n_words": pa.array(nw, pa.int64()),
            "total_cost_micronats": pa.array(tc, pa.int64()),
            "nats_per_word": pa.array(npw, pa.float64()),
        }
    )
