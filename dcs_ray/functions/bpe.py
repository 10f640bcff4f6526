"""Byte-pair-encoding vocabulary training and encoding, Ray-Data-first.

The published BPE algorithm (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") learns merges
from the aggregated WORD-COUNT table, not the raw corpus. That is the
scale split this module keeps:

- the corpus-sized pass is a distributed word count — per-batch
  ``np.unique`` partials folded through a vocabulary-sized exchange
  (same two-level combiner shape as ``lm.train_bigram_counts``);
- the merge loop runs on the driver over the count table only —
  vocabulary-sized state, never corpus-sized (at web scale the vocab
  is further bounded by ``min_count``, the standard practice);
- encoding is a ``map_batches`` stage that encodes each batch's UNIQUE
  words once (per-actor memo cache) and scatters counts back — the
  per-word merge walk never runs per occurrence.

Tokenization matches the engine's word tokenizer (``word_tokens_flat``)
so the word-count stage is replayable by the same DuckDB ``_TOK`` CTE
that gates the other text operators. Merge learning itself is
iterative-argmax and not SQL-expressible; it is gated by a pytest
against an independent from-scratch recount reference instead.

Determinism: ties in pair counts break on the lexicographically
smallest ``(left, right)`` pair, making the merge table a pure function
of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.tokenize import word_tokens_flat

EOW = "</w>"  # end-of-word marker (the paper's word-boundary symbol)


def word_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> tuple[pa.Array, np.ndarray]:
    """Distributed word count → (sorted word array, count array).

    Per-batch partial counts via Arrow dictionary-encode + bincount;
    the driver folds vocabulary-sized partials only."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = word_tokens_flat(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {"word": enc.dictionary.cast(pa.string()), "n": pa.array(cnt, pa.int64())}
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    agg = pa.concat_tables(parts).group_by("word").aggregate([("n", "sum")])
    order = pc.sort_indices(agg["word"])
    words = agg["word"].take(order).combine_chunks()
    n = agg["n_sum"].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
    return words, n


def train_bpe_merges(
    words: pa.Array | list[str],
    counts: np.ndarray | list[int],
    n_merges: int,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a word-count table.

    Incremental pair-stat maintenance (the published algorithm's
    efficient form): a pair→words inverted index means each merge only
    touches words containing the merged pair. Returns
    ``[(left, right, pair_count), ...]`` in merge order. Vocab-sized
    Python state is deliberate — this input is the aggregated count
    table, not the corpus (see module docstring)."""
    wlist = [str(w) for w in (words.to_pylist() if isinstance(words, pa.Array) else words)]
    clist = [int(c) for c in counts]
    seqs: list[list[str]] = []
    freqs: list[int] = []
    for w, c in zip(wlist, clist):
        if c < min_count or not w:
            continue
        seqs.append(list(w[:-1]) + [w[-1] + EOW])
        freqs.append(c)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, seq in enumerate(seqs):
        f = freqs[i]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            # max count; ties -> lexicographically smallest pair
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (left, right), bc = best
        merges.append((left, right, bc))
        merged = left + right
        for i in list(pair_words.get((left, right), ())):
            seq, f = seqs[i], freqs[i]
            j = 0
            out: list[str] = []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == left and seq[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            # retract old pair stats for this word, add the new ones
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        pair_words.pop((a, b), None)
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(i)
            seqs[i] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge walk for one word (the standard
    BPE encode): repeatedly merge the best-ranked adjacent pair."""
    if not word:
        return []
    seq = list(word[:-1]) + [word[-1] + EOW]
    while len(seq) > 1:
        best_rank = None
        best_j = -1
        for j in range(len(seq) - 1):
            r = ranks.get((seq[j], seq[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        seq[best_j : best_j + 2] = [seq[best_j] + seq[best_j + 1]]
    return seq


class BpeEncoder:
    """Actor-pool encode stage: merge-rank table built ONCE per actor in
    ``__init__`` (the model-load slot), per-batch work encodes only the
    batch's unique words (memoized across batches) and scatters subtoken
    counts back with a bincount."""

    def __init__(self, merges: list[tuple[str, str, int]], id_col: str = "doc_id",
                 text_col: str = "text"):
        self.ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        self.id_col = id_col
        self.text_col = text_col
        self._memo: dict[str, int] = {}

    def _n_subtokens(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(batch[self.text_col])
        n_rows = len(batch)
        out = np.zeros(n_rows, np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            per_word = np.array(
                [self._n_subtokens(w) for w in enc.dictionary.to_pylist()], np.int64
            )
            np.add.at(out, parents, per_word[codes])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_subtokens": pa.array(out, pa.int64()),
            }
        )


def bpe_subtoken_counts(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Per-doc subtoken count under a trained merge table."""
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges": merges, "id_col": id_col, "text_col": text_col,
        },
        concurrency=concurrency,
        batch_format="pyarrow",
    )
