"""BPE training/encoding vs an independent from-scratch reference.

The reference recounts every pair from scratch each iteration (the
naive published algorithm); the engine maintains stats incrementally
with a pair→word inverted index. Equal outputs prove the incremental
bookkeeping."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.bpe import (
    EOW,
    BpeEncoder,
    encode_word,
    train_bpe_merges,
    word_counts,
)


def _ref_bpe(word_count: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + EOW]): c for w, c in word_count.items() if w
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, c in vocab.items():
            for p in zip(seq, seq[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), bc = best
        merges.append((l, r, bc))
        new_vocab = {}
        for seq, c in vocab.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == l and seq[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


WORDS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2, "wide": 1,
    "lowest": 4, "newer": 1, "estate": 2, "test": 7,
}


def test_merges_match_reference():
    got = train_bpe_merges(list(WORDS), np.array(list(WORDS.values())), 40)
    want = _ref_bpe(WORDS, 40)
    assert got == want
    assert len(got) > 10  # the corpus supports a real merge sequence


def test_tie_break_is_lexicographic():
    # "ab" and "cd" pairs both occur exactly twice; the last symbol
    # carries the attached EOW marker -> ('a','b</w>') sorts first
    merges = train_bpe_merges(["ab", "cd"], np.array([2, 2]), 2)
    assert merges[0][:2] == ("a", "b" + EOW)
    assert merges[1][:2] == ("c", "d" + EOW)


def test_encode_word_greedy_rank_order():
    merges = train_bpe_merges(list(WORDS), np.array(list(WORDS.values())), 40)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    # every training word re-encodes to >=1 subtokens, deterministic
    for w in WORDS:
        seq = encode_word(w, ranks)
        assert "".join(seq) == w[:-1] + w[-1] + EOW
    # an unseen word with no applicable merges stays at char level
    assert len(encode_word("xyzq", ranks)) == 4


def test_subtoken_counts_end_to_end():
    texts = ["low lower newest", "test test wide", ""]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(t)
    words, n = word_counts(ds)
    wc = dict(zip(words.to_pylist(), n.tolist()))
    assert wc == {"low": 1, "lower": 1, "newest": 1, "test": 2, "wide": 1}
    merges = train_bpe_merges(words, n, 20)
    enc = BpeEncoder(merges)
    ranks = enc.ranks
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in ds.map_batches(
                BpeEncoder,
                fn_constructor_kwargs={"merges": merges},
                concurrency=1,
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        ]
    ).to_pydict()
    want0 = sum(len(encode_word(w, ranks)) for w in ["low", "lower", "newest"])
    want1 = sum(len(encode_word(w, ranks)) for w in ["test", "test", "wide"])
    got = dict(zip(out["doc_id"], out["n_subtokens"]))
    assert got == {0: want0, 1: want1, 2: 0}
