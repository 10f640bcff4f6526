"""Content-defined chunking dedup — the FastCDC/LBFS resynchronization
property at token granularity, plus brute-force identity of the
vectorized segment fold."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.sketches import _hash64_column, _splitmix64
from dcs_ray.functions.textprep import cdc_chunk_stats
from dcs_ray.tokenize import word_tokens_flat


def _stats(docs: dict[int, str], mask_bits: int) -> dict[int, tuple[int, int, int]]:
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
        }
    )
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in cdc_chunk_stats(
                ray.data.from_arrow(tbl), mask_bits=mask_bits
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    return {
        d: (c, k, t)
        for d, c, k, t in zip(
            out["doc_id"].to_pylist(),
            out["n_chunks"].to_pylist(),
            out["n_kept"].to_pylist(),
            out["kept_tokens"].to_pylist(),
        )
    }


def _brute(docs: dict[int, str], mask_bits: int) -> dict[int, tuple[int, int, int]]:
    """Row-at-a-time reference implementation of the same definition."""
    mask = (1 << mask_bits) - 1
    chunks: list[tuple[int, int, int, int]] = []  # (doc, idx, chunk_h, n_tok)
    for d in sorted(docs):
        flat, _ = word_tokens_flat(pa.array([docs[d]], pa.string()))
        toks = flat.to_pylist()
        if not toks:
            continue
        hs = _hash64_column(pa.array(toks, pa.string()))
        cur: list[int] = []
        idx = 0
        for i, h in enumerate(hs):
            cur.append(int(h))
            if (int(h) & mask) == 0 or i == len(toks) - 1:
                ch = (
                    sum(
                        int(_splitmix64(np.array([(v + o) % 2**64], np.uint64))[0])
                        for o, v in enumerate(cur)
                    )
                    % 2**64
                )
                chunks.append((d, idx, ch, len(cur)))
                idx += 1
                cur = []
    first: dict[int, int] = {}
    for d, idx, ch, _n in chunks:
        packed = d * 1048576 + idx
        first[ch] = min(first.get(ch, packed), packed)
    res: dict[int, tuple[int, int, int]] = {}
    for d in sorted({c[0] for c in chunks}):
        mine = [c for c in chunks if c[0] == d]
        kept = [c for c in mine if first[c[2]] == d * 1048576 + c[1]]
        res[d] = (len(mine), len(kept), sum(c[3] for c in kept))
    return res


def test_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    docs = {
        i: " ".join(rng.choice(words, size=60))
        for i in range(1, 6)
    }
    docs[2] = docs[1]  # exact duplicate → every chunk of doc 2 dedups
    assert _stats(docs, 3) == _brute(docs, 3)


def test_exact_duplicate_fully_dedups(ray_session):
    docs = {1: "one two three four five six seven eight " * 8}
    docs[2] = docs[1]
    s = _stats(docs, 3)
    assert s[1][1] == s[1][0]  # originals all kept
    assert s[2][1] == 0  # duplicate keeps nothing


def test_boundaries_resynchronize_after_insertion(ray_session):
    """The CDC property: a prefix insertion only perturbs chunks up to
    the first boundary — everything after dedups against the original.
    A fixed-window chunker would shift every window and keep them all."""
    rng = np.random.default_rng(11)
    words = ["kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho", "sigma"]
    base = " ".join(rng.choice(words, size=120))
    docs = {1: base, 2: "inserted preamble goes here " + base}
    s = _stats(docs, 3)
    n_chunks2, n_kept2 = s[2][0], s[2][1]
    assert n_chunks2 > 3  # enough chunks for the property to mean something
    assert n_kept2 <= 1  # only the perturbed head chunk survives


def test_empty_and_tiny_docs(ray_session):
    docs = {1: "", 2: "solo", 3: "a b"}
    s = _stats(docs, 3)
    assert 1 not in s  # zero-token docs emit nothing
    assert s[2] == (1, 1, 1)
    assert s[3][0] >= 1
