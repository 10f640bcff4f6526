"""Hypothesis property tests for the posting codecs: any sorted-unique
doc-id groups with any uint tfs must roundtrip bit-exactly through all
three codecs, and arbitrary codec mixtures must concatenate into one
decodable stream (the merge invariant)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dcs_ray.codec import decode_postings, pack_postings

# group sizes spanning block boundaries (BLOCK=128)
group_sizes = st.lists(st.integers(1, 300), min_size=1, max_size=5)
# delta magnitudes spanning the svbyte 4-byte limit (forces fallback)
delta_bits = st.sampled_from([3, 8, 17, 31, 33, 41])
tf_bits = st.sampled_from([1, 7, 20, 34])


def _make(sizes, dbits, tbits, seed):
    rng = np.random.default_rng(seed)
    go = np.concatenate(([0], np.cumsum(sizes)))
    deltas = rng.integers(1, 1 << dbits, go[-1], dtype=np.uint64)
    ids = np.concatenate(
        [np.cumsum(deltas[go[t] : go[t + 1]], dtype=np.uint64) for t in range(len(sizes))]
    )
    tfs = rng.integers(1, 1 << tbits, go[-1], dtype=np.uint64)
    return go, ids, tfs


@settings(max_examples=60, deadline=None)
@given(group_sizes, delta_bits, tf_bits, st.integers(0, 2**16),
       st.sampled_from(["varint", "bitpack", "svbyte"]))
def test_any_codec_roundtrips(sizes, dbits, tbits, seed, codec):
    go, ids, tfs = _make(sizes, dbits, tbits, seed)
    blob, off, ln = pack_postings(go, ids, tfs, codec=codec)
    b = np.frombuffer(blob, np.uint8)
    for t in range(len(sizes)):
        d, f = decode_postings(b[off[t] : off[t] + ln[t]])
        np.testing.assert_array_equal(d, ids[go[t] : go[t + 1]], err_msg=f"{codec} ids")
        np.testing.assert_array_equal(f, tfs[go[t] : go[t + 1]], err_msg=f"{codec} tfs")


@settings(max_examples=30, deadline=None)
@given(group_sizes, st.integers(0, 2**16),
       st.lists(st.sampled_from(["varint", "bitpack", "svbyte"]), min_size=2, max_size=4))
def test_codec_mixture_concatenates(sizes, seed, codecs):
    """Segments built with any codec sequence merge by byte concat."""
    go, ids, tfs = _make(sizes, 17, 7, seed)
    parts, want_ids = [], []
    base = np.uint64(0)
    for i, codec in enumerate(codecs):
        shifted = ids + base
        blob, off, ln = pack_postings(go, shifted, tfs, codec=codec)
        parts.append((np.frombuffer(blob, np.uint8), off, ln))
        want_ids.append(shifted)
        base += np.uint64(int(ids.max()) + 1)
    for t in range(len(sizes)):
        run = np.concatenate([p[0][p[1][t] : p[1][t] + p[2][t]] for p in parts])
        d, f = decode_postings(run)
        np.testing.assert_array_equal(
            d, np.concatenate([w[go[t] : go[t + 1]] for w in want_ids])
        )
        np.testing.assert_array_equal(f, np.tile(tfs[go[t] : go[t + 1]], len(codecs)))
