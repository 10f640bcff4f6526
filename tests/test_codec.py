"""Codec unit tests — goldens + round trips.

Mirrors the reference's codec test strategy: exact-output goldens and
randomized round-trips (``internal/turbopfor/turbopfor_test.go:12-170``,
``internal/index/posrelwriter_test.go:8-133``).
"""

import numpy as np
import pytest

from dcs_ray.codec import (
    BLOCK,
    HEADER_SIZE,
    decode_postings,
    iter_blocks,
    pack_positions,
    pack_postings,
    unpack_positions,
    varint_decode,
    varint_encode,
)


def test_varint_golden():
    vals = np.array([0, 1, 127, 128, 300, 16384, 2**32, 2**63], dtype=np.uint64)
    enc, lens = varint_encode(vals)
    # LEB128 goldens
    assert enc[:2].tolist() == [0, 1]
    assert enc[2] == 127
    assert enc[3:5].tolist() == [0x80, 0x01]
    assert enc[5:7].tolist() == [0xAC, 0x02]
    assert lens.tolist() == [1, 1, 1, 2, 2, 3, 5, 10]
    assert np.array_equal(varint_decode(enc), vals)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**63, size=10_000, dtype=np.uint64)
    vals[rng.integers(0, 10_000, 100)] = 0
    enc, lens = varint_encode(vals)
    assert int(lens.sum()) == len(enc)
    assert np.array_equal(varint_decode(enc), vals)


def test_pack_postings_single_term_single_block():
    ids = np.array([5, 9, 10, 1000], dtype=np.uint64)
    tfs = np.array([1, 2, 3, 4], dtype=np.uint64)
    blob, off, length = pack_postings(np.array([0, 4]), ids, tfs)
    assert off.tolist() == [0]
    assert length.tolist() == [len(blob)]
    blocks = list(iter_blocks(np.frombuffer(blob, dtype=np.uint8)))
    assert len(blocks) == 1
    h, _ = blocks[0]
    assert int(h["n"]) == 4
    assert int(h["first_docid"]) == 5
    assert int(h["max_docid"]) == 1000
    assert int(h["max_tf"]) == 4
    d, t = decode_postings(np.frombuffer(blob, dtype=np.uint8))
    assert np.array_equal(d, ids)
    assert np.array_equal(t, tfs)


def test_pack_postings_multi_term_multi_block():
    rng = np.random.default_rng(7)
    nterms = 50
    counts = rng.integers(1, 4 * BLOCK, nterms)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    all_ids, all_tfs = [], []
    for c in counts:
        ids = np.sort(rng.choice(10**7, size=c, replace=False)).astype(np.uint64)
        all_ids.append(ids)
        all_tfs.append(rng.integers(1, 100, c).astype(np.uint64))
    doc_ids = np.concatenate(all_ids)
    tfs = np.concatenate(all_tfs)
    blob, off, length = pack_postings(offsets, doc_ids, tfs)
    b = np.frombuffer(blob, dtype=np.uint8)
    for t in range(nterms):
        d, f = decode_postings(b[off[t] : off[t] + length[t]])
        assert np.array_equal(d, all_ids[t]), t
        assert np.array_equal(f, all_tfs[t]), t


def test_pack_postings_merge_is_concatenation():
    """Blocks are self-contained → merging two segments' runs for one term
    is pure blob concatenation (reference merge semantics,
    ``internal/index/merge.go:252-341``, without the rebase)."""
    a_ids = np.array([1, 2, 3], dtype=np.uint64)
    b_ids = np.array([2**32 + 1, 2**32 + 5], dtype=np.uint64)
    blob_a, _, _ = pack_postings(np.array([0, 3]), a_ids, np.ones(3, dtype=np.uint64))
    blob_b, _, _ = pack_postings(np.array([0, 2]), b_ids, np.ones(2, dtype=np.uint64))
    merged = np.frombuffer(blob_a + blob_b, dtype=np.uint8)
    d, f = decode_postings(merged)
    assert d.tolist() == [1, 2, 3, 2**32 + 1, 2**32 + 5]
    assert f.tolist() == [1, 1, 1, 1, 1]


def test_block_max_metadata_supports_skipping():
    ids = np.arange(0, 1000, 2, dtype=np.uint64)  # 500 entries → 4 blocks
    tfs = np.ones(500, dtype=np.uint64)
    blob, _, _ = pack_postings(np.array([0, 500]), ids, tfs)
    b = np.frombuffer(blob, dtype=np.uint8)
    headers = [h for h, _ in iter_blocks(b)]
    assert len(headers) == 4
    assert [int(h["n"]) for h in headers] == [128, 128, 128, 116]
    assert int(headers[0]["max_docid"]) == 254
    assert int(headers[1]["first_docid"]) == 256
    total = sum(HEADER_SIZE + int(h["nbytes"]) for h in headers)
    assert total == len(b)


def test_positions_roundtrip():
    doc_ids = np.array([3, 10, 11], dtype=np.uint64)
    pos_offsets = np.array([0, 3, 4, 7])
    positions = np.array([0, 5, 9, 2, 1, 3, 100], dtype=np.uint64)
    blob = pack_positions(doc_ids, pos_offsets, positions)
    d, po, p = unpack_positions(blob)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(po, pos_offsets)
    assert np.array_equal(p, positions)


def test_positions_empty():
    blob = pack_positions(
        np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.uint64)
    )
    d, po, p = unpack_positions(blob)
    assert len(d) == 0 and len(p) == 0 and po.tolist() == [0]


@pytest.mark.parametrize("seed", [11, 12])
def test_positions_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    ndocs = 200
    doc_ids = np.sort(rng.choice(10**6, ndocs, replace=False)).astype(np.uint64)
    npos = rng.integers(1, 20, ndocs)
    pos_offsets = np.concatenate(([0], np.cumsum(npos)))
    positions = np.concatenate(
        [np.sort(rng.choice(10**5, n, replace=False)).astype(np.uint64) for n in npos]
    )
    blob = pack_positions(doc_ids, pos_offsets, positions)
    d, po, p = unpack_positions(blob)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(po, pos_offsets)
    assert np.array_equal(p, positions)


def test_posrel_writer_bit_stitching():
    """Cross-byte stitching goldens (posrelwriter_test.go:8-133 shape):
    appending bit runs at non-byte boundaries must splice correctly."""
    import numpy as np

    from dcs_ray.codec import PosrelWriter, unpack_posrel

    w = PosrelWriter()
    runs = [
        np.array([1, 0, 0], dtype=np.uint8),
        np.array([1, 1], dtype=np.uint8),
        np.array([0] * 11 + [1], dtype=np.uint8),
        np.array([1], dtype=np.uint8),
    ]
    for r in runs:
        w.write(r)
    want = np.concatenate(runs)
    got = unpack_posrel(w.data(), w.nbits)
    np.testing.assert_array_equal(got, want)
    assert w.nbits == len(want)
    # golden bytes: bits LSB-first → first byte = 1,0,0,1,1,0,0,0 = 0x19
    assert w.data()[0] == 0x19


def test_posrel_roundtrip_random():
    import numpy as np

    from dcs_ray.codec import PosrelWriter, unpack_posrel

    rng = np.random.default_rng(7)
    for _ in range(20):
        w = PosrelWriter()
        chunks = []
        for _ in range(int(rng.integers(1, 8))):
            c = rng.integers(0, 2, size=int(rng.integers(0, 40))).astype(np.uint8)
            chunks.append(c)
            w.write(c)
        want = np.concatenate(chunks) if chunks else np.empty(0, np.uint8)
        np.testing.assert_array_equal(unpack_posrel(w.data(), w.nbits), want)


def test_front_coding_sizes_matches_brute(tmp_path):
    """Engine LCP (char-matrix cumprod, clipped) vs per-pair Python on a
    hand vocabulary with the tricky cases: shared-prefix runs, a prev
    LONGER than the next term, and block-boundary resets."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dcs_ray.codec import front_coding_sizes

    vocab = sorted(
        ["a", "ab", "abcde", "abcd", "abd", "b", "ba", "bazaar", "baz",
         "cat", "catalog", "cater", "dog"]
    )
    idx = tmp_path / "fcidx" / "stats"
    os.makedirs(idx)
    pq.write_table(pa.table({"term": pa.array(vocab, pa.string())}),
                   str(idx / "df.parquet"))
    r = front_coding_sizes(str(tmp_path / "fcidx"), block=4)

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    bytes_raw = sum(1 + len(t) for t in vocab)
    bytes_front = 0
    for i, t in enumerate(vocab):
        if i % 4 == 0:
            bytes_front += 1 + len(t)
        else:
            bytes_front += 2 + len(t) - lcp(t, vocab[i - 1])
    assert r["n_terms"] == len(vocab)
    assert r["n_blocks"] == (len(vocab) + 3) // 4
    assert r["bytes_raw"] == bytes_raw
    assert r["bytes_front"] == bytes_front
