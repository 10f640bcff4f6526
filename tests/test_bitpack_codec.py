"""Bitpack (FOR) posting codec — the TurboPFor role in dcs
(``internal/index/pforwriter.go``). Blocks are self-describing via the
header's n-field high bit, so varint and bitpack blocks coexist in one
stream and shard merge stays byte concatenation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dcs_ray.codec import decode_postings, pack_postings

SF = "/root/testdata/sf0.001"


def _postings(seed=11):
    rng = np.random.default_rng(seed)
    sizes = [1, 2, 127, 128, 129, 400, 5]
    go = np.concatenate(([0], np.cumsum(sizes)))
    ids = np.concatenate(
        [np.sort(rng.choice(10**9, s, replace=False)) for s in sizes]
    ).astype(np.uint64)
    tfs = rng.integers(1, 1000, go[-1]).astype(np.uint64)
    return go, ids, tfs, sizes


@pytest.mark.parametrize("codec", ["varint", "bitpack", "svbyte", "ef"])
def test_roundtrip(codec):
    go, ids, tfs, sizes = _postings()
    blob, off, ln = pack_postings(go, ids, tfs, codec=codec)
    b = np.frombuffer(blob, np.uint8)
    for t in range(len(sizes)):
        d, f = decode_postings(b[off[t] : off[t] + ln[t]])
        np.testing.assert_array_equal(d, ids[go[t] : go[t + 1]])
        np.testing.assert_array_equal(f, tfs[go[t] : go[t + 1]])


def test_mixed_codec_streams_concatenate():
    """A term's run may span segments built with different codecs; the
    self-describing blocks must decode as one stream (the merge case)."""
    go, ids, tfs, sizes = _postings()
    bv, ov, lv = pack_postings(go, ids, tfs, codec="varint")
    # second segment: same shape, higher doc ids
    ids2 = ids + np.uint64(2 * 10**9)
    bb, ob, lb = pack_postings(go, ids2, tfs, codec="bitpack")
    v, b = np.frombuffer(bv, np.uint8), np.frombuffer(bb, np.uint8)
    for t in range(len(sizes)):
        run = np.concatenate((v[ov[t] : ov[t] + lv[t]], b[ob[t] : ob[t] + lb[t]]))
        d, f = decode_postings(run)
        np.testing.assert_array_equal(
            d, np.concatenate((ids[go[t] : go[t + 1]], ids2[go[t] : go[t + 1]]))
        )
        np.testing.assert_array_equal(f, np.tile(tfs[go[t] : go[t + 1]], 2))


def test_three_codec_streams_concatenate():
    """Segments built with all four codecs concatenate into one
    decodable stream (the k-way merge case across index generations)."""
    go, ids, tfs, sizes = _postings()
    parts = []
    for i, codec in enumerate(("varint", "bitpack", "svbyte", "ef")):
        shifted = ids + np.uint64(i * 2 * 10**9)
        blob, off, ln = pack_postings(go, shifted, tfs, codec=codec)
        parts.append((np.frombuffer(blob, np.uint8), off, ln, shifted))
    for t in range(len(sizes)):
        run = np.concatenate([p[0][p[1][t] : p[1][t] + p[2][t]] for p in parts])
        d, f = decode_postings(run)
        np.testing.assert_array_equal(
            d, np.concatenate([p[3][go[t] : go[t + 1]] for p in parts])
        )
        np.testing.assert_array_equal(f, np.tile(tfs[go[t] : go[t + 1]], 4))


def test_svbyte_fallback_blocks_roundtrip():
    """Blocks holding ≥2^32 deltas or tfs fall back to varint bodies
    per block; the mixed stream must stay exact over full uint64."""
    rng = np.random.default_rng(3)
    sizes = [1, 130, 400]
    go = np.concatenate(([0], np.cumsum(sizes)))
    ids = np.concatenate(
        [np.sort(rng.choice(np.iinfo(np.int64).max, s, replace=False)) for s in sizes]
    ).astype(np.uint64)
    tfs = rng.integers(1, 1000, go[-1]).astype(np.uint64)
    tfs[::5] = np.uint64(1) << np.uint64(40)
    blob, off, ln = pack_postings(go, ids, tfs, codec="svbyte")
    b = np.frombuffer(blob, np.uint8)
    for t in range(len(sizes)):
        d, f = decode_postings(b[off[t] : off[t] + ln[t]])
        np.testing.assert_array_equal(d, ids[go[t] : go[t + 1]])
        np.testing.assert_array_equal(f, tfs[go[t] : go[t + 1]])


def test_svbyte_smaller_than_varint_on_mid_range_deltas():
    """Stream-VByte's 4-per-byte control stream beats LEB128 where
    values straddle LEB's 7-bit group boundaries: deltas in [2^14, 2^16)
    cost 3 LEB bytes but 2 SVB data bytes + 1/4 control byte."""
    rng = np.random.default_rng(7)
    sizes = [2000, 2000]
    go = np.concatenate(([0], np.cumsum(sizes)))
    deltas = rng.integers(1 << 14, 1 << 16, go[-1]).astype(np.uint64)
    ids = np.concatenate([np.cumsum(deltas[go[t] : go[t + 1]]) for t in range(2)])
    tfs = rng.integers(1, 4, go[-1]).astype(np.uint64)
    bv, *_ = pack_postings(go, ids, tfs, codec="varint")
    bs, *_ = pack_postings(go, ids, tfs, codec="svbyte")
    assert len(bs) < len(bv)


def test_bitpack_smaller_on_clustered_ids():
    rng = np.random.default_rng(5)
    sizes = [500, 500, 500]
    go = np.concatenate(([0], np.cumsum(sizes)))
    ids = np.concatenate(
        [np.sort(rng.choice(s * 200, s, replace=False)) for s in sizes]
    ).astype(np.uint64)
    tfs = rng.integers(1, 5, go[-1]).astype(np.uint64)
    bv, *_ = pack_postings(go, ids, tfs, codec="varint")
    bb, *_ = pack_postings(go, ids, tfs, codec="bitpack")
    assert len(bb) < len(bv)


def _ef_term_bytes(ids: np.ndarray, tfs: np.ndarray) -> int:
    """Closed-form Elias-Fano term size — the arithmetic the
    ``ef_posting_sizes`` SQL oracle replays per (term, block)."""
    from dcs_ray.codec import BLOCK, HEADER_SIZE

    total = 0
    for s in range(0, len(ids), BLOCK):
        blk_i, blk_t = ids[s : s + BLOCK], tfs[s : s + BLOCK]
        n, m = len(blk_i), len(blk_i) - 1
        U = int(blk_i[-1]) - int(blk_i[0])
        l = max((U // m).bit_length() - 1, 0) if m else 0
        low = (m * l + 7) // 8
        high = ((m + (U >> l)) + 7) // 8 if m else 0
        bw_t = int(blk_t.max()).bit_length()
        total += HEADER_SIZE + 2 + low + high + (n * bw_t + 7) // 8
    return total


def test_ef_size_is_closed_form():
    """Encoded EF size must equal the (m, U, max_tf) closed form for
    every term — the property that makes the codec SQL-replayable."""
    go, ids, tfs, sizes = _postings()
    blob, off, ln = pack_postings(go, ids, tfs, codec="ef")
    for t in range(len(sizes)):
        expected = _ef_term_bytes(ids[go[t] : go[t + 1]], tfs[go[t] : go[t + 1]])
        assert int(ln[t]) == expected, t


def test_ef_smaller_than_varint_on_sparse_uniform_ids():
    """Uniformly sparse doc ids (the web-corpus common term regime):
    EF spends ~2 + log2(U/n) bits/doc vs LEB128's 8-bit granularity."""
    rng = np.random.default_rng(9)
    sizes = [4000, 4000]
    go = np.concatenate(([0], np.cumsum(sizes)))
    ids = np.concatenate(
        [np.sort(rng.choice(s * 3000, s, replace=False)) for s in sizes]
    ).astype(np.uint64)
    tfs = rng.integers(1, 4, go[-1]).astype(np.uint64)
    bv, *_ = pack_postings(go, ids, tfs, codec="varint")
    be, *_ = pack_postings(go, ids, tfs, codec="ef")
    assert len(be) < len(bv)


def test_bitpack_index_rank_identical(ray_session, tmp_path):
    """An index built with codec='bitpack' answers BM25 (incl. the
    block-max MaxScore path) rank- and score-identically to varint."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    results = {}
    for codec in ("varint", "bitpack", "svbyte", "ef"):
        out = str(tmp_path / f"idx_{codec}")
        build_index(
            ray.data.read_parquet(f"{SF}/documents.parquet"), out,
            IndexConfig(num_partitions=4, num_shards=2, mode="words",
                        id_col="doc_id", dedup_latest=False, codec=codec),
        )
        results[codec] = search_bm25(
            out, ["spark merge join", "customer value"], k=20
        ).to_pandas()
    v = results["varint"]
    for other in ("bitpack", "svbyte", "ef"):
        b = results[other]
        assert v[["query_id", "rank", "doc_id"]].equals(
            b[["query_id", "rank", "doc_id"]]
        ), other
        np.testing.assert_array_equal(v.score.values, b.score.values, err_msg=other)
