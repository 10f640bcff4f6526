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


@pytest.mark.parametrize("codec", ["varint", "bitpack"])
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


def test_bitpack_index_rank_identical(ray_session, tmp_path):
    """An index built with codec='bitpack' answers BM25 (incl. the
    block-max MaxScore path) rank- and score-identically to varint."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    results = {}
    for codec in ("varint", "bitpack"):
        out = str(tmp_path / f"idx_{codec}")
        build_index(
            ray.data.read_parquet(f"{SF}/documents.parquet"), out,
            IndexConfig(num_partitions=4, num_shards=2, mode="words",
                        id_col="doc_id", dedup_latest=False, codec=codec),
        )
        results[codec] = search_bm25(
            out, ["spark merge join", "customer value"], k=20
        ).to_pandas()
    v, b = results["varint"], results["bitpack"]
    assert v[["query_id", "rank", "doc_id"]].equals(b[["query_id", "rank", "doc_id"]])
    np.testing.assert_array_equal(v.score.values, b.score.values)
