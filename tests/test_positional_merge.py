"""Shard-level positional-section merge (dcs ``internal/index/merge.go:343-405``).

The stitch merge must be losslessly equivalent to the per-segment
sections it replaces: summed headers, spliced leading doc-id varints,
bit-stitched posrel bitmaps (the non-byte-aligned append case), and
byte-copied position streams.
"""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.codec import unpack_positions
from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import update_partition
from dcs_ray.index.segment import Segment
from dcs_ray.search import positional_matches_shard, search_literal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posidx") / "index")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(
        num_partitions=6,
        num_shards=2,
        mode="trigram",
        id_col="doc_id",
        url_col="url",
        dedup_latest=False,
        positional=True,
    )
    build_index(docs, out, conf)
    return out


def _seg_dirs(out):
    root = os.path.join(out, "segments")
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("seg_") and not d.endswith(".tmp")
    ]


def _shard_dirs(out):
    root = os.path.join(out, "shards")
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("shard_") and not d.endswith(".tmp")
    ]


def test_shards_have_merged_positions(pos_index):
    for sh in _shard_dirs(pos_index):
        assert os.path.exists(os.path.join(sh, "positions.bin"))
        assert os.path.exists(os.path.join(sh, "pos_dict.parquet"))
        with open(os.path.join(sh, "lineage.json")) as f:
            assert json.load(f)["pos_bytes"] > 0


def test_shard_blob_equals_segment_concat(pos_index):
    """Decoding a merged term must yield exactly the concatenation of its
    per-segment decodes — doc ids, per-doc boundaries, and positions."""
    checked_unaligned = 0
    for sh in _shard_dirs(pos_index):
        shard = Segment(sh)
        with open(os.path.join(sh, "lineage.json")) as f:
            seg_names = json.load(f)["segments"]
        segs = [Segment(os.path.join(pos_index, "segments", s)) for s in seg_names]
        sh_terms = shard.terms.to_numpy(zero_copy_only=False)
        for t_idx in range(len(sh_terms)):
            term = sh_terms[t_idx]
            got_d, got_off, got_p = unpack_positions(shard.position_blob(t_idx))
            exp_d, exp_p, exp_counts = [], [], []
            npos_so_far = 0
            for seg in segs:
                i = seg.term_index(term)
                if i < 0:
                    continue
                d, off, p = unpack_positions(seg.position_blob(i))
                exp_d.append(d)
                exp_p.append(p)
                exp_counts.append(np.diff(off))
                # count terms whose merged-run bit offset was unaligned
                if npos_so_far % 8 != 0:
                    checked_unaligned += 1
                npos_so_far += len(p)
            exp_d = np.concatenate(exp_d)
            exp_p = np.concatenate(exp_p)
            exp_off = np.concatenate(([0], np.cumsum(np.concatenate(exp_counts))))
            np.testing.assert_array_equal(got_d, exp_d)
            np.testing.assert_array_equal(got_off, exp_off)
            np.testing.assert_array_equal(got_p, exp_p)
    # the corpus must actually exercise the bit-level (non-byte-aligned)
    # posrel stitch path, not just byte-aligned appends
    assert checked_unaligned > 0


def test_shard_vs_segment_positional_matches(pos_index):
    """The positional join over merged shards returns the same (doc, pos)
    set as the per-segment fan-out it replaces."""
    for lit in ["spark merge", "the", "customer"]:
        got = set()
        for sh in _shard_dirs(pos_index):
            d, p = positional_matches_shard(Segment(sh), lit)
            got |= set(zip(d.tolist(), p.tolist()))
        want = set()
        for sg in _seg_dirs(pos_index):
            d, p = positional_matches_shard(Segment(sg), lit)
            want |= set(zip(d.tolist(), p.tolist()))
        assert got == want, lit


def test_update_partition_positional(pos_index, tmp_path):
    """Incremental update of one partition re-merges its shard's positional
    section; positional search then finds the new doc's literals exactly."""
    import shutil

    out = str(tmp_path / "index")
    shutil.copytree(pos_index, out)
    seg0 = Segment(_seg_dirs(out)[0])
    doc_id = int(seg0.doc_ids[0])
    marker = "zzqyx phrase zzqyx"
    tbl = pq.read_table(f"{SF}/documents.parquet")
    mask = np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False)) == doc_id
    row = tbl.filter(mask).to_pydict()
    row["text"] = [f"{marker} plus {marker} tail"]
    import pyarrow as pa

    update_partition(out, 0, pa.table(row, schema=tbl.schema))
    res = search_literal(out, [marker], positional=True).to_pandas()
    assert (res.doc_id == doc_id).all()
    assert set(res.position.astype(int)) == {0, len(marker) + 6}


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_stitch_merge_randomized_no_ray(tmp_path, seed):
    """Property check over random corpora (pure functions, no Ray):
    merged per-term decode == concatenated per-segment decodes, and the
    positional join equals brute-force substring search."""
    import pyarrow as pa

    from dcs_ray.index.config import IndexConfig
    from dcs_ray.index.merge import merge_one_shard
    from dcs_ray.index.segment import build_segment_data, write_segment

    rng = np.random.default_rng(seed)
    words = ["spark", "merge", "join", "alpha", "betaq", "gamma", "the", "qx", "fox9"]
    conf = IndexConfig(
        num_partitions=3, num_shards=1, mode="trigram", id_col="doc_id",
        url_col="url", dedup_latest=False, positional=True,
    )
    seg_root = str(tmp_path / "segments")
    os.makedirs(seg_root)
    all_txt = {}
    bounds = np.sort(rng.choice(np.arange(10, 120), 2, replace=False))
    parts = [range(0, bounds[0]), range(bounds[0], bounds[1]), range(bounds[1], 130)]
    for part, ids in enumerate(parts):
        ids = list(ids)
        texts = [
            " ".join(rng.choice(words, size=rng.integers(1, 25))) for _ in ids
        ]
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array([f"u{i}" for i in ids]),
                "text": pa.array(texts),
            }
        )
        write_segment(seg_root, build_segment_data(part, t, conf))
        all_txt.update(zip(ids, texts))

    seg_paths = [os.path.join(seg_root, d) for d in sorted(os.listdir(seg_root))]
    shard_root = str(tmp_path / "shards")
    os.makedirs(shard_root)
    merge_one_shard(0, seg_paths, shard_root)
    shard = Segment(os.path.join(shard_root, "shard_0000"))
    segs = [Segment(p) for p in seg_paths]

    terms = shard.terms.to_numpy(zero_copy_only=False)
    for t_idx in range(len(terms)):
        got = unpack_positions(shard.position_blob(t_idx))
        exp_d, exp_p, exp_c = [], [], []
        for sg in segs:
            i = sg.term_index(terms[t_idx])
            if i < 0:
                continue
            d, off, p = unpack_positions(sg.position_blob(i))
            exp_d.append(d)
            exp_p.append(p)
            exp_c.append(np.diff(off))
        np.testing.assert_array_equal(got[0], np.concatenate(exp_d))
        np.testing.assert_array_equal(
            got[1], np.concatenate(([0], np.cumsum(np.concatenate(exp_c))))
        )
        np.testing.assert_array_equal(got[2], np.concatenate(exp_p))

    for lit in ["spark merge", "the qx", "fox9"]:
        d, p = positional_matches_shard(shard, lit)
        got_pairs = sorted(zip(d.tolist(), p.tolist()))
        want = []
        for i, txt in all_txt.items():
            start = 0
            while True:
                j = txt.find(lit, start)
                if j < 0:
                    break
                want.append((i, j))
                start = j + 1
        assert got_pairs == sorted(want), (seed, lit)


def test_vectorized_pack_positional_bit_identical_to_reference():
    """The all-terms vectorized positional pack must emit byte-identical
    blobs to the per-term ``codec.pack_positions`` reference encoder."""
    import pyarrow as pa

    from dcs_ray.codec import pack_positions
    from dcs_ray.index.config import IndexConfig
    from dcs_ray.index.segment import build_segment_data
    from dcs_ray.tokenize import trigram_tokens

    rng = np.random.default_rng(5)
    words = ["spark", "merge", "alpha", "zz9", "the"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 40))) for _ in range(80)]
    ids = np.arange(80, dtype=np.uint64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(80)]),
            "text": pa.array(texts),
        }
    )
    conf = IndexConfig(
        num_partitions=1, num_shards=1, mode="trigram", id_col="doc_id",
        url_col="url", dedup_latest=False, positional=True,
    )
    seg = build_segment_data(0, tbl, conf)

    # reference per-term encoding from the same token stream
    tri, tdoc, tpos = trigram_tokens(pa.array(texts), ids)
    order = np.argsort(tri, kind="stable")
    tri, tdoc, tpos = tri[order], tdoc[order], tpos[order]
    b = np.flatnonzero((tri[1:] != tri[:-1]) | (tdoc[1:] != tdoc[:-1])) + 1
    starts = np.concatenate(([0], b))
    ends = np.concatenate((starts[1:], [len(tri)]))
    tpp = tri[starts]
    tb = np.flatnonzero(tpp[1:] != tpp[:-1]) + 1
    go = np.concatenate(([0], tb, [len(tpp)]))
    p_doc = tdoc[starts]

    blob = seg["positions_blob"]
    pd_ = seg["pos_dict"]
    for t in range(len(go) - 1):
        lo, hi = go[t], go[t + 1]
        pos_offsets = np.concatenate(([0], np.cumsum(ends[lo:hi] - starts[lo:hi])))
        positions = tpos[starts[lo] : ends[hi - 1]].astype(np.uint64)
        want = pack_positions(p_doc[lo:hi], pos_offsets, positions)
        got = blob[pd_["offset"][t] : pd_["offset"][t] + pd_["nbytes"][t]]
        assert bytes(got) == want, t
