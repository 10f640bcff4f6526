"""Sloppy-phrase ranking: hand-computed integer weights on a crafted
corpus (the oracle gate covers the synthesized corpora; this pins the
kernel's gap/window/tie semantics on known byte layouts)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import SLOPPY_SCALE, search_phrase_sloppy


def test_sloppy_weights_hand_computed(ray_session, tmp_path):
    docs = [
        # doc 0: 'aaa bbb' — one ordered pair, gap 4 bytes
        "aaa bbb",
        # doc 1: 'aaa xx bbb ... bbb' — gaps 7 and 15 from one aaa
        "aaa xx bbb xx bbb",
        # doc 2: bbb BEFORE aaa only — no ordered pair
        "bbb aaa",
        # doc 3: far beyond the window
        "aaa " + "x" * 60 + " bbb",
        # doc 4: two aaa, one bbb: gaps from each aaa
        "aaa aaa bbb",
    ]
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        p,
    )
    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet(str(p)), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="trigram",
                    id_col="doc_id", dedup_latest=False, positional=True),
    )
    t = search_phrase_sloppy(out, ("aaa", "bbb"), window=40, k=10)
    got = dict(zip(t["doc_id"].to_pylist(), t["sloppy_w"].to_pylist()))
    S = SLOPPY_SCALE
    want = {
        0: S // 4,
        1: S // 7 + S // 14,      # bbb at 7 and 14 bytes after aaa@0
        4: S // 8 + S // 4,       # aaa@0→bbb@8, aaa@4→bbb@8
    }
    # doc 2 (wrong order) and doc 3 (gap 65 > 40) must be absent
    assert got == want, got
    # ranking: weight desc, doc asc
    assert t["doc_id"].to_pylist() == sorted(want, key=lambda d: (-want[d], d))


def test_sloppy_rank_ties_and_k(ray_session, tmp_path):
    docs = ["qqq www", "qqq www", "qqq www"]  # identical weights → ties by id
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([5, 2, 9], pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        p,
    )
    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet(str(p)), out,
        IndexConfig(num_partitions=1, num_shards=1, mode="trigram",
                    id_col="doc_id", dedup_latest=False, positional=True),
    )
    t = search_phrase_sloppy(out, ("qqq", "www"), window=40, k=2)
    assert t["doc_id"].to_pylist() == [2, 5]  # id-asc ties, k honored
    assert t["rank"].to_pylist() == [1, 2]
