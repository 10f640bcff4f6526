"""reshard: change shard count of a built index by re-merging the
preserved segments; search results must be identical before and after.

Reference flow: ``cmd/dcs-reshard/reshard.go:35-92`` (shard moves);
here shard bytes are derived data re-merged from segments.
"""

import os

import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import load_manifest, reshard
from dcs_ray.search import search_bm25

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reshard_idx") / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    build_index(
        docs,
        out,
        IndexConfig(num_partitions=8, num_shards=4, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    return out


def test_reshard_preserves_search_results(idx):
    before = search_bm25(idx, ["spark merge join"], k=10).to_pandas()
    man = reshard(idx, 2)
    assert man["num_shards"] == 2
    assert len(man["shards"]) == 2
    shard_dirs = [
        d for d in os.listdir(os.path.join(idx, "shards")) if d.startswith("shard_")
    ]
    assert len(shard_dirs) == 2
    assert not os.path.exists(os.path.join(idx, "shards.tmp"))
    assert not os.path.exists(os.path.join(idx, "shards.old"))
    after = search_bm25(idx, ["spark merge join"], k=10).to_pandas()
    assert before.equals(after)
    # lineage: every segment assigned exactly once, corpus counts intact
    segs = [s for rec in man["shards"] for s in rec["segments"]]
    assert len(segs) == len(set(segs)) == 8
    assert sum(r["n_docs"] for r in man["shards"]) == man["stats"]["n_docs"]
    # metrics record the reshard
    assert man["metrics"]["last_reshard"]["from_shards"] == 4
    assert man["metrics"]["last_reshard"]["to_shards"] == 2


def test_reshard_up_then_search(idx):
    up = reshard(idx, 3)
    assert up["num_shards"] == 3
    res = search_bm25(idx, ["window filter"], k=5).to_pandas()
    assert len(res) > 0
