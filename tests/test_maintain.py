"""Maintenance policy (``index/maintain.py``): plans derive from
metadata alone, auto_maintain converges the index to a healthy steady
state, and the whole flow ends rank-identical to a batch rebuild."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from test_deletes import SF, _build

from dcs_ray.index.build import load_manifest
from dcs_ray.index.deletes import delete_docs
from dcs_ray.index.fsck import verify_index
from dcs_ray.index.maintain import auto_maintain, maintenance_plan
from dcs_ray.index.nrt import add_docs
from dcs_ray.search import search_bm25

QUERY = "spark merge join"


def test_healthy_index_plans_nothing(tmp_path):
    out = str(tmp_path / "idx")
    _build(out)
    assert maintenance_plan(out) == []
    assert auto_maintain(out) == []


def test_policy_triggers_and_converges(tmp_path):
    out = str(tmp_path / "idx")
    man = _build(out)
    id_max = man["config"]["id_max"]
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = tbl["text"].to_pylist()
    # three NRT adds (each its own delta shard) + a >10% tombstone set
    base = id_max + 1
    for i in range(3):
        add_docs(out, pa.table({
            "doc_id": pa.array([base + 2 * i, base + 2 * i + 1], pa.int64()),
            "text": pa.array([texts[i], texts[i + 3]], pa.string()),
        }))
    ids = tbl["doc_id"].to_numpy()
    dead = ids[ids % 7 == 1].astype(np.uint64)
    delete_docs(out, dead)

    plan = maintenance_plan(out, max_tombstone_frac=0.1, max_delta_shards=3)
    assert [s["action"] for s in plan] == ["compact", "fold_deltas"]

    ran = auto_maintain(out, max_tombstone_frac=0.1, max_delta_shards=3)
    assert [s["action"] for s in ran] == ["compact", "fold_deltas"]
    assert maintenance_plan(out, max_tombstone_frac=0.1, max_delta_shards=3) == []
    assert verify_index(out)["ok"]
    man2 = load_manifest(out)
    assert len(man2["shards"]) == man2["config"]["num_shards"]

    # end state ranks exactly like a batch build of the same corpus
    fresh = str(tmp_path / "fresh")
    keep = ~np.isin(tbl["doc_id"].to_numpy(), dead.astype(np.int64))
    # re-derive the added rows exactly as the loop above emitted them
    final = pa.concat_tables([
        tbl.filter(pa.array(keep)),
        pa.table({
            "doc_id": pa.array(
                [base, base + 1, base + 2, base + 3, base + 4, base + 5],
                pa.int64(),
            ),
            "text": pa.array(
                [texts[0], texts[3], texts[1], texts[4], texts[2], texts[5]],
                pa.string(),
            ),
        }),
    ])
    from dcs_ray.index import IndexConfig, build_index

    build_index(ray.data.from_arrow(final), fresh, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        id_max=int(final["doc_id"].to_numpy().max()), dedup_latest=False,
    ))
    a = search_bm25(out, [QUERY], k=10)
    b = search_bm25(fresh, [QUERY], k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(
        a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=1e-12
    )
