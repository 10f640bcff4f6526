"""NRT delta-segment adds (``dcs_ray/index/nrt.py``).

The equivalence that matters: BM25 over main + delta segments is
rank-identical (scores and all) to a batch rebuild of the full corpus,
because df/N/avgdl recompute exactly — the Lucene flush model with no
approximation. Then the lifecycle composes: monotone-id enforcement,
tombstone deletes of added docs, and reshard folding deltas into main.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import load_manifest, reshard
from dcs_ray.index.deletes import delete_docs
from dcs_ray.index.nrt import add_docs
from dcs_ray.search import search_bm25

SF = "/root/testdata/sf0.001"
QUERIES = ["spark merge join", "customer window batch"]


def _docs_table() -> pa.Table:
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _build_subset(out: str, tbl: pa.Table) -> dict:
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    )
    return build_index(ray.data.from_arrow(tbl), out, conf)


@pytest.fixture(scope="module")
def nrt_index(tmp_path_factory):
    """Main index over the oldest 60% of doc ids, then the rest added as
    TWO delta batches."""
    tbl = _docs_table()
    ids = np.sort(tbl["doc_id"].to_numpy())
    cut1, cut2 = ids[int(len(ids) * 0.6)], ids[int(len(ids) * 0.8)]
    col = tbl["doc_id"].to_numpy()
    out = str(tmp_path_factory.mktemp("nrt") / "idx")
    _build_subset(out, tbl.filter(pa.array(col < cut1)))
    m1 = add_docs(out, tbl.filter(pa.array((col >= cut1) & (col < cut2))))
    m2 = add_docs(out, tbl.filter(pa.array(col >= cut2)))
    return out, m1, m2


def test_add_metrics_and_layout(nrt_index):
    out, m1, m2 = nrt_index
    assert m1["part_id"] == 4 and m2["part_id"] == 5
    assert m1["shard_id"] == 2 and m2["shard_id"] == 3
    assert m2["n_delta_segments"] == 2
    man = load_manifest(out)
    assert len(man["partitions"]) == 6 and len(man["shards"]) == 4
    assert sum(r["n_docs"] for r in man["partitions"]) == 500
    assert man["stats"]["n_docs"] == 500


def test_add_equals_full_build(nrt_index, tmp_path):
    """main+deltas ranks exactly like a from-scratch build of the full
    corpus — same doc ids, same scores (stats are exact, not drifted)."""
    out, _, _ = nrt_index
    full = str(tmp_path / "full")
    _build_subset(full, _docs_table())
    a = search_bm25(out, QUERIES, k=15)
    b = search_bm25(full, QUERIES, k=15)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["query_id"].to_pylist() == b["query_id"].to_pylist()
    np.testing.assert_allclose(
        a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=1e-12
    )


def test_monotone_id_enforcement(nrt_index):
    out, _, _ = nrt_index
    tbl = _docs_table().slice(0, 3)  # old (small) ids — must be rejected
    with pytest.raises(ValueError, match="monotone"):
        add_docs(out, tbl)
    dup = pa.table({"doc_id": pa.array([10**9, 10**9]),
                    "text": pa.array(["a b", "c d"])})
    with pytest.raises(ValueError, match="duplicate"):
        add_docs(out, dup)


def test_delete_composes_with_adds(nrt_index):
    """Tombstoning a doc that arrived via add_docs excludes it from
    ranking exactly like a main-index doc."""
    out, _, _ = nrt_index
    base = search_bm25(out, [QUERIES[0]], k=10)
    top1 = base["doc_id"][0].as_py()
    delete_docs(out, [top1])
    try:
        after = search_bm25(out, [QUERIES[0]], k=10)
        assert top1 not in set(after["doc_id"].to_pylist())
    finally:
        os.remove(os.path.join(out, "tombstones.parquet"))


def test_reshard_folds_deltas(nrt_index, tmp_path):
    """reshard() is the NRT merge step: deltas fold into 2 main shards
    and the ranking is unchanged."""
    out, _, _ = nrt_index
    before = search_bm25(out, QUERIES, k=15)
    reshard(out, 2)
    man = load_manifest(out)
    assert len(man["shards"]) == 2
    shard_dirs = [d for d in os.listdir(os.path.join(out, "shards"))
                  if d.startswith("shard_") and not d.endswith(".tmp")]
    assert len(shard_dirs) == 2
    after = search_bm25(out, QUERIES, k=15)
    assert before.equals(after)
