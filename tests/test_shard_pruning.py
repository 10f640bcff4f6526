"""Filter-dimension shard pruning (``search.prune_shards``): zone maps
recorded in segment/shard lineage let an include filter or a doc_ids
candidate set skip whole shards from metadata alone — and pruning must
never change results, only the fan-out size."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import (
    _shard_lineage_cached,
    prune_shards,
    search_bm25,
    shard_paths,
)

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"


@pytest.fixture(scope="module")
def clustered(tmp_path_factory):
    """Index whose doc ids are REASSIGNED in (source, doc_id) order, so
    id-range partitions align with sources and the zone maps actually
    separate — the physical layout a source-routed ingest produces."""
    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"]
    ).sort_by([("source", "ascending"), ("doc_id", "ascending")])
    remapped = pa.table(
        {
            "doc_id": pa.array(np.arange(len(tbl), dtype=np.int64)),
            "text": tbl["text"],
            "source": tbl["source"],
            "n_chars": tbl["n_chars"],
        }
    )
    out = str(tmp_path_factory.mktemp("zp") / "idx")
    build_index(
        ray.data.from_arrow(remapped), out,
        IndexConfig(
            num_partitions=8, num_shards=2, mode="words", id_col="doc_id",
            dedup_latest=False, meta_cols=("source", "n_chars"),
        ),
    )
    return out, remapped


def test_zone_maps_recorded(clustered):
    out, _ = clustered
    for p in shard_paths(out):
        lin = _shard_lineage_cached(p)
        zones = lin.get("meta_values") or {}
        assert "source" in zones and len(zones["source"]) >= 1
        # integer columns zone too when cardinality permits (at this
        # scale n_chars has ≤64 distinct values per segment)
        assert "n_chars" in zones


def test_include_filter_prunes_shards(clustered):
    out, _ = clustered
    paths = shard_paths(out)
    pruned = prune_shards(paths, {"include": {"source": ["src0"]}})
    assert len(pruned) == 1  # src0 = the lowest id range = shard 0 only
    assert prune_shards(paths, {"include": {"source": ["src0", "src9"]}}) == paths
    assert prune_shards(paths, {"include": {"source": ["nosuch"]}}) == []
    # a column WITHOUT a zone map is unprunable → every shard kept
    assert prune_shards(paths, {"include": {"unzoned_col": [1]}}) == paths
    assert prune_shards(paths, None) == paths


def test_doc_ids_filter_prunes_by_range(clustered):
    out, _ = clustered
    paths = shard_paths(out)
    assert len(prune_shards(paths, {"doc_ids": [0, 1, 2]})) == 1
    assert prune_shards(paths, {"doc_ids": []}) == []


def test_pruned_search_results_identical(clustered):
    """Pruning is transparent: the filtered ranking equals the full
    ranking restricted to the filter's docs (scores are per-doc, so a
    filter can never change a surviving doc's score)."""
    out, remapped = clustered
    got = search_bm25(out, [QUERY], k=10, filters={"include": {"source": ["src0"]}})
    full = search_bm25(out, [QUERY], k=len(remapped))
    src = dict(zip(remapped["doc_id"].to_pylist(), remapped["source"].to_pylist()))
    keep = [src[d] == "src0" for d in full["doc_id"].to_pylist()]
    expect = full.filter(pa.array(keep)).slice(0, 10)
    assert got["doc_id"].to_pylist() == expect["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(), expect["score"].to_numpy()
    )
    assert len(got) > 0
    # a filter no shard can satisfy → empty result, zero tasks
    none = search_bm25(out, [QUERY], k=10, filters={"include": {"source": ["nosuch"]}})
    assert len(none) == 0
