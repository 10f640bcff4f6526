"""SearchService under the live-docs model: tombstones fold into every
resident query (with cache keys that can't alias), and the grammar
front door serves from the warm pool."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.deletes import delete_docs
from dcs_ray.search import search_bm25, search_query
from dcs_ray.service import search_service

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("svc") / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_index(docs, out, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))
    svc = search_service(out)
    yield out, svc
    svc.shutdown()


def test_service_folds_tombstones(served):
    out, svc = served
    base = svc.search([QUERY], k=10)
    top1 = base["doc_id"][0].as_py()
    delete_docs(out, [top1])
    after = svc.search([QUERY], k=10)
    assert top1 not in set(after["doc_id"].to_pylist())
    # identical to the Dataset path under the same tombstones
    assert after.equals(search_bm25(out, [QUERY], k=10))
    # the pre-delete cached entry must NOT be served for the new state,
    # and re-asking post-delete must hit the cache
    h0 = svc.cache_info()["hits"]
    again = svc.search([QUERY], k=10)
    assert again.equals(after)
    assert svc.cache_info()["hits"] == h0 + 1


def test_cache_key_exact_for_large_arrays(served):
    """Two not_doc_ids arrays that differ only in the middle (where
    numpy's repr truncates) must produce different results — the repr
    key would have aliased them."""
    out, svc = served
    base = svc.search([QUERY], k=10, filters=None)
    ids = base["doc_id"].to_pylist()
    filler = np.arange(10_000, 12_000, dtype=np.uint64)
    a = np.sort(np.append(filler, np.uint64(ids[0])))
    b = np.sort(np.append(filler, np.uint64(ids[1])))
    ra = svc.search([QUERY], k=10, filters={"not_doc_ids": a})
    rb = svc.search([QUERY], k=10, filters={"not_doc_ids": b})
    assert ids[0] not in set(ra["doc_id"].to_pylist())
    assert ids[1] in set(ra["doc_id"].to_pylist())
    assert ids[1] not in set(rb["doc_id"].to_pylist())
    assert ids[0] in set(rb["doc_id"].to_pylist())


def test_service_grammar_front_door(served):
    out, svc = served
    raw = "spark merge join -window"
    got = svc.query(raw, k=10)
    want = search_query(out, raw, k=10)
    assert got.equals(want)


def test_service_prunes_actor_fanout(tmp_path_factory):
    """On a source-clustered index a source-filtered resident query
    messages ONLY the matching shard's actor — the skipped shard's
    per-shard query counter stands still — and results are unchanged."""
    import pyarrow as pa

    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    ).sort_by([("source", "ascending"), ("doc_id", "ascending")])
    remapped = pa.table(
        {
            "doc_id": pa.array(np.arange(len(tbl), dtype=np.int64)),
            "text": tbl["text"],
            "source": tbl["source"],
        }
    )
    out = str(tmp_path_factory.mktemp("svcz") / "idx")
    build_index(
        ray.data.from_arrow(remapped), out,
        IndexConfig(
            num_partitions=8, num_shards=2, mode="words", id_col="doc_id",
            dedup_latest=False, meta_cols=("source",),
        ),
    )
    filters = {"include": {"source": ["src0"]}}
    # Dataset-path reference BEFORE the pool exists: with the module
    # fixture's service also alive, 4 one-CPU actors would hold every
    # conftest CPU and starve map_batches tasks (deadlock) — so this
    # pool also runs at half-CPU actors
    want = search_bm25(out, [QUERY], k=10, filters=filters)
    svc = search_service(out, num_cpus=0.5)
    try:
        got = svc.search([QUERY], k=10, filters=filters, use_cache=False)
        assert got.equals(want) and len(got) > 0
        m = svc.metrics().to_pydict()
        served = dict(zip(m["shard"], m["n_queries"]))
        assert min(served.values()) == 0 and max(served.values()) > 0
    finally:
        svc.shutdown()


def test_service_survives_actor_crash(served):
    """A killed shard actor restarts (segment re-opens in __init__) and
    the next query returns bit-identical results — the availability
    contract of a long-lived serving pool."""
    import ray

    out, svc = served
    before = svc.search([QUERY], k=10, use_cache=False)
    ray.kill(svc.actors[0], no_restart=False)
    after = svc.search([QUERY], k=10, use_cache=False)
    assert after.equals(before)
