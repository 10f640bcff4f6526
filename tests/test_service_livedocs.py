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
