"""Live index swap on the resident service — the
SourceBackend.ReplaceIndex contract (sourcebackend.go:198-246): a
running service moves to a new/rebuilt index atomically, old results
never leak through the cache, old actors are reaped."""

import pyarrow.parquet as pq
import pytest
import ray
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.deletes import compact_deletes, delete_docs
from dcs_ray.search import search_bm25
from dcs_ray.service import search_service

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"


def _build(out, limit=None):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    if limit is not None:
        docs = docs.limit(limit)
    build_index(docs, out, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))


def test_replace_index_swaps_to_new_dir(tmp_path):
    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    _build(v1, limit=200)   # v1: fewer docs → different ranking
    _build(v2)              # v2: full corpus
    svc = search_service(v1, num_cpus=0.5)
    try:
        r1 = svc.search([QUERY], k=10)
        assert r1.equals(search_bm25(v1, [QUERY], k=10))
        old_actors = list(svc.actors)
        info = svc.replace_index(v2)
        assert info["shards"] == 2
        r2 = svc.search([QUERY], k=10)
        assert r2.equals(search_bm25(v2, [QUERY], k=10))
        assert not r2.equals(r1), "swap must change the serving index"
        # cache cleared: the identical query re-ran on the new pool
        assert svc.cache_info()["entries"] == 1
        # old pool reaped
        for a in old_actors:
            with pytest.raises(Exception):
                ray.get(a.metrics.remote(), timeout=10)
    finally:
        svc.shutdown()


def test_replace_index_after_compaction_same_dir(tmp_path):
    """The steady-state maintenance flow: tombstone → compact (rewrites
    shard bytes under the same path) → replace_index() on the SAME dir
    reopens the compacted shards; results equal the Dataset path."""
    out = str(tmp_path / "idx")
    _build(out)
    svc = search_service(out, num_cpus=0.5)
    try:
        top1 = svc.search([QUERY], k=10)["doc_id"][0].as_py()
        delete_docs(out, [top1])
        compact_deletes(out)
        svc.replace_index()  # same dir, rebuilt bytes
        after = svc.search([QUERY], k=10)
        assert top1 not in set(after["doc_id"].to_pylist())
        assert after.equals(search_bm25(out, [QUERY], k=10))
    finally:
        svc.shutdown()


def test_replace_index_over_http(tmp_path):
    import json as _json
    import urllib.request

    from dcs_ray.http_api import ApiServer, make_api_key

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    _build(v1, limit=200)
    _build(v2)
    svc = search_service(v1, num_cpus=0.5)
    api = ApiServer(svc, "s", port=0).start()
    try:
        key = make_api_key("ops", "s")

        def get(path):
            req = urllib.request.Request(f"http://{api.host}:{api.port}{path}")
            req.add_header("x-dcs-apikey", key)
            return _json.loads(urllib.request.urlopen(req, timeout=60).read())

        body = get("/v1/replace-index?index=v2")
        assert body["shards"] == 2 and body["index_dir"].endswith("v2")
        rows = get("/v1/search?query=spark+merge+join&k=10")["results"]
        want = search_bm25(v2, [QUERY], k=10).to_pylist()
        assert [(r["rank"], r["doc_id"]) for r in rows] == [
            (r["rank"], r["doc_id"]) for r in want
        ]
        # traversal / unknown name rejected
        import urllib.error

        for bad in ("..", "nope", "..%2F..%2Fetc"):
            req = urllib.request.Request(
                f"http://{api.host}:{api.port}/v1/replace-index?index={bad}"
            )
            req.add_header("x-dcs-apikey", key)
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400
    finally:
        api.shutdown()
        svc.shutdown()
