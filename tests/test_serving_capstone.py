"""Capstone serving flow: a live deployment's full day in one test —
build → serve over HTTP → NRT delta add → tombstone delete → compact →
live ReplaceIndex swap → serve again, every step verified against the
Dataset path.  This is the composition the individual pieces
(test_nrt, test_deletes, test_replace_index, test_http_api) promise;
here they must hold strung together on one running service."""

import json
import urllib.request

import pyarrow as pa
import pytest
import ray
import ray.data

from dcs_ray.http_api import ApiServer, make_api_key
from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.deletes import compact_deletes, delete_docs
from dcs_ray.index.nrt import add_docs
from dcs_ray.search import search_bm25
from dcs_ray.service import search_service

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"
SECRET = "capstone"


def _http(api, key, path):
    req = urllib.request.Request(f"http://{api.host}:{api.port}{path}")
    req.add_header("x-dcs-apikey", key)
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _rows(body):
    return [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in body["results"]]


def _want(idx, q=QUERY, k=10):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in search_bm25(idx, [q], k=k).to_pylist()
    ]


def test_continuous_crawl_serve_lifecycle(tmp_path):
    idx = str(tmp_path / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_index(docs, idx, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))
    svc = search_service(idx, num_cpus=0.5)
    api = ApiServer(svc, SECRET, port=0).start()
    key = make_api_key("ops", SECRET)
    try:
        # day 0: serve the fresh index
        base = _http(api, key, f"/v1/search?query={QUERY.replace(' ', '+')}&k=10")
        assert _rows(base) == _want(idx)

        # crawl tick: NRT delta lands new docs that beat the old top hit
        import pyarrow.parquet as pq

        id_max = max(r["doc_id"] for r in base["results"])
        head = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).slice(0, 50)
        boosted = pa.table({
            "doc_id": pa.array(
                [2_000_000 + i for i in range(3)], pa.int64()
            ),
            "text": pa.array([
                "spark merge join spark merge join spark merge join",
                "spark merge join merge join",
                str(head["text"][0].as_py()),
            ]),
        })
        add_docs(idx, boosted)
        # deletes fold live; the delta serves after a swap (NRT segment
        # is a new shard dir — structural, so the pool must reopen)
        svc.replace_index()
        after_add = _http(api, key, f"/v1/search?query={QUERY.replace(' ', '+')}&k=10")
        assert _rows(after_add) == _want(idx)
        assert after_add["results"][0]["doc_id"] == 2_000_000, \
            "the spam-dense delta doc must rank first"

        # moderation: tombstone the planted docs, serve immediately
        delete_docs(idx, [2_000_000, 2_000_001])
        live = _http(api, key, f"/v1/search?query={QUERY.replace(' ', '+')}&k=10")
        assert _rows(live) == _want(idx)
        got_ids = {r["doc_id"] for r in live["results"]}
        assert 2_000_000 not in got_ids and 2_000_001 not in got_ids

        # maintenance: physical compaction + live swap on the same dir
        compact_deletes(idx)
        swap = _http(api, key, "/v1/replace-index")
        assert swap["shards"] >= 2
        final = _http(api, key, f"/v1/search?query={QUERY.replace(' ', '+')}&k=10")
        assert _rows(final) == _want(idx)
        # scores legitimately shift after compaction (tombstoned docs
        # leave N/avgdl/df — the Lucene stats model), which can reorder
        # the top-k boundary; the invariants are Dataset-path identity
        # (above) and the planted docs staying gone
        final_ids = {r["doc_id"] for r in final["results"]}
        assert 2_000_000 not in final_ids and 2_000_001 not in final_ids
        # progress still flows on the swapped pool
        _http(api, key,
              f"/v1/search?query={QUERY.replace(' ', '+')}&k=10&query_id=cap")
        snap = _http(api, key, "/v1/progress?query_id=cap")
        assert snap["done"]
    finally:
        api.shutdown()
        svc.shutdown()
