"""Continuous-ingest feeder (the dcs-feeder role): drop-directory
parquet files become NRT delta adds; done/failed routing, crash-window
resume, and a serving pool that picks deltas up via the live swap."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from dcs_ray.feeder import feed_once
from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import search_bm25
from dcs_ray.service import search_service

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"


def _base(tmp_path):
    idx = str(tmp_path / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_index(docs, idx, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))
    return idx


def _delta(path, ids, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)}),
        path,
    )


def test_feed_once_ingests_in_order_and_routes(tmp_path):
    idx = _base(tmp_path)
    inc = str(tmp_path / "incoming")
    os.makedirs(inc)
    _delta(f"{inc}/000.parquet", [10_000, 10_001],
           ["spark merge join delta one", "other text"])
    _delta(f"{inc}/001.parquet", [10_002],
           ["spark merge join delta two"])
    # a non-monotone file (ids below id_max but NOT fully ingested —
    # overlapping range) must fail cleanly, not wedge the tick
    _delta(f"{inc}/002.parquet", [5, 20_000], ["bad", "bad"])

    res = feed_once(idx, inc)
    assert res == {"ingested": 2, "skipped_done": 0, "failed": 1, "n_docs": 3}
    assert sorted(os.listdir(f"{inc}/done")) == ["000.parquet", "001.parquet"]
    assert "002.parquet" in os.listdir(f"{inc}/failed")
    assert os.path.exists(f"{inc}/failed/002.parquet.error")

    got = search_bm25(idx, [QUERY], k=50)
    ids = set(got["doc_id"].to_pylist())
    assert 10_000 in ids and 10_002 in ids

    # idempotent second tick: nothing left
    assert feed_once(idx, inc) == {
        "ingested": 0, "skipped_done": 0, "failed": 0, "n_docs": 0,
    }


def test_feed_crash_window_resume(tmp_path):
    """A file whose add landed but whose rename didn't (crash between
    the two) is recognized by its max id and moved to done WITHOUT a
    double-add."""
    idx = _base(tmp_path)
    inc = str(tmp_path / "incoming")
    os.makedirs(inc)
    _delta(f"{inc}/000.parquet", [10_000], ["spark merge join delta"])
    assert feed_once(idx, inc)["ingested"] == 1
    # simulate the crash replay: same file reappears in incoming
    os.replace(f"{inc}/done/000.parquet", f"{inc}/000.parquet")
    res = feed_once(idx, inc)
    assert res["ingested"] == 0 and res["skipped_done"] == 1
    # exactly one hit for the delta doc — no duplicate posting
    got = search_bm25(idx, [QUERY], k=50)
    assert got["doc_id"].to_pylist().count(10_000) == 1


def test_feed_updates_serving_pool(tmp_path):
    idx = _base(tmp_path)
    inc = str(tmp_path / "incoming")
    os.makedirs(inc)
    svc = search_service(idx, num_cpus=0.5)
    try:
        before = set(svc.search([QUERY], k=10)["doc_id"].to_pylist())
        assert 10_000 not in before
        _delta(f"{inc}/000.parquet", [10_000],
               ["spark merge join spark merge join spark merge join"])
        feed_once(idx, inc, svc=svc)
        after = svc.search([QUERY], k=10)
        assert after["doc_id"][0].as_py() == 10_000  # delta serves, ranks first
        assert after.equals(search_bm25(idx, [QUERY], k=10))
    finally:
        svc.shutdown()


def test_feed_with_alerts_only_new_docs(tmp_path):
    """Alerts fire for THIS tick's ingested docs only; an empty tick
    yields an empty alert table."""
    from dcs_ray.feeder import feed_with_alerts

    idx = _base(tmp_path)
    inc = str(tmp_path / "incoming")
    os.makedirs(inc)
    queries = [["spark", "merge"], ["zebra"]]
    res, alerts = feed_with_alerts(idx, inc, queries)
    assert res["ingested"] == 0 and alerts.num_rows == 0

    _delta(f"{inc}/000.parquet", [10_000, 10_001],
           ["spark merge everywhere", "zebra zebra"])
    res, alerts = feed_with_alerts(idx, inc, queries)
    assert res["ingested"] == 1
    got = sorted(zip(alerts["doc_id"].to_pylist(), alerts["query_id"].to_pylist()))
    assert got == [(10_000, 0), (10_001, 1)]
    # the base corpus (which contains 'spark merge' docs) did NOT alert:
    # only stream docs are probed
    assert all(d >= 10_000 for d, _q in got)
