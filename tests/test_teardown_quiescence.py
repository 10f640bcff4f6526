"""Provably-quiescent serving teardown (VERDICT r4 #3): shutting down
the HTTP front door and the shard-actor pool must leave no live
request/serve threads and no live actors — the reference's ReplaceIndex
closes the old index before returning
(``internal/sourcebackend/sourcebackend.go:198-251``); a serving
process cycling ``replace_index`` + server restarts relies on the same
contract here."""

import json
import threading
import time
import urllib.request

import pyarrow as pa
import pytest
import ray
import ray.data

from dcs_ray.http_api import ApiServer, make_api_key
from dcs_ray.index import IndexConfig, build_index
from dcs_ray.service import search_service

SECRET = b"quiesce-secret"


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quiesce") / "idx")
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    build_index(
        docs,
        out,
        IndexConfig(
            num_partitions=2, num_shards=2, mode="words",
            id_col="doc_id", dedup_latest=False,
        ),
    )
    return out


def _alive_anon_threads(before: set) -> list:
    """New still-alive threads created since ``before``, excluding
    Ray/grpc internals (named); our serve + handler threads are
    default-named 'Thread-N'."""
    return [
        t
        for t in threading.enumerate()
        if t not in before and t.is_alive() and t.name.startswith("Thread-")
    ]


def test_server_and_service_shutdown_quiescent(idx):
    before = set(threading.enumerate())
    svc = search_service(idx, num_cpus=0.5)
    actor = svc.actors[0]
    api = ApiServer(svc, SECRET, port=0).start()
    key = make_api_key("quiesce", SECRET)
    for q in ("spark", "merge", "join"):
        req = urllib.request.Request(
            f"http://{api.host}:{api.port}/v1/search?query={q}&k=3"
        )
        req.add_header("x-dcs-apikey", key)
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["results"]

    api.shutdown()
    # the serve thread is joined unconditionally and handler threads are
    # tracked non-daemon threads joined by server_close — nothing of the
    # server survives the call (handler threads need a beat to fully
    # exit their bootstrap after the join returns their run())
    assert api._thread is None
    deadline = time.monotonic() + 5.0
    while _alive_anon_threads(before) and time.monotonic() < deadline:
        time.sleep(0.05)
    assert _alive_anon_threads(before) == []

    svc.shutdown()
    assert svc.actors == []
    # death is confirmed, not assumed: a post-shutdown probe on the old
    # pool must raise immediately
    with pytest.raises(ray.exceptions.RayActorError):
        ray.get(actor.metrics.remote(), timeout=30)


def test_replace_index_confirms_old_pool_dead(idx):
    svc = search_service(idx, num_cpus=0.5)
    try:
        old = list(svc.actors)
        info = svc.replace_index(idx)  # swap onto the same dir
        assert info["shards"] == len(svc.actors)
        for a in old:
            with pytest.raises(ray.exceptions.RayActorError):
                ray.get(a.metrics.remote(), timeout=30)
        # the new pool serves
        t = svc.search(["spark merge"], k=3)
        assert t.num_rows > 0
    finally:
        svc.shutdown()


def test_shutdown_races_inflight_requests(idx):
    """shutdown() while requests are in flight: every handler drains
    (no RuntimeError from the bounded join), already-accepted requests
    complete or fail with a socket error — never a hang, never a
    survivor thread."""
    import concurrent.futures

    svc = search_service(idx, num_cpus=0.5)
    api = ApiServer(svc, SECRET, port=0).start()
    key = make_api_key("race", SECRET)

    def one(q):
        req = urllib.request.Request(
            f"http://{api.host}:{api.port}/v1/search?query={q}&k=3"
        )
        req.add_header("x-dcs-apikey", key)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return ("ok", len(json.loads(r.read())["results"]))
        except Exception as e:
            return ("err", type(e).__name__)

    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            futs = [ex.submit(one, q) for q in ("spark", "merge", "join") * 4]
            time.sleep(0.05)  # let several land in-flight
            api.shutdown()  # must drain, not hang, not raise
            results = [f.result(timeout=60) for f in futs]
        assert any(s == "ok" for s, _ in results)  # some completed
        assert not any(t.is_alive() for t in api._handler_threads)
        assert api._thread is None
    finally:
        svc.shutdown()


def test_second_server_lifecycle_reuses_cleanly(idx):
    """start→shutdown→start→shutdown on one service: the restart path a
    serving process cycling replace_index + server restarts exercises."""
    svc = search_service(idx, num_cpus=0.5)
    try:
        for _ in range(2):
            api = ApiServer(svc, SECRET, port=0).start()
            key = make_api_key("cycle", SECRET)
            req = urllib.request.Request(
                f"http://{api.host}:{api.port}/v1/search?query=spark&k=3"
            )
            req.add_header("x-dcs-apikey", key)
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read())["results"]
            api.shutdown()
            assert api._thread is None
    finally:
        svc.shutdown()
