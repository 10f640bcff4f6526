"""In-flight progress events (sourcebackend.go:383-412 /
querymanager_events.go:24-60): worker stages post cumulative counts to
a named bus with newest-wins snapshots + bounded history."""

import time

import pyarrow as pa
import pytest
import ray
import ray.data

from dcs_ray.progress import get_bus


def test_grep_progress_monotone_and_final_equals_results():
    """≥2 monotone in-flight events during a deliberately slowed query;
    the terminal event's counters equal the real result count."""
    from dcs_ray.grep import grep_regex

    # hostile pattern forces the per-doc budget → NFA re-run: slow
    # enough per doc that per-doc progress posts are meaningful
    n_docs = 12
    texts = [("x\n" + "a" * 600 + "b\n") * 1 + "aaa" for _ in range(n_docs)]
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
    })
    qid = "q-grep-test"
    bus = get_bus()
    ray.get(bus.clear.remote(qid))
    out = grep_regex(
        ray.data.from_arrow(docs), r"(a+)+$",
        progress=(qid, 0.0),  # report every doc (tests drop the 2 s cadence)
        match_timeout=0.05,  # fall to the NFA fast — the budget is not the point here
    ).to_pandas()
    # every doc ends with "aaa" → one matching line per doc
    assert len(out) == n_docs
    hist = ray.get(bus.history.remote(qid))
    assert len(hist) >= 2, "expected in-flight events, not just the final one"
    # monotone per shard-key, and seq strictly increasing
    by_shard: dict = {}
    for ev in hist:
        prev = by_shard.get(ev["shard"], -1)
        assert ev["processed"] >= prev, ev
        by_shard[ev["shard"]] = ev["processed"]
    snap = ray.get(bus.snapshot.remote(qid))
    assert snap["done"] is True
    assert snap["processed"] == snap["total"] == n_docs
    assert snap["n_results"] == len(out)
    ray.get(bus.clear.remote(qid))


def test_service_progress_per_shard_events(tmp_path):
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.service import search_service

    out = str(tmp_path / "idx")
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    build_index(docs, out, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))
    svc = search_service(out, num_cpus=0.5)
    try:
        qid = "q-svc-test"
        bus = get_bus()
        ray.get(bus.clear.remote(qid))
        t = svc.search(["spark merge join"], k=5, query_id=qid)
        assert t.num_rows == 5
        snap = ray.get(bus.snapshot.remote(qid))
        assert snap["done"] is True
        assert len(snap["shards"]) == 2  # one terminal event per shard
        hist = ray.get(bus.history.remote(qid))
        # each shard: a start (0/1) event then a done (1/1) event
        assert len(hist) >= 4
        for ev in snap["shards"]:
            assert ev["processed"] == ev["total"] == 1 and ev["done"]
        # a cached repeat still emits a terminal event
        ray.get(bus.clear.remote(qid))
        svc.search(["spark merge join"], k=5, query_id=qid)
        snap2 = ray.get(bus.snapshot.remote(qid))
        assert snap2["done"] is True and snap2["shards"][0]["shard"] == "cache"
        ray.get(bus.clear.remote(qid))
    finally:
        svc.shutdown()
