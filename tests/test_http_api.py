"""HTTP front door e2e: real sockets → resident pool → rows identical
to search_bm25 (the dcs /v1/search + x-dcs-apikey surface,
cmd/dcs-web/api.go:213-332 / internal/apikeys/apikeys.go:74-80)."""

import json
import urllib.error
import urllib.request

import pytest
import ray.data

from dcs_ray.http_api import ApiServer, decode_api_key, make_api_key
from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import search_bm25
from dcs_ray.service import search_service

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"
SECRET = "test-secret"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("http") / "idx")
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    build_index(docs, out, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False, meta_cols=("source",),
    ))
    svc = search_service(out, num_cpus=0.5)
    api = ApiServer(svc, SECRET, port=0).start()
    yield out, api
    api.shutdown()
    svc.shutdown()


def _get(api, path, key=None, raw=False):
    req = urllib.request.Request(f"http://{api.host}:{api.port}{path}")
    if key:
        req.add_header("x-dcs-apikey", key)
    with urllib.request.urlopen(req, timeout=60) as r:
        body = r.read()
        return body if raw else json.loads(body)


def test_api_key_roundtrip_and_tamper():
    tok = make_api_key("salsa!alice", SECRET, created=1700000000)
    k = decode_api_key(tok, SECRET)
    assert k == {"s": "salsa!alice", "c": 1700000000}
    # signature is over the payload: any bit flip must invalidate
    assert decode_api_key(tok[:-2] + "AA", SECRET) is None
    assert decode_api_key(tok, "other-secret") is None
    assert decode_api_key("garbage", SECRET) is None
    assert decode_api_key("", SECRET) is None


def test_search_rows_identical_to_search_bm25(server):
    out, api = server
    key = make_api_key("tester", SECRET)
    body = _get(api, f"/v1/search?query={QUERY.replace(' ', '+')}&k=10", key)
    want = search_bm25(out, [QUERY], k=10).to_pylist()
    got = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in body["results"]]
    want_cmp = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in want]
    assert got == want_cmp
    assert body["subject"] == "tester"
    assert body["latency_ms"] >= 0


def test_auth_required_and_bad_key_forbidden(server):
    _, api = server
    for key in (None, "bogus.token"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(api, "/v1/search?query=spark", key)
        assert e.value.code == 403


def test_missing_query_param_400(server):
    _, api = server
    key = make_api_key("tester", SECRET)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(api, "/v1/search", key)
    assert e.value.code == 400


def test_per_package_endpoint_groups_by_source(server):
    out, api = server
    key = make_api_key("tester", SECRET)
    body = _get(
        api, f"/v1/searchperpackage?query={QUERY.replace(' ', '+')}&per_group=2", key
    )
    assert body["packages"], "expected grouped results"
    for pkg in body["packages"]:
        assert len(pkg["results"]) <= 2
        assert all(r["group"] == pkg["package"] for r in pkg["results"])


def test_metrics_endpoint_prometheus_text(server):
    _, api = server
    text = _get(api, "/metrics", raw=True).decode()
    assert "dcsray_http_requests_total" in text
    assert "dcsray_shard_queries_total{" in text
    # counters moved by the earlier requests in this module
    n = int(
        next(l for l in text.splitlines()
             if l.startswith("dcsray_http_queries_successful")).split()[-1]
    )
    assert n >= 2


def test_instant_search_page(server):
    """GET / serves the self-contained instant-search page (the
    dcs-web UI surface) — open like /metrics, with every data call it
    makes going through the key-gated /v1 endpoints."""
    _, api = server
    req = urllib.request.Request(f"http://{api.host}:{api.port}/")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/html")
        body = r.read().decode()
    assert 'id="q"' in body and "/v1/search" in body and "/v1/suggest" in body
    # same page at /instant
    req = urllib.request.Request(f"http://{api.host}:{api.port}/instant")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.read().decode() == body


def test_metrics_latency_histogram(server):
    """Per-endpoint query-latency histogram (the reference's per-query
    Prometheus histogram, querymanager.go:44-56): decade buckets
    1 ms..1000 s, CUMULATIVE and monotone, count == +Inf bucket,
    in-flight gauge exposed."""
    import re

    _, api = server
    key = make_api_key("tester", SECRET)
    for q in ("spark", "merge", "join"):
        _get(api, f"/v1/search?query={q}&k=3", key)
    text = _get(api, "/metrics", raw=True).decode()
    # the in-flight gauge: ONE name (no alias), zero when idle
    assert "dcsray_http_inflight 0" in text
    assert "dcsray_queries_inflight" not in text

    pat = re.compile(
        r'dcs_query_seconds_bucket\{endpoint="([^"]+)",le="([^"]+)"\} (\d+)'
    )
    per_ep: dict[str, list[tuple[float, int]]] = {}
    for ep, le, n in pat.findall(text):
        per_ep.setdefault(ep, []).append(
            (float("inf") if le == "+Inf" else float(le), int(n))
        )
    assert "/v1/search" in per_ep
    for ep, rows in per_ep.items():
        les = [le for le, _ in rows]
        counts = [n for _, n in rows]
        assert les == sorted(les) and les[-1] == float("inf"), ep
        assert les[:-1] == [0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0], ep
        # cumulative monotone
        assert all(a <= b for a, b in zip(counts, counts[1:])), (ep, counts)
        cnt = int(
            next(
                l for l in text.splitlines()
                if l.startswith(f'dcs_query_seconds_count{{endpoint="{ep}"}}')
            ).split()[-1]
        )
        assert cnt == counts[-1], ep
        s = float(
            next(
                l for l in text.splitlines()
                if l.startswith(f'dcs_query_seconds_sum{{endpoint="{ep}"}}')
            ).split()[-1]
        )
        assert s >= 0.0
    assert per_ep["/v1/search"][-1][1] >= 3  # the 3 queries above landed


def test_grammar_query_through_http(server):
    out, api = server
    key = make_api_key("tester", SECRET)
    body = _get(api, "/v1/search?query=spark+-join&k=5", key)
    from dcs_ray.search import search_query

    want = search_query(out, "spark -join", k=5).to_pylist()
    got = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in body["results"]]
    assert got == [{f: r[f] for f in ("rank", "doc_id", "score")} for r in want]


def test_cli_serve_fresh_process(server, tmp_path):
    """The VERDICT done-criterion: start the server in a FRESH process
    via the CLI, query it over HTTP, rows identical to search_bm25."""
    import os
    import subprocess
    import sys
    import time

    out, _ = server
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-m", "dcs_ray", "serve", out,
         "--secret", SECRET, "--num-cpus", "0.5", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo", env=env,
    )
    try:
        line = None
        t0 = time.time()
        while time.time() - t0 < 120:
            line = proc.stdout.readline()
            if line.startswith("{"):
                break
        info = json.loads(line)
        key = make_api_key("cli-tester", SECRET)
        req = urllib.request.Request(
            f"http://{info['host']}:{info['port']}/v1/search?query=spark+merge+join&k=10"
        )
        req.add_header("x-dcs-apikey", key)
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        want = search_bm25(out, [QUERY], k=10).to_pylist()
        got = [{f: x[f] for f in ("rank", "doc_id", "score")} for x in body["results"]]
        assert got == [{f: x[f] for f in ("rank", "doc_id", "score")} for x in want]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_suggest_endpoint_prefix_and_spell(server):
    out, api = server
    key = make_api_key("tester", SECRET)
    # prefix completion from the index vocabulary
    body = _get(api, "/v1/suggest?q=spar&k=5", key)
    assert body["source"] == "prefix"
    assert body["completions"], "expected prefix completions"
    assert all(c["term"].startswith("spar") for c in body["completions"])
    dfs = [c["df"] for c in body["completions"]]
    assert dfs == sorted(dfs, reverse=True)
    # dead-end prefix → SymSpell distance-1 fallback
    body2 = _get(api, "/v1/suggest?q=sparkk", key)
    assert body2["source"] == "spell"
    assert any(c["term"] == "spark" for c in body2["completions"])
    # auth enforced
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(api, "/v1/suggest?q=spar")
    assert e.value.code == 403


def test_search_snippets_param(server):
    out, api = server
    api2 = ApiServer(
        api.svc, SECRET, port=0,
        docs_path=f"{SF}/documents.parquet",
    ).start()
    try:
        key = make_api_key("tester", SECRET)
        body = _get(
            api2, f"/v1/search?query={QUERY.replace(' ', '+')}&k=5&snippets=1", key
        )
        assert body["results"]
        assert all("snippet" in r for r in body["results"])
        # the top hit's snippet contains a query term
        assert any(
            w in body["results"][0]["snippet"] for w in QUERY.split()
        ), body["results"][0]
    finally:
        api2.shutdown()


def test_concurrent_requests_thread_safety(server):
    """ThreadingHTTPServer handles requests concurrently; the service
    lock must keep the finished-query cache coherent — 24 parallel
    requests across 3 distinct queries all return rank-identical rows."""
    import concurrent.futures

    out, api = server
    key = make_api_key("tester", SECRET)
    queries = ["spark merge join", "customer window batch", "spark index"]
    want = {
        q: [(r["rank"], r["doc_id"], r["score"])
            for r in search_bm25(out, [q], k=5).to_pylist()]
        for q in queries
    }

    def one(i):
        q = queries[i % len(queries)]
        body = _get(api, f"/v1/search?query={q.replace(' ', '+')}&k=5", key)
        return q, [(r["rank"], r["doc_id"], r["score"]) for r in body["results"]]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        for q, got in ex.map(one, range(24)):
            assert got == want[q], q


def test_literal_and_regex_match_modes_over_http(tmp_path):
    """match_mode=literal / regex need the trigram index + docs path —
    rows must equal the Dataset-path verifiers (dcs literal=1 flip)."""
    import ray

    from dcs_ray.grep import search_regex_fused
    from dcs_ray.search import search_literal
    from dcs_ray.service import search_service

    tri = str(tmp_path / "tri")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_index(docs, tri, IndexConfig(
        num_partitions=4, num_shards=2, mode="trigram", id_col="doc_id",
        dedup_latest=False, positional=True,
    ))
    words = str(tmp_path / "words")
    build_index(docs, words, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False,
    ))
    svc = search_service(words, num_cpus=0.5)
    api = ApiServer(
        svc, SECRET, port=0, trigram_index_dir=tri,
        docs_path=f"{SF}/documents.parquet",
    ).start()
    try:
        key = make_api_key("tester", SECRET)
        lit = _get(api, "/v1/search?query=spark+merge&match_mode=literal", key)
        want_docs = set(
            search_literal(tri, ["spark merge"])["doc_id"].to_pylist()
        )
        assert {r["doc_id"] for r in lit["results"]} == want_docs
        assert want_docs, "literal fixture must match something"

        rx = _get(api, "/v1/search?query=sp%5Baeiou%5Drk+m%5Cw%2B&match_mode=regex", key)
        import pyarrow as pa2

        ds = search_regex_fused(tri, f"{SF}/documents.parquet", r"sp[aeiou]rk m\w+")
        want = pa2.concat_tables(
            [pa2.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
        )
        assert {r["doc_id"] for r in rx["results"]} == set(want["doc_id"].to_pylist())
    finally:
        api.shutdown()
        svc.shutdown()


def test_wildcard_fuzzy_operators_over_http(server):
    """Lucene-style expansion operators ride the same front door: the
    service's grammar plan expands them against its own index vocab."""
    out, api = server
    key = make_api_key("tester", SECRET)
    from dcs_ray.search import search_query

    body = _get(api, "/v1/search?query=spa*+merge&k=5", key)
    want = search_query(out, "spa* merge", k=5).to_pylist()
    got = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in body["results"]]
    assert got == [{f: r[f] for f in ("rank", "doc_id", "score")} for r in want]

    body2 = _get(api, "/v1/search?query=sprk~&k=5", key)
    want2 = search_query(out, "sprk~", k=5).to_pylist()
    got2 = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in body2["results"]]
    assert got2 == [{f: r[f] for f in ("rank", "doc_id", "score")} for r in want2]
    assert len(got2) > 0  # the typo really recovered 'spark' docs


def test_explain_param_over_http(server):
    out, api = server
    key = make_api_key("tester", SECRET)
    body = _get(api, f"/v1/search?query={QUERY.replace(' ', '+')}&k=5&explain=1", key)
    assert body["results"], "expected hits"
    for r in body["results"]:
        assert r["explain"], f"doc {r['doc_id']} missing breakdown"
        total = sum(e["contribution"] for e in r["explain"])
        assert abs(total - r["score"]) < 5e-6
        for e in r["explain"]:
            assert e["term"] in QUERY.split() and e["tf"] >= 1


def test_explain_aligns_with_grammar_queries(server):
    """The review-found desync case: explain=1 on a GRAMMAR query must
    describe the served rows (planned/expanded terms), not a second
    ranking of the raw string."""
    out, api = server
    key = make_api_key("tester", SECRET)
    for q in ("spark+-join", "spa*+merge"):
        body = _get(api, f"/v1/search?query={q}&k=5&explain=1", key)
        assert body["results"], q
        for r in body["results"]:
            assert r["explain"], (q, r["doc_id"])
            total = sum(e["contribution"] for e in r["explain"])
            assert abs(total - r["score"]) < 5e-6, (q, r["doc_id"], total, r["score"])
            assert all(e["term"] != "join" for e in r["explain"])  # negated term never scores


def test_msearch_batched_queries(server):
    """One socket round trip for a '|'-separated batch; per-query rows
    identical to individual /v1/search calls."""
    out, api = server
    key = make_api_key("tester", SECRET)
    body = _get(api, "/v1/msearch?queries=spark+merge|join&k=5", key)
    assert body["queries"] == ["spark merge", "join"]
    assert len(body["results"]) == 2
    for q, rows in zip(body["queries"], body["results"]):
        single = _get(api, f"/v1/search?query={q.replace(' ', '+')}&k=5", key)
        want = [
            {f: r[f] for f in ("rank", "doc_id", "score")}
            for r in single["results"]
        ]
        got = [{f: r[f] for f in ("rank", "doc_id", "score")} for r in rows]
        assert got == want


def test_rate_limit_per_subject(tmp_path):
    """Token bucket per api-key subject: burst passes, the next request
    429s, a different subject is unaffected, and tokens refill."""
    import time as _time
    import urllib.error

    from dcs_ray.http_api import ApiServer
    from dcs_ray.service import search_service
    from dcs_ray.index import IndexConfig, build_index
    import ray.data

    out = str(tmp_path / "rlidx")
    build_index(
        ray.data.read_parquet(f"{SF}/documents.parquet"), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    svc = search_service(out, num_cpus=0.5)
    # rate low enough that refill during the test window is negligible
    # even on a throttled host (0.01/s = one token per 100 s)
    api = ApiServer(svc, SECRET, port=0, rate_limit=0.01, rate_burst=2.0).start()
    try:
        alice = make_api_key("alice", SECRET)
        bob = make_api_key("bob", SECRET)
        for _ in range(2):
            _get(api, "/v1/search?query=spark&k=3", alice)
        try:
            _get(api, "/v1/search?query=spark&k=3", alice)
            raise AssertionError("third burst request should have been throttled")
        except urllib.error.HTTPError as e:
            assert e.code == 429
        # an unrelated subject has its own bucket
        _get(api, "/v1/search?query=spark&k=3", bob)
        assert api.counters["queries_throttled"] == 1
        # a batched msearch is charged PER QUERY: bob has 1 token left,
        # a 2-query batch must 429 rather than smuggle past the quota
        try:
            _get(api, "/v1/msearch?queries=spark|merge&k=3", bob)
            raise AssertionError("2-query batch on 1 token should 429")
        except urllib.error.HTTPError as e:
            assert e.code == 429
        _get(api, "/v1/search?query=merge&k=3", bob)  # single still fits
        # a batch larger than the bucket CAPACITY could never be
        # admitted however long the client waits — that's a 400 naming
        # the cap, not an eternal generic 429 (ADVICE r4)
        try:
            _get(api, "/v1/msearch?queries=a|b|c&k=3", bob)
            raise AssertionError("batch above burst capacity should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "maximum batch size 2" in e.read().decode()
        # BOUNDARY: a batch of exactly burst size is admissible in
        # principle — it must get the 429 (retry-later) path, never the
        # 400 (too-big-ever) path, even when the bucket is drained now
        try:
            _get(api, "/v1/msearch?queries=a|b&k=3", bob)
            raise AssertionError("drained bucket should 429 a full-burst batch")
        except urllib.error.HTTPError as e:
            assert e.code == 429
    finally:
        api.shutdown()
        svc.shutdown()


def test_rate_burst_floor():
    """A sub-1 rate/burst must still admit single requests eventually —
    the bucket clamps burst to >= 1 token."""
    from dcs_ray.http_api import ApiServer

    class _Svc:  # no service calls happen in _allow
        index_dir = "/nonexistent"

    api = ApiServer.__new__(ApiServer)
    api.rate_limit = 0.4
    api.rate_burst = max(1.0, 0.4 * 2.0)
    api._buckets = {}
    import threading

    api._lock = threading.Lock()
    assert api._allow("x") is True  # first request admitted
    assert api._allow("x") is False  # bucket empty until refill
