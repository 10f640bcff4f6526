"""HTTP front door for the resident search service.

The reference serves REST ``/v1/search`` + ``/v1/searchperpackage``
with API-key auth (``cmd/dcs-web/api.go:213-332``) where the key is an
HMAC-signed token carrying an opaque subject
(``internal/apikeys/apikeys.go:74-80`` — securecookie = HMAC over a
JSON ``{"s": subject, "c": created}``).  This module reproduces that
surface with the stdlib only:

* :func:`make_api_key` / :func:`decode_api_key` — base64url JSON
  payload + HMAC-SHA256 signature, constant-time verified.
* :class:`ApiServer` — a ``ThreadingHTTPServer`` bound to a
  :class:`~dcs_ray.service.SearchService` (the warm per-shard actor
  pool), so every request rides the resident path + finished-query
  cache.  ``match_mode=literal`` / ``regex`` route to the Dataset-path
  verifiers the same way dcs's ``literal=1`` flag flips the regexp
  engine.
* ``/metrics`` — Prometheus text-format counters (``varz/varz.go``
  analogue): per-shard queries/busy seconds, cache hits/misses,
  in-flight + served request counts.

Endpoints (all GET):
  /v1/search?query=Q[&k=N][&match_mode=term|literal|regex][&explain=1]
  /v1/searchperpackage?query=Q[&per_group=N][&k=N]
  /v1/msearch?queries=Q1|Q2|...[&k=N]   (one pool fan-out per batch)
  /metrics              (no auth — operational, like dcs's /varz)

Auth: ``x-dcs-apikey`` header (dcs's header name) or ``apikey=`` query
parameter; 403 on missing/invalid, mirroring api.go:233-237. With
``rate_limit`` set, a per-SUBJECT token bucket 429s excess requests
(multi-tenant quota; the subject rides the signed key).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa

# --------------------------------------------------------------------------
# API keys — HMAC-signed subject tokens (apikeys.go:74-80 shape)
# --------------------------------------------------------------------------


def make_api_key(subject: str, secret: bytes | str, created: int | None = None) -> str:
    """Signed token ``b64(payload).b64(hmac_sha256(secret, payload))``
    where payload is the dcs Key JSON ``{"s": subject, "c": ts}``."""
    if isinstance(secret, str):
        secret = secret.encode()
    payload = json.dumps(
        {"s": subject, "c": int(created if created is not None else time.time())},
        separators=(",", ":"),
    ).encode()
    sig = hmac.new(secret, payload, hashlib.sha256).digest()
    return (
        base64.urlsafe_b64encode(payload).decode().rstrip("=")
        + "."
        + base64.urlsafe_b64encode(sig).decode().rstrip("=")
    )


def _b64pad(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def decode_api_key(token: str, secret: bytes | str) -> dict | None:
    """Verified payload dict, or None (invalid shape / bad signature)."""
    if isinstance(secret, str):
        secret = secret.encode()
    try:
        p64, s64 = token.split(".", 1)
        payload, sig = _b64pad(p64), _b64pad(s64)
    except Exception:
        return None
    want = hmac.new(secret, payload, hashlib.sha256).digest()
    if not hmac.compare_digest(sig, want):
        return None
    try:
        k = json.loads(payload)
    except Exception:
        return None
    return k if isinstance(k, dict) and "s" in k else None


# --------------------------------------------------------------------------
# server
# --------------------------------------------------------------------------


def _rows(t: pa.Table) -> list[dict]:
    return t.to_pylist()


class ApiServer:
    """Serve a :class:`SearchService` over HTTP in a daemon thread.

    The server lives in the driver process (the SearchService holds
    actor handles, which belong to the driver); requests fan out to the
    warm shard actors exactly like a direct ``svc.search`` call, so the
    HTTP path returns rows identical to :func:`search_bm25` — asserted
    end-to-end in ``tests/test_http_api.py``.
    """

    def __init__(
        self,
        svc,
        secret: bytes | str,
        host: str = "127.0.0.1",
        port: int = 0,
        phrase_index_dir: str | None = None,
        trigram_index_dir: str | None = None,
        docs_path: str | None = None,
        rate_limit: float | None = None,
        rate_burst: float | None = None,
    ):
        self.svc = svc
        self.secret = secret
        self.phrase_index_dir = phrase_index_dir
        self.trigram_index_dir = trigram_index_dir
        self.docs_path = docs_path
        # per-SUBJECT token bucket (multi-tenant quota): ``rate_limit``
        # requests/s sustained, bursting to ``rate_burst`` (default
        # 2×rate). None disables. Subjects come from the signed key, so
        # a tenant cannot mint fresh identities to evade the bucket.
        self.rate_limit = rate_limit
        # burst never below 1.0 — a sub-1 cap could never admit ANY
        # request (admission needs a whole token)
        self.rate_burst = (
            max(1.0, rate_burst)
            if rate_burst is not None
            else (max(1.0, rate_limit * 2.0) if rate_limit else 0.0)
        )
        self._buckets: dict[str, tuple[float, float]] = {}
        self.counters = {
            "requests_total": 0,
            "queries_successful": 0,
            "queries_errored": 0,
            "queries_forbidden": 0,
            "queries_throttled": 0,
            "inflight": 0,
        }
        # per-endpoint query-latency histogram, the reference's
        # per-query Prometheus histogram (cmd/dcs-web/querymanager.go:
        # 44-56): decade buckets 1 ms .. 1000 s + +Inf. Raw per-bucket
        # counts here; the scrape emits CUMULATIVE counts as Prometheus
        # requires.
        self._hist_le = [0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0]
        self._hist: dict[str, list[int]] = {}
        self._hist_sum: dict[str, float] = {}
        self._lock = threading.Lock()
        # ThreadingHTTPServer runs handlers concurrently, but
        # SearchService's finished-query cache (OrderedDict
        # check-then-insert) is not thread-safe — serialize service
        # calls; the shard fan-out inside stays parallel
        self._svc_lock = threading.Lock()
        api = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def do_GET(self):
                api._handle(self)

            def do_OPTIONS(self):
                # CORS preflight, allowed like api.go:221-231
                self.send_response(204)
                self.send_header("Allow", "OPTIONS, GET")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header(
                    "Access-Control-Allow-Headers", "x-dcs-apikey, Content-Type"
                )
                self.end_headers()

        # quiescent teardown (VERDICT r4 #3): ThreadingHTTPServer's
        # default daemon request threads are invisible to
        # ThreadingMixIn's _Threads tracker, so server_close() would
        # return with handlers still running. We track handler threads
        # OURSELVES (still daemon, so a wedged handler can never pin
        # interpreter exit) and shutdown() joins each with a bounded
        # deadline, raising — loudly, with the stuck thread named —
        # rather than either hanging forever (an unbounded join on a
        # deadlocked Dataset-path search would) or silently leaking
        # (the old join(timeout=5) did). Mirrors the reference's clean
        # ReplaceIndex lifecycle (sourcebackend.go:198-251).
        self._handler_threads: set = set()
        handler_threads = self._handler_threads
        handler_lock = threading.Lock()

        class TrackingServer(ThreadingHTTPServer):
            daemon_threads = True

            def process_request(self, request, client_address):
                t = threading.Thread(
                    target=self.process_request_thread,
                    args=(request, client_address),
                    daemon=True,
                )
                try:
                    t.start()
                except Exception:
                    # thread exhaustion: close the socket and surface
                    # the error; an unstarted Thread must never reach
                    # the tracked set (join() on it would raise)
                    self.shutdown_request(request)
                    raise
                # track AFTER a successful start (a finished thread in
                # the set is fine — join() returns immediately)
                with handler_lock:
                    handler_threads.add(t)
                    # prune finished threads so the set stays bounded
                    for old in [x for x in handler_threads if not x.is_alive() and x is not t]:
                        handler_threads.discard(old)

        self.httpd = TrackingServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "ApiServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self, drain_timeout_s: float = 30.0) -> None:
        """Block until the server is quiescent: stop the accept loop,
        join the serve thread, then join every in-flight request
        handler. Quiescence is PROVEN, not assumed — but bounded: a
        handler still alive after ``drain_timeout_s`` raises
        RuntimeError naming it instead of hanging the caller forever
        (handlers are daemon threads, so even then interpreter exit is
        never pinned)."""
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join()  # serve_forever has exited: cannot hang
            assert not self._thread.is_alive()
            self._thread = None
        deadline = time.monotonic() + drain_timeout_s
        for t in list(self._handler_threads):
            t.join(timeout=max(0.0, deadline - time.monotonic()))
            if t.is_alive():
                raise RuntimeError(
                    f"request handler {t.name} still running "
                    f"{drain_timeout_s}s after shutdown — not quiescent"
                )
        self._handler_threads.clear()

    def __enter__(self) -> "ApiServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.shutdown()

    # -- request handling --------------------------------------------------
    def _bump(self, key: str, d: int = 1) -> None:
        with self._lock:
            self.counters[key] += d

    def _allow(self, subject: str, cost: float = 1.0) -> bool:
        """Token-bucket admission per key subject (monotonic clock;
        refill at ``rate_limit``/s up to ``rate_burst``). ``cost``
        charges one token PER QUERY, so a batched /v1/msearch cannot
        smuggle N queries past the quota for one token."""
        if not self.rate_limit:
            return True
        now = time.monotonic()
        with self._lock:
            tokens, last = self._buckets.get(subject, (self.rate_burst, now))
            tokens = min(self.rate_burst, tokens + (now - last) * self.rate_limit)
            if tokens >= cost:
                self._buckets[subject] = (tokens - cost, now)
                return True
            self._buckets[subject] = (tokens, now)
            return False

    def _handle(self, h: BaseHTTPRequestHandler) -> None:
        self._bump("requests_total")
        u = urlparse(h.path)
        qs = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path in ("/", "/instant"):
            # the dcs-web instant-search page (cmd/dcs-web + static/
            # instant.js role). The PAGE is open like /metrics — it
            # contains no data; every data call it makes is key-gated,
            # and the key lives in the browser's localStorage.
            from dcs_ray.webui import INSTANT_HTML

            data = INSTANT_HTML.encode()
            h.send_response(200)
            h.send_header("Content-Type", "text/html; charset=utf-8")
            h.send_header("Content-Length", str(len(data)))
            h.end_headers()
            h.wfile.write(data)
            return
        if u.path == "/metrics":
            return self._metrics(h)
        if u.path == "/v1/progress":
            # in-flight progress snapshot (querymanager_events analogue):
            # newest event per shard + rollup for a joining client —
            # key-gated like every /v1 endpoint (only /metrics is open)
            token = h.headers.get("x-dcs-apikey") or qs.get("apikey") or ""
            if decode_api_key(token, self.secret) is None:
                self._bump("queries_forbidden")
                return self._err(h, 403, "invalid x-dcs-apikey header")
            try:
                import ray as _ray

                from dcs_ray.progress import get_bus

                qid = qs.get("query_id", "")
                snap = _ray.get(get_bus().snapshot.remote(qid))
            except Exception as e:
                self._bump("queries_errored")
                return self._err(h, 500, f"{type(e).__name__}: {e}")
            data = json.dumps(snap).encode()
            h.send_response(200)
            h.send_header("Content-Type", "application/json")
            h.send_header("Content-Length", str(len(data)))
            h.end_headers()
            h.wfile.write(data)
            return
        if u.path == "/v1/suggest":
            # instant-search box support: prefix completion over the
            # index's own vocabulary, SymSpell fallback when the prefix
            # dead-ends (dcs-web's suggestion UX over our stats artifact)
            token = h.headers.get("x-dcs-apikey") or qs.get("apikey") or ""
            if decode_api_key(token, self.secret) is None:
                self._bump("queries_forbidden")
                return self._err(h, 403, "invalid x-dcs-apikey header")
            try:
                body = self._suggest(qs)
            except Exception as e:
                self._bump("queries_errored")
                return self._err(h, 500, f"{type(e).__name__}: {e}")
            data = json.dumps(body).encode()
            h.send_response(200)
            h.send_header("Content-Type", "application/json")
            h.send_header("Content-Length", str(len(data)))
            h.end_headers()
            h.wfile.write(data)
            return
        if u.path == "/v1/replace-index":
            # live index swap (SourceBackend.ReplaceIndex): key-gated,
            # and like sourcebackend.go:198-216 the replacement must
            # live in the SAME parent directory as the current index —
            # the importer's publish convention, and a path-traversal
            # guard for an ops endpoint
            token = h.headers.get("x-dcs-apikey") or qs.get("apikey") or ""
            if decode_api_key(token, self.secret) is None:
                self._bump("queries_forbidden")
                return self._err(h, 403, "invalid x-dcs-apikey header")
            import os

            name = qs.get("index", "")
            parent = os.path.dirname(os.path.abspath(self.svc.index_dir))
            new_dir = os.path.join(parent, name) if name else self.svc.index_dir
            if os.path.dirname(os.path.abspath(new_dir)) != parent or (
                name and name not in os.listdir(parent)
            ):
                return self._err(h, 400, "replacement index not found in index parent dir")
            try:
                with self._svc_lock:
                    info = self.svc.replace_index(new_dir)
            except Exception as e:
                self._bump("queries_errored")
                return self._err(h, 500, f"{type(e).__name__}: {e}")
            data = json.dumps(info).encode()
            h.send_response(200)
            h.send_header("Content-Type", "application/json")
            h.send_header("Content-Length", str(len(data)))
            h.end_headers()
            h.wfile.write(data)
            return
        if u.path not in ("/v1/search", "/v1/searchperpackage", "/v1/msearch"):
            return self._err(h, 404, "not found")
        token = h.headers.get("x-dcs-apikey") or qs.get("apikey") or ""
        key = decode_api_key(token, self.secret)
        if key is None:
            self._bump("queries_forbidden")
            return self._err(h, 403, "invalid x-dcs-apikey header")
        if u.path == "/v1/msearch":
            raw = qs.get("queries") or qs.get("query") or ""
            qlist = [q for q in raw.split("|") if q.strip()]
            if not qlist:
                self._bump("queries_errored")
                return self._err(h, 400, "no queries parameter specified ('|'-separated)")
            # a batch bigger than the bucket capacity could NEVER be
            # admitted however long the client waits — say so with a 400
            # naming the cap instead of an eternal generic 429 (ADVICE r4;
            # no cap at all when rate limiting is disabled)
            if self.rate_limit and len(qlist) > self.rate_burst:
                self._bump("queries_errored")
                return self._err(
                    h, 400,
                    f"msearch batch of {len(qlist)} exceeds the maximum "
                    f"batch size {int(self.rate_burst)}; split the batch",
                )
            query = None
            rate_cost = float(len(qlist))
        else:
            query = qs.get("query") or qs.get("q") or ""
            if not query:
                self._bump("queries_errored")
                return self._err(h, 400, "no query parameter specified")
            rate_cost = 1.0
        if not self._allow(key["s"], cost=rate_cost):
            self._bump("queries_throttled")
            return self._err(h, 429, "rate limit exceeded for this api key")
        self._bump("inflight")
        t0 = time.monotonic()
        try:
            if u.path == "/v1/msearch":
                body = self._msearch(qlist, qs)
            elif u.path == "/v1/search":
                body = self._search(query, qs)
            else:
                body = self._search_per_package(query, qs)
        except Exception as e:  # surface as 500 like httpErrorWrapper
            self._bump("queries_errored")
            return self._err(h, 500, f"{type(e).__name__}: {e}")
        finally:
            self._bump("inflight", -1)
            self._observe(u.path, time.monotonic() - t0)
        self._bump("queries_successful")
        body["latency_ms"] = round((time.monotonic() - t0) * 1e3, 3)
        body["subject"] = key["s"]
        data = json.dumps(body).encode()
        h.send_response(200)
        h.send_header("Content-Type", "application/json")
        h.send_header("Access-Control-Allow-Origin", "*")
        h.send_header("Content-Length", str(len(data)))
        h.end_headers()
        h.wfile.write(data)

    def _observe(self, endpoint: str, seconds: float) -> None:
        """Record one query latency into the endpoint's histogram
        (success AND error paths — a histogram that only sees wins lies
        about tail latency)."""
        with self._lock:
            buckets = self._hist.setdefault(
                endpoint, [0] * (len(self._hist_le) + 1)
            )
            i = 0
            while i < len(self._hist_le) and seconds > self._hist_le[i]:
                i += 1
            buckets[i] += 1
            self._hist_sum[endpoint] = self._hist_sum.get(endpoint, 0.0) + seconds

    def _err(self, h: BaseHTTPRequestHandler, code: int, msg: str) -> None:
        data = (msg + "\n").encode()
        h.send_response(code)
        h.send_header("Content-Type", "text/plain")
        h.send_header("Content-Length", str(len(data)))
        h.end_headers()
        h.wfile.write(data)

    def _msearch(self, qlist: list[str], qs: dict) -> dict:
        """Batched query endpoint: one socket round trip, one
        service-pool fan-out for the whole batch (amortizes per-call
        latency the way the bench's batch path does) — results come
        back per query in input order."""
        k = int(qs.get("k", "10"))
        with self._svc_lock:
            t = self.svc.search(qlist, k=k, query_id=qs.get("query_id"))
        per: list[list] = [[] for _ in qlist]
        for r in t.to_pylist():
            per[int(r["query_id"])].append(
                {f: r[f] for f in ("rank", "doc_id", "score")}
            )
        return {"queries": qlist, "results": per}

    def _search(self, query: str, qs: dict) -> dict:
        k = int(qs.get("k", "10"))
        mode = qs.get("match_mode", "term")
        if mode in ("term", "grammar"):
            with self._svc_lock:
                t = self.svc.query(
                    query, k=k, phrase_index_dir=self.phrase_index_dir,
                    query_id=qs.get("query_id"),
                )
        elif mode == "literal" and self.trigram_index_dir:
            from dcs_ray.search import search_literal

            t = search_literal(self.trigram_index_dir, [query])
        elif mode in ("regex", "regexp") and self.trigram_index_dir and self.docs_path:
            from dcs_ray.grep import search_regex_fused

            from dcs_ray.grep import MATCH_SCHEMA

            ds = search_regex_fused(self.trigram_index_dir, self.docs_path, query)
            parts = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
            # a no-match regex yields zero batches — concat_tables([])
            # raises, so fall back to the schema's empty table
            t = pa.concat_tables(parts) if parts else MATCH_SCHEMA.empty_table()
        elif mode in ("literal", "regex", "regexp"):
            raise ValueError(
                f"match_mode={mode!r} needs the server started with a "
                "trigram_index_dir (and docs_path for regex)"
            )
        else:
            raise ValueError(f"unknown match_mode {mode!r}")
        rows = _rows(t)
        if qs.get("snippets") == "1" and self.docs_path and mode in ("term", "grammar"):
            # per-result context (dcs writeSearchResults ships match
            # context the same way): fetch ONLY the k result docs via a
            # pushed-down doc_id filter, one vectorized snippet kernel
            import pyarrow.parquet as pq

            from dcs_ray.grep import first_match_snippets

            ids = [r["doc_id"] for r in rows]
            if ids:
                docs = pq.read_table(
                    self.docs_path, columns=["doc_id", "text"],
                    filters=[("doc_id", "in", ids)],
                )
                # '+term' is REQUIRED (keep, strip the operator);
                # '-term' is a negation (drop); quoted phrases anchor
                # on their words
                terms = [
                    w.lstrip("+").strip('"')
                    for w in query.split()
                    if w and not w.startswith("-") and w.lstrip("+").strip('"')
                ]
                snip = first_match_snippets(docs["text"], terms)
                by_id = dict(zip(docs["doc_id"].to_pylist(), snip.to_pylist()))
                for r in rows:
                    r["snippet"] = by_id.get(r["doc_id"], "")
        if qs.get("explain") == "1" and mode in ("term", "grammar"):
            # Lucene-explain debug surface: per-(doc, term) BM25
            # contribution breakdown attached to each result row —
            # decodes only the query terms' postings for the SERVED
            # docs, against the PLANNED (grammar-expanded) query text,
            # so operators/filters can't desynchronize the breakdown
            # from the rows above it
            from dcs_ray.search import _grammar_plan, explain_scores

            try:
                qtext, _f = _grammar_plan(
                    query, self.phrase_index_dir,
                    expand_index_dir=self.svc.index_dir,
                )
            except Exception:
                qtext = query
            ex = explain_scores(
                self.svc.index_dir, qtext, k=k,
                doc_ids=[r["doc_id"] for r in rows],
                ranks=[r.get("rank", i + 1) for i, r in enumerate(rows)],
            )
            by_doc: dict[int, list] = {}
            for r in ex.to_pylist():
                by_doc.setdefault(r["doc_id"], []).append(
                    {
                        "term": r["term"],
                        "tf": r["tf"],
                        "idf": r["idf"],
                        "contribution": r["contribution"],
                    }
                )
            for r in rows:
                r["explain"] = by_doc.get(r["doc_id"], [])
        return {"query": query, "match_mode": mode, "results": rows}

    def _vocab(self):
        """(terms sorted asc as np.array(str), df aligned) from the
        index's stats/df.parquet — loaded once, cached.  At 100-TB
        scale this artifact is the term dictionary (tens of millions of
        rows, a few GB) and would be mmapped/sharded; the serving shape
        (sorted array + searchsorted range) is the same."""
        if not hasattr(self, "_vocab_cache"):
            import os

            import numpy as np
            import pyarrow.parquet as pq

            t = pq.read_table(
                os.path.join(self.svc.index_dir, "stats", "df.parquet"),
                columns=["term", "df"],
            )
            terms = np.asarray(t["term"].to_pylist(), dtype=object)
            df = t["df"].to_numpy()
            order = np.argsort(terms)
            self._vocab_cache = (terms[order], df[order])
        return self._vocab_cache

    def _suggest(self, qs: dict) -> dict:
        import numpy as np

        q = qs.get("q") or qs.get("query") or ""
        k = int(qs.get("k", "10"))
        last = q.split()[-1].lower() if q.split() else ""
        if not last:
            return {"q": q, "last": "", "completions": [], "source": "prefix"}
        terms, df = self._vocab()
        lo = np.searchsorted(terms, last)
        hi = np.searchsorted(terms, last + "\U0010ffff")
        source = "prefix"
        if hi > lo:
            cand_t, cand_d = terms[lo:hi], df[lo:hi]
        else:
            # dead-ended prefix: SymSpell distance-≤1 corrections from a
            # lazily-built in-memory deletion index (vocab-sized dict,
            # built once per server — per-request cost is a handful of
            # exact dict probes + a candidate-set levenshtein verify,
            # not a Ray pipeline)
            from dcs_ray.functions.spell import deletions, levenshtein

            if not hasattr(self, "_spell_index"):
                idx: dict[str, list[int]] = {}
                for i, t in enumerate(terms):
                    idx.setdefault(t, []).append(i)
                    for d in deletions(t):
                        idx.setdefault(d, []).append(i)
                self._spell_index = idx
            cand_ids: set[int] = set()
            for key_ in (last, *deletions(last)):
                cand_ids.update(self._spell_index.get(key_, ()))
            ok = [i for i in cand_ids if levenshtein(last, terms[i]) <= 1]
            cand_t = terms[np.asarray(ok, dtype=np.int64)] if ok else terms[:0]
            cand_d = df[np.asarray(ok, dtype=np.int64)] if ok else df[:0]
            source = "spell"
        order = np.lexsort((cand_t, -cand_d))[:k]
        return {
            "q": q,
            "last": last,
            "source": source,
            "completions": [
                {"term": str(cand_t[i]), "df": int(cand_d[i])} for i in order
            ],
        }

    def _search_per_package(self, query: str, qs: dict) -> dict:
        from dcs_ray.search import search_bm25_grouped

        k = int(qs.get("k", "10"))
        per_group = int(qs.get("per_group", "2"))
        t = search_bm25_grouped(
            self.svc.index_dir, [query], group_col="source",
            per_group=per_group, k=k,
        )
        groups: dict[str, list] = {}
        for r in t.to_pylist():
            groups.setdefault(str(r.get("group")), []).append(r)
        return {
            "query": query,
            "packages": [
                {"package": g, "results": rs} for g, rs in sorted(groups.items())
            ],
        }

    def _metrics(self, h: BaseHTTPRequestHandler) -> None:
        lines = []
        with self._lock:
            # (dcsray_http_inflight from the counters loop IS the
            # queries-in-flight gauge — one name, no alias to drift)
            for k, v in self.counters.items():
                lines.append(f"dcsray_http_{k} {v}")
            # Prometheus histogram: cumulative buckets, sum, count per
            # endpoint (querymanager.go:44-56's per-query latency story)
            for ep in sorted(self._hist):
                raw = self._hist[ep]
                cum = 0
                for le, n in zip(self._hist_le, raw):
                    cum += n
                    lines.append(
                        'dcs_query_seconds_bucket{endpoint="%s",le="%s"} %d'
                        % (ep, repr(le).rstrip("0").rstrip("."), cum)
                    )
                cum += raw[-1]
                lines.append(
                    'dcs_query_seconds_bucket{endpoint="%s",le="+Inf"} %d'
                    % (ep, cum)
                )
                lines.append(
                    'dcs_query_seconds_sum{endpoint="%s"} %.6f'
                    % (ep, self._hist_sum.get(ep, 0.0))
                )
                lines.append(
                    'dcs_query_seconds_count{endpoint="%s"} %d' % (ep, cum)
                )
        with self._svc_lock:
            ci = self.svc.cache_info()
            # metrics() round-trips the actor pool — taken under the
            # same lock so a concurrent /v1/replace-index can't kill
            # the actors out from under the scrape
            shard_rows = self.svc.metrics().to_pylist()
        lines.append(f"dcsray_result_cache_hits {ci['hits']}")
        lines.append(f"dcsray_result_cache_misses {ci['misses']}")
        lines.append(f"dcsray_result_cache_entries {ci['entries']}")
        for r in shard_rows:
            lbl = '{shard="%s"}' % r["shard"]
            lines.append(f"dcsray_shard_queries_total{lbl} {r['n_queries']}")
            lines.append(f"dcsray_shard_busy_seconds{lbl} {r['busy_s']:.6f}")
        data = ("\n".join(lines) + "\n").encode()
        h.send_response(200)
        h.send_header("Content-Type", "text/plain; version=0.0.4")
        h.send_header("Content-Length", str(len(data)))
        h.end_headers()
        h.wfile.write(data)


def serve(
    index_dir: str,
    secret: bytes | str,
    host: str = "127.0.0.1",
    port: int = 0,
    num_cpus: float = 1.0,
    phrase_index_dir: str | None = None,
    trigram_index_dir: str | None = None,
    docs_path: str | None = None,
    rate_limit: float | None = None,
) -> ApiServer:
    """Build the resident pool and start the HTTP front door."""
    from dcs_ray.service import search_service

    svc = search_service(index_dir, num_cpus=num_cpus)
    return ApiServer(
        svc, secret, host=host, port=port, phrase_index_dir=phrase_index_dir,
        trigram_index_dir=trigram_index_dir, docs_path=docs_path,
        rate_limit=rate_limit,
    ).start()
