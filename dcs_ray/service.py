"""Long-lived query service: a persistent actor per shard serving many
query batches without re-building a Ray Data pipeline per call — the
dcs-web shape, where one long-lived source-backend process per shard
answers queries over a connection
(``cmd/dcs-web/querymanager.go``, ``internal/sourcebackend/sourcebackend.go:293-641``).

Why it exists next to :func:`dcs_ray.search.search_bm25`: the Dataset
path is right for throughput (replay a log, rank a batch), but each
call pays Dataset construction + task scheduling. A serving deployment
answers one small query batch at a time, where that fixed cost IS the
latency. Here each shard's segment is opened once in the actor's
``__init__`` (decode/score caches live for the actor's lifetime) and a
query batch is one round of ``score.remote()`` per shard plus a tiny
driver merge — identical results to ``search_bm25`` by construction
(same planner, same scorers, same top-k tie-breaks).

At cluster scale the actors spread across nodes (one per shard — the
cluster-sizing knob dcs also uses: 6 shards = 6 index backends), each
holding its shard's mmap + caches warm; queries fan out as k×shards
small messages, never moving posting data.

Finished-query result cache: dcs keeps completed query results for
~30 minutes so a repeated query (pagination, reload) never re-runs the
shard fan-out (``cmd/dcs-web/querymanager.go:277-320``). The service
mirrors that: per-(query, k, method, filters, prior) top-k arrays with
a TTL + size-capped LRU, served driver-side with zero actor round
trips. The index is immutable per service instance (segments are
immutable; updates write new shard dirs), so entries never go stale
within an instance's lifetime — the TTL bounds memory, not staleness.
"""

from __future__ import annotations

import time
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import ray

from dcs_ray.search import (
    global_df,
    load_stats,
    plan_queries,
    score_shard_bm25,
    score_shard_bm25_maxscore,
    shard_doc_filter,
    shard_paths,
    topk,
)


def _kill_and_confirm(actors: list, timeout_s: float = 30.0) -> None:
    """``ray.kill`` every actor and BLOCK until each death is
    observable: a post-kill method call on a killed actor resolves with
    ``RayActorError`` exactly when the kill has landed, so draining one
    probe per actor proves the pool is gone (the reference's
    ReplaceIndex closes the old index before returning,
    ``internal/sourcebackend/sourcebackend.go:198-251`` — same
    contract here). A probe that neither completes nor errors within
    ``timeout_s`` raises ``GetTimeoutError`` instead of silently
    leaking a live actor."""
    for a in actors:
        ray.kill(a)
    deadline = time.monotonic() + timeout_s
    for a in actors:
        # probes are submitted AFTER the kill: one may still slip in and
        # execute if the kill signal hasn't landed, so re-probe until
        # the terminal RayActorError arrives
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise ray.exceptions.GetTimeoutError(
                    f"actor {a} still alive {timeout_s}s after ray.kill"
                )
            try:
                ray.get(a.__ray_ready__.remote(), timeout=remaining)
                time.sleep(0.05)  # kill not landed yet — probe again
            except ray.exceptions.RayActorError:
                break


def _fkey_val(v):
    """Exact, hashable cache-key encoding of a filter value — NEVER a
    repr (numpy truncates reprs of large arrays, so two different
    not_doc_ids sets would collide on the same key)."""
    if isinstance(v, np.ndarray):
        return (v.dtype.str, v.tobytes())
    if isinstance(v, (list, tuple)):
        return tuple(_fkey_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _fkey_val(x)) for k, x in v.items()))
    return v


def _fit_pool_cpus(num_cpus: float, n_actors: int) -> float:
    """Clamp per-actor CPU so a resident pool of ``n_actors`` never
    reserves more than half the cluster — a pool sized num_shards ×
    1 CPU on a small session would otherwise hold every slot and
    starve (or never fully schedule against) concurrent Dataset
    stages, hanging the first ``ray.get`` forever."""
    total = ray.cluster_resources().get("CPU", 0) if ray.is_initialized() else 0
    if not total or not n_actors:
        return num_cpus
    return max(0.05, min(num_cpus, (total / 2) / n_actors))


@ray.remote
class ShardSearcher:
    """One shard's resident searcher: segment opened ONCE (ST1), decode
    and score-vector caches warm across calls (ST2/ST5 shape)."""

    def __init__(self, shard_path: str):
        from dcs_ray.search import _open

        self.seg = _open(shard_path)
        self.shard_path = shard_path
        self._n_queries = 0
        self._n_batches = 0
        self._busy_ns = 0

    def metrics(self) -> dict:
        """Per-shard serving metrics — the read-path analogue of the
        build's per-partition lineage records (docs/s, postings/s):
        queries served, batches, busy wall, derived queries/sec."""
        busy_s = self._busy_ns / 1e9
        return {
            "shard": self.shard_path.rsplit("/", 1)[-1],
            "n_queries": self._n_queries,
            "n_batches": self._n_batches,
            "busy_s": busy_s,
            "queries_per_s": (self._n_queries / busy_s) if busy_s > 0 else 0.0,
        }

    def score(
        self,
        plans: list,
        stats: dict,
        k: int,
        method: str = "maxscore",
        filters: dict | None = None,
        prior_col: str | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score every query plan against this shard → flat
        (query_id, doc_id, score) arrays of per-shard top-k rows."""
        t0 = time.monotonic_ns()
        if prior_col is not None:
            def score_fn(seg, plan, st, kk, doc_filter=None):
                return score_shard_bm25(seg, plan, st, kk, doc_filter, prior_col)
        elif method == "maxscore":
            score_fn = score_shard_bm25_maxscore
        elif method == "bmw":
            from dcs_ray.search import score_shard_bm25_bmw

            score_fn = score_shard_bm25_bmw
        else:
            score_fn = score_shard_bm25
        doc_filter = shard_doc_filter(self.seg, filters)
        out_q, out_d, out_s = [], [], []
        for qid, plan in enumerate(plans):
            if doc_filter is not None and len(doc_filter) == 0:
                d = np.empty(0, np.uint64)
                s = np.empty(0, np.float64)
            else:
                d, s = score_fn(self.seg, plan, stats, k, doc_filter=doc_filter)
            out_q.append(np.full(len(d), qid, np.int32))
            out_d.append(d)
            out_s.append(s)
        self._n_queries += len(plans)
        self._n_batches += 1
        self._busy_ns += time.monotonic_ns() - t0
        return (
            np.concatenate(out_q) if out_q else np.empty(0, np.int32),
            np.concatenate(out_d) if out_d else np.empty(0, np.uint64),
            np.concatenate(out_s) if out_s else np.empty(0, np.float64),
        )


class SearchService:
    """Handle to a pool of resident :class:`ShardSearcher` actors.

    >>> svc = search_service(index_dir)
    >>> svc.search(["spark merge"], k=10)   # many times, no re-setup
    >>> svc.shutdown()

    ``search`` returns the SAME table (schema, ranks, tie-breaks) as
    ``search_bm25`` — asserted in tests — while per-batch latency drops
    because nothing is constructed per call except the query plans.
    """

    def __init__(
        self,
        index_dir: str,
        num_cpus: float = 1.0,
        cache_ttl_s: float = 1800.0,
        cache_max_entries: int = 4096,
    ):
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        self.shards = shard_paths(index_dir)
        self._requested_num_cpus = num_cpus  # replace_index re-derives from this
        num_cpus = _fit_pool_cpus(num_cpus, len(self.shards))
        # a crashed shard actor restarts transparently (segment re-opens
        # in __init__, caches re-warm) and the in-flight call retries —
        # the serving-availability story for a long-lived deployment
        # (dcs restarts a died source-backend and dcs-web reconnects)
        self.actors = [
            ShardSearcher.options(
                num_cpus=num_cpus, max_restarts=2, max_task_retries=2
            ).remote(p)
            for p in self.shards
        ]
        # finished-query cache (dcs querymanager shape): key -> (t, dd, ss)
        self.cache_ttl_s = cache_ttl_s
        self.cache_max_entries = cache_max_entries
        self._cache: OrderedDict[tuple, tuple[float, np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self.cache_hits = 0
        self.cache_misses = 0
        # block until every shard is open so first-query latency is real
        ray.get([a.__ray_ready__.remote() for a in self.actors])

    def _cache_key(self, query: str, k: int, method: str, filters, prior_col) -> tuple:
        fkey = (
            tuple(sorted((kk, _fkey_val(vv)) for kk, vv in filters.items()))
            if filters
            else None
        )
        return (query, k, method, fkey, prior_col)

    def _cache_get(self, key: tuple) -> tuple[np.ndarray, np.ndarray] | None:
        hit = self._cache.get(key)
        if hit is None:
            return None
        t, dd, ss = hit
        if time.monotonic() - t > self.cache_ttl_s:
            del self._cache[key]
            return None
        self._cache.move_to_end(key)
        return dd, ss

    def _cache_put(self, key: tuple, dd: np.ndarray, ss: np.ndarray) -> None:
        self._cache[key] = (time.monotonic(), dd, ss)
        self._cache.move_to_end(key)
        while len(self._cache) > self.cache_max_entries:
            self._cache.popitem(last=False)

    def cache_info(self) -> dict:
        return {
            "hits": self.cache_hits,
            "misses": self.cache_misses,
            "entries": len(self._cache),
        }

    def search(
        self,
        queries: list[str] | str,
        k: int = 10,
        method: str = "maxscore",
        filters: dict | None = None,
        prior_col: str | None = None,
        use_cache: bool = True,
        query_id: str | None = None,
    ) -> pa.Table:
        if isinstance(queries, str):
            queries = [queries]
        if prior_col is not None and method in ("bm25plus", "bmw"):
            # mirror search_bm25's guard EXACTLY — the actor's
            # prior_col branch would otherwise silently serve the
            # exhaustive-prior scorer where the Dataset path raises,
            # breaking the promised result parity (review r5c #1)
            raise ValueError(
                f"prior_col is incompatible with method={method!r}: the "
                "per-doc multiplier forces the exhaustive classic-BM25 "
                "scorer (use method='maxscore' or 'bm25')"
            )
        # in-flight progress: work units are shards (the reference's
        # filesTotal analogue at this layer; the grep path reports
        # per-doc counts) — one start event per live shard, one done
        # event as each shard's scores land (sourcebackend.go:383-412)
        bus = None
        if query_id is not None:
            from dcs_ray.progress import get_bus

            bus = get_bus()
        # live-docs semantics survive into serving: tombstones fold into
        # the filter spec on EVERY call (one small driver-side parquet
        # read), and since the folded set is part of the cache key, a
        # new delete can never serve a stale cached ranking. Structural
        # mutations (compaction / update / reshard / add) still need a
        # new service instance — those rewrite shard bytes the actors
        # hold open.
        from dcs_ray.search import _with_tombstones

        filters = _with_tombstones(self.index_dir, filters)
        # split the batch into cached and live queries; only the misses
        # pay the shard fan-out (repeated queries — pagination, reloads —
        # are served from the driver-side cache, zero actor round trips)
        keys = [self._cache_key(q, k, method, filters, prior_col) for q in queries]
        results: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(queries)
        live_idx: list[int] = []
        for i, key in enumerate(keys):
            got = self._cache_get(key) if use_cache else None
            if got is not None:
                results[i] = got
                self.cache_hits += 1
            else:
                live_idx.append(i)
                self.cache_misses += 1
        if live_idx:
            live_queries = [queries[i] for i in live_idx]
            plans = plan_queries(self.index_dir, live_queries, self.stats)
            # zone-map shard pruning applies to the resident pool too:
            # actors whose shard provably can't match the filters get no
            # message at all (their per-shard query counters stand still)
            from dcs_ray.search import prune_shards

            live_paths = set(prune_shards(self.shards, filters))
            pairs = [
                (a, p) for a, p in zip(self.actors, self.shards) if p in live_paths
            ]
            refs = [
                a.score.remote(plans, self.stats, k, method, filters, prior_col)
                for a, _p in pairs
            ]
            if bus is None:
                parts = ray.get(refs)
            else:
                import os as _os

                by_ref = {r: _os.path.basename(p) for r, (_a, p) in zip(refs, pairs)}
                for shard in by_ref.values():
                    bus.post.remote(query_id, shard, 0, 1)
                got_parts: dict = {}
                pending = list(refs)
                while pending:
                    done_refs, pending = ray.wait(pending, num_returns=1)
                    for r in done_refs:
                        res = ray.get(r)
                        got_parts[r] = res
                        bus.post.remote(
                            query_id, by_ref[r], 1, 1, done=True,
                            n_results=len(res[1]),
                        )
                parts = [got_parts[r] for r in refs]
            qids = (
                np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int32)
            )
            docs = (
                np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.uint64)
            )
            scores = (
                np.concatenate([p[2] for p in parts])
                if parts
                else np.empty(0, np.float64)
            )
            for lqid, i in enumerate(live_idx):
                m = qids == lqid
                dd, ss = topk(docs[m], scores[m], k)
                results[i] = (dd, ss)
                if use_cache:
                    self._cache_put(keys[i], dd, ss)
        if bus is not None and not live_idx:
            # fully cache-served: still emit one terminal event so a
            # progress poller sees the query complete
            bus.post.remote(
                query_id, "cache", 1, 1, done=True,
                n_results=sum(len(r[0]) for r in results if r is not None),
            )
        out_tables = []
        for qid, got in enumerate(results):
            dd, ss = got
            out_tables.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                        "rank": pa.array(
                            np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()
                        ),
                        "doc_id": pa.array(dd, pa.uint64()),
                        "score": pa.array(ss, pa.float64()),
                    }
                )
            )
        return pa.concat_tables(out_tables)

    def query(
        self,
        raw: str,
        k: int = 10,
        phrase_index_dir: str | None = None,
        use_cache: bool = True,
        query_id: str | None = None,
    ) -> pa.Table:
        """The grammar front door, resident: one raw query string with
        the full user syntax (terms, quoted/negated phrases, +/- term
        operators, key:value filters) parsed and composed onto the warm
        actor pool — the dcs-web request path end to end. Phrase
        constraints resolve through the (Dataset-path) positional
        pre-pass; everything else stays in the pool, and the composed
        filter spec participates in the finished-query cache key."""
        from dcs_ray.search import _grammar_plan

        qtext, filters = _grammar_plan(
            raw, phrase_index_dir, expand_index_dir=self.index_dir
        )
        return self.search(
            [qtext], k=k, filters=filters, use_cache=use_cache,
            query_id=query_id,
        )

    def replace_index(self, index_dir: str | None = None) -> dict:
        """Live atomic index swap — the reference's
        ``SourceBackend.ReplaceIndex`` RPC (``sourcebackend.go:198-246``:
        open the new shard, swap the pointer under the lock, close the
        old index) done pool-wide: open a FULL new actor pool on the
        new (or rebuilt/compacted same-path) index, block until every
        new shard is warm, then swap the service's pointers and kill the
        old actors.  Queries issued before the swap finish on the old
        pool (their actor handles are captured in the in-flight call);
        queries after see the new index.  The finished-query cache is
        cleared — its entries rank against the old index.

        Returns {"shards": n, "index_dir": ...} for the caller's log.
        """
        new_dir = index_dir or self.index_dir
        new_stats = load_stats(new_dir)
        new_shards = shard_paths(new_dir)
        # preserve the pool's ORIGINAL per-actor sizing (a 0.5-cpu pool
        # deliberately undersized to avoid starving Dataset stages must
        # not silently double after a swap)
        num_cpus = _fit_pool_cpus(
            getattr(self, "_requested_num_cpus", 1.0), len(new_shards)
        )
        new_actors = [
            ShardSearcher.options(
                num_cpus=num_cpus, max_restarts=2, max_task_retries=2
            ).remote(p)
            for p in new_shards
        ]
        # the dcs swap opens the new index BEFORE dropping the old one —
        # same here: the new pool must be warm before any pointer moves
        ray.get([a.__ray_ready__.remote() for a in new_actors])
        old_actors = self.actors
        self.index_dir = new_dir
        self.stats = new_stats
        self.shards = new_shards
        self.actors = new_actors
        self._cache.clear()
        _kill_and_confirm(old_actors)
        return {"shards": len(new_shards), "index_dir": new_dir}

    def metrics(self) -> pa.Table:
        """One row per shard: queries served, batches, busy seconds,
        queries/sec — plus the driver-side cache counters in
        :meth:`cache_info`. The serving analogue of the per-partition
        build lineage (CLI ``lineage``)."""
        rows = ray.get([a.metrics.remote() for a in self.actors])
        return pa.table(
            {
                "shard": pa.array([r["shard"] for r in rows], pa.string()),
                "n_queries": pa.array([r["n_queries"] for r in rows], pa.int64()),
                "n_batches": pa.array([r["n_batches"] for r in rows], pa.int64()),
                "busy_s": pa.array([r["busy_s"] for r in rows], pa.float64()),
                "queries_per_s": pa.array(
                    [r["queries_per_s"] for r in rows], pa.float64()
                ),
            }
        )

    def shutdown(self) -> None:
        _kill_and_confirm(self.actors)
        self.actors = []

    def __enter__(self) -> "SearchService":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def search_service(
    index_dir: str,
    num_cpus: float = 1.0,
    cache_ttl_s: float = 1800.0,
    cache_max_entries: int = 4096,
) -> SearchService:
    """Start a resident query service over a built index."""
    return SearchService(
        index_dir,
        num_cpus=num_cpus,
        cache_ttl_s=cache_ttl_s,
        cache_max_entries=cache_max_entries,
    )


@ray.remote
class FieldedUnitSearcher:
    """One range-refined work unit's resident searcher for two-field
    (body + anchor) ranking: holds the unit's body shard and/or anchor
    shard open, scores both fields, masks to the unit's doc-id range,
    combines ``body + w·anchor`` and returns the unit-local top-k —
    the actor form of ``search.search_bm25_fielded``'s task body."""

    def __init__(self, body_path: str | None, anchor_path: str | None, lo: int, hi: int):
        from dcs_ray.search import _open

        self.seg_b = _open(body_path) if body_path else None
        self.seg_a = _open(anchor_path) if anchor_path else None
        self.lo, self.hi = lo, hi

    def score(
        self,
        plans_b: list,
        plans_a: list,
        stats_b: dict,
        stats_a: dict,
        k: int,
        anchor_weight: float,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        from dcs_ray.search import score_shard_all

        out_q, out_d, out_s = [], [], []
        for qid in range(len(plans_b)):
            chunks_d, chunks_s = [], []
            if self.seg_b is not None:
                db, sb = score_shard_all(self.seg_b, plans_b[qid], stats_b)
                m = (db >= self.lo) & (db <= self.hi)
                chunks_d.append(db[m])
                chunks_s.append(sb[m])
            if self.seg_a is not None:
                da, sa = score_shard_all(self.seg_a, plans_a[qid], stats_a)
                m = (da >= self.lo) & (da <= self.hi)
                chunks_d.append(da[m])
                chunks_s.append(anchor_weight * sa[m])
            docs = np.concatenate(chunks_d) if chunks_d else np.empty(0, np.uint64)
            scores = np.concatenate(chunks_s) if chunks_s else np.empty(0, np.float64)
            order = np.argsort(docs, kind="stable")
            docs, scores = docs[order], scores[order]
            bounds = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
            uniq = docs[bounds] if len(docs) else docs
            sums = np.add.reduceat(scores, bounds) if len(docs) else scores
            d, s = topk(uniq, sums, k)
            out_q.append(np.full(len(d), qid, np.int32))
            out_d.append(d)
            out_s.append(s)
        return (
            np.concatenate(out_q) if out_q else np.empty(0, np.int32),
            np.concatenate(out_d) if out_d else np.empty(0, np.uint64),
            np.concatenate(out_s) if out_s else np.empty(0, np.float64),
        )


class FieldedSearchService:
    """Resident two-field (body + anchor) ranking service: one actor per
    range-refined unit (both field shards for that doc-id range open in
    the SAME actor, so combination is local), per-query-batch fan-out =
    one small message per unit, driver merge = k × units rows. Results
    identical to :func:`dcs_ray.search.search_bm25_fielded` (asserted
    in tests); finished-query cache as in :class:`SearchService`."""

    def __init__(
        self,
        body_dir: str,
        anchor_dir: str,
        anchor_weight: float = 0.5,
        num_cpus: float = 1.0,
        cache_ttl_s: float = 1800.0,
        cache_max_entries: int = 4096,
    ):
        from dcs_ray.search import shard_id_bounds

        self.body_dir, self.anchor_dir = body_dir, anchor_dir
        self.anchor_weight = anchor_weight
        self.stats_b = load_stats(body_dir)
        self.stats_a = load_stats(anchor_dir)
        shards_b, shards_a = shard_paths(body_dir), shard_paths(anchor_dir)
        bounds_b = [shard_id_bounds(p) for p in shards_b]
        bounds_a = [shard_id_bounds(p) for p in shards_a]
        cuts = sorted(
            {lo for lo, _ in bounds_b + bounds_a}
            | {hi + 1 for _, hi in bounds_b + bounds_a}
        )
        units = []
        for lo, hi in ((cuts[i], cuts[i + 1] - 1) for i in range(len(cuts) - 1)):
            bi = next((i for i, (l, h) in enumerate(bounds_b) if l <= lo <= h), -1)
            ai = next((i for i, (l, h) in enumerate(bounds_a) if l <= lo <= h), -1)
            if bi >= 0 or ai >= 0:
                units.append((bi, ai, lo, hi))
        num_cpus = _fit_pool_cpus(num_cpus, len(units))
        self.actors = []
        for bi, ai, lo, hi in units:
            self.actors.append(
                FieldedUnitSearcher.options(num_cpus=num_cpus).remote(
                    shards_b[bi] if bi >= 0 else None,
                    shards_a[ai] if ai >= 0 else None,
                    lo,
                    hi,
                )
            )
        self.cache_ttl_s = cache_ttl_s
        self.cache_max_entries = cache_max_entries
        self._cache: OrderedDict[tuple, tuple[float, np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self.cache_hits = 0
        self.cache_misses = 0
        ray.get([a.__ray_ready__.remote() for a in self.actors])

    _cache_key = SearchService._cache_key
    _cache_get = SearchService._cache_get
    _cache_put = SearchService._cache_put
    cache_info = SearchService.cache_info

    def search(
        self, queries: list[str] | str, k: int = 10, use_cache: bool = True
    ) -> pa.Table:
        if isinstance(queries, str):
            queries = [queries]
        keys = [
            self._cache_key(q, k, "fielded", None, str(self.anchor_weight))
            for q in queries
        ]
        results: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(queries)
        live_idx: list[int] = []
        for i, key in enumerate(keys):
            got = self._cache_get(key) if use_cache else None
            if got is not None:
                results[i] = got
                self.cache_hits += 1
            else:
                live_idx.append(i)
                self.cache_misses += 1
        if live_idx:
            live = [queries[i] for i in live_idx]
            plans_b = plan_queries(self.body_dir, live, self.stats_b)
            plans_a = plan_queries(self.anchor_dir, live, self.stats_a)
            parts = ray.get(
                [
                    a.score.remote(
                        plans_b, plans_a, self.stats_b, self.stats_a, k,
                        self.anchor_weight,
                    )
                    for a in self.actors
                ]
            )
            qids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int32)
            docs = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.uint64)
            scores = np.concatenate([p[2] for p in parts]) if parts else np.empty(0, np.float64)
            for lqid, i in enumerate(live_idx):
                m = qids == lqid
                dd, ss = topk(docs[m], scores[m], k)
                results[i] = (dd, ss)
                if use_cache:
                    self._cache_put(keys[i], dd, ss)
        out_tables = []
        for qid, got in enumerate(results):
            dd, ss = got
            out_tables.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                        "rank": pa.array(
                            np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()
                        ),
                        "doc_id": pa.array(dd, pa.uint64()),
                        "score": pa.array(ss, pa.float64()),
                    }
                )
            )
        return pa.concat_tables(out_tables)

    def shutdown(self) -> None:
        _kill_and_confirm(self.actors)
        self.actors = []

    def __enter__(self) -> "FieldedSearchService":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def fielded_search_service(
    body_dir: str, anchor_dir: str, anchor_weight: float = 0.5, **kw
) -> FieldedSearchService:
    """Start a resident two-field ranking service (body + anchor)."""
    return FieldedSearchService(body_dir, anchor_dir, anchor_weight=anchor_weight, **kw)


class TieredSearchService:
    """Two-tier serving over a full index + its pruned generation
    (:func:`dcs_ray.index.prune.prune_index`).

    Routing is CORRECTNESS-PRESERVING, not best-effort: a query is
    served by the pruned tier only when every term's global df ≤ m —
    in that case the term's entire posting list survived pruning, so
    the small tier's answer is bit-identical to the full index's. Head
    queries (any term df > m) fall back to the full tier. The split is
    the classic serving economics: the long tail of rare-term queries
    runs on a tier that is a fraction of the index size (and can live
    entirely in RAM on few nodes), while only head queries touch the
    big index. df lookups come from the shared ``stats/df.parquet``
    (predicate-pushdown read, vocab-scale) and both tiers reuse the
    same resident-actor machinery and result caches."""

    def __init__(
        self,
        full_dir: str,
        pruned_dir: str,
        num_cpus: float = 1.0,
        cache_ttl_s: float = 1800.0,
        cache_max_entries: int = 4096,
    ):
        import json
        import os

        with open(os.path.join(pruned_dir, "MANIFEST.json")) as f:
            man = json.load(f)
        if "pruned_m" not in man:
            raise ValueError(f"{pruned_dir} is not a pruned index generation")
        self.m = int(man["pruned_m"])
        # clamp the COMBINED two-tier pool (full + pruned actors) to half
        # the cluster, so a tiered service never starves co-resident work
        # (SearchService re-clamps per pool, which can only shrink further)
        n_actors = len(shard_paths(full_dir)) + len(shard_paths(pruned_dir))
        num_cpus = _fit_pool_cpus(num_cpus, n_actors)
        self.full = SearchService(
            full_dir, num_cpus=num_cpus, cache_ttl_s=cache_ttl_s,
            cache_max_entries=cache_max_entries,
        )
        self.pruned = SearchService(
            pruned_dir, num_cpus=num_cpus, cache_ttl_s=cache_ttl_s,
            cache_max_entries=cache_max_entries,
        )
        self.n_pruned_served = 0
        self.n_full_served = 0

    def route(self, query: str) -> str:
        """'pruned' iff every query term's global df ≤ m (whole posting
        lists survived — exactness guaranteed), else 'full'."""
        from dcs_ray.tokenize import tokenize_query_words

        terms = sorted(set(tokenize_query_words(query)))
        dfs = global_df(self.full.index_dir, terms)
        return (
            "pruned"
            if all(dfs.get(t, 0) <= self.m for t in terms)
            else "full"
        )

    def search(self, queries: list[str] | str, k: int = 10, **kw) -> pa.Table:
        if isinstance(queries, str):
            queries = [queries]
        routes = [self.route(q) for q in queries]
        out: list[pa.Table | None] = [None] * len(queries)
        for tier, svc in (("pruned", self.pruned), ("full", self.full)):
            idxs = [i for i, r in enumerate(routes) if r == tier]
            if not idxs:
                continue
            t = svc.search([queries[i] for i in idxs], k=k, **kw)
            qid = t["query_id"].to_numpy()
            for local, i in enumerate(idxs):
                sub = t.filter(pa.array(qid == local)).drop_columns(["query_id"])
                out[i] = sub.add_column(
                    0,
                    pa.field("query_id", pa.int32()),
                    pa.array(np.full(len(sub), i, np.int32), pa.int32()),
                )
            if tier == "pruned":
                self.n_pruned_served += len(idxs)
            else:
                self.n_full_served += len(idxs)
        return pa.concat_tables([t for t in out if t is not None])

    def routing_info(self) -> dict:
        return {
            "m": self.m,
            "pruned_served": self.n_pruned_served,
            "full_served": self.n_full_served,
        }

    def shutdown(self) -> None:
        self.full.shutdown()
        self.pruned.shutdown()

    def __enter__(self) -> "TieredSearchService":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
