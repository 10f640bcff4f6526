"""In-flight query progress events.

The reference streams per-backend ``filesProcessed/filesTotal`` updates
on a ~2-2.5 s cadence while the grep runs
(``internal/sourcebackend/sourcebackend.go:383-412``) and the query
manager keeps an event list with newest-wins obsoletion — a fresh
ProgressUpdate obsoletes older ones, since a client that joins late only
cares about the latest (``cmd/dcs-web/querymanager_events.go:24-60``).

Here the event buffer is a tiny named Ray actor: worker-side stages
(grep verifiers, shard scorers) ``post`` cumulative counts keyed by
``(query_id, shard)``; the driver (or the HTTP front door's
``/v1/progress``) reads ``snapshot`` — the newest event per shard plus
overall done-ness.  A bounded per-query history is kept so tests and
``replay`` can show the progress *trajectory*, mirroring the reference's
pre-obsoletion event stream.
"""

from __future__ import annotations

import time

import ray

_BUS_NAME = "dcs_ray_progress_bus"
_HISTORY_CAP = 1000  # per query — telemetry-sized, never corpus-sized
_QUERY_CAP = 512     # distinct query_ids kept (LRU) — a long-lived
                     # server with per-request ids must not grow the
                     # bus without bound (dcs GCs finished queries the
                     # same way, querymanager.go:142-181)


@ray.remote(num_cpus=0)
class ProgressBus:
    """Newest-wins progress store + bounded history (driver-lifetime)."""

    def __init__(self):
        self._latest: dict[str, dict[str, dict]] = {}   # qid -> shard -> event
        self._history: dict[str, list[dict]] = {}
        self._seq = 0

    def post(self, query_id: str, shard: str, processed: int, total: int,
             done: bool = False, n_results: int | None = None) -> None:
        self._seq += 1
        ev = {
            "seq": self._seq,
            "t": time.monotonic(),
            "query_id": query_id,
            "shard": shard,
            "processed": int(processed),
            "total": int(total),
            "done": bool(done),
        }
        if n_results is not None:
            ev["n_results"] = int(n_results)
        # newest-wins: this event obsoletes the previous one for the
        # same (query, shard) — the querymanager_events obsoletion rule
        self._latest.setdefault(query_id, {})[shard] = ev
        h = self._history.setdefault(query_id, [])
        h.append(ev)
        if len(h) > _HISTORY_CAP:
            del h[: len(h) - _HISTORY_CAP]
        # LRU over query ids: touching a query moves it newest; beyond
        # the cap the stalest query's state is dropped entirely
        self._latest[query_id] = self._latest.pop(query_id)
        self._history[query_id] = self._history.pop(query_id)
        while len(self._latest) > _QUERY_CAP:
            old = next(iter(self._latest))
            self._latest.pop(old, None)
            self._history.pop(old, None)

    def snapshot(self, query_id: str) -> dict:
        """Latest event per shard + rollup — what a late-joining client
        sees (only the non-obsoleted events)."""
        shards = self._latest.get(query_id, {})
        evs = sorted(shards.values(), key=lambda e: e["shard"])
        return {
            "query_id": query_id,
            "shards": evs,
            "processed": sum(e["processed"] for e in evs),
            "total": sum(e["total"] for e in evs),
            "done": bool(evs) and all(e["done"] for e in evs),
            "n_results": sum(e.get("n_results", 0) for e in evs),
        }

    def history(self, query_id: str) -> list[dict]:
        return list(self._history.get(query_id, []))

    def clear(self, query_id: str) -> None:
        self._latest.pop(query_id, None)
        self._history.pop(query_id, None)


_BUS_HANDLE = None


def get_bus() -> "ray.actor.ActorHandle":
    """Get-or-create the named bus (one per Ray session).  The handle
    is cached module-level: a named non-detached actor is GC'd as soon
    as every handle drops, so a transient local handle would kill the
    bus between a search call and a later snapshot poll."""
    global _BUS_HANDLE
    if _BUS_HANDLE is None:
        _BUS_HANDLE = ProgressBus.options(
            name=_BUS_NAME, get_if_exists=True, lifetime=None
        ).remote()
    return _BUS_HANDLE


class ProgressReporter:
    """Worker-side helper: rate-limited cumulative posts to the bus.

    ``report_every_s`` mirrors the reference's ~2 s progress interval;
    tests drop it to 0 to capture every tick.  ``flush(done=True)``
    always posts (the final files==total update is unconditional in
    sourcebackend.go:406-408).
    """

    def __init__(self, bus, query_id: str, shard: str, total: int,
                 report_every_s: float = 2.0):
        self.bus = bus
        self.query_id = query_id
        self.shard = shard
        self.total = total
        self.every = report_every_s
        self.processed = 0
        self.n_results = 0
        self._last = 0.0  # force an immediate first post

    def add(self, n_docs: int, n_results: int = 0) -> None:
        self.processed += n_docs
        self.n_results += n_results
        now = time.monotonic()
        if now - self._last >= self.every:
            self.bus.post.remote(
                self.query_id, self.shard, self.processed, self.total,
                done=False, n_results=self.n_results,
            )
            self._last = now

    def flush(self, done: bool = True) -> None:
        self.bus.post.remote(
            self.query_id, self.shard, self.processed, self.total,
            done=done, n_results=self.n_results,
        )
