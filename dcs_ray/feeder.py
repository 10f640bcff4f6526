"""Continuous ingest loop — the dcs-feeder role (``cmd/dcs-feeder/
feeder.go``: watch incoming.debian.org, feed new packages to the
importer, verify and re-merge) re-expressed for the Parquet world: a
drop directory of parquet files becomes a stream of NRT delta adds.

Contract per file:
* docs carry the index's ``id_col`` with ids STRICTLY greater than
  everything indexed (the NRT monotonicity rule, ``index/nrt.py``);
* a successfully ingested file moves atomically into ``done/``;
* a file whose max id is already ≤ the index's ``id_max`` is treated
  as ALREADY INGESTED (crash between add and rename) and moved to
  ``done/`` without re-adding — that os.replace-after-add ordering is
  what makes the loop resumable;
* a malformed / non-monotone file moves to ``failed/`` with the error
  recorded next to it, and the loop continues (one bad drop must not
  wedge ingest — feeder.go logs and skips the same way).

``svc`` (optional): a :class:`~dcs_ray.service.SearchService` to
``replace_index()`` after a tick that ingested anything, so a resident
serving pool picks the deltas up — the importer→backend swap chain.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq


def _id_max(index_dir: str) -> int:
    """Current GLOBAL max doc id (base + deltas) — from the last
    partition's doc_meta row-group stats, NOT config.id_max (which
    records only the base build's ceiling)."""
    from dcs_ray.index.build import load_manifest
    from dcs_ray.index.nrt import _current_max_doc_id

    return _current_max_doc_id(index_dir, load_manifest(index_dir))


def feed_once(
    index_dir: str,
    incoming_dir: str,
    done_dir: str | None = None,
    failed_dir: str | None = None,
    id_col: str | None = None,
    svc=None,
    task_num_cpus: float = 1.0,
    on_ingested=None,
) -> dict:
    """One tick: ingest every ``*.parquet`` in ``incoming_dir`` (sorted
    by name — drop files named by timestamp/sequence for a stable
    order).  Returns per-tick counts."""
    from dcs_ray.index.build import load_manifest
    from dcs_ray.index.nrt import add_docs

    done_dir = done_dir or os.path.join(incoming_dir, "done")
    failed_dir = failed_dir or os.path.join(incoming_dir, "failed")
    os.makedirs(done_dir, exist_ok=True)
    os.makedirs(failed_dir, exist_ok=True)
    id_col = id_col or load_manifest(index_dir)["config"].get("id_col") or "doc_id"

    out = {"ingested": 0, "skipped_done": 0, "failed": 0, "n_docs": 0}
    for name in sorted(os.listdir(incoming_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(incoming_dir, name)
        try:
            t = pq.read_table(path)
            ids = t[id_col].to_numpy()
            if len(ids) and int(ids.max()) <= _id_max(index_dir):
                # crash window replay: the add landed, the rename didn't
                out["skipped_done"] += 1
                os.replace(path, os.path.join(done_dir, name))
                continue
            info = add_docs(index_dir, t, task_num_cpus=task_num_cpus)
            out["ingested"] += 1
            out["n_docs"] += info["n_docs"]
            os.replace(path, os.path.join(done_dir, name))
            if on_ingested is not None:
                on_ingested(t)
        except Exception as e:
            out["failed"] += 1
            os.replace(path, os.path.join(failed_dir, name))
            with open(os.path.join(failed_dir, name + ".error"), "w") as f:
                f.write(f"{type(e).__name__}: {e}\n")
    if svc is not None and (out["ingested"] or out["skipped_done"]):
        svc.replace_index()
    return out


def feed_loop(
    index_dir: str,
    incoming_dir: str,
    interval_s: float = 5.0,
    max_ticks: int | None = None,
    svc=None,
    **kw,
) -> None:
    """Poll loop (feeder.go's checkSources cadence); ``max_ticks``
    bounds it for tests — None runs until interrupted."""
    tick = 0
    while max_ticks is None or tick < max_ticks:
        res = feed_once(index_dir, incoming_dir, svc=svc, **kw)
        if any(res.values()):
            print(json.dumps({"tick": tick, **res}), flush=True)
        tick += 1
        if max_ticks is None or tick < max_ticks:
            time.sleep(interval_s)


def feed_with_alerts(
    index_dir: str,
    incoming_dir: str,
    standing_queries: list[list[str]],
    **kw,
):
    """Ingest tick + prospective alerts over ONLY the newly ingested
    docs — selective dissemination on the live stream (the SIFT role
    composed onto the feeder: every Google-Alerts-style standing query
    is probed against each delta batch as it lands, zero index reads).

    Returns ``(tick_counts, alerts_table)`` where alerts is
    (doc_id, query_id) rows for the docs ingested THIS tick.
    """
    import pyarrow as pa
    import ray
    import ray.data

    from dcs_ray.functions.prospective import compile_queries, match_stream

    ingested: list[pa.Table] = []
    res = feed_once(index_dir, incoming_dir, on_ingested=ingested.append, **kw)
    if not ingested:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "query_id": pa.array([], pa.int64())})
        return res, empty
    comp_ref = ray.put(compile_queries(standing_queries))
    ds = match_stream(
        ray.data.from_arrow(pa.concat_tables(
            [t.select(["doc_id", "text"]) for t in ingested]
        )),
        comp_ref,
    )
    alerts = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return res, alerts
