"""Near-real-time adds — delta segments searched alongside the main index.

dcs ingests new packages by importing fresh per-package index shards
that become visible at the next index swap
(``cmd/dcs-package-importer/importer.go:319-390``); at web scale new
crawl batches arrive continuously and cannot wait for a partition-sized
rebuild, so this engine adds the Lucene flush model (public design) on
the existing artifacts:

- ``add_docs(index_dir, docs)``: builds ONE delta segment (a new
  partition id past the current max) inside a Ray task, merges it into
  its OWN new shard — no existing segment or shard byte changes — then
  recomputes exact corpus stats (vocab-scale, not corpus-scale) and
  re-commits the manifest atomically.  BM25 over main + deltas is
  RANK-IDENTICAL to a batch rebuild of the full corpus: df sums over
  all shard term_dicts, N/avgdl over all segment lineages — there is
  no approximation to converge from
  (``tests/test_nrt.py::test_add_equals_full_build``).
- Doc ids must be strictly greater than every id already indexed
  (monotone append — the natural crawl shape): the shard merge is pure
  byte concatenation (``merge.py``), which requires ascending ids
  across a shard's segments, and a later ``reshard()`` folds delta
  segments into main shards under the same invariant.  The current
  ceiling is read from the LAST segment's doc_meta parquet statistics
  (a metadata-only read).
- Composition: ``delete_docs`` (``deletes.py``) tombstones added docs
  like any other; accumulated deltas fold back with
  ``build.reshard(out_dir, k)`` — the Lucene "segment merge" step,
  reusing the posting-balanced concat planner.

Scale notes: one add = one segment build task + one single-segment
"merge" (a copy) + a vocab-scale stats pass; nothing corpus-sized moves.
Search fan-out grows by one task per delta until the next reshard, so
an NRT pipeline reshards on a delta-count or delta-bytes threshold.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray

from dcs_ray.index.segment import build_segment_data, segment_name, write_segment


def _current_max_doc_id(index_dir: str, manifest: dict) -> int:
    """Global max doc id — the max of the LAST partition's doc_meta
    (ids ascend across partitions), from parquet row-group statistics."""
    from dcs_ray.index.build import parquet_col_max

    last = max(manifest["partitions"], key=lambda r: r["part_id"])
    return int(
        parquet_col_max(
            os.path.join(index_dir, "segments", last["segment"], "doc_meta.parquet"),
            "doc_id",
        )
    )


def add_docs(index_dir: str, docs: pa.Table, task_num_cpus: float = 1.0) -> dict:
    """Append ``docs`` as one delta segment + one delta shard; returns
    the add metrics.  Requires ``conf.id_col`` ids strictly greater than
    everything already indexed (see module docstring)."""
    from dcs_ray.index.build import (
        commit_manifest,
        conf_from_manifest,
        load_manifest,
    )
    from dcs_ray.index.merge import merge_one_shard

    man = load_manifest(index_dir)
    conf = conf_from_manifest(man)
    if len(docs) == 0:
        return {"n_docs": 0, "part_id": None, "shard_id": None}
    if conf.id_col is not None:
        ids = docs[conf.id_col].to_numpy()
        if len(np.unique(ids)) != len(ids):
            raise ValueError("duplicate doc ids in the add batch")
        floor = _current_max_doc_id(index_dir, man)
        if int(ids.min()) <= floor:
            raise ValueError(
                f"add_docs requires monotone ids: batch min {int(ids.min())} "
                f"<= current max {floor} (delete+re-add under a NEW id, or "
                "use update_partition for in-place edits)"
            )
    t0 = time.monotonic()
    pid = max(r["part_id"] for r in man["partitions"]) + 1
    sid = max((s["shard_id"] for s in man["shards"]), default=-1) + 1
    seg_root = os.path.join(index_dir, "segments")
    shard_root = os.path.join(index_dir, "shards")

    @ray.remote(num_cpus=task_num_cpus)
    def build_delta(tbl: pa.Table) -> tuple[str, str]:
        t1 = time.monotonic()
        seg = build_segment_data(pid, tbl, conf)
        rec = write_segment(
            seg_root, seg,
            extra={"delta": True, "build_wall_s": round(time.monotonic() - t1, 4)},
        )
        shard_rec = merge_one_shard(
            sid, [os.path.join(seg_root, segment_name(pid))], shard_root
        )
        return json.dumps(rec), json.dumps(shard_rec)

    rec_js, shard_js = ray.get(build_delta.remote(docs))
    rec, shard_rec = json.loads(rec_js), json.loads(shard_js)

    from dcs_ray.index.build import compute_corpus_stats

    stats = compute_corpus_stats(index_dir, conf)
    metrics = dict(man.get("metrics") or {})
    n_deltas = sum(1 for r in man["partitions"] if r.get("delta")) + 1
    metrics["last_add"] = {
        "part_id": pid,
        "shard_id": sid,
        "n_docs": rec["n_docs"],
        "n_delta_segments": n_deltas,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    commit_manifest(
        index_dir, conf, man["partitions"] + [rec], stats,
        man["shards"] + [shard_rec], metrics,
    )
    return metrics["last_add"]
