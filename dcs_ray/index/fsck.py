"""Index consistency check + targeted repair (fsck).

Segments are the source of truth and shards are DERIVED byte
concatenations (``merge.py``), so a crash between a segment rewrite
(``update_partition`` / ``compact_deletes``) and its shard re-merge
leaves a shard serving bytes of a segment that no longer exists — a
window the reference closes with a full-merge cleanup cron
(``cleanup-failed-shards.cron:1-2``, ``importer.go:291-316``).  This
engine records PROVENANCE instead: every shard lineage carries the
crc32 of each source segment at merge time (``merge.py
source_checksums``), so staleness is a metadata-only comparison and
repair re-merges exactly the stale shards:

- ``verify_index``: report — stale shards, shards without provenance
  (pre-upgrade merges), pending tombstones, ``*.tmp`` crash leftovers,
  and a segment-lineage vs stats doc-count cross-check.  Pure reads.
- ``repair_index``: re-merge ONLY the stale shards (one Ray task
  each), recompute corpus stats, re-commit the manifest from the
  on-disk segment lineages.  After repair the index is byte-identical
  to an uninterrupted run (``tests/test_fsck.py`` simulates the crash
  window and gates equality against a survivor rebuild).

``compact_deletes`` unions checksum-staleness into its re-merge set, so
re-running a crashed compaction heals the index even though the
already-rewritten partitions no longer intersect the tombstones.
"""

from __future__ import annotations

import json
import os

import ray


def _segment_lineages(index_dir: str) -> dict[str, dict]:
    seg_root = os.path.join(index_dir, "segments")
    out = {}
    for name in sorted(os.listdir(seg_root)):
        if not name.startswith("seg_") or name.endswith(".tmp"):
            continue
        with open(os.path.join(seg_root, name, "lineage.json")) as f:
            out[name] = json.load(f)
    return out


def _shard_lineages(index_dir: str) -> dict[str, dict]:
    shard_root = os.path.join(index_dir, "shards")
    out = {}
    for name in sorted(os.listdir(shard_root)):
        if not name.startswith("shard_") or name.endswith(".tmp"):
            continue
        with open(os.path.join(shard_root, name, "lineage.json")) as f:
            out[name] = json.load(f)
    return out


def stale_shard_ids(index_dir: str) -> list[int]:
    """Shards whose recorded source-segment checksums mismatch the
    segments currently on disk. Metadata-only (no blob reads)."""
    segs = _segment_lineages(index_dir)
    stale = []
    for name, sl in _shard_lineages(index_dir).items():
        srcs = sl.get("source_checksums")
        if srcs is None:  # pre-provenance merge: unknown, not provably stale
            continue
        for seg_name, crc in zip(sl["segments"], srcs):
            cur = segs.get(seg_name)
            if cur is None or cur["checksum"] != crc:
                stale.append(sl["shard_id"])
                break
    return sorted(stale)


def verify_index(index_dir: str, deep: bool = False) -> dict:
    """Consistency report; ``ok`` is True when nothing needs attention
    (pending tombstones are reported but are a VALID serving state —
    search folds them in — so they don't clear ``ok`` on their own).

    ``deep=True`` additionally re-CRCs every segment's postings.bin
    against its lineage checksum — bit rot / truncated writes, the one
    corruption provenance can't see (the data itself, not a derived
    copy). Corrupted segments are unrepairable from within the index
    (segments ARE the source of truth); the report names them so the
    operator can re-import those partitions (``update_partition``)."""
    from dcs_ray.index.deletes import load_tombstones

    segs = _segment_lineages(index_dir)
    corrupted = []
    if deep:
        import zlib

        seg_root = os.path.join(index_dir, "segments")
        for name, lin in segs.items():
            blob = os.path.join(seg_root, name, "postings.bin")
            with open(blob, "rb") as f:
                if zlib.crc32(f.read()) != lin["checksum"]:
                    corrupted.append(name)
    stale = stale_shard_ids(index_dir)
    unknown = [
        sl["shard_id"]
        for sl in _shard_lineages(index_dir).values()
        if sl.get("source_checksums") is None
    ]
    tmp_paths = []
    for root, dirs, files in os.walk(index_dir):
        tmp_paths += [os.path.join(root, n) for n in dirs + files if n.endswith(".tmp")]
        dirs[:] = [d for d in dirs if not d.endswith(".tmp")]
    stats_path = os.path.join(index_dir, "stats", "global.json")
    stats_docs = None
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats_docs = json.load(f)["n_docs"]
    seg_docs = sum(lin["n_docs"] for lin in segs.values())
    return {
        "stale_shards": stale,
        "shards_without_provenance": sorted(unknown),
        "corrupted_segments": corrupted,
        "n_pending_tombstones": int(len(load_tombstones(index_dir))),
        "tmp_paths": sorted(tmp_paths),
        "segment_doc_count": seg_docs,
        "stats_doc_count": stats_docs,
        "stats_consistent": stats_docs == seg_docs,
        "ok": not stale
        and not corrupted
        and not tmp_paths
        and stats_docs == seg_docs,
    }


def repair_index(index_dir: str, task_num_cpus: float = 1.0) -> dict:
    """Heal a crashed update/compaction: re-merge stale shards, clean
    ``*.tmp`` leftovers, recompute stats, re-commit the manifest from
    the on-disk segment lineages. Idempotent; no-op on a healthy index."""
    import shutil
    import time

    from dcs_ray.index.build import (
        cleanup_stale,
        commit_manifest,
        compute_corpus_stats,
        conf_from_manifest,
        load_manifest,
    )
    from dcs_ray.index.merge import merge_one_shard, shard_name

    t0 = time.monotonic()
    removed = cleanup_stale(index_dir)
    stale = set(stale_shard_ids(index_dir))
    man = load_manifest(index_dir)
    conf = conf_from_manifest(man)
    if not stale and not removed:
        rep = verify_index(index_dir)
        if rep["stats_consistent"]:
            return {"stale_shards": [], "tmp_removed": [], "wall_s": 0.0}
    seg_root = os.path.join(index_dir, "segments")
    shard_root = os.path.join(index_dir, "shards")
    shard_lineage = []
    merge_task = ray.remote(num_cpus=task_num_cpus)(merge_one_shard)
    pending = {}
    for name, sl in _shard_lineages(index_dir).items():
        if sl["shard_id"] in stale:
            shutil.rmtree(os.path.join(shard_root, shard_name(sl["shard_id"])))
            pending[sl["shard_id"]] = (
                merge_task.remote(
                    sl["shard_id"],
                    [os.path.join(seg_root, s) for s in sl["segments"]],
                    shard_root,
                ),
                len(shard_lineage),
            )
            shard_lineage.append(None)  # placeholder, filled below
        else:
            shard_lineage.append(sl)
    for sid, (ref, pos) in pending.items():
        shard_lineage[pos] = ray.get(ref)
    stats = compute_corpus_stats(index_dir, conf)
    lineage = [
        lin for _, lin in sorted(
            _segment_lineages(index_dir).items(), key=lambda kv: kv[1]["part_id"]
        )
    ]
    metrics = dict(man.get("metrics") or {})
    metrics["last_repair"] = {
        "stale_shards": sorted(stale),
        "tmp_removed": len(removed),
        "wall_s": round(time.monotonic() - t0, 3),
    }
    commit_manifest(index_dir, conf, lineage, stats, shard_lineage, metrics)
    return metrics["last_repair"]
