"""Index fsck: provenance-based staleness detection + targeted repair
(``dcs_ray/index/fsck.py``).

The crash window it closes: a segment rewrite (compaction/update) that
dies BEFORE its shard re-merge leaves shards serving bytes of segments
that no longer exist — and on resume the rewritten partitions no longer
intersect the tombstones, so intersection-based logic alone would never
re-merge them. Shard lineage now records each source segment's checksum
at merge time, making staleness a metadata-only comparison.
"""

import os

import numpy as np
import pyarrow.parquet as pq
from test_deletes import SF, _assert_index_identical, _build

from dcs_ray.index.build import conf_from_manifest, load_manifest
from dcs_ray.index.deletes import (
    _compact_segment_dir,
    compact_deletes,
    delete_docs,
    load_tombstones,
    tombstone_path,
)
from dcs_ray.index.fsck import repair_index, stale_shard_ids, verify_index
from dcs_ray.search import search_bm25

QUERY = "spark merge join"


def _dead_ids(mod: int, rem: int) -> np.ndarray:
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    return np.sort(ids[ids % mod == rem].astype(np.uint64))


def _simulate_crash_after_rewrites(out: str, dead: np.ndarray) -> None:
    """Run ONLY the per-partition segment rewrites of a compaction —
    the state a kill between rewrite and shard re-merge leaves."""
    man = load_manifest(out)
    conf = conf_from_manifest(man)
    seg_root = os.path.join(out, "segments")
    for rec in man["partitions"]:
        _compact_segment_dir(os.path.join(seg_root, rec["segment"]), dead, conf)


def test_verify_ok_and_provenance_on_healthy_index(tmp_path):
    out = str(tmp_path / "idx")
    _build(out)
    rep = verify_index(out)
    assert rep["ok"] and rep["stale_shards"] == []
    assert rep["shards_without_provenance"] == []
    assert rep["n_pending_tombstones"] == 0
    assert rep["stats_consistent"]
    assert repair_index(out)["stale_shards"] == []


def test_crashed_compaction_resumes_to_rebuild(tmp_path):
    """The headline resume property: after the crash window, re-running
    compact_deletes must still converge to the survivor rebuild — the
    rewritten partitions no longer intersect the tombstones, so only
    checksum staleness can route their shards to re-merge."""
    out = str(tmp_path / "idx")
    man = _build(out)
    id_max = man["config"]["id_max"]
    dead = _dead_ids(9, 2)
    delete_docs(out, dead)
    _simulate_crash_after_rewrites(out, dead)
    rep = verify_index(out)
    assert rep["stale_shards"] and not rep["ok"]
    assert not rep["stats_consistent"]  # stats still pre-delete

    compact_deletes(out)
    assert verify_index(out)["ok"]
    assert len(load_tombstones(out)) == 0
    fresh = str(tmp_path / "fresh")
    _build(fresh, id_max=id_max, drop_ids=dead)
    _assert_index_identical(out, fresh, shards=False)
    assert search_bm25(out, [QUERY], k=10).equals(
        search_bm25(fresh, [QUERY], k=10)
    )


def test_repair_heals_even_without_tombstones(tmp_path):
    """Worst case: the crash state with the tombstone file ALSO gone —
    repair has no deletion context at all, only provenance, and must
    still restore shard/stats consistency to the survivor rebuild."""
    out = str(tmp_path / "idx")
    man = _build(out)
    id_max = man["config"]["id_max"]
    dead = _dead_ids(7, 3)
    delete_docs(out, dead)
    _simulate_crash_after_rewrites(out, dead)
    os.remove(tombstone_path(out))

    rep = repair_index(out)
    assert rep["stale_shards"]
    v = verify_index(out)
    assert v["ok"] and v["n_pending_tombstones"] == 0
    fresh = str(tmp_path / "fresh")
    _build(fresh, id_max=id_max, drop_ids=dead)
    _assert_index_identical(out, fresh, shards=False)
    assert search_bm25(out, [QUERY], k=10).equals(
        search_bm25(fresh, [QUERY], k=10)
    )
    # and repair is idempotent
    assert repair_index(out)["stale_shards"] == []


def test_deep_verify_detects_blob_corruption(tmp_path):
    """deep=True re-CRCs postings.bin; a single flipped byte in one
    segment is named in the report (unrepairable — segments are the
    source of truth — so it is reported, not healed)."""
    out = str(tmp_path / "idx")
    _build(out)
    assert verify_index(out, deep=True)["ok"]
    blob = os.path.join(out, "segments", "seg_000001", "postings.bin")
    data = bytearray(open(blob, "rb").read())
    data[len(data) // 2] ^= 0xFF
    with open(blob, "wb") as f:
        f.write(data)
    rep = verify_index(out, deep=True)
    assert rep["corrupted_segments"] == ["seg_000001"] and not rep["ok"]
    # shallow verify can't see it (checksums aren't recomputed)
    assert verify_index(out)["ok"]
