"""Tombstone deletes + compaction — the missing index-lifecycle verb.

dcs removes documents by re-importing their source package without them
(a full partition rebuild, ``cmd/dcs-package-importer/importer.go:319-390``);
at web scale takedowns / robots-revocations arrive as doc-id lists long
before their partitions are due a rebuild, so this engine adds the
Lucene live-docs model (public design) on top of the same segment files:

- ``delete_docs``: ids merge into one sorted ``tombstones.parquet``
  next to MANIFEST (tmp+rename atomic, idempotent).  NO segment bytes
  change, so a delete is O(n_tombstones) regardless of corpus size.
- query time: the BM25 search paths fold the tombstone set into the
  shard doc filter (sorted-array exclusion probe), so a deleted doc can
  never be returned — but surviving docs keep the PRE-delete statistics
  (df, N, avgdl), exactly Lucene's semantics where idf counts deleted
  docs until segments merge.
- ``compact_deletes``: one Ray task per partition rewrites ONLY the
  segments whose doc ids intersect the tombstones — whole-blob decode →
  keep-mask → ``pack_postings`` re-encode, all entries of all terms in
  one vectorized stream (terms whose df drops to 0 leave term_dict;
  positional sections re-pack through the same ``_pack_positional``
  writer the build uses) — then only the affected shards re-merge and
  corpus stats recompute.  Post-compaction the index is bit-identical
  to a fresh build of the surviving corpus
  (``tests/test_deletes.py::test_compact_equals_rebuild``), so scores
  match the corpus-minus-deleted oracle exactly.

Scale notes: the tombstone set is broadcast once per compaction via
``ray.put``; the per-partition rewrite touches each posting block once
(numpy per block, ≤128 entries each) and never shuffles — partitions
that hold no tombstoned doc return untouched without rewriting a byte.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from dcs_ray.codec import HEADER_DTYPE, HEADER_SIZE, decode_block, pack_postings

TOMBSTONES = "tombstones.parquet"


def tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONES)


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted uint64 tombstoned doc ids (empty array when none)."""
    p = tombstone_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.uint64)
    return pq.read_table(p)["doc_id"].to_numpy().astype(np.uint64)


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone ``doc_ids`` (idempotent union with any existing set)."""
    ids = np.unique(np.asarray(doc_ids, dtype=np.uint64))
    old = load_tombstones(index_dir)
    merged = np.union1d(old, ids)
    tmp = tombstone_path(index_dir) + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.uint64())}), tmp)
    os.replace(tmp, tombstone_path(index_dir))
    return {"n_tombstones": int(len(merged)), "n_new": int(len(merged) - len(old))}


def _isin_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``values`` appear in the sorted uint64 set."""
    if len(sorted_set) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_set, values)
    return (pos < len(sorted_set)) & (
        sorted_set[np.minimum(pos, len(sorted_set) - 1)] == values
    )


def _decode_all_blocks(blob: np.ndarray):
    """Decode every posting block of a segment blob → flat
    (doc_ids u64, tfs u64, block_byte_offsets i64, block_entry_counts i64)."""
    ids, tfs, offs, ns = [], [], [], []
    pos, n = 0, len(blob)
    while pos < n:
        header = blob[pos : pos + HEADER_SIZE].view(HEADER_DTYPE)[0]
        body_end = pos + HEADER_SIZE + int(header["nbytes"])
        d, t = decode_block(header, blob[pos + HEADER_SIZE : body_end])
        ids.append(d)
        tfs.append(t)
        offs.append(pos)
        ns.append(len(d))
        pos = body_end
    if not ids:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy(), np.empty(0, np.int64), np.empty(0, np.int64)
    return (
        np.concatenate(ids),
        np.concatenate(tfs),
        np.asarray(offs, dtype=np.int64),
        np.asarray(ns, dtype=np.int64),
    )


def _compact_segment_dir(seg_dir: str, dead: np.ndarray, conf) -> dict | None:
    """Rewrite one segment dropping tombstoned docs; None if untouched."""
    from dcs_ray.index.segment import _pack_positional, write_segment

    dm = pq.read_table(os.path.join(seg_dir, "doc_meta.parquet"))
    doc_ids = dm["doc_id"].to_numpy().astype(np.uint64)
    kill = _isin_sorted(doc_ids, dead)
    if not kill.any():
        return None
    t0 = time.monotonic()
    td = pq.read_table(os.path.join(seg_dir, "term_dict.parquet"))
    t_off = td["offset"].to_numpy().astype(np.int64)
    blob = np.fromfile(os.path.join(seg_dir, "postings.bin"), dtype=np.uint8)
    all_doc, all_tf, blk_off, blk_n = _decode_all_blocks(blob)
    # block → owning term via the term_dict byte spans (offsets ascend,
    # every term owns ≥1 byte), then fan out to one term id per entry
    entry_term = np.repeat(np.searchsorted(t_off, blk_off, side="right") - 1, blk_n)
    keep = ~_isin_sorted(all_doc, dead)
    nterms = len(td)
    new_df = np.bincount(entry_term[keep], minlength=nterms).astype(np.int64)
    live_terms = new_df > 0  # terms losing every posting leave term_dict
    # kept entries stay (term, doc_id)-sorted: the mask preserves order
    k_doc, k_tf, k_term = all_doc[keep], all_tf[keep], entry_term[keep]
    # group offsets over LIVE terms only (bincount of compacted term ids)
    remap = np.cumsum(live_terms) - 1  # old term idx → new term idx
    counts = new_df[live_terms]
    group_offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    new_blob, n_off, n_len = (
        pack_postings(group_offsets, k_doc, k_tf, codec=conf.codec)
        if len(k_doc)
        else (b"", np.empty(0, np.int64), np.empty(0, np.int64))
    )
    max_tf = (
        np.maximum.reduceat(k_tf, group_offsets[:-1]).astype(np.uint32)
        if len(k_doc)
        else np.empty(0, np.uint32)
    )
    terms_live = td["term"].combine_chunks().filter(pa.array(live_terms))

    positions_blob, pos_dict = None, None
    pos_path = os.path.join(seg_dir, "positions.bin")
    if os.path.exists(pos_path):
        from dcs_ray.codec import unpack_positions

        pblob = np.fromfile(pos_path, dtype=np.uint8)
        pdt = pq.read_table(os.path.join(seg_dir, "pos_dict.parquet"))
        p_offs = pdt["offset"].to_numpy().astype(np.int64)
        p_lens = pdt["nbytes"].to_numpy().astype(np.int64)
        # rebuild the flat grouped streams _pack_positional expects;
        # per-term loop (vocab-sized, inside one partition task)
        docs_l, starts_l, pos_l = [], [], []
        base = 0
        for ti in np.flatnonzero(live_terms):
            d, off, p = unpack_positions(pblob[p_offs[ti] : p_offs[ti] + p_lens[ti]])
            dkeep = ~_isin_sorted(d.astype(np.uint64), dead)
            npos = np.diff(off)
            if dkeep.all():
                docs_l.append(d.astype(np.uint64))
                starts_l.append(base + off[:-1])
                pos_l.append(p)
                base += len(p)
                continue
            docs_l.append(d.astype(np.uint64)[dkeep])
            kept_npos = npos[dkeep]
            starts_l.append(base + np.concatenate(([0], np.cumsum(kept_npos)[:-1])))
            take = np.concatenate(
                [np.arange(off[i], off[i + 1]) for i in np.flatnonzero(dkeep)]
            ) if dkeep.any() else np.empty(0, np.int64)
            pos_l.append(p[take])
            base += int(kept_npos.sum())
        p_doc = np.concatenate(docs_l) if docs_l else np.empty(0, np.uint64)
        pair_starts = (
            np.concatenate(starts_l).astype(np.int64) if starts_l else np.empty(0, np.int64)
        )
        tpos = np.concatenate(pos_l) if pos_l else np.empty(0, np.uint64)
        positions_blob, pos_dict = _pack_positional(
            terms_live, group_offsets, p_doc, pair_starts, tpos
        )

    live_docs = ~kill
    dm_new = dm.filter(pa.array(live_docs))
    core = {"doc_id", "url", "doc_len"}
    part_id = int(os.path.basename(seg_dir).split("_")[-1])
    seg = {
        "part_id": part_id,
        "doc_ids": dm_new["doc_id"].to_numpy().astype(np.uint64),
        "urls": dm_new["url"].combine_chunks(),
        "meta": {
            c: dm_new[c].combine_chunks() for c in dm_new.column_names if c not in core
        },
        "doc_len": dm_new["doc_len"].to_numpy().astype(np.uint32),
        "terms": terms_live,
        "df": counts.astype(np.uint32),
        "offset": n_off,
        "nbytes": n_len,
        "max_tf": max_tf,
        "blob": new_blob,
        "positions_blob": positions_blob,
        "pos_dict": pos_dict,
        "mode": conf.mode,
    }
    del remap  # (kept for clarity: live-term compaction is the remap)
    return write_segment(
        os.path.dirname(seg_dir),
        seg,
        extra={"build_wall_s": round(time.monotonic() - t0, 4), "compacted": True},
        replace=True,
    )


def compact_deletes(index_dir: str, task_num_cpus: float = 1.0) -> dict:
    """Physically remove tombstoned docs: parallel per-partition segment
    rewrite (untouched partitions are no-ops), re-merge of ONLY the
    affected shards, stats recompute, atomic manifest re-commit, and
    tombstone clear.  Returns the new manifest's metrics entry."""
    import json as _json
    import shutil

    from dcs_ray.index.build import (
        commit_manifest,
        compute_corpus_stats,
        conf_from_manifest,
        load_manifest,
    )
    from dcs_ray.index.merge import merge_one_shard, shard_name

    dead = load_tombstones(index_dir)
    man = load_manifest(index_dir)
    conf = conf_from_manifest(man)
    if len(dead) == 0:
        return {"n_compacted": 0, "n_tombstones": 0}
    t0 = time.monotonic()
    seg_root = os.path.join(index_dir, "segments")
    dead_ref = ray.put(dead)
    recs = {r["part_id"]: r for r in man["partitions"]}

    def run(batch: pa.Table) -> pa.Table:
        dd = ray.get(dead_ref)
        out = []
        for pid in batch["part_id"].to_pylist():
            rec = _compact_segment_dir(
                os.path.join(seg_root, recs[pid]["segment"]), dd, conf
            )
            out.append(_json.dumps(rec) if rec else "")
        return pa.table(
            {"part_id": batch["part_id"], "lineage": pa.array(out, pa.string())}
        )

    done = (
        ray.data.from_items([{"part_id": p} for p in sorted(recs)])
        .map_batches(run, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus)
        .take_all()
    )
    compacted = [row["part_id"] for row in done if row["lineage"]]

    shard_root = os.path.join(index_dir, "shards")
    shard_lineage = list(man["shards"])
    # re-merge every shard whose recorded source checksums no longer
    # match the segments on disk — covers THIS run's rewrites AND any
    # prior crashed compaction's, whose partitions no longer intersect
    # the tombstones (``fsck.py``); the partition-containment test stays
    # as the fallback for pre-provenance shard lineage
    from dcs_ray.index.fsck import stale_shard_ids

    stale = set(stale_shard_ids(index_dir))
    touched = [
        s
        for s in man["shards"]
        if s["shard_id"] in stale
        or any(recs[p]["segment"] in s["segments"] for p in compacted)
    ]
    merge_task = ray.remote(num_cpus=task_num_cpus)(merge_one_shard)
    pending = []
    for s in touched:
        shutil.rmtree(os.path.join(shard_root, shard_name(s["shard_id"])), ignore_errors=True)
        pending.append(
            merge_task.remote(
                s["shard_id"],
                [os.path.join(seg_root, name) for name in s["segments"]],
                shard_root,
            )
        )
    for new_shard in ray.get(pending):
        shard_lineage = [
            new_shard if s["shard_id"] == new_shard["shard_id"] else s
            for s in shard_lineage
        ]
    stats = compute_corpus_stats(index_dir, conf)
    metrics = dict(man.get("metrics") or {})
    metrics["last_compaction"] = {
        "n_tombstones": int(len(dead)),
        "n_compacted_partitions": len(compacted),
        "n_remerged_shards": len(touched),
        "wall_s": round(time.monotonic() - t0, 3),
    }
    # partition lineage from the on-disk lineage.json files, not the old
    # manifest — a prior crashed run's rewrites are already there
    from dcs_ray.index.fsck import _segment_lineages

    lineage = [
        lin
        for _, lin in sorted(
            _segment_lineages(index_dir).items(), key=lambda kv: kv[1]["part_id"]
        )
    ]
    commit_manifest(index_dir, conf, lineage, stats, shard_lineage, metrics)
    os.remove(tombstone_path(index_dir))
    return metrics["last_compaction"]
