"""k-way segment merge into sharded immutable indexes (dcs ConcatN, M1).

Reference semantics: ``internal/index/merge.go:152-250`` — for each term
in global sorted order, append each source segment's posting run in
source order, rebasing doc ids. Our doc ids are already globally unique
and ascending across partitions (range/shifted assignment in
``segment.py``), and codec blocks are self-contained, so the merge of
one term is **pure byte concatenation** of its per-segment blob slices
— no decode, no re-encode (the rebase of ``merge.go:252-341`` is
precomputed into the id space).

Each shard merges a contiguous range of partitions; one Ray task per
shard, balanced by posting count. Memory stays bounded: source blobs are
memory-mapped, the destination is a preallocated memmap, and the copy is
a per-segment vectorized scatter (no per-term Python loop over bytes).
Shard writes are temp+rename; completed shards are skipped on resume.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from dcs_ray.codec import _ranges
from dcs_ray.index.config import IndexConfig
from dcs_ray.index.segment import segment_name


def shard_name(shard_id: int) -> str:
    return f"shard_{shard_id:04d}"


def plan_shards(out_dir: str, num_shards: int) -> list[dict]:
    """Assign contiguous partition ranges to shards, balanced by posting
    count (greedy prefix split)."""
    seg_root = os.path.join(out_dir, "segments")
    segs = sorted(
        d for d in os.listdir(seg_root) if d.startswith("seg_") and not d.endswith(".tmp")
    )
    weights = []
    for s in segs:
        with open(os.path.join(seg_root, s, "lineage.json")) as f:
            weights.append(json.load(f)["n_postings"] + 1)
    total = sum(weights)
    target = total / num_shards
    shards, cur, acc = [], [], 0.0
    for s, w in zip(segs, weights):
        cur.append(s)
        acc += w
        if acc >= target * (len(shards) + 1) and len(shards) < num_shards - 1:
            shards.append(cur)
            cur = []
    if cur:
        shards.append(cur)
    return [
        {"shard_id": i, "segments": [os.path.join(seg_root, s) for s in segs_i]}
        for i, segs_i in enumerate(shards)
    ]


def merge_one_shard(shard_id: int, seg_paths: list[str], shard_root: str) -> dict:
    t0 = time.monotonic()
    final = os.path.join(shard_root, shard_name(shard_id))
    if os.path.exists(os.path.join(final, "lineage.json")):
        with open(os.path.join(final, "lineage.json")) as f:
            return json.load(f)  # resume: already merged
    tmp = final + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    k = len(seg_paths)
    term_arrays, dfs, offs, lens, mtfs, seg_of = [], [], [], [], [], []
    for i, p in enumerate(seg_paths):
        td = pq.read_table(os.path.join(p, "term_dict.parquet"))
        term_arrays.append(td["term"].combine_chunks())
        dfs.append(td["df"].combine_chunks().to_numpy())
        offs.append(td["offset"].combine_chunks().to_numpy())
        lens.append(td["nbytes"].combine_chunks().to_numpy())
        mtfs.append(td["max_tf"].combine_chunks().to_numpy())
        seg_of.append(np.full(len(td), i, dtype=np.int32))

    all_terms = pa.concat_arrays(term_arrays)
    all_df = np.concatenate(dfs) if dfs else np.empty(0, np.int64)
    all_off = np.concatenate(offs) if offs else np.empty(0, np.int64)
    all_len = np.concatenate(lens) if lens else np.empty(0, np.int64)
    all_mtf = np.concatenate(mtfs) if mtfs else np.empty(0, np.int64)
    all_seg = np.concatenate(seg_of) if seg_of else np.empty(0, np.int32)
    n_runs = len(all_df)

    # global order: (term asc, segment asc) — segment order == partition
    # order == doc-id order (merge.go:174-179 trigram order; 126-135 bases)
    sort_idx = pc.sort_indices(
        pa.table({"term": all_terms, "seg": pa.array(all_seg)}),
        sort_keys=[("term", "ascending"), ("seg", "ascending")],
    ).to_numpy()
    s_terms = all_terms.take(pa.array(sort_idx))
    s_df = all_df[sort_idx]
    s_off = all_off[sort_idx]
    s_len = all_len[sort_idx]
    s_mtf = all_mtf[sort_idx]
    s_seg = all_seg[sort_idx]

    # term group boundaries over the sorted run list
    if n_runs:
        enc = pc.dictionary_encode(s_terms)
        tidx = (enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc).indices.to_numpy(zero_copy_only=False)
        tb = np.flatnonzero(tidx[1:] != tidx[:-1]) + 1
        group_offsets = np.concatenate(([0], tb, [n_runs]))
        first_run = group_offsets[:-1]
        uniq_terms = s_terms.take(pa.array(first_run))
        run_dst = np.concatenate(([0], np.cumsum(s_len)))
        term_off = run_dst[first_run]
        term_len = run_dst[group_offsets[1:]] - term_off
        term_df = np.add.reduceat(s_df, first_run)
        term_mtf = np.maximum.reduceat(s_mtf, first_run)
        total_bytes = int(run_dst[-1])
    else:
        uniq_terms = s_terms
        term_off = term_len = term_df = term_mtf = np.empty(0, np.int64)
        total_bytes = 0
        run_dst = np.zeros(1, np.int64)

    # copy blobs: one vectorized scatter per source segment
    out_path = os.path.join(tmp, "postings.bin")
    if total_bytes:
        out = np.memmap(out_path, dtype=np.uint8, mode="w+", shape=(total_bytes,))
        for i, p in enumerate(seg_paths):
            src_file = os.path.join(p, "postings.bin")
            if not os.path.getsize(src_file):
                continue
            src = np.memmap(src_file, dtype=np.uint8, mode="r")
            mask = s_seg == i
            if not mask.any():
                continue
            src_idx = _ranges(s_off[mask], s_len[mask])
            dst_idx = _ranges(run_dst[:-1][mask], s_len[mask])
            out[dst_idx] = src[src_idx]
        out.flush()
        checksum = zlib.crc32(memoryview(out))
        del out
    else:
        open(out_path, "wb").close()
        checksum = 0

    pq.write_table(
        pa.table(
            {
                "term": uniq_terms,
                "df": pa.array(term_df.astype(np.uint32), pa.uint32()),
                "offset": pa.array(term_off.astype(np.int64), pa.int64()),
                "nbytes": pa.array(term_len.astype(np.int64), pa.int64()),
                "max_tf": pa.array(term_mtf.astype(np.uint32), pa.uint32()),
            }
        ),
        os.path.join(tmp, "term_dict.parquet"),
    )
    # doc_meta is NOT re-encoded: segment order == doc-id order, so the
    # shard's doc_meta is the ordered concatenation of its segments'
    # tables — a refs file replaces the parquet rewrite (at 4M docs the
    # re-encode was the dominant non-scaling constant of the merge stage;
    # dcs likewise concatenates docid maps with base offsets rather than
    # rewriting them, merge.go:113-150)
    n_docs = 0
    for p in seg_paths:
        with open(os.path.join(p, "lineage.json")) as f:
            n_docs += json.load(f)["n_docs"]
    with open(os.path.join(tmp, "doc_meta_refs.json"), "w") as f:
        json.dump(
            {"segments": [os.path.relpath(p, shard_root) for p in seg_paths]}, f
        )

    lineage = {
        "shard_id": shard_id,
        "shard": shard_name(shard_id),
        "segments": [os.path.basename(p) for p in seg_paths],
        "n_docs": n_docs,
        "n_terms": int(len(uniq_terms)),
        "n_postings": int(term_df.sum()) if len(uniq_terms) else 0,
        "blob_bytes": total_bytes,
        "checksum": checksum,
        "wall_s": round(time.monotonic() - t0, 4),
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f)
    if os.path.exists(final):
        import shutil

        shutil.rmtree(tmp)
    else:
        os.rename(tmp, final)
    return lineage


def merge_shards(out_dir: str, conf: IndexConfig) -> list[dict]:
    """Merge all segments into ``conf.num_shards`` shard indexes, one Ray
    task per shard (merge concurrency; dcs serializes merges via a
    single-flight semaphore ``importer.go:595-600`` — we parallelize
    across shards since they're independent)."""
    shard_root = os.path.join(out_dir, "shards")
    os.makedirs(shard_root, exist_ok=True)
    specs = plan_shards(out_dir, conf.num_shards)

    def run(batch: pa.Table) -> pa.Table:
        recs = []
        for row in batch.to_pylist():
            rec = merge_one_shard(row["shard_id"], row["segments"], shard_root)
            recs.append(json.dumps(rec))
        return pa.table({"lineage": pa.array(recs)})

    ds = ray.data.from_items(specs).map_batches(run, batch_size=1, batch_format="pyarrow")
    return [json.loads(r["lineage"]) for r in ds.take_all()]
