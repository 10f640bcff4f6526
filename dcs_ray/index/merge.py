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

from dcs_ray.codec import _ranges, _varint_lengths, varint_encode
from dcs_ray.index.config import IndexConfig
from dcs_ray.index.segment import segment_name

_POS_COLS = (
    "offset", "nbytes", "ndocs", "npos",
    "first_doc", "last_doc", "d0_nbytes", "doc_nbytes",
)


def shard_name(shard_id: int) -> str:
    return f"shard_{shard_id:04d}"


def _excl_group_cumsum(x: np.ndarray, first_run: np.ndarray, group_sizes: np.ndarray) -> np.ndarray:
    """Per-element exclusive cumsum of ``x`` restarting at each group start."""
    cs = np.cumsum(x)
    excl = cs - x
    return excl - np.repeat(excl[first_run], group_sizes)


def _merge_positions(
    tmp: str,
    seg_paths: list[str],
    s_seg: np.ndarray,
    first_run: np.ndarray,
    group_offsets: np.ndarray,
    uniq_terms: pa.Array,
    run: dict[str, np.ndarray],
) -> int:
    """Stitch per-segment positional sections into one shard-level section
    (dcs ``internal/index/merge.go:343-405``: raw-copy pos streams, splice
    the leading doc-id varint of each appended run, bit-stitch the posrel
    bitmaps at non-byte boundaries). Runs arrive sorted (term, segment) —
    segment order == doc-id order — so for each term the merged blob is:

        varint(Σndocs) varint(Σnpos)
        run0's docid-delta stream ++ for each later run:
            varint(first_doc − prev run's last_doc) ++ its stream minus
            its leading absolute-docid varint
        posrel bitmaps bit-concatenated (byte-aligned per TERM only)
        position-delta streams byte-concatenated (doc-scoped deltas)

    Everything is vectorized ``_ranges`` scatters; nothing is decoded.
    Returns the merged blob size in bytes.
    """
    n_runs = len(s_seg)
    n_terms = len(first_run)
    gs = np.diff(group_offsets)  # runs per term
    ndocs = run["ndocs"].astype(np.int64)
    npos = run["npos"].astype(np.int64)
    off, nbytes = run["offset"], run["nbytes"]
    first_doc = run["first_doc"].astype(np.uint64)
    last_doc = run["last_doc"].astype(np.uint64)
    d0 = run["d0_nbytes"].astype(np.int64)
    docb = run["doc_nbytes"].astype(np.int64)

    # per-run section offsets inside the source blob
    hdr_run = _varint_lengths(ndocs.astype(np.uint64)) + _varint_lengths(npos.astype(np.uint64))
    doc_start = off + hdr_run
    rel_start = doc_start + docb
    rel_len = (npos + 7) // 8
    p_start = rel_start + rel_len
    p_len = nbytes - hdr_run - docb - rel_len

    is_first = np.zeros(n_runs, dtype=bool)
    is_first[first_run] = True
    nonfirst = ~is_first

    m_ndocs = np.add.reduceat(ndocs, first_run)
    m_npos = np.add.reduceat(npos, first_run)
    inter = np.empty(2 * n_terms, dtype=np.uint64)
    inter[0::2] = m_ndocs
    inter[1::2] = m_npos
    hdr_enc, hdr_lens = varint_encode(inter)
    hdr_term = hdr_lens[0::2] + hdr_lens[1::2]

    # re-encode each appended run's leading absolute doc id as a delta
    prev_last = np.zeros(n_runs, dtype=np.uint64)
    prev_last[1:] = last_doc[:-1]
    assert bool(np.all(first_doc[nonfirst] > prev_last[nonfirst])), (
        "doc ids must ascend across segments for stitch merge"
    )
    repl_enc, repl_lens_nf = varint_encode(first_doc[nonfirst] - prev_last[nonfirst])
    repl_lens = np.zeros(n_runs, dtype=np.int64)
    repl_lens[nonfirst] = repl_lens_nf

    contrib = docb.copy()
    contrib[nonfirst] += repl_lens[nonfirst] - d0[nonfirst]
    docsec_term = np.add.reduceat(contrib, first_run)
    relsec_term = (m_npos + 7) // 8
    possec_term = np.add.reduceat(p_len, first_run)
    term_total = hdr_term + docsec_term + relsec_term + possec_term
    term_off = np.concatenate(([0], np.cumsum(term_total)[:-1]))
    total_bytes = int(term_total.sum())

    out = np.zeros(total_bytes, dtype=np.uint8)
    out[_ranges(term_off, hdr_term)] = hdr_enc

    srcs = []
    for p in seg_paths:
        f = os.path.join(p, "positions.bin")
        srcs.append(
            np.memmap(f, dtype=np.uint8, mode="r") if os.path.getsize(f) else np.empty(0, np.uint8)
        )

    # docid-delta streams
    doc_base = term_off + hdr_term
    run_doc_dst = np.repeat(doc_base, gs) + _excl_group_cumsum(contrib, first_run, gs)
    if nonfirst.any():
        out[_ranges(run_doc_dst[nonfirst], repl_lens_nf)] = repl_enc
    copy_src = doc_start + np.where(is_first, 0, d0)
    copy_len = docb - np.where(is_first, 0, d0)
    copy_dst = run_doc_dst + repl_lens
    for i, src in enumerate(srcs):
        m = s_seg == i
        if m.any():
            out[_ranges(copy_dst[m], copy_len[m])] = src[_ranges(copy_src[m], copy_len[m])]

    # posrel bitmaps: gather (byte-aligned per run) → unpack → drop per-run
    # padding → re-pad at term boundaries → pack
    g_off = np.concatenate(([0], np.cumsum(rel_len)[:-1]))
    gathered = np.zeros(int(rel_len.sum()), dtype=np.uint8)
    for i, src in enumerate(srcs):
        m = s_seg == i
        if m.any():
            gathered[_ranges(g_off[m], rel_len[m])] = src[_ranges(rel_start[m], rel_len[m])]
    bits = np.unpackbits(gathered, bitorder="little")
    all_bits = bits[_ranges(8 * g_off, npos)]
    rel_excl = np.concatenate(([0], np.cumsum(relsec_term)[:-1]))
    padded = np.zeros(int(relsec_term.sum()) * 8, dtype=np.uint8)
    padded[_ranges(8 * rel_excl, m_npos)] = all_bits
    rel_base = doc_base + docsec_term
    out[_ranges(rel_base, relsec_term)] = np.packbits(padded, bitorder="little")

    # position-delta streams: straight byte copies
    pos_base = rel_base + relsec_term
    run_pos_dst = np.repeat(pos_base, gs) + _excl_group_cumsum(p_len, first_run, gs)
    for i, src in enumerate(srcs):
        m = s_seg == i
        if m.any():
            out[_ranges(run_pos_dst[m], p_len[m])] = src[_ranges(p_start[m], p_len[m])]

    with open(os.path.join(tmp, "positions.bin"), "wb") as f:
        f.write(out.tobytes())
    pq.write_table(
        pa.table(
            {
                "term": uniq_terms,
                "offset": pa.array(term_off.astype(np.int64), pa.int64()),
                "nbytes": pa.array(term_total.astype(np.int64), pa.int64()),
                "ndocs": pa.array(m_ndocs.astype(np.uint32), pa.uint32()),
                "npos": pa.array(m_npos.astype(np.int64), pa.int64()),
                "first_doc": pa.array(first_doc[first_run], pa.uint64()),
                "last_doc": pa.array(last_doc[group_offsets[1:] - 1], pa.uint64()),
                "d0_nbytes": pa.array(
                    _varint_lengths(first_doc[first_run]).astype(np.int32), pa.int32()
                ),
                "doc_nbytes": pa.array(docsec_term.astype(np.int64), pa.int64()),
            }
        ),
        os.path.join(tmp, "pos_dict.parquet"),
    )
    return total_bytes


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
    positional = all(os.path.exists(os.path.join(p, "positions.bin")) for p in seg_paths)
    pos_cols: dict[str, list] | None = {c: [] for c in _POS_COLS} if positional else None
    term_arrays, dfs, offs, lens, mtfs, seg_of = [], [], [], [], [], []
    for i, p in enumerate(seg_paths):
        td = pq.read_table(os.path.join(p, "term_dict.parquet"))
        term_arrays.append(td["term"].combine_chunks())
        dfs.append(td["df"].combine_chunks().to_numpy())
        offs.append(td["offset"].combine_chunks().to_numpy())
        lens.append(td["nbytes"].combine_chunks().to_numpy())
        mtfs.append(td["max_tf"].combine_chunks().to_numpy())
        seg_of.append(np.full(len(td), i, dtype=np.int32))
        if positional:
            pdt = pq.read_table(os.path.join(p, "pos_dict.parquet"))
            if "doc_nbytes" not in pdt.column_names:
                raise ValueError(
                    f"{p}: pos_dict lacks stitch metadata (pre-merge format); rebuild the index"
                )
            assert len(pdt) == len(td), f"{p}: pos_dict/term_dict row mismatch"
            for c in _POS_COLS:
                pos_cols[c].append(pdt[c].combine_chunks().to_numpy())

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

    pos_bytes = None
    if positional:
        if n_runs:
            pos_runs = {c: np.concatenate(v)[sort_idx] for c, v in pos_cols.items()}
            pos_bytes = _merge_positions(
                tmp, seg_paths, s_seg, first_run, group_offsets, uniq_terms, pos_runs
            )
        else:
            open(os.path.join(tmp, "positions.bin"), "wb").close()
            empty64 = pa.array([], pa.int64())
            pq.write_table(
                pa.table(
                    {
                        "term": uniq_terms,
                        "offset": empty64,
                        "nbytes": empty64,
                        "ndocs": pa.array([], pa.uint32()),
                        "npos": empty64,
                        "first_doc": pa.array([], pa.uint64()),
                        "last_doc": pa.array([], pa.uint64()),
                        "d0_nbytes": pa.array([], pa.int32()),
                        "doc_nbytes": empty64,
                    }
                ),
                os.path.join(tmp, "pos_dict.parquet"),
            )
            pos_bytes = 0

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
    src_checksums = []  # provenance for staleness detection (fsck.py)
    zone_union: dict[str, set] = {}
    zone_cols: set | None = None  # cols EVERY source has zones for
    for p in seg_paths:
        with open(os.path.join(p, "lineage.json")) as f:
            lin = json.load(f)
        n_docs += lin["n_docs"]
        src_checksums.append(lin["checksum"])
        mv = lin.get("meta_values") or {}
        zone_cols = set(mv) if zone_cols is None else (zone_cols & set(mv))
        for c, vals in mv.items():
            zone_union.setdefault(c, set()).update(vals)
    # shard zone map = union of segment zones; a column any segment
    # couldn't bound (high cardinality) is unprunable and dropped, as is
    # one whose union outgrows the lineage-size budget
    meta_values = {
        c: sorted(zone_union[c])
        for c in sorted(zone_cols or ())
        if len(zone_union[c]) <= 256
    }
    with open(os.path.join(tmp, "doc_meta_refs.json"), "w") as f:
        json.dump(
            {"segments": [os.path.relpath(p, shard_root) for p in seg_paths]}, f
        )

    lineage = {
        "shard_id": shard_id,
        "shard": shard_name(shard_id),
        "segments": [os.path.basename(p) for p in seg_paths],
        "source_checksums": src_checksums,
        **({"meta_values": meta_values} if meta_values else {}),
        "n_docs": n_docs,
        "n_terms": int(len(uniq_terms)),
        "n_postings": int(term_df.sum()) if len(uniq_terms) else 0,
        "blob_bytes": total_bytes,
        "pos_bytes": pos_bytes,
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


def merge_shards(
    out_dir: str, conf: IndexConfig, shard_root: str | None = None
) -> list[dict]:
    """Merge all segments into ``conf.num_shards`` shard indexes, one Ray
    task per shard (merge concurrency; dcs serializes merges via a
    single-flight semaphore ``importer.go:595-600`` — we parallelize
    across shards since they're independent). ``shard_root`` overrides
    the output directory (reshard merges into a temp root, then swaps)."""
    shard_root = shard_root or os.path.join(out_dir, "shards")
    os.makedirs(shard_root, exist_ok=True)
    specs = plan_shards(out_dir, conf.num_shards)
    if not specs:  # empty corpus → no segments → no shards
        return []

    def run(batch: pa.Table) -> pa.Table:
        recs = []
        for row in batch.to_pylist():
            rec = merge_one_shard(row["shard_id"], row["segments"], shard_root)
            recs.append(json.dumps(rec))
        return pa.table({"lineage": pa.array(recs)})

    remote_args = (
        {"retry_exceptions": True, "max_retries": conf.task_max_retries}
        if getattr(conf, "task_max_retries", 0)
        else {}
    )
    ds = ray.data.from_items(specs).map_batches(
        run, batch_size=1, batch_format="pyarrow", **remote_args
    )
    return [json.loads(r["lineage"]) for r in ds.take_all()]
