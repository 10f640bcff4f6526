"""Static index pruning (Carmel et al., SIGIR '01): keep only the
top-``m`` postings per term (by tf desc, doc_id asc) in a fast serving
tier, while scoring stats (df, doc_len, avgdl, N) stay those of the
FULL corpus. At web scale the head terms' posting lists are the read
bottleneck; a pruned tier caps every list at ``m`` entries so worst-case
query cost is O(m·|query|) per shard instead of O(df). dcs's analogue
is the posting-list cap applied during pre-ranking
(``ranking/pre-ranking.go``) — here it is materialized into an
immutable index generation instead of applied per query.

Three phases, all shard-parallel, no driver state beyond shard ranges:

1. **Local candidates** — one task per shard streams its term
   dictionary, decodes each posting list once, keeps the shard-local
   top-m: any posting in the GLOBAL top-m for a term is necessarily in
   its shard's local top-m, so this is a lossless candidate cut. The
   exchange carries ≤ m·shards rows per term, never full lists.
2. **Global selection** — bucketed groupby on a term-hash bucket; one
   vectorized lexsort + run-length rank per bucket picks the global
   top-m (tf desc, doc_id asc — deterministic, SQL-replayable), then
   routes every kept row to its owning shard (searchsorted over the
   broadcast shard doc-range boundaries) and writes a per-shard keep
   list (partitioned parquet, so phase 3 reads only its slice).
3. **Shard rewrite** — one task per shard re-encodes its kept rows
   with the normal posting codec and writes a self-contained pruned
   shard (term_dict/doc_meta/postings.bin); doc_meta is copied whole
   (doc_len feeds scoring; filter/prior columns keep working). The
   ``stats/`` directory is copied verbatim — idf/avgdl stay global,
   the defining property of static pruning.

The pruned directory is a normal index: ``search_bm25`` (incl.
MaxScore block-max skipping, filters, priors) works unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from dcs_ray.codec import decode_postings, pack_postings


def _shard_dirs(index_dir: str) -> list[str]:
    root = os.path.join(index_dir, "shards")
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("shard_") and not d.endswith(".tmp")
    ]


def _local_topm_candidates(shard_path: str, m: int) -> pa.Table:
    """One shard's per-term local top-m postings as (term, doc_id, tf)."""
    from dcs_ray.index.segment import Segment

    seg = Segment(shard_path)
    if seg.positions is not None:
        raise ValueError("prune_index supports non-positional words indexes")
    terms_out, ids_out, tfs_out = [], [], []
    terms_np = seg.terms.to_numpy(zero_copy_only=False)
    for i in range(len(terms_np)):
        ids, tfs = decode_postings(seg.term_blob(i))
        if len(ids) > m:
            # top-m by (tf desc, doc_id asc)
            order = np.lexsort((ids, -tfs.astype(np.int64)))[:m]
            ids, tfs = ids[order], tfs[order]
        terms_out.append(np.full(len(ids), i, np.int64))
        ids_out.append(ids.astype(np.int64))
        tfs_out.append(tfs.astype(np.int64))
    ti = np.concatenate(terms_out) if terms_out else np.empty(0, np.int64)
    return pa.table(
        {
            "term": pa.array(terms_np, pa.string()).take(pa.array(ti)),
            "doc_id": pa.array(
                np.concatenate(ids_out) if ids_out else np.empty(0, np.int64),
                pa.int64(),
            ),
            "tf": pa.array(
                np.concatenate(tfs_out) if tfs_out else np.empty(0, np.int64),
                pa.int64(),
            ),
        }
    )


def _write_pruned_shard(
    out_dir: str, shard_name: str, src_shard: str, keep: pa.Table, codec: str
) -> dict:
    """Re-encode one shard's kept rows into a self-contained shard dir."""
    t0 = time.monotonic()
    final = os.path.join(out_dir, "shards", shard_name)
    tmp = final + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    terms = keep["term"].to_numpy(zero_copy_only=False)
    ids = keep["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = keep["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((ids, terms))
    terms, ids, tfs = terms[order], ids[order], tfs[order]
    uniq, starts = np.unique(terms, return_index=True)
    group_offsets = np.r_[starts, len(terms)].astype(np.int64)
    blob, offs, lens = pack_postings(group_offsets, ids, tfs, codec=codec)
    df = np.diff(group_offsets)
    max_tf = (
        np.maximum.reduceat(tfs, group_offsets[:-1]).astype(np.uint32)
        if len(tfs)
        else np.empty(0, np.uint32)
    )
    pq.write_table(
        pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "df": pa.array(df.astype(np.uint32), pa.uint32()),
                "offset": pa.array(offs, pa.int64()),
                "nbytes": pa.array(lens, pa.int64()),
                "max_tf": pa.array(max_tf, pa.uint32()),
            }
        ),
        os.path.join(tmp, "term_dict.parquet"),
    )
    # doc_meta copied whole: every doc stays addressable (doc_len feeds
    # scoring; filter/prior columns keep working on the pruned tier)
    from dcs_ray.index.segment import Segment

    seg = Segment(src_shard)
    pq.write_table(seg.doc_meta, os.path.join(tmp, "doc_meta.parquet"))
    with open(os.path.join(tmp, "postings.bin"), "wb") as f:
        f.write(blob)
    lineage = {
        "segment": shard_name,
        "pruned_from": src_shard,
        "n_docs": int(len(seg.doc_ids)),
        "n_terms": int(len(uniq)),
        "n_postings": int(df.sum()) if len(df) else 0,
        "blob_bytes": len(blob),
        "checksum": zlib.crc32(blob),
        "wall_s": round(time.monotonic() - t0, 4),
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f)
    if os.path.exists(final):
        shutil.rmtree(tmp)  # concurrent/retried task lost the race
    else:
        os.rename(tmp, final)
    return lineage


def prune_index(
    index_dir: str, out_dir: str, m: int, codec: str = "varint"
) -> dict:
    """Build the pruned serving tier of ``index_dir`` at ``out_dir``.

    Keeps the global top-``m`` postings per term (tf desc, doc_id asc);
    copies ``stats/`` verbatim (full-corpus idf/avgdl per Carmel-style
    pruning) and MANIFEST.json with a ``pruned_m`` marker. Returns a
    summary dict with per-shard lineage."""
    shards = _shard_dirs(index_dir)
    if not shards:
        raise ValueError(f"no shards under {index_dir}")
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)

    # shard doc-range boundaries for routing (shards hold contiguous
    # ascending doc-id ranges: range partitioning + contiguous merge)
    from dcs_ray.index.segment import Segment

    mins = []
    for s in shards:
        seg = Segment(s)
        mins.append(int(seg.doc_ids[0]) if len(seg.doc_ids) else 0)
    bounds = np.asarray(mins[1:], np.int64)

    # phase 1: shard-local candidates (one task per shard)
    cand = ray.data.from_items(
        [{"shard": s} for s in shards]
    ).map_batches(
        lambda b: pa.concat_tables(
            _local_topm_candidates(s, m) for s in b["shard"].to_pylist()
        ),
        batch_format="pyarrow",
        num_cpus=1,
    )

    # phase 2: bucketed global top-m + shard routing
    n_buckets = max(len(shards) * 4, 16)

    def with_bucket(b: pa.Table) -> pa.Table:
        from dcs_ray.functions.textstats import fnv1a_bytes_rows

        # vectorized FNV-1a over the term bytes; mask to non-negative
        h = fnv1a_bytes_rows(b["term"]).view(np.int64) & np.int64((1 << 63) - 1)
        return b.append_column(
            "_bucket", pa.array(h % np.int64(n_buckets), pa.int64())
        )

    bounds_ref = ray.put(bounds)

    def global_topm(g: pa.Table) -> pa.Table:
        terms = g["term"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        tfs = g["tf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -tfs, terms))
        ts = terms[order]
        starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
        run_len = np.diff(np.r_[starts, len(ts)])
        rank = np.arange(len(ts)) - np.repeat(starts, run_len)
        sel = order[rank < m]
        bd = ray.get(bounds_ref)
        shard_id = np.searchsorted(bd, ids[sel], side="right")
        return pa.table(
            {
                "term": pa.array(terms[sel]),
                "doc_id": pa.array(ids[sel], pa.int64()),
                "tf": pa.array(tfs[sel], pa.int64()),
                "shard_id": pa.array(shard_id.astype(np.int64), pa.int64()),
            }
        )

    keep_dir = os.path.join(out_dir, "_prune_keep")
    shutil.rmtree(keep_dir, ignore_errors=True)
    (
        cand.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(global_topm, batch_format="pyarrow")
        .write_parquet(keep_dir, partition_cols=["shard_id"])
    )

    # phase 3: per-shard rewrite (one task per shard, reads only its
    # keep-list partition)
    @ray.remote(num_cpus=1)
    def rewrite(shard_id: int, src: str) -> dict:
        part = os.path.join(keep_dir, f"shard_id={shard_id}")
        if os.path.isdir(part):
            keep = pq.read_table(part, columns=["term", "doc_id", "tf"])
        else:  # shard holds no kept postings at all
            keep = pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        return _write_pruned_shard(
            out_dir, os.path.basename(src), src, keep, codec
        )

    lineages = ray.get(
        [rewrite.remote(i, s) for i, s in enumerate(shards)]
    )
    shutil.rmtree(keep_dir, ignore_errors=True)

    # stats verbatim (global idf/avgdl — the static-pruning contract)
    stats_dst = os.path.join(out_dir, "stats")
    if not os.path.isdir(stats_dst):
        shutil.copytree(os.path.join(index_dir, "stats"), stats_dst)
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    man["pruned_m"] = m
    man["pruned_from"] = os.path.abspath(index_dir)
    tmp = os.path.join(out_dir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.rename(tmp, os.path.join(out_dir, "MANIFEST.json"))
    return {
        "m": m,
        "n_shards": len(shards),
        "n_postings": sum(ln["n_postings"] for ln in lineages),
        "shards": lineages,
    }
