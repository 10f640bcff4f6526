"""Distributed index build: pages Dataset → partitioned segments →
corpus stats → merged shards, with per-partition lineage + resume.

Lifecycle mirrors the reference's feeder → importer → merge pipeline
(``SURVEY.md §3.1``; ``cmd/dcs-package-importer/importer.go:319-390``)
re-expressed as one Ray Data job:

    read pages → map_batches(assign part_id)            # shard routing J8
      → groupby(part_id).map_groups(build+write segment)  # per-package index
      → stats aggregation over term_dicts (df, N, avgdl)  # ranking data A7
      → shard merge (merge.py)                            # ConcatN M1
      → MANIFEST commit                                   # symlink swap M3

Resume: each segment directory is the checkpoint (like dcs's per-package
index dirs, ``importer.go:399-466``); a restarted build reads existing
``lineage.json`` files and only rebuilds missing partitions. The final
MANIFEST.json is written last, atomically.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from dcs_ray.index.config import IndexConfig
from dcs_ray.index.segment import build_segment_data, segment_name, write_segment


def assign_partition(batch: pa.Table, conf: IndexConfig) -> pa.Table:
    """Deterministic shard routing: hash(url) % P (dcs
    ``shardmapping/shardmapping.go:11-19`` uses md5(pkg)[:6] % shards).
    ``pandas.util.hash_array`` is a stable, vectorized 64-bit hash."""
    if conf.id_col is not None:
        # RANGE partitioning on explicit ids: keeps doc ids ascending across
        # partitions, so shard merge is pure concatenation (merge.py)
        ids = batch[conf.id_col].to_numpy().astype(np.int64)
        span = (conf.id_max + conf.num_partitions) // conf.num_partitions
        part = np.minimum(ids // span, conf.num_partitions - 1).astype(np.int32)
    else:
        urls = batch[conf.url_col].to_pandas().to_numpy(dtype=object)
        h = pd.util.hash_array(urls)
        part = (h % np.uint64(conf.num_partitions)).astype(np.int32)
    return batch.append_column("part_id", pa.array(part, pa.int32()))


def parquet_col_max(path: str, col: str) -> int:
    """Max value of a column from parquet row-group statistics — a
    metadata-only read (no data pass), for ``IndexConfig.id_max``."""
    md = pq.read_metadata(path)
    ci = md.schema.names.index(col)
    return max(
        md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups)
    )


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    seg_root = os.path.join(out_dir, "segments")
    if not os.path.isdir(seg_root):
        return done
    for name in os.listdir(seg_root):
        lin = os.path.join(seg_root, name, "lineage.json")
        if name.startswith("seg_") and not name.endswith(".tmp") and os.path.exists(lin):
            done.add(int(name[4:]))
    return done


def build_segments(pages: ray.data.Dataset, out_dir: str, conf: IndexConfig) -> list[dict]:
    """Phase 1: partition documents and build one segment per partition.

    The wide step is the ``groupby(part_id)`` hash shuffle; groups are
    *document* partitions sized by the partition count, so Zipf term skew
    cannot create a giant group here (terms are grouped only inside a
    partition, in memory, vectorized). Returns lineage records.
    """
    conf.validate()
    if conf.id_col is not None and conf.id_max is None:
        conf.id_max = int(pages.max(conf.id_col))
    seg_root = os.path.join(out_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    done = completed_partitions(out_dir)

    ds = pages.map_batches(
        lambda b: assign_partition(b, conf), batch_format="pyarrow", zero_copy_batch=True
    )
    if done:  # resume: drop rows of completed partitions at the source
        done_arr = np.array(sorted(done), dtype=np.int32)

        def drop_done(b: pa.Table) -> pa.Table:
            keep = ~np.isin(b["part_id"].to_numpy(), done_arr)
            return b.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def build_group(group: pa.Table) -> pa.Table:
        import time as _time

        if len(group) == 0:
            return pa.table({"lineage": pa.array([], pa.string())})
        t0 = _time.monotonic()
        part_id = int(group["part_id"][0].as_py())
        seg = build_segment_data(part_id, group.drop_columns(["part_id"]), conf)
        record = write_segment(
            seg_root, seg, extra={"build_wall_s": round(_time.monotonic() - t0, 4)}
        )
        return pa.table({"lineage": pa.array([json.dumps(record)])})

    lineage_ds = ds.groupby("part_id").map_groups(build_group, batch_format="pyarrow")
    new_records = [json.loads(r["lineage"]) for r in lineage_ds.take_all()]

    # roll up lineage (old + new) into the build manifest
    records = []
    for pid in sorted(done | {r["part_id"] for r in new_records}):
        lin = os.path.join(seg_root, segment_name(pid), "lineage.json")
        with open(lin) as f:
            records.append(json.load(f))
    return records


def compute_corpus_stats(out_dir: str, conf: IndexConfig) -> dict:
    """Global corpus statistics for BM25 — N, avgdl, per-term df
    (the ranking-data analogue of ``cmd/dcs-compute-ranking``, A7).

    Runs AFTER the shard merge: each shard's term dictionary already
    carries the per-term df summed over its segments (two levels of
    combining — segment then shard), so the global df is a sum over just
    ``num_shards`` vocab-sized tables. Small vocabularies aggregate
    driver-side with one Arrow ``group_by``; above a threshold it becomes
    a Ray groupby (the wide path for 10^9-term vocabularies).
    """
    from dcs_ray.index.merge import shard_name  # noqa: F401  (layout doc)

    shard_root = os.path.join(out_dir, "shards")
    shards = sorted(
        d for d in os.listdir(shard_root) if d.startswith("shard_") and not d.endswith(".tmp")
    )
    td_paths = [os.path.join(shard_root, s, "term_dict.parquet") for s in shards]
    total_rows = sum(pq.read_metadata(p).num_rows for p in td_paths)
    stats_dir = os.path.join(out_dir, "stats")
    tmp = stats_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    if not td_paths:
        # empty corpus: a well-formed index with zero terms
        term_type = pa.uint32() if conf.mode == "trigram" else pa.large_string()
        df_tbl = pa.table({"term": pa.array([], term_type), "df": pa.array([], pa.uint64())})
    elif total_rows <= 5_000_000:
        cat = pa.concat_tables(pq.read_table(p, columns=["term", "df"]) for p in td_paths)
        g = cat.group_by("term").aggregate([("df", "sum")])
        df_tbl = pa.table(
            {"term": g["term"], "df": g["df_sum"].cast(pa.uint64())}
        ).sort_by("term")
    else:
        td = ray.data.read_parquet(td_paths, columns=["term", "df"])
        df_ds = td.groupby("term").sum("df").sort("term")
        tables = [pa.table(b) for b in df_ds.iter_batches(batch_format="pyarrow")]
        df_tbl = pa.concat_tables(tables).rename_columns(["term", "df"])
    pq.write_table(df_tbl, os.path.join(tmp, "df.parquet"), row_group_size=65536)
    if pa.types.is_string(df_tbl["term"].type) or pa.types.is_large_string(
        df_tbl["term"].type
    ):
        # reversed-term dictionary (Lucene ReversedWildcardFilter role):
        # leading-wildcard expansion (*ing) becomes a row-group-pruned
        # RANGE read over reverse(term) instead of a vocab scan —
        # vocab-scale sort, one extra parquet
        import pyarrow.compute as _pc

        rev = pa.table(
            {"term_rev": _pc.utf8_reverse(df_tbl["term"]), "df": df_tbl["df"]}
        ).sort_by("term_rev")
        pq.write_table(
            rev, os.path.join(tmp, "df_rev.parquet"), row_group_size=65536
        )

    seg_root = os.path.join(out_dir, "segments")
    segs = sorted(
        d for d in os.listdir(seg_root) if d.startswith("seg_") and not d.endswith(".tmp")
    )
    n_docs, sum_dl = 0, 0
    for s in segs:
        with open(os.path.join(seg_root, s, "lineage.json")) as f:
            lin = json.load(f)
        n_docs += lin["n_docs"]
        sum_dl += lin["sum_doc_len"]
    stats = {
        "n_docs": n_docs,
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "n_terms": len(df_tbl),
        "k1": conf.k1,
        "b": conf.b,
        "mode": conf.mode,
    }
    with open(os.path.join(tmp, "global.json"), "w") as f:
        json.dump(stats, f)
    if os.path.exists(stats_dir):
        import shutil

        shutil.rmtree(stats_dir)
    os.rename(tmp, stats_dir)
    return stats


def commit_manifest(out_dir: str, conf: IndexConfig, lineage: list[dict], stats: dict,
                    shard_lineage: list[dict] | None = None,
                    metrics: dict | None = None) -> dict:
    """Final atomic manifest commit (dcs symlink swap,
    ``internal/sourcebackend/sourcebackend.go:198-251``). Everything —
    including per-stage metrics — goes through ONE temp+rename write so a
    crash can never leave a truncated manifest."""
    from dataclasses import asdict

    config = asdict(conf)
    config["meta_cols"] = list(config["meta_cols"])
    manifest = {
        "version": 1,
        "mode": conf.mode,
        "num_partitions": conf.num_partitions,
        "num_shards": conf.num_shards,
        "positional": conf.positional,
        "k1": conf.k1,
        "b": conf.b,
        "config": config,  # full build config — update_partition re-reads it
        "stats": stats,
        "partitions": lineage,
        "shards": shard_lineage or [],
        "metrics": metrics or {},
    }
    tmp = os.path.join(out_dir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, os.path.join(out_dir, "MANIFEST.json"))
    return manifest


def build_segments_from_files(
    files: list[str], out_dir: str, conf: IndexConfig, columns: list[str] | None = None
) -> list[dict]:
    """Phase 1 without any shuffle: partition **at the read**.

    When the input is Parquet and partitioning is by id range, each
    partition's rows are selected by predicate pushdown (row-group
    statistics prune whole files) inside its own build task — the
    all-to-all ``groupby(part_id)`` exchange disappears entirely. This is
    the dcs importer model (each shard's importer reads only its own
    packages, ``cmd/dcs-package-importer/importer.go:146-199``) and the
    scale path for crawl dumps laid out by id/shard. For inputs without a
    usable id layout, ``build_segments`` (hash shuffle on url) remains
    the general path.
    """
    conf.validate()
    assert conf.id_col is not None, "file-pruned build requires an id column"
    # one driver-side metadata pass = the "catalog": per-file id spans
    # give id_max AND the exact file subset each partition must open
    spans = []
    ci = None
    for f in files:
        md = pq.read_metadata(f)
        if ci is None:
            ci = md.schema.names.index(conf.id_col)
        st = [md.row_group(g).column(ci).statistics for g in range(md.num_row_groups)]
        spans.append((min(s.min for s in st), max(s.max for s in st)))
    if conf.id_max is None:
        conf.id_max = max(hi for _, hi in spans)
    seg_root = os.path.join(out_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    done = completed_partitions(out_dir)
    span = (conf.id_max + conf.num_partitions) // conf.num_partitions
    specs = [
        {
            "part_id": p,
            "lo": p * span,
            "hi": (p + 1) * span,
            "files": [
                f
                for f, (flo, fhi) in zip(files, spans)
                if flo < (p + 1) * span and fhi >= p * span
            ],
        }
        for p in range(conf.num_partitions)
        if p not in done
    ]
    if columns is None:
        columns = [conf.id_col, conf.text_col, *conf.meta_cols]
        if conf.dedup_latest:
            columns += [conf.url_col, conf.ts_col]

    def run(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        import time as _time

        recs = []
        for row in batch.to_pylist():
            if not row["files"]:
                continue
            t0 = _time.monotonic()
            dset = pads.dataset(row["files"])
            avail = [c for c in columns if c in dset.schema.names]
            filt = (pads.field(conf.id_col) >= row["lo"]) & (
                pads.field(conf.id_col) < row["hi"]
            )
            tbl = dset.to_table(filter=filt, columns=avail)
            if len(tbl) == 0:
                continue
            seg = build_segment_data(row["part_id"], tbl, conf)
            rec = write_segment(
                seg_root, seg, extra={"build_wall_s": round(_time.monotonic() - t0, 4)}
            )
            recs.append(json.dumps(rec))
        return pa.table({"lineage": pa.array(recs, pa.string())})

    remote_args = (
        {"retry_exceptions": True, "max_retries": conf.task_max_retries}
        if conf.task_max_retries
        else {}
    )
    lineage_ds = ray.data.from_items(specs).map_batches(
        run,
        batch_size=1,
        batch_format="pyarrow",
        num_cpus=conf.task_num_cpus,
        **remote_args,
    )
    new_records = [json.loads(r["lineage"]) for r in lineage_ds.take_all()]
    records = []
    for pid in sorted(done | {r["part_id"] for r in new_records}):
        with open(os.path.join(seg_root, segment_name(pid), "lineage.json")) as f:
            records.append(json.load(f))
    return records


def build_index(
    pages: ray.data.Dataset | list[str], out_dir: str, conf: IndexConfig | None = None
) -> dict:
    """Full build: segments → stats → shard merge → manifest. Resumable.

    ``pages`` is either a Dataset (general path: hash/range shuffle via
    ``groupby(part_id)``) or a list of Parquet files (scale path:
    read-side partition pruning, no shuffle — requires ``conf.id_col``).
    """
    from dcs_ray.index.merge import merge_shards

    import time

    conf = (conf or IndexConfig()).validate()
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.monotonic()
    if isinstance(pages, (list, tuple)):
        lineage = build_segments_from_files(list(pages), out_dir, conf)
    else:
        lineage = build_segments(pages, out_dir, conf)
    t1 = time.monotonic()
    shard_lineage = merge_shards(out_dir, conf)
    t2 = time.monotonic()
    stats = compute_corpus_stats(out_dir, conf)
    t3 = time.monotonic()
    # per-stage wall metrics (north rule: per-stage metrics exported);
    # per-partition docs/sec + postings/sec live in each lineage record
    n_docs = stats["n_docs"] or 1
    metrics = {
        "segments_s": round(t1 - t0, 3),
        "merge_s": round(t2 - t1, 3),
        "stats_s": round(t3 - t2, 3),
        "docs_per_s": round(n_docs / max(t1 - t0, 1e-9), 1),
    }
    return commit_manifest(out_dir, conf, lineage, stats, shard_lineage, metrics)


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        return json.load(f)


def conf_from_manifest(manifest: dict) -> IndexConfig:
    cfg = dict(manifest.get("config") or {})
    cfg["meta_cols"] = tuple(cfg.get("meta_cols") or ())
    return IndexConfig(**cfg)


def update_partition(out_dir: str, part_id: int, docs: pa.Table) -> dict:
    """Incrementally replace ONE partition's documents and refresh only
    what depends on it — the dcs package re-import + shard re-merge flow
    (``cmd/dcs-package-importer/importer.go:319-390``) for a daily crawl:

    1. rebuild segment ``part_id`` from ``docs`` (rename swap),
    2. re-merge ONLY the shard containing that segment (other shards'
       bytes are untouched),
    3. recompute corpus stats (vocab-scale work, not corpus-scale),
    4. re-commit the manifest atomically.

    ``docs`` must be the partition's full new content; with id-range
    partitioning its ids must stay inside the partition's span (doc-id
    order across partitions is what keeps shard merge pure
    concatenation). Open ``Segment`` handles elsewhere re-open lazily via
    the build-generation check in ``dcs_ray.search._open``.
    """
    import shutil

    from dcs_ray.index.merge import merge_one_shard, shard_name

    man = load_manifest(out_dir)
    conf = conf_from_manifest(man)
    by_part = {r["part_id"]: r for r in man["partitions"]}
    if part_id not in by_part:
        raise ValueError(f"partition {part_id} not in index (have {sorted(by_part)})")
    if conf.id_col is not None:
        assert conf.id_max is not None
        span = (conf.id_max + conf.num_partitions) // conf.num_partitions
        ids = docs[conf.id_col].to_numpy()
        if len(ids) and (ids.min() < part_id * span or ids.max() >= (part_id + 1) * span):
            raise ValueError(
                f"doc ids outside partition {part_id}'s span "
                f"[{part_id * span}, {(part_id + 1) * span})"
            )
    seg_root = os.path.join(out_dir, "segments")
    import time as _t

    t0 = _t.monotonic()
    seg = build_segment_data(part_id, docs, conf)
    rec = write_segment(
        seg_root, seg, extra={"build_wall_s": round(_t.monotonic() - t0, 4)}, replace=True
    )

    target = next(
        s for s in man["shards"] if segment_name(part_id) in s["segments"]
    )
    shard_id = target["shard_id"]
    shard_root = os.path.join(out_dir, "shards")
    shutil.rmtree(os.path.join(shard_root, shard_name(shard_id)), ignore_errors=True)
    new_shard = merge_one_shard(
        shard_id, [os.path.join(seg_root, s) for s in target["segments"]], shard_root
    )
    stats = compute_corpus_stats(out_dir, conf)
    lineage = [rec if r["part_id"] == part_id else r for r in man["partitions"]]
    shard_lineage = [new_shard if s["shard_id"] == shard_id else s for s in man["shards"]]
    metrics = dict(man.get("metrics") or {})
    metrics["last_update"] = {
        "part_id": part_id,
        "shard_id": shard_id,
        "n_docs": rec["n_docs"],
        "wall_s": round(_t.monotonic() - t0, 3),
    }
    return commit_manifest(out_dir, conf, lineage, stats, shard_lineage, metrics)


def reshard(out_dir: str, new_num_shards: int) -> dict:
    """Change the shard count of an EXISTING index without rebuilding —
    the ``dcs-reshard`` flow (``cmd/dcs-reshard/reshard.go:35-92``) as a
    re-merge: segments are the source of truth, shard bytes are derived.

    1. plan a new posting-balanced partition→shard assignment,
    2. merge every new shard into a TEMP shard root (one Ray task per
       shard, parallel),
    3. swap ``shards/`` via renames and re-commit the manifest — a crash
       before the swap leaves the old index fully intact.

    Corpus stats and per-partition lineage are unchanged (same docs),
    so only merge work is redone — at 100 TB that is a shard-count-
    bounded concat pass, not a corpus-scale rebuild.
    """
    import shutil
    import time as _t
    from dataclasses import replace as _dc_replace

    from dcs_ray.index.merge import merge_shards

    man = load_manifest(out_dir)
    conf = _dc_replace(conf_from_manifest(man), num_shards=new_num_shards).validate()
    t0 = _t.monotonic()
    tmp = os.path.join(out_dir, "shards.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    shard_lineage = merge_shards(out_dir, conf, shard_root=tmp)
    cur = os.path.join(out_dir, "shards")
    bak = os.path.join(out_dir, "shards.old")
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(cur, bak)
    os.rename(tmp, cur)
    shutil.rmtree(bak)
    metrics = dict(man.get("metrics") or {})
    metrics["last_reshard"] = {
        "from_shards": man["num_shards"],
        "to_shards": new_num_shards,
        "wall_s": round(_t.monotonic() - t0, 3),
    }
    return commit_manifest(
        out_dir, conf, man["partitions"], man["stats"], shard_lineage, metrics
    )


def cleanup_stale(out_dir: str) -> list[str]:
    """Remove crash leftovers: any ``*.tmp`` file or directory under the
    index root (the reference runs this as a cron,
    ``cleanup-failed-shards.cron:1-2``). Committed artifacts are never
    ``*.tmp`` — every writer here stages to ``<name>.tmp`` and renames —
    so deletion is always safe. Returns the removed paths."""
    import shutil

    removed: list[str] = []
    for root, dirs, files in os.walk(out_dir, topdown=True):
        for name in list(dirs):
            if name.endswith(".tmp"):
                p = os.path.join(root, name)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
                dirs.remove(name)
        for name in files:
            if name.endswith(".tmp"):
                p = os.path.join(root, name)
                try:
                    os.remove(p)
                    removed.append(p)
                except OSError:
                    pass
    return removed
