"""Size-aware Parquet reads.

Ray Data's default read parallelism is driven by CPU count, not input
size: a 2 MB file fans out into 64 blocks on a 32-cpu node, and every
downstream ``groupby``/``sort`` then shuffles blocks² tiny objects —
pure scheduling/IPC overhead (measured 19.8 s for a 5000-row groupby
that computes in <0.1 s). dcs sizes index shards by content, not host
shape (``cmd/dcs-index-backend`` shards are byte-budgeted); the same
rule applied at the read keeps block count proportional to bytes at
every scale: a 100 TB input still yields ~100k+ blocks, a test-scale
file yields a handful.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

# on-disk parquet bytes per block; parquet-to-Arrow decompression is
# roughly 2-6x for text, so 32 MB on disk ≈ 64-200 MB in memory — within
# Ray Data's default 128 MB target block size ballpark
TARGET_BLOCK_BYTES = 32 << 20


def _num_blocks(paths: list[str], target_block_bytes: int, min_blocks: int) -> int:
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return max(min_blocks, -(-total // target_block_bytes))


def read_parquet_sized(
    paths: str | list[str],
    columns: list[str] | None = None,
    target_block_bytes: int = TARGET_BLOCK_BYTES,
    min_blocks: int = 1,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with block count proportional to input
    bytes instead of host CPUs. ``columns`` prunes at the read (only the
    projected columns leave storage)."""
    plist = [paths] if isinstance(paths, str) else list(paths)
    n = _num_blocks(plist, target_block_bytes, min_blocks)
    return ray.data.read_parquet(
        paths, columns=columns, override_num_blocks=n, **kwargs
    )


def write_corpus_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> list[str]:
    """Resumable partitioned Parquet sink: hive layout (one directory
    per value of ``partition_col``, many files per partition — never one
    giant file), committed via per-partition ``_SUCCESS`` markers.

    ONE streaming pass: already-committed partitions are filtered out
    up front (their values broadcast via ``ray.put``, vectorized isin
    probe per batch), the remainder goes through Ray's native
    ``write_parquet(partition_cols=...)`` — no shuffle, each block
    splits its rows into per-partition files as it streams. Markers for
    the remaining partitions are written after the write completes, so
    a crash mid-write redoes exactly the uncommitted partitions on the
    next run (incomplete directories are cleared first). Returns the
    partition values written this run.
    """
    values = sorted(ds.select_columns([partition_col]).unique(partition_col))
    done = {
        v for v in values
        if resume
        and os.path.exists(os.path.join(out_dir, f"{partition_col}={v}", "_SUCCESS"))
    }
    remaining = [v for v in values if v not in done]
    if not remaining:
        return []
    for v in remaining:  # clear incomplete previous attempts
        part_dir = os.path.join(out_dir, f"{partition_col}={v}")
        if os.path.isdir(part_dir):
            for f in os.listdir(part_dir):
                os.unlink(os.path.join(part_dir, f))

    import ray

    if done:
        ref = ray.put(np.array(sorted(done)))

        def drop_done(b):
            ks = ray.get(ref)
            col = b[partition_col].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(~np.isin(col, ks)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=[partition_col])
    for v in remaining:
        marker = os.path.join(out_dir, f"{partition_col}={v}", "_SUCCESS")
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("")
    return remaining
