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
    """Resumable partitioned Parquet sink: one directory per value of
    ``partition_col`` (hive layout, many files per partition — never
    one giant file), each committed ATOMICALLY via a ``_SUCCESS``
    marker written after its rows. With ``resume=True`` a re-run skips
    partitions whose marker exists and writes only the missing ones —
    a killed 100 TB export re-does only unfinished partitions.

    Partition values are discovered with one tiny projected aggregate
    (|distinct| rows); each partition is then written by its own
    filtered streaming job. Returns the list of partition values
    written this run (skipped ones excluded).
    """
    values = sorted(ds.select_columns([partition_col]).unique(partition_col))
    written = []
    for v in values:
        part_dir = os.path.join(out_dir, f"{partition_col}={v}")
        marker = os.path.join(part_dir, "_SUCCESS")
        if resume and os.path.exists(marker):
            continue
        if os.path.isdir(part_dir):  # incomplete previous attempt
            for f in os.listdir(part_dir):
                os.unlink(os.path.join(part_dir, f))
        ds.filter(expr=f"{partition_col} == {v!r}").write_parquet(part_dir)
        with open(marker, "w") as f:
            f.write("")
        written.append(v)
    return written
