"""Consistent hashing with virtual nodes — the shard-placement ring.

Karger et al., STOC '97 (and the memcached/Dynamo deployment shape):
every physical node owns V pseudo-random ring positions
``splitmix64(node·1024 + v)``; a key hashes to ``splitmix64(key)`` and
is owned by the node of the first ring position clockwise (the
smallest position ≥ h, wrapping to the ring's minimum). Removing a
node moves ONLY the keys it owned — the property that makes the ring
the standard cluster-membership answer for a fixed-size multi-node
deployment like this engine's target (shard hosting, result-cache
placement, actor routing).

Assignment is one ``searchsorted`` against the broadcast sorted ring
(|nodes|·V entries — tiny); the per-node count fold is a vectorized
bincount partial per block."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.sampling import splitmix64


def ring_positions(nodes: list[int], vnodes: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """(sorted ring positions, owning node per position); ties (2^-64
    events) break to the smaller node id for determinism."""
    # positions derive from node*1024 + vnode (the SQL oracle replays
    # this exact expression); beyond 1024 vnodes the packed pairs would
    # collide across nodes, so cap rather than silently alias
    if not 1 <= vnodes <= 1024:
        raise ValueError(f"vnodes must be in [1, 1024], got {vnodes}")
    ns = np.repeat(np.asarray(sorted(nodes), np.int64), vnodes)
    vs = np.tile(np.arange(vnodes, dtype=np.int64), len(nodes))
    pos = splitmix64((ns * 1024 + vs).astype(np.uint64))
    order = np.lexsort((ns, pos))
    return pos[order], ns[order]


def assign_keys(
    keys: ray.data.Dataset,
    nodes: list[int],
    vnodes: int = 64,
    key_col: str = "doc_id",
) -> pa.Table:
    """Per-node key counts under the ring → (node, n_keys) sorted by
    node. The ring ships once via ``ray.put``; each block does one
    searchsorted + bincount."""
    pos, owner = ring_positions(nodes, vnodes)
    ref = ray.put((pos, owner))
    node_ids = np.asarray(sorted(nodes), np.int64)

    def partial(b: pa.Table) -> pa.Table:
        p, o = ray.get(ref)
        h = splitmix64(b[key_col].to_numpy().astype(np.uint64))
        idx = np.searchsorted(p, h)  # first position >= h
        idx = np.where(idx == len(p), 0, idx)  # wrap to ring minimum
        owners = o[idx]
        slot = np.searchsorted(node_ids, owners)
        return pa.table(
            {
                "c": pa.array(
                    [np.bincount(slot, minlength=len(node_ids)).astype(
                        np.int64
                    ).tolist()],
                    pa.list_(pa.int64()),
                )
            }
        )

    counts = np.zeros(len(node_ids), np.int64)
    for b in keys.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in b["c"].to_pylist():
            counts += np.asarray(row, np.int64)
    return pa.table(
        {
            "node": pa.array(node_ids, pa.int64()),
            "n_keys": pa.array(counts, pa.int64()),
        }
    )


def removal_stability(
    keys: ray.data.Dataset,
    nodes: list[int],
    removed: int,
    vnodes: int = 64,
    key_col: str = "doc_id",
) -> dict:
    """Consistency check of the ring's defining property: removing one
    node must relocate exactly the keys it owned, nobody else's.
    Returns integer counters (n_keys, moved, owned_by_removed)."""
    pos_a, own_a = ring_positions(nodes, vnodes)
    rest = [n for n in nodes if n != removed]
    pos_b, own_b = ring_positions(rest, vnodes)
    ref = ray.put((pos_a, own_a, pos_b, own_b))

    def partial(b: pa.Table) -> pa.Table:
        pa_, oa, pb, ob = ray.get(ref)
        h = splitmix64(b[key_col].to_numpy().astype(np.uint64))
        ia = np.searchsorted(pa_, h)
        ia = np.where(ia == len(pa_), 0, ia)
        ib = np.searchsorted(pb, h)
        ib = np.where(ib == len(pb), 0, ib)
        a, bo = oa[ia], ob[ib]
        moved = a != bo
        return pa.table(
            {
                "n": pa.array([len(h)], pa.int64()),
                "moved": pa.array([int(moved.sum())], pa.int64()),
                "owned": pa.array([int((a == removed).sum())], pa.int64()),
                "bad": pa.array(
                    [int((moved & (a != removed)).sum())], pa.int64()
                ),
            }
        )

    tot = {"n_keys": 0, "moved": 0, "owned_by_removed": 0, "moved_not_owned": 0}
    for b in keys.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        tot["n_keys"] += int(t["n"].to_numpy().sum())
        tot["moved"] += int(t["moved"].to_numpy().sum())
        tot["owned_by_removed"] += int(t["owned"].to_numpy().sum())
        tot["moved_not_owned"] += int(t["bad"].to_numpy().sum())
    return tot
