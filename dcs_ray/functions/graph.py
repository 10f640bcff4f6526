"""Distributed connected components over an edge Dataset — the cluster
step of fuzzy dedup (MinHash/SimHash/embedding near-dup pairs → dup
*clusters* → one canonical doc per cluster).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond" — the standard shuffle-
native CC used by web-scale dedup pipelines). Each round is ONE
``groupby`` on a salted node bucket with all per-node work vectorized
inside the group (lexsort + segmented min), so a round costs one
all-to-all over the *edge set* — which for dedup is the pair output,
orders of magnitude smaller than the corpus. Convergence is detected
with an order-insensitive 64-bit checksum of the edge set (count +
summed mixed hash), so the driver loop runs O(log n) rounds and stops
as soon as the star forest is stable.

At convergence every edge is (member → component-min) and the label
table falls out directly. ``method="local"`` short-circuits small edge
sets through an in-process union-find (also the test oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _canon_batch(b: pa.Table) -> pa.Table:
    """Canonicalize edges: int64 (u>v orientation), self-loops dropped."""
    a = b["id_a"].to_numpy().astype(np.int64)
    c = b["id_b"].to_numpy().astype(np.int64)
    hi, lo = np.maximum(a, c), np.minimum(a, c)
    keep = hi != lo
    return pa.table(
        {"u": pa.array(hi[keep], pa.int64()), "v": pa.array(lo[keep], pa.int64())}
    )


def _dedupe(edges: ray.data.Dataset) -> ray.data.Dataset:
    return edges.groupby(["u", "v"]).count().select_columns(["u", "v"])


def _checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    """(count, order-insensitive hash) of a deduped edge set. Per-block
    partials combine on the driver mod 2^64 (a Dataset ``sum`` would
    widen int64 partials to Python ints and overflow Arrow int64)."""

    def h(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.uint64)
        v = b["v"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (u * _MIX1) ^ (v * _MIX2)
            x ^= x >> np.uint64(29)
        with np.errstate(over="ignore"):
            s = np.sum(x, dtype=np.uint64)  # wraps mod 2^64 — order-insensitive
        return pa.table(
            {
                "n": pa.array([len(u)], pa.int64()),
                "s": pa.array([int(s.astype(np.int64))], pa.int64()),
            }
        )

    n_total, s_total = 0, 0
    for b in edges.map_batches(h, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        n_total += int(np.sum(t["n"].to_numpy()))
        s_total = (s_total + int(np.sum(t["s"].to_numpy().astype(np.uint64), dtype=np.uint64))) % (1 << 64)
    return n_total, s_total


def _large_star_bucket(g: pa.Table) -> pa.Table:
    """For each node u in the bucket: m = min(Γ(u) ∪ {u}); emit (v, m)
    for every neighbor v > u. Input rows are both orientations."""
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
    min_v = np.minimum.reduceat(v, starts)
    m = np.minimum(min_v, u[starts])  # min over Γ(u) ∪ {u}
    m_rep = np.repeat(m, np.diff(np.concatenate((starts, [len(u)]))))
    sel = v > u
    hi, lo = v[sel], m_rep[sel]
    keep = hi != lo
    return pa.table(
        {"u": pa.array(hi[keep], pa.int64()), "v": pa.array(lo[keep], pa.int64())}
    )


def _small_star_bucket(g: pa.Table) -> pa.Table:
    """Edges oriented (u=hi, v=lo), grouped by hi. m = min neighbors;
    emit (w, m) for w ∈ N ∪ {u}, w ≠ m."""
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
    counts = np.diff(np.concatenate((starts, [len(u)])))
    m = np.minimum.reduceat(v, starts)  # all v < u, so min(N ∪ {u}) = min(N)
    m_rep = np.repeat(m, counts)
    # neighbors w ∈ N, w != m
    sel = v != m_rep
    out_u = [v[sel]]
    out_v = [m_rep[sel]]
    # plus u itself (u > all v ⇒ u != m always)
    out_u.append(u[starts])
    out_v.append(m)
    hi = np.concatenate(out_u)
    lo = np.concatenate(out_v)
    return pa.table({"u": pa.array(hi, pa.int64()), "v": pa.array(lo, pa.int64())})


def _with_bucket(edges: ray.data.Dataset, key: str, num_buckets: int) -> ray.data.Dataset:
    def add(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            x = k * _MIX1
            x ^= x >> np.uint64(31)
        return b.append_column(
            "bucket", pa.array((x % np.uint64(num_buckets)).astype(np.int32), pa.int32())
        )

    return edges.map_batches(add, batch_format="pyarrow")


def _both_orientations(edges: ray.data.Dataset) -> ray.data.Dataset:
    def mirror(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        return pa.table(
            {
                "u": pa.array(np.concatenate((u, v)), pa.int64()),
                "v": pa.array(np.concatenate((v, u)), pa.int64()),
            }
        )

    return edges.map_batches(mirror, batch_format="pyarrow")


def connected_components_local(id_a: np.ndarray, id_b: np.ndarray) -> dict[int, int]:
    """In-process union-find → {node: component_min}. The small-N path
    and the distributed algorithm's test oracle."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(id_a.tolist(), id_b.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps labels = component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: ray.data.Dataset,
    max_rounds: int = 50,
    num_buckets: int = 64,
    method: str = "distributed",
) -> ray.data.Dataset:
    """Label every node of the (id_a, id_b) edge Dataset with its
    component minimum → Dataset[(node, component)].

    The driver loop materializes the *edge set* once per round (bounded
    by the near-dup pair count, never the corpus) so each round's
    groupby reads a stable input instead of replaying lineage.
    """
    if method == "local":
        batches = [pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")]
        if batches:
            t = pa.concat_tables(batches)
            ia = t["id_a"].to_numpy().astype(np.int64)
            ib = t["id_b"].to_numpy().astype(np.int64)
        else:
            ia = ib = np.empty(0, np.int64)
        labels = connected_components_local(ia, ib)
        nodes = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
        comps = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
        order = np.argsort(nodes)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes[order], pa.int64()),
                    "component": pa.array(comps[order], pa.int64()),
                }
            )
        )

    cur = _dedupe(edges.map_batches(_canon_batch, batch_format="pyarrow")).materialize()
    prev_sig = _checksum(cur)
    if prev_sig[0] == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    for _ in range(max_rounds):
        ls = (
            _with_bucket(_both_orientations(cur), "u", num_buckets)
            .groupby("bucket")
            .map_groups(_large_star_bucket, batch_format="pyarrow")
        )
        ss_in = _dedupe(ls)
        ss = (
            _with_bucket(ss_in, "u", num_buckets)
            .groupby("bucket")
            .map_groups(_small_star_bucket, batch_format="pyarrow")
        )
        cur = _dedupe(ss).materialize()
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # converged star forest: every edge is (member u → component-min v);
    # roots appear only on the v side → label them with themselves
    def labels(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate((u, v)), pa.int64()),
                "component": pa.array(np.concatenate((v, v)), pa.int64()),
            }
        )

    return (
        cur.map_batches(labels, batch_format="pyarrow")
        .groupby("node")
        .min("component")
        .map_batches(
            lambda b: pa.table(
                {"node": b["node"], "component": b["min(component)"]}
            ),
            batch_format="pyarrow",
        )
    )


def pagerank(
    edges: ray.data.Dataset,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "id_a",
    dst: str = "id_b",
    seeds: list[int] | None = None,
) -> pa.Table:
    """Distributed PageRank over a directed edge Dataset → (node, rank)
    after ``n_iter`` power iterations — the web-graph static prior that
    feeds BM25 pre-ranking (F7/J6: the computed version of the
    ``prior`` doc_meta column).

    Scale shape (the "vertex state fits, edges stream" regime): the rank
    and out-degree vectors are node-count-sized, broadcast once per
    iteration via ``ray.put``; each iteration is ONE streaming pass over
    the edges — per-batch ``np.add.at`` partial contribution vectors,
    folded through the same vocabulary-sized exchange as the sketch
    pre-merges. Edges are materialized once (multi-consumer input).
    Dangling mass (out-degree-0 nodes) is redistributed uniformly:

        r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/deg(u) + D/N)

    With ``seeds`` (personalized / topic-sensitive PageRank,
    Haveliwala '02) the uniform 1/N teleport vector is replaced by
    uniform mass over the seed set, and dangling mass is likewise
    redistributed onto the seeds:

        r'(v) = (1-d)·p(v) + d·(Σ_{u→v} r(u)/deg(u) + D·p(v))

    Duplicate edges contribute multiply on both the engine and the SQL
    oracle (no implicit dedup)."""
    edges = edges.materialize()

    # pass 1: node universe + out-degrees (node-sized exchange)
    def deg_partial(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy().astype(np.int64)
        t = b[dst].to_numpy().astype(np.int64)
        us, cs = np.unique(s, return_counts=True)
        ut = np.unique(t)
        node = np.concatenate([us, ut])
        deg = np.concatenate([cs, np.zeros(len(ut), np.int64)])
        return pa.table(
            {"node": pa.array(node, pa.int64()), "deg": pa.array(deg, pa.int64())}
        )

    hs, cs_ = [], []
    for b in edges.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["node"].to_numpy(zero_copy_only=False))
        cs_.append(b["deg"].to_numpy(zero_copy_only=False))
    if not hs:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    alln = np.concatenate(hs)
    alld = np.concatenate(cs_)
    nodes, inv = np.unique(alln, return_inverse=True)
    outdeg = np.zeros(len(nodes), np.int64)
    np.add.at(outdeg, inv, alld)
    n = len(nodes)

    # teleport vector: uniform for classic PageRank, mass on the seed
    # set for personalized / topic-sensitive PageRank (Haveliwala '02)
    if seeds is None:
        p = np.full(n, 1.0 / n, np.float64)
    else:
        sd = np.asarray(sorted(set(seeds)), np.int64)
        if len(sd) == 0:
            raise ValueError("seeds must be non-empty (or None for uniform)")
        in_graph = np.isin(sd, nodes)
        if not in_graph.all():
            raise ValueError(f"seeds not in graph: {sd[~in_graph].tolist()}")
        p = np.zeros(n, np.float64)
        p[np.searchsorted(nodes, sd)] = 1.0 / len(sd)
    rank = p.copy()
    base_ref = ray.put(nodes)
    d_ref = ray.put(outdeg)
    for _ in range(n_iter):
        r_ref = ray.put(rank)

        def contrib2(
            b: pa.Table, _n=base_ref, _r=r_ref, _d=d_ref
        ) -> pa.Table:
            nd = ray.get(_n)
            r = ray.get(_r)
            dg = ray.get(_d)
            si = np.searchsorted(nd, b[src].to_numpy().astype(np.int64))
            ti = np.searchsorted(nd, b[dst].to_numpy().astype(np.int64))
            w = r[si] / dg[si]
            ut, invt = np.unique(ti, return_inverse=True)
            s = np.zeros(len(ut), np.float64)
            np.add.at(s, invt, w)
            return pa.table(
                {"idx": pa.array(ut, pa.int64()), "c": pa.array(s, pa.float64())}
            )

        # fold partials in a CANONICAL order (sort by (idx, value)) so
        # the float sum is identical at any parallelism / arrival order
        idxs, vals = [], []
        for b in edges.map_batches(contrib2, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            idxs.append(b["idx"].to_numpy(zero_copy_only=False))
            vals.append(b["c"].to_numpy(zero_copy_only=False))
        ai = np.concatenate(idxs) if idxs else np.empty(0, np.int64)
        av = np.concatenate(vals) if vals else np.empty(0, np.float64)
        order = np.lexsort((av, ai))
        sums = np.zeros(n, np.float64)
        np.add.at(sums, ai[order], av[order])
        dangling = float(rank[outdeg == 0].sum())
        if seeds is None:
            rank = (1.0 - damping) / n + damping * (sums + dangling / n)
        else:
            rank = (1.0 - damping) * p + damping * (sums + dangling * p)

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank": pa.array(np.round(rank, 6), pa.float64()),
        }
    )


def hits(
    edges: ray.data.Dataset,
    n_iter: int = 5,
    src: str = "id_a",
    dst: str = "id_b",
) -> pa.Table:
    """Distributed HITS (Kleinberg '99) over a directed edge Dataset →
    ``(node, authority, hub)`` after ``n_iter`` mutual-reinforcement
    iterations — the other classic link-analysis static signal next to
    PageRank (authorities ≈ good link TARGETS, hubs ≈ good link LISTS).

    Same scale shape as :func:`pagerank` (vertex state fits, edges
    stream): the hub/authority vectors are node-count-sized, broadcast
    once per half-iteration via ``ray.put``; each half-iteration is ONE
    streaming pass over the edges with per-batch ``np.add.at`` partials
    folded in a canonical order so the float sums are identical at any
    parallelism. L1 normalization after each half-step (sum = 1) keeps
    the replay exactly expressible in SQL (no sqrt). Duplicate edges
    contribute multiply, matching the oracle.
    """
    edges = edges.materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy().astype(np.int64)
        t = b[dst].to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(np.unique(np.concatenate([s, t])))})

    parts = [
        b["node"].to_numpy(zero_copy_only=False)
        for b in edges.map_batches(node_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        empty = pa.array([], pa.float64())
        return pa.table(
            {"node": pa.array([], pa.int64()), "authority": empty, "hub": empty}
        )
    nodes = np.unique(np.concatenate(parts))
    n = len(nodes)
    base_ref = ray.put(nodes)

    def _push(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """One edge pass: out[to] += vec[from], canonical-order fold."""
        v_ref = ray.put(vec)

        def contrib(b: pa.Table, _n=base_ref, _v=v_ref) -> pa.Table:
            nd, v = ray.get(_n), ray.get(_v)
            fi = np.searchsorted(nd, b[from_col].to_numpy().astype(np.int64))
            ti = np.searchsorted(nd, b[to_col].to_numpy().astype(np.int64))
            ut, invt = np.unique(ti, return_inverse=True)
            s = np.zeros(len(ut), np.float64)
            np.add.at(s, invt, v[fi])
            return pa.table(
                {"idx": pa.array(ut, pa.int64()), "c": pa.array(s, pa.float64())}
            )

        idxs, vals = [], []
        for b in edges.map_batches(contrib, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            idxs.append(b["idx"].to_numpy(zero_copy_only=False))
            vals.append(b["c"].to_numpy(zero_copy_only=False))
        ai = np.concatenate(idxs) if idxs else np.empty(0, np.int64)
        av = np.concatenate(vals) if vals else np.empty(0, np.float64)
        order = np.lexsort((av, ai))
        out = np.zeros(n, np.float64)
        np.add.at(out, ai[order], av[order])
        tot = out.sum()
        return out / tot if tot > 0 else out

    auth = np.full(n, 1.0 / n, np.float64)
    hub = np.full(n, 1.0 / n, np.float64)
    for _ in range(n_iter):
        auth = _push(hub, src, dst)  # a(v) ∝ Σ_{u→v} h(u)
        hub = _push(auth, dst, src)  # h(u) ∝ Σ_{u→v} a(v)

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "authority": pa.array(np.round(auth, 6), pa.float64()),
            "hub": pa.array(np.round(hub, 6), pa.float64()),
        }
    )
