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


def triangle_counts(
    edges: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-node triangle participation counts over the undirected,
    deduplicated (id_a, id_b) edge Dataset → Dataset[(node,
    n_triangles)] (nodes in ≥1 triangle; total triangles = Σ/3) — the
    classic graph-cohesion signal (clustering coefficient numerator,
    spam-farm / link-ring detection on the web graph).

    Algorithm: degree-ordered node-iterator (Schank & Wagner '05 —
    the MapReduce standard from Suri & Vassilvitskii '11). Every edge
    is oriented from its lower-(degree, id) endpoint to the higher, so
    each triangle is counted exactly once as a wedge at its
    lowest-degree corner and out-degrees are bounded by O(√m) on any
    graph. Three shuffles total, all edge-bounded:

    1. degrees: per-block partials folded on the driver (node-sized,
       the same vertex-state-fits regime as :func:`pagerank`), then
       the (node → orientation rank) vector broadcast via ``ray.put``;
    2. wedges: one groupby on a hash bucket of the wedge CENTER, pair
       generation fully vectorized inside the bucket (the
       ``copair_counts`` offset arithmetic);
    3. closure: wedge candidates and oriented edges co-bucketed by the
       (v, w) pair hash, matched inside each bucket with one lexsort —
       a run of equal (v, w) rows closes iff its first row is an edge.

    Matched wedges emit one partial count per corner, folded by a
    combiner groupby — the driver never sees per-triangle rows."""
    canon = _dedupe(
        edges.map_batches(_canon_batch, batch_format="pyarrow")
    ).materialize()

    # pass 1: degrees (node-sized driver fold) → orientation rank
    def deg_partial(b: pa.Table) -> pa.Table:
        n = np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()]).astype(np.int64)
        un, cn = np.unique(n, return_counts=True)
        return pa.table(
            {"node": pa.array(un, pa.int64()), "deg": pa.array(cn, pa.int64())}
        )

    hs, cs = [], []
    for b in canon.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["node"].to_numpy(zero_copy_only=False))
        cs.append(b["deg"].to_numpy(zero_copy_only=False))
    if not hs:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "n_triangles": pa.array([], pa.int64())}
            )
        )
    alln, alld = np.concatenate(hs), np.concatenate(cs)
    nodes, inv = np.unique(alln, return_inverse=True)
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, inv, alld)
    order = np.lexsort((nodes, deg))
    rank = np.empty(len(nodes), np.int64)
    rank[order] = np.arange(len(nodes))
    rank_ref = ray.put((nodes, rank))

    def _rank_of(ids: np.ndarray, nd: np.ndarray, rk: np.ndarray) -> np.ndarray:
        return rk[np.searchsorted(nd, ids)]

    # oriented edges (a → b with rank[a] < rank[b]), bucketed two ways:
    # kind=0 rows keyed by the (v, w) pair hash for the closure join
    def orient(b: pa.Table, _r=rank_ref) -> pa.Table:
        nd, rk = ray.get(_r)
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        ru, rv = _rank_of(u, nd, rk), _rank_of(v, nd, rk)
        swap = ru > rv
        a = np.where(swap, v, u)
        c = np.where(swap, u, v)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(c, pa.int64())}
        )

    oriented = canon.map_batches(orient, batch_format="pyarrow").materialize()

    def _pair_bucket(v: np.ndarray, w: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = (v.astype(np.uint64) * _MIX1) ^ (w.astype(np.uint64) * _MIX2)
            x ^= x >> np.uint64(29)
        return (x % np.uint64(n_buckets)).astype(np.int32)

    # wedges at each center: bucket by center, vectorized pair gen
    def center_bucket(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            x = a * _MIX1
            x ^= x >> np.uint64(31)
        return b.append_column(
            "bucket", pa.array((x % np.uint64(n_buckets)).astype(np.int32), pa.int32())
        )

    def wedges_in_bucket(g: pa.Table, _r=rank_ref) -> pa.Table:
        nd, rk = ray.get(_r)
        a = g["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        rb = _rank_of(b, nd, rk)
        order = np.lexsort((rb, a))
        a, b = a[order], b[order]
        runs = np.concatenate(([0], np.flatnonzero(a[1:] != a[:-1]) + 1))
        lens = np.diff(np.concatenate((runs, [len(a)])))
        start_of = np.repeat(runs, lens)
        within = np.arange(len(a)) - start_of
        right = np.repeat(np.arange(len(a)), within)
        pair_start = np.repeat(start_of, within)
        csum = np.cumsum(within) - within
        left = pair_start + (np.arange(within.sum()) - np.repeat(csum, within))
        # neighbors sorted by rank within a run → rank[v] < rank[w]
        v, w, u = b[left], b[right], a[right]
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "kind": pa.array(np.ones(len(v), np.int8), pa.int8()),
                "jb": pa.array(_pair_bucket(v, w), pa.int32()),
            }
        )

    wedges = (
        oriented.map_batches(center_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges_in_bucket, batch_format="pyarrow")
    )

    def edge_rows(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        c = b["b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "v": pa.array(a, pa.int64()),
                "w": pa.array(c, pa.int64()),
                "u": pa.array(np.full(len(a), -1, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(a), np.int8), pa.int8()),
                "jb": pa.array(_pair_bucket(a, c), pa.int32()),
            }
        )

    tagged = wedges.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close_bucket(g: pa.Table) -> pa.Table:
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        k = g["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, w, v))
        v, w, u, k = v[order], w[order], u[order], k[order]
        new = np.concatenate(
            ([True], (v[1:] != v[:-1]) | (w[1:] != w[:-1]))
        ) if len(v) else np.empty(0, bool)
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        closed = k[starts] == 0  # dedup ⇒ ≤1 edge row per (v, w), sorted first
        hit = closed[run_id] & (k == 1)
        corners = np.concatenate([u[hit], v[hit], w[hit]])
        un, cn = np.unique(corners, return_counts=True)
        return pa.table(
            {"node": pa.array(un, pa.int64()),
             "c": pa.array(cn.astype(np.int64), pa.int64())}
        )

    from dcs_ray.functions.relational import combiner_groupby

    partials = tagged.groupby("jb").map_groups(close_bucket, batch_format="pyarrow")
    summed = combiner_groupby(partials, ["node"], ["c"])
    return summed.map_batches(
        lambda b: pa.table({"node": b["node"], "n_triangles": b["c"]}),
        batch_format="pyarrow",
    )


def clustering_coefficients(edges: ray.data.Dataset) -> pa.Table:
    """Local clustering coefficient per node (Watts & Strogatz '98):
    ``2·triangles(v) / (deg(v)·(deg(v)−1))`` over the undirected
    deduplicated graph → ``(node, degree, n_triangles, clustering)``
    for every node (degree<2 ⇒ 0.0) — the per-node cohesion feature on
    top of :func:`triangle_counts` (spam rings cluster tightly, organic
    hub pages don't).

    Scale shape: triangles come from the bucketed wedge/closure
    pipeline; degrees and the final join are node-sized driver folds
    (the vertex-state-fits regime). The division is pure integer inputs
    → one correctly-rounded double op, so round-6 values replay
    bit-exactly in SQL."""
    canon = _dedupe(
        edges.map_batches(_canon_batch, batch_format="pyarrow")
    ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        n = np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()]).astype(np.int64)
        un, cn = np.unique(n, return_counts=True)
        return pa.table(
            {"node": pa.array(un, pa.int64()), "deg": pa.array(cn, pa.int64())}
        )

    hs, cs = [], []
    for b in canon.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["node"].to_numpy(zero_copy_only=False))
        cs.append(b["deg"].to_numpy(zero_copy_only=False))
    if not hs:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64()),
                "clustering": pa.array([], pa.float64()),
            }
        )
    alln, alld = np.concatenate(hs), np.concatenate(cs)
    nodes, inv = np.unique(alln, return_inverse=True)
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, inv, alld)

    tri = np.zeros(len(nodes), np.int64)
    for b in triangle_counts(
        canon.map_batches(
            lambda t: pa.table({"id_a": t["u"], "id_b": t["v"]}),
            batch_format="pyarrow",
        )
    ).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        idx = np.searchsorted(nodes, t["node"].to_numpy(zero_copy_only=False))
        tri[idx] += t["n_triangles"].to_numpy(zero_copy_only=False)

    with np.errstate(divide="ignore", invalid="ignore"):
        coef = np.where(
            deg >= 2, (2.0 * tri) / (deg * np.maximum(deg - 1, 1)), 0.0
        )
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "degree": pa.array(deg, pa.int64()),
            "n_triangles": pa.array(tri, pa.int64()),
            "clustering": pa.array(np.round(coef, 6), pa.float64()),
        }
    )


def label_propagation(
    edges: ray.data.Dataset, n_iter: int = 5, n_buckets: int = 64
) -> ray.data.Dataset:
    """Synchronous label-propagation community detection (Raghavan et
    al. '07, deterministic variant) over the undirected deduplicated
    edge Dataset → Dataset[(node, community)] after ``n_iter`` rounds.

    Update rule (fully deterministic, SQL-replayable): every node
    starts labeled with its own id; each round, simultaneously,
    ``label(v) = argmax over neighbor-label counts`` with ties broken
    by the SMALLEST label. Nodes keep their previous label only if they
    have no neighbors (can't happen inside the edge-induced universe).

    Scale shape: the label vector is node-sized, broadcast once per
    round via ``ray.put`` (vertex state fits, edges stream — the
    :func:`pagerank` regime). Each round is one streaming edge pass
    emitting per-batch (node, neighbor-label) partial counts, one
    combiner groupby to fold them (the exchange is bounded by distinct
    (node, label) pairs ≤ 2·|edges|, never corpus text), and one
    bucketed argmax; the driver collects only the node-sized new label
    vector."""
    from dcs_ray.functions.relational import combiner_groupby

    und = _both_orientations(
        _dedupe(edges.map_batches(_canon_batch, batch_format="pyarrow"))
    ).materialize()

    parts = [
        b["u"].to_numpy(zero_copy_only=False)
        for b in und.select_columns(["u"]).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "community": pa.array([], pa.int64())}
            )
        )
    nodes = np.unique(np.concatenate(parts))
    labels = nodes.copy()

    for _ in range(n_iter):
        l_ref = ray.put((nodes, labels))

        def nbr_label(b: pa.Table, _l=l_ref) -> pa.Table:
            nd, lb = ray.get(_l)
            u = b["u"].to_numpy().astype(np.int64)
            v = b["v"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(u, pa.int64()),
                    "lbl": pa.array(lb[np.searchsorted(nd, v)], pa.int64()),
                }
            )

        counts = combiner_groupby(
            und.map_batches(nbr_label, batch_format="pyarrow"),
            ["node", "lbl"],
            [],
            count_col="c",
        )

        def bucket(b: pa.Table) -> pa.Table:
            n = b["node"].to_numpy().astype(np.uint64)
            with np.errstate(over="ignore"):
                x = n * _MIX1
                x ^= x >> np.uint64(31)
            return b.append_column(
                "bucket",
                pa.array((x % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
            )

        def argmax_in_bucket(g: pa.Table) -> pa.Table:
            n = g["node"].combine_chunks().to_numpy(zero_copy_only=False)
            lb = g["lbl"].combine_chunks().to_numpy(zero_copy_only=False)
            c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
            # per node: max count, then smallest label — one lexsort
            order = np.lexsort((lb, -c, n))
            n, lb = n[order], lb[order]
            starts = np.concatenate(([0], np.flatnonzero(n[1:] != n[:-1]) + 1))
            return pa.table(
                {
                    "node": pa.array(n[starts], pa.int64()),
                    "lbl": pa.array(lb[starts], pa.int64()),
                }
            )

        new_n, new_l = [], []
        for b in (
            counts.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(argmax_in_bucket, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            new_n.append(b["node"].to_numpy(zero_copy_only=False))
            new_l.append(b["lbl"].to_numpy(zero_copy_only=False))
        nn = np.concatenate(new_n)
        nl = np.concatenate(new_l)
        labels = nl[np.argsort(nn)]  # every node has ≥1 neighbor → full cover

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "community": pa.array(labels, pa.int64()),
            }
        )
    )


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: list[int],
    max_hops: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> pa.Table:
    """Directed breadth-first reachability from a seed set →
    ``(node, hops)`` for every node within ``max_hops`` link hops
    (hops = the MINIMUM distance; seeds are hops 0) — crawl-frontier /
    influence-radius analysis on the web graph.

    Scale shape (vertex state fits, edges stream — the :func:`pagerank`
    regime): the visited-set vector is node-sized and broadcast once
    per hop via ``ray.put``; each hop is ONE streaming edge pass
    emitting per-batch distinct new-frontier partials (node-sized
    fold on the driver). ``max_hops`` passes total; no shuffle."""
    edges = edges.materialize()
    seed_arr = np.unique(np.asarray(sorted(set(seeds)), np.int64))
    if len(seed_arr) == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
        )
    nodes = [seed_arr]
    hops = [np.zeros(len(seed_arr), np.int64)]
    visited = seed_arr.copy()
    frontier = seed_arr.copy()
    for h in range(1, max_hops + 1):
        state_ref = ray.put((visited, frontier))

        def expand(b: pa.Table, _s=state_ref) -> pa.Table:
            vis, fr = ray.get(_s)
            s = b[src].to_numpy().astype(np.int64)
            t = b[dst].to_numpy().astype(np.int64)
            on_frontier = np.isin(s, fr)
            cand = np.unique(t[on_frontier])
            new = cand[~np.isin(cand, vis)]
            return pa.table({"node": pa.array(new, pa.int64())})

        parts = [
            b["node"].to_numpy(zero_copy_only=False)
            for b in edges.map_batches(expand, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
        frontier = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if len(frontier) == 0:
            break
        nodes.append(frontier)
        hops.append(np.full(len(frontier), h, np.int64))
        visited = np.union1d(visited, frontier)

    alln = np.concatenate(nodes)
    allh = np.concatenate(hops)
    order = np.argsort(alln)
    return pa.table(
        {
            "node": pa.array(alln[order], pa.int64()),
            "hops": pa.array(allh[order], pa.int64()),
        }
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


def opic(
    edges: ray.data.Dataset,
    n_iter: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> pa.Table:
    """OPIC (Abiteboul-Preda-Cobena WWW '03) page importance, the
    crawl-frontier ordering signal, batch-replayed synchronously:
    every node starts with cash 1/N; each iteration distributes ALL
    current cash along out-links (dangling cash goes to every node
    uniformly — the virtual-page edge) while the cash a node HELD is
    accumulated into its history. Importance after T iterations is
    ``(H + C)/(T + 1)`` — cash is conserved each step, so importances
    sum to 1. Distinct from PageRank (no damping; the history average
    is what the online crawler reads off to prioritize fetches).

    Scale shape identical to :func:`pagerank`: node-sized cash/degree
    vectors broadcast per iteration, one streaming pass over the edge
    set per iteration, canonical-order partial folds for bit-stable
    sums."""
    edges = edges.materialize()

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
            {"node": pa.array([], pa.int64()), "importance": pa.array([], pa.float64())}
        )
    alln = np.concatenate(hs)
    alld = np.concatenate(cs_)
    nodes, inv = np.unique(alln, return_inverse=True)
    outdeg = np.zeros(len(nodes), np.int64)
    np.add.at(outdeg, inv, alld)
    n = len(nodes)
    cash = np.full(n, 1.0 / n, np.float64)
    hist = np.zeros(n, np.float64)
    base_ref = ray.put(nodes)
    d_ref = ray.put(outdeg)
    for _ in range(n_iter):
        c_ref = ray.put(cash)

        def contrib(b: pa.Table, _n=base_ref, _c=c_ref, _d=d_ref) -> pa.Table:
            nd = ray.get(_n)
            c = ray.get(_c)
            dg = ray.get(_d)
            si = np.searchsorted(nd, b[src].to_numpy().astype(np.int64))
            ti = np.searchsorted(nd, b[dst].to_numpy().astype(np.int64))
            w = c[si] / dg[si]
            ut, invt = np.unique(ti, return_inverse=True)
            s = np.zeros(len(ut), np.float64)
            np.add.at(s, invt, w)
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
        sums = np.zeros(n, np.float64)
        np.add.at(sums, ai[order], av[order])
        dangling = float(cash[outdeg == 0].sum())
        hist = hist + cash
        cash = sums + dangling / n
    importance = (hist + cash) / (n_iter + 1.0)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "importance": pa.array(np.round(importance, 6), pa.float64()),
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


def salsa(
    edges: ray.data.Dataset,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> pa.Table:
    """SALSA (Lempel & Moran '00) over a directed edge Dataset →
    ``(node, authority, hub)``: HITS' mutual reinforcement but with
    DEGREE-NORMALIZED pushes — each half-step is a random-walk step on
    the bipartite hub/authority graph (a(v) = Σ_{u→v} h(u)/outdeg(u),
    h(u) = Σ_{u→v} a(v)/indeg(v)), which makes scores proportional to
    in/out degree within each connected component instead of being
    dominated by tightly-knit communities (the TKC effect HITS
    suffers). The link-analysis ranker behind "related pages" features;
    reference parity: the static-prior role of ``ranking/pre-ranking.go``.

    Same scale shape as :func:`hits`: vertex-sized vectors broadcast
    per half-iteration, one streaming edge pass each, per-batch
    ``np.add.at`` partials folded in canonical order. Degrees count
    edge ROWS (duplicate edges contribute multiply), matching the SQL
    replay; the per-edge h/outdeg division is pre-applied to the
    broadcast vector (constant per source node), so floats match the
    oracle's ``sum(h/d)`` bit-for-bit at round-6."""
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

    def _degree(col: str) -> np.ndarray:
        def dpart(b: pa.Table, _n=base_ref) -> pa.Table:
            nd = ray.get(_n)
            i = np.searchsorted(nd, b[col].to_numpy().astype(np.int64))
            ui, cnt = np.unique(i, return_counts=True)
            return pa.table(
                {"idx": pa.array(ui, pa.int64()), "c": pa.array(cnt, pa.int64())}
            )

        deg = np.zeros(n, np.int64)
        for b in edges.map_batches(dpart, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            np.add.at(deg, b["idx"].to_numpy(), b["c"].to_numpy())
        return deg

    outdeg = _degree(src)
    indeg = _degree(dst)

    def _push(vec: np.ndarray, deg: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """One degree-normalized edge pass: out[to] += vec[from]/deg[from]
        (deg>0 whenever the node appears on the from side)."""
        v_ref = ray.put(vec / np.maximum(deg, 1).astype(np.float64))

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
        auth = _push(hub, outdeg, src, dst)  # a(v) ∝ Σ_{u→v} h(u)/outdeg(u)
        hub = _push(auth, indeg, dst, src)  # h(u) ∝ Σ_{u→v} a(v)/indeg(v)

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "authority": pa.array(np.round(auth, 6), pa.float64()),
            "hub": pa.array(np.round(hub, 6), pa.float64()),
        }
    )


def kcore(
    edges: ray.data.Dataset,
    k: int = 2,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> pa.Table:
    """k-core peeling of the undirected graph induced by ``edges``,
    ``rounds`` fixed synchronous iterations (exact k-core is the fixed
    point; a fixed round count keeps the run — and its SQL replay —
    deterministic). Returns (node, deg) for nodes still meeting the
    degree bar after the final round.

    Scale shape: the distinct undirected pair set is materialized
    ONCE; the shrinking alive set broadcasts via ``ray.put``
    (node-sized, and monotone — so filtering the ORIGINAL pair set by
    the latest alive set IS the peeled edge set); each round is one
    distributed combiner degree pass. The driver holds node-sized
    degree folds, never edges."""
    from dcs_ray.functions.relational import combiner_groupby

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy().astype(np.int64)
        d = b[dst].to_numpy().astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    pairs = combiner_groupby(
        edges.map_batches(to_pairs, batch_format="pyarrow"), ["a", "b"], []
    ).map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow").materialize()

    def degrees(alive_ref) -> tuple[np.ndarray, np.ndarray]:
        def endpoints(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy().astype(np.int64)
            b = t["b"].to_numpy().astype(np.int64)
            if alive_ref is not None:
                al = ray.get(alive_ref)
                if len(al) == 0:
                    a = b = np.empty(0, np.int64)
                else:
                    ia = np.minimum(np.searchsorted(al, a), len(al) - 1)
                    ib = np.minimum(np.searchsorted(al, b), len(al) - 1)
                    ok = (al[ia] == a) & (al[ib] == b)
                    a, b = a[ok], b[ok]
            return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64())})

        agg = combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            [],
            count_col="deg",
        )
        parts = [pa.table(x) for x in agg.iter_batches(batch_format="pyarrow")]
        if not parts:  # everything peeled
            return np.empty(0, np.int64), np.empty(0, np.int64)
        t = pa.concat_tables(parts)
        nodes = t["node"].to_numpy().astype(np.int64)
        deg = t["deg"].to_numpy().astype(np.int64)
        order = np.argsort(nodes)
        return nodes[order], deg[order]

    alive_ref = None
    for _ in range(rounds):
        nodes, deg = degrees(alive_ref)
        alive_ref = ray.put(nodes[deg >= k])
    nodes, deg = degrees(alive_ref)
    keep = deg >= k
    return pa.table(
        {
            "node": pa.array(nodes[keep], pa.int64()),
            "deg": pa.array(deg[keep], pa.int64()),
        }
    )


def degree_assortativity(
    edges: ray.data.Dataset, src: str = "src", dst: str = "dst"
) -> tuple[int, float]:
    """Undirected Newman degree assortativity: Pearson r between the
    degrees at the two ends of every undirected edge (both
    orientations counted, the standard convention; negative = hubs
    link to leaves, the classic web-graph signature). Returns
    (n_endpoint_pairs, r rounded to 6).

    The distinct undirected pair set is one combiner fold; degrees
    fold per node (node-sized), broadcast once via ``ray.put`` and
    probed with searchsorted; each batch collapses to ONE integer
    moment row over both orientations and the driver folds exact ints,
    so the float expression is the canonical corr recipe (each integer
    widened to double independently)."""
    import math

    from dcs_ray.functions.relational import combiner_groupby

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy().astype(np.int64)
        d = b[dst].to_numpy().astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    pairs = combiner_groupby(
        edges.map_batches(to_pairs, batch_format="pyarrow"), ["a", "b"], []
    ).map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow").materialize()

    def degree_arrays() -> tuple[np.ndarray, np.ndarray]:
        def endpoints(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pa.array(
                        np.concatenate(
                            [
                                t["a"].to_numpy().astype(np.int64),
                                t["b"].to_numpy().astype(np.int64),
                            ]
                        ),
                        pa.int64(),
                    )
                }
            )

        agg = combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            [],
            count_col="deg",
        )
        t = pa.concat_tables(
            [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
        )
        kk = t["node"].to_numpy().astype(np.int64)
        d = t["deg"].to_numpy().astype(np.int64)
        order = np.argsort(kk)
        return kk[order], d[order]

    deg_ref = ray.put(degree_arrays())

    def moments(t: pa.Table) -> pa.Table:
        nk, dg = ray.get(deg_ref)
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        da = dg[np.searchsorted(nk, a)]
        db = dg[np.searchsorted(nk, b)]
        # both orientations: (da, db) and (db, da)
        x = np.concatenate([da, db])
        y = np.concatenate([db, da])
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    n = sx = sy = sxy = sxx = syy = 0
    for b in pairs.map_batches(moments, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        for row in range(len(t)):
            n += int(t["n"][row].as_py()); sx += int(t["sx"][row].as_py())
            sy += int(t["sy"][row].as_py()); sxy += int(t["sxy"][row].as_py())
            sxx += int(t["sxx"][row].as_py()); syy += int(t["syy"][row].as_py())
    num = (float(n) * float(sxy)) - (float(sx) * float(sy))
    da_ = math.sqrt((float(n) * float(sxx)) - (float(sx) * float(sx)))
    db_ = math.sqrt((float(n) * float(syy)) - (float(sy) * float(sy)))
    r = round(num / (da_ * db_), 6) if da_ * db_ > 0 else 0.0
    return n, r


def pointer_double(src: np.ndarray, dst: np.ndarray, n_rounds: int) -> np.ndarray:
    """Pointer doubling over a FUNCTIONAL graph (each src has exactly one
    dst): after r rounds every pointer has jumped 2**r hops or reached a
    terminal — the classic O(log chain) parallel chain-resolution kernel
    (Wyllie '79 list ranking / path shortcutting), here for redirect
    chains (HTTP 3xx maps, canonical-url graphs, symlink farms).

    ``src`` must be sorted unique; nodes absent from ``src`` are
    terminals (they map to themselves). Returns the dst array after
    doubling — ``dst[i]`` is src[i]'s 2**n_rounds-hop ancestor. The map
    itself is assumed broadcastable (redirect maps are a small fraction
    of the corpus); per-corpus resolution then happens inside
    ``map_batches`` via one searchsorted probe per batch — see
    ``resolve_redirects``. For an unbroadcastable map, each round is a
    bucketed hash self-join instead (same shape as the CC stars above).
    """
    dst = dst.copy()
    for _ in range(n_rounds):
        pos = np.searchsorted(src, dst)
        pos = np.minimum(pos, len(src) - 1)
        hit = src[pos] == dst
        dst = np.where(hit, dst[pos], dst)  # terminal dsts stay put
    return dst


def resolve_redirects(
    ds: "ray.data.Dataset", id_col: str, src: np.ndarray, dst: np.ndarray,
    n_rounds: int = 6, out_col: str = "terminal_id",
) -> "ray.data.Dataset":
    """Resolve every row's id through the redirect map to its terminal:
    the map doubles driver-side (it is redirect-sized, not
    corpus-sized), is broadcast ONCE via ``ray.put``, and the corpus
    pass is one vectorized searchsorted per batch."""
    order = np.argsort(src)
    src_s = src[order]
    final = pointer_double(src_s, dst[order], n_rounds)
    ref = ray.put((src_s, final))

    def probe(b: pa.Table) -> pa.Table:
        s, f = ray.get(ref)
        ids = b[id_col].to_numpy().astype(s.dtype)
        pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
        hit = (s[pos] == ids) if len(s) else np.zeros(len(ids), bool)
        term = np.where(hit, f[pos] if len(s) else ids, ids)
        return b.append_column(out_col, pa.array(term.astype(np.int64), pa.int64()))

    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HyperANF — approximate neighborhood function (Boldi, Rosa & Vigna, WWW '11)
# ---------------------------------------------------------------------------

_HANF_P = 4  # 2^4 = 16 registers per node


def _hanf_init(node_ids: np.ndarray, p: int = _HANF_P) -> tuple[np.ndarray, np.ndarray]:
    """Per-node single-element HLL counter: (register index, rank) of
    splitmix64(node). j = top p bits; rank = leading zeros of the
    remaining bits + 1, capped at 64-p+1 — the exact convention of
    ``sketches.hll_fold_batch`` so the SQL replay shares the formula."""
    from dcs_ray.codec import _bitlen64
    from dcs_ray.functions.sampling import splitmix64

    h = splitmix64(node_ids.astype(np.uint64))
    j = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    rank = np.minimum(65 - _bitlen64(rest), 64 - p + 1).astype(np.int64)
    return j, rank


def hyperanf(
    edges: ray.data.Dataset,
    rounds: int = 3,
    p: int = _HANF_P,
    src_col: str = "src",
    dst_col: str = "dst",
) -> list[ray.data.Dataset]:
    """HyperANF over a directed edge list: every node carries a 2^p-
    register HLL counter of its OUT-reachability ball; one round unions
    each node's counter with its successors' (elementwise register
    max), so after t rounds node n's counter estimates |ball(n, t)| —
    the algorithm behind the web-graph distance/diameter measurements
    of Boldi & Vigna (public WWW '11 paper).

    Distribution shape per round — two hash shuffles, NO broadcast of
    node state (the counter table is node-scale and may not fit one
    heap at web scale):
      1. ``union(registers keyed by node, edges keyed by dst)``
         → ``groupby(key)``: each group holds one node's registers and
         the edges that want them; it emits (src, registers) message
         rows — counters travel the REVERSED edges.
      2. ``union(messages, own registers) → groupby(node)``:
         elementwise max folds the round.

    Returns the list of register Datasets ``[R_1, .., R_rounds]``
    (rows: node, regs list<int64> of length 2^p)."""
    m = 1 << p

    def init_regs(b: pa.Table) -> pa.Table:
        nodes = b["node"].to_numpy().astype(np.int64)
        j, rank = _hanf_init(nodes, p)
        regs = np.zeros((len(nodes), m), np.int64)
        regs[np.arange(len(nodes)), j] = rank
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "regs": pa.array(regs.tolist(), pa.list_(pa.int64())),
            }
        )

    def node_list(b: pa.Table) -> pa.Table:
        vals = np.unique(
            np.concatenate(
                (
                    b[src_col].to_numpy().astype(np.int64),
                    b[dst_col].to_numpy().astype(np.int64),
                )
            )
        )
        return pa.table({"node": pa.array(vals, pa.int64())})

    nodes = (
        edges.select_columns([src_col, dst_col])
        .map_batches(node_list, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    regs = nodes.map_batches(init_regs, batch_format="pyarrow").materialize()
    edge_rows = edges.select_columns([src_col, dst_col]).materialize()

    out = []
    for _ in range(rounds):
        # phase 1: ship each node's regs to its predecessors
        reg_keyed = regs.map_batches(
            lambda b: pa.table(
                {
                    "key": b["node"],
                    "src": pa.array([-1] * len(b), pa.int64()),
                    "regs": b["regs"],
                }
            ),
            batch_format="pyarrow",
        )
        edge_keyed = edge_rows.map_batches(
            lambda b: pa.table(
                {
                    "key": b[dst_col].cast(pa.int64()),
                    "src": b[src_col].cast(pa.int64()),
                    "regs": pa.array(
                        [None] * len(b), pa.list_(pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )

        def route(g: pa.Table) -> pa.Table:
            srcs = g["src"].to_numpy()
            own = g["regs"].is_valid().to_numpy(zero_copy_only=False)
            if not own.any():  # dangling dst never initialized (can't happen)
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "regs": pa.array([], pa.list_(pa.int64()))}
                )
            regs_row = g["regs"].filter(pa.array(own))[0]
            targets = srcs[srcs >= 0]
            return pa.table(
                {
                    "node": pa.array(targets, pa.int64()),
                    "regs": pa.array([regs_row.as_py()] * len(targets),
                                     pa.list_(pa.int64())),
                }
            )

        messages = (
            reg_keyed.union(edge_keyed)
            .groupby("key")
            .map_groups(route, batch_format="pyarrow")
        )

        def fold(g: pa.Table) -> pa.Table:
            arr = (
                g["regs"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).astype(np.int64)
                .reshape(len(g), m)
            )
            return pa.table(
                {
                    "node": g["node"].slice(0, 1),
                    "regs": pa.array([arr.max(axis=0).tolist()],
                                     pa.list_(pa.int64())),
                }
            )

        regs = (
            messages.union(regs)
            .groupby("node")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )
        out.append(regs)
    return out


def hyperanf_sample_estimates(
    reg_rounds: list[ray.data.Dataset], sample_nodes: list[int], p: int = _HANF_P
) -> pa.Table:
    """(round, node, reg_sum, est) for a fixed node sample: reg_sum is
    the integer register sum (the strong exact check), est the standard
    HLL estimate of |ball(node, round)| rounded to 6dp. The power sum
    Σ 2^-r is accumulated as the INTEGER Σ 2^(cap-r) (dyadic rationals
    collapse exactly; a float sum would round 2^-61 + 1 differently per
    summation order) so the SQL replay is bit-deterministic."""
    cap = 64 - p + 1
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def est_from(r: np.ndarray) -> float:
        # Python-int sum: 16 terms up to 2^61 overflow int64 (np.sum wraps)
        ssum_int = sum(1 << (cap - int(x)) for x in r)
        est = alpha * m * m * float(1 << cap) / float(ssum_int)
        zeros = int((r == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return float(est)

    want = np.asarray(sorted(sample_nodes), np.int64)
    rows = {"round": [], "node": [], "reg_sum": [], "est": []}
    for ri, regs in enumerate(reg_rounds, start=1):
        got = {}
        for b in regs.iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            ids = t["node"].to_numpy().astype(np.int64)
            sel = np.isin(ids, want)
            sub = t.filter(pa.array(sel))
            for n, r in zip(
                sub["node"].to_pylist(), sub["regs"].to_pylist()
            ):
                got[int(n)] = np.asarray(r, np.int64)
        for n in want:
            r = got.get(int(n))
            if r is None:
                continue
            rows["round"].append(ri)
            rows["node"].append(int(n))
            rows["reg_sum"].append(int(r.sum()))
            rows["est"].append(round(est_from(r), 6) + 0.0)
    return pa.table(
        {
            "round": pa.array(rows["round"], pa.int64()),
            "node": pa.array(rows["node"], pa.int64()),
            "reg_sum": pa.array(rows["reg_sum"], pa.int64()),
            "est": pa.array(rows["est"], pa.float64()),
        }
    )
