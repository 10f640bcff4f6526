"""Distributed connected components (alternating large/small-star) vs
the in-process union-find oracle, plus the end-to-end fuzzy-dedup keep
pipeline. Reference parity: the cluster step dcs applies per-package
newest-wins grouping to (querymanager.go) generalized to arbitrary
near-dup graphs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dcs_ray.functions.graph import (
    connected_components,
    connected_components_local,
)


def _labels_of(ds) -> dict[int, int]:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return {}
    t = pa.concat_tables(tables)
    return dict(zip(t["node"].to_pylist(), t["component"].to_pylist()))


def _edge_ds(a, b):
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(np.asarray(a, np.int64), pa.int64()),
                "id_b": pa.array(np.asarray(b, np.int64), pa.int64()),
            }
        )
    )


def _check(a, b, **kw):
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    got = _labels_of(connected_components(_edge_ds(a, b), **kw))
    want = connected_components_local(a, b)
    assert got == want


def test_cc_empty(ray_session):
    got = _labels_of(connected_components(_edge_ds([], [])))
    assert got == {}


def test_cc_single_edge(ray_session):
    _check([5], [2])


def test_cc_self_loops_only(ray_session):
    got = _labels_of(connected_components(_edge_ds([3, 7], [3, 7])))
    assert got == {}


def test_cc_chain(ray_session):
    # a 200-node path: worst case for label propagation (diameter 199);
    # alternating-star converges in O(log n) rounds
    n = 200
    _check(np.arange(n - 1), np.arange(1, n))


def test_cc_star_and_cliques(ray_session):
    rng = np.random.default_rng(3)
    a, b = [], []
    # star centered at 1000
    for i in range(50):
        a.append(1000)
        b.append(2000 + i)
    # three 10-cliques with distinct id ranges
    for base in (0, 100, 300):
        ids = np.arange(base, base + 10)
        ia, ib = np.triu_indices(10, k=1)
        a.extend(ids[ia])
        b.extend(ids[ib])
    _check(a, b)


def test_cc_random_graphs_match_union_find(ray_session):
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        m = 400
        a = rng.integers(0, 300, m)
        b = rng.integers(0, 300, m)
        _check(a, b, num_buckets=8)


def test_cc_duplicate_and_reversed_edges(ray_session):
    a = [1, 2, 2, 9, 9, 4]
    b = [2, 1, 1, 4, 4, 9]
    _check(a, b)


def test_fuzzy_dedup_keep_end_to_end(ray_session):
    """MinHash→verify→CC→keep against a brute-force oracle on a corpus
    with planted near-dup clusters."""
    from dcs_ray.functions.dedup import exact_jaccard, fuzzy_dedup_keep

    rng = np.random.default_rng(7)
    words = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    )
    ids, texts = [], []
    base = []
    for i in range(40):
        t = " ".join(rng.choice(words, size=30))
        base.append(t)
        ids.append(i)
        texts.append(t)
    # near-dups of docs 0..9 (one word changed)
    for k in range(10):
        toks = base[k].split()
        toks[5] = "omega"
        ids.append(100 + k)
        texts.append(" ".join(toks))
    # exact-dup cluster of doc 20
    for k in range(3):
        ids.append(200 + k)
        texts.append(base[20])
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    kept = sorted(
        pa.concat_tables(
            [
                pa.table(b)
                for b in fuzzy_dedup_keep(docs, threshold=0.5).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )["doc_id"].to_pylist()
    )
    # oracle: all-pairs exact jaccard -> union-find -> keep min
    txt = dict(zip(ids, texts))
    ea, eb = [], []
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            if exact_jaccard(txt[x], txt[y]) >= 0.5:
                ea.append(min(x, y))
                eb.append(max(x, y))
    labels = connected_components_local(
        np.asarray(ea, np.int64), np.asarray(eb, np.int64)
    )
    drop = {n for n, c in labels.items() if c < n}
    assert kept == sorted(set(ids) - drop)
    # every planted cluster lost all but one member
    assert all(100 + k in drop or k in drop for k in range(10))
    assert sum(1 for k in (200, 201, 202) if k in drop) >= 2


def test_jaccard_verify_pairs_matches_exact(ray_session):
    from dcs_ray.functions.dedup import (
        exact_jaccard,
        jaccard_verify_pairs,
        minhash_candidate_pairs,
    )

    rng = np.random.default_rng(11)
    words = np.array("red green blue cyan magenta yellow black white".split())
    ids = list(range(30))
    texts = [" ".join(rng.choice(words, size=20)) for _ in ids]
    for k in range(5):  # plant near-dups
        toks = texts[k].split()
        toks[3] = "orange"
        ids.append(500 + k)
        texts.append(" ".join(toks))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    cand = minhash_candidate_pairs(docs)
    cand_t = pa.concat_tables(
        [pa.table(b) for b in cand.iter_batches(batch_format="pyarrow")]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for b in jaccard_verify_pairs(docs, cand, threshold=0.3).iter_batches(
            batch_format="pyarrow"
        )
        for r in pa.table(b).to_pylist()
    }
    txt = dict(zip(ids, texts))
    want = {}
    for a, b in zip(cand_t["id_a"].to_pylist(), cand_t["id_b"].to_pylist()):
        j = exact_jaccard(txt[a], txt[b])
        if j >= 0.3:
            want[(a, b)] = j
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k])


def test_jaccard_verify_empty_pairs(ray_session):
    from dcs_ray.functions.dedup import jaccard_verify_pairs

    docs = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["a b c", "d e f"])}
        )
    )
    empty = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    tables = [
        pa.table(b)
        for b in jaccard_verify_pairs(docs, empty).iter_batches(
            batch_format="pyarrow"
        )
    ]
    assert sum(len(t) for t in tables) == 0


def _dense_pagerank(edge_list, n_iter=5, d=0.85):
    import numpy as np

    nodes = sorted({u for e in edge_list for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edge_list:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        s = np.zeros(n)
        for u, v in edge_list:
            s[idx[v]] += r[idx[u]] / deg[idx[u]]
        dang = r[deg == 0].sum()
        r = (1 - d) / n + d * (s + dang / n)
    return nodes, np.round(r, 6)


def test_pagerank_matches_dense_reference():
    import numpy as np

    from dcs_ray.functions.graph import pagerank

    # cycle + dangling sink + a duplicate edge (counted twice)
    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (1, 3), (4, 3)]
    # node 3 is dangling (no out-edges); node 4 has rank inflow only via teleport
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], pa.int64()),
            "id_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = pagerank(ray.data.from_arrow(t).repartition(3), n_iter=5)
    nodes, want = _dense_pagerank(edges)
    assert got["node"].to_pylist() == nodes
    np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=2e-6)
    # ranks form a probability distribution
    assert abs(float(got["rank"].to_numpy().sum()) - 1.0) < 1e-4


def test_pagerank_empty_edges():
    from dcs_ray.functions.graph import pagerank

    t = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    out = pagerank(ray.data.from_arrow(t))
    assert len(out) == 0


def _dense_ppr(edge_list, seeds, n_iter=5, d=0.85):
    import numpy as np

    nodes = sorted({u for e in edge_list for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edge_list:
        deg[idx[u]] += 1
    p = np.zeros(n)
    for s in set(seeds):
        p[idx[s]] = 1.0 / len(set(seeds))
    r = p.copy()
    for _ in range(n_iter):
        s = np.zeros(n)
        for u, v in edge_list:
            s[idx[v]] += r[idx[u]] / deg[idx[u]]
        dang = r[deg == 0].sum()
        r = (1 - d) * p + d * (s + dang * p)
    return nodes, np.round(r, 6)


def test_personalized_pagerank_matches_dense_reference():
    import numpy as np
    import pytest

    from dcs_ray.functions.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (1, 3), (4, 3)]
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], pa.int64()),
            "id_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = pagerank(ray.data.from_arrow(t).repartition(3), n_iter=5, seeds=[0, 4])
    nodes, want = _dense_ppr(edges, [0, 4])
    assert got["node"].to_pylist() == nodes
    np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=2e-6)
    # teleport mass concentrates around the seeds: seed 0 outranks the
    # symmetric uniform-teleport case's smallest nodes
    r = dict(zip(got["node"].to_pylist(), got["rank"].to_numpy()))
    assert r[0] > r[2]
    # still a probability distribution
    assert abs(float(got["rank"].to_numpy().sum()) - 1.0) < 1e-4
    # seeds outside the node universe are rejected, not silently dropped
    with pytest.raises(ValueError):
        pagerank(ray.data.from_arrow(t), n_iter=1, seeds=[99])


# ---------------------------------------------------------------------------
# triangle counts


def _tri_brute(a, b) -> dict[int, int]:
    """Per-node triangle counts by explicit enumeration."""
    import itertools

    edges = set()
    for u, v in zip(a, b):
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: dict[int, int] = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                out[x] = out.get(x, 0) + 1
    return out


def _tri_of(ds) -> dict[int, int]:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return {}
    t = pa.concat_tables(tables)
    return dict(zip(t["node"].to_pylist(), t["n_triangles"].to_pylist()))


def test_triangles_known_graph(ray_session):
    from dcs_ray.functions.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, each node in 3) + a pendant edge
    a = [0, 0, 0, 1, 1, 2, 4]
    b = [1, 2, 3, 2, 3, 3, 0]
    got = _tri_of(triangle_counts(_edge_ds(a, b)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_random_matches_bruteforce(ray_session):
    from dcs_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(7)
    for n, m in [(30, 120), (60, 200)]:
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        got = _tri_of(triangle_counts(_edge_ds(a, b)))
        want = _tri_brute(a.tolist(), b.tolist())
        assert got == want


def test_triangles_duplicate_and_reversed_edges_count_once(ray_session):
    from dcs_ray.functions.graph import triangle_counts

    a = [0, 1, 2, 1, 0, 2]
    b = [1, 2, 0, 0, 2, 1]  # one triangle, every edge twice/reversed
    got = _tri_of(triangle_counts(_edge_ds(a, b)))
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangles_none(ray_session):
    from dcs_ray.functions.graph import triangle_counts

    got = _tri_of(triangle_counts(_edge_ds([0, 1, 2], [1, 2, 3])))  # a path
    assert got == {}


# ---------------------------------------------------------------------------
# label propagation


def _lpa_brute(a, b, n_iter) -> dict[int, int]:
    edges = set()
    for u, v in zip(a, b):
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj: dict[int, list] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for x in nbrs:
                counts[lbl[x]] = counts.get(lbl[x], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lbl = new
    return lbl


def _lpa_of(ds) -> dict[int, int]:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return {}
    t = pa.concat_tables(tables)
    return dict(zip(t["node"].to_pylist(), t["community"].to_pylist()))


def test_lpa_two_cliques_with_bridge(ray_session):
    from dcs_ray.functions.graph import label_propagation

    import itertools

    e = list(itertools.combinations(range(5), 2))
    e += list(itertools.combinations(range(10, 15), 2))
    e.append((4, 10))  # bridge
    a = [x for x, _ in e]
    b = [y for _, y in e]
    got = _lpa_of(label_propagation(_edge_ds(a, b), n_iter=5))
    want = _lpa_brute(a, b, 5)
    assert got == want
    # two communities dominated by the clique minima
    assert set(got[n] for n in range(4)) == {0}
    assert set(got[n] for n in range(11, 15)) == {10}


def test_lpa_random_matches_reference(ray_session):
    from dcs_ray.functions.graph import label_propagation

    rng = np.random.default_rng(11)
    a = rng.integers(0, 40, 150)
    b = rng.integers(0, 40, 150)
    for k in (1, 3):
        got = _lpa_of(label_propagation(_edge_ds(a, b), n_iter=k))
        want = _lpa_brute(a.tolist(), b.tolist(), k)
        assert got == want


def test_lpa_empty(ray_session):
    from dcs_ray.functions.graph import label_propagation

    assert _lpa_of(label_propagation(_edge_ds([], []))) == {}


def test_clustering_coefficients_known_graph(ray_session):
    from dcs_ray.functions.graph import clustering_coefficients

    # triangle 0-1-2 plus pendant 2-3: c(0)=c(1)=1.0, c(2)=2/6, c(3)=0
    t = clustering_coefficients(_edge_ds([0, 1, 2, 2], [1, 2, 0, 3])).sort_by("node")
    assert t["node"].to_pylist() == [0, 1, 2, 3]
    assert t["degree"].to_pylist() == [2, 2, 3, 1]
    assert t["n_triangles"].to_pylist() == [1, 1, 1, 0]
    got = t["clustering"].to_pylist()
    assert got[0] == 1.0 and got[1] == 1.0
    assert abs(got[2] - round(2 / 6, 6)) < 1e-9
    assert got[3] == 0.0


def test_clustering_empty(ray_session):
    from dcs_ray.functions.graph import clustering_coefficients

    assert len(clustering_coefficients(_edge_ds([], []))) == 0


def test_bfs_hops_known_graph(ray_session):
    from dcs_ray.functions.graph import bfs_hops

    # 0→1→2→3→4 chain plus 0→2 shortcut: min-hop semantics
    t = bfs_hops(
        _edge_ds([0, 1, 2, 3, 0], [1, 2, 3, 4, 2]), seeds=[0], max_hops=3
    )
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_directed_and_capped(ray_session):
    from dcs_ray.functions.graph import bfs_hops

    # edges point INTO the seed → nothing reachable
    t = bfs_hops(_edge_ds([1, 2], [0, 0]), seeds=[0], max_hops=3)
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))
    assert got == {0: 0}
    # cap: the 4th hop never appears
    t = bfs_hops(_edge_ds([0, 1, 2, 3], [1, 2, 3, 4]), seeds=[0], max_hops=2)
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_empty_seeds(ray_session):
    from dcs_ray.functions.graph import bfs_hops

    assert len(bfs_hops(_edge_ds([0], [1]), seeds=[], max_hops=3)) == 0


def test_triangle_orientation_bounds_out_degree(ray_session):
    """The degree-ordered orientation's scale guarantee: max out-degree
    ≤ O(√m) even on a star graph (the wedge-generation memory bound)."""
    import math

    from dcs_ray.functions.graph import triangle_counts

    # star: hub 0 connected to 1..200 plus a few rim edges
    a = [0] * 200 + [1, 2, 3]
    b = list(range(1, 201)) + [2, 3, 4]
    got = _tri_of(triangle_counts(_edge_ds(a, b)))
    want = _tri_brute(a, b)
    assert got == want
    # the hub (degree 200) is oriented AWAY from at most O(√m) rim
    # nodes — verified indirectly: the run completes with wedge volume
    # Σ outdeg² ≪ deg(hub)²; a brute wedge-at-hub approach would emit
    # 200·199/2 pairs, the oriented one at most m^1.5 ≈ 2.9k
    m = len(set((min(x, y), max(x, y)) for x, y in zip(a, b)))
    assert m == 203
    assert math.isqrt(2 * m) + 1 >= 21  # documented bound holds trivially


def test_kcore_known_graph(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.graph import kcore

    # triangle {1,2,3} plus a pendant chain 3-4-5: the 2-core is the
    # triangle only (4 and 5 peel off over two rounds)
    t = pa.table(
        {
            "src": pa.array([1, 2, 3, 3, 4], pa.int64()),
            "dst": pa.array([2, 3, 1, 4, 5], pa.int64()),
        }
    )
    out = kcore(ray.data.from_arrow(t), k=2, rounds=3)
    assert out["node"].to_pylist() == [1, 2, 3]
    assert out["deg"].to_pylist() == [2, 2, 2]
    # degree bar above the max degree peels everything (empty-alive path)
    out4 = kcore(ray.data.from_arrow(t), k=4, rounds=3)
    assert len(out4) == 0


def test_degree_assortativity_known_graphs(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.graph import degree_assortativity

    # star: the hub (deg 4) pairs with leaves (deg 1) at every edge →
    # perfectly disassortative, r = -1
    star = pa.table(
        {
            "src": pa.array([0, 0, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    n, r = degree_assortativity(ray.data.from_arrow(star))
    assert n == 8  # 4 undirected edges × both orientations
    assert r == -1.0

    # cycle: every endpoint has degree 2 → constant x → guarded 0.0
    cyc = pa.table(
        {
            "src": pa.array([1, 2, 3, 4], pa.int64()),
            "dst": pa.array([2, 3, 4, 1], pa.int64()),
        }
    )
    _, r = degree_assortativity(ray.data.from_arrow(cyc))
    assert r == 0.0


def test_pointer_double_resolves_chains():
    """Pointer doubling reaches every chain's terminal in log rounds —
    checked against a per-node iterative walk."""
    import numpy as np

    from dcs_ray.functions.graph import pointer_double

    ids = np.arange(1, 5000)
    src = np.sort(ids[ids % 3 == 0].astype(np.int64))
    out = pointer_double(src, src // 2, 6)

    def walk(d):
        while d % 3 == 0 and d > 0:
            d //= 2
        return d

    assert all(int(o) == walk(int(s)) for s, o in zip(src, out))
    # insufficient rounds stop mid-chain (2 rounds = 4 hops < longest)
    longest = max(src.tolist(), key=lambda s: len(bin(int(s))))
    part = pointer_double(src, src // 2, 1)
    assert any(int(o) != walk(int(s)) for s, o in zip(src, part))
