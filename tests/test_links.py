"""Web link graph: extraction inverts page_links exactly, anchor-term
counts match a brute-force fold, pagerank over the extracted edges is
deterministic and mass-conserving."""

import collections

import pyarrow.parquet as pq

from dcs_ray.functions.links import (
    anchor_term_counts,
    extract_edges_batch,
    extract_link_edges,
    link_pagerank,
)
from dcs_ray.sources.pages import (
    dedup_latest_crawl,
    page_links,
    page_tokens,
    read_pages,
    synthesize_pages_table,
)

SF = "/root/testdata/sf0.001"


def _reference_edges(docs):
    ref = []
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        for t, a in page_links(int(d), page_tokens(text)):
            ref.append((int(d), int(t), a))
    return sorted(ref)


def test_extract_edges_inverts_page_links():
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 200)
    pages = synthesize_pages_table(docs)
    # drop the stale duplicate crawls (older warc_ts) to mirror
    # dedup_latest_crawl without a Ray shuffle in a unit test
    newest = {}
    urls = pages["url"].to_pylist()
    ts = pages["warc_ts"].to_pylist()
    for i, (u, t) in enumerate(zip(urls, ts)):
        if u not in newest or ts[newest[u]] < t:
            newest[u] = i
    latest = pages.take(sorted(newest.values()))
    edges = extract_edges_batch(latest)
    got = sorted(
        zip(
            edges["src"].to_pylist(),
            edges["dst"].to_pylist(),
            edges["anchor"].to_pylist(),
        )
    )
    assert got == _reference_edges(docs)


def test_anchor_term_counts_matches_fold(ray_session):
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 120)
    ref = collections.Counter()
    for _, dst, anchor in _reference_edges(docs):
        for tok in anchor.split(" "):
            ref[(dst, tok)] += 1

    pages = dedup_latest_crawl(
        read_pages(SF).filter(
            lambda r: int(r["url"].rsplit("/", 1)[1]) < 120
        )
    )
    counts = anchor_term_counts(extract_link_edges(pages))
    got = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        for d, t, c in zip(
            b["doc_id"].to_pylist(), b["term"].to_pylist(), b["anchor_tf"].to_pylist()
        ):
            got[(d, t)] = c
    assert got == dict(ref)


def test_link_pagerank_deterministic_and_conserving(ray_session):
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 150)
    pages_tbl = synthesize_pages_table(docs)
    import ray.data

    pages = ray.data.from_arrow(pages_tbl)
    edges = extract_link_edges(dedup_latest_crawl(pages))
    r1 = link_pagerank(edges, n_iter=3)
    r2 = link_pagerank(edges, n_iter=3)
    assert r1.equals(r2)  # bit-identical across runs
    ranks = r1["rank"].to_numpy()
    assert abs(float(ranks.sum()) - 1.0) < 1e-4  # mass conserved
    assert (ranks > 0).all()
    # hubs (low doc_ids are targets of many d//2, d//3 links) outrank leaves
    nodes = r1["node"].to_numpy()
    small = ranks[nodes < 10].mean()
    big = ranks[nodes > 100].mean()
    assert small > big


def test_fused_latest_edges_identical_to_dedup_then_extract(ray_session):
    """extract_link_edges_latest (html never crosses the exchange) ==
    extract_link_edges(dedup_latest_crawl(pages)) row-for-row, and a
    newest snapshot with NO links suppresses a stale one that had some."""
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import extract_link_edges_latest

    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 200)
    pages_tbl = synthesize_pages_table(docs)
    pages = ray.data.from_arrow(pages_tbl)

    def rows(ds):
        out = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            out += list(
                zip(b["src"].to_pylist(), b["dst"].to_pylist(), b["anchor"].to_pylist())
            )
        return sorted(out)

    want = rows(extract_link_edges(dedup_latest_crawl(pages)))
    got = rows(extract_link_edges_latest(pages, n_buckets=7))
    assert got == want and len(got) > 0

    # newest snapshot empty-nav: its staleness must win (no edges emitted)
    two = pa.table(
        {
            "url": ["https://x.example.org/doc/00000003"] * 2,
            "warc_ts": pa.array([1000, 2000], pa.timestamp("s")),
            "html": [
                b'<html><body><nav><a href="/doc/00000001">old link</a></nav></body></html>',
                b"<html><body><nav></nav></body></html>",
            ],
        }
    )
    got2 = rows(extract_link_edges_latest(ray.data.from_arrow(two), n_buckets=3))
    assert got2 == []


def test_link_hits_matches_local_reference(ray_session):
    """Distributed HITS == a local numpy fold of the same iterations
    (known tiny graph), deterministic across runs, L1-normalized."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import link_hits

    # star-ish graph: 0..4 all point at 5; 5 points at 6 and 7; dup edge
    srcs = [0, 1, 2, 3, 4, 5, 5, 0]
    dsts = [5, 5, 5, 5, 5, 6, 7, 5]  # (0→5) duplicated: counts twice
    edges_tbl = pa.table(
        {
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(dsts, pa.int64()),
            "anchor": pa.array(["x"] * len(srcs)),
        }
    )
    edges = ray.data.from_arrow(edges_tbl)
    got = link_hits(edges, n_iter=4)
    again = link_hits(edges, n_iter=4)
    assert got.equals(again)

    nodes = sorted(set(srcs) | set(dsts))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    a = np.full(n, 1.0 / n)
    h = np.full(n, 1.0 / n)
    for _ in range(4):
        na = np.zeros(n)
        for s, d in zip(srcs, dsts):
            na[idx[d]] += h[idx[s]]
        a = na / na.sum() if na.sum() > 0 else na
        nh = np.zeros(n)
        for s, d in zip(srcs, dsts):
            nh[idx[s]] += a[idx[d]]
        h = nh / nh.sum() if nh.sum() > 0 else nh

    assert got["node"].to_pylist() == nodes
    np.testing.assert_allclose(got["authority"].to_numpy(), np.round(a, 6), atol=1e-6)
    np.testing.assert_allclose(got["hub"].to_numpy(), np.round(h, 6), atol=1e-6)
    # node 5 is the authority; node 0 (dup out-edge) is the top hub
    assert got["authority"].to_numpy().argmax() == idx[5]
    assert got["hub"].to_numpy().argmax() == idx[0]


def test_copair_counts_matches_bruteforce(ray_session):
    """Bucketed vectorized pair generation == itertools brute force,
    incl. duplicate-edge multiplicity; max_degree truncates groups."""
    import itertools

    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import cocitation_counts, coupling_counts

    srcs = [0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 0]
    dsts = [5, 6, 7, 5, 6, 5, 6, 7, 7, 9, 5]  # (0→5) twice, (2→7) twice
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(srcs, pa.int64()),
                "dst": pa.array(dsts, pa.int64()),
                "anchor": pa.array(["x"] * len(srcs)),
            }
        )
    )

    def brute(group_of, val_of):
        ref = collections.Counter()
        by_g = collections.defaultdict(list)
        for s, d in zip(srcs, dsts):
            by_g[group_of(s, d)].append(val_of(s, d))
        for vals in by_g.values():
            for a, b in itertools.combinations(vals, 2):
                if a != b:
                    ref[(min(a, b), max(a, b))] += 1
        return dict(ref)

    def fold(ds):
        got = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            for a, bb, n in zip(
                b["id_a"].to_pylist(), b["id_b"].to_pylist(), b["n_shared"].to_pylist()
            ):
                assert (a, bb) not in got
                got[(a, bb)] = n
        return got

    assert fold(cocitation_counts(edges)) == brute(lambda s, d: s, lambda s, d: d)
    assert fold(coupling_counts(edges)) == brute(lambda s, d: d, lambda s, d: s)

    # max_degree keeps the smallest pair-values per group, deterministic
    capped = fold(cocitation_counts(edges, max_degree=2))
    want = {}
    by_s = collections.defaultdict(list)
    for s, d in zip(srcs, dsts):
        by_s[s].append(d)
    for vals in by_s.values():
        kept = sorted(vals)[:2]
        for a, b in itertools.combinations(kept, 2):
            if a != b:
                want[(min(a, b), max(a, b))] = want.get((min(a, b), max(a, b)), 0) + 1
    assert capped == want


def test_anchor_pseudo_docs_vectorized_concat(ray_session):
    """Bucketed vectorized group-concat == per-target reference fold
    (anchors sorted lexicographically within a target)."""
    import ray.data
    from dcs_ray.functions.links import anchor_pseudo_docs

    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 150)
    ref = {}
    for src, dst, anchor in _reference_edges(docs):
        ref.setdefault(dst, []).append(anchor)
    want = {d: " ".join(sorted(a)) for d, a in ref.items()}

    pages = ray.data.from_arrow(synthesize_pages_table(docs))
    edges = extract_link_edges(dedup_latest_crawl(pages))
    out = anchor_pseudo_docs(edges, n_buckets=7)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            assert d not in got  # exactly one pseudo-doc per target
            got[d] = t
    assert got == want


def test_fielded_search_matches_bruteforce(ray_session):
    """search_bm25_fielded's range-refined work units are exact even
    though the body and anchor indexes shard at different boundaries:
    every doc's combined score equals the global brute-force fold."""
    import collections

    import __ray_entry__ as E
    from dcs_ray.search import (
        _open,
        load_stats,
        plan_queries,
        score_shard_all,
        search_bm25_fielded,
        shard_id_bounds,
        shard_paths,
    )

    body = E._index_dir(SF, "words")
    anchor = E._anchor_index_dir(SF)
    # metadata-only bounds == the mmap-loaded segment's actual bounds
    for p in shard_paths(body) + shard_paths(anchor):
        seg = _open(p)
        assert shard_id_bounds(p) == (int(seg.doc_ids[0]), int(seg.doc_ids[-1]))

    total = collections.defaultdict(float)
    for w, idx in ((1.0, body), (0.5, anchor)):
        st = load_stats(idx)
        plan = plan_queries(idx, [E.BM25_QUERY], st)[0]
        for sp in shard_paths(idx):
            d, s = score_shard_all(_open(sp), plan, st)
            for dd, ss in zip(d, s):
                total[int(dd)] += w * float(ss)
    want = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:25]

    got = search_bm25_fielded(body, anchor, [E.BM25_QUERY], k=25, anchor_weight=0.5)
    got_pairs = list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist()))
    assert len(got_pairs) == len(want)
    for (gd, gs), (wd, ws) in zip(got_pairs, want):
        assert gd == wd
        assert abs(gs - ws) < 1e-12


def test_fielded_service_identical_to_dataset_path(ray_session):
    """FieldedSearchService returns the SAME table as
    search_bm25_fielded, and repeated queries hit the result cache."""
    import __ray_entry__ as E
    from dcs_ray.search import search_bm25_fielded
    from dcs_ray.service import fielded_search_service

    body = E._index_dir(SF, "words")
    anchor = E._anchor_index_dir(SF)
    want = search_bm25_fielded(body, anchor, [E.BM25_QUERY, "customer batch"], k=7)
    with fielded_search_service(body, anchor) as svc:
        got = svc.search([E.BM25_QUERY, "customer batch"], k=7)
        assert got.equals(want)
        again = svc.search([E.BM25_QUERY, "customer batch"], k=7)
        assert again.equals(want)
        info = svc.cache_info()
        assert info["hits"] == 2 and info["misses"] == 2


def test_extract_handles_empty_nav():
    import pyarrow as pa

    batch = pa.table(
        {
            "url": ["https://x.example.org/doc/00000007"],
            "html": [b"<html><head><title>doc 7</title></head><body><nav></nav><p></p></body></html>"],
        }
    )
    edges = extract_edges_batch(batch)
    assert len(edges) == 0


def test_host_rank_mass_broadcast_fold():
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import host_rank_mass

    ranks = pa.table(
        {
            "node": pa.array([1, 2, 3, 99], pa.int64()),  # 99: no doc row
            "rank": pa.array([0.25, 0.125, 0.5, 0.125], pa.float64()),
        }
    )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),  # 4: not in graph
                "host": pa.array(["a.org", "a.org", "b.org", "b.org"], pa.string()),
            }
        )
    ).repartition(2)
    out = pa.concat_tables(
        pa.table(b)
        for b in host_rank_mass(ranks, docs).iter_batches(batch_format="pyarrow")
    ).sort_by("host")
    assert out.column_names == ["host", "n_docs", "rank_mass_e6"]
    assert out["host"].to_pylist() == ["a.org", "b.org"]
    assert out["n_docs"].to_pylist() == [2, 2]
    # a: 0.25+0.125 = 0.375e6; b: 0.5 + 0 (doc 4 not a node) = 0.5e6
    assert out["rank_mass_e6"].to_pylist() == [375000, 500000]


def test_link_degree_stats_left_join_zeros(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import link_degree_stats

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 2, 2, 2, 7], pa.int64()),
                "dst": pa.array([2, 3, 3, 3, 1, 7], pa.int64()),
                "anchor": pa.array(["a"] * 6, pa.string()),
            }
        )
    )
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64())})
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in link_degree_stats(edges, docs).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert t["doc_id"].to_pylist() == [1, 2, 3, 4]
    assert t["out_links"].to_pylist() == [2, 3, 0, 0]  # doc 4 outside graph
    assert t["in_links"].to_pylist() == [1, 1, 3, 0]
    assert t.schema.field("out_links").type == pa.int64()


def test_coupling_jaccard_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.links import coupling_jaccard_topk

    rng = np.random.default_rng(21)
    src = rng.integers(0, 12, 120)
    dst = rng.integers(100, 130, 120)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "anchor": pa.array([""] * len(src), pa.string()),
            }
        )
    ).repartition(4)
    got = coupling_jaccard_topk(edges, k=10)
    out_sets = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        out_sets.setdefault(s, set()).add(d)
    rows = []
    keys = sorted(out_sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            sh = len(out_sets[a] & out_sets[b])
            if sh:
                j = sh / (len(out_sets[a]) + len(out_sets[b]) - sh)
                rows.append((-j, a, b, sh))
    rows.sort()
    want = [(a, b, sh, round(-nj, 6)) for nj, a, b, sh in rows[:10]]
    gotl = list(
        zip(
            got["id_a"].to_pylist(),
            got["id_b"].to_pylist(),
            got["n_shared"].to_pylist(),
            got["jaccard"].to_pylist(),
        )
    )
    assert gotl == want


def test_opic_cash_conservation_and_symmetry(ray_session):
    """OPIC invariants on a hand graph: importances sum to 1 (cash is
    conserved every step), a symmetric 2-cycle splits evenly, and a
    dangling node receives only the uniform virtual-page share."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.graph import opic

    # 1↔2 cycle plus a dangling node 3 fed by 1
    edges = pa.table(
        {
            "src": pa.array([1, 2, 1], pa.int64()),
            "dst": pa.array([2, 1, 3], pa.int64()),
        }
    )
    t = opic(ray.data.from_arrow(edges), n_iter=4, src="src", dst="dst")
    imp = dict(zip(t["node"].to_pylist(), t["importance"].to_pylist()))
    assert abs(sum(imp.values()) - 1.0) < 1e-5
    # 2 and 3 have IDENTICAL inflow (half of 1's cash + the uniform
    # dangling share each) → equal importance; 1 receives ALL of 2's
    # cash, so it dominates both
    assert imp[2] == imp[3]
    assert imp[1] > imp[2]
