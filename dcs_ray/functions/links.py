"""Web link-graph extraction: pages → (src, dst, anchor) edges.

The web-scale signal chain dcs approximates with its hand-maintained
package priors (``ranking/pre-ranking.go:54-103``): a real web index
derives its static rank from the LINK GRAPH and its strongest text
signal from ANCHOR TEXT (the linker's description of the target —
Brin & Page '98; Craswell et al. '01). This module extracts both from
the pages source with pure Arrow kernels:

- ``extract_link_edges``: html → one row per ``<a href>`` with the
  resolved target doc_id and the anchor string. Fully vectorized:
  one ``extract_regex`` for the nav block, one ``split_pattern`` into a
  list array, ``list_parent_indices`` to carry the source id through
  the flatten — no per-row Python.
- ``anchor_term_counts``: anchors tokenized (split) and counted per
  (target doc, term) with map-side combining — the anchor-text field
  of a web index, ready to merge into BM25 as an extra field.
- ``link_pagerank``: PageRank over the extracted graph (reuses
  ``functions.graph.pagerank``'s broadcast-vector/streaming-edges
  shape) — the computed static prior for F7/J6 pre-ranking.

Scale: edges are ~LINKS_PER_DOC × corpus and never hold text beyond
the (short) anchor; the only exchanges are the anchor-count groupby
(combiner-first, so the shuffle is |distinct (doc,term)| not |edges|)
and pagerank's node-sized vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.functions.relational import combiner_groupby

EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("anchor", pa.string())]
)


def extract_edges_batch(batch: pa.Table) -> pa.Table:
    """One pages batch → link edges. Anchors contain only tokenizer
    alphabet + spaces (the body escapes ``<``/``&``), so the regexes
    are unambiguous."""
    html = batch["html"].cast(pa.string())
    src = pc.struct_field(
        pc.extract_regex(batch["url"], r"/doc/(?P<d>\d+)$"), "d"
    ).cast(pa.int64())
    nav = pc.struct_field(pc.extract_regex(html, r"<nav>(?P<n>.*?)</nav>"), "n")
    pieces = pc.split_pattern(nav, "</a>").combine_chunks()
    parent = pc.list_parent_indices(pieces)
    flat = pieces.flatten()
    ex = pc.extract_regex(flat, r'<a href="/doc/(?P<t>\d+)">(?P<a>.*)$')
    ok = ex.is_valid()
    return pa.table(
        {
            "src": pc.take(src, parent).filter(ok),
            "dst": pc.struct_field(ex, "t").cast(pa.int64()).filter(ok),
            "anchor": pc.struct_field(ex, "a").filter(ok),
        }
    )


def extract_link_edges(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Pages Dataset → edge Dataset ``(src, dst, anchor)``, streaming."""
    return pages.map_batches(extract_edges_batch, batch_format="pyarrow")


def extract_link_edges_latest(
    pages: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Edges of each url's NEWEST crawl snapshot, without ever moving
    html through an exchange: edge extraction runs per batch BEFORE the
    newest-wins shuffle, so the all-to-all carries (src, ts, dst,
    anchor) edge rows plus ONE zero-link presence row per snapshot
    (``dst = -1`` sentinel, so a newest snapshot with no links still
    outranks a stale one that had links) — never the page body. At
    corpus scale this shrinks the shuffle from |html| to |edges|.

    Result is identical to
    ``extract_link_edges(dedup_latest_crawl(pages))`` whenever snapshot
    timestamps are unique per url (the crawl contract; on a tie both
    snapshots' edges survive here where ``dedup_latest_crawl`` keeps
    one arbitrary winner)."""

    def edges_with_ts(b: pa.Table) -> pa.Table:
        html = b["html"].cast(pa.string())
        src = pc.struct_field(
            pc.extract_regex(b["url"], r"/doc/(?P<d>\d+)$"), "d"
        ).cast(pa.int64())
        ts = b["warc_ts"].cast(pa.int64())
        nav = pc.struct_field(pc.extract_regex(html, r"<nav>(?P<n>.*?)</nav>"), "n")
        pieces = pc.split_pattern(nav, "</a>").combine_chunks()
        parent = pc.list_parent_indices(pieces)
        flat = pieces.flatten()
        ex = pc.extract_regex(flat, r'<a href="/doc/(?P<t>\d+)">(?P<a>.*)$')
        ok = ex.is_valid()
        src_np = src.to_numpy(zero_copy_only=False)
        e_src = pc.take(src, parent).filter(ok).to_numpy(zero_copy_only=False)
        e_ts = pc.take(ts, parent).filter(ok).to_numpy(zero_copy_only=False)
        e_dst = (
            pc.struct_field(ex, "t").cast(pa.int64()).filter(ok)
            .to_numpy(zero_copy_only=False)
        )
        e_anchor = pc.struct_field(ex, "a").filter(ok)
        n_pages = len(b)
        return pa.table(
            {
                "src": pa.array(np.concatenate([e_src, src_np]), pa.int64()),
                "ts": pa.array(
                    np.concatenate(
                        [e_ts, ts.to_numpy(zero_copy_only=False).astype(np.int64)]
                    ),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([e_dst, np.full(n_pages, -1, np.int64)]),
                    pa.int64(),
                ),
                "anchor": pa.concat_arrays(
                    [
                        e_anchor.combine_chunks()
                        if isinstance(e_anchor, pa.ChunkedArray)
                        else e_anchor,
                        pa.array([""] * n_pages, pa.string()),
                    ]
                ),
                "_bucket": pa.array(
                    np.concatenate([e_src, src_np]) % np.int64(n_buckets), pa.int64()
                ),
            }
        )

    def newest_edges(g: pa.Table) -> pa.Table:
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        u, inv = np.unique(src, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        keep = (ts == mx[inv]) & (dst >= 0)
        return g.filter(pa.array(keep)).drop_columns(["ts", "_bucket"])

    return (
        pages.map_batches(edges_with_ts, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(newest_edges, batch_format="pyarrow")
    )


def anchor_term_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Edges → ``(doc_id, term, anchor_tf)``: how often each term
    appears in anchors POINTING AT each doc — the anchor-text index
    field. Map-side combined; the shuffle carries one row per distinct
    (doc, term) per block, never the raw edges."""

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["anchor"], " ").combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "")
        return pa.table(
            {
                "doc_id": pc.take(b["dst"].combine_chunks(), parent).filter(nonempty),
                "term": flat.filter(nonempty),
            }
        )

    exploded = edges.map_batches(explode, batch_format="pyarrow")
    return combiner_groupby(exploded, ["doc_id", "term"], [], count_col="anchor_tf")


def anchor_pseudo_docs(
    edges: ray.data.Dataset, n_buckets: int = 128
) -> ray.data.Dataset:
    """One pseudo-doc per link TARGET: ``(doc_id, text)`` where text is
    every anchor pointing at it, joined with spaces — the buildable
    anchor field of a web index (feed straight into ``build_index``).

    Bucketed vectorized group-concat (the paragraph-dedup pattern,
    ``lines.py``): one group per hash BUCKET of targets — bounded group
    count — not one Python call per target; inside a bucket a single
    lexsort + run-length offsets + ``pc.binary_join`` assembles every
    target's anchor list at once. Anchors sort (anchor, then stable by
    arrival) within a target so the pseudo-doc bytes are deterministic
    at any parallelism (bag-of-words scoring is order-free either way)."""

    def with_bucket(b: pa.Table) -> pa.Table:
        dst = b["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "dst": b["dst"],
                "anchor": b["anchor"],
                "bucket": pa.array(dst % np.int64(n_buckets), pa.int64()),
            }
        )

    def concat_bucket(g: pa.Table) -> pa.Table:
        dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        anchors = g["anchor"].combine_chunks()
        # deterministic order: (dst, anchor); np.lexsort on the anchor
        # dictionary codes keeps it vectorized
        codes = pc.dictionary_encode(anchors)
        a_idx = codes.indices.to_numpy(zero_copy_only=False)
        rank = pc.sort_indices(codes.dictionary).to_numpy(zero_copy_only=False)
        a_rank = np.empty(len(rank), np.int64)
        a_rank[rank] = np.arange(len(rank))
        order = np.lexsort((a_rank[a_idx], dst))
        dst_s = dst[order]
        runs = np.concatenate(([0], np.flatnonzero(dst_s[1:] != dst_s[:-1]) + 1))
        offsets = np.concatenate((runs, [len(dst_s)])).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets), anchors.take(pa.array(order))
        )
        return pa.table(
            {
                "doc_id": pa.array(dst_s[runs], pa.int64()),
                "text": pc.binary_join(lst, " "),
            }
        )

    return (
        edges.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(concat_bucket, batch_format="pyarrow")
    )


def link_pagerank(
    edges: ray.data.Dataset,
    n_iter: int = 5,
    damping: float = 0.85,
    seeds: list[int] | None = None,
) -> pa.Table:
    """PageRank over the extracted web graph → (node, rank). With
    ``seeds``, personalized PageRank (teleport onto the seed pages) —
    the query-dependent "related pages" signal (Haveliwala '02)."""
    from dcs_ray.functions.graph import pagerank

    return pagerank(
        edges.select_columns(["src", "dst"]), n_iter=n_iter, damping=damping,
        src="src", dst="dst", seeds=seeds,
    )


def copair_counts(
    edges: ray.data.Dataset,
    group_col: str,
    pair_col: str,
    n_buckets: int = 64,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Count pairs of ``pair_col`` values that share a ``group_col``
    value → Dataset ``(id_a, id_b, n_shared)`` with ``id_a < id_b`` —
    the kernel behind co-citation (pages cited TOGETHER, group=src) and
    bibliographic coupling (pages citing the SAME target, group=dst).

    Scale shape: one groupby on a hash BUCKET of the group key (bounded
    group count); inside a bucket a single lexsort + run-length offsets
    generate every within-group pair vectorized (offset arithmetic, no
    per-group Python), pre-collapsed to per-bucket partial counts; a
    combiner groupby on (id_a, id_b) folds partials. Pair volume is
    Σ deg·(deg−1)/2 — bounded when degrees are (web-typically) capped;
    ``max_degree`` truncates monster groups (keeping the smallest
    ``pair_col`` values, deterministic) and logs how many were cut.
    Duplicate edges pair multiply (matches the SQL self-join oracle);
    equal-value pairs (duplicate edge to the same target) are dropped.
    """
    import logging

    def with_bucket(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "g": pa.array(g, pa.int64()),
                "v": b[pair_col].cast(pa.int64()),
                "_bucket": pa.array(g % np.int64(n_buckets), pa.int64()),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        g = t["g"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        runs = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        lens = np.diff(np.concatenate((runs, [len(g)])))
        if max_degree is not None and (lens > max_degree).any():
            n_cut = int((lens > max_degree).sum())
            logging.getLogger(__name__).warning(
                "copair_counts: truncating %d groups past max_degree=%d",
                n_cut,
                max_degree,
            )
            keep = np.ones(len(g), bool)
            start_of = np.repeat(runs, lens)
            keep[np.arange(len(g)) - start_of >= max_degree] = False
            g, v = g[keep], v[keep]
            runs = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
            lens = np.diff(np.concatenate((runs, [len(g)])))
        # element i pairs with every earlier element of its own run
        start_of = np.repeat(runs, lens)
        within = np.arange(len(g)) - start_of  # 0..len(run)-1
        right = np.repeat(np.arange(len(g)), within)
        pair_start = np.repeat(start_of, within)
        csum = np.cumsum(within) - within
        left = pair_start + (np.arange(within.sum()) - np.repeat(csum, within))
        a, b = v[left], v[right]  # sorted within run → a <= b
        ok = a != b
        a, b = a[ok], b[ok]
        # collapse to per-bucket partial counts (full-int64-safe: sorted
        # run-length, no key packing — doc ids exceed 2^32 at web scale)
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))) if len(
            a
        ) else np.empty(0, bool)
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a)))
        return pa.table(
            {
                "id_a": pa.array(a[starts], pa.int64()),
                "id_b": pa.array(b[starts], pa.int64()),
                "n_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    bucketed = (
        edges.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    summed = combiner_groupby(bucketed, ["id_a", "id_b"], ["n_partial"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "n_shared": b["n_partial"]}
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def cocitation_counts(
    edges: ray.data.Dataset, max_degree: int | None = None
) -> ray.data.Dataset:
    """Co-citation (Small '73): how many pages link to BOTH a and b —
    the 'related pages' similarity of the web graph."""
    return copair_counts(edges, "src", "dst", max_degree=max_degree)


def coupling_counts(
    edges: ray.data.Dataset, max_degree: int | None = None
) -> ray.data.Dataset:
    """Bibliographic coupling (Kessler '63): how many targets a and b
    BOTH link to — similarity between citing pages."""
    return copair_counts(edges, "dst", "src", max_degree=max_degree)


def link_hits(edges: ray.data.Dataset, n_iter: int = 5) -> pa.Table:
    """HITS hubs/authorities over the extracted web graph →
    (node, authority, hub) — the query-independent companion signal to
    :func:`link_pagerank` (Kleinberg '99)."""
    from dcs_ray.functions.graph import hits

    return hits(
        edges.select_columns(["src", "dst"]), n_iter=n_iter, src="src", dst="dst"
    )


def link_degree_stats(
    edges: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc link-degree ranking features → ``(doc_id, out_links,
    in_links)`` with LEFT-JOIN semantics (docs outside the graph get
    zeros) — the first-order static link signals every web ranker keeps
    next to PageRank (in-degree ≈ naive popularity, out-degree feeds
    hub/spam heuristics).

    Scale shape: out/in degree vectors are node-sized — folded from
    per-block partial counts on the driver (the
    :func:`~dcs_ray.functions.graph.pagerank` vertex-state-fits
    regime), broadcast ONCE via ``ray.put``, probed per docs batch with
    searchsorted. Docs stream; no shuffle at all."""

    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        t = b["dst"].to_numpy().astype(np.int64)
        us, cs = np.unique(s, return_counts=True)
        ut, ct = np.unique(t, return_counts=True)
        return pa.table(
            {
                "node": pa.array(np.concatenate([us, ut]), pa.int64()),
                "o": pa.array(
                    np.concatenate([cs, np.zeros(len(ut), np.int64)]), pa.int64()
                ),
                "i": pa.array(
                    np.concatenate([np.zeros(len(us), np.int64), ct]), pa.int64()
                ),
            }
        )

    hs, os_, is_ = [], [], []
    for b in edges.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["node"].to_numpy(zero_copy_only=False))
        os_.append(b["o"].to_numpy(zero_copy_only=False))
        is_.append(b["i"].to_numpy(zero_copy_only=False))
    if hs:
        alln = np.concatenate(hs)
        nodes, inv = np.unique(alln, return_inverse=True)
        outd = np.zeros(len(nodes), np.int64)
        ind = np.zeros(len(nodes), np.int64)
        np.add.at(outd, inv, np.concatenate(os_))
        np.add.at(ind, inv, np.concatenate(is_))
    else:
        nodes = np.empty(0, np.int64)
        outd = ind = np.empty(0, np.int64)
    ref = ray.put((nodes, outd, ind))

    def probe(b: pa.Table, _r=ref) -> pa.Table:
        nd, od, idg = ray.get(_r)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nd) == 0:
            o = i = np.zeros(len(ids), np.int64)
        else:
            idx = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            hit = nd[idx] == ids
            o = np.where(hit, od[idx], np.int64(0))
            i = np.where(hit, idg[idx], np.int64(0))
        return pa.table(
            {
                id_col: b[id_col],
                "out_links": pa.array(o, pa.int64()),
                "in_links": pa.array(i, pa.int64()),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


def host_link_graph(
    edges: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    host_col: str = "host",
) -> ray.data.Dataset:
    """Roll the page-level link graph up to host level →
    ``(src_host, dst_host, n_links)`` — the site-graph every web ranker
    keeps next to the page graph (host-level authority flow, spam-farm
    neighborhoods, crawl-budget planning).

    Scale shape: the doc→host mapping is CORPUS-sized, so both hops are
    hash-partitioned big⋈big joins (``relational.shuffle_join``), never
    a broadcast; the host-pair count then folds with map-side combining
    (|host pairs| exchange). INNER semantics: edges whose endpoint has
    no doc row (synthetic targets past the corpus edge) drop, matching
    the SQL join oracle."""
    from dcs_ray.functions.relational import combiner_groupby, shuffle_join

    e = edges.select_columns(["src", "dst"])
    d = docs.select_columns([id_col, host_col])
    j1 = shuffle_join(
        e,
        d.map_batches(
            lambda b: pa.table({"src": b[id_col], "src_host": b[host_col]}),
            batch_format="pyarrow",
        ),
        on="src",
    )
    j2 = shuffle_join(
        j1,
        d.map_batches(
            lambda b: pa.table({"dst": b[id_col], "dst_host": b[host_col]}),
            batch_format="pyarrow",
        ),
        on="dst",
    )
    agg = combiner_groupby(
        j2.select_columns(["src_host", "dst_host"]),
        ["src_host", "dst_host"],
        [],
        count_col="n_links",
    )
    return agg.map_batches(
        lambda b: b.select(["src_host", "dst_host", "n_links"]),
        batch_format="pyarrow",
    )


def host_rank_mass(
    ranks: pa.Table,
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    host_col: str = "host",
) -> ray.data.Dataset:
    """Site-level authority: fold per-page PageRank into per-host rank
    mass → (host, n_docs, rank_mass_e6) — the host/domain aggregation
    every web ranker keeps alongside page rank (site quality priors,
    spam-host triage).

    Scale shape: the (node, rank) vector is broadcast ONCE via
    ``ray.put`` (the same vertex-state-fits regime as
    :func:`~dcs_ray.functions.graph.pagerank` itself) and probed per
    batch with searchsorted; docs stream; the exchange is
    |hosts|-bounded combiner partials. Rank is carried as exact integer
    micro-units (``rint(round(rank,6)·1e6)``) so the fold is
    order-independent and bit-exact under any parallelism — and
    SQL-replayable. Docs not in the graph (no out/in links) count in
    ``n_docs`` with zero mass (SQL LEFT JOIN semantics); graph nodes
    with no doc row (synthetic link targets) contribute nothing."""
    nodes = ranks["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    r_e6 = np.rint(
        ranks["rank"].to_numpy(zero_copy_only=False) * 1e6
    ).astype(np.int64)
    ref = ray.put((nodes, r_e6))

    def partial(b: pa.Table) -> pa.Table:
        nd, re6 = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nd) == 0:
            mass = np.zeros(len(ids), np.int64)
        else:
            idx = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            mass = np.where(nd[idx] == ids, re6[idx], np.int64(0))
        return pa.table(
            {
                "host": b[host_col],
                "rank_mass_e6": pa.array(mass, pa.int64()),
            }
        )

    agg = combiner_groupby(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        ["rank_mass_e6"],
        count_col="n_docs",
    )
    return agg.map_batches(
        lambda b: b.select(["host", "n_docs", "rank_mass_e6"]),
        batch_format="pyarrow",
    )


def coupling_jaccard_topk(
    edges: ray.data.Dataset, k: int = 20, max_degree: int | None = None
) -> pa.Table:
    """Outlink-profile similarity: Jaccard of two pages' target sets,
    ``J(a,b) = shared / (deg(a) + deg(b) − shared)``, top-``k`` pairs
    by (J desc, id_a, id_b) — bibliographic coupling normalized by
    degree, the web-graph "pages like this" signal that doesn't favor
    mega-hubs the raw shared count favors.

    Scale shape: shared counts come from the bucketed
    :func:`coupling_counts` pipeline over DISTINCT edges; distinct
    out-degrees are a node-sized driver fold broadcast once; each
    block emits its local top-``k`` so the driver merges |blocks|·k
    rows. J is one division of integers — bit-exact vs the SQL."""
    import ray as _ray

    dedup = (
        edges.select_columns(["src", "dst"])
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )

    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        us, cs = np.unique(s, return_counts=True)
        return pa.table(
            {"node": pa.array(us, pa.int64()), "d": pa.array(cs, pa.int64())}
        )

    hs, cs_ = [], []
    for b in dedup.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hs.append(b["node"].to_numpy(zero_copy_only=False))
        cs_.append(b["d"].to_numpy(zero_copy_only=False))
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if not hs:
        return empty
    alln = np.concatenate(hs)
    nodes, inv = np.unique(alln, return_inverse=True)
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, inv, np.concatenate(cs_))
    ref = _ray.put((nodes, deg))

    counts = coupling_counts(dedup, max_degree=max_degree)
    order_keys = [
        ("jaccard", "descending"),
        ("id_a", "ascending"),
        ("id_b", "ascending"),
    ]

    def local_top(b: pa.Table, _r=ref) -> pa.Table:
        nd, dg = _ray.get(_r)
        a = b["id_a"].to_numpy().astype(np.int64)
        c = b["id_b"].to_numpy().astype(np.int64)
        s = b["n_shared"].to_numpy().astype(np.int64)
        da = dg[np.searchsorted(nd, a)]
        db = dg[np.searchsorted(nd, c)]
        j = s / (da + db - s)
        t = pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(c, pa.int64()),
                "n_shared": pa.array(s, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        )
        return t.sort_by(order_keys).slice(0, k)

    parts = [
        pa.table(b)
        for b in counts.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).sort_by(order_keys).slice(0, k)
    return merged.set_column(
        3,
        "jaccard",
        pa.array(
            np.round(merged["jaccard"].to_numpy(zero_copy_only=False), 6),
            pa.float64(),
        ),
    )

def adamic_adar_topk(
    edges: ray.data.Dataset, k: int = 20, n_buckets: int = 64
) -> pa.Table:
    """Adamic–Adar co-citation similarity (Adamic & Adar '03): for pages
    a, b linked together by common sources, ``AA(a,b) = Σ_s 1/ln(outdeg
    s)`` over shared sources s — the classic link-prediction score that
    down-weights promiscuous hubs. Top-``k`` pairs by (round(AA, 6)
    desc, id_a, id_b); the rounded-score ordering is what the SQL
    oracle replays.

    Scale shape: one groupby on a hash bucket of the SOURCE (a source's
    edges land in one bucket, so its distinct out-degree — the weight —
    is computable in-bucket with zero extra exchange); within a bucket
    a lexsort + run-length pass dedups edges, derives 1/ln(deg) per
    run, and emits per-bucket partial pair weights; a combiner groupby
    folds partials; each block then contributes a local top-``k`` so
    the driver merges |blocks|·k rows, never the pair volume."""

    def with_bucket(b: pa.Table) -> pa.Table:
        g = b["src"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "g": pa.array(g, pa.int64()),
                "v": b["dst"].cast(pa.int64()),
                "_bucket": pa.array(g % np.int64(n_buckets), pa.int64()),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        g = t["g"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        if len(g):
            keep = np.empty(len(g), bool)
            keep[0] = True
            keep[1:] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
            g, v = g[keep], v[keep]
        runs = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        lens = np.diff(np.concatenate((runs, [len(g)])))
        # AA weight of every pair from a run of distinct degree d ≥ 2
        w_run = np.where(lens > 1, 1.0 / np.log(np.maximum(lens, 2)), 0.0)
        start_of = np.repeat(runs, lens)
        within = np.arange(len(g)) - start_of
        right = np.repeat(np.arange(len(g)), within)
        pair_start = np.repeat(start_of, within)
        csum = np.cumsum(within) - within
        left = pair_start + (np.arange(within.sum()) - np.repeat(csum, within))
        a, b = v[left], v[right]  # distinct + sorted within run → a < b
        w = np.repeat(w_run, lens)[right]
        po = np.lexsort((b, a))
        a, b, w = a[po], b[po], w[po]
        new = (
            np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            if len(a)
            else np.empty(0, bool)
        )
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(w, starts) if len(starts) else np.empty(0, np.float64)
        return pa.table(
            {
                "id_a": pa.array(a[starts], pa.int64()),
                "id_b": pa.array(b[starts], pa.int64()),
                "aa_partial": pa.array(sums, pa.float64()),
            }
        )

    bucketed = (
        edges.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    summed = combiner_groupby(bucketed, ["id_a", "id_b"], ["aa_partial"])

    def local_top(b: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "aa_score": pa.array(
                    np.round(b["aa_partial"].to_numpy(zero_copy_only=False), 6) + 0.0,
                    pa.float64(),
                ),
            }
        )
        return out.sort_by(
            [("aa_score", "descending"), ("id_a", "ascending"), ("id_b", "ascending")]
        ).slice(0, k)

    parts = [
        pa.table(b)
        for b in summed.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "aa_score": pa.array([], pa.float64()),
        }
    )
    merged = pa.concat_tables(parts) if parts else empty
    return merged.sort_by(
        [("aa_score", "descending"), ("id_a", "ascending"), ("id_b", "ascending")]
    ).slice(0, k)
