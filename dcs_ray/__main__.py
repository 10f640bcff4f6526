"""CLI — the debug/inspection surface of the engine, mirroring the dcs
swiss-army binary (``cmd/dcs/dcs.go:18-161``: create, merge, du, docids,
trigram, posting, matches, search, replay).

Usage: ``python -m dcs_ray <subcommand> ...``. Owns its Ray session
(guarded init; the library itself never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray():
    import ray

    # large numpy temporaries on the warm heap, not fresh mmaps —
    # counters the host's first-touch fault throttling (BASELINE.md
    # fourth axis) and is harmless elsewhere; must precede ray.init so
    # workers inherit it
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    if not ray.is_initialized():
        # honor RAY_ADDRESS so `ray job submit` runs connect to the
        # submitting cluster; a bare/local address starts a local
        # instance sized by RAY_GRAFT_CPUS (the sandbox default)
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            kwargs = {"num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "8"))}
        else:
            # cluster driver (the `ray job submit` shape): ship this
            # package to the workers, same as --working-dir would
            pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            kwargs = {"runtime_env": {"env_vars": {"PYTHONPATH": pkg_parent}}}
        ray.init(
            address=addr,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def read_parquet_sized(*a, **kw):
    from dcs_ray.sources.io import read_parquet_sized as _r

    return _r(*a, **kw)


def cmd_create(args) -> None:
    ray = _ray()
    import ray.data

    from dcs_ray.index import IndexConfig, build_index

    docs = read_parquet_sized(args.input)
    conf = IndexConfig(
        num_partitions=args.partitions,
        num_shards=args.shards,
        mode=args.mode,
        id_col=args.id_col,
        url_col=args.url_col,
        dedup_latest=args.dedup_latest,
        positional=args.positional,
    )
    manifest = build_index(docs, args.out, conf)
    print(json.dumps({"n_docs": manifest["stats"]["n_docs"],
                      "n_terms": manifest["stats"]["n_terms"],
                      "shards": len(manifest["shards"])}))


def cmd_du(args) -> None:
    """Index size accounting (``cmd/dcs/du.go``)."""
    from dcs_ray.index.build import load_manifest

    manifest = load_manifest(args.index)
    rows = []
    for root in ("segments", "shards"):
        d = os.path.join(args.index, root)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not os.path.isdir(p):
                continue
            size = sum(
                os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
            )
            rows.append((f"{root}/{name}", size))
    total = sum(s for _, s in rows)
    for name, size in rows:
        print(f"{size / 1e6:10.2f} MB  {name}")
    print(f"{total / 1e6:10.2f} MB  total  ({manifest['stats']['n_docs']} docs, "
          f"{manifest['stats']['n_terms']} terms)")


def cmd_docids(args) -> None:
    """Dump doc_id → url map head (``cmd/dcs/docids.go`` analogue)."""
    from dcs_ray.index.segment import Segment
    from dcs_ray.search import shard_paths

    for p in shard_paths(args.index):
        t = Segment(p).doc_meta
        for row in t.slice(0, args.n).to_pylist():
            print(row["doc_id"], row["url"], row["doc_len"])


def cmd_trigram(args) -> None:
    """Trigrams of a string (``cmd/dcs/trigram.go``)."""
    from dcs_ray.tokenize import string_trigrams

    for t in string_trigrams(args.text):
        b = bytes([t >> 16, (t >> 8) & 255, t & 255])
        print(t, repr(b.decode(errors="replace")))


def cmd_posting(args) -> None:
    """Dump one term's posting list (``cmd/dcs/posting.go:27-81``)."""
    import numpy as np

    from dcs_ray.codec import decode_postings
    from dcs_ray.search import _open, shard_paths

    for p in shard_paths(args.index):
        seg = _open(p)
        term = args.term
        if seg.terms.type == "uint32":
            from dcs_ray.tokenize import string_trigrams

            tris = string_trigrams(term)
            key = np.uint32(tris[0]) if tris else None
        else:
            key = term
        idx = seg.term_index(key) if key is not None else -1
        if idx < 0:
            continue
        docs, tfs = decode_postings(seg.term_blob(idx))
        print(f"# {os.path.basename(p)} df={seg.df[idx]}")
        for d, f in list(zip(docs.tolist(), tfs.tolist()))[: args.n]:
            print(d, f)


def cmd_matches(args) -> None:
    """Positional literal matches (``cmd/dcs/matches.go:22-76``)."""
    ray = _ray()
    from dcs_ray.search import search_literal

    t = search_literal(args.index, [args.literal], positional=True)
    for row in t.slice(0, args.n).to_pylist():
        print(row["doc_id"], row["position"])


def cmd_search(args) -> None:
    ray = _ray()
    from dcs_ray.search import (
        explain_scores,
        search_bm25,
        search_bm25_fielded,
        search_fuzzy,
        search_wildcard,
    )

    if getattr(args, "anchor_index", None):
        t = search_bm25_fielded(
            args.index, args.anchor_index, [args.query], k=args.k,
            anchor_weight=args.anchor_weight,
        )
    elif args.mode == "wildcard":
        t = search_wildcard(args.index, args.query, k=args.k)
    elif args.mode == "fuzzy":
        t = search_fuzzy(args.index, args.query, k=args.k)
    elif args.min_match:
        t = search_bm25(args.index, [args.query], k=args.k, min_match=args.min_match)
    else:
        t = search_bm25(args.index, [args.query], k=args.k)
    for row in t.to_pylist():
        print(f"{row['rank']:3d}  {row['score']:.4f}  doc={row['doc_id']}")
    if getattr(args, "explain", False):
        # breakdown for the ROWS PRINTED ABOVE, against the expanded
        # term set of the mode that produced them (wildcard/fuzzy
        # expansions included) — never a second, different ranking
        from dcs_ray.search import fuzzy_terms, wildcard_terms

        if args.mode == "fuzzy":
            qtext = " ".join(fuzzy_terms(args.index, args.query))
        elif args.mode == "wildcard":
            qtext = " ".join(wildcard_terms(args.index, args.query))
        else:
            qtext = args.query
        ex = explain_scores(
            args.index, qtext, k=args.k,
            doc_ids=t["doc_id"].to_pylist(),
            ranks=t["rank"].to_pylist(),
        )
        for row in ex.to_pylist():
            print(
                f"    #{row['rank']} doc={row['doc_id']} {row['term']}: "
                f"tf={row['tf']} idf={row['idf']:.4f} -> {row['contribution']:.4f}"
            )


def cmd_links(args) -> None:
    """Link-graph tooling over the pages source: edge extraction,
    anchor-term counts, or pagerank (the web static-prior chain)."""
    ray = _ray()
    from dcs_ray.functions.links import (
        anchor_term_counts,
        extract_link_edges,
        link_pagerank,
    )
    from dcs_ray.sources.pages import dedup_latest_crawl, read_pages

    edges = extract_link_edges(dedup_latest_crawl(read_pages(args.sf_dir)))
    if args.method == "edges":
        shown = 0
        for b in edges.iter_batches(batch_format="pyarrow"):
            for s, d, a in zip(
                b["src"].to_pylist(), b["dst"].to_pylist(), b["anchor"].to_pylist()
            ):
                print(f"{s} -> {d}  [{a}]")
                shown += 1
                if shown >= args.n:
                    return
    elif args.method == "anchors":
        t = anchor_term_counts(edges)
        for row in t.sort("anchor_tf", descending=True).limit(args.n).take_all():
            print(f"{row['anchor_tf']:6d}  doc={row['doc_id']}  {row['term']}")
    elif args.method == "pagerank":
        t = link_pagerank(edges, n_iter=args.iters)
        t = t.sort_by([("rank", "descending"), ("node", "ascending")]).slice(0, args.n)
        for node, rank in zip(t["node"].to_pylist(), t["rank"].to_pylist()):
            print(f"{rank:.6f}  doc={node}")
    elif args.method in ("triangles", "communities"):
        import pyarrow as pa

        from dcs_ray.functions.graph import label_propagation, triangle_counts

        pairs = edges.map_batches(
            lambda b: pa.table({"id_a": b["src"], "id_b": b["dst"]}),
            batch_format="pyarrow",
        )
        if args.method == "triangles":
            ds = triangle_counts(pairs)
            col, label = "n_triangles", "triangles"
        else:
            ds = label_propagation(pairs, n_iter=args.iters)
            col, label = "community", "community"
        t = pa.concat_tables(
            pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
        ).sort_by("node")
        for node, v in zip(
            t["node"].to_pylist()[: args.n], t[col].to_pylist()[: args.n]
        ):
            print(f"doc={node}  {label}={v}")
    elif args.method == "kcore":
        from dcs_ray.functions.graph import kcore

        t = kcore(edges, k=args.k, rounds=args.iters)
        for node, deg in zip(
            t["node"].to_pylist()[: args.n], t["deg"].to_pylist()[: args.n]
        ):
            print(f"doc={node}  deg={deg}")
        print(f"{len(t)} nodes in the {args.k}-core after {args.iters} rounds")
    elif args.method == "assort":
        from dcs_ray.functions.graph import degree_assortativity

        n, r = degree_assortativity(edges)
        print(f"edges={n}  out->in degree assortativity={r:.6f}")
    else:  # reach
        import numpy as np

        from dcs_ray.functions.graph import bfs_hops

        edges = edges.materialize()
        parts = [
            np.unique(b["src"].to_numpy(zero_copy_only=False))[:3]
            for b in edges.select_columns(["src"]).iter_batches(
                batch_format="pyarrow"
            )
        ]
        seeds = (
            np.unique(np.concatenate(parts))[:3].tolist() if parts else []
        )
        t = bfs_hops(edges, seeds, max_hops=args.iters, src="src", dst="dst")
        for node, h in zip(
            t["node"].to_pylist()[: args.n], t["hops"].to_pylist()[: args.n]
        ):
            print(f"doc={node}  hops={h}")


def cmd_suggest(args) -> None:
    """Spelling suggestions from the index's own vocabulary (SymSpell)."""
    ray = _ray()
    import ray.data

    from dcs_ray.functions.spell import suggest

    vocab = ray.data.read_parquet(os.path.join(args.index, "stats", "df.parquet"))
    t = suggest(vocab, args.words, k=args.k)
    for row in t.to_pylist():
        print(f"{row['word']} -> {row['term']}  (df={row['df']})")


def cmd_facets(args) -> None:
    """Per-facet matching-doc counts for a query (dcs-web grouped view)."""
    ray = _ray()
    from dcs_ray.search import search_facets

    t = search_facets(args.index, [args.query], facet_col=args.col, k_facets=args.k)
    for row in t.to_pylist():
        print(f"{row['n_docs']:8d}  {row['facet']}")


def cmd_delta(args) -> None:
    """Crawl snapshot diff: added/removed/changed/unchanged url counts."""
    ray = _ray()
    from dcs_ray.functions.crawl import crawl_delta

    t = crawl_delta(
        read_parquet_sized(args.old),
        read_parquet_sized(args.new),
        url_col=args.url_col,
        content_col=args.text_col,
    )
    for row in t.to_pylist():
        print(f"{row['status']:10s} {row['n_urls']}")


def cmd_grep(args) -> None:
    """Regex search: trigram plan → candidates → verify grep with context
    (the full dcs query path, ``internal/sourcebackend/sourcebackend.go:293-641``)."""
    ray = _ray()
    import ray.data

    from dcs_ray.grep import search_regex

    docs = read_parquet_sized(args.docs)
    res = search_regex(args.index, docs, args.pattern, engine=args.engine)
    for row in res.limit(args.n).take_all():
        print(f"{row['doc_id']}:{row['line']}: {row['context']}")


def cmd_prune(args) -> None:
    """Build the statically pruned serving tier (top-m postings per
    term, full-corpus scoring stats — Carmel '01)."""
    _ray()
    from dcs_ray.index.prune import prune_index

    summary = prune_index(args.index, args.out, m=args.m, codec=args.codec)
    print(
        json.dumps(
            {k: summary[k] for k in ("m", "n_shards", "n_postings")}
        )
    )


def cmd_update(args) -> None:
    """Incrementally replace one partition from a parquet file and
    re-merge only its shard (``cmd/dcs-package-importer`` Merge flow)."""
    ray = _ray()
    import pyarrow.parquet as pq

    from dcs_ray.index.build import update_partition

    docs = pq.read_table(args.docs)
    man = update_partition(args.index, args.part_id, docs)
    print(json.dumps(man["metrics"].get("last_update", {})))


def cmd_dedup(args) -> None:
    """Near-duplicate pairs over a documents parquet (method selectable)."""
    ray = _ray()
    import ray.data

    ds = read_parquet_sized(args.input)
    if args.method == "exact":
        from dcs_ray.functions.dedup import exact_dedup_keep_min

        out = exact_dedup_keep_min(ds, id_col=args.id_col)
        for row in out.limit(args.n).take_all():
            print(json.dumps(row))
        return
    if args.method == "minhash":
        from dcs_ray.functions.dedup import minhash_candidate_pairs

        out = minhash_candidate_pairs(ds, id_col=args.id_col)
    elif args.method == "simhash":
        from dcs_ray.functions.dedup import simhash_near_dup_pairs

        out = simhash_near_dup_pairs(ds, id_col=args.id_col, max_hamming=3)
    elif args.method == "fuzzy":
        from dcs_ray.functions.dedup import fuzzy_dedup_keep

        out = fuzzy_dedup_keep(ds, id_col=args.id_col, threshold=args.threshold)
    else:  # jaccard
        from dcs_ray.functions.dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(ds, id_col=args.id_col, threshold=args.threshold)
    for row in out.limit(args.n).take_all():
        print(json.dumps(row))


def cmd_curate(args) -> None:
    """End-to-end corpus curation: filter -> dedup -> decontaminate ->
    rebalance; writes the survivors (doc_id, lang, n_tokens) as parquet
    or prints the head."""
    ray = _ray()
    import ray.data

    from dcs_ray.functions.filtering import benchmark_ngram_set
    from dcs_ray.pipelines import curate_corpus

    ds = read_parquet_sized(args.input)
    if args.benchmark:
        bench = benchmark_ngram_set(read_parquet_sized(args.benchmark))
    else:
        import numpy as np

        bench = np.empty(0, np.uint64)
    weights = dict(kv.split("=") for kv in args.weights.split(","))
    weights = {k: int(v) for k, v in weights.items()}
    out = curate_corpus(
        ds, ray.put(bench), weights, args.total,
        min_tokens=args.min_tokens, max_dup_frac=args.max_dup_frac,
        id_col=args.id_col,
    )
    if args.output:
        out.write_parquet(args.output)
        print(json.dumps({"written": args.output}))
    else:
        for row in out.limit(args.n).take_all():
            print(json.dumps(row))


def cmd_lineage(args) -> None:
    """Dump the build manifest's per-partition lineage + metrics —
    which partitions are committed, their doc/posting counts and
    throughputs, and the roll-up the resume path trusts."""
    with open(os.path.join(args.index, "MANIFEST.json")) as f:
        manifest = json.load(f)
    lineage = manifest.get("partitions", [])
    if args.partition is not None:
        recs = [r for r in lineage if r.get("part_id") == args.partition]
        print(json.dumps(recs, indent=2))
        return
    out = {
        "metrics": manifest.get("metrics", {}),
        "stats": manifest.get("stats", {}),
        "num_partitions": len(lineage),
        "partitions": lineage,
    }
    print(json.dumps(out, indent=2))


def cmd_cat(args) -> None:
    """Print a document's text by doc_id straight from the corpus
    parquet (pushed-down filter — only that row group is read); the
    reference's `dcs raw` (cmd/dcs/raw.go) fetches the source file the
    same way."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        args.input, filters=[(args.id_col, "=", args.doc_id)]
    )
    if len(t) == 0:
        print(json.dumps({"error": "doc not found", "doc_id": args.doc_id}))
        raise SystemExit(1)
    print(t[args.text_col][0].as_py())


def cmd_cleanup(args) -> None:
    """Delete crash-leftover *.tmp artifacts under an index root."""
    from dcs_ray.index.build import cleanup_stale

    removed = cleanup_stale(args.index)
    print(json.dumps({"removed": removed}))


def cmd_explain(args) -> None:
    """Print the trigram query plan for a regex — the candidate
    restriction the index evaluates before verification (the debugging
    view dcs exposes through `dcs trigram`/replay logs)."""
    from dcs_ray.queryplan import regexp_query, rewrite_query

    rest, include, exclude = rewrite_query(args.query)
    plan = regexp_query(rest)
    print(json.dumps({
        "query": args.query,
        "rewritten": rest,
        "include_filters": include,
        "exclude_filters": exclude,
        "plan": repr(plan),
    }, indent=2))


def cmd_ann(args) -> None:
    """ANN top-k for one query vector id, through the selected index."""
    _ray()
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    ds = read_parquet_sized(args.input)
    q = np.array(
        pq.read_table(args.input).slice(args.query_id, 1)[args.emb_col].to_pylist()
    )
    if args.method == "brute":
        from dcs_ray.functions.simsearch import knn_cosine_bruteforce

        t = knn_cosine_bruteforce(ds, q, k=args.k, id_col=args.id_col, emb_col=args.emb_col)
    elif args.method == "lsh":
        from dcs_ray.functions.simsearch import knn_cosine_lsh

        t = knn_cosine_lsh(ds, q, k=args.k, id_col=args.id_col, emb_col=args.emb_col,
                           index_dir=args.index_dir)
    else:  # ivf
        from dcs_ray.functions.simsearch import knn_cosine_ivf

        t = knn_cosine_ivf(ds, q, k=args.k, id_col=args.id_col, emb_col=args.emb_col,
                           index_dir=args.index_dir)
    for row in t.to_pylist():
        print(json.dumps(row))


def cmd_reshard(args) -> None:
    """Re-merge an index's preserved segments into a new shard count
    (dcs-reshard analogue, ``cmd/dcs-reshard/reshard.go:35-92``)."""
    _ray()
    from dcs_ray.index.build import reshard

    man = reshard(args.index, args.num_shards)
    print(json.dumps(man["metrics"]["last_reshard"]))


def cmd_delete(args) -> None:
    """Tombstone doc ids (Lucene live-docs model, ``index/deletes.py``):
    O(n_tombstones), no segment bytes change, search excludes
    immediately."""
    from dcs_ray.index.deletes import delete_docs

    ids = [int(x) for x in args.ids.split(",")] if args.ids else []
    if args.ids_file:
        import pyarrow.parquet as pq

        ids += pq.read_table(args.ids_file, columns=["doc_id"])["doc_id"].to_pylist()
    print(json.dumps(delete_docs(args.index, ids)))


def cmd_compact(args) -> None:
    """Physically remove tombstoned docs: rewrite ONLY affected
    partitions, re-merge only their (or checksum-stale) shards."""
    _ray()
    from dcs_ray.index.deletes import compact_deletes

    print(json.dumps(compact_deletes(args.index)))


def cmd_add(args) -> None:
    """NRT delta add (Lucene flush model, ``index/nrt.py``): one new
    segment + shard per call; ids must exceed everything indexed."""
    _ray()
    import pyarrow.parquet as pq

    from dcs_ray.index.nrt import add_docs

    print(json.dumps(add_docs(args.index, pq.read_table(args.input))))


def cmd_fsck(args) -> None:
    """Consistency report (and repair with --repair): provenance-based
    shard staleness, pending tombstones, tmp leftovers, stats drift."""
    from dcs_ray.index.fsck import repair_index, verify_index

    rep = verify_index(args.index, deep=args.deep)
    print(json.dumps(rep))
    if args.repair and not rep["ok"]:
        _ray()
        print(json.dumps(repair_index(args.index)))


def cmd_maintain(args) -> None:
    """Maintenance policy: print the plan (metadata-only), or apply it
    with --apply (repair → compact → fold deltas)."""
    from dcs_ray.index.maintain import auto_maintain, maintenance_plan

    if args.apply:
        _ray()
        print(json.dumps(auto_maintain(args.index)))
    else:
        print(json.dumps(maintenance_plan(args.index)))


def cmd_query(args) -> None:
    """Unified query grammar: terms, \"quoted phrases\", -negated terms,
    key:value / -key:value keyword filters, one raw string."""
    _ray()
    from dcs_ray.search import search_query

    t = search_query(
        args.index, args.query, k=args.k, phrase_index_dir=args.phrase_index
    )
    for row in t.to_pylist():
        print(f"{row['rank']:3d}  {row['score']:.4f}  doc={row['doc_id']}")


def cmd_textstats(args) -> None:
    """Per-document text analysis over a documents parquet."""
    _ray()
    ds = read_parquet_sized(args.input)
    from dcs_ray.functions import textstats

    fn = {
        "tokens": textstats.token_counts,
        "bpe": textstats.bpe_token_counts,
        "quality": textstats.quality_scores,
        "langid": textstats.langid,
        "fingerprint": textstats.fingerprints,
        "classify": textstats.quality_classify,
        "readability": textstats.readability,
        "entropy": textstats.token_entropy,
    }[args.method]
    out = fn(ds, id_col=args.id_col)
    for row in out.limit(args.n).take_all():
        print(json.dumps(row))


def cmd_stats(args) -> None:
    """Column statistics over any parquet: distinct counts, heavy
    hitters (exact / count-min), quantiles."""
    _ray()
    ds = read_parquet_sized(args.input, columns=[c for c in [args.col, args.key] if c])
    if args.method == "distinct":
        from dcs_ray.functions.sketches import exact_distinct

        print(json.dumps(exact_distinct(ds, args.col).take_all()[0]))
    elif args.method == "hll":
        from dcs_ray.functions.sketches import approx_distinct_hll

        est, _ = approx_distinct_hll(ds, args.col)
        print(json.dumps({"approx_distinct": est}))
    elif args.method == "topk":
        from dcs_ray.functions.sketches import heavy_hitters

        for row in heavy_hitters(ds, args.col, k=args.k).to_pylist():
            print(json.dumps(row))
    elif args.method == "cms":
        from dcs_ray.functions.sketches import cms_heavy_hitters

        for row in cms_heavy_hitters(ds, args.col, k=args.k).to_pylist():
            print(json.dumps(row))
    else:  # quantiles
        from dcs_ray.functions.quantiles import group_quantiles

        out = group_quantiles(ds, args.key, args.col, [0.5, 0.9, 0.99])
        for row in out.take_all():
            print(json.dumps(row))


def _replay_phases(args) -> list[dict]:
    """Staged replay with per-phase attribution — the reference
    benchmark's index-only / +I/O / +matching decomposition
    (``cmd/dcs/replay.go:37-45``, ``static/research/2019-08-03-dcs-new-
    index/bench.zsh:1-40``): each query line is a REGEX run as three
    explicitly materialized stages — posting scan (trigram plan +
    per-shard candidate fan-out), doc read (restricted load of the
    candidate docs), verify (the grep over the loaded candidates).
    The production pipeline FUSES these stages for throughput
    (``search_regex_fused``); this mode deliberately trades that
    pipelining for attributable timings, so the three phase nanos sum
    to total_nano by construction."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from dcs_ray.grep import grep_regex, regex_candidates

    with open(args.log) as f:
        queries = [l.strip() for l in f if l.strip()]
    out = []
    for q in queries:
        t0 = time.monotonic()
        cand = regex_candidates(args.index, q)  # posting scan
        t1 = time.monotonic()
        if cand is not None and len(cand) == 0:
            docs = rd.read_parquet(args.docs).limit(0).materialize()
        else:
            docs = rd.read_parquet(args.docs)
            if cand is not None:
                ref = ray.put(cand)  # one object-store copy, sorted

                def keep(b: pa.Table, _r=ref) -> pa.Table:
                    from dcs_ray.grep import candidate_mask

                    ids = b["doc_id"].to_numpy().astype(np.uint64)
                    return b.filter(pa.array(candidate_mask(ids, ray.get(_r))))

                docs = docs.map_batches(keep, batch_format="pyarrow")
            docs = docs.materialize()  # doc read ends HERE, measurably
        t2 = time.monotonic()
        n = grep_regex(docs, q).count()  # verify (docs already restricted)
        t3 = time.monotonic()
        rec = {
            "query": q,
            "nresults": int(n),
            "ncandidates": -1 if cand is None else int(len(cand)),
            "posting_nano": int((t1 - t0) * 1e9),
            "doc_read_nano": int((t2 - t1) * 1e9),
            "verify_nano": int((t3 - t2) * 1e9),
        }
        rec["total_nano"] = (
            rec["posting_nano"] + rec["doc_read_nano"] + rec["verify_nano"]
        )
        out.append(rec)
        print(json.dumps(rec))
    tot = {
        p: sum(o[p] for o in out)
        for p in ("posting_nano", "doc_read_nano", "verify_nano", "total_nano")
    }
    print(json.dumps({"queries": len(out), "mode": "phases", **tot}))
    return out


def cmd_replay(args) -> None:
    """Replay a query log, one query per line, print per-query JSON
    measurements (``cmd/dcs/replay.go:472-546``). ``--service`` runs
    through the resident ShardSearcher actor pool (the dcs-web
    long-lived backend shape) instead of a per-call Dataset pipeline —
    identical results, lower per-query latency. ``--phases`` (with
    ``--docs``) switches to the staged regex replay with per-phase
    nanos (posting scan / doc read / verify)."""
    ray = _ray()
    from dcs_ray.search import load_stats, search_bm25

    if getattr(args, "phases", False):
        if not getattr(args, "docs", None):
            raise SystemExit("--phases requires --docs <documents parquet>")
        _replay_phases(args)
        return

    with open(args.log) as f:
        queries = [l.strip() for l in f if l.strip()]
    stats = load_stats(args.index)
    svc = None
    if getattr(args, "service", False):
        from dcs_ray.service import search_service

        svc = search_service(args.index)
    show_progress = getattr(args, "progress", False) and svc is not None
    out = []
    for qi, q in enumerate(queries):
        t0 = time.monotonic()
        if svc is not None:
            qid = f"replay-{qi}" if show_progress else None
            res = svc.search([q], k=args.k, query_id=qid)
        else:
            res = search_bm25(args.index, [q], k=args.k, stats=stats)
        out.append({"query": q, "nresults": len(res),
                    "total_nano": int((time.monotonic() - t0) * 1e9)})
        if show_progress:
            # the in-flight event trail (per-shard filesProcessed shape);
            # a batch replay prints it post-hoc, a UI would poll live
            from dcs_ray.progress import get_bus

            bus = get_bus()
            snap = ray.get(bus.snapshot.remote(qid))
            out[-1]["progress"] = {
                "shards": [
                    {k: e[k] for k in ("shard", "processed", "total", "done")}
                    for e in snap["shards"]
                ],
                "done": snap["done"],
            }
            ray.get(bus.clear.remote(qid))
        print(json.dumps(out[-1]))
    if svc is not None:
        svc.shutdown()
    total = sum(o["total_nano"] for o in out)
    print(json.dumps({"queries": len(out), "total_s": total / 1e9,
                      "qps": len(out) / (total / 1e9),
                      "mode": "service" if getattr(args, "service", False) else "dataset"}))


def cmd_warc(args) -> None:
    """Build an index straight from ``.warc`` / ``.warc.gz`` files
    (Common Crawl container ingest): parse records → extract text →
    build. Doc ids derive from urls (id_col=None), so the build is
    deterministic for a fixed file set at any parallelism."""
    _ray()
    import glob as _glob

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.sources.pages import extract_text_batch
    from dcs_ray.sources.warc import read_warc

    paths = sorted(p for pat in args.warcs for p in _glob.glob(pat))
    if not paths:
        raise SystemExit("no WARC files match")
    import pyarrow as pa

    pages = read_warc(paths).map_batches(
        lambda b: extract_text_batch(
            b.append_column("lang", pa.array([args.lang] * len(b)))
        ),
        batch_format="pyarrow",
    )
    conf = IndexConfig(
        num_partitions=args.partitions,
        num_shards=args.shards,
        mode=args.mode,
        dedup_latest=args.dedup_latest,
    )
    manifest = build_index(pages, args.out, conf)
    print(json.dumps({"warc_files": len(paths),
                      "n_docs": manifest["stats"]["n_docs"],
                      "n_terms": manifest["stats"]["n_terms"]}))


def cmd_feed(args) -> None:
    """Continuous ingest: poll a drop directory of parquet files and
    NRT-add each into the index (the dcs-feeder role)."""
    _ray()
    from dcs_ray.feeder import feed_loop, feed_once

    if args.once:
        print(json.dumps(feed_once(args.index, args.incoming)))
    else:
        feed_loop(args.index, args.incoming, interval_s=args.interval,
                  max_ticks=args.max_ticks)


def cmd_serve(args) -> None:
    """Start the HTTP front door (/v1/search, /v1/searchperpackage,
    /metrics) over a resident shard-actor pool; blocks until SIGINT."""
    from dcs_ray.http_api import serve

    api = serve(
        args.index,
        secret=args.secret,
        host=args.host,
        port=args.port,
        num_cpus=args.num_cpus,
        trigram_index_dir=args.trigram_index,
        docs_path=args.docs,
        rate_limit=args.rate_limit,
    )
    print(json.dumps({"host": api.host, "port": api.port}), flush=True)
    try:
        import signal

        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        api.shutdown()
        api.svc.shutdown()


def cmd_apikey(args) -> None:
    from dcs_ray.http_api import make_api_key

    print(make_api_key(args.subject, args.secret))


def cmd_tally(args) -> None:
    """Emit TALLY.json: query/oracle/test counts straight from the
    artifacts (BASELINE.md references this file instead of
    hand-maintained numbers, so the counts cannot drift)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(args.repo)
    sys.path.insert(0, str(root))
    import __ray_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    out = {
        "n_queries": len(q),
        "n_oracled": len(o),
        "n_rows_only": len(set(q) - set(o)),
        "rows_only": sorted(set(q) - set(o)),
    }
    if not args.no_tests:
        # pytest's own collector is the source of truth for test count
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            cwd=root, capture_output=True, text=True,
        )
        import re as _re
        m = _re.search(r"(\d+) tests? collected", r.stdout)
        out["n_tests"] = int(m.group(1)) if m else None
    dest = root / "TALLY.json"
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser(prog="dcs_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("warc", help="build an index from WARC files")
    w.add_argument("out")
    w.add_argument("warcs", nargs="+", help="warc/warc.gz paths or globs")
    w.add_argument("--mode", default="words", choices=["words", "trigram"])
    w.add_argument("--partitions", type=int, default=8)
    w.add_argument("--shards", type=int, default=2)
    w.add_argument("--lang", default="en")
    w.add_argument("--dedup-latest", action="store_true")
    w.set_defaults(fn=cmd_warc)

    c = sub.add_parser("create", help="build an index from parquet docs")
    c.add_argument("input")
    c.add_argument("out")
    c.add_argument("--mode", default="words", choices=["words", "trigram"])
    c.add_argument("--partitions", type=int, default=8)
    c.add_argument("--shards", type=int, default=2)
    c.add_argument("--id-col", default=None)
    c.add_argument("--url-col", default="url")
    c.add_argument("--dedup-latest", action="store_true")
    c.add_argument("--positional", action="store_true")
    c.set_defaults(fn=cmd_create)

    d = sub.add_parser("du", help="index size accounting")
    d.add_argument("index")
    d.set_defaults(fn=cmd_du)

    d = sub.add_parser("docids", help="dump doc_id -> url map")
    d.add_argument("index")
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_docids)

    d = sub.add_parser("trigram", help="trigrams of a string")
    d.add_argument("text")
    d.set_defaults(fn=cmd_trigram)

    d = sub.add_parser("posting", help="dump a term's posting list")
    d.add_argument("index")
    d.add_argument("term")
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_posting)

    d = sub.add_parser("matches", help="positional literal matches")
    d.add_argument("index")
    d.add_argument("literal")
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_matches)

    d = sub.add_parser("links", help="web link graph: edges / anchors / pagerank")
    d.add_argument("sf_dir")
    d.add_argument("--method", default="pagerank",
                   choices=["edges", "anchors", "pagerank", "triangles",
                            "communities", "reach", "kcore", "assort"])
    d.add_argument("--iters", type=int, default=5)
    d.add_argument("-k", type=int, default=4, help="k-core degree bar")
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_links)

    d = sub.add_parser("suggest", help="spelling suggestions from the index vocabulary")
    d.add_argument("index")
    d.add_argument("words", nargs="+")
    d.add_argument("-k", type=int, default=5)
    d.set_defaults(fn=cmd_suggest)

    d = sub.add_parser("facets", help="per-facet matching-doc counts for a query")
    d.add_argument("index")
    d.add_argument("query")
    d.add_argument("--col", default="source")
    d.add_argument("-k", type=int, default=10)
    d.set_defaults(fn=cmd_facets)

    d = sub.add_parser("delta", help="crawl snapshot diff (url status counts)")
    d.add_argument("old")
    d.add_argument("new")
    d.add_argument("--url-col", default="url")
    d.add_argument("--text-col", default="text")
    d.set_defaults(fn=cmd_delta)

    d = sub.add_parser("search", help="BM25 top-k search")
    d.add_argument("index")
    d.add_argument("query")
    d.add_argument("-k", type=int, default=10)
    d.add_argument("--anchor-index", default=None,
                   help="second (anchor-field) index for BM25F-lite ranking")
    d.add_argument("--anchor-weight", type=float, default=0.5)
    d.add_argument("--mode", default="term", choices=["term", "wildcard", "fuzzy"],
                   help="wildcard: trailing-* prefix expansion; fuzzy: "
                        "levenshtein-1 term expansion")
    d.add_argument("--min-match", type=int, default=None,
                   help="minimum distinct query terms a doc must match")
    d.add_argument("--explain", action="store_true",
                   help="print the per-(doc, term) BM25 contribution breakdown")
    d.set_defaults(fn=cmd_search)

    d = sub.add_parser("grep", help="regex search via trigram index + verify")
    d.add_argument("index", help="trigram-mode index dir")
    d.add_argument("docs", help="documents parquet (for verify grep)")
    d.add_argument("pattern")
    d.add_argument("-n", type=int, default=20)
    d.add_argument("--engine", default="auto", choices=["auto", "nfa"],
                   help="nfa = force the worst-case-linear Pike VM")
    d.set_defaults(fn=cmd_grep)

    d = sub.add_parser("prune", help="build the pruned serving tier (top-m postings/term)")
    d.add_argument("index")
    d.add_argument("out")
    d.add_argument("--m", type=int, default=1000)
    d.add_argument("--codec", default="varint")
    d.set_defaults(fn=cmd_prune)

    d = sub.add_parser("update", help="replace one partition, re-merge its shard")
    d.add_argument("index")
    d.add_argument("part_id", type=int)
    d.add_argument("docs", help="parquet with the partition's new documents")
    d.set_defaults(fn=cmd_update)

    d = sub.add_parser("dedup", help="near-duplicate detection over documents parquet")
    d.add_argument("input")
    d.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash", "jaccard", "fuzzy"])
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--threshold", type=float, default=0.5)
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_dedup)

    d = sub.add_parser("explain", help="trigram query plan for a regex")
    d.add_argument("query")
    d.set_defaults(fn=cmd_explain)

    d = sub.add_parser("cat", help="print a document's text by id (dcs raw)")
    d.add_argument("input")
    d.add_argument("doc_id", type=int)
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.set_defaults(fn=cmd_cat)

    d = sub.add_parser("cleanup", help="remove stale *.tmp build artifacts")
    d.add_argument("index")
    d.set_defaults(fn=cmd_cleanup)

    d = sub.add_parser("lineage", help="dump per-partition lineage + build metrics")
    d.add_argument("index")
    d.add_argument("--partition", type=int, default=None)
    d.set_defaults(fn=cmd_lineage)

    d = sub.add_parser("curate", help="end-to-end corpus curation pipeline")
    d.add_argument("input")
    d.add_argument("--benchmark", default=None, help="parquet of held-out docs to decontaminate against")
    d.add_argument("--weights", default="en=1", help="lang=weight,... mixture target")
    d.add_argument("--total", type=int, default=1000000)
    d.add_argument("--min-tokens", type=int, default=15)
    d.add_argument("--max-dup-frac", type=float, default=0.6)
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--output", default=None)
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_curate)

    d = sub.add_parser("ann", help="cosine top-k over an embeddings parquet")
    d.add_argument("input")
    d.add_argument("--method", default="brute", choices=["brute", "lsh", "ivf"])
    d.add_argument("--query-id", type=int, default=0)
    d.add_argument("--id-col", default="vec_id")
    d.add_argument("--emb-col", default="embedding")
    d.add_argument("--index-dir", default=None)
    d.add_argument("-k", type=int, default=10)
    d.set_defaults(fn=cmd_ann)

    d = sub.add_parser("reshard", help="re-merge segments into a new shard count")
    d.add_argument("index")
    d.add_argument("num_shards", type=int)
    d.set_defaults(fn=cmd_reshard)

    d = sub.add_parser("delete", help="tombstone doc ids (live-docs delete)")
    d.add_argument("index")
    d.add_argument("--ids", default="", help="comma-separated doc ids")
    d.add_argument("--ids-file", default=None, help="parquet with a doc_id column")
    d.set_defaults(fn=cmd_delete)

    d = sub.add_parser("compact", help="physically remove tombstoned docs")
    d.add_argument("index")
    d.set_defaults(fn=cmd_compact)

    d = sub.add_parser("add", help="NRT delta add from a parquet of new docs")
    d.add_argument("index")
    d.add_argument("input")
    d.set_defaults(fn=cmd_add)

    d = sub.add_parser("fsck", help="index consistency report / repair")
    d.add_argument("index")
    d.add_argument("--repair", action="store_true")
    d.add_argument("--deep", action="store_true", help="re-CRC segment blobs")
    d.set_defaults(fn=cmd_fsck)

    d = sub.add_parser("maintain", help="maintenance plan / --apply it")
    d.add_argument("index")
    d.add_argument("--apply", action="store_true")
    d.set_defaults(fn=cmd_maintain)

    d = sub.add_parser("query", help="search with the full query grammar")
    d.add_argument("index")
    d.add_argument("query")
    d.add_argument("-k", type=int, default=10)
    d.add_argument("--phrase-index", default=None, help="positional trigram index for quoted phrases")
    d.set_defaults(fn=cmd_query)

    d = sub.add_parser("textstats", help="per-doc text analysis over documents parquet")
    d.add_argument("input")
    d.add_argument("--method", default="quality",
                   choices=["tokens", "bpe", "quality", "langid", "fingerprint",
                            "classify", "readability", "entropy"])
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("-n", type=int, default=20)
    d.set_defaults(fn=cmd_textstats)

    d = sub.add_parser("stats", help="column stats: distinct/hll/topk/cms/quantiles")
    d.add_argument("input")
    d.add_argument("--method", default="topk",
                   choices=["distinct", "hll", "topk", "cms", "quantiles"])
    d.add_argument("--col", required=True)
    d.add_argument("--key", default=None, help="group key (quantiles)")
    d.add_argument("-k", type=int, default=10)
    d.set_defaults(fn=cmd_stats)

    d = sub.add_parser("replay", help="replay a query log with timings")
    d.add_argument("index")
    d.add_argument("log")
    d.add_argument("-k", type=int, default=10)
    d.add_argument("--service", action="store_true",
                   help="serve from a resident per-shard actor pool")
    d.add_argument("--progress", action="store_true",
                   help="with --service: record per-shard in-flight "
                   "progress events per query (querymanager_events shape)")
    d.add_argument("--phases", action="store_true",
                   help="staged regex replay with per-phase nanos "
                   "(posting scan / doc read / verify, replay.go:37-45)")
    d.add_argument("--docs", default=None,
                   help="documents parquet for --phases doc-read stage")
    d.set_defaults(fn=cmd_replay)

    d = sub.add_parser("feed", help="poll a drop dir, NRT-add new parquet files")
    d.add_argument("index")
    d.add_argument("incoming")
    d.add_argument("--interval", type=float, default=5.0)
    d.add_argument("--once", action="store_true")
    d.add_argument("--max-ticks", type=int, default=None)
    d.set_defaults(fn=cmd_feed)

    d = sub.add_parser("serve", help="HTTP front door over the resident service")
    d.add_argument("index")
    d.add_argument("--secret", required=True, help="API-key signing secret")
    d.add_argument("--host", default="127.0.0.1")
    d.add_argument("--port", type=int, default=0)
    d.add_argument("--num-cpus", type=float, default=1.0)
    d.add_argument("--trigram-index", default=None,
                   help="trigram index dir for literal/regex match modes")
    d.add_argument("--docs", default=None,
                   help="documents parquet for regex verify")
    d.add_argument("--rate-limit", type=float, default=None,
                   help="per-api-key sustained requests/sec (burst 2x)")
    d.set_defaults(fn=cmd_serve)

    d = sub.add_parser("apikey", help="mint a signed API key")
    d.add_argument("--secret", required=True)
    d.add_argument("--subject", required=True)
    d.set_defaults(fn=cmd_apikey)

    d = sub.add_parser("tally", help="write TALLY.json (query/oracle/test counts)")
    d.add_argument("--repo", default=".")
    d.add_argument("--no-tests", action="store_true",
                   help="skip the pytest collection pass")
    d.set_defaults(fn=cmd_tally)

    args = ap.parse_args()
    args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
