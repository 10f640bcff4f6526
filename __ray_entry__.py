"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (pages → extract → dedup → index
→ BM25 search) at sf0.001. ``queries()`` exposes each implemented
operator as a callable over an sf dir; ``oracle_sql()`` gives the DuckDB
oracle for every SQL-expressible one (driver compares row count, schema,
and order-insensitive value hash at sf0.01).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from dcs_ray.sources.io import read_parquet_sized

BM25_QUERY = "spark merge join"
LITERAL = "spark merge"
_CACHE_ROOT = "/tmp/dcs_ray_idxcache_v2"  # v2: doc_meta carries source+prior

# ---------------------------------------------------------------------------
# index cache (built lazily per sf_dir; resume-safe by construction)
# ---------------------------------------------------------------------------


def _index_dir(sf_dir: str, mode: str) -> str:
    from dcs_ray.index import IndexConfig, build_index

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_{mode}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )

        def with_prior(b: pa.Table) -> pa.Table:
            # deterministic static rank prior (dcs pre-ranking's per-package
            # Inst/Rdep prior analogue); same formula as the SQL oracle
            ids = b["doc_id"].to_numpy()
            prior = 1.0 + (ids % 5) / 10.0
            return b.append_column("prior", pa.array(prior, pa.float64()))

        docs = docs.map_batches(with_prior, batch_format="pyarrow")
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode=mode,
            id_col="doc_id",
            dedup_latest=False,
            positional=(mode == "trigram"),
            meta_cols=("source", "prior"),
        )
        build_index(docs, out, conf)
    return out


def _docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_sized(f"{sf_dir}/documents.parquet")


def _anchor_index_dir(sf_dir: str) -> str:
    """Anchor-text field index: one pseudo-doc per link TARGET whose
    text is every anchor pointing at it (the anchor field of a web
    index — built like any other index, searched as the second field
    of ``search_bm25_fielded``, which range-refines work units so the
    two indexes need NOT shard identically). id_max pinned to the body
    corpus max (a metadata-only read) to skip the Dataset max() pass;
    link targets past the corpus edge clamp into the last partition."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_anchor")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        from dcs_ray.functions.links import anchor_pseudo_docs

        docs = anchor_pseudo_docs(_link_edges_ds(sf_dir))
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode="words",
            id_col="doc_id",
            dedup_latest=False,
            id_max=parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id"),
        )
        build_index(docs, out, conf)
    return out


# ---------------------------------------------------------------------------
# entry — flagship pipeline
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Pages flagship at sf0.001: synthesize Common-Crawl-style pages,
    extract text (byte-identical invariant), dedup to latest crawl,
    build the sharded inverted index, run BM25 top-k."""
    import shutil

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25
    from dcs_ray.sources.pages import extract_text_batch, read_pages

    out = os.path.join(_CACHE_ROOT, "entry_pages")
    shutil.rmtree(out, ignore_errors=True)
    pages = read_pages("/root/testdata/sf0.001")
    extracted = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    build_index(
        extracted,
        out,
        IndexConfig(num_partitions=4, num_shards=2, mode="words", dedup_latest=True),
    )
    res = search_bm25(out, [BM25_QUERY, "customer window batch"], k=10)
    return res.to_pandas()


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_bm25(sf_dir: str) -> pa.Table:
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_bm25_top2_per_source(sf_dir: str) -> pa.Table:
    """Per-source top-2 capped ranking, top 10 overall (dcs per-package
    top-2, A5: querymanager.go:728-747) — distributed: each shard emits
    at most 2 rows per source; no full-corpus ranking, no driver pandas."""
    from dcs_ray.search import search_bm25_grouped

    idx = _index_dir(sf_dir, "words")
    t = search_bm25_grouped(idx, [BM25_QUERY], group_col="source", per_group=2, k=10)
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "source": t["group"],
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_bm25_prior(sf_dir: str) -> pa.Table:
    """BM25 × static per-doc rank prior (dcs pre-ranking F7/J6,
    ``ranking/pre-ranking.go:54-103``): the prior lives in doc_meta and
    multiplies every score inside the shard task."""
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10, prior_col="prior")
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_term_df(sf_dir: str) -> Any:
    """Per-term document frequency — served straight from the index's
    corpus-stats table (the engine's own df aggregation, A7)."""
    idx = _index_dir(sf_dir, "words")
    t = pq.read_table(os.path.join(idx, "stats", "df.parquet"))
    return pa.table({"term": t["term"], "df": t["df"].cast(pa.int64())})


def _q_corpus_stats(sf_dir: str) -> pa.Table:
    from dcs_ray.search import load_stats

    idx = _index_dir(sf_dir, "words")
    s = load_stats(idx)
    return pa.table(
        {
            "n_docs": pa.array([s["n_docs"]], pa.int64()),
            "total_tokens": pa.array([s["sum_doc_len"]], pa.int64()),
            "avgdl": pa.array([round(s["avgdl"], 6)], pa.float64()),
        }
    )


def _q_token_count(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.textstats import token_counts

    return token_counts(_docs(sf_dir))


def _q_bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.textstats import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir))


def _q_quality(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.textstats import quality_scores

    return quality_scores(_docs(sf_dir))


def _q_dedup_exact(sf_dir: str) -> Any:
    from dcs_ray.functions.dedup import exact_dedup_keep_min

    ds = exact_dedup_keep_min(_docs(sf_dir))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table({"doc_id": t["min(doc_id)"].cast(pa.int64())}).sort_by("doc_id")


def _q_latest_version_per_source(sf_dir: str) -> Any:
    """Version-aware newest-wins dedup (J7 with a real comparator —
    dcs ``dpkgversion`` + ``querymanager.go:688-747``): deterministic
    synthetic Debian-style versions, newest per source, id tie-break."""
    from dcs_ray.versions import latest_version_per_key

    def with_version(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        ver = [
            f"{i % 4}.{i % 10}" + ("~rc1" if i % 3 == 0 else "") for i in ids
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"], "version": pa.array(ver)}
        )

    ds = _docs(sf_dir).map_batches(with_version, batch_format="pyarrow")
    out = latest_version_per_key(ds, "source", "version")
    t = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "source": t["source"],
            "doc_id": t["doc_id"].cast(pa.int64()),
            "version": t["version"],
        }
    ).sort_by("source")


def _q_latest_event(sf_dir: str) -> Any:
    from dcs_ray.functions.windows import latest_event_per_user

    ds = latest_event_per_user(read_parquet_sized(f"{sf_dir}/events.parquet"))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {"user_id": t["user_id"].cast(pa.int64()), "event_id": t["event_id"].cast(pa.int64())}
    ).sort_by("user_id")


def _q_window_agg(sf_dir: str) -> Any:
    from dcs_ray.functions.windows import tumbling_window_agg

    ds = tumbling_window_agg(read_parquet_sized(f"{sf_dir}/events.parquet"), width_s=3600)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "window_start": t["window_start"],
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value": pa.array(np.round(t["sum_value"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_hopping_window(sf_dir: str) -> Any:
    from dcs_ray.functions.windows import hopping_window_agg

    ds = hopping_window_agg(
        read_parquet_sized(f"{sf_dir}/events.parquet"), width_s=3600, hop_s=1800
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "window_start": t["window_start"],
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value": pa.array(np.round(t["sum_value"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_session_window(sf_dir: str) -> Any:
    from dcs_ray.functions.windows import session_window_agg

    ds = session_window_agg(
        read_parquet_sized(f"{sf_dir}/events.parquet"), gap_s=1800
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "session_start": t["session_start"],
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value": pa.array(np.round(t["sum_value"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_bm25_filtered(sf_dir: str) -> pa.Table:
    """dcs query-keyword filter (F4: ``query-rewrite.go:15-59`` — e.g.
    ``package:``): BM25 ranking restricted to docs from one source.
    Filtering cannot change surviving docs' scores, so filter-then-top-k
    equals rank-all-then-filter (dcs applies FilterByKeywords before
    ranking, ``sourcebackend.go:28-129``)."""
    from dcs_ray.queryplan import rewrite_query
    from dcs_ray.search import filters_from_keywords, search_bm25

    q, includes, negates = rewrite_query(f"{BM25_QUERY} source:src3")
    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [q], k=10, filters=filters_from_keywords(includes, negates))
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_grep_literal(sf_dir: str) -> ray.data.Dataset:
    """Literal occurrence count per doc — the verify stage (F11),
    vectorized substring count over the text column."""
    import pyarrow.compute as pc

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring(b["text"], LITERAL)
        return pa.table(
            {"doc_id": b["doc_id"], "n_matches": n.cast(pa.int64())}
        ).filter(pc.greater(n, 0))

    return _docs(sf_dir).map_batches(count, batch_format="pyarrow")


def _q_trigram_candidates(sf_dir: str) -> Any:
    from dcs_ray.search import search_literal

    idx = _index_dir(sf_dir, "trigram")
    t = search_literal(idx, [LITERAL], positional=False)
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64())}).sort_by("doc_id")


def _q_positional_matches(sf_dir: str) -> Any:
    from dcs_ray.search import search_literal

    idx = _index_dir(sf_dir, "trigram")
    t = search_literal(idx, [LITERAL], positional=True)
    # per-doc occurrence counts (all positions; literal is not self-overlapping)
    import pyarrow.compute as pc

    g = pa.table({"doc_id": t["doc_id"].cast(pa.int64())}).group_by("doc_id").aggregate(
        [("doc_id", "count")]
    )
    return pa.table(
        {"doc_id": g["doc_id"], "n_matches": g["doc_id_count"].cast(pa.int64())}
    ).sort_by("doc_id")


def _q_proximity_search(sf_dir: str) -> Any:
    """Proximity join (J4 generalized from phrase to a byte window):
    docs where 'spark' starts within 40 bytes of 'join', with exact
    pair counts — answered entirely from positional sections, two
    searchsorteds per side per shard, document text never read."""
    from dcs_ray.search import search_proximity

    idx = _index_dir(sf_dir, "trigram")
    t = search_proximity(idx, [("spark", "join")], window=40)
    return pa.table(
        {"doc_id": t["doc_id"].cast(pa.int64()), "n_pairs": t["n_pairs"]}
    ).sort_by("doc_id")


REGEX = "(spark|batch) (merge|join)"


def _q_regex_search(sf_dir: str) -> Any:
    """Full dcs query path: regex → trigram planner (F6) → candidate
    generation on the index → verify grep (F10) FUSED into the same
    per-shard task (candidates never touch the driver) → matching lines
    per doc (≤1 match/line, D3)."""
    from dcs_ray.grep import search_regex_fused

    idx = _index_dir(sf_dir, "trigram")
    ds = search_regex_fused(idx, f"{sf_dir}/documents.parquet", REGEX)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    if len(t) == 0:
        return pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64())]).empty_table()
    g = t.group_by("doc_id").aggregate([("line", "count_distinct")])
    return pa.table(
        {"doc_id": g["doc_id"].cast(pa.int64()), "n_lines": g["line_count_distinct"].cast(pa.int64())}
    ).sort_by("doc_id")


def _q_filter_ignored(sf_dir: str) -> ray.data.Dataset:
    """Ingest filter (dcs filter.Ignored F1, ``filter.go:74-125``):
    size caps + ignored-language predicate, vectorized."""
    from dcs_ray.filters import filter_ignored

    ds = filter_ignored(
        _docs(sf_dir), ignored_langs=("de",), min_chars=50, max_chars=100_000
    )
    return ds.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def _q_lang_stats(sf_dir: str) -> Any:
    from ray.data.aggregate import Count, Mean

    ds = _docs(sf_dir).groupby("lang").aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "lang": t["lang"],
            "n_docs": t["n_docs"].cast(pa.int64()),
            "avg_chars": pa.array(np.round(t["avg_chars"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_label_centroids(sf_dir: str) -> Any:
    """Per-label embedding centroid in long (label, dim) form — the
    class-prototype aggregate; per-batch partial sums, vectors never
    cross the exchange whole."""
    from dcs_ray.functions.simsearch import group_centroids

    ds = group_centroids(
        read_parquet_sized(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by([("label", "ascending"), ("dim", "ascending")])


def _q_knn(sf_dir: str) -> pa.Table:
    from dcs_ray.functions.simsearch import knn_cosine_bruteforce

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    t = knn_cosine_bruteforce(emb, np.array([q0]), k=10)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cos_sim": t["cos_sim"],
        }
    )


def _q_knn_classify(sf_dir: str) -> pa.Table:
    """kNN majority-vote label prediction for the first 5 embedding
    vectors (self excluded, k=10): brute-force cosine ranking + one
    broadcast-id label pass; ties by (count desc, label asc)."""
    from dcs_ray.functions.simsearch import knn_classify

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5)
    q = np.asarray(head["embedding"].to_pylist(), np.float64)
    ids = head["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return knn_classify(emb, q, ids, k=10)


def _q_centroid_classify(sf_dir: str) -> pa.Table:
    """Nearest-centroid (Rocchio) label prediction for the first 5
    embedding vectors: distributed per-label centroid aggregate, then a
    model-sized cosine argmax on the driver (ties → smallest label)."""
    from dcs_ray.functions.simsearch import centroid_classify

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5)
    q = np.asarray(head["embedding"].to_pylist(), np.float64)
    ids = head["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return centroid_classify(emb, q, ids)


def _q_embedding_outliers(sf_dir: str) -> pa.Table:
    """Embedding-quality triage: the 50 vectors least cosine-similar to
    their own label centroid — centroids broadcast once, one streaming
    scoring pass, per-block bottom-50 partials."""
    from dcs_ray.functions.simsearch import centroid_outlier_scores

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    return centroid_outlier_scores(emb, n=50)


def _q_knn_lsh(sf_dir: str) -> pa.Table:
    """ANN through a persistent bucket-partitioned LshAnnIndex with 4
    independent SRP tables; each query probes its 8 query-directed best
    buckets per table (~14%% of index rows), candidates deduped across
    tables. Oracle-gated end-to-end: ``_lsh_knn_sql`` replays the plane
    draws, per-table signatures, directed multiprobe mask ranking and
    the candidate top-k entirely in SQL."""
    from dcs_ray.functions.simsearch import knn_cosine_lsh

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    t = knn_cosine_lsh(
        emb, np.array([q0]), k=10, num_planes=6, num_tables=4, probe_t=8,
        index_dir=os.path.join(_CACHE_ROOT, f"{name}_lshann_l4"),
    )
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cos_sim": t["cos_sim"],
        }
    )


def _q_knn_ivf(sf_dir: str) -> pa.Table:
    """ANN through a persistent IVF index (spherical-k-means coarse
    quantizer, centroid-partitioned lists) — the query probes only its
    nprobe nearest lists."""
    from dcs_ray.functions.simsearch import knn_cosine_ivf

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    t = knn_cosine_ivf(
        emb, np.array([q0]), k=10, index_dir=os.path.join(_CACHE_ROOT, f"{name}_ivfann")
    )
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cos_sim": t["cos_sim"],
        }
    )


def _q_lsh_bucket_assignment(sf_dir: str) -> pa.Table:
    """The DETERMINISTIC half of the LSH ANN path, oracle-gated: build a
    single-table ``LshAnnIndex`` (seed 13, 6 planes) and read back the
    PERSISTED bucket-partitioned layout as (vec_id, bucket). The oracle
    replays the signed-random-projection signs in SQL with the plane
    values inlined as literals (same rng stream), so a hash match proves
    the index assigns every vector to the bucket the math says."""
    import glob
    import shutil
    import tempfile

    from dcs_ray.functions.simsearch import LshAnnIndex

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="dcs_lshgate_", dir="/tmp")
    try:
        LshAnnIndex.build(emb, tmp, num_planes=6, num_tables=1, seed=13)
        files = sorted(glob.glob(os.path.join(tmp, "bucket=*", "*.parquet")))
        idx = ray.data.read_parquet(files, include_paths=True)

        def unpart(b: pa.Table) -> pa.Table:
            buckets = [
                int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
                for p in b["path"].to_pylist()
            ]
            return pa.table(
                {
                    "vec_id": b["vec_id"].cast(pa.int64()),
                    "bucket": pa.array(buckets, pa.int64()),
                }
            )

        t = pa.concat_tables(
            [
                pa.table(b)
                for b in idx.map_batches(unpart, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        return t.sort_by("vec_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_ivf_list_assignment(sf_dir: str) -> pa.Table:
    """The DETERMINISTIC half of the IVF ANN path, oracle-gated: build an
    ``IvfAnnIndex`` with the hash-min init (centroids = the 8 corpus
    rows with smallest splitmix64(vec_id), zero Lloyd iterations) and
    read back the persisted list-partitioned layout as (vec_id, list).
    The oracle re-picks the centroids by the same integer hash chain and
    re-assigns every vector by cosine argmax in SQL — the real
    ``add_list`` assignment pass is what gets gated."""
    import glob
    import shutil
    import tempfile

    from dcs_ray.functions.simsearch import IvfAnnIndex

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="dcs_ivfgate_", dir="/tmp")
    try:
        IvfAnnIndex.build(emb, tmp, num_lists=8, n_iter=0, init="hash_min")
        files = sorted(glob.glob(os.path.join(tmp, "list=*", "*.parquet")))
        idx = ray.data.read_parquet(files, include_paths=True)

        def unpart(b: pa.Table) -> pa.Table:
            lists = [
                int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
                for p in b["path"].to_pylist()
            ]
            return pa.table(
                {
                    "vec_id": b["vec_id"].cast(pa.int64()),
                    "list": pa.array(lists, pa.int64()),
                }
            )

        t = pa.concat_tables(
            [
                pa.table(b)
                for b in idx.map_batches(unpart, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        return t.sort_by("vec_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_knn_ivf_hashmin(sf_dir: str) -> pa.Table:
    """The IVF QUERY path oracle-gated end-to-end: hash-min-init index
    (centroids = the 8 corpus rows with smallest splitmix64(vec_id),
    zero Lloyd iterations — the deterministic contract of
    ``ivf_list_assignment``), then the REAL ``IvfAnnIndex.query``:
    nprobe=3 nearest-centroid probe selection, partitioned scoring over
    only the probed lists, and the global (cos desc, id asc) merge. The
    SQL replays centroid pick, assignment, probe choice and top-k —
    so the probe-and-merge machinery itself is what gets gated (the
    production ``knn_cosine_ivf`` entry keeps the kmeans++ quantizer,
    whose sampled seeding is not SQL-expressible)."""
    from dcs_ray.functions.simsearch import IvfAnnIndex

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_ivfann_hm8")
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    if os.path.exists(os.path.join(out, "ivf_meta.json")):
        idx = IvfAnnIndex(out)
    else:
        idx = IvfAnnIndex.build(emb, out, num_lists=8, n_iter=0, init="hash_min")
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    t = idx.query(np.array([q0]), k=10, nprobe=3)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cos_sim": t["cos_sim"],
        }
    )


def _q_embedding_near_dup(sf_dir: str) -> pa.Table:
    from dcs_ray.functions.simsearch import near_dup_pairs_exact

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    return near_dup_pairs_exact(emb, threshold=0.42)


def _q_embedding_near_dup_lsh(sf_dir: str) -> pa.Table:
    """Sub-quadratic approximate near-dup pairs (OR-amplified SRP
    banding); recall vs the exact path is asserted in pytest, and the
    whole banded candidate generation + cosine verify is oracle-gated
    (``_near_dup_lsh_sql`` replays the size-aware banding closed form,
    the seed-13 planes, and the bucket self-join in SQL)."""
    from dcs_ray.functions.simsearch import near_dup_pairs_lsh

    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet")
    return near_dup_pairs_lsh(emb, threshold=0.42)


def _q_minhash_pairs(sf_dir: str) -> Any:
    """MinHash+LSH candidate pairs; the DuckDB oracle replays the whole
    hash chain bit-exactly (``_minhash_pairs_sql``). The engine's
    degenerate-bucket star-pair cap (>256 ids) never triggers at the
    oracle's sf0.01 scale, so clique output is exact there."""
    from dcs_ray.functions.dedup import minhash_candidate_pairs

    ds = minhash_candidate_pairs(_docs(sf_dir))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    if len(t) == 0:
        return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]).empty_table()
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _q_ngram_jaccard(sf_dir: str) -> Any:
    """Exact word-3-gram Jaccard near-dup pairs (inverted shingle join —
    set-similarity join, no all-pairs scan)."""
    from dcs_ray.functions.dedup import ngram_jaccard_pairs

    ds = ngram_jaccard_pairs(_docs(sf_dir), shingle_n=3, threshold=0.5)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    if len(t) == 0:
        return pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table()
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _q_duplicate_tile_spans(sf_dir: str) -> Any:
    """Exact duplicated-substring accounting (Lee et al. 2022 shape,
    tile-approximated): per doc, how many non-overlapping 32-byte tiles
    occur >=2 times corpus-wide. Gated bit-exact: the SQL replays the
    identical tile hash (FNV word fold + length salt + splitmix64) so
    even hash collisions agree."""
    from dcs_ray.functions.dedup import duplicate_tile_spans

    ds = duplicate_tile_spans(_docs(sf_dir), tile_bytes=32, min_count=2)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.select(["doc_id", "dup_tiles", "total_tiles"]).sort_by("doc_id")


def _q_asof_join(sf_dir: str) -> Any:
    """Backward as-of join: each purchase event picks up the latest
    prior (or simultaneous) view event of the same user."""
    from dcs_ray.functions.joins import asof_join

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "value": b["value"],
                "ts_us": pa.array(ts_us, pa.int64()),
            }
        )

    ev = ev.map_batches(prep, batch_format="pyarrow")

    def only(kind):
        return lambda b: b.filter(pa.compute.equal(b["event_type"], kind))

    left = ev.map_batches(only("purchase"), batch_format="pyarrow")
    right = ev.map_batches(only("view"), batch_format="pyarrow")
    out = asof_join(left, right, on="user_id", ts_col="ts_us",
                    right_cols=("event_id", "value"))
    t = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    return t.select(
        ["event_id", "user_id", "ts_us", "event_id_right", "value_right"]
    ).sort_by("event_id")


def _lsh_assignment_sql() -> str:
    """SQL replay of ``LshAnnIndex``'s SRP bucket assignment (seed 13,
    6 planes, dim 64): the plane values are inlined as double literals
    from the SAME rng stream the builder draws (``repr`` round-trips
    float64 exactly), bucket bit t = [dot(embedding, plane_t) > 0] —
    normalization cannot change a dot's sign, so the raw embedding
    replays the normalized builder bit-exactly."""
    num_planes, d = 6, 64
    tables = np.random.default_rng(13).standard_normal((1, num_planes, d))
    rows = ", ".join(
        "(%d, [%s])" % (t, ", ".join(repr(float(v)) for v in tables[0][t]))
        for t in range(num_planes)
    )
    return f"""
WITH p(t, pl) AS (VALUES {rows}),
e AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
d AS (SELECT e.vec_id, p.t, list_dot_product(e.ev, p.pl) AS dot FROM e CROSS JOIN p)
SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::bigint << t) ELSE 0 END)::bigint AS bucket
FROM d GROUP BY vec_id ORDER BY vec_id
"""


def _ivf_assignment_sql(num_lists: int = 8) -> str:
    """SQL replay of ``IvfAnnIndex``'s hash-min-init assignment pass:
    centroids = the ``num_lists`` rows with smallest
    (splitmix64(vec_id), vec_id) — the same integer hash chain as
    ``sketches._hash64_column`` — then every vector goes to its
    cosine-argmax centroid (ties to the lowest centroid id, matching
    ``np.argmax``)."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT vec_id, ((vec_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM embeddings),
h1 AS (SELECT vec_id, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT vec_id, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT vec_id, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
cent AS (
  SELECT list_transform(e.embedding, x -> x::double) AS ce,
         row_number() OVER (ORDER BY hf.h, e.vec_id) - 1 AS cid
  FROM embeddings e JOIN hf USING (vec_id)
  QUALIFY row_number() OVER (ORDER BY hf.h, e.vec_id) <= {num_lists}
),
v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
cos AS (SELECT v.vec_id, c.cid, list_cosine_similarity(v.ev, c.ce) AS cs
        FROM v CROSS JOIN cent c),
best AS (SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
         FROM cos)
SELECT vec_id, cid AS list FROM best WHERE rn = 1 ORDER BY vec_id
"""


def _srp_planes_values(tables: np.ndarray) -> str:
    """(t, b, pl) VALUES rows for an SRP plane tensor — ``repr`` round-
    trips float64 exactly, so the SQL sees bit-identical plane values."""
    t_n, b_n, _d = tables.shape
    return ", ".join(
        "(%d, %d, [%s])" % (t, b, ", ".join(repr(float(v)) for v in tables[t, b]))
        for t in range(t_n)
        for b in range(b_n)
    )


def _lsh_knn_sql(
    num_tables: int = 4, num_planes: int = 6, probe_t: int = 8, k: int = 10
) -> str:
    """Full SQL replay of ``knn_cosine_lsh`` (seed-13 multi-table index,
    query-directed multiprobe per Lv et al. VLDB'07): per table, the
    query's SRP signature plus the ``probe_t`` cheapest XOR-masks by
    summed |projection| of the flipped planes (ties to the smaller mask,
    matching the stable argsort over ascending masks); candidates are
    vectors whose per-table signature lands in a probed bucket, deduped
    across tables; exact cosine top-k over candidates. Signs and probe
    costs use RAW dots — normalization can change neither a dot's sign
    nor the cost ordering (a positive per-query scale)."""
    tables = np.random.default_rng(13).standard_normal((num_tables, num_planes, 64))
    return f"""
WITH p(t, b, pl) AS (VALUES {_srp_planes_values(tables)}),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe FROM embeddings WHERE vec_id = 0),
qp AS (SELECT p.t, p.b, list_dot_product(q.qe, p.pl) AS pr FROM p CROSS JOIN q),
qsig AS (SELECT t, sum(CASE WHEN pr > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS sig
         FROM qp GROUP BY t),
mc AS (SELECT qp.t, r.m::bigint AS mask,
              sum(CASE WHEN (r.m >> qp.b) & 1 = 1 THEN abs(qp.pr) ELSE 0 END) AS cost
       FROM range({1 << num_planes}) r(m) CROSS JOIN qp GROUP BY qp.t, r.m),
probes AS (SELECT mc.t, xor(mc.mask::ubigint, qsig.sig::ubigint)::bigint AS bucket
           FROM mc JOIN qsig USING (t)
           QUALIFY row_number() OVER (PARTITION BY mc.t ORDER BY mc.cost ASC, mc.mask ASC)
                   <= {probe_t}),
vd AS (SELECT e.vec_id, p.t, p.b,
              list_dot_product(list_transform(e.embedding, x -> x::double), p.pl) AS dot
       FROM embeddings e CROSS JOIN p),
vsig AS (SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS sig
         FROM vd GROUP BY vec_id, t),
cand AS (SELECT DISTINCT v.vec_id FROM vsig v JOIN probes pr ON v.t = pr.t AND v.sig = pr.bucket),
sims AS (SELECT c.vec_id,
                list_cosine_similarity(list_transform(e.embedding, x -> x::double), q.qe) AS cs
         FROM cand c JOIN embeddings e USING (vec_id) CROSS JOIN q)
SELECT row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cs, 6) AS cos_sim
FROM sims ORDER BY cs DESC, vec_id ASC LIMIT {k}
"""


def _near_dup_lsh_sql(threshold: float = 0.42) -> str:
    """Full SQL replay of ``near_dup_pairs_lsh`` at the gate's corpus
    size: the SIZE-AWARE banding resolves to bits_per_table=2 /
    num_tables=6 for n=500 (the same closed-form the engine derives from
    its metadata row count), planes from the same seed-13 stream;
    candidate pairs share a (table, 2-bit sig) bucket, verified at
    cosine >= threshold. Buckets stay far below the 4096 cap at this n,
    so the capped-bucket path contributes nothing."""
    n_rows, max_bucket, target_recall = 500, 4096, 0.95
    bits = int(np.clip(np.ceil(np.log2(max(4.0 * n_rows / max_bucket, 4.0))), 2, 24))
    p_col = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    pb = max(p_col**bits, 1e-12)
    num_tables = int(
        np.clip(np.ceil(np.log(max(1.0 - target_recall, 1e-9)) / np.log(1.0 - pb)), 2, 64)
    )
    planes = np.random.default_rng(13).standard_normal((num_tables * bits, 64))
    rows = ", ".join(
        "(%d, [%s])" % (j, ", ".join(repr(float(v)) for v in planes[j]))
        for j in range(num_tables * bits)
    )
    return f"""
WITH p(j, pl) AS (VALUES {rows}),
e AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
vd AS (SELECT e.vec_id, p.j, CASE WHEN list_dot_product(e.ev, p.pl) > 0 THEN 1 ELSE 0 END AS bit
       FROM e CROSS JOIN p),
sigs AS (SELECT vec_id, j // {bits} AS t,
                sum(bit * (1::bigint << (j % {bits})))::bigint AS sig
         FROM vd GROUP BY vec_id, j // {bits}),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
sims AS (SELECT c.id_a, c.id_b, list_cosine_similarity(ea.ev, eb.ev) AS cs
         FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b)
SELECT id_a::bigint AS id_a, id_b::bigint AS id_b, round(cs, 6) AS cos_sim
FROM sims WHERE cs >= {threshold!r} ORDER BY id_a, id_b
"""


def _ivf_knn_hashmin_sql(num_lists: int = 8, nprobe: int = 3, k: int = 10) -> str:
    """SQL replay of the IVF QUERY path over the hash-min index: the
    centroid pick and cosine-argmax assignment of
    ``_ivf_assignment_sql``, plus the query's nprobe nearest-centroid
    probe (ties to the lower cid) and the exact top-k over vectors in
    probed lists — the same (cos desc, id asc) merge as the engine."""
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT vec_id, ((vec_id::hugeint + {GOLDEN}) % {_M64}) AS x0 FROM embeddings),
h1 AS (SELECT vec_id, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT vec_id, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT vec_id, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
cent AS (
  SELECT list_transform(e.embedding, x -> x::double) AS ce,
         row_number() OVER (ORDER BY hf.h, e.vec_id) - 1 AS cid
  FROM embeddings e JOIN hf USING (vec_id)
  QUALIFY row_number() OVER (ORDER BY hf.h, e.vec_id) <= {num_lists}
),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe FROM embeddings WHERE vec_id = 0),
probe AS (SELECT cid FROM (SELECT c.cid, list_cosine_similarity(q.qe, c.ce) AS cs
                           FROM cent c CROSS JOIN q)
          ORDER BY cs DESC, cid ASC LIMIT {nprobe}),
v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
assign AS (SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_cosine_similarity(v.ev, c.ce) DESC, c.cid ASC) AS rn
    FROM v CROSS JOIN cent c) WHERE rn = 1),
cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe)),
sims AS (SELECT c.vec_id, list_cosine_similarity(v.ev, q.qe) AS cs
         FROM cand c JOIN v USING (vec_id) CROSS JOIN q)
SELECT row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cs, 6) AS cos_sim
FROM sims ORDER BY cs DESC, vec_id ASC LIMIT {k}
"""


def _splitmix_docs_ctes(seed: int) -> str:
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
h0 AS (SELECT *, xor(doc_id::ubigint, {seed}::ubigint)::hugeint AS x0 FROM documents),
h1 AS (SELECT *, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT *, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT *, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2)"""


def _interleave_sql(k: int, seed: int) -> str:
    """Unrolled team-draft rounds (the ``team_draft_interleave``
    oracle): expects CTEs ``ra`` / ``rb`` with (doc_id, rank). Coin per
    pick index via the GOLDEN-add splitmix64 chain; at each round the
    team with fewer picks selects its best unpicked doc, coin breaking
    balance ties (heads=0 → team A)."""
    M64 = "18446744073709551616"
    GOLDEN = 0x9E3779B97F4A7C15
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    parts = [
        f"""c0 AS (SELECT s, ((s::hugeint + {seed} + {GOLDEN}) % {M64}) AS x0
      FROM (SELECT unnest(range({k})) AS s)),
c1 AS (SELECT s, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM c0),
c2 AS (SELECT s, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM c1),
coins AS MATERIALIZED (SELECT s, (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 2)::bigint AS coin FROM c2),
sel0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS team WHERE FALSE)"""
    ]
    for i in range(k):
        parts.append(f"""nA{i} AS MATERIALIZED (SELECT doc_id FROM ra
       WHERE doc_id NOT IN (SELECT doc_id FROM sel{i})
       ORDER BY rank LIMIT 1),
nB{i} AS MATERIALIZED (SELECT doc_id FROM rb
       WHERE doc_id NOT IN (SELECT doc_id FROM sel{i})
       ORDER BY rank LIMIT 1),
use{i} AS MATERIALIZED (SELECT EXISTS (SELECT 1 FROM nA{i}) AND (
             NOT EXISTS (SELECT 1 FROM nB{i})
             OR (SELECT count(*) FILTER (WHERE team = 0) FROM sel{i})
                < (SELECT count(*) FILTER (WHERE team = 1) FROM sel{i})
             OR ((SELECT count(*) FILTER (WHERE team = 0) FROM sel{i})
                 = (SELECT count(*) FILTER (WHERE team = 1) FROM sel{i})
                 AND (SELECT coin FROM coins WHERE s = {i}) = 0)
           ) AS a),
pick{i} AS MATERIALIZED (
  SELECT {i + 1}::bigint AS pos, doc_id, 0::bigint AS team FROM nA{i}
  WHERE (SELECT a FROM use{i})
  UNION ALL
  SELECT {i + 1}::bigint, doc_id, 1::bigint FROM nB{i}
  WHERE NOT (SELECT a FROM use{i})),
sel{i + 1} AS MATERIALIZED (SELECT doc_id, team FROM sel{i}
            UNION ALL SELECT doc_id, team FROM pick{i})""")
    rounds = ",\n".join(parts)
    final = "\nUNION ALL ".join(
        f"SELECT pos, doc_id, team FROM pick{i}" for i in range(k)
    )
    return f"{rounds}\n{final}\nORDER BY pos"


def _hll_registers_sql() -> str:
    """Integer-SQL replay of the HLL fold over events.user_id (p=12):
    splitmix64 via 32-bit-limb mulmod, then a halving bit-length ladder
    for the leading-zero rank — no floats anywhere."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    ladder = "\n".join(
        f"r{i+1} AS (SELECT reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )
    return f"""
WITH h0 AS (SELECT ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM events WHERE user_id IS NOT NULL),
h1 AS (SELECT ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT (h // {1 << 52})::bigint AS reg, (h * 4096) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6)
SELECT reg, max(least(64 - bitlen + 1, 53))::bigint AS rank FROM rf GROUP BY reg ORDER BY reg
"""


def _kmv_sql(k: int = 8) -> str:
    """Integer-SQL replay of the KMV bottom-k distinct sketch over
    events.user_id: the same splitmix64 chain as ``_hll_registers_sql``,
    DISTINCT, ORDER BY, LIMIT k — then the (k−1)·2⁶⁴/h₍ₖ₎ estimator
    with the exact small-cardinality branch."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM events WHERE user_id IS NOT NULL),
h1 AS (SELECT ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
bk AS (SELECT DISTINCT h FROM hf ORDER BY h LIMIT {k}),
s AS (SELECT count(*)::bigint AS n_kept, max(h) AS kth FROM bk)
SELECT n_kept,
       (kth // 4294967296)::bigint AS kth_hi,
       (kth % 4294967296)::bigint AS kth_lo,
       round(CASE WHEN n_kept < {k} THEN n_kept::double
                  ELSE {k - 1} * {M64}.0 / kth::double END, 6) AS est_distinct
FROM s
"""


def _q_sample_fraction(sf_dir: str) -> Any:
    """Deterministic ~20% subsample of documents (splitmix64(id^seed)
    threshold) — reproducible across runs/cluster sizes, no shuffle."""
    from dcs_ray.functions.sampling import sample_fraction

    ds = sample_fraction(_docs(sf_dir), 0.2, seed=42)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_sample_stratified(sf_dir: str) -> Any:
    """Deterministic 5-per-language sample (smallest (hash,id) per
    stratum; per-batch combiner then one small groupby)."""
    from dcs_ray.functions.sampling import sample_stratified

    ds = sample_stratified(_docs(sf_dir), "lang", 5, seed=1)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_pricing_summary(sf_dir: str) -> Any:
    """TPC-H-Q1-style pricing summary over lineitem: per-batch combiner
    collapses each batch to <=|groups| partial rows of integer-scaled
    sums (exact, order-independent), then one tiny groupby merges
    partials — the corpus never enters the shuffle."""
    import datetime

    from dcs_ray.functions.relational import combiner_groupby

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = datetime.date(1998, 9, 2)

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(cutoff)))
        q = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        t = np.round(b["l_tax"].to_numpy() * 100).astype(np.int64)
        disc = p * (100 - d)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "q100": pa.array(q, pa.int64()),
                "p100": pa.array(p, pa.int64()),
                "d100": pa.array(d, pa.int64()),
                "disc1e4": pa.array(disc, pa.int64()),
                "charge1e6": pa.array(disc * (100 + t), pa.int64()),
            }
        )

    agg = combiner_groupby(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["q100", "p100", "d100", "disc1e4", "charge1e6"],
    )
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")])
    n = t["n_rows"].to_numpy().astype(np.int64)
    q100 = t["q100"].to_numpy().astype(np.int64)
    p100 = t["p100"].to_numpy().astype(np.int64)
    d100 = t["d100"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pa.array(q100 / 100.0, pa.float64()),
            "sum_base_price": pa.array(p100 / 100.0, pa.float64()),
            "sum_disc_price": pa.array(t["disc1e4"].to_numpy() / 10000.0, pa.float64()),
            "sum_charge": pa.array(t["charge1e6"].to_numpy() / 1000000.0, pa.float64()),
            "avg_qty": pa.array(np.round(q100 / (100.0 * n), 6), pa.float64()),
            "avg_price": pa.array(np.round(p100 / (100.0 * n), 6), pa.float64()),
            "avg_disc": pa.array(np.round(d100 / (100.0 * n), 6), pa.float64()),
            "count_order": pa.array(n, pa.int64()),
        }
    ).sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def _q_order_totals_by_nation(sf_dir: str) -> Any:
    """orders ⋈ customer ⋈ nation via two broadcast joins (dimension
    sides ray.put once, probed per batch) + combiner groupby."""
    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       small_cols=("c_nationkey",))
    j = broadcast_join(j, nation, on="c_nationkey", right_on="n_nationkey",
                       small_cols=("n_name",))

    def prep(b: pa.Table) -> pa.Table:
        p = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"n_name": b["n_name"], "p100": pa.array(p, pa.int64())})

    agg = combiner_groupby(j.map_batches(prep, batch_format="pyarrow"),
                           ["n_name"], ["p100"])
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "n_name": t["n_name"],
            "n_orders": t["n_rows"].cast(pa.int64()),
            "total_price": pa.array(t["p100"].to_numpy() / 100.0, pa.float64()),
        }
    ).sort_by("n_name")


def _q_shipping_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q3-style shipping priority: segment-filtered customers
    broadcast-semi-join orders (date-pruned at the read), the one
    big⋈big hop is lineitem ⋈ orders via hash-partitioned
    ``shuffle_join``, revenue in exact integer 1e-4 units, per-order
    combiner groupby, then per-block local top-10 before the driver
    merge — the driver never sees more than 10 rows per block."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import (
        broadcast_join, combiner_groupby, shuffle_join,
    )

    cut = datetime.datetime(1995, 3, 15)
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cut,
    )
    orders_b = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey", small_cols=()
    ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cut,
    )
    j = shuffle_join(li, orders_b, on="l_orderkey", right_on="o_orderkey")

    def prep(b: pa.Table) -> pa.Table:
        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "o_orderdate": b["o_orderdate"],
                "o_orderpriority": b["o_orderpriority"],
                "rev1e4": pa.array(p * (100 - d), pa.int64()),
            }
        )

    agg = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        ["rev1e4"],
    )
    order = [
        ("rev1e4", "descending"),
        ("o_orderdate", "ascending"),
        ("l_orderkey", "ascending"),
    ]

    def local_top(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 10)

    parts = [
        pa.table(b)
        for b in agg.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts).sort_by(order).slice(0, 10)
    return pa.table(
        {
            "l_orderkey": merged["l_orderkey"].cast(pa.int64()),
            "revenue": pa.array(
                merged["rev1e4"].to_numpy() / 10000.0, pa.float64()
            ),
            "o_orderdate": merged["o_orderdate"],
            "o_orderpriority": merged["o_orderpriority"],
        }
    )


def _q_price_model(sf_dir: str) -> pa.Table:
    """Distributed OLS training: fit extendedprice_cents ~ quantity +
    discount_pct + tax_pct over lineitem via the integer moment-matrix
    fold (one exact int64 XᵀX per batch, order-independent sum), then
    a Cramer solve whose fixed-order float expansion the oracle
    replays term for term — distributed model TRAINING with a
    bit-exact SQL gate."""
    from dcs_ray.functions.linreg import linreg_fit_int

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qty": pa.array(
                    np.round(b["l_quantity"].to_numpy()).astype(np.int64), pa.int64()
                ),
                "disc_pct": pa.array(
                    np.round(b["l_discount"].to_numpy() * 100).astype(np.int64),
                    pa.int64(),
                ),
                "tax_pct": pa.array(
                    np.round(b["l_tax"].to_numpy() * 100).astype(np.int64), pa.int64()
                ),
                "y_cents": pa.array(
                    np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return linreg_fit_int(
        li.map_batches(prep, batch_format="pyarrow"),
        ["qty", "disc_pct", "tax_pct"],
        "y_cents",
    )


def _price_model_sql() -> str:
    """SQL replay of the OLS fit: integer moments, then Cramer with the
    SAME fixed-order float det expansion as the engine."""
    from dcs_ray.functions.linreg import det_sql

    p = 4

    def mn(i: int, j: int) -> str:
        return f"m_{min(i, j)}_{max(i, j)}"

    base = [[mn(i, j) for j in range(p)] for i in range(p)]
    det_base = det_sql(base)
    feats = ["intercept", "qty", "disc_pct", "tax_pct"]
    selects = []
    for i, name in enumerate(feats):
        names_i = [
            [f"v_{r}" if j == i else base[r][j] for j in range(p)]
            for r in range(p)
        ]
        selects.append(
            f"SELECT {i} AS ord, '{name}' AS feature,\n"
            f"  round(({det_sql(names_i)}) / ({det_base}), 6) AS coef FROM m"
        )
    xs = ["1", "x1", "x2", "x3"]
    moments = ",\n    ".join(
        f"sum({xs[i]} * {xs[j]})::bigint AS m_{i}_{j}"
        for i in range(p)
        for j in range(i, p)
    )
    vs = ",\n    ".join(f"sum({xs[i]} * y)::bigint AS v_{i}" for i in range(p))
    return f"""
WITH f AS (
  SELECT round(l_quantity)::bigint AS x1,
         round(l_discount * 100)::bigint AS x2,
         round(l_tax * 100)::bigint AS x3,
         round(l_extendedprice * 100)::bigint AS y
  FROM lineitem),
m AS (SELECT
    {moments},
    {vs}
  FROM f)
SELECT feature, coef FROM (
{chr(10).join("UNION ALL " + s if n else s for n, s in enumerate(selects))}
) ORDER BY ord
"""


def _q_langid_model(sf_dir: str) -> pa.Table:
    """Distributed logistic-regression TRAINING (full-batch GD, 5
    iterations): predict lang=='en' from (n_tokens, n_stopwords). One
    partial-gradient row per block per iteration, canonical fold
    order; the oracle replays every iteration's gradient and update in
    chained CTEs with the engine's expression tree."""
    import pyarrow.compute as pc

    from dcs_ray.functions.linreg import logreg_fit_gd
    from dcs_ray.functions.textstats import quality_score_batch

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def prep(b: pa.Table) -> pa.Table:
        q = quality_score_batch(b)
        y = pc.equal(b["lang"], "en").cast(pa.int64())
        return pa.table(
            {
                "n_tokens": q["n_tokens"],
                "n_stop": q["n_stopwords"],
                "y": y,
            }
        )

    return logreg_fit_gd(
        docs.map_batches(prep, batch_format="pyarrow"),
        ["n_tokens", "n_stop"],
        "y",
        n_iter=5,
        lr=1e-3,
    )


def _logreg_sql(n_iter: int = 5, lr: float = 1e-3) -> str:
    """Every GD iteration replayed in chained CTEs: z and the update use
    the engine's left-associated expression tree; coefficients compared
    after the final round(·, 6)."""
    parts = [
        f"""tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop
  FROM tok GROUP BY doc_id),
f AS (
  SELECT coalesce(a.n_tokens, 0)::double AS x1,
         coalesce(a.n_stop, 0)::double AS x2,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents d LEFT JOIN agg a USING (doc_id)),
nn AS (SELECT count(*)::double AS n FROM f),
b0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""g{t} AS (
  SELECT sum(1.0 * r) AS g0, sum(x1 * r) AS g1, sum(x2 * r) AS g2 FROM (
    SELECT x1, x2,
           (1.0 / (1.0 + exp(-(((b.b0 * 1.0) + (b.b1 * x1)) + (b.b2 * x2)))) - y) AS r
    FROM f, b{t} b)),
b{t + 1} AS (
  SELECT (b.b0 - {lr!r} * (g.g0 / (SELECT n FROM nn))) AS b0,
         (b.b1 - {lr!r} * (g.g1 / (SELECT n FROM nn))) AS b1,
         (b.b2 - {lr!r} * (g.g2 / (SELECT n FROM nn))) AS b2
  FROM b{t} b, g{t} g)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT feature, coef FROM (
  SELECT 0 AS ord, 'intercept' AS feature, round(b0, 6) AS coef FROM b{n_iter}
  UNION ALL SELECT 1, 'n_tokens', round(b1, 6) FROM b{n_iter}
  UNION ALL SELECT 2, 'n_stop', round(b2, 6) FROM b{n_iter}
) ORDER BY ord"""
    )


def _q_lineitem_corr(sf_dir: str) -> pa.Table:
    """Distributed Pearson correlation matrix over lineitem numerics
    (integer-scaled): exact int64 moment fold, closed form evaluated
    with the oracle's exact expression tree. Price in whole dollars so
    Σx² stays inside the exact int→double window at bench scales."""
    from dcs_ray.functions.linreg import corr_matrix_int

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qty": pa.array(
                    np.round(b["l_quantity"].to_numpy()).astype(np.int64), pa.int64()
                ),
                "disc_pct": pa.array(
                    np.round(b["l_discount"].to_numpy() * 100).astype(np.int64),
                    pa.int64(),
                ),
                "tax_pct": pa.array(
                    np.round(b["l_tax"].to_numpy() * 100).astype(np.int64), pa.int64()
                ),
                "price_usd": pa.array(
                    np.round(b["l_extendedprice"].to_numpy()).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return corr_matrix_int(
        li.map_batches(prep, batch_format="pyarrow"),
        ["qty", "disc_pct", "tax_pct", "price_usd"],
    )


def _corr_sql() -> str:
    """SQL replay of the correlation fold: integer moments, then the
    engine's exact float expression per pair."""
    cols = ["qty", "disc_pct", "tax_pct", "price_usd"]
    p = len(cols)
    moments = ",\n    ".join(
        [f"sum(x{i})::bigint AS s_{i}" for i in range(p)]
        + [
            f"sum(x{i} * x{j})::bigint AS q_{i}_{j}"
            for i in range(p)
            for j in range(i, p)
        ]
    )
    selects = []
    for i in range(p):
        for j in range(i + 1, p):
            num = f"((n::double * q_{i}_{j}::double) - (s_{i}::double * s_{j}::double))"
            da = f"sqrt((n::double * q_{i}_{i}::double) - (s_{i}::double * s_{i}::double))"
            db = f"sqrt((n::double * q_{j}_{j}::double) - (s_{j}::double * s_{j}::double))"
            selects.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,\n"
                f"  round({num} / ({da} * {db}), 6) AS corr FROM m"
            )
    body = "\nUNION ALL ".join(selects)
    return f"""
WITH f AS (
  SELECT round(l_quantity)::bigint AS x0,
         round(l_discount * 100)::bigint AS x1,
         round(l_tax * 100)::bigint AS x2,
         round(l_extendedprice)::bigint AS x3
  FROM lineitem),
m AS (SELECT count(*)::bigint AS n,
    {moments}
  FROM f)
SELECT * FROM (
{body}
) ORDER BY col_a, col_b
"""


def _q_kmeans(sf_dir: str) -> pa.Table:
    """Distributed k-means training (Lloyd's, k=4, 3 iterations) over
    the embeddings table: centroids broadcast per iteration, one
    ≤k-row partial per block, k·d-sized exchange. The oracle replays
    seeding, every assignment (argmin, ties to smallest cid), every
    mean update, and empty-cluster carry-over in chained CTEs."""
    from dcs_ray.functions.kmeans import kmeans_fit

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_fit(emb, k=4, n_iter=3)


def _kmeans_parts(k: int = 4, n_iter: int = 3, dim: int = 64) -> list[str]:
    """Shared CTE chain for the k-means replays: seeding + per-iteration
    distance / argmin / mean steps, ending at centroids ``c{n_iter}``."""
    parts = [
        f"""e AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) i),
seeds AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::bigint AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0 AS MATERIALIZED (SELECT s.cid, e.dim, e.v FROM e JOIN seeds s USING (vec_id))"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{t} c USING (dim) GROUP BY e.vec_id, c.cid),
a{t} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{t}) WHERE rn = 1),
c{t + 1} AS MATERIALIZED (
  SELECT a.cid, e.dim, sum(e.v) / count(*) AS v
  FROM e JOIN a{t} a USING (vec_id) GROUP BY a.cid, e.dim
  UNION ALL
  SELECT c.cid, c.dim, c.v FROM c{t} c
  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM a{t}))"""
        )
    return parts


def _kmeans_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """k-means replay: long-form embeddings, per-iteration distance /
    argmin / mean CTEs; sizes from the final assignment."""
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sz AS (SELECT cid, count(*)::bigint AS n FROM a{n_iter - 1} GROUP BY cid)
SELECT c.cid, coalesce(z.n, 0)::bigint AS n_members, c.dim,
       round(c.v, 6) AS centroid
FROM c{n_iter} c LEFT JOIN sz z USING (cid)
ORDER BY c.cid, c.dim"""
    )


def _kmeans_db_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Davies–Bouldin replay: one more assignment pass against the
    FINAL centroids c{n_iter}, per-cluster mean member distance,
    centroid-pair separations, the worst (S_i+S_j)/M_ij term per
    cluster, and their mean (mirrors ``functions/kmeans.davies_bouldin``)."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df) WHERE rn = 1),
sc AS (SELECT cid, count(*)::bigint AS n_members,
              sum(sqrt(dist)) / count(*) AS s FROM af GROUP BY cid),
mm AS (SELECT a.cid AS ci, b.cid AS cj,
              sqrt(sum((a.v - b.v) * (a.v - b.v))) AS m
       FROM c{n} a JOIN c{n} b USING (dim)
       WHERE a.cid <> b.cid GROUP BY a.cid, b.cid),
dbt AS (SELECT sa.cid, sa.n_members, sa.s,
               max((sa.s + sb.s) / mm.m) AS term
        FROM sc sa JOIN mm ON mm.ci = sa.cid JOIN sc sb ON sb.cid = mm.cj
        GROUP BY sa.cid, sa.n_members, sa.s)
SELECT cid, n_members, round(s, 6) AS scatter, round(term, 6) AS db_term,
       round((SELECT sum(term) / count(*) FROM dbt), 6) AS db_index
FROM dbt ORDER BY cid"""
    )


def _kmeans_ch_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Calinski–Harabasz replay: final-centroid assignment pass (df/af
    as in the DB oracle), W = Σ assigned squared distance, grand mean
    per dim, B = Σ n_i‖c_i − x̄‖², CH = (B/(k−1))/(W/(N−k)) over
    NON-EMPTY clusters (mirrors ``functions/kmeans.calinski_harabasz``)."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df) WHERE rn = 1),
wss AS (SELECT sum(dist) AS w, count(*)::bigint AS n FROM af),
gm AS (SELECT dim, sum(v) / count(*) AS v FROM e GROUP BY dim),
sz AS (SELECT cid, count(*)::bigint AS n FROM af GROUP BY cid),
cd AS (SELECT c.cid, sum((c.v - g.v) * (c.v - g.v)) AS d2
       FROM c{n} c JOIN gm g USING (dim) GROUP BY c.cid),
bss AS (SELECT sum(z.n * cd.d2) AS b, count(*)::bigint AS k FROM sz z JOIN cd USING (cid))
SELECT wss.n AS n_points, bss.k AS k_clusters,
       round(wss.w, 6) + 0.0 AS within_ss,
       round(bss.b, 6) + 0.0 AS between_ss,
       round((bss.b / (bss.k - 1)) / (wss.w / (wss.n - bss.k)), 6) + 0.0 AS ch_index
FROM wss, bss"""
    )


def _kmeans_sil_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Simplified-silhouette replay: the rn=1 (assigned) and rn=2
    (runner-up) rows of the final-centroid distance CTE give a and b
    per point; s = (b−a)/max(a,b) with the 0/0 → 0 guard, averaged per
    cluster and overall."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
r AS MATERIALIZED (
  SELECT vec_id, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM df),
s AS (SELECT r1.vec_id, r1.cid, sqrt(r1.dist) AS a, sqrt(r2.dist) AS b
      FROM r r1 JOIN r r2 ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2),
v AS (SELECT cid,
             CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                  ELSE 0.0 END AS s
      FROM s),
percl AS (SELECT cid, count(*)::bigint AS n_members, sum(s) / count(*) AS ms
          FROM v GROUP BY cid),
ov AS (SELECT sum(s) / count(*) AS o FROM v)
SELECT cid, n_members, round(ms, 6) + 0.0 AS mean_silhouette,
       round((SELECT o FROM ov), 6) + 0.0 AS overall_silhouette
FROM percl ORDER BY cid"""
    )


def _q_pca(sf_dir: str) -> pa.Table:
    """Distributed PCA (top principal component) over embeddings: one
    covariance-moment fold pass (d(d+3)/2-float partials), 10 power
    iterations driver-side; the oracle replays moments, every matvec +
    L2 normalize, the sign rule, and the Rayleigh eigenvalue."""
    from dcs_ray.functions.kmeans import pca_top_component

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pca_top_component(emb, n_iter=10)


def _pca_sql(n_iter: int = 10, dim: int = 64) -> str:
    """PCA replay: long-form embeddings, covariance via a self-join,
    chained matvec/normalize CTEs with the engine's expression tree."""
    parts = [
        f"""el AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) i),
nn AS (SELECT count(*)::double AS n FROM embeddings),
mu AS MATERIALIZED (
  SELECT dim, sum(v) / (SELECT n FROM nn) AS m FROM el GROUP BY dim),
q AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, sum(a.v * b.v) AS q
  FROM el a JOIN el b USING (vec_id) GROUP BY a.dim, b.dim),
cov AS MATERIALIZED (
  SELECT q.i, q.j, (q.q / (SELECT n FROM nn)) - (ma.m * mb.m) AS v
  FROM q JOIN mu ma ON ma.dim = q.i JOIN mu mb ON mb.dim = q.j),
w0 AS (SELECT dim, (1.0 / sqrt({dim}.0)) AS v FROM mu)"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""u{t} AS MATERIALIZED (
  SELECT c.i AS dim, sum(c.v * w.v) AS u
  FROM cov c JOIN w{t} w ON c.j = w.dim GROUP BY c.i),
nrm{t} AS (SELECT sqrt(sum(u * u)) AS s FROM u{t}),
w{t + 1} AS MATERIALIZED (
  SELECT dim, u / (SELECT s FROM nrm{t}) AS v FROM u{t})"""
        )
    T = n_iter
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
lead AS (SELECT v FROM w{T} ORDER BY abs(v) DESC, dim ASC LIMIT 1),
sgn AS (SELECT CASE WHEN (SELECT v FROM lead) < 0.0 THEN -1.0 ELSE 1.0 END AS s),
vf AS MATERIALIZED (SELECT dim, v * (SELECT s FROM sgn) AS v FROM w{T}),
cv AS (SELECT c.i AS dim, sum(c.v * f.v) AS u
       FROM cov c JOIN vf f ON c.j = f.dim GROUP BY c.i),
eig AS (SELECT sum(f.v * c.u) AS e FROM vf f JOIN cv c USING (dim))
SELECT dim, round(v, 6) AS loading,
       round((SELECT e FROM eig), 6) AS eigenvalue
FROM vf ORDER BY dim"""
    )


def _q_customer_returns(sf_dir: str) -> pa.Table:
    """TPC-H-Q10-style returned-item report: revenue lost to returns
    per customer in 1996Q1, top-20. Returnflag + date predicates pushed
    into the scans; lineitem ⋈ orders is the one hash-partitioned
    big⋈big hop; the per-customer aggregate (customer-sized) joins
    customer via a second shuffle_join and nation via broadcast;
    revenue in exact integer 1e-4 units; per-block local top-20."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import (
        broadcast_join, combiner_groupby, shuffle_join,
    )

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    )
    j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def prep(b: pa.Table) -> pa.Table:
        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "rev1e4": pa.array(p * (100 - d), pa.int64()),
            }
        )

    per_cust = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"), ["o_custkey"], ["rev1e4"]
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    jc = shuffle_join(per_cust, cust, on="o_custkey", right_on="c_custkey")
    nat = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    jn = broadcast_join(
        jc, nat, on="c_nationkey", right_on="n_nationkey", small_cols=("n_name",)
    )
    order = [("rev1e4", "descending"), ("o_custkey", "ascending")]

    def local_top(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 20)

    parts = [
        pa.table(b)
        for b in jn.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts).sort_by(order).slice(0, 20)
    return pa.table(
        {
            "c_custkey": merged["o_custkey"].cast(pa.int64()),
            "c_name": merged["c_name"],
            "revenue": pa.array(merged["rev1e4"].to_numpy() / 10000.0, pa.float64()),
            "c_acctbal": merged["c_acctbal"],
            "n_name": merged["n_name"],
        }
    )


def _q_promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q14-style promotion effect: share of January-1996 revenue
    from PROMO parts. The date predicate is pushed into the lineitem
    scan; lineitem ⋈ part is the hash-partitioned big⋈big hop; both
    revenue sums fold as exact 1e-4 integers so the single output
    division is the only float."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import shuffle_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 2, 1)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    j = shuffle_join(li, part, on="l_partkey", right_on="p_partkey")

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = p * (100 - d)
        promo = pc.equal(b["p_type"], "PROMO").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_rev1e4": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_rev1e4": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    pr = tot = 0
    for b in j.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        pr += int(np.sum(t["promo_rev1e4"].to_numpy()))
        tot += int(np.sum(t["total_rev1e4"].to_numpy()))
    pct = (100.0 * pr) / tot if tot else 0.0
    return pa.table(
        {
            "promo_rev1e4": pa.array([pr], pa.int64()),
            "total_rev1e4": pa.array([tot], pa.int64()),
            "promo_pct": pa.array([round(pct, 6)], pa.float64()),
        }
    )


def _q_large_orders(sf_dir: str) -> pa.Table:
    """TPC-H-Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds 100 units, top-20 by (o_totalprice desc,
    o_orderkey). The quantity fold is a combiner groupby in exact 1e-2
    integer units; the qualifying-order set (tiny by construction) is
    broadcast back as a semi-join filter on orders."""
    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def prep(b: pa.Table) -> pa.Table:
        q = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "q1e2": pa.array(q, pa.int64())}
        )

    per_order = combiner_groupby(
        li.map_batches(prep, batch_format="pyarrow"), ["l_orderkey"], ["q1e2"]
    ).map_batches(
        lambda b: b.filter(
            pa.array(b["q1e2"].to_numpy() > 100 * 100)
        ).select(["l_orderkey", "q1e2"]),
        batch_format="pyarrow",
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    j = broadcast_join(
        orders, per_order, on="o_orderkey", right_on="l_orderkey",
        small_cols=("q1e2",),
    )
    parts = [
        pa.table(b) for b in j.iter_batches(batch_format="pyarrow")
    ]
    t = pa.concat_tables(parts)
    price = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    keys = t["o_orderkey"].to_numpy().astype(np.int64)
    order = np.lexsort((keys, -price))[:20]
    take = pa.array(order)
    return pa.table(
        {
            "o_orderkey": t["o_orderkey"].combine_chunks().take(take),
            "o_custkey": t["o_custkey"].combine_chunks().take(take),
            "o_orderdate": t["o_orderdate"].combine_chunks().take(take),
            "o_totalprice": t["o_totalprice"].combine_chunks().take(take),
            "total_qty": pa.array(
                t["q1e2"].to_numpy(zero_copy_only=False)[order] / 100.0,
                pa.float64(),
            ),
        }
    )


def _q_local_supplier_volume(sf_dir: str) -> Any:
    """TPC-H-Q5-style local supplier volume — the full 6-table chain:
    region→nation dims broadcast, customers semi-filtered to the
    region, date-pruned orders scan, lineitem ⋈ orders via the
    hash-partitioned ``shuffle_join`` (the one big⋈big hop), supplier
    broadcast, same-nation (customer == supplier) condition applied
    per batch, integer-scaled revenue combiner groupby by nation. Only
    |nations|-sized rows ever reach the driver."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import (
        broadcast_join, combiner_groupby, shuffle_join,
    )

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    region = read_parquet_sized(
        f"{sf_dir}/region.parquet", columns=["r_regionkey"],
        filter=pads.field("r_name") == "ASIA",
    )
    nation = read_parquet_sized(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nation_r = broadcast_join(
        nation, region, on="n_regionkey", right_on="r_regionkey", small_cols=()
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_r = broadcast_join(
        cust, nation_r, on="c_nationkey", right_on="n_nationkey", small_cols=()
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    orders_c = broadcast_join(
        orders, cust_r, on="o_custkey", right_on="c_custkey",
        small_cols=("c_nationkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    j = shuffle_join(li, orders_c, on="l_orderkey", right_on="o_orderkey")
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    j = broadcast_join(
        j, sup, on="l_suppkey", right_on="s_suppkey", small_cols=("s_nationkey",)
    )

    def prep(b: pa.Table) -> pa.Table:
        same = b["c_nationkey"].to_numpy() == b["s_nationkey"].to_numpy()
        t = b.filter(pa.array(same))
        p = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "rev1e4": pa.array(p * (100 - d), pa.int64()),
            }
        )

    agg = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"), ["c_nationkey"], ["rev1e4"]
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    # nation names joined onto the |nations|-sized aggregate
    names = pa.concat_tables(
        [pa.table(b) for b in nation.iter_batches(batch_format="pyarrow")]
    )
    nk = names["n_nationkey"].to_numpy().astype(np.int64)
    order_nk = np.argsort(nk)
    pos = np.searchsorted(nk[order_nk], t["c_nationkey"].to_numpy().astype(np.int64))
    nname = names["n_name"].combine_chunks().take(pa.array(order_nk[pos]))
    rev = t["rev1e4"].to_numpy().astype(np.int64)
    out = pa.table(
        {"n_name": nname, "revenue": pa.array(rev / 10000.0, pa.float64())}
    )
    return out.sort_by([("revenue", "descending"), ("n_name", "ascending")])


def _q_distinct_users(sf_dir: str) -> Any:
    """Exact COUNT(DISTINCT user_id) over events: per-batch unique
    collapse, so the exchange carries batch-distinct keys only."""
    from dcs_ray.functions.sketches import exact_distinct

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    return exact_distinct(ev, "user_id")


def _q_approx_distinct_users(sf_dir: str) -> Any:
    """HyperLogLog approximate distinct users — deterministic for a
    given hash; constant-size (2^p bytes) exchange per batch. The SQL
    oracle replays the register fold bit-exactly (hll_registers gate)
    and applies the same estimator formula."""
    from dcs_ray.functions.sketches import approx_distinct_hll

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    est, _ = approx_distinct_hll(ev, "user_id", p=12)
    return pa.table({"approx_distinct": pa.array([round(est, 6)], pa.float64())})


def _q_heavy_hitters(sf_dir: str) -> Any:
    """Exact top-k event types by count: map-side value_counts partials
    → small combiner groupby → driver top-k over |distinct| rows."""
    from dcs_ray.functions.sketches import heavy_hitters

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type"])
    return heavy_hitters(ev, "event_type", k=3)


def _q_normalize_text(sf_dir: str) -> Any:
    """Vectorized NFC + lowercase + whitespace-collapse + trim — one
    Arrow pass per batch, no exchange."""
    from dcs_ray.functions.textprep import normalize_text

    ds = normalize_text(read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_remove_boilerplate(sf_dir: str) -> Any:
    """CCNet-style boilerplate removal: drop every line appearing in
    ≥3 distinct docs of the SAME source (site templates — menus,
    footers). Two streaming passes over the corpus; the frequent-line
    key set is a bounded (template-sized) broadcast."""
    from dcs_ray.functions.lines import remove_boilerplate

    ds = remove_boilerplate(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ),
        min_docs=3,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_paragraph_dedup(sf_dir: str) -> Any:
    """C4/RefinedWeb-style global paragraph dedup, keep-first: a
    paragraph survives only at its minimum (doc_id, ordinal) occurrence
    corpus-wide. Pure-int exchanges; no driver-side corpus state."""
    from dcs_ray.functions.lines import paragraph_dedup_keep_first

    ds = paragraph_dedup_keep_first(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_bigram_topk(sf_dir: str) -> Any:
    """Top-50 bigrams by count: per-batch pair formation over the flat
    token array + map-side value_counts, vocab-sized aggregate only."""
    from dcs_ray.functions.textprep import bigram_counts

    return bigram_counts(read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]), k=50)


def _q_pack_chunked(sf_dir: str) -> Any:
    """Concat-and-chunk sequence packing (GPT layout): per-bucket
    exclusive cumsum of token counts → fixed 256-token sequences."""
    from dcs_ray.functions.textprep import pack_sequences_chunked

    ds = pack_sequences_chunked(read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]), budget=256, num_buckets=16)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_pack_greedy(sf_dir: str) -> Any:
    """First-fit bin packing per bucket (documents never split) — the
    reset-cumsum walked by searchsorted, not a per-row loop. Oracle:
    a recursive CTE walks the same first-fit state machine per bucket."""
    from dcs_ray.functions.textprep import pack_sequences_greedy

    ds = pack_sequences_greedy(read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]), budget=256, num_buckets=16)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_cms_heavy_hitters(sf_dir: str) -> Any:
    """Count-min-sketch approximate top-k event types — constant-size
    exchange per batch (depth×width matrix + candidate list). The SQL
    oracle replays the full chain (string hash, per-row salted splitmix
    bucket, counter sums, min-over-rows estimate) in hugeint SQL."""
    from dcs_ray.functions.sketches import cms_heavy_hitters

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type"])
    return cms_heavy_hitters(ev, "event_type", k=3)


def _q_canonical_url_dedup(sf_dir: str) -> Any:
    """URL canonicalization + canonical-URL dedup (the crawl-frontier
    normalization every CC-style pipeline runs): deterministic noisy
    urls (case, www, default port, trailing slash, tracking params,
    unsorted query params) canonicalize pairwise-equal; keep-min per
    canonical via a combiner groupby + hash-partitioned join back —
    nothing corpus-sized on the driver."""
    from dcs_ray.functions.relational import combiner_stats, shuffle_join
    from dcs_ray.functions.urls import canonicalize_url_batch

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def noisy(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        base, par = ids // 2, ids % 2
        ks = (base % 97).astype("U")
        bs = base.astype("U")
        extra = base % 3 == 0
        u0 = np.char.add(
            np.char.add(np.char.add("https://WWW.example", ks), ".ORG/p/"),
            np.char.add(np.char.add(bs, "/?utm_source=x"), np.where(extra, "&b=2&a=1", "")),
        )
        u1 = np.char.add(
            np.char.add(np.char.add("https://example", ks), ".org:443/p/"),
            np.char.add(np.char.add(bs, "?gclid=g"), np.where(extra, "&a=1&b=2", "")),
        )
        return pa.table(
            {"doc_id": b["doc_id"], "url": pa.array(np.where(par == 0, u0, u1))}
        )

    canon = docs.map_batches(noisy, batch_format="pyarrow").map_batches(
        canonicalize_url_batch, batch_format="pyarrow"
    ).materialize()  # consumed twice below (winners + join probe)
    winners = combiner_stats(canon, ["canonical_url"], "doc_id")

    def sel(b: pa.Table) -> pa.Table:
        return b.select(["canonical_url", "min_doc_id"])

    joined = shuffle_join(
        canon.select_columns(["doc_id", "canonical_url"]),
        winners.map_batches(sel, batch_format="pyarrow"),
        on="canonical_url",
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(b["doc_id"], b["min_doc_id"]).cast(pa.int32())
        return pa.table(
            {"doc_id": b["doc_id"], "canonical_url": b["canonical_url"], "keep": keep}
        )

    t = pa.concat_tables(
        [pa.table(b) for b in joined.map_batches(finish, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_training_shuffle_rank(sf_dir: str) -> Any:
    """Deterministic global training shuffle: every doc's 0-based rank
    in the (splitmix64(id^seed), id) order — a reproducible permutation
    computed as a distributed rank (order-preserving bucket histogram +
    per-bucket lexsort), no corpus-sized driver state, no
    random_shuffle exchange."""
    from dcs_ray.functions.sampling import global_shuffle_rank

    ds = global_shuffle_rank(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        seed=7,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_media_metadata(sf_dir: str) -> Any:
    """Decode-nothing media triage: one actor-pool pass sniffs format
    magic and parses ONLY container/frame headers (ISO-BMFF box walk,
    MP3 frame sync, PNG IHDR, FLAC STREAMINFO, AVI avih, WAV fmt) —
    the pass a 100 TB multimodal crawl runs before deciding what to
    decode. Rows-only: header semantics aren't SQL-expressible; gated
    by tests/test_media_meta.py fixtures instead."""
    from dcs_ray.functions.avi import synthesize_avi_video
    from dcs_ray.functions.media_meta import (
        MediaMetadataExtractor,
        encode_mp3_skeleton,
        encode_mp4_skeleton,
    )
    from dcs_ray.functions.multimodal import (
        synthesize_flac_media,
        synthesize_gif_media,
        synthesize_png_media,
        synthesize_wav_media,
    )

    payloads = (
        synthesize_png_media(12)["payload"].to_pylist()
        + synthesize_gif_media(12)["payload"].to_pylist()
        + synthesize_wav_media(12)["payload"].to_pylist()
        + synthesize_flac_media(12)["payload"].to_pylist()
        + synthesize_avi_video(6)["payload"].to_pylist()
        + [encode_mp4_skeleton(1000 + i, 320, 240, 30 + i) for i in range(6)]
        + [encode_mp3_skeleton(40 + i) for i in range(6)]
    )
    media = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(len(payloads)), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    ds = media.map_batches(
        MediaMetadataExtractor, concurrency=2, batch_size=16,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("media_id")


def _q_host_stats(sf_dir: str) -> Any:
    """Per-host page count + text chars over the crawl pages table —
    one vectorized RE2 host extract per batch, combiner partials keyed
    by host so the exchange is |hosts|-bounded. Oracle replays the
    deterministic page synthesis (incl. stale-dup rows) in SQL."""
    from dcs_ray.functions.urls import host_stats
    from dcs_ray.sources.pages import read_pages

    ds = host_stats(read_pages(sf_dir))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("host")


def _q_lang_quantiles(sf_dir: str) -> Any:
    """Per-language length quantiles (p50/p90/p99) — the percentile
    cutoffs quality filtering is built on. Exact: value-count collapse
    then a per-key histogram walk; exchange is |lang × distinct
    lengths|, never the corpus."""
    from dcs_ray.functions.quantiles import group_quantiles

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    ds = group_quantiles(docs, "lang", "n_chars", [0.5, 0.9, 0.99])
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("lang", "ascending"), ("q", "ascending")])


def _q_quality_filter(sf_dir: str) -> Any:
    """Per-language p10 length filter: cutoffs computed once (|langs|
    rows), broadcast with ray.put, applied as a vectorized searchsorted
    probe per batch — no join shuffle."""
    from dcs_ray.functions.quantiles import filter_by_group_quantile

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ds = filter_by_group_quantile(docs, "lang", "n_chars", 0.1, keep="ge")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_quality_classifier(sf_dir: str) -> Any:
    """Actor-pool logistic quality classifier: weights loaded once per
    actor in __init__, whole-batch numpy scoring in __call__ — the
    model-inference stage shape. Deterministic public weights, so the
    oracle replays the exact formula."""
    from dcs_ray.functions.textstats import quality_classify

    ds = quality_classify(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_nb_lang_classifier(sf_dir: str) -> Any:
    """Distributed multinomial Naive Bayes, trained on the corpus's own
    lang labels then self-classifying every doc — the trained
    counterpart of the fixed-weight quality classifier. Training is one
    combiner-folded (label, term) count pass (model-sized exchange);
    prediction broadcasts the dense log-prob matrix once. The oracle
    replays counts, add-1 smoothing, and the rounded-score argmax."""
    from dcs_ray.functions.classify import naive_bayes_predict, train_naive_bayes

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).materialize()
    model_ref = ray.put(train_naive_bayes(docs))
    ds = naive_bayes_predict(docs, model_ref)
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("doc_id")


def _q_funnel_steps(sf_dir: str) -> pa.Table:
    """Conversion funnel view → click → purchase per user (strictly
    increasing timestamps, earliest eligible occurrence per step) —
    one user-bucketed groupby, per-step lexsort + reduceat first-
    eligible scan inside the bucket, no per-user Python."""
    from dcs_ray.functions.windows import funnel_steps

    ds = funnel_steps(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        ),
        steps=["view", "click", "purchase"],
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("user_id")


def _q_token_entropy(sf_dir: str) -> Any:
    """Per-doc unigram Shannon entropy — the information-theoretic
    repetitiveness signal next to the Gopher dup-token fractions."""
    from dcs_ray.functions.textstats import token_entropy

    ds = token_entropy(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("doc_id")


def _q_next_word_suggest(sf_dir: str) -> pa.Table:
    """Query suggestion: top-5 corpus-bigram continuations of 'scan' —
    the prefix filter runs inside each batch partial so the exchange is
    one word's continuation set, never the bigram vocabulary."""
    from dcs_ray.functions.textprep import next_word_suggest

    return next_word_suggest(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"]),
        word="scan",
        k=5,
    )


def _q_event_transitions(sf_dir: str) -> pa.Table:
    """Markov transition matrix over each user's event sequence
    (prev_type → next_type counts, ts ties ordered by type): one
    user-bucketed lexsort + shifted-pair comparison per bucket; the
    exchange is |type-pairs|, never the event stream."""
    from dcs_ray.functions.windows import event_transitions

    ds = event_transitions(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("prev_type", "ascending"), ("next_type", "ascending")])


def _q_retention_cohorts(sf_dir: str) -> pa.Table:
    """Cohort retention: users grouped by first-seen week, counted once
    per later active week. Cohort vector is a user-sized driver fold
    broadcast once; distinct activity dedups via one combiner groupby."""
    from dcs_ray.functions.windows import retention_cohorts

    ds = retention_cohorts(
        read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("cohort_week", "ascending"), ("week_offset", "ascending")])


def _q_weighted_sample(sf_dir: str) -> pa.Table:
    """Weighted sampling without replacement (A-ES): top-100 docs by
    ln(u)/n_chars with u drawn from splitmix64(doc_id ^ 13) — the
    quality-weighted training-data selection pass. Per-block top-100
    partials; the driver merges |blocks|·100 rows."""
    from dcs_ray.functions.sampling import weighted_sample

    return weighted_sample(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        ),
        n=100,
        weight_col="n_chars",
        seed=13,
    )


def _q_weighted_sample_by_lang(sf_dir: str) -> pa.Table:
    """Stratified A-ES weighted sampling: top-20 docs per language by
    ln(u)/n_chars — per-group quality-weighted selection in one pass
    with per-block local top-n partials."""
    from dcs_ray.functions.sampling import weighted_sample_grouped

    return weighted_sample_grouped(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        ),
        n_per_group=20,
        group_col="lang",
        weight_col="n_chars",
        seed=13,
    )


def _q_readability(sf_dir: str) -> Any:
    """Flesch-style readability per doc — words / sentence-run /
    vowel-group counts and the 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    score, all RE2 kernels, no exchange."""
    from dcs_ray.functions.textstats import readability

    ds = readability(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("doc_id")


def _q_nb_confusion(sf_dir: str) -> pa.Table:
    """Classifier evaluation: confusion matrix (true lang × NB
    prediction) via a combiner count fold over the prediction stream —
    the |classes|²-sized exchange every model-eval pass needs."""
    from dcs_ray.functions.classify import naive_bayes_predict, train_naive_bayes
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).materialize()
    model_ref = ray.put(train_naive_bayes(docs))
    preds = naive_bayes_predict(docs, model_ref, keep_cols=("lang",))
    agg = combiner_groupby(
        preds.map_batches(
            lambda b: pa.table(
                {"true_label": b["lang"], "pred_label": b["pred_label"]}
            ),
            batch_format="pyarrow",
        ),
        ["true_label", "pred_label"],
        [],
        count_col="n_docs",
    )
    t = pa.concat_tables(
        pa.table(b).select(["true_label", "pred_label", "n_docs"])
        for b in agg.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by(
        [("true_label", "ascending"), ("pred_label", "ascending")]
    )


def _q_text_knn_hash_embed(sf_dir: str) -> Any:
    """Embedding-generation → similarity-search composition: documents
    are embedded with the deterministic hashing-trick featurizer (one
    tokenizer pass + scatter per batch, no exchange), then brute-force
    cosine top-5 runs against three fixed query docs. Oracle-gated end
    to end: the SQL replays the hash chain, float32 quantization, and
    the double-precision cosine ranking."""
    from dcs_ray.functions.embed import hash_embed, hash_embed_batch
    from dcs_ray.functions.simsearch import knn_cosine_bruteforce

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    emb = hash_embed(docs)
    qt = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", [0, 1, 2])],
    )
    qvecs = np.stack(
        [np.asarray(v, np.float64) for v in
         hash_embed_batch(qt)["embedding"].to_pylist()]
    )
    return knn_cosine_bruteforce(emb, qvecs, k=5, id_col="doc_id")


def _q_hll_registers(sf_dir: str) -> Any:
    """The HLL fold itself, bit-exactly gated: nonzero (register,
    max-rank) table for user_id at p=12. The oracle replays splitmix64
    (32-bit-limb mulmod) and the leading-zero ladder in integer SQL, so
    the sketch state — not just the estimate — is verified."""
    from dcs_ray.functions.sketches import approx_distinct_hll

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    _, regs = approx_distinct_hll(ev, "user_id", p=12)
    nz = np.flatnonzero(regs)
    return pa.table(
        {
            "reg": pa.array(nz.astype(np.int64), pa.int64()),
            "rank": pa.array(regs[nz].astype(np.int64), pa.int64()),
        }
    )


def _q_customers_without_orders(sf_dir: str) -> Any:
    """Broadcast ANTI-join: customers who never placed a >400k order.
    The filtered order custkeys (unique, small) broadcast once; the
    customer table streams through a searchsorted existence probe —
    no shuffle. The price predicate is pushed into the orders scan."""
    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import broadcast_semi_join

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > 400000.0,
    )
    ds = broadcast_semi_join(cust, orders, on="c_custkey", right_on="o_custkey", anti=True)
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]).empty_table()
    return pa.concat_tables(tables).sort_by("c_custkey")


def _q_top_events_per_user(sf_dir: str) -> Any:
    """Generic grouped top-n: each user's 3 highest-value events.
    Per-batch per-key cut before the groupby bounds the exchange at
    n rows per (batch, key)."""
    from dcs_ray.functions.relational import grouped_topn

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )
    ds = grouped_topn(ev, "user_id", "value", 3, tie_col="event_id")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("user_id", "ascending"), ("value", "descending"), ("event_id", "ascending")])


def _q_windowed_top_users(sf_dir: str) -> Any:
    """Continuous-top-k shape: per tumbling hour window, the top-2
    users by summed value — tumbling_window_agg chained into
    grouped_topn, both exchanges combiner-bounded."""
    from dcs_ray.functions.relational import grouped_topn
    from dcs_ray.functions.windows import tumbling_window_agg

    agg = tumbling_window_agg(
        read_parquet_sized(f"{sf_dir}/events.parquet"), width_s=3600
    )
    top = grouped_topn(agg, "window_start", "sum_value", 2, tie_col="user_id")
    t = pa.concat_tables([pa.table(b) for b in top.iter_batches(batch_format="pyarrow")])
    t = t.sort_by(
        [("window_start", "ascending"), ("sum_value", "descending"), ("user_id", "ascending")]
    )
    return pa.table(
        {
            "window_start": t["window_start"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "sum_value": pa.array(np.round(t["sum_value"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_source_length_stats(sf_dir: str) -> Any:
    """Per-source doc count + sum/min/max length in ONE combiner pass —
    the descriptive-stats aggregate, exchange bounded by keys/batch."""
    from dcs_ray.functions.relational import combiner_stats

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )
    ds = combiner_stats(docs, ["source"], "n_chars")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "source": t["source"],
            "n_rows": t["n_rows"],
            "sum_n_chars": t["sum_n_chars"].cast(pa.int64()),
            "min_n_chars": t["min_n_chars"].cast(pa.int64()),
            "max_n_chars": t["max_n_chars"].cast(pa.int64()),
        }
    ).sort_by("source")


def _q_value_quantiles_hist(sf_dir: str) -> Any:
    """Approximate quantiles of a continuous column via the mergeable
    fixed-bin histogram sketch (constant-size exchange per batch);
    deterministic arithmetic makes the oracle compare bit-exact."""
    from dcs_ray.functions.quantiles import approx_quantiles_histogram

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["value"])
    return approx_quantiles_histogram(ev, "value", [0.5, 0.9, 0.99], bins=4096)


def _q_jaccard_verified(sf_dir: str) -> Any:
    """MinHash+LSH candidates → exact shingle-Jaccard verify (bucketed
    participant join, never full-corpus text in a shuffle)."""
    from dcs_ray.functions.dedup import jaccard_verify_pairs, minhash_candidate_pairs

    docs = _docs(sf_dir)
    ds = jaccard_verify_pairs(docs, minhash_candidate_pairs(docs), threshold=0.5)
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables or sum(len(t) for t in tables) == 0:
        return pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table()
    return pa.concat_tables(tables).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def _q_fuzzy_dedup(sf_dir: str) -> Any:
    """End-to-end fuzzy dedup: LSH candidates → Jaccard verify →
    distributed connected components → keep min id per near-dup
    cluster."""
    from dcs_ray.functions.dedup import fuzzy_dedup_keep

    ds = fuzzy_dedup_keep(_docs(sf_dir), threshold=0.5)
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tables).sort_by("doc_id")


def _q_connected_components(sf_dir: str) -> Any:
    """Distributed alternating-star connected components over a
    deterministic edge set derived from events (block-local pseudo-
    random functional graph: u=event_id, v=block_start+(13u+5)%20)."""
    from dcs_ray.functions.graph import connected_components

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_id"])

    def edges(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy().astype(np.int64)
        v = (e // 20) * 20 + (e * 13 + 5) % 20
        return pa.table(
            {"id_a": pa.array(e, pa.int64()), "id_b": pa.array(v, pa.int64())}
        )

    labels = connected_components(ev.map_batches(edges, batch_format="pyarrow"))
    tables = [pa.table(b) for b in labels.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(tables).sort_by("node")


def _q_dup_cluster_sizes(sf_dir: str) -> pa.Table:
    """Dedup reporting: histogram of connected-component sizes over the
    deterministic event-derived edge set — per-component counts via a
    combiner groupby (component-sized), then a tiny value-count fold."""
    from dcs_ray.functions.graph import connected_components
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_id"])

    def edges(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy().astype(np.int64)
        v = (e // 20) * 20 + (e * 13 + 5) % 20
        return pa.table(
            {"id_a": pa.array(e, pa.int64()), "id_b": pa.array(v, pa.int64())}
        )

    labels = connected_components(ev.map_batches(edges, batch_format="pyarrow"))
    sizes = combiner_groupby(
        labels.map_batches(
            lambda b: pa.table({"component": b["component"]}),
            batch_format="pyarrow",
        ),
        ["component"],
        [],
        count_col="sz",
    )
    acc: dict[int, int] = {}
    for b in sizes.iter_batches(batch_format="pyarrow"):
        u, c = np.unique(
            pa.table(b)["sz"].to_numpy(zero_copy_only=False), return_counts=True
        )
        for s, n in zip(u.tolist(), c.tolist()):
            acc[s] = acc.get(s, 0) + n
    ks = sorted(acc)
    return pa.table(
        {
            "cluster_size": pa.array(ks, pa.int64()),
            "n_clusters": pa.array([acc[k] for k in ks], pa.int64()),
        }
    )


def _q_distinctive_terms(sf_dir: str) -> pa.Table:
    """Per-language distinctive vocabulary (log-odds keyness): the NB
    training counts reused — no extra corpus pass; top-5 per lang by
    round-6 keyness, ties on term."""
    from dcs_ray.functions.classify import distinctive_terms, train_naive_bayes

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return distinctive_terms(train_naive_bayes(docs), k=5)


def _q_simhash(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.dedup import simhash_batch

    return _docs(sf_dir).map_batches(simhash_batch, batch_format="pyarrow")


def _q_simhash_pairs(sf_dir: str) -> Any:
    """Banded hamming≤3 SimHash near-dup pairs — exact via 4×16-bit-band
    pigeonhole, never an all-pairs scan over the corpus."""
    from dcs_ray.functions.dedup import simhash_near_dup_pairs

    ds = simhash_near_dup_pairs(_docs(sf_dir), max_hamming=3, mode="exact")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    if len(t) == 0:
        return pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
    return pa.table(
        {"id_a": t["id_a"], "id_b": t["id_b"], "hamming": t["min(hamming)"]}
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _q_langid(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.textstats import langid

    return langid(_docs(sf_dir))


def _q_fingerprints(sf_dir: str) -> ray.data.Dataset:
    from dcs_ray.functions.textstats import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_image_features(sf_dir: str) -> Any:
    """REAL decode path: a MIXED corpus of deterministic P6 PPM,
    zlib-compressed PNG, baseline-JPEG (4:2:0 + restart markers), and
    GIF89a (LZW, palette-quantized) images (same pixel recipes),
    sniffed and decoded per row by the dependency-free parsers in an
    actor pool, → per-channel stats + luma grid features (rows-only
    gate; pytest pins values vs straight numpy and cross-codec
    equality)."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_gif_media,
        synthesize_jpeg_media,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    ppm = synthesize_ppm_media(32)
    png = synthesize_png_media(32)
    png = png.set_column(
        png.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 64), pa.int64()),
    )
    jpg = synthesize_jpeg_media(32)
    jpg = jpg.set_column(
        jpg.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(64, 96), pa.int64()),
    )
    gif = synthesize_gif_media(32)
    gif = gif.set_column(
        gif.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(96, 128), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm, png, jpg, gif]))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=32,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("media_id")


def _q_audio_features(sf_dir: str) -> Any:
    """REAL decode path: a MIXED corpus of RIFF/WAVE PCM16 and FLAC
    clips (same signal recipe; FLAC is lossless so features are
    bit-identical across codecs — pinned by pytest) parsed by the
    pure-numpy readers in one actor pool, windowed RMS features."""
    from dcs_ray.functions.multimodal import (
        WavAudioFeatureExtractor,
        synthesize_flac_media,
        synthesize_wav_media,
    )

    wav = synthesize_wav_media(64)
    flc = synthesize_flac_media(32)
    flc = flc.set_column(
        flc.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(64, 96), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([wav, flc]))
    ds = media.map_batches(
        WavAudioFeatureExtractor, concurrency=2, batch_size=32,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    t = t.sort_by("media_id")
    # exploded (media_id, window, rms) — the decode is REAL (WAV and
    # FLAC parsers), and the signal recipe is pure arithmetic, so the
    # oracle replays synthesis → windowed RMS entirely in SQL
    feat = t["feature"].combine_chunks()
    parents = pc.list_parent_indices(feat).to_numpy(zero_copy_only=False)
    flat = feat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t["media_id"].to_numpy().astype(np.int64)
    win = np.concatenate([np.arange(len(feat[i])) for i in range(len(t))])
    return pa.table(
        {
            "media_id": pa.array(ids[parents], pa.int64()),
            "window": pa.array(win.astype(np.int64), pa.int64()),
            "rms": pa.array(np.round(flat, 6) + 0.0, pa.float64()),
        }
    )


def _q_video_frames(sf_dir: str) -> Any:
    """REAL demux path over THREE video containers: concatenated-PPM
    streams (frame headers parsed, zero-copy slices), animated GIFs
    (LZW-decoded), and MJPEG AVIs (RIFF chunk index + per-frame JPEG
    decode of only the sampled frames), in one actor pool; 4 frames
    sampled evenly per stream, each emitted as a standalone PPM."""
    from dcs_ray.functions.avi import synthesize_avi_video
    from dcs_ray.functions.multimodal import (
        PpmStreamFrameSampler,
        synthesize_gif_video,
        synthesize_ppm_video,
    )

    ppm_v = synthesize_ppm_video(32)
    gif_v = synthesize_gif_video(16)
    gif_v = gif_v.set_column(
        gif_v.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 48), pa.int64()),
    )
    avi_v = synthesize_avi_video(16)
    avi_v = avi_v.set_column(
        avi_v.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(48, 64), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm_v, gif_v, avi_v]))
    ds = media.map_batches(
        PpmStreamFrameSampler, fn_constructor_kwargs={"k": 4}, concurrency=2,
        batch_size=16, batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])


def _q_decontaminate(sf_dir: str) -> Any:
    """Benchmark decontamination: the n-gram hash set of a synthetic
    "benchmark" slice (docs with doc_id % 97 == 0) is broadcast once via
    ray.put; every corpus batch does a vectorized searchsorted membership
    probe — no shuffle, no join."""
    import ray as _ray

    from dcs_ray.functions.filtering import benchmark_ngram_set, decontaminate

    def is_bench(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0))

    bench_docs = _docs(sf_dir).map_batches(is_bench, batch_format="pyarrow")
    bench = benchmark_ngram_set(bench_docs, n=3)
    ref = _ray.put(bench)
    ds = decontaminate(_docs(sf_dir), ref, n=3)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_pii_scrub(sf_dir: str) -> Any:
    """PII redaction over text with deterministically injected emails
    and phone numbers (docs with doc_id % 7 == 0); Arrow RE2 kernels so
    the DuckDB regexp oracle compares byte-for-byte."""
    import pyarrow.compute as _pc

    from dcs_ray.functions.filtering import pii_scrub

    def inject(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        suffix = [
            f" contact user{i}@example.com or +1 (20{i % 10}) 555-01{i % 89:02d}"
            if i % 7 == 0
            else ""
            for i in ids
        ]
        text = _pc.binary_join_element_wise(b["text"], pa.array(suffix), "")
        return b.set_column(b.schema.get_field_index("text"), "text", text)

    ds = pii_scrub(_docs(sf_dir).map_batches(inject, batch_format="pyarrow"))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.select(["doc_id", "text", "n_emails", "n_phones"]).sort_by("doc_id")


def _q_repetition_stats(sf_dir: str) -> Any:
    from dcs_ray.functions.filtering import repetition_stats

    ds = repetition_stats(_docs(sf_dir))
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_cross_snapshot_dedup(sf_dir: str) -> Any:
    """Cross-snapshot bloom dedup: a filter built over the "old"
    snapshot (even doc_ids) is broadcast once; the "new" snapshot
    streams through a vectorized probe keeping rows definitely not seen.
    The filter is sized from the snapshot's row count (m ≥ 128·n bits,
    floor 4 Mi) so the expected false-drop mass stays ≪ 1 row at EVERY
    gated scale — at m=128n, k=7 the per-probe FP rate is
    (1-e^{-7/128})^7 ≈ 1e-9, so the output equals the exact NOT-IN
    oracle with overwhelming probability."""
    import math

    import ray as _ray

    from dcs_ray.functions.sketches import bloom_anti_join, bloom_build

    def is_old(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 2 == 0))

    n = max(_docs(sf_dir).count(), 1)  # parquet metadata count — cheap
    m_log2 = max(22, math.ceil(math.log2(n)) + 7)
    old = _docs(sf_dir).map_batches(is_old, batch_format="pyarrow")
    bloom = bloom_build(old, "text", m_log2=m_log2, k=7)
    ref = _ray.put(bloom)
    kept = bloom_anti_join(_docs(sf_dir), ref, "text", m_log2=m_log2, k=7)
    t = pa.concat_tables(
        [pa.table(b) for b in kept.iter_batches(batch_format="pyarrow")]
    )
    return t.select(["doc_id"]).sort_by("doc_id")



def _term_hash64_sql() -> str:
    """Integer-SQL replay of ``sketches._hash64_column`` for ASCII
    string terms up to 16 bytes (2 hash words — corpus tokens are <=8):
    FNV-ish (h ^ word) * P per little-endian 8-byte word, length salt,
    splitmix64 finalizer. Produces CTEs ``th(term, h)`` given a CTE
    ``terms(term)``."""
    H0 = str(0xCBF29CE484222325)
    P = str(0x100000001B3)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"

    def word(w: int) -> str:
        return " + ".join(
            f"CASE WHEN ln > {8 * w + i} THEN ascii(substr(term, {8 * w + i + 1}, 1))::hugeint * {256 ** i} ELSE 0 END"
            for i in range(8)
        )

    return f"""
tw AS (SELECT term, length(term) AS ln, ({word(0)}) AS w0, ({word(1)}) AS w1 FROM terms),
f0 AS (SELECT term, ln, w1, CASE WHEN ln > 0 THEN ({_mulmod64(f"xor({H0}::ubigint, w0::ubigint)::hugeint", P + "::hugeint")}) ELSE {H0}::hugeint END AS h FROM tw),
f1 AS (SELECT term, ln, CASE WHEN ln > 8 THEN ({_mulmod64("xor(h::ubigint, w1::ubigint)::hugeint", P + "::hugeint")}) ELSE h END AS h FROM f0),
fl AS (SELECT term, (h + ln + 11400714819323198485) % {M64} AS x0 FROM f1),
m1 AS (SELECT term, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM fl),
m2 AS (SELECT term, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM m1),
th AS (SELECT term, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM m2)"""


def _strhash64_sql(nwords: int) -> str:
    """Generalized ``_term_hash64_sql``: integer-SQL replay of
    ``sketches._hash64_column`` for ASCII strings up to ``nwords * 8``
    bytes — FNV-ish (h ^ word) * P per little-endian 8-byte word,
    length salt, splitmix64 finalizer. Produces CTEs ending in
    ``th(term, h)`` given a CTE ``terms(term)``."""
    H0 = str(0xCBF29CE484222325)
    P = str(0x100000001B3)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"

    def word(w: int) -> str:
        return " + ".join(
            f"CASE WHEN ln > {8 * w + i} THEN ascii(substr(term, {8 * w + i + 1}, 1))::hugeint * {256 ** i} ELSE 0 END"
            for i in range(8)
        )

    wcols = ", ".join(f"({word(w)}) AS w{w}" for w in range(nwords))
    ctes = [f"tw AS (SELECT term, length(term) AS ln, {wcols} FROM terms)"]
    prev = "tw"
    for w in range(nwords):
        rest = ", ".join(f"w{j}" for j in range(w + 1, nwords))
        rest = (", " + rest) if rest else ""
        if w == 0:
            expr = (
                f"CASE WHEN ln > 0 THEN "
                f"({_mulmod64(f'xor({H0}::ubigint, w0::ubigint)::hugeint', P + '::hugeint')})"
                f" ELSE {H0}::hugeint END"
            )
        else:
            expr = (
                f"CASE WHEN ln > {8 * w} THEN "
                f"({_mulmod64(f'xor(h::ubigint, w{w}::ubigint)::hugeint', P + '::hugeint')})"
                f" ELSE h END"
            )
        ctes.append(f"f{w} AS (SELECT term, ln{rest}, {expr} AS h FROM {prev})")
        prev = f"f{w}"
    ctes.append(
        f"fl AS (SELECT term, (h + ln + 11400714819323198485) % {M64} AS x0 FROM {prev})"
    )
    ctes.append(
        f"m1 AS (SELECT term, ({_mulmod64('xor(x0::ubigint, x0::ubigint >> 30)::hugeint', MIX1 + '::hugeint')}) AS x1 FROM fl)"
    )
    ctes.append(
        f"m2 AS (SELECT term, ({_mulmod64('xor(x1::ubigint, x1::ubigint >> 27)::hugeint', MIX2 + '::hugeint')}) AS x2 FROM m1)"
    )
    ctes.append(
        "th AS (SELECT term, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM m2)"
    )
    return ",\n".join(ctes)


def _q_hash_embed_vectors(sf_dir: str) -> Any:
    """The hashing-trick embedding matrix itself, unnested to
    (doc_id, dim, val) nonzero components — gates the full chain
    (token hash -> signed bucket scatter -> L2 normalize -> float32
    quantization) against an integer+float SQL replay."""
    import numpy as np

    from dcs_ray.functions.embed import hash_embed

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def unnest(b: pa.Table) -> pa.Table:
        import numpy as _np

        n = len(b)
        emb = b["embedding"].combine_chunks() if isinstance(b["embedding"], pa.ChunkedArray) else b["embedding"]
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(n, 1) if n else 0
        vals = _np.round(flat.astype(_np.float64), 6)
        ids = _np.repeat(b["doc_id"].to_numpy(), dim)
        dims = _np.tile(_np.arange(dim, dtype=_np.int64), n)
        keep = vals != 0.0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "dim": pa.array(dims[keep], pa.int64()),
                "val": pa.array(vals[keep], pa.float64()),
            }
        )

    ds = hash_embed(docs).map_batches(unnest, batch_format="pyarrow")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("doc_id", "ascending"), ("dim", "ascending")])



def _cms_heavy_hitters_sql(k: int = 3, depth: int = 4, width: int = 4096) -> str:
    """Bit-exact integer-SQL replay of ``cms_heavy_hitters`` over
    events.event_type: candidates are all distinct values (gate scale),
    the merged sketch equals a single-pass fold (sum-merge is exact)."""
    import numpy as np

    from dcs_ray.functions.sketches import _splitmix64

    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"
    salts = ", ".join(
        f"({r}, {int(s)}::hugeint)"
        for r, s in enumerate(_splitmix64(np.arange(1, depth + 1, dtype=np.uint64)))
    )
    return f"""
WITH tok AS (SELECT event_type AS term FROM events WHERE event_type IS NOT NULL),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
salts(r, s) AS (VALUES {salts}),
g0 AS (SELECT term, r, (xor(h::ubigint, s::ubigint)::hugeint + {GOLDEN}) % {M64} AS x0 FROM th, salts),
g1 AS (SELECT term, r, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM g0),
g2 AS (SELECT term, r, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM g1),
gi AS (SELECT term, r, (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % {width})::bigint AS col FROM g2),
counters AS (SELECT r, col, sum(c)::bigint AS total FROM gi JOIN cnt USING (term) GROUP BY r, col),
est AS (SELECT gi.term, min(counters.total)::bigint AS n_est
        FROM gi JOIN counters USING (r, col) GROUP BY gi.term)
SELECT term AS event_type, n_est FROM est
ORDER BY n_est DESC, event_type ASC LIMIT {k}
"""


_CURATE_WEIGHTS = {"en": 3, "de": 2, "es": 2, "fr": 1, "zh": 1}
_CURATE_TOTAL = 250


def _q_curate_web_corpus(sf_dir: str) -> Any:
    """Flagship composition #3 — the CCNet/C4 web-text front half:
    boilerplate removal → global paragraph dedup → short-doc filter on
    the cleaned text → exact dedup keep-min; one end-to-end SQL chain
    as the oracle."""
    from dcs_ray.pipelines import curate_web_corpus

    ds = curate_web_corpus(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ),
        min_docs=3,
        min_tokens=10,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_curate_corpus(sf_dir: str) -> Any:
    """Flagship curation composition: repetition/length filter -> exact
    dedup -> benchmark decontamination -> training-mixture rebalance,
    every stage the already-gated operator, one SQL oracle end to end."""
    import ray as _ray

    from dcs_ray.functions.filtering import benchmark_ngram_set
    from dcs_ray.pipelines import curate_corpus

    def is_bench(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0))

    bench = benchmark_ngram_set(
        _docs(sf_dir).map_batches(is_bench, batch_format="pyarrow"), n=3
    )
    ds = curate_corpus(
        _docs(sf_dir),
        _ray.put(bench),
        _CURATE_WEIGHTS,
        _CURATE_TOTAL,
        min_tokens=15,
        max_dup_frac=0.6,
        seed=11,
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_interval_join(sf_dir: str) -> Any:
    """Windowed interval join: each purchase emits one row per view by
    the same user within the 30 minutes before it (inclusive both
    ends)."""
    from dcs_ray.functions.joins import interval_join

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts_us": pa.array(ts_us, pa.int64()),
            }
        )

    ev = ev.map_batches(prep, batch_format="pyarrow")

    def only(kind):
        return lambda b: b.filter(pa.compute.equal(b["event_type"], kind))

    left = ev.map_batches(only("purchase"), batch_format="pyarrow")
    right = ev.map_batches(only("view"), batch_format="pyarrow")
    out = interval_join(
        left, right, on="user_id", ts_col="ts_us",
        before_us=30 * 60 * 1_000_000, after_us=0,
        right_cols=("event_id", "ts_us"),
    )
    t = pa.concat_tables([pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    return t.select(
        ["event_id", "user_id", "ts_us", "event_id_right", "ts_us_right"]
    ).sort_by([("event_id", "ascending"), ("event_id_right", "ascending")])


def _q_chunk_documents(sf_dir: str) -> Any:
    """Token-window chunking (16-token windows, stride 8) — the
    context-window / RAG prep step, chunk text byte-comparable to the
    SQL list-slice oracle."""
    from dcs_ray.functions.textprep import chunk_documents

    ds = chunk_documents(_docs(sf_dir), 16, 8)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])


def _q_zscore_by_lang(sf_dir: str) -> Any:
    """Per-language z-score of doc length — feature standardization
    before cross-group thresholds; two broadcast passes, no shuffle."""
    from dcs_ray.functions.relational import group_zscore

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    ds = group_zscore(docs, "lang", "n_chars")
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_phrase_bm25(sf_dir: str) -> Any:
    """Phrase-restricted ranking composition: exact-phrase candidates
    from the positional trigram index, then BM25 over different rank
    terms with the candidate set pushed into each shard task via the
    doc_ids filter — no full-corpus ranking, no driver-side filtering."""
    from dcs_ray.search import search_bm25, search_literal

    tri = _index_dir(sf_dir, "trigram")
    cand = search_literal(tri, [LITERAL], positional=True)
    ids = sorted(set(cand["doc_id"].to_pylist()))
    words = _index_dir(sf_dir, "words")
    t = search_bm25(words, ["join batch value"], k=10, filters={"doc_ids": ids})
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": t["score"],
        }
    )



def _grouped_hll_sql(p: int = 8) -> str:
    """Per-group HLL register fold + estimator over events
    (event_type, user_id) in integer SQL — the grouped analogue of
    ``_hll_registers_sql``."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    m = 1 << p
    cap = 64 - p + 1
    ladder = "\n".join(
        f"r{i+1} AS (SELECT event_type, reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )
    return f"""
WITH h0 AS (SELECT event_type, ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0
            FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
h1 AS (SELECT event_type, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT event_type, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT event_type, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT event_type, (h // {1 << (64 - p)})::bigint AS reg, (h * {m}) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT event_type, reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6),
regs AS (SELECT event_type, reg, max(least(64 - bitlen + 1, {cap}))::bigint AS rank
         FROM rf GROUP BY 1, 2),
s AS (SELECT event_type, count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz
      FROM regs GROUP BY 1),
c AS (SELECT event_type, ({m} - nz) AS zeros, ({m} - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT event_type, zeros,
             (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0 / ssum AS est FROM c)
SELECT event_type,
       round(CASE WHEN est <= 2.5 * {m} AND zeros > 0
             THEN {m}.0 * ln({m}.0 / zeros) ELSE est END, 6) AS approx_distinct
FROM e ORDER BY event_type
"""


def _hll_sets_sql(p: int, key_a: str, key_b: str) -> str:
    """HLL set algebra (|A|, |B|, |A∪B|, inclusion–exclusion |A∩B|)
    over events user_id slices, replayed in integer SQL: the grouped
    register chain filtered to the two keys, union registers =
    per-register max, the standard estimator applied three times."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    m = 1 << p
    cap = 64 - p + 1
    ladder = "\n".join(
        f"r{i+1} AS (SELECT event_type, reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )

    def est(rel: str) -> str:
        return f"""(SELECT CASE WHEN est <= 2.5 * {m} AND zeros > 0
                 THEN {m}.0 * ln({m}.0 / zeros) ELSE est END FROM
      (SELECT ({m} - count(*)) AS zeros,
              (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0 /
                (({m} - count(*)) * 1.0 + coalesce(sum(power(2.0, -rank)), 0.0)) AS est
       FROM {rel}))"""

    return f"""
WITH h0 AS (SELECT event_type, ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0
            FROM events WHERE user_id IS NOT NULL
              AND event_type IN ('{key_a}', '{key_b}')),
h1 AS (SELECT event_type, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT event_type, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT event_type, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT event_type, (h // {1 << (64 - p)})::bigint AS reg, (h * {m}) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT event_type, reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6),
regs AS MATERIALIZED (
  SELECT event_type, reg, max(least(64 - bitlen + 1, {cap}))::bigint AS rank
  FROM rf GROUP BY 1, 2),
ra AS (SELECT reg, rank FROM regs WHERE event_type = '{key_a}'),
rb AS (SELECT reg, rank FROM regs WHERE event_type = '{key_b}'),
ru AS (SELECT reg, max(rank) AS rank
       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg),
e AS (SELECT {est("ra")} AS ea, {est("rb")} AS eb, {est("ru")} AS eu)
SELECT '{key_a}' AS key_a, '{key_b}' AS key_b,
       round(ea, 6) AS approx_a, round(eb, 6) AS approx_b,
       round(eu, 6) AS approx_union,
       round(greatest(0.0, ea + eb - eu), 6) AS approx_intersection
FROM e
"""


def _q_hll_set_algebra(sf_dir: str) -> pa.Table:
    """HLL set algebra: approx distinct users who viewed, clicked,
    either, and (by inclusion–exclusion) both — the register-max union
    property exact distinct counts don't compose into."""
    from dcs_ray.functions.sketches import hll_set_algebra

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_set_algebra(ev, "event_type", "user_id", "view", "click", p=8)


def _q_distinct_users_by_type(sf_dir: str) -> Any:
    """Grouped HLL: approx COUNT(DISTINCT user_id) per event_type —
    one fixed 2^p-byte register row per (block, key), max-merged by one
    small groupby; the APPROX_COUNT_DISTINCT ... GROUP BY shape."""
    from dcs_ray.functions.sketches import grouped_approx_distinct_hll

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return grouped_approx_distinct_hll(ev, "event_type", "user_id", p=8)


def _q_bm25_snippets(sf_dir: str) -> Any:
    """Search-result presentation: BM25 top-10 with a 50-char context
    snippet at the earliest query-term match, fetched with a pushed-down
    doc_id filter (only the k result docs leave storage)."""
    from dcs_ray.grep import first_match_snippets
    from dcs_ray.search import search_bm25

    words = _index_dir(sf_dir, "words")
    t = search_bm25(words, ["spark merge join"], k=10)
    ids = t["doc_id"].to_pylist()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    ).sort_by("doc_id")
    snip = first_match_snippets(docs["text"], ["spark", "merge", "join"])
    by_id = dict(zip(docs["doc_id"].to_pylist(), snip.to_pylist()))
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": t["score"],
            "snippet": pa.array([by_id.get(i, "") for i in ids], pa.string()),
        }
    )


def _q_running_totals(sf_dir: str) -> Any:
    """Per-user window functions (row_number / running sum / lag) in
    one bucketed pass — SUM OVER (PARTITION BY ... ORDER BY ...) shape."""
    from dcs_ray.functions.windows import running_agg

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        ts_us = (
            b["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pa.array(ts_us, pa.int64()),
                "event_id": b["event_id"],
                "value": b["value"],
            }
        )

    ds = running_agg(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id", order_col="ts_us", value_col="value", tie_col="event_id",
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    t = pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "row_number": t["row_number"],
            "percent_rank": t["percent_rank"],
            "ntile4": t["ntile4"],
            "running_sum": t["running_sum"],
            "lag_value": t["lag_value"],
        }
    )
    return t.sort_by([("user_id", "ascending"), ("row_number", "ascending")])


def _q_events_pivot(sf_dir: str) -> Any:
    """Pivot: per-user count matrix over a fixed event_type list —
    per-batch partial matrices, one combiner groupby."""
    from dcs_ray.functions.relational import pivot_counts

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    ds = pivot_counts(ev, "user_id", "event_type", ["click", "view", "purchase"])
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "n_click": t["n_click"],
            "n_view": t["n_view"],
            "n_purchase": t["n_purchase"],
        }
    ).sort_by("user_id")


def _q_text_near_dup_semantic(sf_dir: str) -> Any:
    """Embed -> dedup composition: hashing-trick embeddings feed the
    distributed block-pair exact near-dup (cos >= 0.9); the SQL oracle
    replays the embedding chain and the pair join."""
    from dcs_ray.functions.embed import hash_embed
    from dcs_ray.functions.simsearch import near_dup_pairs_exact

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    emb = hash_embed(docs)
    t = near_dup_pairs_exact(
        emb, threshold=0.9, id_col="doc_id", emb_col="embedding", num_blocks=4
    )
    return pa.table(
        {
            "id_a": t["id_a"],
            "id_b": t["id_b"],
            "cos_sim": t["cos_sim"],
        }
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _q_lang_quantiles_hist(sf_dir: str) -> Any:
    """Per-language approximate length quantiles via the grouped
    mergeable histogram sketch — the unbounded-cardinality scale path
    beside exact lang_quantiles; deterministic arithmetic, bit-exact
    oracle."""
    from dcs_ray.functions.quantiles import grouped_quantiles_histogram

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return grouped_quantiles_histogram(docs, "lang", "n_chars", [0.5, 0.9], bins=1024)


def _q_train_val_test_split(sf_dir: str) -> Any:
    """Deterministic 80/10/10 split by hash threshold ranges — same id,
    same split, any cluster size."""
    from dcs_ray.functions.sampling import split_dataset

    ds = split_dataset(_docs(sf_dir), seed=17)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.select(["doc_id", "split"]).sort_by("doc_id")


def _q_bm25_page2(sf_dir: str) -> Any:
    """Pagination (S8): page 2 of the ranking — top-20 minus top-10,
    exact and deterministic."""
    from dcs_ray.search import search_bm25

    words = _index_dir(sf_dir, "words")
    t = search_bm25(words, ["spark merge join"], k=20)
    page = t.slice(10, 10)
    return pa.table(
        {
            "rank": page["rank"].cast(pa.int64()),
            "doc_id": page["doc_id"].cast(pa.int64()),
            "score": page["score"],
        }
    )


def _q_bm25_multi(sf_dir: str) -> Any:
    """Batched query fan-out: three queries ranked in ONE Ray pipeline
    (per-shard tasks score all queries against their shard)."""
    from dcs_ray.search import search_bm25

    words = _index_dir(sf_dir, "words")
    t = search_bm25(
        words, ["spark merge join", "customer window batch", "vector column agg"], k=5
    )
    return pa.table(
        {
            "query_id": t["query_id"].cast(pa.int64()),
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": t["score"],
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_doc_lm_score(sf_dir: str) -> Any:
    """Self-trained bigram LM quality scores: counts trained in one
    corpus pass (vocabulary-sized exchange), broadcast once via ray.put,
    scored in a second vectorized pass."""
    import ray as _ray

    from dcs_ray.functions.lm import bigram_lm_scores, train_bigram_counts

    counts = train_bigram_counts(_docs(sf_dir))
    ref = _ray.put(counts)
    ds = bigram_lm_scores(_docs(sf_dir), ref, alpha=1.0)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_ccnet_buckets(sf_dir: str) -> Any:
    """CCNet head/middle/tail perplexity split (Wenzek '20): self-
    trained bigram LM scores ranked per language, exact-thirds cut —
    the canonical quality-tiering step of the CCNet pipeline, replayed
    with the doc_lm_score CTE chain + a per-lang row_number."""
    import ray as _ray

    from dcs_ray.functions.lm import ccnet_perplexity_buckets, train_bigram_counts

    counts = train_bigram_counts(_docs(sf_dir))
    ref = _ray.put(counts)
    ds = ccnet_perplexity_buckets(_docs(sf_dir), ref, alpha=1.0)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_tfidf_keywords(sf_dir: str) -> Any:
    """Per-doc top-3 TF-IDF keywords: vocabulary-sized df broadcast +
    fully vectorized per-batch tf/score/top-k (no shuffle; a doc's terms
    never leave its batch)."""
    from dcs_ray.functions.textstats import tfidf_keywords

    ds = tfidf_keywords(_docs(sf_dir), k=3)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t


def _q_related_terms(sf_dir: str) -> pa.Table:
    """Query-expansion candidates for 'spark': top-20 terms by
    document-level PMI (Church & Hanks '90) — the "related searches"
    suggestion signal. One streaming pass; vocabulary-sized
    (df, co_df) partials, co-counts conditioned on a batch-local
    contains-query mask; df_q recovered from the fold itself."""
    from dcs_ray.functions.textstats import cooccur_pmi

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return cooccur_pmi(ds, "spark", k=20, min_pair_df=2)


def _q_autocomplete(sf_dir: str) -> pa.Table:
    """Search-box autocompletion for the prefix 'st': top-10 corpus
    terms by document frequency. Prefix filter pushed into the
    per-batch partial so the exchange carries only matching terms."""
    from dcs_ray.functions.textstats import complete_prefix

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return complete_prefix(ds, "st", k=10)


def _q_autocomplete_suffix(sf_dir: str) -> pa.Table:
    """Leading-wildcard completion '*er': top-10 corpus terms ending
    with the pattern by df — the reversed-dictionary query; the
    ends_with filter is pushed into each batch partial."""
    from dcs_ray.functions.textstats import complete_suffix

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return complete_suffix(ds, "er", k=10)


def _q_bm25_eval(sf_dir: str) -> pa.Table:
    """Retrieval evaluation of the BM25 top-10 run: NDCG@10 + MRR
    against the lexical relevance oracle (doc contains ALL query
    terms). Labeling streams the corpus once, one partial row per
    block; the ranked ids are broadcast; the oracle replays ranking,
    labels, and both metrics in one statement."""
    from dcs_ray.functions.evaluate import ranking_metrics
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    ranked = t["doc_id"].to_pylist()
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ranking_metrics(docs, ranked, BM25_QUERY.split(), k=10)


def _q_bm25_pruned(sf_dir: str) -> pa.Table:
    """BM25 top-10 over the statically PRUNED serving tier (Carmel '01:
    top-32 postings per term by tf desc, doc_id asc; idf/avgdl/doc_len
    stay full-corpus). Exercises the whole prune job — shard-local
    candidate cut, bucketed global selection, shard rewrite — plus the
    unchanged search path over the pruned generation; the oracle
    replays pruning with one window function and re-scores."""
    from dcs_ray.index.prune import prune_index
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    out = idx + "_pruned32"
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        prune_index(idx, out, m=32)
    t = search_bm25(out, [BM25_QUERY], k=10)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


_TUNE_GRID = [(0.5, 0.75), (0.9, 0.4), (1.2, 0.0), (1.2, 0.75), (1.5, 0.75), (2.0, 1.0)]


def _q_bm25_tune(sf_dir: str) -> pa.Table:
    """Distributed BM25 parameter sweep: six (k1, b) combos scored over
    the resident shard tasks (per-worker score caches key on the
    params), NDCG@10 + MRR vs the lexical relevance oracle with ONE
    labeling pass over the union of all combos' top-10s."""
    from dcs_ray.functions.evaluate import tune_bm25

    idx = _index_dir(sf_dir, "words")
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tune_bm25(idx, docs, BM25_QUERY, _TUNE_GRID, k=10)


def _q_more_like_this(sf_dir: str) -> pa.Table:
    """Related documents for doc 42 (Lucene MoreLikeThis shape): its
    top-5 tf·ln(N/df) terms — df from the index's global stats table,
    no corpus pass — become a BM25 query; the source doc is excluded
    and ranks renumbered."""
    import pyarrow.dataset as pads

    from dcs_ray.search import more_like_this

    idx = _index_dir(sf_dir, "words")
    target = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id") == 42
    )
    t = more_like_this(
        idx, target["text"][0].as_py(), exclude_doc_id=42, n_terms=5, k=10
    )
    return t.set_column(
        2, "score", pa.array(np.round(t["score"].to_numpy(), 6), pa.float64())
    )


def _q_stemmed_term_df(sf_dir: str) -> pa.Table:
    """Stemmed-field dictionary: document frequencies over S-stemmed
    terms (Harman '91 plural conflation) — the analyzer pass a stemmed
    index field is built from. Stems computed once per batch token
    dictionary; vocabulary-sized partials."""
    from dcs_ray.functions.stem import stemmed_term_df

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return stemmed_term_df(ds)


def _q_bpe_word_counts(sf_dir: str) -> Any:
    """The corpus-sized half of BPE training: distributed word count
    (per-batch dictionary-encode partials, vocabulary-sized fold)."""
    from dcs_ray.functions.bpe import word_counts

    words, n = word_counts(_docs(sf_dir))
    return pa.table({"word": words, "n": pa.array(n, pa.int64())})


_BPE_N_MERGES = 50


def _bpe_merge_chain_ctes(n_merges: int) -> tuple[str, str]:
    """(CTE fragment, merge-table union) replaying BPE training
    (Sennrich '16) as ``n_merges`` generated rounds — the k-core /
    PageRank generated-CTE house pattern. Each word's tokenization is
    a string of ``chr(1)||token||chr(2)`` cells, so the round's merge
    is one fully-delimited ``replace()`` (left-to-right non-overlap =
    the engine's greedy within-word walk; both sentinels prevent
    token-prefix/suffix false matches). Each round recounts pairs
    fresh — exact, like the engine's incrementally-maintained stats —
    and picks argmax with ties to the lexicographically smallest
    (left, right), DuckDB's binary varchar order = Python's tuple
    order on these ASCII tokens."""
    parts = [
        "wc AS MATERIALIZED (SELECT term AS word, count(*)::bigint AS n "
        "FROM tok GROUP BY term)",
        "w0 AS MATERIALIZED (SELECT word, n, "
        "array_to_string(list_transform(generate_series(1, length(word) - 1), "
        "i -> chr(1) || word[i] || chr(2)), '') "
        "|| chr(1) || word[length(word)] || '</w>' || chr(2) AS toks FROM wc)",
    ]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
  SELECT pr[1] AS lt, pr[2] AS rt, sum(n)::bigint AS cnt
  FROM (SELECT n, unnest(list_transform(generate_series(1, len(ts) - 2),
                                        i -> [ts[i][2:], ts[i+1][2:]])) AS pr
        FROM (SELECT n, string_split(toks, chr(2)) AS ts FROM w{r}))
  GROUP BY lt, rt)""")
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT lt, rt, cnt FROM p{r} "
            "ORDER BY cnt DESC, lt, rt LIMIT 1)"
        )
        parts.append(f"""w{r + 1} AS MATERIALIZED (
  SELECT word, n, replace(toks,
      chr(1) || (SELECT lt FROM b{r}) || chr(2) || chr(1)
              || (SELECT rt FROM b{r}) || chr(2),
      chr(1) || (SELECT lt FROM b{r}) || (SELECT rt FROM b{r}) || chr(2)
    ) AS toks FROM w{r})""")
    union = "\nUNION ALL ".join(
        f"SELECT {r} AS rank, lt, rt, cnt FROM b{r}" for r in range(n_merges)
    )
    return ",\n".join(parts), union


def _bpe_merges_sql() -> str:
    ctes, union = _bpe_merge_chain_ctes(_BPE_N_MERGES)
    return f"""
WITH tok AS ({_TOK}),
{ctes}
SELECT rank::bigint AS rank, lt AS "left", rt AS "right",
       cnt AS pair_count
FROM ({union}) ORDER BY rank
"""


def _bpe_subtoken_count_sql() -> str:
    """Merge chain + a recursive-CTE replay of ``encode_word``'s
    min-rank walk: each step merges the LEFTMOST adjacent pair of
    MINIMUM merge rank (ORDER BY rank, i LIMIT 1) until no adjacent
    pair is in the table; per-doc count = sum of final lengths over
    the doc's word occurrences. Fully self-contained — the merge
    table itself is derived by the training replay, so this gate
    covers train AND encode end-to-end."""
    ctes, union = _bpe_merge_chain_ctes(_BPE_N_MERGES)
    return f"""
WITH RECURSIVE tok AS ({_TOK}),
{ctes},
m AS MATERIALIZED (SELECT rank, lt, rt FROM ({union})),
words AS (SELECT DISTINCT word FROM wc),
ml AS MATERIALIZED (SELECT list(lt || chr(1) || rt ORDER BY rank) AS pl FROM m),
enc(word, ts) AS (
  SELECT word,
         list_append(list_transform(generate_series(1, length(word) - 1),
                                    i -> word[i]),
                     word[length(word)] || '</w>')
  FROM words
  UNION ALL
  -- one step of encode_word: merge the LEFTMOST adjacent pair with
  -- the MINIMUM rank ([rank, i] lexicographic list_sort; pl is in
  -- rank order so list_position IS the 1-based rank; 0 = not found
  -- in this DuckDB). A JOIN against the derived m here silently
  -- matches nothing inside the recursion (DuckDB 1.0 quirk) — the
  -- cross-joined single-row pair-list is the shape that works.
  SELECT word, list_concat(list_concat(ts[1:bj-1], [ts[bj] || ts[bj+1]]),
                           ts[bj+2:]) AS ts
  FROM (
    SELECT e.word, e.ts,
           list_sort(list_filter(
             list_transform(generate_series(1, len(e.ts) - 1),
               i -> [list_position(ml.pl, e.ts[i] || chr(1) || e.ts[i+1]), i]),
             x -> x[1] IS NOT NULL AND x[1] > 0))[1][2] AS bj
    FROM enc e, ml)
  WHERE bj IS NOT NULL
),
fin AS (
  SELECT word, len(ts)::bigint AS n_sub
  FROM enc, ml
  WHERE len(list_filter(generate_series(1, len(ts) - 1),
                        i -> list_contains(ml.pl, ts[i] || chr(1) || ts[i+1]))) = 0),
per_doc AS (
  SELECT t.doc_id, sum(f.n_sub)::bigint AS n
  FROM tok t JOIN fin f ON t.term = f.word GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(p.n, 0)::bigint AS n_subtokens
FROM documents d LEFT JOIN per_doc p USING (doc_id) ORDER BY doc_id
"""


def _q_bpe_merges(sf_dir: str) -> Any:
    """Learned BPE merge table (Sennrich et al. 2016) — deterministic
    (count desc, lexicographic pair tie-break), ORACLED by a generated
    per-round CTE chain (see ``_bpe_merge_chain_ctes``) plus the
    original from-scratch-recount pytest."""
    from dcs_ray.functions.bpe import train_bpe_merges, word_counts

    words, n = word_counts(_docs(sf_dir))
    merges = train_bpe_merges(words, n, n_merges=_BPE_N_MERGES)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def _q_bpe_subtoken_count(sf_dir: str) -> Any:
    """Per-doc token count under the corpus-trained BPE vocab — the
    actor-pool encode stage (merge table loaded once per actor, unique
    words memoized). ORACLED end-to-end: training replayed by the
    generated merge-round chain, encoding by a recursive-CTE min-rank
    walk (see ``_bpe_subtoken_count_sql``)."""
    from dcs_ray.functions.bpe import (
        bpe_subtoken_counts,
        train_bpe_merges,
        word_counts,
    )

    words, n = word_counts(_docs(sf_dir))
    merges = train_bpe_merges(words, n, n_merges=_BPE_N_MERGES)
    ds = bpe_subtoken_counts(_docs(sf_dir), merges)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _docs_en(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    return _docs(sf_dir).map_batches(
        lambda b: b.filter(pc.equal(b["lang"], "en")), batch_format="pyarrow"
    )


def _q_dsir_weights(sf_dir: str) -> Any:
    """DSIR importance weights (Xie et al. 2023): hashed-bigram count
    tables for target (lang='en') and raw corpora broadcast once, one
    vectorized scoring pass. Oracle replays with string bigrams — the
    gate doubles as a hash-collision-freeness check (decontaminate
    convention)."""
    import ray as _ray

    from dcs_ray.functions.dsir import bigram_counts, dsir_log_weights

    docs = _docs(sf_dir)
    target = _docs_en(sf_dir)
    t_ref = _ray.put(bigram_counts(target))
    r_ref = _ray.put(bigram_counts(docs))
    ds = dsir_log_weights(docs, t_ref, r_ref, alpha=1.0)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.sort_by("doc_id")


def _q_dsir_select(sf_dir: str) -> Any:
    """End-to-end DSIR selection at keep_frac=0.25: distributed-quantile
    cutoff + recompute-and-filter pass (no join, no corpus-sized driver
    state)."""
    from dcs_ray.functions.dsir import dsir_select

    docs = _docs(sf_dir)
    ds = dsir_select(docs, _docs_en(sf_dir), keep_frac=0.25)
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.select(["doc_id"]).sort_by("doc_id")


def _q_pagerank(sf_dir: str) -> Any:
    """Distributed PageRank (5 power iterations, d=0.85) over a
    deterministic directed functional graph on events — the computed
    web-graph static prior (F7's ``prior`` column, derived instead of
    given). Rank/out-degree vectors broadcast per iteration; edges
    stream; the oracle replays all 5 iterations in chained SQL CTEs."""
    from dcs_ray.functions.graph import pagerank

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_id"])

    def edges(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy().astype(np.int64)
        v1 = (e // 20) * 20 + (e * 13 + 5) % 20
        m = e % 3 == 0
        v2 = (e[m] // 20) * 20 + (e[m] * 7 + 3) % 20
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([e, e[m]]), pa.int64()),
                "id_b": pa.array(np.concatenate([v1, v2]), pa.int64()),
            }
        )

    return pagerank(ev.map_batches(edges, batch_format="pyarrow"), n_iter=5)


def _link_edges_ds(sf_dir: str):
    """Shared head of the web-graph queries: pages → fused newest-crawl
    edge extraction (per-batch extraction BEFORE the newest-wins
    shuffle, so the exchange carries edge rows, never html)."""
    from dcs_ray.functions.links import extract_link_edges_latest
    from dcs_ray.sources.pages import read_pages

    return extract_link_edges_latest(read_pages(sf_dir))


def _q_link_edges(sf_dir: str) -> pa.Table:
    """Web link graph extracted from the pages html (<nav> anchors):
    (src, dst, anchor) per link. The synthesis makes the graph a pure
    function of documents, so the oracle replays it with list-indexing
    CTEs — extraction correctness is checked edge-for-edge."""
    edges = _link_edges_ds(sf_dir)
    t = pa.concat_tables(
        pa.table(b) for b in edges.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by(
        [("src", "ascending"), ("dst", "ascending"), ("anchor", "ascending")]
    )


def _q_anchor_terms_topk(sf_dir: str) -> pa.Table:
    """Anchor-text index field: terms of anchors pointing AT each doc,
    counted with map-side combining, global top-100 by (anchor_tf desc,
    doc_id, term). Per-block local top-100 before the driver merge —
    the driver never sees more than 100 rows per block."""
    from dcs_ray.functions.links import anchor_term_counts

    counts = anchor_term_counts(_link_edges_ds(sf_dir))
    order = [("anchor_tf", "descending"), ("doc_id", "ascending"), ("term", "ascending")]

    def local_top(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 100)

    parts = [
        pa.table(b)
        for b in counts.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
         "anchor_tf": pa.array([], pa.int64())}
    )
    return merged.sort_by(order).slice(0, 100)


def _q_link_pagerank(sf_dir: str) -> pa.Table:
    """PageRank over the EXTRACTED web graph (not a synthetic functional
    graph): the computed static prior a web index feeds into pre-ranking
    (dcs F7/J6 role). 5 power iterations, d=0.85, replayed in chained
    SQL CTEs over the same deterministic link synthesis."""
    from dcs_ray.functions.links import link_pagerank

    return link_pagerank(_link_edges_ds(sf_dir), n_iter=5, damping=0.85)


def _q_personalized_pagerank(sf_dir: str) -> pa.Table:
    """Personalized (topic-sensitive) PageRank over the extracted web
    graph: teleport mass restricted to a seed page set — Haveliwala's
    '02 "related pages" signal, the query-dependent counterpart of the
    static prior. Seeds = the 3 smallest source doc_ids, found with a
    per-block distinct-min pass (driver sees ≤3 ids per block); the
    oracle replays teleport, dangling redistribution, and all 5
    iterations in chained CTEs."""
    from dcs_ray.functions.links import link_pagerank

    edges = _link_edges_ds(sf_dir).materialize()

    def local_min(b: pa.Table) -> pa.Table:
        u = np.unique(b["src"].to_numpy().astype(np.int64))[:3]
        return pa.table({"node": pa.array(u, pa.int64())})

    parts = [
        b["node"].to_numpy(zero_copy_only=False)
        for b in edges.map_batches(local_min, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    seeds = np.unique(np.concatenate(parts))[:3].tolist() if parts else []
    return link_pagerank(edges, n_iter=5, damping=0.85, seeds=seeds)


def _q_host_rank_mass(sf_dir: str) -> pa.Table:
    """Site-level authority: per-page PageRank folded into per-host
    rank mass (host = the page synthesis's ``source``.example.org).
    The rank vector is broadcast once and probed with searchsorted;
    docs stream; mass travels as exact integer micro-units so the fold
    is order-independent; exchange is |hosts|-bounded."""
    import pyarrow.compute as pc

    from dcs_ray.functions.links import host_rank_mass, link_pagerank

    ranks = link_pagerank(_link_edges_ds(sf_dir), n_iter=5, damping=0.85)
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(
        lambda b: b.append_column(
            "host", pc.binary_join_element_wise(b["source"], ".example.org", "")
        ),
        batch_format="pyarrow",
    )
    ds = host_rank_mass(ranks, docs)
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by("host")


def _pairs_top100(counts) -> pa.Table:
    """Global top-100 of a (id_a, id_b, n_shared) pair-count Dataset by
    (n_shared desc, id_a, id_b): per-block local top-100 before the
    driver merge — the driver never sees more than 100 rows per block."""
    order = [
        ("n_shared", "descending"),
        ("id_a", "ascending"),
        ("id_b", "ascending"),
    ]

    def local_top(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 100)

    parts = [
        pa.table(b)
        for b in counts.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    )
    return merged.sort_by(order).slice(0, 100)


def _q_cocitation_topk(sf_dir: str) -> pa.Table:
    """Co-citation pairs (Small '73): pages linked TOGETHER by the same
    source — the 'related pages' web-graph similarity. Bucketed
    vectorized pair generation, combiner-folded counts, top-100."""
    from dcs_ray.functions.links import cocitation_counts

    return _pairs_top100(cocitation_counts(_link_edges_ds(sf_dir)))


def _q_coupling_topk(sf_dir: str) -> pa.Table:
    """Bibliographic coupling pairs (Kessler '63): pages linking to the
    SAME target — similarity between citing pages."""
    from dcs_ray.functions.links import coupling_counts

    return _pairs_top100(coupling_counts(_link_edges_ds(sf_dir)))


def _q_coupling_jaccard(sf_dir: str) -> pa.Table:
    """Outlink-profile Jaccard similarity between citing pages, top-20
    — bibliographic coupling normalized by degree so mega-hubs don't
    dominate. One integer division per pair: bit-exact vs SQL."""
    from dcs_ray.functions.links import coupling_jaccard_topk

    return coupling_jaccard_topk(_link_edges_ds(sf_dir), k=20)


def _q_link_hits(sf_dir: str) -> pa.Table:
    """HITS hubs/authorities over the EXTRACTED web graph (Kleinberg
    '99) — the query-independent companion to PageRank: authorities ≈
    good link targets, hubs ≈ good link lists. 5 mutual-reinforcement
    iterations, L1-normalized each half-step, replayed in chained SQL
    CTEs over the same deterministic link synthesis."""
    from dcs_ray.functions.links import link_hits

    return link_hits(_link_edges_ds(sf_dir), n_iter=5)


def _q_link_degree_stats(sf_dir: str) -> pa.Table:
    """Per-doc in/out link-degree ranking features with LEFT-JOIN zeros
    — the first-order static link signals next to PageRank. Degree
    vectors are node-sized driver folds broadcast once; docs stream."""
    from dcs_ray.functions.links import link_degree_stats

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ds = link_degree_stats(_link_edges_ds(sf_dir), docs)
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("doc_id")


def _link_pair_edges(sf_dir: str):
    """Link edges renamed to the (id_a, id_b) pair schema the
    undirected graph kernels consume."""
    return _link_edges_ds(sf_dir).map_batches(
        lambda b: pa.table({"id_a": b["src"], "id_b": b["dst"]}),
        batch_format="pyarrow",
    )


def _q_link_triangles(sf_dir: str) -> pa.Table:
    """Per-node triangle counts over the undirected web graph —
    clustering-coefficient numerator / link-ring signal. Degree-ordered
    wedge generation + bucketed closure join (Suri & Vassilvitskii
    '11); the oracle is the canonical 3-way edge self-join."""
    from dcs_ray.functions.graph import triangle_counts

    ds = triangle_counts(_link_pair_edges(sf_dir))
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("node")


def _q_host_link_graph(sf_dir: str) -> pa.Table:
    """Site-level link graph: page edges rolled up to (src_host,
    dst_host, n_links) through two hash-partitioned big⋈big joins
    against the corpus doc→host mapping (never broadcast), then a
    combiner count fold."""
    import pyarrow.compute as pc

    from dcs_ray.functions.links import host_link_graph

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(
        lambda b: b.append_column(
            "host", pc.binary_join_element_wise(b["source"], ".example.org", "")
        ),
        batch_format="pyarrow",
    )
    ds = host_link_graph(_link_edges_ds(sf_dir), docs)
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("src_host", "ascending"), ("dst_host", "ascending")])


def _q_link_reachability(sf_dir: str) -> pa.Table:
    """Directed BFS reachability from the 3 smallest source pages:
    (node, hops) for every page within 3 link hops — crawl-frontier
    analysis. One streaming edge pass per hop with the visited set
    broadcast; the oracle chains one frontier CTE per hop."""
    from dcs_ray.functions.graph import bfs_hops

    edges = _link_edges_ds(sf_dir).materialize()

    def local_min(b: pa.Table) -> pa.Table:
        u = np.unique(b["src"].to_numpy().astype(np.int64))[:3]
        return pa.table({"node": pa.array(u, pa.int64())})

    parts = [
        b["node"].to_numpy(zero_copy_only=False)
        for b in edges.map_batches(local_min, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    seeds = np.unique(np.concatenate(parts))[:3].tolist() if parts else []
    return bfs_hops(edges, seeds, max_hops=3, src="src", dst="dst")


def _q_link_communities(sf_dir: str) -> pa.Table:
    """Label-propagation communities (Raghavan '07, deterministic
    min-tie variant) on the undirected web graph after 5 synchronous
    rounds — every round replayed in the oracle as a chained
    count/argmax CTE pair."""
    from dcs_ray.functions.graph import label_propagation

    ds = label_propagation(_link_pair_edges(sf_dir), n_iter=5)
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by("node")


def _q_link_clustering(sf_dir: str) -> pa.Table:
    """Local clustering coefficients over the undirected web graph:
    2·T(v)/(deg·(deg−1)) — the per-node cohesion feature on top of the
    triangle pipeline; integer-input division replays bit-exactly."""
    from dcs_ray.functions.graph import clustering_coefficients

    return clustering_coefficients(_link_pair_edges(sf_dir)).sort_by("node")


def _q_search_prf(sf_dir: str) -> pa.Table:
    """Pseudo-relevance-feedback BM25 (Rocchio shape): top-10 for the
    base query become the pseudo-relevant set, their 3 strongest
    tf·ln(N/df) non-query terms expand the query, second pass re-ranks.
    Both passes are the per-shard fan-out; only the 10 relevant docs
    leave storage in between."""
    from dcs_ray.search import search_prf

    return search_prf(
        _index_dir(sf_dir, "words"),
        BM25_QUERY,
        f"{sf_dir}/documents.parquet",
        n_docs=10,
        n_terms=3,
        k=10,
    )


def _q_search_corrected(sf_dir: str) -> pa.Table:
    """Spell-corrected search: 'spork merje join' — the two
    out-of-vocab terms correct to their best distance-1 suggestion
    (df desc, term asc), 'join' passes through, then the normal BM25
    fan-out ranks the corrected query."""
    from dcs_ray.search import search_corrected

    return search_corrected(_index_dir(sf_dir, "words"), "spork merje join", k=10)


def _q_search_rrf(sf_dir: str) -> pa.Table:
    """Reciprocal-rank fusion (Cormack et al. '09, K=60) of three
    independently-distributed rankings: body BM25 top-20, anchor-field
    BM25 top-20 (the anchor pseudo-doc index searched standalone), and
    the PageRank static order top-20. Each subsystem is the existing
    gated distributed pipeline; fusion touches only 3·k rows on the
    driver. rrf = Σ 1/(60 + rank_sys), summed in the fixed (body,
    anchor, pagerank) order so the doubles match the SQL replay."""
    from dcs_ray.functions.links import link_pagerank
    from dcs_ray.search import search_bm25

    k = 20
    body = search_bm25(_index_dir(sf_dir, "words"), [BM25_QUERY], k=k)
    anchor = search_bm25(_anchor_index_dir(sf_dir), [BM25_QUERY], k=k)
    pr = link_pagerank(_link_edges_ds(sf_dir), n_iter=5, damping=0.85)
    pr_order = pr.sort_by([("rank", "descending"), ("node", "ascending")]).slice(0, k)

    ranks: dict[int, list[int]] = {}
    for i, t in enumerate(
        (
            body.column("doc_id").to_pylist(),
            anchor.column("doc_id").to_pylist(),
            pr_order.column("node").to_pylist(),
        )
    ):
        for r, d in enumerate(t, start=1):
            ranks.setdefault(int(d), [0, 0, 0])[i] = r
    ids = sorted(ranks)
    rrf = np.zeros(len(ids), np.float64)
    for j, d in enumerate(ids):
        b, a, p = ranks[d]
        s = np.float64(0.0)
        for r in (b, a, p):  # fixed fold order = the SQL coalesce sum
            s = s + (np.float64(1.0) / np.float64(60 + r) if r else np.float64(0.0))
        rrf[j] = s
    order = np.lexsort((np.asarray(ids, np.int64), -rrf))[:10]
    out_ids = np.asarray(ids, np.int64)[order]
    out_rrf = np.round(rrf[order], 6)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(out_ids, pa.int64()),
            "rrf_score": pa.array(out_rrf, pa.float64()),
        }
    )


def _pagerank_index_dir(sf_dir: str) -> str:
    """Body index whose doc_meta ``prior`` is the COMPUTED link-graph
    PageRank (``1 + N·rank``, 1.0 for docs outside the graph) — the
    full web chain for dcs's F7 static pre-rank: crawl → links →
    pagerank → prior baked into doc_meta at build → multiplied into
    BM25 inside each shard task. Rank vector is node-sized: broadcast
    once via ``ray.put`` and probed with searchsorted per build batch."""
    from dcs_ray.functions.links import link_pagerank
    from dcs_ray.index import IndexConfig, build_index

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_wordspr")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        ranks = link_pagerank(_link_edges_ds(sf_dir), n_iter=5, damping=0.85)
        nodes = ranks["node"].to_numpy()
        pri = 1.0 + len(nodes) * ranks["rank"].to_numpy()
        nref, pref = ray.put(nodes), ray.put(pri)

        def with_prior(b: pa.Table, _n=nref, _p=pref) -> pa.Table:
            nd, pv = ray.get(_n), ray.get(_p)
            ids = b["doc_id"].to_numpy()
            pos = np.clip(np.searchsorted(nd, ids), 0, max(len(nd) - 1, 0))
            found = nd[pos] == ids if len(nd) else np.zeros(len(ids), bool)
            prior = np.where(found, pv[pos] if len(nd) else 1.0, 1.0)
            return b.append_column("prior", pa.array(prior, pa.float64()))

        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ).map_batches(with_prior, batch_format="pyarrow")
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode="words",
            id_col="doc_id",
            dedup_latest=False,
            meta_cols=("source", "prior"),
        )
        build_index(docs, out, conf)
    return out


def _q_bm25_pagerank(sf_dir: str) -> pa.Table:
    """BM25 × computed PageRank prior: the derived version of
    bm25_prior's given column — the complete web-ranking signal chain
    gated end to end (link synthesis → pagerank → prior → ranking)."""
    from dcs_ray.search import search_bm25

    t = search_bm25(_pagerank_index_dir(sf_dir), [BM25_QUERY], k=10, prior_col="prior")
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_bm25_anchor(sf_dir: str) -> pa.Table:
    """Two-field web ranking: body BM25 + 0.5 × anchor-field BM25
    (each field its own df/dl/avgdl — BM25F-lite). Anchor-only docs
    rank too; the oracle replays both fields and FULL OUTER JOINs."""
    from dcs_ray.search import search_bm25_fielded

    t = search_bm25_fielded(
        _index_dir(sf_dir, "words"),
        _anchor_index_dir(sf_dir),
        [BM25_QUERY],
        k=10,
        anchor_weight=0.5,
    )
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _crawl_snapshot(sf_dir: str, side: str) -> ray.data.Dataset:
    """Deterministic two-snapshot synthesis from documents (pure
    per-row functions, fully vectorized — replayed by the oracle):
    old = urls with doc_id % 11 != 3 (the %11==3 rows are 'added'
    later), content suffixed ' legacy' for doc_id % 7 == 0 (→ those
    urls read 'changed'); new = urls with doc_id % 13 != 5 (the
    %13==5 rows were 'removed'), current content."""

    def mk(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy()
        keep = (ids % 11 != 3) if side == "old" else (ids % 13 != 5)
        t = b.filter(pa.array(keep))
        ids2 = t["doc_id"].to_numpy()
        urls = pa.array(
            np.char.add(
                "url://doc/", np.char.zfill(ids2.astype("U20"), 8)
            ).tolist(),
            pa.string(),
        )
        text = t["text"].combine_chunks().cast(pa.string())
        if side == "old":
            suffix = pa.array(
                np.where(ids2 % 7 == 0, " legacy", "").tolist(), pa.string()
            )
            text = pc.binary_join_element_wise(text, suffix, "")
        return pa.table({"url": urls, "text": text})

    return _docs(sf_dir).map_batches(mk, batch_format="pyarrow")


def _q_crawl_delta(sf_dir: str) -> pa.Table:
    """Cross-crawl CDX-style delta: per-url added/removed/changed/
    unchanged counts between two deterministic snapshots; content never
    crosses an exchange (per-batch 64-bit content hashes)."""
    from dcs_ray.functions.crawl import crawl_delta

    return crawl_delta(
        _crawl_snapshot(sf_dir, "old"), _crawl_snapshot(sf_dir, "new")
    )


def _q_spell_suggest(sf_dir: str) -> pa.Table:
    """SymSpell deletion-key spelling suggestion over the index's own
    df table (vocab streamed as a Dataset; probe keys broadcast): top-5
    corrections per misspelled word by (df desc, term)."""
    from dcs_ray.functions.spell import suggest

    idx = _index_dir(sf_dir, "words")
    vocab = ray.data.read_parquet(os.path.join(idx, "stats", "df.parquet"))
    return suggest(vocab, ["merje", "spork"], k=5)


def _q_search_facets(sf_dir: str) -> pa.Table:
    """Facet counts for the query's candidate set (docs matching ≥1
    term), top-10 sources by matching-doc count — dcs-web's grouped
    per-package result view as a distributed count aggregate."""
    from dcs_ray.search import search_facets

    t = search_facets(
        _index_dir(sf_dir, "words"), [BM25_QUERY], facet_col="source", k_facets=10
    )
    return pa.table({"facet": t["facet"], "n_docs": t["n_docs"]})


_MIX_WEIGHTS = {"en": 4, "de": 3, "es": 2, "zh": 1}  # fr dropped
_MIX_TOTAL = 200


def _q_rebalance_mixture(sf_dir: str) -> Any:
    """Deterministic training-mixture rebalance over lang: exact
    integer-arithmetic per-group hash thresholds, fr weighted 0."""
    from dcs_ray.functions.sampling import rebalance_to_weights

    ds = rebalance_to_weights(
        _docs(sf_dir), "lang", _MIX_WEIGHTS, _MIX_TOTAL, seed=5
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    return t.select(["doc_id", "lang"]).sort_by("doc_id")


def _li_rev1e4(b: pa.Table, extra: dict | None = None) -> pa.Table:
    """Shared lineitem money kernel: revenue in exact integer 1e-4
    units (price cents × (100 - discount pct)), the same fixed-point
    convention every TPC-H-style gate in this file uses."""
    p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
    cols = dict(extra or {})
    cols["rev1e4"] = pa.array(p * (100 - d), pa.int64())
    return pa.table(cols)


def _q_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q6-style forecast revenue change: discounted revenue that
    would be recovered by dropping 1996 discounts of 5-7% on small
    (<24 qty) lineitems. Pure filter + map + one scalar sum — the
    shipdate predicate is pushed into the parquet scan, the
    discount/quantity predicates are applied on exact integer units
    inside the batch kernel, and the only driver traffic is one int64
    per block (`Dataset.sum`)."""
    import datetime

    import pyarrow.dataset as pads

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def kernel(b: pa.Table) -> pa.Table:
        p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        q = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        mask = (d >= 5) & (d <= 7) & (q < 2400)
        return pa.table({"disc1e4": pa.array(p[mask] * d[mask], pa.int64())})

    total = li.map_batches(kernel, batch_format="pyarrow").sum("disc1e4") or 0
    return pa.table(
        {
            "disc_rev1e4": pa.array([total], pa.int64()),
            "revenue": pa.array([round(total / 10000.0, 6)], pa.float64()),
        }
    )


def _q_order_priority_counts(sf_dir: str) -> pa.Table:
    """TPC-H-Q4-shape order-priority check: orders placed in 1996Q2
    that had at least one returned lineitem, counted per priority.
    The EXISTS is a distributed semi-join: lineitem collapses to
    distinct returned orderkeys via the map-side combiner (the
    exchange carries keys, never lineitems), one hash-partitioned
    join against the date-filtered orders, then a combiner count per
    priority (5 rows to the driver)."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import combiner_groupby, shuffle_join

    lo = datetime.datetime(1996, 4, 1)
    hi = datetime.datetime(1996, 7, 1)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    returned = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        filter=pads.field("l_returnflag") == "R",
    )
    distinct_keys = combiner_groupby(returned, ["l_orderkey"], [])
    j = shuffle_join(orders, distinct_keys, on="o_orderkey", right_on="l_orderkey")
    counts = combiner_groupby(j, ["o_orderpriority"], [], count_col="order_count")
    t = pa.concat_tables(
        [pa.table(b) for b in counts.iter_batches(batch_format="pyarrow")]
    )
    return t.select(["o_orderpriority", "order_count"]).sort_by("o_orderpriority")


def _q_customer_order_histogram(sf_dir: str) -> pa.Table:
    """TPC-H-Q13-shape customer order-count distribution, including
    the zero bucket (customers with no orders — the LEFT OUTER JOIN
    role). Two combiner groupbys: orders → per-customer counts
    (customer-sized exchange), counts → histogram (≤ max-count rows).
    The zero bucket is arithmetic on two block-metadata counts, not a
    join: |customer| − |customers with ≥1 order|."""
    import pyarrow.compute as pc

    from dcs_ray.functions.relational import combiner_groupby

    orders = read_parquet_sized(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    per_cust = combiner_groupby(orders, ["o_custkey"], [], count_col="c_count")
    hist = combiner_groupby(per_cust, ["c_count"], [], count_col="custdist")
    t = pa.concat_tables(
        [pa.table(b) for b in hist.iter_batches(batch_format="pyarrow")]
    )
    n_customers = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    n_with = int(pc.sum(t["custdist"]).as_py() or 0)
    if n_customers - n_with > 0:
        zero = pa.table(
            {
                "c_count": pa.array([0], t["c_count"].type),
                "custdist": pa.array([n_customers - n_with], pa.int64()),
            }
        )
        t = pa.concat_tables([t.select(["c_count", "custdist"]), zero])
    else:
        t = t.select(["c_count", "custdist"])
    return t.sort_by([("custdist", "descending"), ("c_count", "descending")])


def _q_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H-Q15-style top supplier: per-supplier 1996Q1 revenue via
    the map-side combiner (supplier-sized exchange), the global max as
    one `Dataset.max` scalar, equality filter, then a broadcast join
    for the supplier name. Returns every supplier tied at the max."""
    import datetime

    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    rev = li.map_batches(
        lambda b: _li_rev1e4(b, {"l_suppkey": b["l_suppkey"]}),
        batch_format="pyarrow",
    )
    per_supp = combiner_groupby(rev, ["l_suppkey"], ["rev1e4"]).materialize()
    best = per_supp.max("rev1e4")
    top = per_supp.filter(expr=f"rev1e4 == {int(best)}")
    named = broadcast_join(
        top,
        read_parquet_sized(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]),
        on="l_suppkey",
        right_on="s_suppkey",
        small_cols=("s_name",),
    )
    t = pa.concat_tables(
        [pa.table(b) for b in named.iter_batches(batch_format="pyarrow")]
    )
    return pa.table(
        {
            "s_suppkey": t["l_suppkey"].cast(pa.int64()),
            "s_name": t["s_name"],
            "total_revenue": pa.array(
                np.round(t["rev1e4"].to_numpy() / 10000.0, 6), pa.float64()
            ),
        }
    ).sort_by("s_suppkey")


def _q_small_quantity_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q17-shape small-quantity revenue: yearly revenue from
    Brand#23 lineitems whose quantity is below 20% of that part's
    average. The correlated AVG subquery becomes: broadcast the (tiny,
    one-brand) part-key set to semi-filter lineitem, fold per-part
    (sum qty, count) with the combiner, and compare on exact integers
    — ``5·q·cnt < Σq`` ⇔ ``q < 0.2·avg`` — so no float average ever
    exists to disagree with the oracle. The semi-filtered lineitem is
    materialized once and consumed by both passes."""
    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import broadcast_semi_join, combiner_groupby

    parts = read_parquet_sized(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filter=pads.field("p_brand") == "Brand#23",
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def to_int_units(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "q1e2": pa.array(
                    np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
                ),
                "p1e2": pa.array(
                    np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
                ),
            }
        )

    semij = broadcast_semi_join(
        li.map_batches(to_int_units, batch_format="pyarrow"),
        parts,
        on="l_partkey",
        right_on="p_partkey",
    ).materialize()
    stats = pa.concat_tables(
        [
            pa.table(b)
            for b in combiner_groupby(semij, ["l_partkey"], ["q1e2"]).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    pk = stats["l_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk)
    pk_sorted = pk[order]
    sum_q = stats["q1e2"].to_numpy().astype(np.int64)[order]
    cnt = stats["n_rows"].to_numpy().astype(np.int64)[order]
    ref = ray.put((pk_sorted, sum_q, cnt))

    def below_avg(b: pa.Table) -> pa.Table:
        ks, sq, ct = ray.get(ref)
        k = b["l_partkey"].to_numpy().astype(np.int64)
        idx = np.searchsorted(ks, k)
        idx = np.clip(idx, 0, max(len(ks) - 1, 0))
        q = b["q1e2"].to_numpy().astype(np.int64)
        mask = (len(ks) > 0) & (ks[idx] == k) & (5 * q * ct[idx] < sq[idx])
        return pa.table({"p1e2": b["p1e2"].filter(pa.array(mask))})

    total = semij.map_batches(below_avg, batch_format="pyarrow").sum("p1e2") or 0
    return pa.table(
        {
            "sum_p1e2": pa.array([int(total)], pa.int64()),
            "avg_yearly": pa.array([round(total / 700.0, 6)], pa.float64()),
        }
    )


def _q_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q19-shape disjunctive-predicate revenue: three OR-ed
    (brand, size-range, quantity-range) arms over lineitem ⋈ part.
    part is filtered to the three brands at the scan and broadcast
    once (`ray.put`); the disjunction is evaluated as three vectorized
    masks per batch; one int64 per block reaches the driver."""
    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import broadcast_join

    arms = [
        ("Brand#12", 1, 15, 100, 1100),
        ("Brand#23", 1, 25, 1000, 2000),
        ("Brand#3", 1, 35, 2000, 3000),
    ]
    parts = read_parquet_sized(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pads.field("p_brand").isin([a[0] for a in arms]),
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    j = broadcast_join(
        li, parts, on="l_partkey", right_on="p_partkey",
        small_cols=("p_brand", "p_size"),
    )

    def kernel(b: pa.Table) -> pa.Table:
        brand = b["p_brand"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        mask = np.zeros(len(b), bool)
        for br, s_lo, s_hi, q_lo, q_hi in arms:
            mask |= (brand == br) & (size >= s_lo) & (size <= s_hi) & (
                q >= q_lo
            ) & (q <= q_hi)
        return _li_rev1e4(b.filter(pa.array(mask)))

    total = j.map_batches(kernel, batch_format="pyarrow").sum("rev1e4") or 0
    return pa.table(
        {
            "rev1e4": pa.array([int(total)], pa.int64()),
            "revenue": pa.array([round(total / 10000.0, 6)], pa.float64()),
        }
    )


def _q_host_cap_sample(sf_dir: str) -> pa.Table:
    """Domain-diversity cap: keep at most 3 docs per source (the
    anti-domination step every web-corpus curation pipeline runs so
    one crawl-heavy host cannot dominate the training mix). Longest
    docs win, doc_id breaks ties. `grouped_topn` cuts each batch to
    its local per-key top-3 before the groupby, so the exchange
    carries ≤ 3 rows per (batch, host), never the corpus."""
    from dcs_ray.functions.relational import grouped_topn

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    top = grouped_topn(docs, key="source", order_col="n_chars", n=3, tie_col="doc_id")
    t = pa.concat_tables(
        [pa.table(b) for b in top.iter_batches(batch_format="pyarrow")]
    )
    return t.select(["doc_id", "source", "n_chars"]).sort_by("doc_id")


def _q_daily_event_anomaly(sf_dir: str) -> pa.Table:
    """Daily event-rate anomaly triage: per (event_type, day) counts
    via the map-side combiner, then a per-type z-score over days
    (population std, the group_zscore driver-fold + broadcast-probe
    path — the exchange is days×types partial rows, tiny at any
    corpus size) and a |z| > 2 flag."""
    from dcs_ray.functions.relational import combiner_groupby, group_zscore

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def to_day(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        days = (us // 86_400_000_000).astype(np.int32)
        return pa.table(
            {"event_type": b["event_type"], "day": pa.array(days, pa.date32())}
        )

    counts = combiner_groupby(
        ev.map_batches(to_day, batch_format="pyarrow"),
        ["event_type", "day"],
        [],
        count_col="n",
    )
    z = group_zscore(counts, key="event_type", col="n", id_col="day")

    def flag(b: pa.Table) -> pa.Table:
        zz = b["z"].to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": b["day"],
                "n": b["n"].cast(pa.int64()),
                "z": b["z"],
                "is_anomaly": pa.array((np.abs(zz) > 2.0).astype(np.int64)),
            }
        )

    t = pa.concat_tables(
        [
            pa.table(b)
            for b in z.map_batches(flag, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    return t.sort_by([("event_type", "ascending"), ("day", "ascending")])


def _nation_keys(sf_dir: str) -> dict[str, int]:
    """name → nationkey for the (25-row) nation dim, read once on the
    driver — the standard tiny-dim shortcut every TPC-H gate uses."""
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    return dict(
        zip(t["n_name"].to_pylist(), (int(x) for x in t["n_nationkey"].to_pylist()))
    )


def _q_volume_shipping(sf_dir: str) -> pa.Table:
    """TPC-H-Q7-shape bilateral trade volume: revenue shipped across
    two trade blocs (WEST = nationkey < 12, EAST = the rest), both
    directions, by ship year. Customer nations broadcast onto orders,
    lineitem ⋈ orders is the one hash-partitioned big⋈big hop,
    supplier nations broadcast, the cross-bloc condition is one
    vectorized mask, and the exchange after it is (2 directions ×
    years) combiner rows."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import (
        broadcast_join, combiner_groupby, shuffle_join,
    )

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    orders_c = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        small_cols=("c_nationkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
        ],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    j = shuffle_join(li, orders_c, on="l_orderkey", right_on="o_orderkey")
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    j = broadcast_join(
        j, sup, on="l_suppkey", right_on="s_suppkey", small_cols=("s_nationkey",)
    )

    def prep(b: pa.Table) -> pa.Table:
        s_west = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64) < 12
        c_west = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64) < 12
        t = b.filter(pa.array(s_west != c_west))
        year = pc.year(t["l_shipdate"]).cast(pa.int64())
        bloc = np.where(
            t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64) < 12,
            "WEST", "EAST",
        )
        return _li_rev1e4(
            t, {"supp_bloc": pa.array(bloc, pa.string()), "l_year": year}
        )

    agg = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"),
        ["supp_bloc", "l_year"],
        ["rev1e4"],
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    return pa.table(
        {
            "supp_bloc": t["supp_bloc"],
            "l_year": t["l_year"],
            "revenue": pa.array(
                np.round(t["rev1e4"].to_numpy().astype(np.int64) / 10000.0, 6),
                pa.float64(),
            ),
        }
    ).sort_by([("supp_bloc", "ascending"), ("l_year", "ascending")])


def _q_market_share(sf_dir: str) -> pa.Table:
    """TPC-H-Q8-shape market share: the NATION_1 suppliers' share of
    PROMO-part revenue sold to AMERICA-region customers, per order
    year. Region→nation→customer dims broadcast down the chain, the
    PROMO part-key set broadcast as a semi-filter on lineitem, one
    shuffle join to orders, supplier nation broadcast, then a two-sum
    combiner per year — the numerator is a vectorized where-mask, and
    the share is one float division on the |years|-sized aggregate."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from dcs_ray.functions.relational import (
        broadcast_join, broadcast_semi_join, combiner_groupby, shuffle_join,
    )

    nk1 = _nation_keys(sf_dir)["NATION_1"]
    region = read_parquet_sized(
        f"{sf_dir}/region.parquet", columns=["r_regionkey"],
        filter=pads.field("r_name") == "AMERICA",
    )
    nation = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    nation_r = broadcast_join(
        nation, region, on="n_regionkey", right_on="r_regionkey", small_cols=()
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_r = broadcast_join(
        cust, nation_r, on="c_nationkey", right_on="n_nationkey", small_cols=()
    )
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )
    orders_c = broadcast_join(
        orders, cust_r, on="o_custkey", right_on="c_custkey", small_cols=()
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.year(b["o_orderdate"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    parts = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pads.field("p_type") == "PROMO",
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li_promo = broadcast_semi_join(li, parts, on="l_partkey", right_on="p_partkey")
    j = shuffle_join(li_promo, orders_c, on="l_orderkey", right_on="o_orderkey")
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    j = broadcast_join(
        j, sup, on="l_suppkey", right_on="s_suppkey", small_cols=("s_nationkey",)
    )

    def prep(b: pa.Table) -> pa.Table:
        t = _li_rev1e4(b, {"o_year": b["o_year"]})
        rev = t["rev1e4"].to_numpy()
        s_nat = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "nat_rev1e4", pa.array(np.where(s_nat == nk1, rev, 0), pa.int64())
        )

    agg = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"),
        ["o_year"],
        ["rev1e4", "nat_rev1e4"],
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    num = t["nat_rev1e4"].to_numpy().astype(np.int64)
    den = t["rev1e4"].to_numpy().astype(np.int64)
    share = np.where(den > 0, np.round(num / np.where(den > 0, den, 1), 6), 0.0)
    return pa.table(
        {
            "o_year": t["o_year"],
            "nat_rev1e4": pa.array(num, pa.int64()),
            "total_rev1e4": pa.array(den, pa.int64()),
            "mkt_share": pa.array(share + 0.0, pa.float64()),
        }
    ).sort_by("o_year")


def _q_daily_distinct_users(sf_dir: str) -> pa.Table:
    """Exact per-day distinct actives (the DAU panel): a (day, user)
    combiner dedup — the exchange carries one row per (batch, day,
    user), never raw events — then a per-day combiner count."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def to_day(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        days = (us // 86_400_000_000).astype(np.int32)
        return pa.table(
            {"day": pa.array(days, pa.date32()), "user_id": b["user_id"]}
        )

    pairs = combiner_groupby(
        ev.map_batches(to_day, batch_format="pyarrow"), ["day", "user_id"], []
    )
    daily = combiner_groupby(pairs, ["day"], [], count_col="n_users")
    t = pa.concat_tables(
        [pa.table(b) for b in daily.iter_batches(batch_format="pyarrow")]
    )
    return t.select(["day", "n_users"]).sort_by("day")


def _q_nb_prf_metrics(sf_dir: str) -> pa.Table:
    """Per-class precision / recall / F1 for the trained NB language
    classifier — computed from the |classes|²-sized confusion fold
    (the distributed part), so this stage is driver arithmetic over an
    aggregate, exactly like the SQL oracle's arithmetic over the same
    replayed confusion CTE."""
    conf = _q_nb_confusion(sf_dir)
    true_l = np.asarray(conf["true_label"].to_pylist())
    pred_l = np.asarray(conf["pred_label"].to_pylist())
    n = conf["n_docs"].to_numpy().astype(np.int64)
    classes = sorted(set(true_l))
    rows = []
    for c in classes:
        tp = int(n[(true_l == c) & (pred_l == c)].sum())
        n_true = int(n[true_l == c].sum())
        n_pred = int(n[pred_l == c].sum())
        p = tp / n_pred if n_pred > 0 else 0.0
        r = tp / n_true if n_true > 0 else 0.0
        f1 = 2.0 * p * r / (p + r) if p + r > 0 else 0.0
        rows.append((c, tp, n_true, n_pred, round(p, 6), round(r, 6), round(f1, 6)))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "tp": pa.array([r[1] for r in rows], pa.int64()),
            "n_true": pa.array([r[2] for r in rows], pa.int64()),
            "n_pred": pa.array([r[3] for r in rows], pa.int64()),
            "prec": pa.array([r[4] + 0.0 for r in rows], pa.float64()),
            "rec": pa.array([r[5] + 0.0 for r in rows], pa.float64()),
            "f1": pa.array([r[6] + 0.0 for r in rows], pa.float64()),
        }
    )


def _q_kmv_distinct_users(sf_dir: str) -> pa.Table:
    """KMV (bottom-k) distinct-user sketch: per-batch k-smallest
    unique splitmix64 hashes, worker pre-merge, (k−1)·2⁶⁴/h₍ₖ₎
    estimator. The kth hash is emitted as two exact int32 halves so
    the driver gate hashes integers, not a lossy double."""
    from dcs_ray.functions.sketches import kmv_distinct

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    est, kept = kmv_distinct(ev, "user_id", k=8)
    kth = int(kept[-1]) if len(kept) else 0
    return pa.table(
        {
            "n_kept": pa.array([len(kept)], pa.int64()),
            "kth_hi": pa.array([kth >> 32], pa.int64()),
            "kth_lo": pa.array([kth & 0xFFFFFFFF], pa.int64()),
            "est_distinct": pa.array([round(est, 6)], pa.float64()),
        }
    )


def _q_degree_assortativity(sf_dir: str) -> pa.Table:
    """Directed out→in degree assortativity of the web link graph —
    see ``dcs_ray.functions.graph.degree_assortativity`` (combiner
    degree folds, broadcast probe, exact integer moment row per batch,
    the canonical corr float recipe)."""
    from dcs_ray.functions.graph import degree_assortativity

    n, r = degree_assortativity(_link_edges_ds(sf_dir))
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "assortativity": pa.array([r + 0.0], pa.float64()),
        }
    )

def _q_ewma_daily_events(sf_dir: str) -> pa.Table:
    """Per-type EWMA (α = 1/2) of the daily event-count series — the
    streaming decay aggregate, replayed EXACTLY: with dyadic decay the
    running numerator Σ xᵢ·2ⁱ and denominator 2^(t+1) − 1 are integers,
    so the distributed part (the (type, day) combiner count) and the
    oracle agree bit-for-bit and the only float op is one final
    division. The recursion happens on the |types×days|-sized
    aggregate, never the event stream."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def to_day(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        days = (us // 86_400_000_000).astype(np.int32)
        return pa.table(
            {"event_type": b["event_type"], "day": pa.array(days, pa.date32())}
        )

    counts = combiner_groupby(
        ev.map_batches(to_day, batch_format="pyarrow"),
        ["event_type", "day"],
        [],
        count_col="n",
    )
    t = pa.concat_tables(
        [pa.table(b) for b in counts.iter_batches(batch_format="pyarrow")]
    ).sort_by([("event_type", "ascending"), ("day", "ascending")])
    types = t["event_type"].to_pylist()
    days = t["day"].to_pylist()
    ns = t["n"].to_numpy().astype(np.int64)
    ewma, cur_type, num, rk = [], None, 0, -1
    for i in range(len(t)):
        if types[i] != cur_type:
            cur_type, num, rk = types[i], 0, -1
        rk += 1
        num += int(ns[i]) << rk
        den = (1 << (rk + 1)) - 1
        ewma.append(round(float(num) / float(den), 6))
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "day": pa.array(days, pa.date32()),
            "n": pa.array(ns, pa.int64()),
            "ewma": pa.array(ewma, pa.float64()),
        }
    )


def _q_event_interarrival(sf_dir: str) -> pa.Table:
    """Per-user inter-arrival gap stats (count / sum / max / mean
    seconds between consecutive events) — the LAG-window family.
    ``groupby(user).map_groups`` with one vectorized sort+diff per
    group, the same partitioning contract as sessionization (one
    user's events fit in a worker). Users with a single event have no
    gaps and are dropped, mirroring the oracle's WHERE gap IS NOT
    NULL."""
    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def gaps(group: pa.Table) -> pa.Table:
        ts = np.sort(group["ts"].cast(pa.int64()).to_numpy())
        if len(ts) < 2:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "sum_gap_us": pa.array([], pa.int64()),
                    "max_gap_us": pa.array([], pa.int64()),
                    "avg_gap_s": pa.array([], pa.float64()),
                }
            )
        d = np.diff(ts)
        s, n = int(d.sum()), len(d)
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "n_gaps": pa.array([n], pa.int64()),
                "sum_gap_us": pa.array([s], pa.int64()),
                "max_gap_us": pa.array([int(d.max())], pa.int64()),
                "avg_gap_s": pa.array(
                    [round(float(s) / float(n) / 1000000.0, 6)], pa.float64()
                ),
            }
        )

    out = ev.groupby("user_id").map_groups(gaps, batch_format="pyarrow")
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("user_id")


def _q_kcore(sf_dir: str, k: int = 4, rounds: int = 4) -> pa.Table:
    """k-core peeling of the undirected link graph — see
    ``dcs_ray.functions.graph.kcore`` for the distributed shape
    (alive-set broadcast per round, node-sized driver folds)."""
    from dcs_ray.functions.graph import kcore

    return kcore(_link_edges_ds(sf_dir), k=k, rounds=rounds)

def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Generated peel-round CTE chain replaying ``_q_kcore`` exactly:
    u0 = distinct undirected pairs; per round a degree CTE, an alive
    CTE (deg ≥ k), and the alive-filtered next edge set."""
    ctes = [
        "u0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM edges WHERE src <> dst)"
    ]
    for i in range(rounds + 1):
        ctes.append(
            f"d{i} AS (SELECT node, count(*)::bigint AS deg FROM "
            f"(SELECT a AS node FROM u{i} UNION ALL SELECT b AS node FROM u{i}) "
            f"GROUP BY node)"
        )
        if i < rounds:
            ctes.append(f"a{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
            ctes.append(
                f"u{i+1} AS (SELECT a, b FROM u{i} "
                f"WHERE a IN (SELECT node FROM a{i}) "
                f"AND b IN (SELECT node FROM a{i}))"
            )
    chain = ",\n".join(ctes)
    return f"""
WITH {_LINK_EDGES_CTE},
{chain}
SELECT node, deg FROM d{rounds} WHERE deg >= {k} ORDER BY node
"""


def _q_community_top_terms(sf_dir: str) -> pa.Table:
    """Composition showpiece: label-propagation communities × corpus
    terms → the top-3 most frequent terms per community (what each
    link cluster is "about"). The node→community vector is node-sized,
    broadcast once; tokenization streams per batch; the (community,
    term) exchange is combiner-folded; `grouped_topn` cuts each batch
    to its local per-community top-3 before the final groupby."""
    from dcs_ray.functions.graph import label_propagation
    from dcs_ray.functions.relational import combiner_groupby, grouped_topn
    from dcs_ray.tokenize import tokenize_batch_words

    lab = pa.concat_tables(
        pa.table(b)
        for b in label_propagation(_link_pair_edges(sf_dir), n_iter=5).iter_batches(
            batch_format="pyarrow"
        )
    )
    nodes = lab["node"].to_numpy().astype(np.int64)
    comm = lab["community"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    lab_ref = ray.put((nodes[order], comm[order]))

    def to_pairs(b: pa.Table) -> pa.Table:
        nk, cm = ray.get(lab_ref)
        postings, _ = tokenize_batch_words(
            b["text"], b["doc_id"].to_numpy().astype(np.int64)
        )
        did = postings["doc_id"].to_numpy().astype(np.int64)
        idx = np.searchsorted(nk, did)
        idx_c = np.minimum(idx, max(len(nk) - 1, 0))
        ok = (len(nk) > 0) & (nk[idx_c] == did)
        t = postings.filter(pa.array(ok))
        return pa.table(
            {
                "community": pa.array(cm[idx_c[ok]], pa.int64()),
                "term": t["term"],
                "n": t["tf"].cast(pa.int64()),
            }
        )

    agg = combiner_groupby(
        _docs(sf_dir).map_batches(to_pairs, batch_format="pyarrow"),
        ["community", "term"],
        ["n"],
    )
    top = grouped_topn(agg, key="community", order_col="n", n=3, tie_col="term")
    t = pa.concat_tables(
        [pa.table(b) for b in top.iter_batches(batch_format="pyarrow")]
    )
    return t.select(["community", "term", "n"]).sort_by(
        [("community", "ascending"), ("n", "descending"), ("term", "ascending")]
    )


def _q_mmr_diversified(sf_dir: str) -> pa.Table:
    """Search-result diversification by Maximal Marginal Relevance
    (Carbonell & Goldstein '98): BM25 top-20 candidates, then 5 greedy
    rounds of argmax over round(0.7·rel − 0.3·max-sim-to-selected, 6)
    with ties to the smallest doc_id (the repo's rounded-argmax gate
    convention). Relevance is the engine's own shard-fanned BM25;
    similarity is the hash-embedding cosine (both already gate-proven
    bit-stable). The iterative part runs on the 20-row candidate set —
    the distributed work is the fan-out and the embedding pass."""
    from dcs_ray.functions.embed import hash_embed_batch
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=20)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    rel = {
        int(i): round(float(s), 6) for i, s in zip(ids, t["score"].to_numpy())
    }
    ct = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", [int(x) for x in ids])],
    )
    et = hash_embed_batch(ct)
    pos = {int(d): i for i, d in enumerate(et["doc_id"].to_numpy())}
    vecs = np.stack(
        [np.asarray(v, np.float64) for v in et["embedding"].to_pylist()]
    )
    norms = np.sqrt((vecs * vecs).sum(axis=1))

    def sim(a: int, b: int) -> float:
        na, nb = float(norms[pos[a]]), float(norms[pos[b]])
        if na == 0.0 or nb == 0.0:
            return 0.0
        return round(float(np.dot(vecs[pos[a]], vecs[pos[b]])) / (na * nb), 6)

    selected: list[int] = []
    rows = []
    for r in range(1, 6):
        best_d, best_m = None, None
        for d in sorted(rel):
            if d in selected:
                continue
            ms = max((sim(d, s) for s in selected), default=0.0)
            m = round(0.7 * rel[d] - 0.3 * ms, 6)
            if best_m is None or m > best_m:
                best_d, best_m = d, m
        selected.append(best_d)
        rows.append((r, best_d, best_m))
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "mmr": pa.array([r[2] + 0.0 for r in rows], pa.float64()),
        }
    )


def _mmr_sql(n_cand: int = 20, k_sel: int = 5) -> str:
    """Generated greedy-round replay of ``_q_mmr_diversified``: BM25
    candidate CTE, the hash-embedding chain restricted to candidates,
    pairwise rounded cosines, then one (pool, pick, selected) CTE
    triple per round — ties to the smallest doc_id via ORDER BY."""
    rounds = []
    for i in range(1, k_sel + 1):
        rounds.append(f"""p{i} AS (
  SELECT c.doc_id,
         round(0.7 * c.rel - 0.3 * coalesce(
           (SELECT max(s.sim) FROM sims s
            JOIN sel{i - 1} sp ON s.da = c.doc_id AND s.db = sp.doc_id), 0.0), 6)
           AS m
  FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})),
pick{i} AS (SELECT doc_id, m FROM p{i} ORDER BY m DESC, doc_id ASC LIMIT 1),
sel{i} AS (SELECT * FROM sel{i - 1}
           UNION ALL SELECT doc_id, {i}::bigint, m FROM pick{i})""")
    chain = ",\n".join(rounds)
    return f"""
WITH {_BM25_SCORES},
cand AS MATERIALIZED (
  SELECT doc_id, round(score, 6) AS rel FROM scores
  ORDER BY score DESC, doc_id ASC LIMIT {n_cand}),
tok2 AS (SELECT doc_id, term FROM tok
         WHERE doc_id IN (SELECT doc_id FROM cand)),
terms AS (SELECT DISTINCT term FROM tok2),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok2 JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint
                        THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb AS (SELECT vec.doc_id, dim,
               CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double
                 AS val
        FROM vec JOIN nrm USING (doc_id)),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS nrm2 FROM emb GROUP BY 1),
sims AS MATERIALIZED (
  SELECT a.doc_id AS da, b.doc_id AS db,
         round(sum(a.val * b.val) / (na.nrm2 * nb.nrm2), 6) AS sim
  FROM emb a JOIN emb b ON a.dim = b.dim AND a.doc_id <> b.doc_id
  JOIN dn na ON na.doc_id = a.doc_id JOIN dn nb ON nb.doc_id = b.doc_id
  WHERE na.nrm2 > 0 AND nb.nrm2 > 0
  GROUP BY 1, 2, na.nrm2, nb.nrm2),
sel0 AS (SELECT NULL::bigint AS doc_id, 0::bigint AS rank, 0.0 AS m WHERE 1 = 0),
{chain}
SELECT rank, doc_id, m AS mmr FROM sel{k_sel} ORDER BY rank
"""


def _q_intra_host_link_ratio(sf_dir: str) -> pa.Table:
    """Per-host intra-site link share (navigation vs outbound links —
    the crawl-frontier prioritization signal). The doc→host vector is
    node-sized, broadcast once; edges stream through one vectorized
    probe per batch; the exchange is a |hosts|-sized combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    did = docs["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(did)
    hosts = docs["source"].combine_chunks().take(pa.array(order))
    ref = ray.put((did[order], hosts))

    def probe(b: pa.Table) -> pa.Table:
        ids, hs = ray.get(ref)
        sv = b["src"].to_numpy().astype(np.int64)
        dv = b["dst"].to_numpy().astype(np.int64)
        s = np.minimum(np.searchsorted(ids, sv), len(ids) - 1)
        d = np.minimum(np.searchsorted(ids, dv), len(ids) - 1)
        # inner-join semantics: drop edges whose endpoint has no doc row
        # (synthesized targets like doc_id+41 can point past the corpus)
        ok = (ids[s] == sv) & (ids[d] == dv)
        sh = hs.take(pa.array(s[ok]))
        dh = hs.take(pa.array(d[ok]))
        intra = (
            sh.to_numpy(zero_copy_only=False) == dh.to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"src_host": sh, "n_intra": pa.array(intra, pa.int64())})

    agg = combiner_groupby(
        _link_edges_ds(sf_dir).map_batches(probe, batch_format="pyarrow"),
        ["src_host"],
        ["n_intra"],
        count_col="n_links",
    )
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    n = t["n_links"].to_numpy().astype(np.int64)
    ni = t["n_intra"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "src_host": t["src_host"],
            "n_links": pa.array(n, pa.int64()),
            "n_intra": pa.array(ni, pa.int64()),
            "intra_ratio": pa.array(np.round(ni / n, 6) + 0.0, pa.float64()),
        }
    ).sort_by("src_host")


def _q_type_token_ratio(sf_dir: str) -> pa.Table:
    """Per-doc lexical diversity (type-token ratio) — one tokenizer
    pass, doc-local, zero exchange. Docs with no tokens emit no row
    (mirrors the tokenizing GROUP BY)."""
    from dcs_ray.tokenize import tokenize_batch_words

    def kernel(b: pa.Table) -> pa.Table:
        postings, _ = tokenize_batch_words(
            b["text"], b["doc_id"].to_numpy().astype(np.int64)
        )
        g = postings.group_by(["doc_id"]).aggregate(
            [("tf", "sum"), ("term", "count")]
        )
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = g["tf_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = g["term_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_tokens": pa.array(tot, pa.int64()),
                "n_types": pa.array(typ, pa.int64()),
                "ttr": pa.array(np.round(typ / tot, 6) + 0.0, pa.float64()),
            }
        )

    out = _docs(sf_dir).map_batches(kernel, batch_format="pyarrow")
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_event_burstiness(sf_dir: str) -> pa.Table:
    """Per-type variance-to-mean ratio (index of dispersion) of the
    daily count series — VMR ≈ 1 is Poisson-like traffic, ≫ 1 is
    bursty. Integer (Σn, Σn²) moments fold through the combiner; one
    canonical float expression at the end mirrors the oracle."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def to_day(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        days = (us // 86_400_000_000).astype(np.int32)
        return pa.table(
            {"event_type": b["event_type"], "day": pa.array(days, pa.date32())}
        )

    counts = combiner_groupby(
        ev.map_batches(to_day, batch_format="pyarrow"),
        ["event_type", "day"],
        [],
        count_col="n",
    ).map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "nn": pa.array(
                    t["n"].to_numpy().astype(np.int64) ** 2, pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    agg = combiner_groupby(counts, ["event_type"], ["n", "nn"], count_col="n_days")
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    sx = t["n"].to_numpy().astype(np.int64)
    sxx = t["nn"].to_numpy().astype(np.int64)
    d = t["n_days"].to_numpy().astype(np.int64)
    mean = sx.astype(np.float64) / d
    vmr = np.round((sxx.astype(np.float64) / d - mean * mean) / mean, 6)
    return pa.table(
        {
            "event_type": t["event_type"],
            "n_days": pa.array(d, pa.int64()),
            "sum_n": pa.array(sx, pa.int64()),
            "vmr": pa.array(vmr + 0.0, pa.float64()),
        }
    ).sort_by("event_type")


def _q_gini_hosts(sf_dir: str) -> pa.Table:
    """Gini coefficient of docs-per-host — the corpus-concentration
    health metric (is one domain dominating the training mix?). The
    per-host count is a combiner fold; the Gini rank sum runs on the
    |hosts|-sized aggregate in exact integers with ONE float division,
    ties ordered by (count, host) on both sides."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["source"])
    agg = combiner_groupby(docs, ["source"], [], count_col="x")
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    )
    x = t["x"].to_numpy().astype(np.int64)
    src = np.asarray(t["source"].to_pylist())
    order = np.lexsort((src, x))
    x = x[order]
    n, sx = len(x), int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int((i * x).sum()) - (n + 1) * sx
    gini = round(float(num) / float(n * sx), 6) if n * sx > 0 else 0.0
    return pa.table(
        {
            "n_hosts": pa.array([n], pa.int64()),
            "n_docs": pa.array([sx], pa.int64()),
            "gini": pa.array([gini + 0.0], pa.float64()),
        }
    )


def _q_length_percentile(sf_dir: str) -> pa.Table:
    """Per-doc exact percentile rank (CUME_DIST) of document length —
    the window-function CDF family, distributed as: value-count
    collapse of n_chars through the combiner (|distinct lengths|-sized
    exchange), one cumulative sum on the driver aggregate, broadcast,
    then a vectorized searchsorted probe per batch."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).materialize()
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["n_chars"], [], count_col="c").iter_batches(
            batch_format="pyarrow"
        )
    )
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    order = np.argsort(vals)
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    total = int(cum[-1]) if len(cum) else 0
    ref = ray.put((vals, cum))

    def probe(b: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        le = c[np.searchsorted(v, x, side="right") - 1]
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_chars": pa.array(x, pa.int64()),
                "pctl": pa.array(
                    np.round(le.astype(np.float64) / float(total), 6) + 0.0,
                    pa.float64(),
                ),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in docs.map_batches(probe, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("doc_id")


def _q_trimmed_mean_length(sf_dir: str) -> pa.Table:
    """Per-lang 10%-trimmed mean of doc length — the robust-statistics
    family. Positional trimming over sorted values is computable from
    the (lang, n_chars) value-count collapse alone (ties contribute
    equally, so the doc_id tiebreak cancels): the combiner exchange is
    |langs × distinct lengths|, and the trim arithmetic runs in exact
    integers on that aggregate with ONE float division per lang."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs, ["lang", "n_chars"], [], count_col="c"
        ).iter_batches(batch_format="pyarrow")
    )
    langs = np.asarray(vc["lang"].to_pylist())
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    rows = []
    for lang in sorted(set(langs)):
        m = langs == lang
        v, c = vals[m], cnt[m]
        order = np.argsort(v)
        v, c = v[order], c[order]
        n = int(c.sum())
        k = n // 10
        # drop k values off each end of the sorted multiset, exactly
        cum = np.cumsum(c)
        lo_keep = np.maximum(np.minimum(cum, n - k) - np.maximum(cum - c, k), 0)
        s = int((v * lo_keep).sum())
        kept = n - 2 * k
        rows.append((lang, n, k, round(float(s) / float(kept), 6)))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_trimmed_each": pa.array([r[2] for r in rows], pa.int64()),
            "trimmed_mean": pa.array([r[3] + 0.0 for r in rows], pa.float64()),
        }
    )


def _q_weekly_active_users(sf_dir: str) -> pa.Table:
    """Rolling 7-day WAU and DAU/WAU stickiness per observed day — the
    sliding-window distinct family. Distributed shape: (day, user)
    combiner dedup (the exchange is active-pairs, never raw events),
    a ×7 window expansion filtered to the observed-day set (broadcast,
    |days|-sized), a second combiner dedup, and per-day counts. The
    left edge keeps its partial window, mirroring the oracle's BETWEEN
    join against observed days."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def to_day(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        days = (us // 86_400_000_000).astype(np.int64)
        return pa.table(
            {"day": pa.array(days, pa.int64()), "user_id": b["user_id"]}
        )

    pairs = combiner_groupby(
        ev.map_batches(to_day, batch_format="pyarrow"), ["day", "user_id"], []
    ).map_batches(
        lambda t: t.select(["day", "user_id"]), batch_format="pyarrow"
    ).materialize()
    dau_t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(pairs, ["day"], [], count_col="dau").iter_batches(
            batch_format="pyarrow"
        )
    )
    observed = np.sort(dau_t["day"].to_numpy().astype(np.int64))
    obs_ref = ray.put(observed)

    def expand(b: pa.Table) -> pa.Table:
        obs = ray.get(obs_ref)
        d = b["day"].to_numpy().astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wd = (d[:, None] + np.arange(7)[None, :]).ravel()
        wu = np.repeat(u, 7)
        idx = np.minimum(np.searchsorted(obs, wd), len(obs) - 1)
        ok = obs[idx] == wd
        return pa.table(
            {
                "day": pa.array(wd[ok], pa.int64()),
                "user_id": pa.array(wu[ok], pa.int64()),
            }
        )

    wpairs = combiner_groupby(
        pairs.map_batches(expand, batch_format="pyarrow"), ["day", "user_id"], []
    )
    wau_t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(wpairs, ["day"], [], count_col="wau").iter_batches(
            batch_format="pyarrow"
        )
    )
    dau_map = dict(
        zip(
            dau_t["day"].to_numpy().astype(np.int64).tolist(),
            dau_t["dau"].to_numpy().astype(np.int64).tolist(),
        )
    )
    wau_map = dict(
        zip(
            wau_t["day"].to_numpy().astype(np.int64).tolist(),
            wau_t["wau"].to_numpy().astype(np.int64).tolist(),
        )
    )
    days = sorted(dau_map)
    dau = np.array([dau_map[d] for d in days], np.int64)
    wau = np.array([wau_map[d] for d in days], np.int64)
    return pa.table(
        {
            "day": pa.array(np.array(days, np.int32), pa.date32()),
            "dau": pa.array(dau, pa.int64()),
            "wau": pa.array(wau, pa.int64()),
            "stickiness": pa.array(
                np.round(dau / wau, 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_product_profit(sf_dir: str) -> pa.Table:
    """TPC-H-Q9-shape product-type profit (adapted: the testdata has no
    partsupp, so profit = discounted revenue): lineitems restricted to
    parts whose name contains 'red' via a part-side key-set semi-join
    (broadcast once, probed with searchsorted — the part table never
    shuffles), supplier nation broadcast, grouped nation × ship year
    on exact integer 1e-4 revenue units. The only post-scan exchange
    is the (nation × year) combiner rows."""
    import pyarrow.compute as pc

    from dcs_ray.functions.relational import (
        broadcast_join,
        broadcast_semi_join,
        combiner_groupby,
    )

    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    red = part.map_batches(
        lambda t: t.filter(pc.match_substring(t["p_name"], "red")),
        batch_format="pyarrow",
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    li = broadcast_semi_join(li, red, on="l_partkey", right_on="p_partkey")
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    li = broadcast_join(
        li, sup, on="l_suppkey", right_on="s_suppkey", small_cols=("s_nationkey",)
    )
    nat = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    li = broadcast_join(
        li, nat, on="s_nationkey", right_on="n_nationkey", small_cols=("n_name",)
    )

    def prep(b: pa.Table) -> pa.Table:
        year = pc.year(b["l_shipdate"]).cast(pa.int64())
        return _li_rev1e4(b, {"nation": b["n_name"], "o_year": year})

    agg = combiner_groupby(
        li.map_batches(prep, batch_format="pyarrow"), ["nation", "o_year"], ["rev1e4"]
    )
    t = pa.concat_tables(
        pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")
    ).sort_by([("nation", "ascending"), ("o_year", "descending")])
    return pa.table(
        {
            "nation": t["nation"],
            "o_year": t["o_year"],
            "sum_profit": pa.array(
                np.round(t["rev1e4"].to_numpy().astype(np.int64) / 10000.0, 6),
                pa.float64(),
            ),
        }
    )


def _q_zipf_slope(sf_dir: str) -> pa.Table:
    """Zipf rank-frequency fit over the corpus: OLS slope/intercept of
    ln(count) on ln(rank) for the top-500 terms (rank ties broken by
    term). Distributed shape: per-batch partial term counts → one
    vocabulary-keyed combiner merge → per-block local top-500 so the
    driver merges ≤500 rows per block, never the vocabulary."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat

    K = 500
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(b: pa.Table) -> pa.Table:
        flat, _ = word_tokens_flat(b["text"])
        g = pa.table({"term": flat}).group_by(["term"]).aggregate([("term", "count")])
        return pa.table({"term": g["term"], "c": g["term_count"].cast(pa.int64())})

    counts = combiner_groupby(
        docs.map_batches(partial_counts, batch_format="pyarrow"), ["term"], ["c"]
    )
    order = [("c", "descending"), ("term", "ascending")]
    parts = [
        pa.table(b)
        for b in counts.map_batches(
            lambda t: t.select(["term", "c"]).sort_by(order).slice(0, K),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ]
    top = pa.concat_tables(parts).sort_by(order).slice(0, K)
    c = top["c"].to_numpy().astype(np.int64)
    n = len(c)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(c.astype(np.float64))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            "n_terms": pa.array([n], pa.int64()),
            "slope": pa.array([round(slope, 6) + 0.0], pa.float64()),
            "intercept": pa.array([round(intercept, 6) + 0.0], pa.float64()),
        }
    )


def _q_anova_length_by_lang(sf_dir: str) -> pa.Table:
    """One-way ANOVA of document length across languages: F-statistic
    and effect size (eta²) from exact integer (n, Σx, Σx²) per-lang
    partials — the whole corpus collapses to one combiner row per
    language, floats only in the final driver-side formula (mirrored
    verbatim in the oracle)."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def prep(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "lang": b["lang"],
                "s": pa.array(x, pa.int64()),
                "ss": pa.array(x * x, pa.int64()),
            }
        )

    agg = combiner_groupby(
        docs.map_batches(prep, batch_format="pyarrow"), ["lang"], ["s", "ss"],
        count_col="n",
    )
    g = pa.concat_tables(
        pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")
    ).sort_by([("lang", "ascending")])
    n_g = g["n"].to_numpy().astype(np.int64)
    s_g = g["s"].to_numpy().astype(np.int64)
    ss_g = g["ss"].to_numpy().astype(np.int64)
    k = len(n_g)
    N = int(n_g.sum())
    S = float(s_g.sum())
    SS = float(ss_g.sum())
    ss_total = SS - S * S / N
    ss_within = float(
        np.sum(ss_g.astype(np.float64) - s_g.astype(np.float64) * s_g / n_g)
    )
    ss_between = ss_total - ss_within
    f_stat = (ss_between / (k - 1)) / (ss_within / (N - k))
    return pa.table(
        {
            "k_groups": pa.array([k], pa.int64()),
            "n_rows": pa.array([N], pa.int64()),
            "f_stat": pa.array([round(f_stat, 6) + 0.0], pa.float64()),
            "eta_sq": pa.array([round(ss_between / ss_total, 6) + 0.0], pa.float64()),
        }
    )


def _q_event_trigrams(sf_dir: str) -> pa.Table:
    """Sequential-pattern mining: top-20 trigrams of CONSECUTIVE event
    types within each user's (ts, event_id) timeline — the order-3
    generalization of the Markov transition matrix. User-bucketed
    lexsort + shifted masks inside each bucket; the exchange is
    |type-trigram| partial counts, never the event stream."""
    from dcs_ray.functions.windows import event_ngrams

    ds = event_ngrams(
        read_parquet_sized(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        ),
        n=3,
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by(
        [
            ("cnt", "descending"),
            ("e1", "ascending"),
            ("e2", "ascending"),
            ("e3", "ascending"),
        ]
    ).slice(0, 20)


def _q_winnow_fingerprints(sf_dir: str) -> pa.Table:
    """MOSS-style winnowing fingerprints (Schleimer et al. '03) per doc
    — the robust plagiarism/near-dup sketch: min rolling-FNV hash of
    every window of 4 consecutive token 3-grams, reported as one exact
    row per doc (distinct-fingerprint count + order-free XOR). Pure
    per-batch numpy; a doc's fingerprints never leave its batch."""
    from dcs_ray.functions.textstats import winnow_fingerprints

    ds = winnow_fingerprints(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        k=3,
        w=4,
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("doc_id", "ascending")])


def _q_adamic_adar(sf_dir: str) -> pa.Table:
    """Adamic–Adar link-prediction score over the extracted web graph:
    top-20 co-cited page pairs by Σ 1/ln(outdeg) over shared sources —
    co-citation that down-weights hub sources. Source-bucketed distinct
    pair generation with the degree weight derived in-bucket (zero
    extra exchange); ranked on ROUND(score, 6) with (id_a, id_b) ties
    per the deterministic-gate convention."""
    from dcs_ray.functions.links import adamic_adar_topk

    return adamic_adar_topk(_link_edges_ds(sf_dir), k=20)


def _q_tfidf_cosine(sf_dir: str) -> pa.Table:
    """SMART lnc.ltc tf-idf cosine retrieval for ['join','merge',
    'spark'], top-10 by (round(score, 6) desc, doc_id) — the classic
    vector-space ranking next to BM25. Pass 1 streams vocabulary-free
    (query-term df + doc count) partials; pass 2 scores each batch
    fully vectorized (a doc's norm needs only its own batch) and emits
    local top-10, so the driver merges |blocks|·10 rows."""
    import pyarrow.compute as pc

    from dcs_ray.tokenize import word_tokens_flat

    terms = ["join", "merge", "spark"]
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    n_docs = docs.count()

    def df_partial(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        hit = (
            pc.index_in(flat, pa.array(terms))
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dfs = np.zeros(len(terms), np.int64)
        for ti in range(len(terms)):
            dfs[ti] = len(np.unique(parents[hit == ti]))
        return pa.table(
            {"ti": pa.array(np.arange(len(terms)), pa.int64()),
             "df": pa.array(dfs, pa.int64())}
        )

    df = np.zeros(len(terms), np.int64)
    for b in docs.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        df[t["ti"].to_numpy()] += t["df"].to_numpy()
    idf = np.log(float(n_docs) / df.astype(np.float64))
    norm_q = float(np.sqrt(np.sum(idf * idf)))
    idf_ref = ray.put(idf)

    def score_batch(b: pa.Table) -> pa.Table:
        qidf = ray.get(idf_ref)
        flat, parents = word_tokens_flat(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        nb = len(b)
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        codes = pc.dictionary_encode(flat)
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(codes.dictionary)
        key = parents.astype(np.int64) * v + ci
        uk, cnt = np.unique(key, return_counts=True)
        w = 1.0 + np.log(cnt.astype(np.float64))
        doc_of = (uk // v).astype(np.int64)
        norm2 = np.zeros(nb, np.float64)
        np.add.at(norm2, doc_of, w * w)
        qcode = (
            pc.index_in(pa.array(terms), codes.dictionary)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        num = np.zeros(nb, np.float64)
        for ti in range(len(terms)):
            if qcode[ti] < 0:
                continue
            sel = (uk % v) == int(qcode[ti])
            np.add.at(num, doc_of[sel], w[sel] * qidf[ti])
        hasq = num > 0
        score = num[hasq] / (np.sqrt(norm2[hasq]) * norm_q)
        out = pa.table(
            {
                "doc_id": pa.array(ids[hasq], pa.int64()),
                "score": pa.array(np.round(score, 6) + 0.0, pa.float64()),
            }
        )
        return out.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        ).slice(0, 10)

    parts = [
        pa.table(b)
        for b in docs.map_batches(score_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    return merged.sort_by(
        [("score", "descending"), ("doc_id", "ascending")]
    ).slice(0, 10)


def _q_qld_topk(sf_dir: str) -> pa.Table:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    '01) over the INVERTED INDEX — the language-model ranking family
    next to BM25, same query×shard fan-out, plus one vocab-thin
    collection-frequency pass (``search.collection_cf``)."""
    from dcs_ray.search import search_lm

    idx = _index_dir(sf_dir, "words")
    t = search_lm(idx, [BM25_QUERY], k=10, model="qld", mu=300.0)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()),
        }
    )


def _q_pl2_topk(sf_dir: str) -> pa.Table:
    """DFR PL2 retrieval (Amati & van Rijsbergen '02) over the inverted
    index — the divergence-from-randomness ranking family, c=1."""
    from dcs_ray.search import search_lm

    idx = _index_dir(sf_dir, "words")
    t = search_lm(idx, [BM25_QUERY], k=10, model="pl2", c=1.0)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()),
        }
    )


def _q_collocations_llr(sf_dir: str) -> pa.Table:
    """Top-20 collocations by Dunning's G² over consecutive word
    bigrams (min count 5) — the surprise-statistic upgrade of raw
    bigram counts / PMI. Bigram-keyed combiner + broadcast marginals +
    per-block local top-k (see ``functions/collocations.py``)."""
    from dcs_ray.functions.collocations import bigram_llr_topk

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_llr_topk(docs, k=20, min_count=5)


def _q_containment_pairs(sf_dir: str) -> pa.Table:
    """Near-dup pairs by max-containment |A∩B|/min(|A|,|B|) ≥ 0.6 over
    word 3-gram shingle sets (Broder '97's asymmetric measure — catches
    a page embedded inside a larger one that Jaccard dilutes). Same
    inverted shingle join as ``ngram_jaccard_pairs``."""
    from dcs_ray.functions.dedup import ngram_jaccard_pairs

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ds = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.6, metric="containment")
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "id_a": t["id_a"],
            "id_b": t["id_b"],
            "containment": pa.array(
                np.round(t["containment"].to_numpy(), 6) + 0.0, pa.float64()
            ),
        }
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _q_lang_kl_matrix(sf_dir: str) -> pa.Table:
    """Pairwise KL divergence between per-language unigram LMs
    (add-one smoothing over the global vocab) — the distribution-drift
    monitor between corpus slices. Vocab-sized combiner fold, dense
    driver formula (see ``functions/stylometry.py``)."""
    from dcs_ray.functions.stylometry import lang_kl_matrix

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return lang_kl_matrix(docs)


def _q_burrows_delta(sf_dir: str) -> pa.Table:
    """Burrows' Delta stylometric distance between every source pair
    over the top-50 corpus words (z-scored relative frequencies,
    population σ) — the classic register/authorship distance."""
    from dcs_ray.functions.stylometry import burrows_delta

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return burrows_delta(docs, top_terms=50)


def _q_benford_first_digit(sf_dir: str) -> pa.Table:
    """Benford's-law first-digit profile of order totals — the
    fraud/synthetic-data screen over a monetary column. Values pin to
    exact cents (floor(x*100+0.5)) and the digit comes off the decimal
    string, so the 9-row profile hash-matches the SQL replay; the
    exchange is one 9-row combiner fold."""
    from dcs_ray.functions.stats import first_digit_counts

    return first_digit_counts(
        read_parquet_sized(f"{sf_dir}/orders.parquet", columns=["o_totalprice"]),
        "o_totalprice",
    )


def _q_cusum_daily_events(sf_dir: str) -> pa.Table:
    """CUSUM change-point series over daily event volume: per-day
    counts via the map-side combiner (exchange = |days|), then the
    cumulative deviation from the global mean per day — the classic
    level-shift detector for ingest monitoring. One float subtraction
    chain on the tiny day series, rounded to 6."""
    counts = _daily_event_counts(sf_dir)
    day = counts["day"].to_numpy().astype(np.int64)
    n = counts["n"].to_numpy().astype(np.int64)
    mu = float(n.sum()) / float(len(n)) if len(n) else 0.0
    cusum = np.round(np.cumsum(n.astype(np.float64) - mu), 6) + 0.0
    return pa.table(
        {
            "day": pa.array(day, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "cusum": pa.array(cusum, pa.float64()),
        }
    )


def _q_spearman_chars_tokens(sf_dir: str) -> pa.Table:
    """Spearman rank correlation (tie-corrected midranks) between doc
    length in chars and its word-token count — the monotone-association
    check behind length-based quality heuristics. Midrank tables come
    from two distinct-value combiner folds; the moment partials are
    exact integers (see ``functions/stats.spearman_rho``)."""
    from dcs_ray.functions.stats import spearman_rho
    from dcs_ray.functions.textstats import token_count_batch

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def with_tokens(b: pa.Table) -> pa.Table:
        tc = token_count_batch(b)
        return pa.table(
            {"n_chars": b["n_chars"].cast(pa.int64()), "n_tokens": tc["n_tokens"]}
        )

    rho, n = spearman_rho(
        docs.map_batches(with_tokens, batch_format="pyarrow"), "n_chars", "n_tokens"
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "spearman_rho": pa.array([rho], pa.float64()),
        }
    )


def _q_ks_length_by_lang(sf_dir: str) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov statistic between the doc-length
    distributions of the two largest languages (count desc, lang asc
    tiebreak) — the distribution-drift gate between corpus slices.
    Group selection is a |langs|-row fold; the CDF gap runs on the
    (lang, n_chars) value-count collapse."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.stats import ks_two_sample

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    lc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.select_columns(["lang"]), ["lang"], [], count_col="n"
        ).iter_batches(batch_format="pyarrow")
    )
    ranked = sorted(
        zip(lc["lang"].to_pylist(), lc["n"].to_pylist()), key=lambda x: (-x[1], x[0])
    )
    (la, _), (lb, _) = ranked[0], ranked[1]
    ks, na, nb = ks_two_sample(docs, "lang", "n_chars", la, lb)
    return pa.table(
        {
            "lang_a": pa.array([la], pa.string()),
            "lang_b": pa.array([lb], pa.string()),
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "ks_stat": pa.array([ks], pa.float64()),
        }
    )


def _q_markov_stationary(sf_dir: str) -> pa.Table:
    """Stationary event-type distribution: 5 power-iteration steps of
    v·P from uniform, renormalizing each step (dangling rows shed mass
    to the renormalizer) — the long-run behavior profile on top of the
    distributed transition-count fold. The matrix is |types|², driver
    tiny at any scale."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.stats import markov_stationary
    from dcs_ray.functions.windows import event_transitions

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    trans = pa.concat_tables(
        pa.table(b)
        for b in event_transitions(ev).iter_batches(batch_format="pyarrow")
    )
    types_t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.select_columns(["event_type"]), ["event_type"], [], count_col="c"
        ).iter_batches(batch_format="pyarrow")
    )
    return markov_stationary(
        trans, types_t["event_type"].to_pylist(), iters=5
    ).sort_by("event_type")


def _q_session_type_pairs(sf_dir: str) -> pa.Table:
    """Session-level event-type co-occurrence (market-basket pairs):
    sessions split at 30-min gaps, each unordered distinct-type pair
    counted once per session containing both. Bucketed lexsort +
    vectorized segment-combination expansion; exchange = |type pairs|
    (see ``functions/windows.session_type_pairs``)."""
    from dcs_ray.functions.windows import session_type_pairs

    ds = session_type_pairs(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("type_a", "ascending"), ("type_b", "ascending")])


def _q_hapax_ratio_by_lang(sf_dir: str) -> pa.Table:
    """Per-language hapax-legomenon ratio (share of the lang's vocab
    occurring exactly once) — the lexical-richness / OCR-noise signal.
    One flat-token pass, a vocab-sized (lang, term) combiner fold, then
    a |langs|-row second fold; ratio is one float division per lang."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def lang_terms(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        lang = b["lang"].combine_chunks().take(pa.array(parents, pa.int64()))
        return pa.table({"lang": lang, "term": flat})

    counts = combiner_groupby(
        docs.map_batches(lang_terms, batch_format="pyarrow"),
        ["lang", "term"],
        [],
        count_col="n",
    )

    def vocab_partial(b: pa.Table) -> pa.Table:
        one = (b["n"].to_numpy() == 1).astype(np.int64)
        return pa.table(
            {
                "lang": b["lang"],
                "v": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "h": pa.array(one, pa.int64()),
            }
        )

    agg = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            counts.map_batches(vocab_partial, batch_format="pyarrow"),
            ["lang"],
            ["v", "h"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("lang")
    v = agg["v"].to_numpy().astype(np.int64)
    h = agg["h"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "lang": agg["lang"],
            "vocab": pa.array(v, pa.int64()),
            "hapax": pa.array(h, pa.int64()),
            "hapax_ratio": pa.array(
                np.round(h.astype(np.float64) / v.astype(np.float64), 6) + 0.0,
                pa.float64(),
            ),
        }
    )


class _QualityWithLabel:
    """Actor-pool eval stage: quality-classifier probability plus the
    binary relevance label (lang == 'en') in one pass — weights load
    once per actor (`textstats.QualityClassifier`)."""

    def __init__(self) -> None:
        from dcs_ray.functions.textstats import QualityClassifier

        self.qc = QualityClassifier()

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = self.qc(b)
        y = pc.cast(pc.equal(b["lang"], "en"), pa.int64())
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "quality_prob": out["quality_prob"],
                "y": y,
            }
        )


def _q_roc_auc_quality(sf_dir: str) -> pa.Table:
    """ROC AUC of the quality classifier against the lang=='en' label
    via the tie-corrected Mann–Whitney rank-sum identity. Scores pin to
    integer micro-units (they are already rounded to 6), the (score, y)
    combiner fold is the exchange, and the midrank sum stays in exact
    Python ints — one float division at the end."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.stats import _midrank2_lookup

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_p6(b: pa.Table) -> pa.Table:
        p6 = np.floor(b["quality_prob"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table({"p6": pa.array(p6, pa.int64()), "y": b["y"]})

    scored = docs.map_batches(_QualityWithLabel, concurrency=2, batch_format="pyarrow")
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            scored.map_batches(to_p6, batch_format="pyarrow"), ["p6", "y"], [], "c"
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("p6", "ascending"), ("y", "ascending")])
    p6 = vc["p6"].to_numpy().astype(np.int64)
    y = vc["y"].to_numpy().astype(np.int64)
    c = vc["c"].to_numpy().astype(np.int64)
    uniq = np.unique(p6)
    tot = np.zeros(len(uniq), np.int64)
    pos = np.zeros(len(uniq), np.int64)
    at = np.searchsorted(uniq, p6)
    np.add.at(tot, at, c)
    np.add.at(pos, at[y == 1], c[y == 1])
    mid2 = _midrank2_lookup(uniq, tot)
    n1 = int(pos.sum())
    n0 = int(tot.sum()) - n1
    s2 = int((pos * mid2).sum())  # 2× the positives' midrank sum
    auc = float(s2 - n1 * (n1 + 1)) / float(2 * n1 * n0)
    return pa.table(
        {
            "n_pos": pa.array([n1], pa.int64()),
            "n_neg": pa.array([n0], pa.int64()),
            "auc": pa.array([round(auc, 6) + 0.0], pa.float64()),
        }
    )


def _q_log_loss_quality(sf_dir: str) -> pa.Table:
    """Per-document cross-entropy of the quality classifier against the
    lang=='en' label (probabilities clipped to [1e-6, 1-1e-6]) — the
    calibration-eval pass. Pure per-row kernel; no accumulation, so the
    rounded values hash exactly against the SQL replay."""
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    scored = docs.map_batches(_QualityWithLabel, concurrency=2, batch_format="pyarrow")

    def loss(b: pa.Table) -> pa.Table:
        p = np.clip(b["quality_prob"].to_numpy(), 1e-6, 1.0 - 1e-6)
        y = b["y"].to_numpy().astype(np.float64)
        ll = np.round(-(y * np.log(p) + (1.0 - y) * np.log1p(-p)), 6) + 0.0
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "label": b["y"],
                "loss": pa.array(ll, pa.float64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in scored.map_batches(loss, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("doc_id")


def _q_host_split(sf_dir: str) -> pa.Table:
    """Host-grouped train/val/test split (80/10/10): every doc of a
    host lands in the same split — the leakage-safe split discipline
    for web corpora (near-dups cluster within hosts). The split key is
    the shared string hash (`sketches._hash64_column`) against exact
    integer thresholds, so assignment is reproducible on any cluster
    layout and replayable in integer SQL."""
    from dcs_ray.functions.sketches import _hash64_column

    t1 = np.uint64((1 << 64) * 8 // 10)
    t2 = np.uint64((1 << 64) * 9 // 10)

    def assign(b: pa.Table) -> pa.Table:
        h = _hash64_column(b["source"])
        split = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "source": b["source"],
                "split": pa.array(split, pa.string()),
            }
        )

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in docs.map_batches(assign, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("doc_id")


def _daily_event_counts(sf_dir: str) -> pa.Table:
    """Shared (day, n) fold for the trend suite — exchange = |days|."""
    from dcs_ray.functions.stats import daily_counts

    return daily_counts(
        read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"]), "ts"
    )


def _q_theil_sen_daily_trend(sf_dir: str) -> pa.Table:
    """Theil–Sen robust trend of daily event volume: the median of all
    pairwise (Δcount/Δday) slopes over the distributed daily fold. The
    pair expansion is |days|² on the driver (bounded: a decade < 4k
    points), and the even-n median is the explicit two-middle mean the
    SQL replay mirrors row-for-row."""
    from dcs_ray.functions.stats import theil_sen_slope

    c = _daily_event_counts(sf_dir)
    slope, n_pairs = theil_sen_slope(
        c["day"].to_numpy().astype(np.int64), c["n"].to_numpy().astype(np.int64)
    )
    return pa.table(
        {
            "n_days": pa.array([len(c)], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
        }
    )


def _q_mann_kendall_daily_trend(sf_dir: str) -> pa.Table:
    """Mann–Kendall monotone-trend test on daily event volume:
    S = Σ sign(n_j − n_i) over day-ordered pairs and Kendall's tau-a
    = S / C(n,2) — exact integers until the one final division, so the
    statistic hash-matches the SQL sign-sum replay."""
    from dcs_ray.functions.stats import mann_kendall

    c = _daily_event_counts(sf_dir)
    s, n_pairs, tau = mann_kendall(c["n"].to_numpy().astype(np.int64))
    return pa.table(
        {
            "n_days": pa.array([len(c)], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "tau": pa.array([tau], pa.float64()),
        }
    )


def _q_acf_daily_events(sf_dir: str) -> pa.Table:
    """Autocorrelation of daily event volume at lags 1..7 — the
    weekly-seasonality detector. The biased estimator is expanded to
    exact integer moments (see ``functions/stats.acf``) so the hugeint
    SQL replay divides the identical numerator/denominator pair."""
    from dcs_ray.functions.stats import acf

    c = _daily_event_counts(sf_dir)
    lags, r = acf(c["n"].to_numpy().astype(np.int64), max_lag=7)
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "acf": pa.array(r, pa.float64()),
        }
    )


def _q_dow_profile_events(sf_dir: str) -> pa.Table:
    """Day-of-week activity profile: event share per ISO weekday
    (0=Monday; epoch day 0 = Thursday → dow = (day+3) mod 7), the
    seasonality fingerprint behind crawl scheduling. One 7-row
    combiner fold; the share is a single rounded division."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def to_dow(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        dow = ((us // 86_400_000_000) + 3) % 7
        return pa.table({"dow": pa.array(dow.astype(np.int64), pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(to_dow, batch_format="pyarrow"), ["dow"], [], count_col="n"
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("dow")
    n = g["n"].to_numpy().astype(np.int64)
    tot = float(n.sum())
    return pa.table(
        {
            "dow": g["dow"].cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "share": pa.array(
                np.round(n.astype(np.float64) / tot, 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_mad_daily_events(sf_dir: str) -> pa.Table:
    """Median absolute deviation of daily event volume — the robust
    dispersion gauge for ingest monitoring. Both medians use the
    two-middle-mean (quantile_cont) semantics the SQL replay spells
    out with explicit row_number picks (`functions/stats.weighted_median`)."""
    from dcs_ray.functions.stats import weighted_median

    c = _daily_event_counts(sf_dir)
    n = np.sort(c["n"].to_numpy().astype(np.int64)).astype(np.float64)
    ones = np.ones(len(n), np.int64)
    med = weighted_median(n, ones)
    dev = np.sort(np.abs(n - med))
    mad = weighted_median(dev, ones)
    return pa.table(
        {
            "n_days": pa.array([len(n)], pa.int64()),
            "median_n": pa.array([round(med, 6) + 0.0], pa.float64()),
            "mad": pa.array([round(mad, 6) + 0.0], pa.float64()),
        }
    )


_US_PER_DAY = 86_400_000_000


def _q_shipping_delay_by_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q12-shape late-shipment audit (adapted to this schema's
    columns): lineitem ⋈ orders via a broadcast of the order-date
    column, ship delay in whole days as exact integer µs arithmetic,
    then per-priority line counts and the >60-day late share — one
    |priorities|-row combiner fold."""
    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    j = broadcast_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        small_cols=("o_orderdate", "o_orderpriority"),
    )

    def prep(b: pa.Table) -> pa.Table:
        d = (
            b["l_shipdate"].cast(pa.int64()).to_numpy()
            - b["o_orderdate"].cast(pa.int64()).to_numpy()
        ) // _US_PER_DAY
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "late": pa.array((d > 60).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            j.map_batches(prep, batch_format="pyarrow"),
            ["o_orderpriority"], ["late"], count_col="n_lines",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("o_orderpriority")
    n = g["n_lines"].to_numpy().astype(np.int64)
    late = g["late"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "o_orderpriority": g["o_orderpriority"],
            "n_lines": pa.array(n, pa.int64()),
            "n_late": pa.array(late, pa.int64()),
            "late_share": pa.array(
                np.round(late.astype(np.float64) / n.astype(np.float64), 6) + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_suppliers_kept_waiting(sf_dir: str) -> pa.Table:
    """TPC-H-Q21-shape sole-late-supplier ranking (adapted: 'late' =
    shipped >90 days after the order date): per (order, supplier) the
    late flag collapses through the combiner, a groupby(order)
    map_groups keeps the unique late supplier of multi-supplier orders
    (the dual semi/anti-join of Q21 without any driver state), then a
    per-supplier count joins names via broadcast. Top 20 by waits desc,
    name asc."""
    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    j = broadcast_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        small_cols=("o_orderdate",),
    )

    def prep(b: pa.Table) -> pa.Table:
        d = (
            b["l_shipdate"].cast(pa.int64()).to_numpy()
            - b["o_orderdate"].cast(pa.int64()).to_numpy()
        ) // _US_PER_DAY
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"].cast(pa.int64()),
                "l_suppkey": b["l_suppkey"].cast(pa.int64()),
                "late": pa.array((d > 90).astype(np.int64), pa.int64()),
            }
        )

    pairs = combiner_groupby(
        j.map_batches(prep, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"], ["late"], count_col="n",
    )

    def per_order(g: pa.Table) -> pa.Table:
        late = g["late"].to_numpy().astype(np.int64) > 0
        if len(g) > 1 and int(late.sum()) == 1:
            skey = g["l_suppkey"].to_numpy().astype(np.int64)[late]
            return pa.table({"l_suppkey": pa.array(skey, pa.int64())})
        return pa.table({"l_suppkey": pa.array([], pa.int64())})

    waits = pairs.groupby("l_orderkey").map_groups(
        per_order, batch_format="pyarrow"
    )
    cnt = combiner_groupby(waits, ["l_suppkey"], [], count_col="numwait")
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    named = broadcast_join(
        cnt, sup, on="l_suppkey", right_on="s_suppkey", small_cols=("s_name",)
    )
    t = pa.concat_tables(
        pa.table(b) for b in named.iter_batches(batch_format="pyarrow")
    ).sort_by([("numwait", "descending"), ("s_name", "ascending")])
    t = t.slice(0, 20)
    return pa.table(
        {
            "s_suppkey": t["l_suppkey"].cast(pa.int64()),
            "s_name": t["s_name"],
            "numwait": t["numwait"].cast(pa.int64()),
        }
    )


def _q_calibration_quality(sf_dir: str) -> pa.Table:
    """Reliability diagram of the quality classifier vs the lang=='en'
    label: probabilities pin to integer micro-units, bin = decile of
    p (clamped to 9), and each bin's mean predicted p / observed
    positive rate come from exact integer sums — one ≤10-row combiner
    fold, both divisions at the very end."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    scored = docs.map_batches(_QualityWithLabel, concurrency=2, batch_format="pyarrow")

    def to_bin(b: pa.Table) -> pa.Table:
        p6 = np.floor(b["quality_prob"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.minimum(p6 // 100_000, 9), pa.int64()),
                "p6": pa.array(p6, pa.int64()),
                "y": b["y"],
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            scored.map_batches(to_bin, batch_format="pyarrow"),
            ["bin"], ["p6", "y"], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("bin")
    n = g["n"].to_numpy().astype(np.int64)
    sp6 = g["p6"].to_numpy().astype(np.int64)
    npos = g["y"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "bin": g["bin"].cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_pos": pa.array(npos, pa.int64()),
            "mean_p": pa.array(
                np.round(sp6.astype(np.float64) / (n * 1_000_000).astype(np.float64), 6)
                + 0.0,
                pa.float64(),
            ),
            "frac_pos": pa.array(
                np.round(npos.astype(np.float64) / n.astype(np.float64), 6) + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_pr_threshold_quality(sf_dir: str) -> pa.Table:
    """Precision/recall/F1 of the quality classifier at thresholds
    0.1..0.9: the (p-micro-unit, label) value-count fold is the only
    exchange; tp/fp/fn per threshold are exact integer cumulations and
    every metric is a single tp-integer division (F1 = 2tp/(2tp+fp+fn)
    — never composed from rounded P and R)."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    scored = docs.map_batches(_QualityWithLabel, concurrency=2, batch_format="pyarrow")

    def to_p6(b: pa.Table) -> pa.Table:
        p6 = np.floor(b["quality_prob"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table({"p6": pa.array(p6, pa.int64()), "y": b["y"]})

    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            scored.map_batches(to_p6, batch_format="pyarrow"), ["p6", "y"], [], "c"
        ).iter_batches(batch_format="pyarrow")
    )
    p6 = vc["p6"].to_numpy().astype(np.int64)
    y = vc["y"].to_numpy().astype(np.int64)
    c = vc["c"].to_numpy().astype(np.int64)
    total_pos = int(c[y == 1].sum())
    rows = []
    for t6 in range(100_000, 1_000_000, 100_000):
        sel = p6 >= t6
        tp = int(c[sel & (y == 1)].sum())
        fp = int(c[sel & (y == 0)].sum())
        fn = total_pos - tp
        prec = round(float(tp) / float(tp + fp), 6) + 0.0 if tp + fp else 0.0
        rec = round(float(tp) / float(tp + fn), 6) + 0.0 if tp + fn else 0.0
        f1 = (
            round(2.0 * tp / float(2 * tp + fp + fn), 6) + 0.0
            if 2 * tp + fp + fn
            else 0.0
        )
        rows.append((round(t6 / 1e6, 6), tp, fp, fn, prec, rec, f1))
    cols = list(zip(*rows))
    return pa.table(
        {
            "threshold": pa.array(cols[0], pa.float64()),
            "tp": pa.array(cols[1], pa.int64()),
            "fp": pa.array(cols[2], pa.int64()),
            "fn": pa.array(cols[3], pa.int64()),
            "precision": pa.array(cols[4], pa.float64()),
            "recall": pa.array(cols[5], pa.float64()),
            "f1": pa.array(cols[6], pa.float64()),
        }
    )


def _q_rfm_segments(sf_dir: str) -> pa.Table:
    """RFM customer segmentation over orders: per-customer recency
    (days since last order vs the global max date), frequency, and
    monetary total in EXACT cents fold through one grouped pass
    (sum/count/max partials); the three split points are two-middle
    medians and each customer gets a deterministic 'R{0,1}F{0,1}M{0,1}'
    segment by comparing against them. Output is per-customer (the
    result itself is |customers|-sized; the medians come from the same
    fold, no extra pass)."""
    from ray.data.aggregate import Max, Sum

    from dcs_ray.functions.stats import weighted_median

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "c_custkey": b["o_custkey"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "ts": b["o_orderdate"].cast(pa.int64()),
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    agg = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("cents"), Sum("one"), Max("ts"))
    )
    t = pa.concat_tables(
        pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")
    ).sort_by("c_custkey")
    cust = t["c_custkey"].to_numpy().astype(np.int64)
    cents = t["sum(cents)"].to_numpy().astype(np.int64)
    freq = t["sum(one)"].to_numpy().astype(np.int64)
    mx = t["max(ts)"].to_numpy().astype(np.int64)
    r_days = (int(mx.max()) - mx) // _US_PER_DAY

    def med(v: np.ndarray) -> float:
        s = np.sort(v).astype(np.float64)
        return weighted_median(s, np.ones(len(s), np.int64))

    med_r, med_f, med_m = med(r_days), med(freq), med(cents)
    seg = np.char.add(
        np.char.add(
            np.where(r_days.astype(np.float64) <= med_r, "R1", "R0"),
            np.where(freq.astype(np.float64) >= med_f, "F1", "F0"),
        ),
        np.where(cents.astype(np.float64) >= med_m, "M1", "M0"),
    )
    return pa.table(
        {
            "c_custkey": pa.array(cust, pa.int64()),
            "r_days": pa.array(r_days.astype(np.int64), pa.int64()),
            "freq": pa.array(freq, pa.int64()),
            "monetary_cents": pa.array(cents, pa.int64()),
            "segment": pa.array(seg.tolist(), pa.string()),
        }
    )


def _q_kmeans_davies_bouldin(sf_dir: str) -> pa.Table:
    """Davies–Bouldin index of the k=4 k-means partition over the
    embeddings table (see ``functions/kmeans.davies_bouldin``); the
    oracle replays training, the final assignment pass, per-cluster
    scatters, centroid separations, and the worst-ratio terms in
    chained CTEs."""
    from dcs_ray.functions.kmeans import davies_bouldin

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return davies_bouldin(emb, k=4, n_iter=3)


def _q_textrank_keywords(sf_dir: str) -> pa.Table:
    """Top-3 TextRank keywords per document (5 damped PageRank steps
    over each doc's word-adjacency graph). Documents are independent →
    one map_batches pass, zero exchange; all graph steps vectorized
    across the batch (see ``functions/textrank``). The oracle replays
    the zipped positional unnest, symmetrized edges, and every
    iteration in chained CTEs."""
    from dcs_ray.functions.textrank import textrank_keywords

    ds = textrank_keywords(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        k=3,
        n_iter=5,
    )
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return t.sort_by([("doc_id", "ascending"), ("rank", "ascending")])


def _textrank_sql(k: int = 3, n_iter: int = 5) -> str:
    """TextRank replay: positional tokens via zipped unnest, adjacent
    pairs (u≠v) symmetrized into weighted edges, degree sums, then one
    CTE per damped iteration (RESID=0.15, DAMP=0.85 exact literals —
    mirrors ``functions/textrank``)."""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f"""s{i} AS MATERIALIZED (
  SELECT n.doc_id, n.term,
         0.15 / nv.nv + 0.85 * coalesce(sum(e.w / dg.deg * p.s), 0.0) AS s
  FROM nodes n JOIN nv USING (doc_id)
  LEFT JOIN e ON e.doc_id = n.doc_id AND e.v = n.term
  LEFT JOIN dg ON dg.doc_id = e.doc_id AND dg.u = e.u
  LEFT JOIN s{i - 1} p ON p.doc_id = e.doc_id AND p.term = e.u
  GROUP BY n.doc_id, n.term, nv.nv)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH lstd AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
         '[^a-z0-9]+'), x -> x <> '') AS lst FROM documents),
posd AS MATERIALIZED (
  SELECT doc_id, unnest(lst) AS term,
         unnest(range(1, len(lst) + 1)) AS pos
  FROM lstd WHERE len(lst) > 0),
adj AS (SELECT a.doc_id, a.term AS u, b.term AS v
        FROM posd a JOIN posd b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term <> b.term),
e AS MATERIALIZED (
  SELECT doc_id, u, v, count(*)::double AS w FROM (
    SELECT doc_id, u, v FROM adj
    UNION ALL SELECT doc_id, v AS u, u AS v FROM adj)
  GROUP BY 1, 2, 3),
dg AS MATERIALIZED (SELECT doc_id, u, sum(w) AS deg FROM e GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM posd),
nv AS (SELECT doc_id, count(*)::double AS nv FROM nodes GROUP BY 1),
s0 AS (SELECT n.doc_id, n.term, 1.0 / nv.nv AS s
       FROM nodes n JOIN nv USING (doc_id)),
{chain},
ranked AS (
  SELECT doc_id, term, round(s, 6) AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(s, 6) DESC, term ASC) AS rank
  FROM s{n_iter})
SELECT doc_id, rank::bigint AS rank, term, score
FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank"""


def _q_event_value_stats(sf_dir: str) -> pa.Table:
    """Per-event-type monetary profile: count, EXACT-cents sum, mean,
    and share of the total value — the revenue breakdown every event
    pipeline reports. One |types|-row combiner fold, exact integers
    until the two final divisions."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {"event_type": b["event_type"], "cents": pa.array(cents, pa.int64())}
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"], ["cents"], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("event_type")
    n = g["n"].to_numpy().astype(np.int64)
    cents = g["cents"].to_numpy().astype(np.int64)
    tot = int(cents.sum())
    return pa.table(
        {
            "event_type": g["event_type"],
            "n": pa.array(n, pa.int64()),
            "sum_cents": pa.array(cents, pa.int64()),
            "mean_value": pa.array(
                np.round(cents.astype(np.float64) / (n * 100).astype(np.float64), 6)
                + 0.0,
                pa.float64(),
            ),
            "value_share": pa.array(
                np.round(cents.astype(np.float64) / float(tot), 6) + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_revenue_concentration(sf_dir: str) -> pa.Table:
    """Whale-concentration audit: the share of total purchase value
    held by the top 1% and top 10% of purchasers (revenue desc, user
    asc tiebreak; integer-ceil head sizes). Per-user revenue folds
    through the combiner in exact cents; the ranked scan is
    |purchasers|-sized."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": f["user_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"], ["cents"], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    user = g["user_id"].to_numpy().astype(np.int64)
    cents = g["cents"].to_numpy().astype(np.int64)
    order = np.lexsort((user, -cents))  # revenue desc, user asc
    c_sorted = cents[order]
    n_users = len(user)
    tot = int(cents.sum())
    k1 = (n_users + 99) // 100
    k10 = (n_users + 9) // 10
    s1 = int(c_sorted[:k1].sum())
    s10 = int(c_sorted[:k10].sum())
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "total_cents": pa.array([tot], pa.int64()),
            "top1pct_users": pa.array([k1], pa.int64()),
            "top1pct_share": pa.array([round(s1 / tot, 6) + 0.0], pa.float64()),
            "top10pct_users": pa.array([k10], pa.int64()),
            "top10pct_share": pa.array([round(s10 / tot, 6) + 0.0], pa.float64()),
        }
    )


def _q_arpu_percentiles(sf_dir: str) -> pa.Table:
    """Per-purchaser revenue percentiles (p50/p90/p99) with EXPLICIT
    linear interpolation — pos = (n−1)·q, v = lo + (hi−lo)·frac — the
    same expression the SQL replay spells out with row_number picks,
    so no dependence on any engine's quantile_cont internals. Revenue
    folds in exact cents; output in currency units round 6."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": f["user_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"], ["cents"], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    v = np.sort(g["cents"].to_numpy().astype(np.int64)).astype(np.float64)
    n = len(v)
    qs, out = [], []
    for q in (0.5, 0.9, 0.99):
        pos = (n - 1) * q
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        frac = pos - np.floor(pos)
        val = v[lo] + (v[hi] - v[lo]) * frac
        qs.append(q)
        out.append(round(val / 100.0, 6) + 0.0)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "n_users": pa.array([n] * 3, pa.int64()),
            "revenue": pa.array(out, pa.float64()),
        }
    )


def _q_props_field_stats(sf_dir: str) -> pa.Table:
    """JSON sidecar-field extraction: pull the integer ``k`` field out
    of the ``props`` JSON column with a vectorized Arrow regex kernel
    (fast path for flat integer fields; rows without the field drop
    out as nulls, exactly like SQL json_extract) and profile it per
    event type — n, sum, mean, min, max. One |types|-row fold."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min, Sum

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def prep(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], r'"k"\s*:\s*(?P<k>-?\d+)')
        k = pc.struct_field(ex, "k").cast(pa.int64())
        valid = pc.is_valid(k)
        f = pa.table({"event_type": b["event_type"], "k": k}).filter(valid)
        return pa.table(
            {
                "event_type": f["event_type"],
                "k": f["k"],
                "one": pa.array(np.ones(len(f), np.int64), pa.int64()),
            }
        )

    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k"), Sum("one"), Min("k"), Max("k"))
    )
    t = pa.concat_tables(
        pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")
    ).sort_by("event_type")
    sk = t["sum(k)"].to_numpy().astype(np.int64)
    n = t["sum(one)"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "event_type": t["event_type"],
            "n_with_k": pa.array(n, pa.int64()),
            "sum_k": pa.array(sk, pa.int64()),
            "mean_k": pa.array(
                np.round(sk.astype(np.float64) / n.astype(np.float64), 6) + 0.0,
                pa.float64(),
            ),
            "min_k": t["min(k)"].cast(pa.int64()),
            "max_k": t["max(k)"].cast(pa.int64()),
        }
    )


def _q_salsa_scores(sf_dir: str) -> pa.Table:
    """SALSA hubs/authorities over the extracted web graph (Lempel &
    Moran '00): HITS with degree-normalized pushes — each half-step is
    a random-walk step on the bipartite hub/authority graph, immune to
    the tightly-knit-community effect that skews raw HITS. 5
    iterations, L1-normalized each half-step, every round replayed in
    chained SQL CTEs with explicit outdeg/indeg joins."""
    from dcs_ray.functions.graph import salsa

    return salsa(_link_edges_ds(sf_dir), n_iter=5, src="src", dst="dst")


def _q_churned_users(sf_dir: str) -> pa.Table:
    """Churn split of the event timeline: the midpoint of [min_ts,
    max_ts] (integer µs floor) cuts the corpus in half; a user is
    churned if active before the cut but never after, new if the
    reverse. Two streaming passes — a 1-row min/max fold, then a
    per-user presence-flag combiner (exchange = |users|)."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = (
        ev.map_batches(to_us, batch_format="pyarrow")
        .aggregate(Min("us"), Max("us"))
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"),
            ["user_id"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64) > 0
    s = g["s"].to_numpy().astype(np.int64) > 0
    n_first = int(f.sum())
    n_churned = int((f & ~s).sum())
    return pa.table(
        {
            "mid_us": pa.array([mid], pa.int64()),
            "n_users": pa.array([len(g)], pa.int64()),
            "n_first_half": pa.array([n_first], pa.int64()),
            "n_second_half": pa.array([int(s.sum())], pa.int64()),
            "n_churned": pa.array([n_churned], pa.int64()),
            "n_new": pa.array([int((s & ~f).sum())], pa.int64()),
            "churn_rate": pa.array(
                [round(n_churned / n_first, 6) + 0.0 if n_first else 0.0],
                pa.float64(),
            ),
        }
    )


def _q_daily_new_users(sf_dir: str) -> pa.Table:
    """Cohort-entry curve: per epoch-day count of users seen for the
    FIRST time. Per-batch arrow group_by(min) collapses before the
    per-user min shuffle (exchange = batch-distinct users), then a
    |days|-row combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def partial_min(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "us": b["ts"].cast(pa.int64()),
            }
        )
        agg = t.group_by(["user_id"]).aggregate([("us", "min")])
        return pa.table({"user_id": agg["user_id"], "us": agg["us_min"]})

    first = (
        ev.map_batches(partial_min, batch_format="pyarrow")
        .groupby("user_id")
        .min("us")
    )

    def to_day(b: pa.Table) -> pa.Table:
        us = b["min(us)"].to_numpy().astype(np.int64)
        return pa.table({"day": pa.array(us // _US_PER_DAY, pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            first.map_batches(to_day, batch_format="pyarrow"),
            ["day"], [], count_col="new_users",
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["day", "new_users"]).sort_by("day")


def _q_user_activity_histogram(sf_dir: str) -> pa.Table:
    """Power-law audit of per-user activity: events-per-user folded
    into log2 buckets (bucket = ⌊log2 n⌋ computed by integer
    searchsorted over exact powers of two — no float log edge cases),
    with user and event counts per bucket. Exchange = |users| then
    |buckets|."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"].cast(pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], [],
            count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    n = g["n"].to_numpy().astype(np.int64)
    pow2 = 1 << np.arange(1, 63, dtype=np.int64)
    bucket = np.searchsorted(pow2, n, side="right").astype(np.int64)
    ub, inv = np.unique(bucket, return_inverse=True)
    n_users = np.zeros(len(ub), np.int64)
    np.add.at(n_users, inv, 1)
    n_events = np.zeros(len(ub), np.int64)
    np.add.at(n_events, inv, n)
    return pa.table(
        {
            "bucket": pa.array(ub, pa.int64()),
            "lo": pa.array((1 << ub.astype(np.int64)), pa.int64()),
            "n_users": pa.array(n_users, pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
        }
    )


def _q_chi2_lang_source(sf_dir: str) -> pa.Table:
    """Chi-squared independence test (+ Cramér's V) between document
    language and source feed, using the zero-cell-free identity
    χ² = N·(Σ_observed O²/(R·C) − 1) so only OBSERVED cells are ever
    materialized — the contingency fold is combiner-first and the
    driver holds |langs×sources observed| rows, never the cross
    product."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["lang", "source"], [], count_col="n")
        .iter_batches(batch_format="pyarrow")
    )
    lang = g["lang"].to_numpy(zero_copy_only=False)
    srcv = g["source"].to_numpy(zero_copy_only=False)
    obs = g["n"].to_numpy().astype(np.int64)
    ul, li = np.unique(lang, return_inverse=True)
    us, si = np.unique(srcv, return_inverse=True)
    row_tot = np.zeros(len(ul), np.int64)
    np.add.at(row_tot, li, obs)
    col_tot = np.zeros(len(us), np.int64)
    np.add.at(col_tot, si, obs)
    ntot = int(obs.sum())
    chi2 = ntot * (
        float(
            np.sum(
                obs.astype(np.float64) ** 2
                / (row_tot[li].astype(np.float64) * col_tot[si].astype(np.float64))
            )
        )
        - 1.0
    )
    r, c = len(ul), len(us)
    dof = (r - 1) * (c - 1)
    cramers_v = (
        float(np.sqrt(max(chi2, 0.0) / (ntot * min(r - 1, c - 1))))
        if min(r, c) > 1 and ntot > 0
        else 0.0
    )
    return pa.table(
        {
            "n_docs": pa.array([ntot], pa.int64()),
            "n_langs": pa.array([r], pa.int64()),
            "n_sources": pa.array([c], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([round(chi2, 6) + 0.0], pa.float64()),
            "cramers_v": pa.array([round(cramers_v, 6) + 0.0], pa.float64()),
        }
    )


def _q_word_length_hist(sf_dir: str) -> pa.Table:
    """Corpus word-length distribution: per token length, total token
    occurrences and distinct terms — the vocabulary-shape profile a
    tokenizer/BPE budget is sized from. Per-batch (length, term)
    combining, then a distinct-term fold per length; exchange =
    |distinct (len, term)|."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        flat, _parents = word_tokens_flat(b["text"])
        ln = pc.utf8_length(flat).cast(pa.int64())
        return pa.table({"len": ln, "term": flat})

    per_term = combiner_groupby(
        docs.map_batches(prep, batch_format="pyarrow"), ["len", "term"], [],
        count_col="n",
    )

    def fold(b: pa.Table) -> pa.Table:
        ln = b["len"].to_numpy().astype(np.int64)
        n = b["n"].to_numpy().astype(np.int64)
        ul, inv = np.unique(ln, return_inverse=True)
        occ = np.zeros(len(ul), np.int64)
        np.add.at(occ, inv, n)
        terms = np.zeros(len(ul), np.int64)
        np.add.at(terms, inv, 1)
        return pa.table(
            {
                "len": pa.array(ul, pa.int64()),
                "n_tokens": pa.array(occ, pa.int64()),
                "n_terms": pa.array(terms, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            per_term.map_batches(fold, batch_format="pyarrow"),
            ["len"], ["n_tokens", "n_terms"],
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["len", "n_tokens", "n_terms"]).sort_by("len")


def _q_boolean_not_search(sf_dir: str) -> pa.Table:
    """Boolean AND-NOT retrieval on the words index: docs containing
    BOTH 'spark' and 'join' but NOT 'merge' — dcs's ``-keyword`` query
    rewrite (F4) composed with the posting-AND (J1). Rarest-first
    intersect + one setdiff per shard; shards partition doc ids so the
    concat is the answer with zero exchange."""
    from dcs_ray.search import search_boolean

    idx = _index_dir(sf_dir, "words")
    return search_boolean(idx, include=["spark", "join"], exclude=["merge"])


def _q_calinski_harabasz(sf_dir: str) -> pa.Table:
    """Calinski–Harabasz variance-ratio index of the k-means partition
    (higher = tighter clusters): (B/(k−1))/(W/(N−k)) with W the squared
    distance to the assigned FINAL centroid and B the size-weighted
    centroid spread around the grand mean — the standard companion to
    the Davies–Bouldin gate, replayed through the same per-iteration
    k-means CTE chain plus one assignment/grand-mean pass."""
    from dcs_ray.functions.kmeans import calinski_harabasz

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return calinski_harabasz(emb, k=4, n_iter=3)


def _q_silhouette_simplified(sf_dir: str) -> pa.Table:
    """Simplified (centroid-based) silhouette per cluster + overall:
    s = (b−a)/max(a,b) with a = distance to own centroid, b = distance
    to the runner-up — the O(N·k) silhouette web-scale clustering
    reports use instead of the O(N²) pairwise original. Assignment and
    runner-up replayed via the rn=1/rn=2 rows of the same distance
    CTE."""
    from dcs_ray.functions.kmeans import silhouette_simplified

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return silhouette_simplified(emb, k=4, n_iter=3)


def _q_cosine_pair_hist(sf_dir: str) -> pa.Table:
    """Histogram of cosine similarity between (2m, 2m+1) embedding
    pairs in ten 0.2-wide bins over [−1, 1] — the pairwise-similarity
    distribution audit run before picking near-dup thresholds. Pairs
    co-locate via a 256-bucket groupby (pair % 256), pair up and dot
    VECTORIZED inside each bucket, then a |bins| combiner fold; cosine
    rounds to 6 before binning so the bin edge is replay-stable."""
    from dcs_ray.functions.relational import combiner_groupby

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy().astype(np.int64)
        bucket = (vid // 2) % 256
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "vec_id": pa.array(vid, pa.int64()),
                "embedding": b["embedding"],
            }
        )

    def pair_bins(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        col = g["embedding"].combine_chunks().take(pa.array(order))
        E = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        E = E.reshape(len(ids), -1)
        ev = ids[ids % 2 == 0]
        pos = np.searchsorted(ids, ev + 1)
        ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == ev + 1)
        a_idx = np.searchsorted(ids, ev[ok])
        b_idx = pos[ok]
        A, B = E[a_idx], E[b_idx]
        dot = (A * B).sum(axis=1)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        c = np.where(na * nb > 0, dot / np.where(na * nb > 0, na * nb, 1.0), 0.0)
        c = np.round(c, 6)
        binv = np.clip(np.floor((c + 1.0) * 5).astype(np.int64), 0, 9)
        ub, cnt = np.unique(binv, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(ub, pa.int64()),
                "n_pairs": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    binned = (
        emb.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_bins, batch_format="pyarrow")
    )
    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(binned, ["bin"], ["n_pairs"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    t = g.select(["bin", "n_pairs"]).sort_by("bin")
    lo = pc.add(pc.multiply(pc.cast(t["bin"], pa.float64()), 0.2), -1.0)
    return pa.table(
        {"bin": t["bin"], "lo": pc.round(lo, 6), "n_pairs": t["n_pairs"]}
    )


def _q_link_reciprocity(sf_dir: str) -> pa.Table:
    """Reciprocity of the web link graph: the share of distinct
    directed non-loop edges whose reverse edge also exists — the
    mutual-linking statistic crawl-graph audits report. Two combiner
    layers (directed-edge dedup, then per-undirected-pair direction
    flags); the driver sees four counters."""
    from dcs_ray.functions.relational import combiner_groupby

    edges = _link_edges_ds(sf_dir)

    def drop_loops(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        m = s != d
        return pa.table(
            {"src": pa.array(s[m], pa.int64()), "dst": pa.array(d[m], pa.int64())}
        )

    distinct = combiner_groupby(
        edges.map_batches(drop_loops, batch_format="pyarrow"), ["src", "dst"], []
    )

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
                "f": pa.array((s < d).astype(np.int64), pa.int64()),
                "r": pa.array((s > d).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            distinct.map_batches(to_pairs, batch_format="pyarrow"),
            ["a", "b"], ["f", "r"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64) > 0
    r = g["r"].to_numpy().astype(np.int64) > 0
    n_edges = int(f.sum()) + int(r.sum())
    n_recip = int((f & r).sum())
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_pairs": pa.array([len(g)], pa.int64()),
            "n_reciprocal_pairs": pa.array([n_recip], pa.int64()),
            "reciprocity": pa.array(
                [round(2 * n_recip / n_edges, 6) + 0.0 if n_edges else 0.0],
                pa.float64(),
            ),
        }
    )


def _q_rolling_median_daily(sf_dir: str) -> pa.Table:
    """7-day rolling MEDIAN of daily event volume (window = observed
    days in [d−6, d], explicit two-middle median — no quantile_cont
    dependence): the robust-smoothing companion to the EWMA gate. The
    distributed part is the |days| fold; the rolling scan is bounded
    driver work like the rest of the trend suite."""
    c = _daily_event_counts(sf_dir)
    days = c["day"].to_numpy().astype(np.int64)
    ns = c["n"].to_numpy().astype(np.int64)
    order = np.argsort(days)
    days, ns = days[order], ns[order]
    out_w, out_m = [], []
    for i in range(len(days)):
        lo = np.searchsorted(days, days[i] - 6, side="left")
        vals = np.sort(ns[lo : i + 1])
        w = len(vals)
        med = (float(vals[(w + 1) // 2 - 1]) + float(vals[w // 2])) / 2.0
        out_w.append(w)
        out_m.append(round(med, 6) + 0.0)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "window_n": pa.array(out_w, pa.int64()),
            "med": pa.array(out_m, pa.float64()),
        }
    )


def _q_lineitem_rollup(sf_dir: str) -> pa.Table:
    """Hierarchical ROLLUP aggregation: lineitem revenue (exact 1e-4
    units) at (returnflag, linestatus), per-returnflag subtotal, and
    grand total — the GROUPING SETS shape every reporting pipeline
    needs. ONE combiner pass computes the finest level; the coarser
    levels fold from the |flags×statuses|-row grouped table on the
    driver (never re-reading the fact table)."""
    from dcs_ray.functions.relational import combiner_groupby

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return _li_rev1e4(
            b,
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
            },
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"], ["rev1e4"], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    rf = g["l_returnflag"].to_numpy(zero_copy_only=False)
    ls = g["l_linestatus"].to_numpy(zero_copy_only=False)
    n = g["n"].to_numpy().astype(np.int64)
    rev = g["rev1e4"].to_numpy().astype(np.int64)
    out_rf = list(rf)
    out_ls = list(ls)
    out_n = list(n)
    out_rev = list(rev)
    for f in np.unique(rf):
        m = rf == f
        out_rf.append(f)
        out_ls.append("ALL")
        out_n.append(int(n[m].sum()))
        out_rev.append(int(rev[m].sum()))
    out_rf.append("ALL")
    out_ls.append("ALL")
    out_n.append(int(n.sum()))
    out_rev.append(int(rev.sum()))
    return pa.table(
        {
            "l_returnflag": pa.array([str(x) for x in out_rf], pa.string()),
            "l_linestatus": pa.array([str(x) for x in out_ls], pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "rev1e4": pa.array(out_rev, pa.int64()),
        }
    ).sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def _q_customer_order_lag(sf_dir: str) -> pa.Table:
    """LAG window over each customer's order history: previous order's
    total (exact cents) and the delta, ordered by (date, orderkey) —
    the repeat-purchase trend feature. One bucketed single-lexsort
    window pass (``running_agg``); no per-key loop, exchange =
    |orders| triples."""
    from dcs_ray.functions.windows import running_agg

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.int64())
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "date_us": us,
                "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                "cents": pa.array(cents.astype(np.float64), pa.float64()),
            }
        )

    ds = running_agg(
        orders.map_batches(prep, batch_format="pyarrow"),
        key="o_custkey", order_col="date_us", value_col="cents",
        tie_col="o_orderkey",
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    cents = t["cents"].to_numpy().astype(np.int64)
    lagf = t["lag_value"].to_numpy(zero_copy_only=False)  # NaN for run starts
    valid = ~np.isnan(lagf)
    lag_cents = pa.array(
        np.where(valid, lagf, 0.0).astype(np.int64), pa.int64(),
        mask=~valid,
    )
    delta = pa.array(
        np.where(valid, cents - np.where(valid, lagf, 0.0).astype(np.int64), 0),
        pa.int64(), mask=~valid,
    )
    return pa.table(
        {
            "o_custkey": t["o_custkey"].cast(pa.int64()),
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "lag_cents": lag_cents,
            "delta_cents": delta,
        }
    ).sort_by([("o_custkey", "ascending"), ("o_orderkey", "ascending")])


def _q_supplier_balance_ntile(sf_dir: str) -> pa.Table:
    """Global NTILE(4) of suppliers by account balance (desc, suppkey
    tiebreak), aggregated per quartile — the global-window companion
    to the per-key ntile4 the running-totals gate covers. The supplier
    DIMENSION collapses to (cents, suppkey) pairs on the driver
    (bounded like the other dimension-table scans); tiles follow SQL
    NTILE sizing exactly (first n%4 tiles get ⌈n/4⌉ rows)."""
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(b["s_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": b["s_suppkey"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in sup.map_batches(prep, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    key = t["s_suppkey"].to_numpy().astype(np.int64)
    cents = t["cents"].to_numpy().astype(np.int64)
    order = np.lexsort((key, -cents))
    cents = cents[order]
    n = len(cents)
    q, r = n // 4, n % 4
    sizes = np.full(4, q, np.int64)
    sizes[:r] += 1
    tile = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
    out = []
    for ti in range(1, 5):
        m = tile == ti
        if not m.any():
            continue
        out.append(
            (
                ti,
                int(m.sum()),
                int(cents[m].min()),
                int(cents[m].max()),
                int(cents[m].sum()),
            )
        )
    cols = list(zip(*out))
    return pa.table(
        {
            "tile": pa.array(cols[0], pa.int64()),
            "n_suppliers": pa.array(cols[1], pa.int64()),
            "min_cents": pa.array(cols[2], pa.int64()),
            "max_cents": pa.array(cols[3], pa.int64()),
            "sum_cents": pa.array(cols[4], pa.int64()),
        }
    )


def _q_char_trigram_topk(sf_dir: str) -> pa.Table:
    """Top-50 character trigrams of the corpus (count desc, trigram
    asc) — the raw-signal audit under the F3 trigram index and the
    langid features. Per-batch numpy byte-window extraction (one
    sliding view over the concatenated UTF-8 buffer, document
    boundaries masked), |distinct trigram| combiner fold, driver takes
    50 rows."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import _concat_utf8

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])

    def prep(b: pa.Table) -> pa.Table:
        texts = b["text"].combine_chunks()
        buf, offsets = _concat_utf8(texts)
        if len(buf) < 3:
            return pa.table(
                {
                    "trigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # windows fully inside one document: start ≥ doc start and
        # start + 3 ≤ doc end
        w = np.lib.stride_tricks.sliding_window_view(buf, 3)
        starts = np.arange(len(w))
        doc_of = np.searchsorted(offsets, starts, side="right") - 1
        ok = starts + 3 <= offsets[doc_of + 1]
        packed = (
            w[ok, 0].astype(np.int64) * 65536
            + w[ok, 1].astype(np.int64) * 256
            + w[ok, 2].astype(np.int64)
        )
        up, cnt = np.unique(packed, return_counts=True)
        chars = np.stack(
            [(up // 65536) % 256, (up // 256) % 256, up % 256], axis=1
        ).astype(np.uint8)
        tris = chars.tobytes().decode("utf-8", errors="strict")
        tri_list = [tris[i : i + 3] for i in range(0, len(tris), 3)]
        return pa.table(
            {
                "trigram": pa.array(tri_list, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    g = combiner_groupby(
        docs.map_batches(prep, batch_format="pyarrow"), ["trigram"], ["n"]
    )
    order = [("n", "descending"), ("trigram", "ascending")]

    def local_top(b: pa.Table) -> pa.Table:
        return b.select(["trigram", "n"]).sort_by(order).slice(0, 50)

    parts = [
        pa.table(b)
        for b in g.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"trigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    )
    return merged.sort_by(order).slice(0, 50)


def _q_langid_kappa(sf_dir: str) -> pa.Table:
    """Cohen's kappa of the heuristic language identifier against the
    labeled language — chance-corrected agreement, the metric that
    catches a classifier that just predicts the majority class. The
    confusion matrix folds through the combiner (|langs|² exchange);
    po/pe/kappa are exact-integer until three final divisions."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.textstats import langid_batch

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def prep(b: pa.Table) -> pa.Table:
        p = langid_batch(b)
        return pa.table({"true_lang": b["lang"], "pred_lang": p["pred_lang"]})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"),
            ["true_lang", "pred_lang"], [], count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    tl = g["true_lang"].to_numpy(zero_copy_only=False)
    pl = g["pred_lang"].to_numpy(zero_copy_only=False)
    n = g["n"].to_numpy().astype(np.int64)
    ntot = int(n.sum())
    agree = int(n[tl == pl].sum())
    classes = np.unique(np.concatenate([tl, pl]))
    ridx = np.searchsorted(classes, tl)
    cidx = np.searchsorted(classes, pl)
    rowm = np.zeros(len(classes), np.int64)
    np.add.at(rowm, ridx, n)
    colm = np.zeros(len(classes), np.int64)
    np.add.at(colm, cidx, n)
    pe_num = int((rowm * colm).sum())
    po = agree / ntot
    pe = pe_num / (ntot * ntot)
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 0.0
    return pa.table(
        {
            "n_docs": pa.array([ntot], pa.int64()),
            "n_agree": pa.array([agree], pa.int64()),
            "po": pa.array([round(po, 6) + 0.0], pa.float64()),
            "pe": pa.array([round(pe, 6) + 0.0], pa.float64()),
            "kappa": pa.array([round(kappa, 6) + 0.0], pa.float64()),
        }
    )


def _q_length_skew_kurtosis(sf_dir: str) -> pa.Table:
    """Per-language skewness (g1) and excess kurtosis (g2) of document
    length — the distribution-shape audit beyond mean/variance. Two
    passes: exact-integer (Σx, n) per lang for the mean, then one
    broadcast-mean pass folding central power sums (x−μ)²,³,⁴; the
    dimensionless final ratios absorb the float fold order at round
    6."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    ).materialize()

    def prep1(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "x": b["n_chars"].cast(pa.int64())})

    g1t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep1, batch_format="pyarrow"), ["lang"], ["x"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("lang")
    langs = g1t["lang"].to_numpy(zero_copy_only=False)
    sx = g1t["x"].to_numpy().astype(np.int64)
    nn = g1t["n_rows"].to_numpy().astype(np.int64)
    means = sx.astype(np.float64) / nn.astype(np.float64)
    mref = ray.put((langs.astype("U8"), means))

    def prep2(b: pa.Table) -> pa.Table:
        ls, mu = ray.get(mref)
        lang = b["lang"].to_numpy(zero_copy_only=False).astype("U8")
        x = b["n_chars"].to_numpy().astype(np.float64)
        li = np.searchsorted(ls, lang)
        d = x - mu[li]
        return pa.table(
            {
                "lang": b["lang"],
                "m2": pa.array(d * d, pa.float64()),
                "m3": pa.array(d * d * d, pa.float64()),
                "m4": pa.array(d * d * d * d, pa.float64()),
            }
        )

    g2t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep2, batch_format="pyarrow"),
            ["lang"], ["m2", "m3", "m4"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("lang")
    m2 = g2t["m2"].to_numpy() / nn
    m3 = g2t["m3"].to_numpy() / nn
    m4 = g2t["m4"].to_numpy() / nn
    sd = np.sqrt(m2)
    g1 = np.where(m2 > 0, m3 / np.where(m2 > 0, m2, 1.0) ** 1.5, 0.0)
    g2 = np.where(m2 > 0, m4 / np.where(m2 > 0, m2, 1.0) ** 2 - 3.0, 0.0)
    return pa.table(
        {
            "lang": g2t["lang"],
            "n": pa.array(nn, pa.int64()),
            "mean_len": pa.array(np.round(means, 6) + 0.0, pa.float64()),
            "sd_len": pa.array(np.round(sd, 6) + 0.0, pa.float64()),
            "skewness": pa.array(np.round(g1, 6) + 0.0, pa.float64()),
            "kurtosis_excess": pa.array(np.round(g2, 6) + 0.0, pa.float64()),
        }
    )


def _q_purchase_attribution(sf_dir: str) -> pa.Table:
    """First-touch revenue attribution: every user's purchase revenue
    (exact cents) credited to the type of their FIRST event (min (ts,
    event_id)) — the acquisition-channel report. ONE bucketed pass
    resolves first-touch AND per-user revenue together (a user's
    events co-locate via the hash bucket; inside a bucket one lexsort
    + first-of-run scan, no per-user Python), then a |types| combiner
    fold."""
    from dcs_ray.functions.joins import _key_bucket
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        is_p = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_key_bucket(uid, 64), pa.int32()),
                "user_id": pa.array(uid, pa.int64()),
                "us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "event_type": b["event_type"],
                "cents": pa.array(np.where(is_p, cents, 0), pa.int64()),
                "isp": pa.array(is_p.astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy().astype(np.int64)
        us = g["us"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        cents = g["cents"].to_numpy().astype(np.int64)
        isp = g["isp"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, us, u))
        u_s = u[order]
        new_run = np.ones(len(u_s), bool)
        new_run[1:] = u_s[1:] != u_s[:-1]
        first_rows = order[new_run]
        run_id = np.cumsum(new_run) - 1
        rev = np.zeros(int(new_run.sum()), np.int64)
        np.add.at(rev, run_id, cents[order])
        purch = np.zeros(len(rev), np.int64)
        np.maximum.at(purch, run_id, isp[order])
        ft = g["event_type"].take(pa.array(first_rows))
        return pa.table(
            {
                "first_touch_type": ft,
                "one": pa.array(np.ones(len(rev), np.int64), pa.int64()),
                "is_purchaser": pa.array(purch, pa.int64()),
                "cents": pa.array(rev, pa.int64()),
            }
        )

    per_user = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            per_user, ["first_touch_type"], ["one", "is_purchaser", "cents"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("first_touch_type")
    cents = g["cents"].to_numpy().astype(np.int64)
    tot = int(cents.sum())
    return pa.table(
        {
            "first_touch_type": g["first_touch_type"],
            "n_users": pa.array(g["one"].to_numpy().astype(np.int64), pa.int64()),
            "n_purchasers": pa.array(
                g["is_purchaser"].to_numpy().astype(np.int64), pa.int64()
            ),
            "purchase_cents": pa.array(cents, pa.int64()),
            "revenue_share": pa.array(
                np.round(cents.astype(np.float64) / float(tot), 6) + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_link_transitivity(sf_dir: str) -> pa.Table:
    """Global transitivity of the web graph: 3·triangles / wedges
    (= Σ per-node triangle participations / Σ d(d−1)/2) — the
    one-number cohesion summary on top of the per-node clustering
    gate, exact integers until the final division."""
    from dcs_ray.functions.graph import clustering_coefficients

    t = clustering_coefficients(_link_pair_edges(sf_dir))
    deg = t["degree"].to_numpy().astype(np.int64)
    tri = t["n_triangles"].to_numpy().astype(np.int64)
    closed = int(tri.sum())  # = 3 · #triangles
    wedges = int((deg * (deg - 1) // 2).sum())
    return pa.table(
        {
            "n_nodes": pa.array([len(t)], pa.int64()),
            "n_triangles": pa.array([closed // 3], pa.int64()),
            "n_wedges": pa.array([wedges], pa.int64()),
            "transitivity": pa.array(
                [round(closed / wedges, 6) + 0.0 if wedges else 0.0],
                pa.float64(),
            ),
        }
    )


_BOOT_B = 100  # resamples
_BOOT_M = 500  # draws per resample (m-out-of-n bootstrap)
_BOOT_SEED = 20260819


def _q_bootstrap_mean_ci(sf_dir: str) -> pa.Table:
    """m-out-of-n bootstrap CI for mean document length: B=100
    resamples of m=500 draws each, sampled WITH replacement through
    the inverse CDF of the exact value-count table (u = splitmix64(t ⊕
    seed) mod n — the same keyless counter-mode RNG discipline as the
    sampling gates, so every draw replays bit-for-bit in SQL). The
    distributed part is the |distinct lengths| combiner fold; the
    50k-draw resampling is bounded driver work independent of corpus
    size. CI bounds use the explicit-interpolation percentile (no
    quantile_cont dependence)."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["n_chars"], [], count_col="c").iter_batches(
            batch_format="pyarrow"
        )
    )
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    order = np.argsort(vals)
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])

    # splitmix64 over the draw counter (NO golden-ratio increment —
    # mirrors the generate_series chain in the SQL replay)
    t = np.arange(_BOOT_B * _BOOT_M, dtype=np.uint64)
    x = t ^ np.uint64(_BOOT_SEED)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = x ^ (x >> np.uint64(31))
    u = (h % np.uint64(n)).astype(np.int64)
    drawn = vals[np.searchsorted(cum, u, side="right")]
    sums = drawn.reshape(_BOOT_B, _BOOT_M).sum(axis=1)
    means = np.sort(sums.astype(np.float64) / _BOOT_M)
    out_q, out_v = [], []
    for q in (0.025, 0.5, 0.975):
        pos = (_BOOT_B - 1) * q
        lo = int(np.floor(pos))
        hi = min(lo + 1, _BOOT_B - 1)
        frac = pos - np.floor(pos)
        out_q.append(q)
        out_v.append(round(means[lo] + (means[hi] - means[lo]) * frac, 6) + 0.0)
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "n_resamples": pa.array([_BOOT_B] * 3, pa.int64()),
            "m_draws": pa.array([_BOOT_M] * 3, pa.int64()),
            "boot_mean": pa.array(out_v, pa.float64()),
        }
    )


def _q_robust_outliers_by_lang(sf_dir: str) -> pa.Table:
    """Robust (median/MAD) outlier audit per language: docs with
    |len − median| > 3·MAD — the outlier rule that, unlike the z-score
    gate, is immune to the outliers it hunts. EXACT integer arithmetic
    throughout: medians as two-middle SUMS (med2 = a+b), deviations as
    |2x − med2|, and the 3·MAD cut as 2·dev2 > 3·mad2x2 — no float
    enters until the two display divisions (both exact binary
    fractions). Exchange = |lang × distinct lengths|."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["lang", "n_chars"], [], count_col="c")
        .iter_batches(batch_format="pyarrow")
    )
    lang = vc["lang"].to_numpy(zero_copy_only=False)
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)

    def two_middle(v: np.ndarray, c: np.ndarray) -> int:
        """a + b for the 1-based ranks (n+1)//2 and n//2+1 over the
        value-count expansion (never expands the rows)."""
        order = np.argsort(v)
        vv, cc = v[order], c[order]
        cum = np.cumsum(cc)
        n = int(cum[-1])
        lo_r, hi_r = (n + 1) // 2, n // 2 + 1
        a = vv[np.searchsorted(cum, lo_r, side="left")]
        b = vv[np.searchsorted(cum, hi_r, side="left")]
        return int(a + b)

    rows = []
    for lg in np.unique(lang):
        m = lang == lg
        v, c = vals[m], cnt[m]
        n = int(c.sum())
        med2 = two_middle(v, c)
        dev2 = np.abs(2 * v - med2)
        mad2x2 = two_middle(dev2, c)
        n_out = int(c[2 * dev2 > 3 * mad2x2].sum())
        rows.append((str(lg), n, med2 / 2.0, mad2x2 / 4.0, n_out))
    cols = list(zip(*rows))
    return pa.table(
        {
            "lang": pa.array(cols[0], pa.string()),
            "n": pa.array(cols[1], pa.int64()),
            "median_len": pa.array([round(x, 6) for x in cols[2]], pa.float64()),
            "mad_len": pa.array([round(x, 6) for x in cols[3]], pa.float64()),
            "n_outliers": pa.array(cols[4], pa.int64()),
        }
    )


def _q_warc_source_roundtrip(sf_dir: str) -> pa.Table:
    """Crawl-native WARC ingest, fully ORACLED: the synthetic pages
    table written as Common-Crawl-layout WARC (one gzip member per
    record), read back through the distributed ``read_warc`` source
    (multi-member inflate, record framing, HTTP-header strip,
    WARC-Date parse), text re-extracted from html — and the whole
    (url, ts, text) set gated byte-identically against a pure SQL
    replay of the pages synthesis (url format, fixed epoch + doc_id
    seconds, every-50th stale half-text crawl 1h earlier). The write
    is a driver-side fixture step (4 files); the READ path is the
    production one-block-per-file source."""
    import os
    import shutil

    from dcs_ray.sources.pages import read_pages
    from dcs_ray.sources.warc import read_warc, write_warc

    pages = pa.concat_tables(
        [pa.table(b) for b in read_pages(sf_dir).iter_batches(batch_format="pyarrow")]
    )
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/dcs_ray_warc_gate_{name}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    nfiles = 4
    per = -(-len(pages) // nfiles)
    paths = []
    for i in range(nfiles):
        sl = pages.slice(i * per, per)
        if len(sl) == 0:
            break
        p = f"{out}/part-{i}.warc.gz"
        write_warc(p, sl, compress=True)
        paths.append(p)

    def extract(b: pa.Table) -> pa.Table:
        s = b["html"].cast(pa.string())
        inner = pc.replace_substring_regex(s, r"^.*?<p>", "")
        inner = pc.replace_substring_regex(inner, r"</p></body></html>$", "")
        for ent, ch in (("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")):
            inner = pc.replace_substring(inner, ent, ch)
        return pa.table(
            {
                "url": b["url"],
                "ts_us": b["warc_ts"].cast(pa.int64()),
                "text": inner,
            }
        )

    ds = read_warc(paths).map_batches(extract, batch_format="pyarrow")
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by([("url", "ascending"), ("ts_us", "ascending")])


def _q_robots_filtered_pages(sf_dir: str) -> pa.Table:
    """robots.txt exclusion at ingest (RFC 9309 longest-match subset):
    a deterministic per-host robots body — odd-ranked hosts fully
    Disallowed, even-ranked hosts blocking ids < 100 with an Allow
    carve-out for 40–49 (longest-rule precedence exercised) — is
    PARSED from real robots text, broadcast once via ray.put, and
    applied as a vectorized no-shuffle filter over the pages source.
    The oracle replays the rule semantics as plain predicates over the
    replayed pages synthesis."""
    import ray as _ray

    from dcs_ray.functions.crawl import parse_robots, robots_filter
    from dcs_ray.sources.pages import read_pages

    sources = sorted(
        set(
            pa.concat_tables(
                [
                    pa.table(b)
                    for b in _docs(sf_dir)
                    .select_columns(["source"])
                    .iter_batches(batch_format="pyarrow")
                ]
            )["source"]
            .to_pylist()
        )
    )
    robots_by_host = {}
    for rank, s in enumerate(sources):
        host = f"{s}.example.org"
        if rank % 2 == 1:
            body = "User-agent: *\nDisallow: /\n"
        else:
            body = (
                "# synthetic politeness rules\n"
                "User-agent: evilbot\nDisallow: /\n\n"
                "User-agent: *\n"
                "Disallow: /doc/000000\n"
                "Allow: /doc/0000004\n"
            )
        robots_by_host[host] = parse_robots(body)
    kept = robots_filter(read_pages(sf_dir), _ray.put(robots_by_host))
    t = pa.concat_tables(
        [
            pa.table(b)
            for b in kept.iter_batches(batch_format="pyarrow")
        ]
    )
    return pa.table(
        {
            "url": t["url"],
            "ts_us": t["warc_ts"].cast(pa.int64()),
        }
    ).sort_by([("url", "ascending"), ("ts_us", "ascending")])


def _q_warc_tolerant_parse(sf_dir: str) -> pa.Table:
    """Ingest fault isolation, fully ORACLED: every page row becomes its
    own gzip member (Common Crawl layout), members at page-row index
    j % 13 == 5 get one byte flipped mid-member, and the tolerant
    parser must (a) count exactly those members bad and (b) recover
    every other record intact by scanning to the next member magic —
    the property that keeps one mangled record from killing a ~1 GiB
    segment at 100 TB. Survivors replayed in SQL by page-row order."""
    import gzip

    from dcs_ray.sources.pages import read_pages
    from dcs_ray.sources.warc import parse_warc_tolerant, warc_member_bytes

    pages = pa.concat_tables(
        [pa.table(b) for b in read_pages(sf_dir).iter_batches(batch_format="pyarrow")]
    )
    members = warc_member_bytes(pages)
    out = []
    n_corrupt = 0
    for j, m in enumerate(members):
        c = bytearray(gzip.compress(m, mtime=0))
        if j >= 1 and (j - 1) % 13 == 5:  # member 0 is warcinfo
            c[len(c) // 2] ^= 0xFF
            n_corrupt += 1
        out.append(bytes(c))
    t, n_bad = parse_warc_tolerant(b"".join(out))
    assert n_bad == n_corrupt, (n_bad, n_corrupt)
    return pa.table(
        {
            "url": t["url"],
            "ts_us": t["warc_ts"].cast(pa.int64()),
        }
    ).sort_by([("url", "ascending"), ("ts_us", "ascending")])


def _q_sitemap_frontier(sf_dir: str) -> pa.Table:
    """Crawl-frontier discovery, fully ORACLED: per-host sitemap.xml
    fixtures advertise every crawled url (doc_id % 3 != 2 of the host)
    PLUS phantom ids shifted by 10^7 for doc_id % 7 == 0; the XML is
    parsed by the distributed one-file-per-block source and diffed
    against the crawled pages urls through the bucketed hash
    anti-join. The frontier is exactly the phantoms — url recipe and
    lastmod date arithmetic replayed in SQL."""
    import datetime
    import os
    import shutil

    from dcs_ray.sources.pages import page_url, read_pages
    from dcs_ray.sources.sitemap import (
        read_sitemaps,
        uncrawled_frontier,
        write_sitemap,
    )

    docs = pa.concat_tables(
        [
            pa.table(b)
            for b in _docs(sf_dir)
            .select_columns(["doc_id", "source"])
            .iter_batches(batch_format="pyarrow")
        ]
    )
    base = datetime.date(2023, 11, 14)
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/dcs_ray_sitemap_gate_{name}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    by_host: dict[str, tuple[list[str], list[str]]] = {}
    ids = docs["doc_id"].to_numpy()
    srcs = docs["source"].to_pylist()
    for d, s in zip(ids, srcs):
        d = int(d)
        urls, lms = by_host.setdefault(s, ([], []))
        if d % 3 != 2:
            urls.append(page_url(s, d))
            lms.append((base + datetime.timedelta(days=d % 400)).isoformat())
        if d % 7 == 0:
            p = d + 10_000_000
            urls.append(page_url(s, p))
            lms.append((base + datetime.timedelta(days=p % 400)).isoformat())
    paths = []
    for s, (urls, lms) in sorted(by_host.items()):
        p = f"{out}/{s}.xml"
        write_sitemap(p, urls, lms)
        paths.append(p)
    frontier = uncrawled_frontier(
        read_sitemaps(paths),
        read_pages(sf_dir).select_columns(["url"]),
    )
    t = pa.concat_tables(
        [pa.table(b) for b in frontier.iter_batches(batch_format="pyarrow")]
    )
    # ISO-string lastmod: hash-stable across the driver's date
    # representations (date32 → datetime.date vs DuckDB datetime64)
    t = t.set_column(
        t.schema.get_field_index("lastmod"), "lastmod",
        t["lastmod"].cast(pa.string()),
    )
    return t.sort_by("url")


def _q_charset_sniff_decode(sf_dir: str) -> pa.Table:
    """Charset sniff + transcode at ingest: every 5th doc's page body is
    encoded LATIN-1 with an injected accented marker (invalid as
    utf-8), the rest utf-8 with an astral-free unicode marker; the
    batch stage's whole-batch utf-8 fast path must fall back per row
    and still produce exact utf-8 text. The oracle replays the
    injected strings and charset rule directly."""
    from dcs_ray.sources.pages import transcode_batch

    def to_raw(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        texts = b["text"].to_pylist()
        raws = []
        for d, t in zip(ids, texts):
            if int(d) % 5 == 0:
                raws.append(f"café ¿señor? {t}".encode("latin-1"))
            else:
                raws.append(f"☃ búttèrfly {t}".encode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "raw": pa.array(raws, pa.binary()),
            }
        )

    ds = _docs(sf_dir).map_batches(to_raw, batch_format="pyarrow").map_batches(
        transcode_batch, batch_format="pyarrow"
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_multi_format_source(sf_dir: str) -> pa.Table:
    """Source-format parity gate: the events fact table round-trips
    through JSONL (``ray.data.read_json``) AND CSV
    (``ray.data.read_csv``) — the two text ingest formats a crawl
    pipeline meets besides parquet — and both paths must produce the
    identical per-type (n, cents) aggregate. Values are converted to
    exact integer cents BEFORE serialization so the text round-trip is
    lossless by construction; the sidecar files are written once per
    sf_dir under /tmp and reused."""
    import os

    from dcs_ray.functions.relational import combiner_groupby

    tag = sf_dir.strip("/").replace("/", "_")
    root = f"/tmp/dcs_ray_srcfmt_{tag}"
    jdir, cdir = f"{root}/jsonl", f"{root}/csv"
    done = f"{root}/.done"
    if not os.path.exists(done):
        ev = read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
        )

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"].cast(pa.int64()),
                    "event_type": b["event_type"],
                    "cents": pa.array(cents, pa.int64()),
                }
            )

        staged = ev.map_batches(to_cents, batch_format="pyarrow").materialize()
        staged.write_json(jdir)
        staged.write_csv(cdir)
        with open(done, "w") as f:
            f.write("ok")

    def agg(ds: ray.data.Dataset) -> pa.Table:
        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b["event_type"].cast(pa.string()),
                    "cents": b["cents"].cast(pa.int64()),
                }
            )

        return pa.concat_tables(
            pa.table(x)
            for x in combiner_groupby(
                ds.map_batches(prep, batch_format="pyarrow"),
                ["event_type"], ["cents"], count_col="n",
            ).iter_batches(batch_format="pyarrow")
        ).sort_by("event_type").select(["event_type", "n", "cents"])

    tj = agg(ray.data.read_json(jdir))
    tc = agg(ray.data.read_csv(cdir))
    if not tj.equals(tc):
        raise AssertionError("JSONL and CSV round-trips disagree")
    return tj


_PQ_M = 4       # subspaces
_PQ_K = 4       # centroids per subspace
_PQ_ITER = 2    # Lloyd's iterations per subspace
_PQ_SUBDIM = 16  # dims per subspace (4 × 16 = 64)


def _q_pq_codes(sf_dir: str) -> pa.Table:
    """Product-quantization code assignment (Jégou '11): the 64-dim
    embedding splits into 4 × 16-dim subspaces, each trained with the
    SAME deterministic Lloyd's contract as the k-means gates (seeds =
    k smallest ids' sub-vectors, argmin ties to the smallest cid,
    empty clusters keep their centroid), then every vector gets one
    code per subspace against the final subspace codebooks — the
    compressed-vector representation an IVF-PQ ANN index stores (here
    4×2 bits per vector instead of 64 floats). Training passes stream
    with k·d-sized exchanges; the coding pass broadcasts all four
    codebooks once."""
    from dcs_ray.functions.kmeans import _emb_f64, _train_centroids

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    codebooks = []
    for m in range(_PQ_M):
        start = m * _PQ_SUBDIM

        def slice_m(b: pa.Table, _s=start) -> pa.Table:
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "embedding": pc.list_slice(
                        b["embedding"], _s, _s + _PQ_SUBDIM
                    ),
                }
            )

        C, _, _ = _train_centroids(
            emb.map_batches(slice_m, batch_format="pyarrow"),
            _PQ_K, _PQ_ITER, "embedding", "vec_id",
        )
        codebooks.append(C)
    cref = ray.put([c.copy() for c in codebooks])

    def assign(b: pa.Table) -> pa.Table:
        cbs = ray.get(cref)
        E = _emb_f64(b["embedding"])
        cols = {"vec_id": b["vec_id"].cast(pa.int64())}
        for m, cc in enumerate(cbs):
            sub = E[:, m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
            dist = ((sub[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
            cols[f"code_{m}"] = pa.array(
                np.argmin(dist, axis=1).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    t = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(assign, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("vec_id")


def _pq_parts(m: int, k: int, n_iter: int, subdim: int) -> list[str]:
    """Per-subspace k-means CTE chain (``_kmeans_parts`` with a dim
    OFFSET and a ``_s{m}`` suffix) ending at final centroids
    ``c{n_iter}_s{m}`` — the SQL replay of one PQ codebook."""
    s = f"_s{m}"
    off = m * subdim
    parts = [
        f"""e{s} AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i + {off}]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {subdim + 1})) AS i) i),
seeds{s} AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::bigint AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0{s} AS MATERIALIZED (
  SELECT x.cid, e.dim, e.v FROM e{s} e JOIN seeds{s} x USING (vec_id))"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""d{t}{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{t}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
a{t}{s} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{t}{s}) WHERE rn = 1),
c{t + 1}{s} AS MATERIALIZED (
  SELECT a.cid, e.dim, sum(e.v) / count(*) AS v
  FROM e{s} e JOIN a{t}{s} a USING (vec_id) GROUP BY a.cid, e.dim
  UNION ALL
  SELECT c.cid, c.dim, c.v FROM c{t}{s} c
  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM a{t}{s}))"""
        )
    return parts


def _pq_codes_sql(
    M: int = 4, k: int = 4, n_iter: int = 2, subdim: int = 16
) -> str:
    """Full PQ replay: M independent subspace k-means chains, one
    final-codebook assignment each, joined on vec_id."""
    parts: list[str] = []
    for m in range(M):
        parts.extend(_pq_parts(m, k, n_iter, subdim))
        s = f"_s{m}"
        parts.append(
            f"""df{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{n_iter}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
af{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code_{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df{s}) WHERE rn = 1)"""
        )
    joins = " ".join(f"JOIN af_s{m} USING (vec_id)" for m in range(1, M))
    cols = ", ".join(f"code_{m}::bigint AS code_{m}" for m in range(M))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, {cols}
FROM af_s0 {joins}
ORDER BY vec_id"""
    )


def _q_psi_event_drift(sf_dir: str) -> pa.Table:
    """Population Stability Index of the event-type mix between the
    first and second half of the timeline (the standard drift monitor
    for a production feature): PSI = Σ (p−q)·ln(p/q) over types
    present in both halves. One 1-row min/max fold for the cut, one
    |types|² combiner fold for the two distributions — exact integers
    until the shares."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"),
            ["event_type"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64)
    s = g["s"].to_numpy().astype(np.int64)
    nf, ns = int(f.sum()), int(s.sum())
    both = (f > 0) & (s > 0)
    p = f[both].astype(np.float64) / nf
    q = s[both].astype(np.float64) / ns
    psi = float(((p - q) * np.log(p / q)).sum())
    return pa.table(
        {
            "n_first": pa.array([nf], pa.int64()),
            "n_second": pa.array([ns], pa.int64()),
            "n_types_both": pa.array([int(both.sum())], pa.int64()),
            "psi": pa.array([round(psi, 6) + 0.0], pa.float64()),
        }
    )


def _q_knn_pq_adc(sf_dir: str) -> pa.Table:
    """Approximate kNN by PQ asymmetric distance (ADC, Jégou '11):
    the query (the smallest vec_id's embedding) builds a 4×4 lookup
    table of subspace distances to the trained codebooks; every
    vector's distance is the 4-term LUT sum over its PQ codes — the
    scan an IVF-PQ index runs inside a probed list, at 4 adds per
    vector instead of a 64-dim float op. Top-5 by (adc_dist, vec_id);
    codebooks/codes/LUT all replay through the PQ CTE chains."""
    from dcs_ray.functions.kmeans import _emb_f64, _train_centroids

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    codebooks = []
    for m in range(_PQ_M):
        start = m * _PQ_SUBDIM

        def slice_m(b: pa.Table, _s=start) -> pa.Table:
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "embedding": pc.list_slice(
                        b["embedding"], _s, _s + _PQ_SUBDIM
                    ),
                }
            )

        C, _, _ = _train_centroids(
            emb.map_batches(slice_m, batch_format="pyarrow"),
            _PQ_K, _PQ_ITER, "embedding", "vec_id",
        )
        codebooks.append(C)

    # query = the smallest vec_id's embedding (deterministic, replayable)
    def local_min(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy().astype(np.int64)
        i = int(np.argmin(ids))
        return pa.table(
            {"vec_id": pa.array([ids[i]], pa.int64()),
             "embedding": b["embedding"].take(pa.array([i]))}
        )

    cand = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(local_min, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("vec_id").slice(0, 1)
    qv = _emb_f64(cand["embedding"])[0]

    lut = np.zeros((_PQ_M, _PQ_K), np.float64)
    for m, cc in enumerate(codebooks):
        qs = qv[m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
        lut[m] = ((cc - qs[None, :]) ** 2).sum(axis=1)
    ref = ray.put(([c.copy() for c in codebooks], lut.copy()))

    def score(b: pa.Table) -> pa.Table:
        cbs, lt = ray.get(ref)
        E = _emb_f64(b["embedding"])
        dist = np.zeros(len(E), np.float64)
        for m, cc in enumerate(cbs):
            sub = E[:, m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
            d = ((sub[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
            dist += lt[m][np.argmin(d, axis=1)]
        t = pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "adc_dist": pa.array(dist, pa.float64()),
            }
        )
        return t.sort_by(
            [("adc_dist", "ascending"), ("vec_id", "ascending")]
        ).slice(0, 5)

    parts = [
        pa.table(b)
        for b in emb.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts).sort_by(
        [("adc_dist", "ascending"), ("vec_id", "ascending")]
    ).slice(0, 5)
    return pa.table(
        {
            "vec_id": merged["vec_id"],
            "adc_dist": pc.add(pc.round(merged["adc_dist"], 6), 0.0),
        }
    )


def _knn_pq_adc_sql(
    M: int = 4, k: int = 4, n_iter: int = 2, subdim: int = 16, topk: int = 5
) -> str:
    """ADC replay: the PQ chains, a per-subspace LUT against the
    smallest-id query vector, and the 4-way LUT-sum scan."""
    parts: list[str] = [
        "q AS MATERIALIZED (SELECT embedding AS qe FROM embeddings "
        "ORDER BY vec_id LIMIT 1)"
    ]
    for m in range(M):
        parts.extend(_pq_parts(m, k, n_iter, subdim))
        s = f"_s{m}"
        off = m * subdim
        parts.append(
            f"""df{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{n_iter}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
af{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code_{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df{s}) WHERE rn = 1),
lut{s} AS MATERIALIZED (
  SELECT c.cid, sum((c.v - q.qe[c.dim + {off}]::double)
                    * (c.v - q.qe[c.dim + {off}]::double)) AS d
  FROM c{n_iter}{s} c, q GROUP BY c.cid)"""
        )
    joins = " ".join(
        f"JOIN af_s{m} USING (vec_id) " for m in range(1, M)
    )
    lut_joins = " ".join(
        f"JOIN lut_s{m} l{m} ON l{m}.cid = af_s{m}.code_{m}" for m in range(M)
    )
    dist_sum = " + ".join(f"l{m}.d" for m in range(M))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, round({dist_sum}, 6) + 0.0 AS adc_dist
FROM af_s0 {joins} {lut_joins}
ORDER BY ({dist_sum}) ASC, vec_id ASC LIMIT {topk}"""
    )


def _q_gains_curve_quality(sf_dir: str) -> pa.Table:
    """Cumulative gains / lift table of the quality classifier at the
    ten score-decile thresholds: for each decile d, the threshold is
    the micro-unit score at rank ⌈n·d/10⌉ (descending) and the
    selected set takes WHOLE tie groups (p6 ≥ threshold) — the
    targeting report that says 'the top 10% of scores captures X% of
    positives'. Value-count fold on (p6, y) — the same |distinct
    score|² exchange as the AUC gate — then ten driver rows."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_p6(b: pa.Table) -> pa.Table:
        p6 = np.floor(b["quality_prob"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "p6": pa.array(p6, pa.int64()),
                "y": b["y"].cast(pa.int64()),
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    scored = docs.map_batches(
        _QualityWithLabel, concurrency=2, batch_format="pyarrow"
    )
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            scored.map_batches(to_p6, batch_format="pyarrow"),
            ["p6"], ["y", "one"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("p6", "descending")])
    p6 = vc["p6"].to_numpy().astype(np.int64)
    pos = vc["y"].to_numpy().astype(np.int64)
    cnt = vc["one"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnt)
    cumpos = np.cumsum(pos)
    n = int(cum[-1])
    npos = int(cumpos[-1])
    rows = []
    for d in range(1, 11):
        r = (n * d + 9) // 10  # ceil(n·d/10)
        i = int(np.searchsorted(cum, r, side="left"))
        thr = int(p6[i])
        n_sel, pos_sel = int(cum[i]), int(cumpos[i])
        rows.append(
            (
                d,
                thr,
                n_sel,
                pos_sel,
                round(pos_sel / npos, 6) + 0.0,
                round(pos_sel / n_sel, 6) + 0.0,
                round((pos_sel / n_sel) / (npos / n), 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "decile": pa.array(cols[0], pa.int64()),
            "p6_threshold": pa.array(cols[1], pa.int64()),
            "n_selected": pa.array(cols[2], pa.int64()),
            "n_pos_selected": pa.array(cols[3], pa.int64()),
            "recall": pa.array(cols[4], pa.float64()),
            "precision": pa.array(cols[5], pa.float64()),
            "lift": pa.array(cols[6], pa.float64()),
        }
    )


def _q_hill_tail_events(sf_dir: str) -> pa.Table:
    """Hill tail-index estimate of the purchase-value distribution
    (the heavy-tail exponent that decides whether revenue concentration
    is even summable): α̂ = k / (Σ_{top-k} ln x − k·ln x_(k+1)) with
    k = ⌈n/20⌉ (the 5% tail). Folds through the |distinct cents|
    value-count combiner; the boundary tie group enters PARTIALLY by
    count, which is value-replayable because the summand depends only
    on the value."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        return pa.table({"cents": pa.array(cents, pa.int64())})

    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["cents"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("cents", "descending")])
    vals = vc["cents"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    k = (n + 19) // 20
    before = cum - cnt
    taken = np.clip(k - before, 0, cnt)
    sum_ln = float((taken * np.log(vals.astype(np.float64))).sum())
    i_k1 = int(np.searchsorted(cum, k + 1, side="left"))
    xk1 = int(vals[i_k1])
    denom = sum_ln - k * float(np.log(float(xk1)))
    alpha = k / denom if denom > 0 else 0.0
    return pa.table(
        {
            "n_purchases": pa.array([n], pa.int64()),
            "k_tail": pa.array([k], pa.int64()),
            "xk1_cents": pa.array([xk1], pa.int64()),
            "hill_alpha": pa.array([round(alpha, 6) + 0.0], pa.float64()),
        }
    )


def _q_term_burstiness(sf_dir: str) -> pa.Table:
    """Term burstiness (Church & Gale): collection frequency over
    document frequency — terms that, WHEN they appear, appear in
    bursts (content words) vs evenly spread function words. Top-20 by
    cf/df among terms with df ≥ 5; exchange = |distinct (doc, term)|
    like the term_df gate, then |vocab| per-term fold."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def prep(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[parents], pa.int64()), "term": flat}
        )

    dt = combiner_groupby(
        docs.map_batches(prep, batch_format="pyarrow"), ["doc_id", "term"], [],
        count_col="c",
    )

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": b["term"],
                "cf": b["c"].cast(pa.int64()),
                "df": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            dt.map_batches(fold, batch_format="pyarrow"), ["term"], ["cf", "df"],
        ).iter_batches(batch_format="pyarrow")
    )
    cf = t["cf"].to_numpy().astype(np.int64)
    df = t["df"].to_numpy().astype(np.int64)
    keep = df >= 5
    term = t["term"].to_numpy(zero_copy_only=False)[keep]
    cf, df = cf[keep], df[keep]
    ratio = cf.astype(np.float64) / df.astype(np.float64)
    order = np.lexsort((term, -ratio))[:20]
    return pa.table(
        {
            "term": pa.array([str(x) for x in term[order]], pa.string()),
            "cf": pa.array(cf[order], pa.int64()),
            "df": pa.array(df[order], pa.int64()),
            "burstiness": pa.array(
                np.round(ratio[order], 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_markov_next_event_accuracy(sf_dir: str) -> pa.Table:
    """Evaluation of the first-order Markov next-event predictor:
    predict argmax-count transition (ties → smallest type) and score
    it on the SAME sequence — computable entirely from the transition
    counts, so the whole evaluation costs one |type-pairs| exchange
    (the matrix gate's own shape) and zero extra passes."""
    from dcs_ray.functions.windows import event_transitions

    ds = event_transitions(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    prev = t["prev_type"].to_numpy(zero_copy_only=False)
    nxt = t["next_type"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy().astype(np.int64)
    order = np.lexsort((nxt, -n, prev))  # per prev: n desc, next asc
    p_s = prev[order]
    first = np.ones(len(p_s), bool)
    first[1:] = p_s[1:] != p_s[:-1]
    pred = {p_s[i]: nxt[order][i] for i in np.flatnonzero(first)}
    correct = int(
        n[[pred[p] == x for p, x in zip(prev, nxt)]].sum()
    )
    tot = int(n.sum())
    return pa.table(
        {
            "n_transitions": pa.array([tot], pa.int64()),
            "n_prev_types": pa.array([len(pred)], pa.int64()),
            "n_correct": pa.array([correct], pa.int64()),
            "accuracy": pa.array(
                [round(correct / tot, 6) + 0.0 if tot else 0.0], pa.float64()
            ),
        }
    )


def _q_quantile_sketch_error(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit: the 64-bin mergeable histogram's
    p50/p90/p99 of document length vs the EXACT order statistic
    (rank ⌈q·n⌉), with absolute and relative error — the measurement
    that justifies (or vetoes) replacing the exact quantile exchange
    with the constant-size sketch at 100×. Both estimates fold
    distributed (|bins| resp. |distinct lengths| exchanges)."""
    from dcs_ray.functions.quantiles import approx_quantiles_histogram
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    ).materialize()
    approx = approx_quantiles_histogram(docs, "n_chars", [0.5, 0.9, 0.99], bins=64)
    av = {
        round(float(q), 6): float(v)
        for q, v in zip(
            approx["q"].to_numpy(zero_copy_only=False),
            approx["value"].to_numpy(zero_copy_only=False),
        )
    }
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["n_chars"], [], count_col="c")
        .iter_batches(batch_format="pyarrow")
    )
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    order = np.argsort(vals)
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    rows = []
    for q in (0.5, 0.9, 0.99):
        r = max(1, int(np.ceil(q * n)))
        exact = float(vals[np.searchsorted(cum, r, side="left")])
        ap = av[round(q, 6)]
        rows.append(
            (
                q,
                exact,
                round(ap, 6) + 0.0,
                round(ap - exact, 6) + 0.0,
                round((ap - exact) / exact, 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "q": pa.array(cols[0], pa.float64()),
            "exact": pa.array(cols[1], pa.float64()),
            "approx": pa.array(cols[2], pa.float64()),
            "abs_err": pa.array(cols[3], pa.float64()),
            "rel_err": pa.array(cols[4], pa.float64()),
        }
    )


def _q_rich_club(sf_dir: str) -> pa.Table:
    """Rich-club coefficient of the web graph at k=3: edge density
    among nodes with degree > k (do the hubs link to EACH OTHER?) —
    the link-ring / elite-core audit. Degrees fold through the
    combiner; the club membership broadcasts as a sorted array and
    one filtered pass counts in-club edges."""
    from dcs_ray.functions.relational import combiner_groupby

    K = 3
    edges = _link_edges_ds(sf_dir)

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
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
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy().astype(np.int64),
                            b["b"].to_numpy().astype(np.int64),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"), ["node"], [],
            count_col="d",
        ).iter_batches(batch_format="pyarrow")
    )
    nodes = deg["node"].to_numpy().astype(np.int64)
    dd = deg["d"].to_numpy().astype(np.int64)
    club = np.sort(nodes[dd > K])
    cref = ray.put(club)

    def in_club(b: pa.Table) -> pa.Table:
        cl = ray.get(cref)
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        if len(cl) == 0:
            k = 0
        else:
            ia = np.minimum(np.searchsorted(cl, a), len(cl) - 1)
            ib = np.minimum(np.searchsorted(cl, bb), len(cl) - 1)
            k = int(((cl[ia] == a) & (cl[ib] == bb)).sum())
        return pa.table({"k": pa.array([k], pa.int64())})

    e_in = sum(
        int(b["k"][0].as_py())
        for b in pairs.map_batches(in_club, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    m = len(club)
    phi = 2.0 * e_in / (m * (m - 1)) if m > 1 else 0.0
    return pa.table(
        {
            "k": pa.array([K], pa.int64()),
            "n_club": pa.array([m], pa.int64()),
            "n_club_edges": pa.array([e_in], pa.int64()),
            "rich_club_phi": pa.array([round(phi, 6) + 0.0], pa.float64()),
        }
    )


def _q_rbo_bm25_qld(sf_dir: str) -> pa.Table:
    """Rank-Biased Overlap (Webber '10, truncated prefix form, p=0.9,
    depth 20) between the BM25 and Dirichlet-QL rankings of the same
    query — the ranker-agreement metric an engine migration is judged
    by. Both rankings run the normal query×shard fan-out; the RBO fold
    is 20 driver rows."""
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    a = search_bm25(idx, [BM25_QUERY], k=20)
    b = search_lm(idx, [BM25_QUERY], k=20, model="qld", mu=300.0)
    ra = {int(d): int(r) for d, r in zip(a["doc_id"].to_pylist(), a["rank"].to_pylist())}
    rb = {int(d): int(r) for d, r in zip(b["doc_id"].to_pylist(), b["rank"].to_pylist())}
    common = set(ra) & set(rb)
    p = 0.9
    depth = 20
    rbo = 0.0
    for i in range(1, depth + 1):
        o = sum(1 for d in common if ra[d] <= i and rb[d] <= i)
        # 0.1 literal, not (1 − 0.9): the SQL replay writes 0.1 and the
        # two differ in the last ulp
        rbo += 0.1 * p ** (i - 1) * o / i
    return pa.table(
        {
            "depth": pa.array([depth], pa.int64()),
            "p": pa.array([p], pa.float64()),
            "n_common": pa.array([len(common)], pa.int64()),
            "rbo": pa.array([round(rbo, 6) + 0.0], pa.float64()),
        }
    )


def _q_markov_entropy_rate(sf_dir: str) -> pa.Table:
    """Entropy rate of the event-type Markov chain: H = −Σᵢ πᵢ Σⱼ
    Pᵢⱼ ln Pᵢⱼ with π the 5-step stationary gate's (round-6) vector
    and P the exact row-normalized transition ratios — how predictable
    the event stream is, in nats, plus the matching perplexity. Same
    |type-pairs| exchange as the transition gate."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.stats import markov_stationary
    from dcs_ray.functions.windows import event_transitions

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).materialize()
    trans = pa.concat_tables(
        pa.table(b)
        for b in event_transitions(ev).iter_batches(batch_format="pyarrow")
    )
    types = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(
                lambda b: pa.table({"event_type": b["event_type"]}),
                batch_format="pyarrow",
            ),
            ["event_type"], [],
        ).iter_batches(batch_format="pyarrow")
    )["event_type"].to_pylist()
    pi_t = markov_stationary(trans, types, iters=5)
    pi = {
        t: float(v)
        for t, v in zip(pi_t["event_type"].to_pylist(), pi_t["pr"].to_pylist())
    }
    prev = trans["prev_type"].to_pylist()
    n = trans["n"].to_numpy().astype(np.int64)
    tot = {}
    for pv, c in zip(prev, n):
        tot[pv] = tot.get(pv, 0) + int(c)
    h = 0.0
    for pv, c in zip(prev, n):
        pij = int(c) / tot[pv]
        h -= pi[pv] * pij * np.log(pij)
    return pa.table(
        {
            "n_types": pa.array([len(types)], pa.int64()),
            "entropy_rate": pa.array([round(float(h), 6) + 0.0], pa.float64()),
            "perplexity": pa.array(
                [round(float(np.exp(h)), 6) + 0.0], pa.float64()
            ),
        }
    )


def _markov_entropy_sql(k: int = 5) -> str:
    """Entropy-rate replay: the stationary-distribution chain (round-6
    π, mirroring the gate's output contract) dotted with the exact
    row-normalized P ln P sums."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""r{i} AS (
  SELECT ty.event_type, coalesce(sum(v{i - 1}.pr * p.p), 0.0) AS pr
  FROM ty LEFT JOIN p ON p.nxt = ty.event_type
          LEFT JOIN v{i - 1} ON v{i - 1}.event_type = p.prev
  GROUP BY ty.event_type),
v{i} AS (SELECT event_type, pr / (SELECT sum(pr) FROM r{i}) AS pr FROM r{i})"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH tr AS (
  SELECT prev, event_type AS nxt, count(*)::double AS n FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_type) AS prev
    FROM events) s
  WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS (SELECT prev, sum(n) AS tot FROM tr GROUP BY prev),
p AS (SELECT tr.prev, tr.nxt, tr.n / rs.tot AS p FROM tr JOIN rs USING (prev)),
ty AS (SELECT DISTINCT event_type FROM events),
v0 AS (SELECT event_type, 1.0 / (SELECT count(*) FROM ty) AS pr FROM ty),
{chain},
pi AS (SELECT event_type, round(pr, 6) + 0.0 AS pr FROM v{k}),
h AS (SELECT -sum(pi.pr * p.p * ln(p.p)) AS h
      FROM p JOIN pi ON pi.event_type = p.prev)
SELECT (SELECT count(*) FROM ty)::bigint AS n_types,
       round(h.h, 6) + 0.0 AS entropy_rate,
       round(exp(h.h), 6) + 0.0 AS perplexity
FROM h"""


def _q_heaps_law_fit(sf_dir: str) -> pa.Table:
    """Heaps'-law vocabulary-growth fit V(n) = k·n^β over ten doc-id
    prefix cuts (cut values from the 1-row min/max fold — NO global
    order statistic, so the shape survives 10^12 ids): per-term first
    doc id folds through a |vocab| min-exchange, prefix doc/vocab
    counts are vectorized searchsorted probes, and the 10-point
    log-log OLS runs on the driver. The exponent that sizes a
    tokenizer's vocab budget at 100×."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat
    from ray.data.aggregate import Max, Min

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()

    def ids_only(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"].cast(pa.int64())})

    mm = docs.map_batches(ids_only, batch_format="pyarrow").aggregate(
        Min("doc_id"), Max("doc_id")
    )
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    cuts = np.array(
        [lo + ((hi - lo) * d) // 10 for d in range(1, 11)], np.int64
    )
    cref = ray.put(cuts)

    def doc_counts(b: pa.Table) -> pa.Table:
        ct = ray.get(cref)
        ids = np.sort(b["doc_id"].to_numpy().astype(np.int64))
        n = np.searchsorted(ids, ct, side="right").astype(np.int64)
        return pa.table(
            {
                "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    nd = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(doc_counts, batch_format="pyarrow"), ["d"], ["n"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("d")

    def term_first(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        t = pa.table(
            {"term": flat, "fid": pa.array(ids[parents], pa.int64())}
        )
        agg = t.group_by(["term"]).aggregate([("fid", "min")])
        return pa.table({"term": agg["term"], "fid": agg["fid_min"]})

    firsts = (
        docs.map_batches(term_first, batch_format="pyarrow")
        .groupby("term")
        .min("fid")
    )

    def vocab_counts(b: pa.Table) -> pa.Table:
        ct = ray.get(cref)
        f = np.sort(b["min(fid)"].to_numpy().astype(np.int64))
        v = np.searchsorted(f, ct, side="right").astype(np.int64)
        return pa.table(
            {
                "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    vd = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            firsts.map_batches(vocab_counts, batch_format="pyarrow"), ["d"], ["v"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("d")
    n = nd["n"].to_numpy().astype(np.int64)
    v = vd["v"].to_numpy().astype(np.int64)
    x = np.log(n.astype(np.float64))
    y = np.log(v.astype(np.float64))
    mx, my = float(np.mean(x)), float(np.mean(y))
    beta = float(((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum())
    k = float(np.exp(my - beta * mx))
    return pa.table(
        {
            "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
            "n_docs": pa.array(n, pa.int64()),
            "vocab": pa.array(v, pa.int64()),
            "heaps_beta": pa.array(
                np.full(10, round(beta, 6) + 0.0), pa.float64()
            ),
            "heaps_k": pa.array(np.full(10, round(k, 6) + 0.0), pa.float64()),
        }
    )


def _q_revenue_lorenz(sf_dir: str) -> pa.Table:
    """Lorenz curve of purchase revenue at user deciles (cumulative
    revenue share of the poorest ⌈n·d/10⌉ purchasers, ordered cents
    asc / user asc) — the full inequality curve behind the gini and
    top-share gates. Per-user revenue folds in exact cents; the
    ranked scan is |purchasers|-sized driver work."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": f["user_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], ["cents"],
        ).iter_batches(batch_format="pyarrow")
    )
    user = g["user_id"].to_numpy().astype(np.int64)
    cents = g["cents"].to_numpy().astype(np.int64)
    order = np.lexsort((user, cents))
    c_sorted = cents[order]
    cum = np.cumsum(c_sorted)
    n = len(c_sorted)
    tot = int(cum[-1])
    rows = []
    for d in range(1, 11):
        r = (n * d + 9) // 10
        rows.append((d, r, int(cum[r - 1]), round(int(cum[r - 1]) / tot, 6) + 0.0))
    cols = list(zip(*rows))
    return pa.table(
        {
            "decile": pa.array(cols[0], pa.int64()),
            "n_users_cut": pa.array(cols[1], pa.int64()),
            "cum_cents": pa.array(cols[2], pa.int64()),
            "cum_share": pa.array(cols[3], pa.float64()),
        }
    )


def _q_partitioned_write_roundtrip(sf_dir: str) -> pa.Table:
    """Resumable-output gate: documents write as hive-partitioned
    parquet (``partition_cols=['lang']`` — one directory per language,
    the layout a failed 100-TB run resumes from), then ONLY the
    ``lang=es`` partition is read back (partition-pruned read: other
    directories never open) and aggregated. Written once per sf_dir
    under /tmp."""
    import os

    tag = sf_dir.strip("/").replace("/", "_")
    root = f"/tmp/dcs_ray_partwrite_{tag}"
    done = f"{root}/.done"
    if not os.path.exists(done):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        docs.write_parquet(f"{root}/docs", partition_cols=["lang"])
        with open(done, "w") as f:
            f.write("ok")

    es = ray.data.read_parquet(f"{root}/docs/lang=es")

    def agg(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([len(b)], pa.int64()),
                "sum_chars": pa.array(
                    [int(b["n_chars"].to_numpy().astype(np.int64).sum())],
                    pa.int64(),
                ),
            }
        )

    parts = pa.concat_tables(
        pa.table(b)
        for b in es.map_batches(agg, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return pa.table(
        {
            "lang": pa.array(["es"], pa.string()),
            "n_docs": pa.array(
                [int(parts["n"].to_numpy().sum())], pa.int64()
            ),
            "sum_chars": pa.array(
                [int(parts["sum_chars"].to_numpy().sum())], pa.int64()
            ),
        }
    )


def _q_minhash_estimate_error(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit of MinHash itself: for every LSH candidate
    pair, the 64-permutation signature-agreement ESTIMATE of Jaccard
    next to the exact shingle-set value and the absolute error — the
    measurement behind choosing 64 permutations. Signatures are
    computed only for pair PARTICIPANTS (semi-filtered per batch, like
    the verify join); every output value is a single exact division,
    so the gate is hash-stable."""
    from dcs_ray.functions.dedup import (
        jaccard_verify_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs(sf_dir).materialize()
    pairs_ds = minhash_candidate_pairs(docs)
    pair_t = pa.concat_tables(
        pa.table(b) for b in pairs_ds.iter_batches(batch_format="pyarrow")
    )
    if len(pair_t) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
                "exact_jaccard": pa.array([], pa.float64()),
                "abs_err": pa.array([], pa.float64()),
            }
        )
    ia = pair_t["id_a"].to_numpy().astype(np.int64)
    ib = pair_t["id_b"].to_numpy().astype(np.int64)
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    uniq = np.unique(np.stack((lo, hi), axis=1), axis=0)
    ia, ib = uniq[:, 0], uniq[:, 1]
    participants = np.unique(np.concatenate((ia, ib)))
    part_ref = ray.put(participants)

    def sigs_batch(b: pa.Table) -> pa.Table:
        part = ray.get(part_ref)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(part, ids), len(part) - 1)
        keep = part[pos] == ids
        texts = b["text"].filter(pa.array(keep))
        sig = minhash_signatures(texts)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "sig": pa.array(
                    [row.astype(np.int64).tolist() for row in sig],
                    pa.list_(pa.int64()),
                ),
            }
        )

    st = pa.concat_tables(
        pa.table(b)
        for b in docs.map_batches(sigs_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    sid = st["doc_id"].to_numpy().astype(np.int64)
    S = (
        st["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .astype(np.int64).reshape(len(st), -1)
    )
    order = np.argsort(sid)
    sid, S = sid[order], S[order]
    a_idx = np.searchsorted(sid, ia)
    b_idx = np.searchsorted(sid, ib)
    est = (S[a_idx] == S[b_idx]).sum(axis=1).astype(np.float64) / S.shape[1]

    exact_ds = jaccard_verify_pairs(docs, pairs_ds, threshold=0.0)
    ex_t = pa.concat_tables(
        pa.table(b) for b in exact_ds.iter_batches(batch_format="pyarrow")
    )
    exid_a = ex_t["id_a"].to_numpy().astype(np.int64)
    exid_b = ex_t["id_b"].to_numpy().astype(np.int64)
    exj = ex_t["jaccard"].to_numpy(zero_copy_only=False)
    key = {(int(x), int(y)): float(j) for x, y, j in zip(exid_a, exid_b, exj)}
    exact = np.array([key[(int(x), int(y))] for x, y in zip(ia, ib)], np.float64)
    return pa.table(
        {
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "est_jaccard": pa.array(np.round(est, 6) + 0.0, pa.float64()),
            "exact_jaccard": pa.array(np.round(exact, 6) + 0.0, pa.float64()),
            "abs_err": pa.array(
                np.round(np.abs(est - exact), 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_assoc_rules_sessions(sf_dir: str) -> pa.Table:
    """Association rules over 30-min sessions (market-basket metrics
    on top of the co-occurrence gate): per unordered type pair,
    support = P(A,B), both directed confidences, and lift = P(A,B)
    / (P(A)·P(B)) — joint counts from ``session_type_pairs``,
    marginals + total from the new ``session_type_singles`` kernel,
    all exact integers until the three divisions."""
    from dcs_ray.functions.windows import session_type_pairs, session_type_singles

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).materialize()
    pairs = pa.concat_tables(
        pa.table(b)
        for b in session_type_pairs(ev).iter_batches(batch_format="pyarrow")
    )
    singles = pa.concat_tables(
        pa.table(b)
        for b in session_type_singles(ev).iter_batches(batch_format="pyarrow")
    )
    sm = {
        t: int(n)
        for t, n in zip(
            singles["event_type"].to_pylist(), singles["n"].to_pylist()
        )
    }
    S = sm.pop("__sessions__")
    ta = pairs["type_a"].to_pylist()
    tb = pairs["type_b"].to_pylist()
    nb = pairs["n"].to_numpy().astype(np.int64)
    rows = []
    for a, b, n in zip(ta, tb, nb):
        na, nbb = sm[a], sm[b]
        rows.append(
            (
                a, b, int(n), na, nbb, S,
                round(int(n) / S, 6) + 0.0,
                round(int(n) / na, 6) + 0.0,
                round(int(n) / nbb, 6) + 0.0,
                round(int(n) * S / (na * nbb), 6) + 0.0,
            )
        )
    rows.sort(key=lambda r: (r[0], r[1]))
    cols = list(zip(*rows))
    return pa.table(
        {
            "type_a": pa.array(cols[0], pa.string()),
            "type_b": pa.array(cols[1], pa.string()),
            "n_both": pa.array(cols[2], pa.int64()),
            "n_a": pa.array(cols[3], pa.int64()),
            "n_b": pa.array(cols[4], pa.int64()),
            "n_sessions": pa.array(cols[5], pa.int64()),
            "support": pa.array(cols[6], pa.float64()),
            "conf_a_to_b": pa.array(cols[7], pa.float64()),
            "conf_b_to_a": pa.array(cols[8], pa.float64()),
            "lift": pa.array(cols[9], pa.float64()),
        }
    )


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _q_profile_orders(sf_dir: str) -> pa.Table:
    """Automated data profiling of the orders table: per column, row
    count, exact distinct count (non-null), and null count — the
    schema-audit report a pipeline runs before trusting a new feed.
    One combiner distinct-fold per column (exchange = |distinct|),
    null counts ride the same pass."""
    from dcs_ray.functions.relational import combiner_groupby

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=_PROFILE_COLS
    ).materialize()
    rows = []
    for col in _PROFILE_COLS:

        def prep(b: pa.Table, _c=col) -> pa.Table:
            vv = b[_c].drop_null()
            if pa.types.is_timestamp(vv.type):
                vv = vv.cast(pa.int64())
            return pa.table(
                {
                    "v": vv,
                    "one": pa.array(np.ones(len(vv), np.int64), pa.int64()),
                }
            )

        def nullcount(b: pa.Table, _c=col) -> pa.Table:
            return pa.table(
                {
                    "z": pa.array([0], pa.int64()),
                    "nn": pa.array([int(b[_c].null_count)], pa.int64()),
                }
            )

        g = pa.concat_tables(
            pa.table(b)
            for b in combiner_groupby(
                orders.map_batches(prep, batch_format="pyarrow"), ["v"], ["one"],
            ).iter_batches(batch_format="pyarrow")
        )
        nn = pa.concat_tables(
            pa.table(b)
            for b in combiner_groupby(
                orders.map_batches(nullcount, batch_format="pyarrow"),
                ["z"], ["nn"],
            ).iter_batches(batch_format="pyarrow")
        )
        n_null = int(nn["nn"].to_numpy().sum())
        rows.append(
            (col, int(g["one"].to_numpy().sum()) + n_null, len(g), n_null)
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "column_name": pa.array(cols[0], pa.string()),
            "n_rows": pa.array(cols[1], pa.int64()),
            "n_distinct": pa.array(cols[2], pa.int64()),
            "n_null": pa.array(cols[3], pa.int64()),
        }
    ).sort_by("column_name")


def _q_label_centroid_drift(sf_dir: str) -> pa.Table:
    """Embedding-space drift audit: per label, the cosine between the
    mean vector of EVEN vec_ids and of ODD vec_ids (two deterministic
    'snapshots' of the same population — cosine ≈ 1 means the halves
    agree; a drop flags drift/contamination). One streaming pass emits
    ≤ 2·|labels| (label, parity, Σvec, n) partials; cosines are 2·d
    driver floats."""
    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial(b: pa.Table) -> pa.Table:
        from dcs_ray.functions.kmeans import _emb_f64

        E = _emb_f64(b["embedding"])
        lab = b["label"].to_numpy().astype(np.int64)
        par = b["vec_id"].to_numpy().astype(np.int64) % 2
        key = lab * 2 + par
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros((len(uk), E.shape[1]), np.float64)
        np.add.at(sums, inv, E)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(n, pa.int64()),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    from dcs_ray.functions.kmeans import _emb_f64

    keys = rows["key"].to_numpy().astype(np.int64)
    S = _emb_f64(rows["s"])
    ns = rows["n"].to_numpy().astype(np.int64)
    d = S.shape[1]
    out = {}
    for k in np.unique(keys):
        m = keys == k
        sub = S[m]
        order = np.lexsort(tuple(sub[:, j] for j in range(d - 1, -1, -1)))
        out[int(k)] = (sub[order].sum(axis=0), int(ns[m].sum()))
    labels = sorted({k // 2 for k in out})
    rws = []
    for lb in labels:
        se, ne = out.get(lb * 2, (np.zeros(d), 0))
        so, no = out.get(lb * 2 + 1, (np.zeros(d), 0))
        if ne == 0 or no == 0:
            continue
        me, mo = se / ne, so / no
        cos = float(
            (me * mo).sum()
            / (np.sqrt((me * me).sum()) * np.sqrt((mo * mo).sum()))
        )
        rws.append((lb, ne, no, round(cos, 6) + 0.0))
    cols = list(zip(*rws))
    return pa.table(
        {
            "label": pa.array(cols[0], pa.int64()),
            "n_even": pa.array(cols[1], pa.int64()),
            "n_odd": pa.array(cols[2], pa.int64()),
            "cosine": pa.array(cols[3], pa.float64()),
        }
    )


def _q_dup_rate_by_source(sf_dir: str) -> pa.Table:
    """Exact-duplicate rate per source feed (the dedup REPORT next to
    the dedup operator): docs, distinct contents, and 1 − unique/total
    per source. Content hashes via the word-wise 64-bit kernel; the
    exchange is |source × distinct hash| combiner rows, text never
    shuffles."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.textstats import content_hash_rows

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def prep(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b["text"]).astype(np.int64)
        return pa.table({"source": b["source"], "h": pa.array(h, pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"), ["source", "h"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    src = g["source"].to_numpy(zero_copy_only=False)
    c = g["c"].to_numpy().astype(np.int64)
    us, inv = np.unique(src, return_inverse=True)
    n = np.zeros(len(us), np.int64)
    np.add.at(n, inv, c)
    uq = np.zeros(len(us), np.int64)
    np.add.at(uq, inv, 1)
    return pa.table(
        {
            "source": pa.array([str(x) for x in us], pa.string()),
            "n_docs": pa.array(n, pa.int64()),
            "n_unique": pa.array(uq, pa.int64()),
            "dup_rate": pa.array(
                np.round(1.0 - uq.astype(np.float64) / n.astype(np.float64), 6)
                + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_ngram_dup_rate(sf_dir: str) -> pa.Table:
    """Corpus 8-gram duplication rate (Lee et al. '22's train-set
    memorization metric): the share of 8-token windows whose gram
    occurs more than once corpus-wide. Windows hash through the
    existing polynomial shingle kernel (n=8); the exchange is
    |distinct gram| combiner rows — window text never moves."""
    from dcs_ray.functions.dedup import _shingle_hashes
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])

    def prep(b: pa.Table) -> pa.Table:
        sh, _off = _shingle_hashes(b["text"], n=8)
        return pa.table({"h": pa.array(sh.astype(np.int64), pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"), ["h"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    c = g["c"].to_numpy().astype(np.int64)
    n_windows = int(c.sum())
    n_distinct = len(c)
    n_dup = int(c[c > 1].sum())
    return pa.table(
        {
            "n_windows": pa.array([n_windows], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
            "n_dup_windows": pa.array([n_dup], pa.int64()),
            "dup_rate": pa.array(
                [round(n_dup / n_windows, 6) + 0.0 if n_windows else 0.0],
                pa.float64(),
            ),
        }
    )


def _q_orders_seasonality(sf_dir: str) -> pa.Table:
    """Month-of-year order seasonality: count and exact-cents volume
    per calendar month — the calendar companion to the day-of-week
    event profile, over the orders fact table. One 12-row combiner
    fold; month extraction is vectorized datetime64 arithmetic."""
    from dcs_ray.functions.relational import combiner_groupby

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.int64()).to_numpy()
        months = (
            us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        )
        month = (months % 12) + 1
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "month": pa.array(month, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            orders.map_batches(prep, batch_format="pyarrow"),
            ["month"], ["cents"], count_col="n_orders",
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["month", "n_orders", "cents"]).sort_by("month")


def _q_shard_balance(sf_dir: str) -> pa.Table:
    """Shard-routing audit (J8/S6 made inspectable): per merged shard,
    the doc count and id range straight from the index's own
    doc_meta — and the ORACLE recomputes the full routing chain from
    raw documents (range partition span, per-partition posting
    weights, the greedy posting-balanced prefix split of
    ``merge.plan_shards``), so the deterministic placement contract is
    hash-gated end to end."""
    from dcs_ray.search import _open, shard_paths

    idx = _index_dir(sf_dir, "words")
    rows = []
    for sid, path in enumerate(shard_paths(idx)):
        seg = _open(path)
        ids = np.asarray(seg.doc_ids, dtype=np.int64)
        rows.append((sid, len(ids), int(ids.min()), int(ids.max())))
    cols = list(zip(*rows))
    return pa.table(
        {
            "shard_id": pa.array(cols[0], pa.int64()),
            "n_docs": pa.array(cols[1], pa.int64()),
            "min_doc": pa.array(cols[2], pa.int64()),
            "max_doc": pa.array(cols[3], pa.int64()),
        }
    )


def _q_dedup_method_agreement(sf_dir: str) -> pa.Table:
    """Cross-method dedup audit: how much the SimHash (hamming ≤ 3)
    and MinHash-LSH candidate-pair sets agree — the measurement that
    decides which near-dup detector (or both) a curation pipeline
    runs. Both pair generators run their normal distributed paths;
    the set comparison is |pairs| driver rows."""
    from dcs_ray.functions.dedup import (
        minhash_candidate_pairs,
        simhash_near_dup_pairs,
    )

    docs = _docs(sf_dir).materialize()

    def pair_set(ds: ray.data.Dataset) -> set:
        t = pa.concat_tables(
            pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
        )
        if len(t) == 0:
            return set()
        a = t["id_a"].to_numpy().astype(np.int64)
        b = t["id_b"].to_numpy().astype(np.int64)
        return set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))

    sim = pair_set(simhash_near_dup_pairs(docs, max_hamming=3))
    mh = pair_set(minhash_candidate_pairs(docs))
    both = sim & mh
    union = sim | mh
    return pa.table(
        {
            "n_simhash_pairs": pa.array([len(sim)], pa.int64()),
            "n_minhash_pairs": pa.array([len(mh)], pa.int64()),
            "n_both": pa.array([len(both)], pa.int64()),
            "agreement_jaccard": pa.array(
                [round(len(both) / len(union), 6) + 0.0 if union else 1.0],
                pa.float64(),
            ),
        }
    )


def _q_capture_recapture_users(sf_dir: str) -> pa.Table:
    """Chapman capture–recapture estimate of the user population from
    the two timeline halves treated as independent samples: N̂ =
    (n₁+1)(n₂+1)/(m+1) − 1 with m the users seen in BOTH — the
    coverage estimator for 'how many users does the telemetry miss'.
    Reuses the churn gate's presence-flag fold (exchange = |users|)."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"), ["user_id"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64) > 0
    s = g["s"].to_numpy().astype(np.int64) > 0
    n1, n2, m = int(f.sum()), int(s.sum()), int((f & s).sum())
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    return pa.table(
        {
            "n_first": pa.array([n1], pa.int64()),
            "n_second": pa.array([n2], pa.int64()),
            "n_both": pa.array([m], pa.int64()),
            "n_observed": pa.array([len(g)], pa.int64()),
            "chapman_estimate": pa.array(
                [round(nhat, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_negbin_overdispersion(sf_dir: str) -> pa.Table:
    """Method-of-moments negative-binomial fit of events-per-user
    (the overdispersed count model behind per-user activity): sample
    mean/variance from exact integer sums, r = m²/(v−m), p = m/v —
    with the VMR as the dispersion verdict. Exchange = |users|."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"].cast(pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], [],
            count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    n = g["n"].to_numpy().astype(np.int64)
    k = len(n)
    s1 = int(n.sum())
    s2 = int((n * n).sum())
    mean = s1 / k
    var = s2 / k - mean * mean  # population variance, exact-int moments
    vmr = var / mean
    over = var > mean
    r = mean * mean / (var - mean) if over else 0.0
    p = mean / var if over else 0.0
    return pa.table(
        {
            "n_users": pa.array([k], pa.int64()),
            "mean_events": pa.array([round(mean, 6) + 0.0], pa.float64()),
            "var_events": pa.array([round(var, 6) + 0.0], pa.float64()),
            "vmr": pa.array([round(vmr, 6) + 0.0], pa.float64()),
            "nb_r": pa.array([round(r, 6) + 0.0], pa.float64()),
            "nb_p": pa.array([round(p, 6) + 0.0], pa.float64()),
        }
    )


def _q_bm25_tiered(sf_dir: str) -> pa.Table:
    """Two-tier serving gate (the dcs serving-economics shape): a head
    query (any term's df > m) must fall back to the FULL tier and
    return the bit-identical BM25 top-10, while a tail query (all dfs
    ≤ m — here an out-of-vocab term, df 0) is served by the pruned
    tier; the routing counters ride along as gated columns, so a
    routing regression fails the hash."""
    from dcs_ray.index.prune import prune_index
    from dcs_ray.service import TieredSearchService

    idx = _index_dir(sf_dir, "words")
    out = idx + "_pruned32"
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        prune_index(idx, out, m=32)
    with TieredSearchService(idx, out) as svc:
        t = svc.search([BM25_QUERY, "zzzznotaterm"], k=10)
        info = svc.routing_info()
    qid = t["query_id"].to_numpy(zero_copy_only=False)
    head = t.filter(pa.array(qid == 0))
    n = len(head)
    return pa.table(
        {
            "rank": head["rank"].cast(pa.int64()),
            "doc_id": head["doc_id"].cast(pa.int64()),
            "score": pa.array(
                np.round(head["score"].to_numpy(), 6) + 0.0, pa.float64()
            ),
            "route": pa.array(["full"] * n, pa.string()),
            "full_served": pa.array([info["full_served"]] * n, pa.int64()),
            "pruned_served": pa.array([info["pruned_served"]] * n, pa.int64()),
        }
    )


def _upd_index(sf_dir: str) -> str:
    """Build-once words index whose partition 0 was incrementally
    REPLACED (every doc_id % 97 == 0 in the span gains ' spark') —
    shared setup of the update/reshard gates."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max, update_partition

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_upd")
    marker = os.path.join(out, ".updated")
    id_max = parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id")
    n_parts = 8
    span = (id_max + n_parts) // n_parts
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=n_parts, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=id_max,
            ),
        )
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        ids = t["doc_id"].to_numpy().astype(np.int64)
        keep = ids < span  # partition 0's id range
        p0 = t.filter(pa.array(keep))
        pids = p0["doc_id"].to_numpy().astype(np.int64)
        suffix = pa.array(
            np.where(pids % 97 == 0, " spark", "").tolist(), pa.string()
        )
        new_text = pc.binary_join_element_wise(
            p0["text"].combine_chunks().cast(pa.string()), suffix, ""
        )
        update_partition(
            out, 0, pa.table({"doc_id": p0["doc_id"], "text": new_text})
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _rank_table(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(
                np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_index_update_search(sf_dir: str) -> pa.Table:
    """Incremental-update gate (M3 through the driver, not just
    pytest): build a fresh words index, REPLACE partition 0 with
    modified content, re-merging only the affected shard — then BM25
    must rank against the MODIFIED corpus, which the oracle replays by
    applying the same text edit before the scoring chain."""
    from dcs_ray.search import search_bm25

    return _rank_table(search_bm25(_upd_index(sf_dir), [BM25_QUERY], k=10))


def _q_reshard_search(sf_dir: str) -> pa.Table:
    """Reshard gate (the dcs-reshard flow): the updated index re-merges
    its segments into FOUR shards (posting-balanced plan, atomic
    shards/ swap, no corpus-scale rebuild) and BM25 over the resharded
    index must stay rank-identical — same oracle corpus as the update
    gate, plus the new shard count as a gated column."""
    from dcs_ray.index.build import load_manifest, reshard
    from dcs_ray.search import search_bm25

    out = _upd_index(sf_dir)
    if load_manifest(out)["num_shards"] != 4:
        reshard(out, 4)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column("n_shards", pa.array([4] * len(t), pa.int64()))


def _words_index_fresh(sf_dir: str, suffix: str) -> str:
    """Build-once 8-partition words index under its own cache dir —
    shared setup of the tombstone-delete gates (they mutate index state,
    so each gate owns a private copy)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_{suffix}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        id_max = parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id")
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=id_max,
            ),
        )
    return out


def _q_incremental_crawl_search(sf_dir: str) -> pa.Table:
    """Continuous-crawl composition gate — the full lifecycle in one
    flow. Day-1 index holds the STALE crawl of every ``doc_id % 50 == 0``
    url (the pages synthesis' first-snapshot halves) and the current
    crawl of everything else; day 2's recrawl arrives as tombstone
    deletes of the stale docs, a physical compaction, and an NRT delta
    add of the fresh texts under NEW ids (``mx + 1 + old_id // 50`` —
    pure arithmetic so the oracle replays the remap). BM25 must then be
    rank-identical to a batch build of the final corpus state."""
    import json as _json

    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.deletes import compact_deletes, delete_docs
    from dcs_ray.index.nrt import add_docs
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_incr")
    marker = os.path.join(out, ".recrawled")
    if not os.path.exists(marker):
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_numpy()
        mx = int(ids.max())
        changed = ids % 50 == 0
        texts = tbl["text"].to_pylist()
        day1 = pa.table(
            {
                "doc_id": tbl["doc_id"],
                "text": pa.array(
                    [
                        t[: max(1, len(t) // 2)] if c else t
                        for t, c in zip(texts, changed)
                    ],
                    pa.string(),
                ),
            }
        )
        build_index(
            ray.data.from_arrow(day1), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=mx,
            ),
        )
        old_ids = ids[changed]
        delete_docs(out, old_ids.astype(np.uint64))
        compact_deletes(out)
        fresh = pa.table(
            {
                "doc_id": pa.array(mx + 1 + old_ids // 50, pa.int64()),
                "text": tbl.filter(pa.array(changed))["text"],
            }
        )
        add_docs(out, fresh)
        with open(marker, "w") as f:
            _json.dump({"n_changed": int(changed.sum())}, f)
    with open(marker) as f:
        n_changed = _json.load(f)["n_changed"]
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_changed", pa.array([n_changed] * len(t), pa.int64())
    )


def _q_fetch_schedule(sf_dir: str) -> pa.Table:
    """Crawl-scheduler gate: the frontier (newest crawl per url) gets a
    politeness-partitioned fetch plan — slot = rank within host, fetch
    order (slot, host, url), so wave 0 touches every host once. First
    60 fetches gated; the oracle replays the url synthesis and the
    per-host row_number."""
    from dcs_ray.functions.urls import fetch_schedule
    from dcs_ray.sources.pages import dedup_latest_crawl, read_pages

    sched = fetch_schedule(dedup_latest_crawl(read_pages(sf_dir)))
    t = pa.concat_tables(
        pa.table(b) for b in sched.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by(
        [("slot", "ascending"), ("host", "ascending"), ("url", "ascending")]
    ).slice(0, 60)


def _q_cori_collection_ranking(sf_dir: str) -> pa.Table:
    """Federated-search gate: CORI collection selection (Callan '95)
    over three source-sharded sub-indexes — belief per collection from
    vocab-thin df/cw metadata only, no document reads; the oracle
    recomputes df/cw per source group and replays the T·I arithmetic."""
    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import cori_collection_scores

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    dirs = []
    for g in range(3):
        out = os.path.join(_CACHE_ROOT, f"{name}_words_cori{g}")
        dirs.append(out)
        if os.path.exists(os.path.join(out, "MANIFEST.json")):
            continue
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        grp = np.array(
            [int(s[3:]) % 3 for s in tbl["source"].to_pylist()], np.int64
        )
        sub = tbl.filter(pa.array(grp == g)).drop_columns(["source"])
        build_index(
            ray.data.from_arrow(sub), out,
            IndexConfig(
                num_partitions=4, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False,
            ),
        )
    return cori_collection_scores(dirs, BM25_QUERY)


def _q_redirect_terminals(sf_dir: str) -> pa.Table:
    """Redirect-chain resolution gate (pointer doubling, Wyllie '79
    shortcutting): a synthetic HTTP-redirect map ``d → d//2`` for every
    ``d % 3 == 0, d > 0`` creates chains up to ~log₂(N) hops; the
    doubled map resolves every doc to its terminal in one broadcast
    probe pass, and the top-20 redirect sinks are gated. Oracle: six
    MATERIALIZED doubling self-joins (1 → 64-hop reach)."""
    import pyarrow.parquet as pq

    from dcs_ray.functions.graph import resolve_redirects

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    src = np.sort(ids[(ids % 3 == 0) & (ids > 0)].astype(np.int64))
    res = resolve_redirects(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        "doc_id", src, src // 2, n_rounds=6,
    )

    def partial(b: pa.Table) -> pa.Table:
        t, c = np.unique(b["terminal_id"].to_numpy(), return_counts=True)
        return pa.table(
            {"terminal_id": pa.array(t, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    parts = pa.concat_tables(
        pa.table(b)
        for b in res.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    g = (
        parts.group_by("terminal_id")
        .aggregate([("n", "sum")])
        .sort_by([("n_sum", "descending"), ("terminal_id", "ascending")])
        .slice(0, 20)
    )
    return pa.table(
        {
            "terminal_id": g["terminal_id"],
            "n_docs": g["n_sum"].cast(pa.int64()),
        }
    )


def _q_team_draft_interleave(sf_dir: str) -> pa.Table:
    """Online ranker-comparison gate: team-draft interleaving of the
    BM25 and Dirichlet-QL top-10s (Radlinski '08) — every pick decision
    (balance, exhaustion, splitmix coin on ties) replayed as unrolled
    SQL rounds over both ranking chains."""
    from dcs_ray.functions.evaluate import team_draft_interleave
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    a = search_bm25(idx, [BM25_QUERY], k=10)["doc_id"].to_pylist()
    b = search_lm(idx, [BM25_QUERY], k=10, model="qld", mu=300.0)[
        "doc_id"
    ].to_pylist()
    return team_draft_interleave(a, b, k=10, seed=7)


def _q_query_clarity(sf_dir: str) -> pa.Table:
    """Query-performance-prediction gate: clarity score of the BM25
    top-10 (uniform result-mixture LM vs collection LM, cf from the
    index's own postings) — the whole KL chain replayed in SQL."""
    from dcs_ray.search import query_clarity

    r = query_clarity(
        _index_dir(sf_dir, "words"), BM25_QUERY,
        f"{sf_dir}/documents.parquet", k=10,
    )
    return pa.table(
        {
            "clarity": pa.array([r["clarity"]], pa.float64()),
            "n_vocab": pa.array([r["n_vocab"]], pa.int64()),
            "n_docs": pa.array([r["n_docs"]], pa.int64()),
        }
    )


def _q_passage_best_window(sf_dir: str) -> pa.Table:
    """Passage retrieval gate (Callan '94 fixed-width): for each BM25
    top-10 doc, the 30-token window with the most query-term hits
    (earliest on ties) — all-integer output, replayed in SQL from
    zipped unnest positions with a RANGE-frame window count."""
    import pyarrow.parquet as pq

    from dcs_ray.grep import best_passage_windows
    from dcs_ray.search import search_bm25

    words = _index_dir(sf_dir, "words")
    t = search_bm25(words, [BM25_QUERY], k=10)
    ids = t["doc_id"].to_pylist()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    ).sort_by("doc_id")
    win = best_passage_windows(docs["text"], ["join", "merge", "spark"], window=30)
    by_id = {
        int(d): (s, h)
        for d, s, h in zip(
            docs["doc_id"].to_pylist(),
            win["pass_start"].to_pylist(),
            win["pass_hits"].to_pylist(),
        )
    }
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "pass_start": pa.array([by_id[int(i)][0] for i in ids], pa.int64()),
            "pass_hits": pa.array([by_id[int(i)][1] for i in ids], pa.int64()),
        }
    )


def _q_query_string_extended(sf_dir: str) -> pa.Table:
    """Extended-grammar gate: ``+required`` posting membership and a
    negated exact phrase (``-"spark merge"``) compose with plain BM25
    terms — required/negated membership evaluates per shard, the
    negated phrase via the positional pre-pass. Oracle: tokenized
    EXISTS for the + operator, instr() = 0 for the negated phrase."""
    from dcs_ray.search import search_query

    raw = 'join batch value +window -"spark merge"'
    return _rank_table(
        search_query(
            _index_dir(sf_dir, "words"), raw, k=10,
            phrase_index_dir=_index_dir(sf_dir, "trigram"),
        )
    )


def _q_bm25_clustered_prune(sf_dir: str) -> pa.Table:
    """Zone-map shard pruning gate: doc ids REASSIGNED in (source,
    doc_id) order so id-range partitions align with sources, then a
    ``source:src0`` filtered BM25 — the driver plans the fan-out from
    shard-lineage zone maps and scans ONLY the shards whose value sets
    can match (``search.prune_shards``). The oracle replays the id
    remap, the posting-balanced 2-shard split, and counts the shards
    that actually hold src0 docs (= what exact zone maps scan)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import prune_shards, search_bm25, shard_paths

    import pyarrow.parquet as pq

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_srccluster")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ).sort_by([("source", "ascending"), ("doc_id", "ascending")])
        remapped = pa.table(
            {
                "doc_id": pa.array(np.arange(len(tbl), dtype=np.int64)),
                "text": tbl["text"],
                "source": tbl["source"],
            }
        )
        build_index(
            ray.data.from_arrow(remapped), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, meta_cols=("source",),
            ),
        )
    filters = {"include": {"source": ["src0"]}}
    scanned = len(prune_shards(shard_paths(out), filters))
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10, filters=filters))
    return t.append_column(
        "n_shards_scanned", pa.array([scanned] * len(t), pa.int64())
    )


def _q_query_string_search(sf_dir: str) -> pa.Table:
    """Unified query-string gate (the dcs-web front door): ONE raw query
    exercising the whole grammar — BM25 terms, an exact-phrase
    constraint resolved by a positional pre-pass on the trigram index,
    a per-shard posting-membership negation (``-window``, no driver id
    list), and a keyword exclusion (``-source:src5``). The oracle
    replays each operator: instr() for the phrase, a tokenized NOT-IN
    for the negation, the meta inequality, full-corpus BM25 stats."""
    from dcs_ray.search import search_query

    raw = 'join batch value "spark merge" -window -source:src5'
    return _rank_table(
        search_query(
            _index_dir(sf_dir, "words"), raw, k=10,
            phrase_index_dir=_index_dir(sf_dir, "trigram"),
        )
    )


def _q_nrt_add_search(sf_dir: str) -> pa.Table:
    """NRT-add gate (``index/nrt.py``, Lucene flush model): the index is
    built over the oldest 60% of doc ids, then the remaining 40% arrive
    as TWO delta-segment adds — BM25 over main + deltas must be
    rank-identical (scores included) to the full-corpus oracle chain,
    because df/N/avgdl recompute exactly on every add."""
    import json as _json

    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.nrt import add_docs
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_nrt")
    marker = os.path.join(out, ".nrt_added")
    if not os.path.exists(marker):
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = np.sort(tbl["doc_id"].to_numpy())
        cut1 = int(ids[int(len(ids) * 0.6)])
        cut2 = int(ids[int(len(ids) * 0.8)])
        col = tbl["doc_id"].to_numpy()
        build_index(
            ray.data.from_arrow(tbl.filter(pa.array(col < cut1))), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False,
            ),
        )
        add_docs(out, tbl.filter(pa.array((col >= cut1) & (col < cut2))))
        info = add_docs(out, tbl.filter(pa.array(col >= cut2)))
        with open(marker, "w") as f:
            _json.dump(info, f)
    with open(marker) as f:
        info = _json.load(f)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_delta_segments",
        pa.array([int(info["n_delta_segments"])] * len(t), pa.int64()),
    )


def _q_delete_search(sf_dir: str) -> pa.Table:
    """Tombstone-delete gate (Lucene live-docs model,
    ``index/deletes.py``): the query's pre-delete #1 doc plus a
    partition-0 id band are tombstoned — NO segment byte changes — and
    BM25 must exclude them while survivors keep their PRE-delete scores
    (df/N/avgdl still count the dead until compaction), which the oracle
    replays by scoring over the full corpus and filtering the dead set
    AFTER scoring."""
    from dcs_ray.index.deletes import delete_docs, load_tombstones
    from dcs_ray.search import search_bm25

    out = _words_index_fresh(sf_dir, "del")
    marker = os.path.join(out, ".deleted")
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        top1 = search_bm25(out, [BM25_QUERY], k=1)["doc_id"][0].as_py()
        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        span = (int(ids.max()) + 8) // 8
        band = ids[(ids < span) & (ids % 5 == 2)]
        delete_docs(out, np.append(band.astype(np.uint64), np.uint64(top1)))
        with open(marker, "w") as f:
            f.write("ok")
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    n = int(len(load_tombstones(out)))
    return t.append_column("n_tombstones", pa.array([n] * len(t), pa.int64()))


def _q_delete_compact_search(sf_dir: str) -> pa.Table:
    """Compaction gate: a partition-0 id band is tombstoned then
    PHYSICALLY compacted (only the one affected partition's segments
    rewrite, only its shard re-merges, corpus stats recompute) — ranking
    must now equal a fresh build of the surviving corpus, so the oracle
    recomputes the whole BM25 chain (df, N, avgdl included) over the
    survivors. ``n_compacted_parts`` gates the partition isolation."""
    import json as _json

    from dcs_ray.index.deletes import compact_deletes, delete_docs
    from dcs_ray.search import search_bm25

    out = _words_index_fresh(sf_dir, "delc")
    marker = os.path.join(out, ".compacted")
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        span = (int(ids.max()) + 8) // 8
        band = ids[(ids < span) & (ids % 5 == 2)]
        delete_docs(out, band.astype(np.uint64))
        info = compact_deletes(out)
        with open(marker, "w") as f:
            _json.dump(info, f)
    with open(marker) as f:
        info = _json.load(f)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_compacted_parts",
        pa.array([int(info["n_compacted_partitions"])] * len(t), pa.int64()),
    )


def _q_bm25_codec_variant(sf_dir: str, codec: str) -> pa.Table:
    """Cross-codec rank-identity gate: the same corpus built with a
    DIFFERENT posting-body codec must return the bit-identical BM25
    top-10 (dcs's varint→TurboPFor migration contract, C1/C2: codecs
    change bytes, never ranks)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_{codec}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, codec=codec,
            ),
        )
    return _rank_table(search_bm25(out, [BM25_QUERY], k=10))


def _q_df_histogram(sf_dir: str) -> pa.Table:
    """Posting-list-size distribution straight from the index's own
    vocab artifact (S9's ``stats/df.parquet``): terms and postings per
    ⌊log2 df⌋ bucket — the shape that sizes posting-block and cache
    budgets. The oracle recomputes df from raw text, so the artifact
    itself is hash-gated."""
    idx = _index_dir(sf_dir, "words")
    dft = ray.data.read_parquet(os.path.join(idx, "stats", "df.parquet"))

    def bucketize(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy().astype(np.int64)
        pow2 = 1 << np.arange(1, 63, dtype=np.int64)
        bucket = np.searchsorted(pow2, df, side="right").astype(np.int64)
        ub, inv = np.unique(bucket, return_inverse=True)
        terms = np.zeros(len(ub), np.int64)
        np.add.at(terms, inv, 1)
        posts = np.zeros(len(ub), np.int64)
        np.add.at(posts, inv, df)
        return pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n_terms": pa.array(terms, pa.int64()),
                "n_postings": pa.array(posts, pa.int64()),
            }
        )

    from dcs_ray.functions.relational import combiner_groupby

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            dft.map_batches(bucketize, batch_format="pyarrow"),
            ["bucket"], ["n_terms", "n_postings"],
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["bucket", "n_terms", "n_postings"]).sort_by("bucket")


def _q_prune_report(sf_dir: str) -> pa.Table:
    """Prune-job accounting: postings in the full index vs its m=32
    pruned generation, measured from BOTH generations' own term_dict
    artifacts — and the oracle recomputes Σdf and Σmin(df, 32) from
    raw text, so the global top-m cut's arithmetic is gated end to
    end."""
    import pyarrow.parquet as pq

    from dcs_ray.index.prune import prune_index
    from dcs_ray.search import shard_paths

    idx = _index_dir(sf_dir, "words")
    pruned = idx + "_pruned32"
    if not os.path.exists(os.path.join(pruned, "MANIFEST.json")):
        prune_index(idx, pruned, m=32)

    def totals(index_dir: str) -> tuple[int, int]:
        n_terms, n_post = {}, 0
        for p in shard_paths(index_dir):
            td = pq.read_table(
                os.path.join(p, "term_dict.parquet"), columns=["term", "df"]
            )
            for term, df in zip(
                td["term"].to_pylist(), td["df"].to_numpy().astype(np.int64)
            ):
                n_terms[term] = n_terms.get(term, 0) + int(df)
        return len(n_terms), sum(n_terms.values())

    vocab_full, post_full = totals(idx)
    vocab_pruned, post_pruned = totals(pruned)
    return pa.table(
        {
            "n_terms_full": pa.array([vocab_full], pa.int64()),
            "n_terms_pruned": pa.array([vocab_pruned], pa.int64()),
            "postings_full": pa.array([post_full], pa.int64()),
            "postings_pruned": pa.array([post_pruned], pa.int64()),
            "kept_ratio": pa.array(
                [round(post_pruned / post_full, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_hll_error_audit(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit for HLL (the trilogy next to the quantile
    and MinHash error gates): the p=12 estimate next to the exact
    distinct-user count with absolute and relative error — what says
    whether 4 KB of registers may replace the exact |users| exchange
    at 100×. Both sides fold distributed."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.sketches import approx_distinct_hll

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).materialize()
    est, _ = approx_distinct_hll(ev, "user_id", p=12)
    est_r = round(est, 6)
    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(
                lambda b: pa.table({"user_id": b["user_id"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            ["user_id"], [],
        ).iter_batches(batch_format="pyarrow")
    )
    n = len(g)
    return pa.table(
        {
            "n_exact": pa.array([n], pa.int64()),
            "estimate": pa.array([est_r + 0.0], pa.float64()),
            "abs_err": pa.array([round(abs(est_r - n), 6) + 0.0], pa.float64()),
            "rel_err": pa.array(
                [round(abs(est_r - n) / n, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_cms_error_audit(sf_dir: str) -> pa.Table:
    """Count-min overcount audit: the sketch's top-3 event-type
    estimates next to the exact counts — CMS never undercounts, so
    the gated ``overcount`` column is also a structural invariant
    (negative would mean a broken fold). Sketch and exact folds are
    both constant-size exchanges."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.sketches import cms_heavy_hitters

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type"]
    ).materialize()
    cms = cms_heavy_hitters(ev, "event_type", k=3)
    ex = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(ev, ["event_type"], [], count_col="n")
        .iter_batches(batch_format="pyarrow")
    )
    exact = {
        t: int(n)
        for t, n in zip(ex["event_type"].to_pylist(), ex["n"].to_pylist())
    }
    types = cms["event_type"].to_pylist()
    ests = cms["n_est"].to_numpy().astype(np.int64)
    rows = sorted(
        (t, int(e), exact[t], int(e) - exact[t]) for t, e in zip(types, ests)
    )
    cols = list(zip(*rows))
    return pa.table(
        {
            "event_type": pa.array(cols[0], pa.string()),
            "cms_count": pa.array(cols[1], pa.int64()),
            "exact_count": pa.array(cols[2], pa.int64()),
            "overcount": pa.array(cols[3], pa.int64()),
        }
    )


def _q_bm25_exhaustive(sf_dir: str) -> pa.Table:
    """Scorer-equivalence gate through the driver: the EXHAUSTIVE
    per-term accumulator (``score_shard_all``) must return the same
    top-10 as the block-max MaxScore path the other BM25 gates run —
    the safety net that keeps the pruned scorer honest forever."""
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    return _rank_table(
        search_bm25(idx, [BM25_QUERY], k=10, method="exhaustive")
    )


def _q_user_rolling_value_7d(sf_dir: str) -> pa.Table:
    """RANGE-frame window: per event, the user's total purchase-plus-
    other value (exact cents) over the trailing 7 DAYS including ts
    peers — the sliding-window feature a fraud/abuse model reads. One
    bucketed per-user lexsort with an integer prefix-sum + vectorized
    searchsorted lower bound; no per-row loop, exchange = |events|
    4-tuples."""
    from dcs_ray.functions.joins import _key_bucket

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    WIN = 7 * 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_key_bucket(uid, 64), pa.int32()),
                "user_id": pa.array(uid, pa.int64()),
                "us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy().astype(np.int64)
        us = g["us"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        cents = g["cents"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, us, u))
        u, us, eid, cents = u[order], us[order], eid[order], cents[order]
        n = len(u)
        new_run = np.ones(n, bool)
        new_run[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new_run) - 1
        cum = np.cumsum(cents)
        prefix = np.concatenate(([0], cum))
        # RANGE frame bounds for ALL users in ONE searchsorted pass:
        # per-run time bands (run_id · HUGE keeps users disjoint, and
        # key − WIN cannot cross a band). Upper bound includes ts peers
        # of the current row (SQL CURRENT ROW in RANGE mode).
        huge = (int(us.max()) - int(us.min()) if n else 0) + WIN + 1
        key = us + run_id * huge
        lo = np.searchsorted(key, key - WIN, side="left")
        hi = np.searchsorted(key, key, side="right")
        out = prefix[hi] - prefix[lo]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "cents_7d": pa.array(out, pa.int64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return t.sort_by("event_id")


def _q_bm25_filtered_exclude(sf_dir: str) -> pa.Table:
    """Negated keyword filter (dcs ``-package:`` syntax): BM25 ranking
    with two sources EXCLUDED via the same in-shard filter path the
    include gate exercises — candidate generation, scoring and the
    per-shard top-k never see the excluded docs."""
    from dcs_ray.queryplan import rewrite_query
    from dcs_ray.search import filters_from_keywords, search_bm25

    q, includes, negates = rewrite_query(
        f"{BM25_QUERY} -source:src0 -source:src1"
    )
    idx = _index_dir(sf_dir, "words")
    t = search_bm25(
        idx, [q], k=10, filters=filters_from_keywords(includes, negates)
    )
    return _rank_table(t)


def _q_service_cache_hit(sf_dir: str) -> pa.Table:
    """Finished-query result cache gate (dcs querymanager's ~30-min
    cache): the SAME query served twice from a resident service — the
    second call must come from the driver-side cache (zero actor round
    trips) with bit-identical results; the hit/miss counters ride as
    gated columns so a cache regression fails the hash."""
    from dcs_ray.service import SearchService

    idx = _index_dir(sf_dir, "words")
    with SearchService(idx) as svc:
        t1 = svc.search([BM25_QUERY], k=10)
        t2 = svc.search([BM25_QUERY], k=10)
        hits, misses = svc.cache_hits, svc.cache_misses
    if not t1.equals(t2):
        raise AssertionError("cached result differs from live result")
    out = _rank_table(t2)
    n = len(out)
    return pa.table(
        {
            "rank": out["rank"],
            "doc_id": out["doc_id"],
            "score": out["score"],
            "cache_hits": pa.array([hits] * n, pa.int64()),
            "cache_misses": pa.array([misses] * n, pa.int64()),
        }
    )


_SQ_DIMS = (1, 17, 33, 49)  # 1-based sampled dims, one per PQ subspace


def _q_sq8_codes(sf_dir: str) -> pa.Table:
    """Scalar (int8-range) quantization of the embedding column — the
    OTHER vector-compression path next to PQ: per-dim [min, max] from
    one streaming min/max fold, code = ⌊(v − lo)/(hi − lo)·255⌋
    clamped to [0, 255]. Codes for four sampled dims (one per PQ
    subspace) are gated per vector — all-integer output, so the gate
    is hash-exact; the per-dim bounds fold is a 2·d exchange."""
    from dcs_ray.functions.kmeans import _emb_f64

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    def minmax(b: pa.Table) -> pa.Table:
        E = _emb_f64(b["embedding"])
        return pa.table(
            {
                "lo": pa.array([E.min(axis=0).tolist()], pa.list_(pa.float64())),
                "hi": pa.array([E.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    mm = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(minmax, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    LO = _emb_f64(mm["lo"]).min(axis=0)
    HI = _emb_f64(mm["hi"]).max(axis=0)
    ref = ray.put((LO.copy(), HI.copy()))

    def codes(b: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        E = _emb_f64(b["embedding"])
        w = hi - lo
        w = np.where(w > 0, w, 1.0)
        c = np.clip(
            np.floor((E - lo[None, :]) / w[None, :] * 255).astype(np.int64),
            0, 255,
        )
        cols = {"vec_id": b["vec_id"].cast(pa.int64())}
        for d in _SQ_DIMS:
            cols[f"code_d{d}"] = pa.array(c[:, d - 1], pa.int64())
        return pa.table(cols)

    t = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(codes, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("vec_id")


def _media_expected_sql() -> str:
    """Expected media-metadata table derived from the SYNTHESIS
    PARAMETERS and header semantics alone (never by running the
    parser) — PNG/GIF 24×16; WAV 2048 samples @16 kHz; FLAC 2048
    @32 kHz; AVI 12 frames @25 fps 16×12; MP4 skeleton duration
    1000+i ms, 320×240, 30+i samples, 1 track; MP3 CBR 128 kbps
    @44.1 kHz with 40+i frames (frame = ⌊144·128000/44100⌋ bytes,
    duration = bytes·8/kbps ms, 1152 samples/frame). Turns the
    metadata extractor's gate from rows-only into a full round-trip
    oracle."""
    rows = []
    mid = 0
    for _ in range(12):
        rows.append((mid, "png", 0, 24, 16, 0, 0, 0)); mid += 1
    for _ in range(12):
        rows.append((mid, "gif", 0, 24, 16, 0, 0, 0)); mid += 1
    for _ in range(12):
        rows.append((mid, "wav", 2048 * 1000 // 16000, 0, 0, 16000, 2048, 0))
        mid += 1
    for _ in range(12):
        rows.append((mid, "flac", 2048 * 1000 // 32000, 0, 0, 32000, 2048, 0))
        mid += 1
    for _ in range(6):
        rows.append((mid, "avi", 40000 * 12 // 1000, 16, 12, 0, 12, 0))
        mid += 1
    for i in range(6):
        rows.append((mid, "mp4", 1000 + i, 320, 240, 0, 30 + i, 1)); mid += 1
    fb = 144 * 128000 // 44100
    for i in range(6):
        nf = 40 + i
        rows.append((mid, "mp3", fb * nf * 8 // 128, 0, 0, 44100, nf * 1152, 0))
        mid += 1
    vals = ", ".join(
        f"({m}, '{f}', {d}, {w}, {h}, {sr}, {ns}, {nt})"
        for m, f, d, w, h, sr, ns, nt in rows
    )
    return f"""
SELECT media_id::bigint AS media_id, format,
       duration_ms::bigint AS duration_ms, width::bigint AS width,
       height::bigint AS height, samplerate_hz::bigint AS samplerate_hz,
       n_samples::bigint AS n_samples, n_tracks::bigint AS n_tracks
FROM (VALUES {vals})
     t(media_id, format, duration_ms, width, height, samplerate_hz,
       n_samples, n_tracks)
ORDER BY media_id"""


def _q_image_features_lossless(sf_dir: str) -> pa.Table:
    """REAL image decode, fully ORACLED: PPM + PNG + GIF share one
    modular-arithmetic pixel recipe (GIF palette-quantized //43·43),
    and all three codecs are LOSSLESS — so the per-channel mean/std +
    2×2 luma-grid features replay in SQL straight from the recipe,
    gating the zlib/Paeth PNG and LZW GIF decoders bit-for-bit against
    arithmetic. (The mixed gate with lossy JPEG stays rows-only — a
    lossy decode has no closed-form pixels.) Exploded (media_id, dim,
    val) output, float32-cast then round-6 like the extractor."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_gif_media,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    ppm = synthesize_ppm_media(32)
    png = synthesize_png_media(32)
    png = png.set_column(
        png.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 64), pa.int64()),
    )
    gif = synthesize_gif_media(32)
    gif = gif.set_column(
        gif.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(64, 96), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm, png, gif]))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=32,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("media_id")
    feat = t["feature"].combine_chunks()
    parents = pc.list_parent_indices(feat).to_numpy(zero_copy_only=False)
    flat = feat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t["media_id"].to_numpy().astype(np.int64)
    dim = np.concatenate([np.arange(len(feat[i])) for i in range(len(t))])
    return pa.table(
        {
            "media_id": pa.array(ids[parents], pa.int64()),
            "dim": pa.array(dim.astype(np.int64), pa.int64()),
            "val": pa.array(np.round(flat, 6) + 0.0, pa.float64()),
        }
    )


def _q_video_frames_lossless(sf_dir: str) -> pa.Table:
    """REAL video demux, fully ORACLED: concatenated-PPM streams and
    animated GIFs (both lossless) sampled 4-evenly (frames 0/3/6/9 of
    12), each sampled frame decoded and reduced to EXACT integer
    channel sums — replayed in SQL from the per-frame pixel recipe, so
    the stream indexer, the GIF LZW frame decoder, the sampling rule
    and the timestamp arithmetic are all hash-gated. (The MJPEG AVI
    path stays in the rows-only mixed gate — lossy frames have no
    closed-form pixels.)"""
    from dcs_ray.functions.multimodal import (
        PpmStreamFrameSampler,
        decode_ppm,
        synthesize_gif_video,
        synthesize_ppm_video,
    )

    ppm_v = synthesize_ppm_video(32)
    gif_v = synthesize_gif_video(16)
    gif_v = gif_v.set_column(
        gif_v.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 48), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm_v, gif_v]))

    class SampleAndSum(PpmStreamFrameSampler):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            sums = np.zeros((len(t), 3), np.int64)
            for i, p in enumerate(t["frame"].combine_chunks()):
                img = decode_ppm(p.as_py())
                sums[i] = img.astype(np.int64).sum(axis=(0, 1))
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "frame_idx": t["frame_idx"].cast(pa.int64()),
                    "ts_ms": t["ts_ms"].cast(pa.int64()),
                    "sum_r": pa.array(sums[:, 0], pa.int64()),
                    "sum_g": pa.array(sums[:, 1], pa.int64()),
                    "sum_b": pa.array(sums[:, 2], pa.int64()),
                }
            )

    ds = media.map_batches(
        SampleAndSum, fn_constructor_kwargs={"k": 4}, concurrency=2,
        batch_size=16, batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by(
        [("media_id", "ascending"), ("frame_idx", "ascending")]
    )


def _q_video_frames_mjpeg(sf_dir: str) -> pa.Table:
    """REAL compressed-container video demux, fully ORACLED: MJPEG
    AVIs (RIFF chunk index → per-frame baseline-JPEG decode of ONLY
    the 4 evenly-sampled frames) whose frames are flat closed-form
    color tiles — exact integer channel sums replayed in SQL from the
    DC-only decode chain. Extends the lossless video gate
    (PPM/GIF) to the container shape a real crawl actually serves."""
    from dcs_ray.functions.avi import synthesize_avi_flat_video
    from dcs_ray.functions.multimodal import PpmStreamFrameSampler, decode_ppm

    media = ray.data.from_arrow(synthesize_avi_flat_video(16, frames=12, tiles=2))

    class SampleAndSum(PpmStreamFrameSampler):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            sums = np.zeros((len(t), 3), np.int64)
            for i, p in enumerate(t["frame"].combine_chunks()):
                img = decode_ppm(p.as_py())
                sums[i] = img.astype(np.int64).sum(axis=(0, 1))
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "frame_idx": t["frame_idx"].cast(pa.int64()),
                    "ts_ms": t["ts_ms"].cast(pa.int64()),
                    "sum_r": pa.array(sums[:, 0], pa.int64()),
                    "sum_g": pa.array(sums[:, 1], pa.int64()),
                    "sum_b": pa.array(sums[:, 2], pa.int64()),
                }
            )

    ds = media.map_batches(
        SampleAndSum, fn_constructor_kwargs={"k": 4}, concurrency=2,
        batch_size=16, batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])


def _video_frames_mjpeg_sql() -> str:
    """Per-tile decode-chain replay (same arithmetic as
    ``_image_features_jpeg_sql``) over the SAMPLED frames' tile params,
    folded to exact integer channel sums (64 px per flat tile); ts =
    duration·f/nf with 12 frames at 25 fps."""
    from dcs_ray.functions.avi import avi_flat_tile_params

    take = {j * 12 // 4 for j in range(4)}
    vals = ", ".join(
        f"({m}, {f}, {r}, {g}, {b})"
        for m, f, tix, r, g, b in avi_flat_tile_params(16, frames=12, tiles=2)
        if f in take
    )
    return f"""
WITH src(media_id, f, r0, g0, b0) AS (VALUES {vals}),
enc AS (SELECT media_id, f,
               round(0.299*r0 + 0.587*g0 + 0.114*b0) AS y,
               round(128.0 - 0.168736*r0 - 0.331264*g0 + 0.5*b0) AS cb,
               round(128.0 + 0.5*r0 - 0.418688*g0 - 0.081312*b0) AS cr
        FROM src),
rec AS (SELECT media_id, f, y,
               least(greatest(round(round(8.0*(cb-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS cbh,
               least(greatest(round(round(8.0*(cr-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS crh
        FROM enc),
px AS (SELECT media_id, f,
              least(greatest(round(y + 1.402*(crh-128.0)), 0.0), 255.0) AS r,
              least(greatest(round(y - 0.344136*(cbh-128.0)
                                     - 0.714136*(crh-128.0)), 0.0), 255.0) AS g,
              least(greatest(round(y + 1.772*(cbh-128.0)), 0.0), 255.0) AS b
       FROM rec)
SELECT media_id::bigint AS media_id, f::bigint AS frame_idx,
       (480 * f // 12)::bigint AS ts_ms,
       (64 * sum(r))::bigint AS sum_r, (64 * sum(g))::bigint AS sum_g,
       (64 * sum(b))::bigint AS sum_b
FROM px GROUP BY media_id, f ORDER BY media_id, frame_idx
"""


def _q_image_features_jpeg(sf_dir: str) -> pa.Table:
    """REAL baseline-JPEG decode, fully ORACLED: fixtures are flat
    8×8-tile JPEGs (half greyscale exact-round-trip at quality 50, half
    color 4:4:4 with rejection-screened tile colors) whose decoded
    pixels are a CLOSED FORM of the tile params — so the huffman
    parse, DC prediction, dequant, batched IDCT and YCbCr→RGB all
    hash-gate against pure SQL arithmetic. Closes the gap the lossless
    gate documents ('a lossy decode has no closed-form pixels'): a
    DC-only lossy decode does."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_jpeg_flat_media,
    )

    media = ray.data.from_arrow(synthesize_jpeg_flat_media(32, tiles=4))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=16,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("media_id")
    feat = t["feature"].combine_chunks()
    parents = pc.list_parent_indices(feat).to_numpy(zero_copy_only=False)
    flat = feat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t["media_id"].to_numpy().astype(np.int64)
    dim = np.concatenate([np.arange(len(feat[i])) for i in range(len(t))])
    return pa.table(
        {
            "media_id": pa.array(ids[parents], pa.int64()),
            "dim": pa.array(dim.astype(np.int64), pa.int64()),
            "val": pa.array(np.round(flat, 6) + 0.0, pa.float64()),
        }
    )


def _image_features_jpeg_sql() -> str:
    """SQL replay of the DC-only baseline-JPEG decode chain over the
    fixture tile params (inlined as literals from the same screened
    splitmix stream the synthesizer draws — the `_lsh_assignment_sql`
    precedent), then the mean/std/luma-grid feature arithmetic of the
    lossless gate. Every round() the chain takes is ≥1e-6 from a .5
    boundary by the synthesizer's rejection rule, so DuckDB's
    half-away round and numpy's half-even round agree."""
    from dcs_ray.functions.multimodal import jpeg_media_tile_params

    vals = ", ".join(
        f"({m}, {t}, {'TRUE' if grey else 'FALSE'}, {r}, {g}, {b})"
        for m, t, grey, r, g, b in jpeg_media_tile_params(32, tiles=4)
    )
    return f"""
WITH src(media_id, tix, grey, r0, g0, b0) AS (VALUES {vals}),
enc AS (SELECT media_id, tix, grey, r0,
               round(0.299*r0 + 0.587*g0 + 0.114*b0) AS y,
               round(128.0 - 0.168736*r0 - 0.331264*g0 + 0.5*b0) AS cb,
               round(128.0 + 0.5*r0 - 0.418688*g0 - 0.081312*b0) AS cr
        FROM src),
rec AS (SELECT media_id, tix, grey, r0, y,
               least(greatest(round(round(8.0*(cb-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS cbh,
               least(greatest(round(round(8.0*(cr-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS crh
        FROM enc),
px AS (SELECT media_id, tix,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y + 1.402*(crh-128.0)), 0.0), 255.0)
              END AS r,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y - 0.344136*(cbh-128.0)
                                       - 0.714136*(crh-128.0)), 0.0), 255.0)
              END AS g,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y + 1.772*(cbh-128.0)), 0.0), 255.0)
              END AS b
       FROM rec),
mn AS (SELECT media_id, sum(r)/16.0 AS mr, sum(g)/16.0 AS mg,
              sum(b)/16.0 AS mb FROM px GROUP BY media_id),
sd AS (SELECT px.media_id,
              sqrt(sum((px.r - mn.mr)*(px.r - mn.mr))/16.0) AS sr,
              sqrt(sum((px.g - mn.mg)*(px.g - mn.mg))/16.0) AS sg,
              sqrt(sum((px.b - mn.mb)*(px.b - mn.mb))/16.0) AS sb
       FROM px JOIN mn USING (media_id) GROUP BY px.media_id),
lu AS (SELECT media_id, (tix//4)//2 AS gy, (tix%4)//2 AS gx,
              sum(r*0.299 + g*0.587 + b*0.114)/count(*) AS gm
       FROM px GROUP BY 1, 2, 3),
f AS (
  SELECT media_id, 0::bigint AS dim, mr AS v FROM mn
  UNION ALL SELECT media_id, 1, mg FROM mn
  UNION ALL SELECT media_id, 2, mb FROM mn
  UNION ALL SELECT media_id, 3, sr FROM sd
  UNION ALL SELECT media_id, 4, sg FROM sd
  UNION ALL SELECT media_id, 5, sb FROM sd
  UNION ALL SELECT media_id, (6 + gy * 2 + gx)::bigint, gm FROM lu)
SELECT media_id::bigint AS media_id, dim,
       round(CAST(v AS FLOAT)::double, 6) + 0.0 AS val
FROM f ORDER BY media_id, dim
"""


def _q_pagerank_convergence(sf_dir: str) -> pa.Table:
    """Convergence monitor for the iterative web-rank job: the L1
    distance between successive (round-6) PageRank vectors for
    iterations 1..5 — the number an operator watches to decide when a
    100-TB rank job may stop early. Each prefix run reuses the normal
    streaming-edges engine; the oracle diffs the r{i} relations of the
    single replay chain."""
    from dcs_ray.functions.links import link_pagerank

    edges = _link_edges_ds(sf_dir).materialize()
    prev = None
    rows = []
    for i in range(1, 6):
        t = link_pagerank(edges, n_iter=i, damping=0.85).sort_by("node")
        r = t["rank"].to_numpy(zero_copy_only=False)
        if prev is None:
            n = len(r)
            prev = np.full(n, round(1.0 / n, 6))
        delta = float(np.abs(r - prev).sum())
        rows.append((i, round(delta, 6) + 0.0))
        prev = r
    cols = list(zip(*rows))
    return pa.table(
        {
            "iteration": pa.array(cols[0], pa.int64()),
            "l1_delta": pa.array(cols[1], pa.float64()),
        }
    )


def _pagerank_convergence_sql(k: int = 5, d: float = 0.85) -> str:
    parts = []
    for i in range(1, k + 1):
        parts.append(
            f"""SELECT {i}::bigint AS iteration,
       round(sum(abs(round(a.r, 6) - round(b.r, 6))), 6) + 0.0 AS l1_delta
FROM r{i} a JOIN r{i - 1} b USING (node)"""
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        "WITH "
        + _pagerank_ctes(k, d, _LINK_EDGES_CTE)
        + f"\nSELECT * FROM ({body}) ORDER BY iteration"
    )


def _q_funnel_within_1h(sf_dir: str) -> pa.Table:
    """WINDOWED conversion funnel: view → click → purchase where every
    next step must land within ONE HOUR of the previous step's time
    (strictly later, earliest eligible) — the 'convert within the
    session hour' product metric the unconstrained funnel gate can't
    answer. Same bucketed lexsort/reduceat kernel, one extra vectorized
    gap mask."""
    from dcs_ray.functions.windows import funnel_steps

    ds = funnel_steps(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        ),
        steps=["view", "click", "purchase"],
        max_gap_us=3_600_000_000,
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by("user_id")


def _q_top2_versions_per_source(sf_dir: str) -> pa.Table:
    """Snapshot retention policy (J7 generalized): keep the TWO newest
    Debian-version snapshots per source ('current + previous', the
    rollback rule a crawl archive runs), comparator-ordered with max-id
    tie-break and a gated 1-based version_rank."""
    from dcs_ray.versions import top_n_versions_per_key

    def with_version(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        ver = [
            f"{i % 4}.{i % 10}" + ("~rc1" if i % 3 == 0 else "") for i in ids
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "version": pa.array(ver),
            }
        )

    ds = top_n_versions_per_key(
        _docs(sf_dir).map_batches(with_version, batch_format="pyarrow"),
        "source", "version", n=2,
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    return t.select(["source", "version_rank", "doc_id", "version"]).sort_by(
        [("source", "ascending"), ("version_rank", "ascending")]
    )


def _q_kaplan_meier_churn(sf_dir: str) -> pa.Table:
    """Kaplan–Meier survival curve of TIME-TO-FIRST-PURCHASE (whole
    days from a user's first event; users who never purchase are
    right-CENSORED at their last-seen duration): at each conversion
    time t, n at risk = users with duration ≥ t, dᵢ conversions,
    S(t) = Π(1 − dᵢ/nᵢ) — the survival analysis behind every
    time-to-convert forecast. Per-user (first, first-purchase, last)
    fold through one arrow-group_by partial + groupby min/max; the
    curve is |distinct durations| driver rows. S via exp(Σ ln(1−d/n)),
    the exact expression the SQL window replays."""
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        big = np.iinfo(np.int64).max
        us = b["ts"].cast(pa.int64()).to_numpy()
        isp = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "us": pa.array(us, pa.int64()),
                "pus": pa.array(np.where(isp, us, big), pa.int64()),
            }
        )
        agg = t.group_by(["user_id"]).aggregate(
            [("us", "min"), ("us", "max"), ("pus", "min")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "f": agg["us_min"],
                "l": agg["us_max"],
                "fp": agg["pus_min"],
            }
        )

    from ray.data.aggregate import Max, Min

    ag = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("f"), Max("l"), Min("fp"))
    )
    t = pa.concat_tables(
        pa.table(b) for b in ag.iter_batches(batch_format="pyarrow")
    )
    f = t["min(f)"].to_numpy().astype(np.int64)
    l = t["max(l)"].to_numpy().astype(np.int64)
    fp = t["min(fp)"].to_numpy().astype(np.int64)
    big = np.iinfo(np.int64).max
    converted = fp != big
    dur = np.where(converted, (fp - f) // _US_PER_DAY, (l - f) // _US_PER_DAY)
    event = converted.astype(np.int64)
    death_t = np.unique(dur[event == 1])
    rows = []
    logs = 0.0
    for td in death_t:
        n_risk = int((dur >= td).sum())
        d = int(((dur == td) & (event == 1)).sum())
        logs += float(np.log(1.0 - d / n_risk)) if d < n_risk else -np.inf
        s = float(np.exp(logs))
        rows.append((int(td), n_risk, d, round(s, 6) + 0.0))
    if not rows:
        return pa.table(
            {
                "t_days": pa.array([], pa.int64()),
                "n_at_risk": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "survival": pa.array([], pa.float64()),
            }
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "t_days": pa.array(cols[0], pa.int64()),
            "n_at_risk": pa.array(cols[1], pa.int64()),
            "n_events": pa.array(cols[2], pa.int64()),
            "survival": pa.array(cols[3], pa.float64()),
        }
    )


def _q_ab_test_conversion(sf_dir: str) -> pa.Table:
    """Two-proportion z-test of purchase conversion between the
    user-parity 'experiment arms' (the A/B significance read-out):
    pooled-SE z = (p_A − p_B)/√(p̂(1−p̂)(1/n_A+1/n_B)) — exact integer
    counts until the final floats. One |users| combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        isp = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "p": pa.array(isp.astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], ["p"],
        ).iter_batches(batch_format="pyarrow")
    )
    uid = g["user_id"].to_numpy().astype(np.int64)
    conv = (g["p"].to_numpy().astype(np.int64) > 0).astype(np.int64)
    arm = uid % 2
    nA, nB = int((arm == 0).sum()), int((arm == 1).sum())
    cA = int(conv[arm == 0].sum())
    cB = int(conv[arm == 1].sum())
    pA, pB = cA / nA, cB / nB
    pp = (cA + cB) / (nA + nB)
    se = float(np.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB)))
    z = (pA - pB) / se if se > 0 else 0.0
    return pa.table(
        {
            "n_a": pa.array([nA], pa.int64()),
            "n_b": pa.array([nB], pa.int64()),
            "conv_a": pa.array([cA], pa.int64()),
            "conv_b": pa.array([cB], pa.int64()),
            "p_a": pa.array([round(pA, 6) + 0.0], pa.float64()),
            "p_b": pa.array([round(pB, 6) + 0.0], pa.float64()),
            "z_stat": pa.array([round(z, 6) + 0.0], pa.float64()),
        }
    )


def _q_holt_forecast_daily(sf_dir: str) -> pa.Table:
    """Holt double-exponential forecast of daily event volume (α=1/2,
    β=1/4 — DYADIC smoothing constants, so every level/trend value is
    an exact binary fraction and the recursion replays bit-for-bit in
    a recursive SQL CTE): l₁=x₁, b₁=x₂−x₁, then the standard
    level/trend updates over observed days and a 3-step-ahead linear
    forecast. The distributed part is the |days| fold."""
    c = _daily_event_counts(sf_dir)
    days = c["day"].to_numpy().astype(np.int64)
    ns = c["n"].to_numpy().astype(np.int64)
    order = np.argsort(days)
    x = ns[order].astype(np.float64)
    level = x[0]
    trend = x[1] - x[0]
    for t in range(1, len(x)):
        new_l = 0.5 * x[t] + 0.5 * (level + trend)
        trend = 0.25 * (new_l - level) + 0.75 * trend
        level = new_l
    rows = [
        (
            h,
            round(level + h * trend, 6) + 0.0,
            round(level, 6) + 0.0,
            round(trend, 6) + 0.0,
        )
        for h in (1, 2, 3)
    ]
    cols = list(zip(*rows))
    return pa.table(
        {
            "horizon": pa.array(cols[0], pa.int64()),
            "forecast": pa.array(cols[1], pa.float64()),
            "level": pa.array(cols[2], pa.float64()),
            "trend": pa.array(cols[3], pa.float64()),
        }
    )


def _q_lpa_modularity(sf_dir: str) -> pa.Table:
    """Newman modularity of the LPA communities (the quality score of
    the community gate's own output): Q = Σ_c [m_c/m − (D_c/2m)²] over
    the undirected distinct pair set. Labels broadcast once as a
    sorted array; intra-community edges count in one vectorized pair
    pass; degrees fold through the combiner — driver holds
    |communities| floats."""
    from dcs_ray.functions.graph import label_propagation
    from dcs_ray.functions.relational import combiner_groupby

    labels_t = pa.concat_tables(
        pa.table(b)
        for b in label_propagation(_link_pair_edges(sf_dir), n_iter=5)
        .iter_batches(batch_format="pyarrow")
    )
    nodes = labels_t["node"].to_numpy().astype(np.int64)
    lbls = labels_t["community"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    nodes, lbls = nodes[order], lbls[order]
    lref = ray.put((nodes, lbls))

    edges = _link_edges_ds(sf_dir)

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
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
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).materialize()

    def intra(b: pa.Table) -> pa.Table:
        nd, lb = ray.get(lref)
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        la = lb[np.searchsorted(nd, a)]
        lbb = lb[np.searchsorted(nd, bb)]
        same = la == lbb
        ul, cnt = np.unique(la[same], return_counts=True)
        out = pa.table(
            {
                "lbl": pa.array(ul, pa.int64()),
                "mc": pa.array(cnt.astype(np.int64), pa.int64()),
                "m_edges": pa.array(
                    np.where(np.arange(len(ul)) == 0, len(a), 0), pa.int64()
                ),
            }
        )
        if len(ul) == 0:
            out = pa.table(
                {
                    "lbl": pa.array([-1], pa.int64()),
                    "mc": pa.array([0], pa.int64()),
                    "m_edges": pa.array([len(a)], pa.int64()),
                }
            )
        return out

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(intra, batch_format="pyarrow"),
            ["lbl"], ["mc", "m_edges"],
        ).iter_batches(batch_format="pyarrow")
    )
    m = int(g["m_edges"].to_numpy().sum())
    mc_l = g["lbl"].to_numpy().astype(np.int64)
    mc_v = g["mc"].to_numpy().astype(np.int64)
    mc = {int(x): int(v) for x, v in zip(mc_l, mc_v) if x >= 0}

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy().astype(np.int64),
                            b["b"].to_numpy().astype(np.int64),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"), ["node"], [],
            count_col="d",
        ).iter_batches(batch_format="pyarrow")
    )
    dn = deg["node"].to_numpy().astype(np.int64)
    dv = deg["d"].to_numpy().astype(np.int64)
    dl = lbls[np.searchsorted(nodes, dn)]
    ul = np.unique(lbls)
    dsum = np.zeros(len(ul), np.int64)
    np.add.at(dsum, np.searchsorted(ul, dl), dv)
    q = 0.0
    for i, c in enumerate(ul):
        q += mc.get(int(c), 0) / m - (dsum[i] / (2.0 * m)) ** 2
    return pa.table(
        {
            "n_communities": pa.array([len(ul)], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "modularity": pa.array([round(q, 6) + 0.0], pa.float64()),
        }
    )


def _q_feature_mi_quality(sf_dir: str) -> pa.Table:
    """Mutual-information feature ranking for the quality features
    (the feature-selection step before training any filter model):
    each feature splits at its MEDIAN (rank ⌈n/2⌉, whole tie groups ≤
    threshold) into a 2×2 table against the lang=='en' label, and
    MI = Σ (c/N)·ln(cN/(r·s)) — exact integer counts until the logs.
    One long-form (feature, micro-value, label) combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.textstats import quality_score_batch

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def prep(b: pa.Table) -> pa.Table:
        q = quality_score_batch(b)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ntok = q["n_tokens"].to_numpy().astype(np.int64)
        stop = np.floor(
            q["stopword_ratio"].to_numpy() * 1e6 + 0.5
        ).astype(np.int64)
        mlen = np.floor(
            q["mean_token_len"].to_numpy() * 1e6 + 0.5
        ).astype(np.int64)
        n = len(b)
        return pa.table(
            {
                "feature": pa.array(
                    ["n_tokens"] * n + ["stopword_ratio"] * n
                    + ["mean_token_len"] * n,
                    pa.string(),
                ),
                "v": pa.array(np.concatenate([ntok, stop, mlen]), pa.int64()),
                "y": pa.array(np.tile(y, 3), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"),
            ["feature", "v", "y"], [], count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    feat = g["feature"].to_numpy(zero_copy_only=False)
    v = g["v"].to_numpy().astype(np.int64)
    y = g["y"].to_numpy().astype(np.int64)
    c = g["c"].to_numpy().astype(np.int64)
    rows = []
    for fname in ("mean_token_len", "n_tokens", "stopword_ratio"):
        m = feat == fname
        fv, fy, fc = v[m], y[m], c[m]
        uv = np.unique(fv)
        per_v = np.zeros(len(uv), np.int64)
        np.add.at(per_v, np.searchsorted(uv, fv), fc)
        cum = np.cumsum(per_v)
        n = int(cum[-1])
        thr = int(uv[np.searchsorted(cum, (n + 1) // 2, side="left")])
        x = (fv > thr).astype(np.int64)
        cells = np.zeros((2, 2), np.int64)
        np.add.at(cells, (x, fy), fc)
        rsum = cells.sum(axis=1)
        csum = cells.sum(axis=0)
        mi = 0.0
        for xi in (0, 1):
            for yi in (0, 1):
                cc = int(cells[xi, yi])
                if cc > 0:
                    mi += (cc / n) * float(
                        np.log(cc * n / (int(rsum[xi]) * int(csum[yi])))
                    )
        rows.append(
            (
                fname, thr,
                int(cells[0, 0]), int(cells[0, 1]),
                int(cells[1, 0]), int(cells[1, 1]),
                round(mi, 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "feature": pa.array(cols[0], pa.string()),
            "thr_micro": pa.array(cols[1], pa.int64()),
            "n00": pa.array(cols[2], pa.int64()),
            "n01": pa.array(cols[3], pa.int64()),
            "n10": pa.array(cols[4], pa.int64()),
            "n11": pa.array(cols[5], pa.int64()),
            "mi": pa.array(cols[6], pa.float64()),
        }
    )


def _q_max_tf_audit(sf_dir: str) -> pa.Table:
    """Block-max metadata audit: the index's own per-term ``max_tf``
    (the upper bound MaxScore prunes with — a too-small value would
    silently DROP correct results) for the top-20 df terms, checked
    against the raw-text maximum tf recomputed by the oracle. Reads
    only the vocab-scale term_dict artifacts."""
    import pyarrow.parquet as pq

    from dcs_ray.search import shard_paths

    idx = _index_dir(sf_dir, "words")
    agg: dict[str, list[int]] = {}
    for p in shard_paths(idx):
        td = pq.read_table(
            os.path.join(p, "term_dict.parquet"), columns=["term", "df", "max_tf"]
        )
        for term, df, mtf in zip(
            td["term"].to_pylist(),
            td["df"].to_numpy().astype(np.int64),
            td["max_tf"].to_numpy().astype(np.int64),
        ):
            cur = agg.setdefault(term, [0, 0])
            cur[0] += int(df)
            cur[1] = max(cur[1], int(mtf))
    rows = sorted(
        ((t, v[0], v[1]) for t, v in agg.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    cols = list(zip(*rows))
    return pa.table(
        {
            "term": pa.array(cols[0], pa.string()),
            "df": pa.array(cols[1], pa.int64()),
            "max_tf": pa.array(cols[2], pa.int64()),
        }
    )


def _q_serp_diversity_ild(sf_dir: str) -> pa.Table:
    """Intra-list diversity of the BM25 top-10 (the SERP-quality
    measurement MMR optimizes): hash-embedding cosine for every result
    pair — 45 gated rows, each a single replayable expression over the
    float32 embedding chain. Embeddings computed ONLY for the result
    ids (broadcast filter), never the corpus."""
    from dcs_ray.functions.embed import hash_embed_batch
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    top = search_bm25(idx, [BM25_QUERY], k=10)
    ids = np.sort(top["doc_id"].to_numpy().astype(np.int64))
    ref = ray.put(ids)

    def emb(b: pa.Table) -> pa.Table:
        want = ray.get(ref)
        did = b["doc_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(want, did), len(want) - 1)
        keep = want[pos] == did
        return hash_embed_batch(b.filter(pa.array(keep)))

    t = pa.concat_tables(
        pa.table(b)
        for b in read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(emb, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    did = t["doc_id"].to_numpy().astype(np.int64)
    E = (
        t["embedding"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).astype(np.float64)
        .reshape(len(t), -1)
    )
    nrm = np.sqrt((E * E).sum(axis=1))
    rows = []
    for i in range(len(did)):
        for j in range(i + 1, len(did)):
            dot = float((E[i] * E[j]).sum())
            c = dot / (nrm[i] * nrm[j]) if nrm[i] > 0 and nrm[j] > 0 else 0.0
            rows.append((int(did[i]), int(did[j]), round(c, 6) + 0.0))
    cols = list(zip(*rows))
    return pa.table(
        {
            "doc_a": pa.array(cols[0], pa.int64()),
            "doc_b": pa.array(cols[1], pa.int64()),
            "cos_sim": pa.array(cols[2], pa.float64()),
        }
    )


def _q_churn_auc_baseline(sf_dir: str) -> pa.Table:
    """AUC of the simplest churn model there is — 'less first-half
    activity ⇒ more likely to churn' — via the tie-corrected
    Mann–Whitney midrank sum on EXACT integer activity counts, over
    users active in the first half (churn = silent second half). The
    baseline number every real churn model must beat. Exchange =
    |users|."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"), ["user_id"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64)
    s = g["s"].to_numpy().astype(np.int64)
    keep = f > 0
    a = f[keep]  # score = first-half activity
    y = (s[keep] == 0).astype(np.int64)  # churned
    # tie-corrected midrank sum over (score asc): r2 = 2·min_rank + ties − 1
    uv = np.unique(a)
    tot = np.zeros(len(uv), np.int64)
    pos = np.zeros(len(uv), np.int64)
    at = np.searchsorted(uv, a)
    np.add.at(tot, at, 1)
    np.add.at(pos, at, y)
    below = np.concatenate(([0], np.cumsum(tot)[:-1]))
    r2 = 2 * (below + 1) + tot - 1
    s2 = int((pos * r2).sum())
    n1 = int(y.sum())
    n0 = int(len(y) - n1)
    auc = (
        (s2 - n1 * (n1 + 1)) / (2 * n1 * n0) if n1 > 0 and n0 > 0 else 0.0
    )
    return pa.table(
        {
            "n_users": pa.array([len(y)], pa.int64()),
            "n_churned": pa.array([n1], pa.int64()),
            "auc": pa.array([round(auc, 6) + 0.0], pa.float64()),
        }
    )


def _q_min_cost_supplier(sf_dir: str) -> pa.Table:
    """TPC-H-Q2-shape minimum-cost supplier (adapted: no partsupp table,
    so a supplier's offer for a part is its cheapest shipped lineitem in
    exact integer cents): parts restricted to p_type='LARGE' and
    p_size<=15, suppliers to region ASIA (both tiny filters broadcast as
    key sets — lineitem never shuffles for them), per-(part, supplier)
    min-cents via the combiner_stats fold, then a grouped argmin per
    part (ties to the smaller suppkey) and broadcast name lookups."""
    from dcs_ray.functions.relational import (
        broadcast_join,
        broadcast_semi_join,
        combiner_stats,
        grouped_topn,
    )

    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type", "p_size", "p_brand"]
    )
    sel_parts = part.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_type"], "LARGE"), pc.less_equal(t["p_size"], 15))
        ),
        batch_format="pyarrow",
    )
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nation = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda t, _r=rkey: t.filter(pc.equal(t["n_regionkey"], _r)),
        batch_format="pyarrow",
    )
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    sup_in_region = broadcast_semi_join(sup, nation, on="s_nationkey", right_on="n_nationkey")
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    li = broadcast_semi_join(li, sel_parts, on="l_partkey", right_on="p_partkey")
    li = broadcast_semi_join(li, sup_in_region, on="l_suppkey", right_on="s_suppkey")

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "cents": pa.array(
                    np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    offers = combiner_stats(
        li.map_batches(cents, batch_format="pyarrow"), ["l_partkey", "l_suppkey"], "cents"
    )
    best = grouped_topn(
        offers, key="l_partkey", order_col="min_cents", n=1, ascending=True,
        tie_col="l_suppkey",
    )
    best = broadcast_join(
        best, sel_parts, on="l_partkey", right_on="p_partkey", small_cols=("p_brand",)
    )
    best = broadcast_join(
        best, sup_in_region, on="l_suppkey", right_on="s_suppkey",
        small_cols=("s_name", "s_acctbal"),
    )
    t = pa.concat_tables(pa.table(b) for b in best.iter_batches(batch_format="pyarrow"))
    t = t.sort_by("l_partkey")
    return pa.table(
        {
            "p_partkey": t["l_partkey"],
            "p_brand": t["p_brand"],
            "s_name": t["s_name"],
            "s_acctbal": pc.round(t["s_acctbal"], 6),
            "min_cost": pa.array(
                np.round(t["min_cents"].to_numpy().astype(np.int64) / 100.0, 6),
                pa.float64(),
            ),
        }
    )


def _q_important_parts(sf_dir: str) -> pa.Table:
    """TPC-H-Q11-shape important stock (adapted to lineitem): per-part
    discounted revenue shipped by NATION_7's suppliers, keeping parts
    whose value exceeds 0.1%% of that nation's total. Fraction filter on
    EXACT integers (value·1000 > total in 1e-4 units — no float
    threshold anywhere); the only exchanges are the part-keyed combiner
    rows and one scalar total."""
    from dcs_ray.functions.relational import broadcast_semi_join, combiner_groupby

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nkey = nation.filter(pc.equal(nation["n_name"], "NATION_7"))["n_nationkey"][0].as_py()
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t, _n=nkey: t.filter(pc.equal(t["s_nationkey"], _n)),
        batch_format="pyarrow",
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = broadcast_semi_join(li, sup, on="l_suppkey", right_on="s_suppkey")
    rev = li.map_batches(
        lambda b: _li_rev1e4(b, {"l_partkey": b["l_partkey"]}), batch_format="pyarrow"
    )
    per_part = combiner_groupby(rev, ["l_partkey"], ["rev1e4"]).materialize()
    empty = pa.table(
        {"l_partkey": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
    )
    parts = [pa.table(b) for b in per_part.iter_batches(batch_format="pyarrow")]
    if not parts:
        return empty
    total = per_part.sum("rev1e4")
    t = pa.concat_tables(parts)
    v = t["rev1e4"].to_numpy().astype(np.int64)
    keep = v * 1000 > total
    t = t.filter(pa.array(keep))
    t = t.sort_by([("rev1e4", "descending"), ("l_partkey", "ascending")])
    return pa.table(
        {
            "l_partkey": t["l_partkey"],
            "value": pa.array(
                np.round(t["rev1e4"].to_numpy().astype(np.int64) / 10000.0, 6),
                pa.float64(),
            ),
        }
    )


def _q_part_supplier_counts(sf_dir: str) -> pa.Table:
    """TPC-H-Q16-shape parts/supplier relationship: distinct suppliers
    that shipped each (p_brand, p_type, p_size) family, excluding
    Brand#45 and PROMO parts. Distinct via the pair-dedup combiner
    (each batch collapses to its unique (family, suppkey) rows before
    the exchange), then a count-only combiner per family."""
    from dcs_ray.functions.relational import broadcast_join, combiner_groupby

    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.invert(pc.equal(t["p_brand"], "Brand#45")),
                pc.invert(pc.equal(t["p_type"], "PROMO")),
            )
        ),
        batch_format="pyarrow",
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    li = broadcast_join(
        li, part, on="l_partkey", right_on="p_partkey",
        small_cols=("p_brand", "p_type", "p_size"),
    )

    def dedup_pairs(b: pa.Table) -> pa.Table:
        t = (
            b.select(["p_brand", "p_type", "p_size", "l_suppkey"])
            .group_by(["p_brand", "p_type", "p_size", "l_suppkey"])
            .aggregate([])
        )
        return t.append_column("dup", pa.array(np.zeros(len(t), np.int64), pa.int64()))

    # two-level distinct: per-batch unique pairs, one pair-keyed combiner
    # (each distinct (family, suppkey) survives exactly once), then a
    # count-only family combiner — the exchange never carries raw rows
    pairs = combiner_groupby(
        li.map_batches(dedup_pairs, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        ["dup"],
    )
    pairs = pairs.map_batches(
        lambda b: b.append_column("one", pa.array(np.ones(len(b), np.int64), pa.int64())),
        batch_format="pyarrow",
    )
    agg = combiner_groupby(pairs, ["p_brand", "p_type", "p_size"], ["one"])
    t = pa.concat_tables(pa.table(b) for b in agg.iter_batches(batch_format="pyarrow"))
    t = t.sort_by(
        [("one", "descending"), ("p_brand", "ascending"), ("p_type", "ascending"),
         ("p_size", "ascending")]
    )
    return pa.table(
        {
            "p_brand": t["p_brand"],
            "p_type": t["p_type"],
            "p_size": t["p_size"].cast(pa.int64()),
            "supplier_cnt": t["one"],
        }
    )


def _q_sales_opportunity(sf_dir: str) -> pa.Table:
    """TPC-H-Q22-shape global sales opportunity: customers richer than
    the positive-balance mean with no order since 2000-01-01 (dormant —
    the testdata's customers nearly all have SOME order, so the shape's
    anti-join is against the recent-order key set), counted per nation.
    The mean threshold compares in EXACT integers (bal_cents · n >
    sum_cents — cross-multiplied, so no float mean is ever formed); the
    dormancy filter is the broadcast anti-join with the date predicate
    applied in the orders scan; per-nation fold is a combiner."""
    from dcs_ray.functions.relational import broadcast_semi_join, combiner_groupby

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def bal_cents(b: pa.Table) -> pa.Table:
        cents = np.round(b["c_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_nationkey": b["c_nationkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    cb = cust.map_batches(bal_cents, batch_format="pyarrow").materialize()
    pos = cb.map_batches(
        lambda b: b.filter(pc.greater(b["cents"], 0)), batch_format="pyarrow"
    )
    # one (sum, count) scalar pair — the threshold never leaves integers
    sum_cents = pos.sum("cents")
    n_pos = pos.count()
    rich = cb.map_batches(
        lambda b, _s=sum_cents, _n=n_pos: b.filter(
            pa.array(b["cents"].to_numpy().astype(np.int64) * _n > _s)
        ),
        batch_format="pyarrow",
    )
    import datetime

    cutoff = datetime.datetime(2000, 1, 1)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b, _c=cutoff: b.filter(
            pc.greater_equal(b["o_orderdate"], pa.scalar(_c, pa.timestamp("us")))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    no_orders = broadcast_semi_join(rich, orders, on="c_custkey", right_on="o_custkey",
                                    anti=True)
    agg = combiner_groupby(no_orders, ["c_nationkey"], ["cents"])
    parts = [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal": pa.array([], pa.float64()),
            }
        )
    t = pa.concat_tables(parts).sort_by("c_nationkey")
    return pa.table(
        {
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "numcust": t["n_rows"],
            "totacctbal": pa.array(
                np.round(t["cents"].to_numpy().astype(np.int64) / 100.0, 6),
                pa.float64(),
            ),
        }
    )


def _q_ef_posting_sizes(sf_dir: str) -> pa.Table:
    """Per-term on-disk byte size of an Elias-Fano-coded posting section
    (``codec="ef"`` — Vigna '13 quasi-succinct doc-id lists, the codec
    family behind Lucene/PISA doc-id indexes; dcs's TurboPFor slot,
    ``internal/index/pforwriter.go``). EF's size is a CLOSED FORM of
    (entries per block, id span, max_tf bit width) — independent of the
    id distribution — so the oracle replays the exact byte count per
    term from the raw corpus: range partitioning ``doc_id // span``,
    128-entry blocks by row_number, ``l = floor_log2(U // m)`` via
    ``length(bin(..)) - 1``, then byte-padded stream arithmetic."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import shard_paths

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_ef")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs,
            out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, codec="ef",
            ),
        )
    parts = [
        pq.read_table(
            os.path.join(sp, "term_dict.parquet"), columns=["term", "nbytes"]
        )
        for sp in shard_paths(out)
    ]
    t = pa.concat_tables(parts).group_by("term").aggregate([("nbytes", "sum")])
    t = t.sort_by("term")
    return pa.table(
        {"term": t["term"], "ef_bytes": t["nbytes_sum"].cast(pa.int64())}
    )


def _q_bm25_bmw(sf_dir: str) -> pa.Table:
    """BM25 top-10 via the interval-decomposed Block-Max WAND scorer
    (``method="bmw"``, the north rule's named algorithm) — must be
    rank- AND score-identical to the exhaustive/MaxScore paths, so the
    oracle is the same full BM25 SQL replay as ``bm25_topk``."""
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10, method="bmw")
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_bm25_pr_eval(sf_dir: str) -> pa.Table:
    """Precision@10 / recall@10 / average-precision of the BM25 top-10
    run vs the lexical all-terms relevance oracle (TREC AP convention:
    Sum of P@i over hit ranks, normalized by min(n_rel, k)). Shares the
    one-pass streaming labeler with the NDCG/MRR gate."""
    from dcs_ray.functions.evaluate import pr_ranking_metrics
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    ranked = t["doc_id"].to_pylist()
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pr_ranking_metrics(docs, ranked, BM25_QUERY.split(), k=10)


def _q_redde_collection_ranking(sf_dir: str) -> pa.Table:
    """ReDDE resource selection (Si & Callan '03) over the same three
    source-sharded collections as the CORI gate, but sample-based: a
    central sample index (every 5th doc_id, collection id carried as an
    in-index meta column) answers BM25, and each top-20 hit votes with
    the inverse sampling rate |C|/|S|. The oracle replays the sampled
    BM25 (sample-local df/avgdl), the top-20 cut and the vote scaling."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import redde_collection_scores

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_redde_csi")
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    coll_all = np.array([int(s[3:]) % 3 for s in tbl["source"].to_pylist()], np.int64)
    ids_all = tbl["doc_id"].to_numpy()
    samp_mask = ids_all % 5 == 0
    full_sizes = [int((coll_all == c).sum()) for c in range(3)]
    sample_sizes = [int((coll_all[samp_mask] == c).sum()) for c in range(3)]
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        coll = pa.array(
            [int(s[3:]) % 3 for s in docs["source"].to_pylist()], pa.int64()
        )
        docs = docs.append_column("coll", coll).drop_columns(["source"])
        sub = docs.filter(pa.array(docs["doc_id"].to_numpy() % 5 == 0))
        build_index(
            ray.data.from_arrow(sub), out,
            IndexConfig(num_partitions=4, num_shards=2, mode="words",
                        id_col="doc_id", dedup_latest=False, meta_cols=("coll",)),
        )
    return redde_collection_scores(
        out, BM25_QUERY, "coll", full_sizes, sample_sizes, k=20
    )


def _pbm_sql(n_sessions: int = 200, seed: int = 7, iters: int = 5) -> str:
    """Full PBM replay: splitmix64 click synthesis over the BM25
    top-10 (both ranking variants), the (variant, pos, doc) sufficient-
    statistic fold, and ``iters`` unrolled MATERIALIZED EM rounds (each
    group sums exactly two floats, so the arithmetic is bit-identical
    to the numpy fold before rounding)."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)

    def chain(col, nxt, i):
        if i == 0:
            return f"{_mulmod64(f'xor({col}::ubigint, {col}::ubigint >> 30)::hugeint', MIX1 + '::hugeint')} AS {nxt}"
        if i == 1:
            return f"{_mulmod64(f'xor({col}::ubigint, {col}::ubigint >> 27)::hugeint', MIX2 + '::hugeint')} AS {nxt}"
        return f"xor({col}::ubigint, {col}::ubigint >> 31)::hugeint AS {nxt}"

    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""e{i} AS MATERIALIZED (
  SELECT a.variant, a.pos, a.doc_id, a.n, a.k,
         a.k + (a.n - a.k) * (al.v * (1 - at.v) / (1 - al.v * at.v)) AS sum_e,
         a.k + (a.n - a.k) * (at.v * (1 - al.v) / (1 - al.v * at.v)) AS sum_a
  FROM agg a JOIN alpha{i - 1} al USING (pos) JOIN attr{i - 1} at USING (doc_id)),
alpha{i} AS MATERIALIZED (SELECT pos, sum(sum_e) / sum(n) AS v FROM e{i} GROUP BY pos),
attr{i} AS MATERIALIZED (SELECT doc_id, sum(sum_a) / sum(n) AS v FROM e{i} GROUP BY doc_id)""")
    its = ",\n".join(iter_ctes)
    return f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos, (s % 2) AS variant,
         (SELECT doc_id FROM ranked r
          WHERE r.rank = CASE WHEN s % 2 = 0 THEN pos ELSE 11 - pos END) AS doc_id
  FROM (SELECT unnest(range({n_sessions})) AS s),
       (SELECT unnest(range(1, 11)) AS pos)),
i0 AS (SELECT *, xor((s*16+pos)::ubigint, {seed + 1}::ubigint)::hugeint AS e0,
               xor((s*16+pos)::ubigint, {seed + 2}::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, {seed + 3}::ubigint)::hugeint AS d0 FROM imp),
i1 AS (SELECT *, {chain('e0', 'e1', 0)}, {chain('a0', 'a1', 0)}, {chain('d0', 'd1', 0)} FROM i0),
i2 AS (SELECT *, {chain('e1', 'e2', 1)}, {chain('a1', 'a2', 1)}, {chain('d1', 'd2', 1)} FROM i1),
i3 AS (SELECT *, {chain('e2', 'he', 2)}, {chain('a2', 'ha', 2)}, {chain('d2', 'hd', 2)} FROM i2),
clog AS MATERIALIZED (
  SELECT variant, pos, doc_id,
         CASE WHEN (he % 12) < (11 - pos) AND (ha % 16) < (3 + (hd % 10))
              THEN 1 ELSE 0 END AS click
  FROM i3),
agg AS MATERIALIZED (
  SELECT variant, pos, doc_id, count(*)::bigint AS n, sum(click)::bigint AS k
  FROM clog GROUP BY variant, pos, doc_id),
alpha0 AS (SELECT unnest(range(1, 11)) AS pos, 0.5 AS v),
attr0 AS (SELECT DISTINCT doc_id, 0.5 AS v FROM agg),
{its}
SELECT 'attr' AS kind, doc_id AS key, round(v, 6) + 0.0 AS value FROM attr{iters}
UNION ALL
SELECT 'exam' AS kind, pos AS key, round(v, 6) + 0.0 AS value FROM alpha{iters}
ORDER BY kind, key
"""


def _q_pbm_click_model(sf_dir: str) -> pa.Table:
    """PBM click-model EM (Craswell '08; EM per Chuklin et al. '15):
    a deterministic splitmix64 click log over the BM25 top-10 shown in
    two interleaved variants (base + reversed ranking), folded into
    per-(variant, position) sufficient statistics in one streaming
    pass, then 5 EM rounds separating examination-by-position from
    per-doc attractiveness. Oracle replays synthesis, fold, and every
    EM round as unrolled MATERIALIZED CTEs."""
    from dcs_ray.functions.clickmodel import pbm_em, synth_click_log
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    ranked = t["doc_id"].to_pylist()
    log = synth_click_log(ranked, n_sessions=200, seed=7)
    return pbm_em(log, n_positions=10, iters=5)


def _q_qljm_topk(sf_dir: str) -> pa.Table:
    """Jelinek-Mercer query-likelihood retrieval (Zhai & Lafferty '01,
    linear smoothing, lambda=0.3) over the inverted index — completes
    the LM ranking family next to the Dirichlet and PL2 gates; same
    fan-out, same vocab-thin cf pass, sparse-rewrite scoring with the
    rank-neutral per-query constant kept so scores replay exactly."""
    from dcs_ray.search import search_lm

    idx = _index_dir(sf_dir, "words")
    t = search_lm(idx, [BM25_QUERY], k=10, model="jm", lam=0.3)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()),
        }
    )


def _q_recrawl_priority(sf_dir: str) -> pa.Table:
    """Adaptive recrawl scheduling (Cho & Garcia-Molina, TOIT '03):
    per-url Poisson change-rate MLE lambda = -ln((n-X+0.5)/(n+0.5))
    from a deterministic 8-visit change history, ranked into the top-50
    recrawl frontier (hottest first). lambda is strictly increasing in
    X, so both sides order by the integer change count — no float
    ordering anywhere; the oracle replays the visit hash chain, the
    per-url change threshold, and the closed form."""
    from dcs_ray.functions.crawl import change_rate_estimates

    est = change_rate_estimates(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        n_visits=8, seed=11,
    )
    top_i = np.empty(0, np.int64)
    top_x = np.empty(0, np.int64)
    top_l = np.empty(0, np.float64)
    for b in est.iter_batches(batch_format="pyarrow"):
        ids = np.concatenate((top_i, b["doc_id"].to_numpy()))
        xs = np.concatenate((top_x, b["n_changes"].to_numpy()))
        ls = np.concatenate((top_l, b["lambda_hat"].to_numpy()))
        o = np.lexsort((ids, -xs))[:50]
        top_i, top_x, top_l = ids[o], xs[o], ls[o]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(top_i) + 1), pa.int64()),
            "doc_id": pa.array(top_i, pa.int64()),
            "n_changes": pa.array(top_x, pa.int64()),
            "lambda_hat": pa.array(top_l, pa.float64()),
        }
    )


def _q_template_ngrams(sf_dir: str) -> pa.Table:
    """Site-template boilerplate detection gate: a deterministic
    per-host template header is injected ahead of every doc's text
    (the nav/footer phrases real hosts repeat), then ``template_ngrams``
    must recover exactly the n-grams present in >= 60% of each host's
    docs. The threshold compares integers (5·count >= 3·total) and the
    oracle replays injection, tokenization, the 5-gram window joins,
    the per-doc dedup and the cut."""
    from dcs_ray.functions.crawl import template_ngrams

    def inject(b: pa.Table) -> pa.Table:
        prefix = pa.array(
            [
                f"tplheader {s} nav home about contact privacy end"
                for s in b["source"].to_pylist()
            ],
            pa.string(),
        )
        text = pc.binary_join_element_wise(prefix, b["text"], " ")
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"], "text": text}
        )

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).map_batches(inject, batch_format="pyarrow")
    out = template_ngrams(docs, n=5, min_frac=0.6)
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by([("source", "ascending"), ("gram", "ascending")])


def _q_bm25f_topk(sf_dir: str) -> pa.Table:
    """TRUE BM25F (Robertson & Zaragoza '04): body and anchor term
    frequencies are length-normalized per field, combined into one
    pseudo-frequency c = tfn_body + 2·tfn_anchor, and saturated ONCE —
    unlike the per-field score sum of ``bm25_anchor_topk``. idf from
    the body corpus. The oracle replays both field normalizations, the
    FULL OUTER field join, and the shared saturation."""
    from dcs_ray.search import search_bm25f

    t = search_bm25f(
        _index_dir(sf_dir, "words"),
        _anchor_index_dir(sf_dir),
        [BM25_QUERY],
        k=10,
        anchor_weight=2.0,
    )
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _q_cascade_click_model(sf_dir: str) -> pa.Table:
    """Cascade click-model MLE (Craswell '08): a deterministic
    top-down-scan click log over the BM25 top-10 (stop at first click),
    then the closed-form attractiveness estimate a_d = clicks/examined
    — the no-EM companion of the PBM gate, exact because the cascade's
    stopping rule makes examination observable. Oracle replays the
    per-session first-click scan and both integer counts."""
    from dcs_ray.functions.clickmodel import cascade_mle, synth_cascade_log
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    log = synth_cascade_log(t["doc_id"].to_pylist(), n_sessions=400, seed=9)
    return cascade_mle(log)


def _ltr_sql(n_iter: int = 8, lr: float = 0.1) -> str:
    """Pairwise-LTR replay: BM25 top-20 features (score, ln(1+doc_len),
    synthetic prior), lexical relevance labels, relevant×non-relevant
    feature-difference pairs, and ``n_iter`` unrolled MATERIALIZED
    gradient-ascent rounds with the engine's exact expression tree
    (z left-associated, coef = 1/(1+exp(z)), w += lr·(Σ d·coef / n))."""
    its = []
    for i in range(1, n_iter + 1):
        upd = []
        for j in (1, 2, 3):
            upd.append(
                f"w.w{j} + {lr} * (coalesce((SELECT sum(p.d{j} * "
                f"(1.0 / (1.0 + exp(p.d1 * w.w1 + p.d2 * w.w2 + p.d3 * w.w3)))) "
                f"FROM pairs p), 0.0)"
                f" / greatest((SELECT count(*) FROM pairs), 1)) AS w{j}"
            )
        its.append(
            f"w{i} AS MATERIALIZED (SELECT "
            + ", ".join(upd)
            + f" FROM w{i - 1} w)"
        )
    iters_sql = ",\n".join(its)
    return f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 40),
cdl AS (SELECT doc_id, count(*) AS doc_len FROM tok
        WHERE doc_id IN (SELECT doc_id FROM ranked) GROUP BY doc_id),
rel AS (SELECT doc_id FROM (
          SELECT doc_id, term, count(*) AS tf FROM tok
          WHERE term IN ('join','merge','spark') GROUP BY doc_id, term)
        WHERE tf >= 2 GROUP BY doc_id HAVING count(DISTINCT term) = 3),
feats AS MATERIALIZED (
  SELECT r.doc_id, r.score AS f1,
         ln(1.0 + coalesce(c.doc_len, 0)) AS f2,
         1.0 + (r.doc_id % 5) / 10.0 AS f3,
         CASE WHEN r.doc_id IN (SELECT doc_id FROM rel) THEN 1 ELSE 0 END AS y
  FROM ranked r LEFT JOIN cdl c USING (doc_id)),
pairs AS MATERIALIZED (
  SELECT a.f1 - b.f1 AS d1, a.f2 - b.f2 AS d2, a.f3 - b.f3 AS d3
  FROM feats a, feats b WHERE a.y = 1 AND b.y = 0),
w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
{iters_sql},
wr AS (SELECT round(w1, 6) + 0.0 AS w1, round(w2, 6) + 0.0 AS w2,
              round(w3, 6) + 0.0 AS w3 FROM w{n_iter}),
acc AS (SELECT count(*)::bigint AS n_pairs,
               coalesce(sum(CASE WHEN p.d1 * w.w1 + p.d2 * w.w2 + p.d3 * w.w3 > 0
                            THEN 1 ELSE 0 END), 0)::bigint AS n_correct
        FROM pairs p, wr w)
SELECT name, value FROM (
  SELECT 'n_correct' AS name, (SELECT n_correct FROM acc)::double AS value
  UNION ALL SELECT 'n_pairs', (SELECT n_pairs FROM acc)::double
  UNION ALL SELECT 'w_bm25', (SELECT w1 FROM wr)
  UNION ALL SELECT 'w_len', (SELECT w2 FROM wr)
  UNION ALL SELECT 'w_prior', (SELECT w3 FROM wr)
) ORDER BY name
"""


def _q_pairwise_ltr(sf_dir: str) -> pa.Table:
    """Pairwise learning-to-rank gate (linear RankNet, Burges '05): the
    BM25 top-40 becomes (score, ln(1+doc_len), prior) feature vectors
    with graded lexical labels (every query term tf >= 2);
    relevant×non-relevant difference
    pairs train a linear scorer by 8 rounds of full-batch pairwise
    logistic gradient ascent (per-block partial gradients, canonical
    fold). Outputs rounded weights + pair-order accuracy computed with
    the ROUNDED weights so the threshold replays exactly."""
    import pyarrow.dataset as pads

    from dcs_ray.functions.ltr import pairwise_accuracy, pairwise_ltr_fit
    from dcs_ray.search import search_bm25
    from dcs_ray.tokenize import word_tokens_flat

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=40)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    scores = t["score"].to_numpy()
    dset = pads.dataset(f"{sf_dir}/documents.parquet")
    dt = dset.to_table(
        filter=pads.field("doc_id").isin(ids.tolist()),
        columns=["doc_id", "text"],
    )
    flat, parents = word_tokens_flat(dt["text"])
    nt = np.bincount(parents, minlength=len(dt))
    terms = np.asarray(flat.to_pylist(), dtype=object)
    qterms = sorted(BM25_QUERY.split())
    # graded label: EVERY query term occurs >= 2 times (the lexical
    # relevance oracle is too easy on this corpus at depth 40)
    has = np.zeros((len(dt), len(qterms)), bool)
    for qi, qt in enumerate(qterms):
        cnt = np.bincount(parents[terms == qt], minlength=len(dt))
        has[:, qi] = cnt >= 2
    rel_rows = has.all(axis=1)
    row_ids = dt["doc_id"].to_numpy().astype(np.int64)
    pos = {int(d): i for i, d in enumerate(row_ids)}
    order = np.array([pos[int(d)] for d in ids], np.int64)
    f1 = scores
    f2 = np.log(1.0 + nt[order].astype(np.float64))
    f3 = 1.0 + (ids % 5) / 10.0
    y = rel_rows[order]
    X = np.column_stack((f1, f2, f3))
    deltas = (X[y][:, None, :] - X[~y][None, :, :]).reshape(-1, 3)
    pairs_ds = ray.data.from_arrow(
        pa.table({f"d{j + 1}": pa.array(deltas[:, j], pa.float64()) for j in range(3)})
    )
    w = pairwise_ltr_fit(pairs_ds, ["d1", "d2", "d3"], n_iter=8, lr=0.1)
    wr = np.round(w, 6) + 0.0
    n_pairs, n_correct = pairwise_accuracy(deltas, wr)
    return pa.table(
        {
            "name": pa.array(
                ["n_correct", "n_pairs", "w_bm25", "w_len", "w_prior"], pa.string()
            ),
            "value": pa.array(
                [float(n_correct), float(n_pairs), wr[0], wr[1], wr[2]], pa.float64()
            ),
        }
    )


def _q_tfidf_cosine_topk(sf_dir: str) -> pa.Table:
    """INDEX-SERVED tf-idf cosine (the Lucene-classic similarity
    shape, distinct from the corpus-streaming lnc.ltc gate
    ``tfidf_cosine_topk``): raw-tf ltc weighting, idf = ln(N/df), doc norm
    over ALL the doc's terms precomputed in one streaming pass as a
    doc-id-sorted Parquet artifact (rounded to 6dp on disk, mirrored by
    the oracle), query-time shard tasks read only their doc-id range of
    it. Scores = sum(tf·idf²)/(||q||·||d||)."""
    from dcs_ray.functions.vsm import search_tfidf_cosine, tfidf_doc_norms

    idx = _index_dir(sf_dir, "words")
    norms = idx + "_vsm_norms"
    if not os.path.exists(norms):
        tfidf_doc_norms(
            read_parquet_sized(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            idx,
            norms,
        )
    t = search_tfidf_cosine(idx, norms, [BM25_QUERY], k=10)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()),
        }
    )


_SELECTIVITY_COMBOS = [
    ["join", "merge"], ["spark", "the"], ["join", "merge", "spark"],
    ["customer", "value"], ["data", "fast", "query"], ["sort", "window"],
]


def _q_query_selectivity(sf_dir: str) -> pa.Table:
    """Query-planner selectivity estimation (System-R style
    independence assumption, Selinger '79): for six AND-conjunctions,
    the planner estimate N·Π(df_t/N) from vocab-thin df stats next to
    the EXACT distributed boolean-AND count (rarest-first posting
    intersection per shard). The pair is what a cost-based planner
    feeds its join-order choice; the oracle replays both the estimate
    arithmetic (left-associated over sorted terms) and the exact
    count."""
    from dcs_ray.search import global_df, load_stats, search_boolean

    idx = _index_dir(sf_dir, "words")
    n = float(load_stats(idx)["n_docs"])
    all_terms = sorted({t for c in _SELECTIVITY_COMBOS for t in c})
    dfs = global_df(idx, all_terms)
    qid_l, terms_l, est_l, act_l = [], [], [], []
    for qid, combo in enumerate(_SELECTIVITY_COMBOS):
        cs = sorted(combo)
        est = n
        for t in cs:
            est = est * (float(dfs.get(t, 0)) / n)
        actual = len(search_boolean(idx, cs))
        qid_l.append(qid)
        terms_l.append(" ".join(cs))
        est_l.append(round(est, 6) + 0.0)
        act_l.append(actual)
    return pa.table(
        {
            "query_id": pa.array(qid_l, pa.int64()),
            "terms": pa.array(terms_l, pa.string()),
            "est_docs": pa.array(est_l, pa.float64()),
            "actual_docs": pa.array(act_l, pa.int64()),
        }
    )


def _selectivity_sql() -> str:
    parts = []
    for qid, combo in enumerate(_SELECTIVITY_COMBOS):
        cs = sorted(combo)
        est = "(SELECT n FROM st)"
        for t in cs:
            est = (
                f"({est} * (coalesce((SELECT df FROM df WHERE term = '{t}'), 0)"
                f" / (SELECT n FROM st)))"
            )
        in_list = ", ".join(f"'{t}'" for t in cs)
        parts.append(f"""SELECT {qid}::bigint AS query_id, '{" ".join(cs)}' AS terms,
       round({est}, 6) + 0.0 AS est_docs,
       (SELECT count(*) FROM (
          SELECT doc_id FROM tok WHERE term IN ({in_list})
          GROUP BY doc_id HAVING count(DISTINCT term) = {len(cs)}))::bigint AS actual_docs""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS ({_TOK}),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n),
df AS (SELECT term, count(DISTINCT doc_id)::double AS df FROM tok GROUP BY term)
{body}
ORDER BY query_id
"""


def _q_dust_rules(sf_dir: str) -> pa.Table:
    """DUST rule mining gate (Bar-Yossef '07 "do not crawl in the
    DUST"): a deterministic crawl-shaped url space over the corpus —
    every doc under a canonical url plus a content-identical
    ``?sid=`` alias (odd docs also ``?ref=``), and per-source listing
    urls where ``?page=`` DOES change content. Mining must validate
    the sid/ref drop-rules (support, zero violations) and refute
    ``page``. Bucket counts use content hashes engine-side and raw
    text SQL-side — equal by injectivity at corpus scale."""
    from dcs_ray.functions.dust import dust_param_rules

    def synth(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy()
        src_arr = b["source"].to_pylist()
        base = [
            f"http://{s}.site/p{d}" for s, d in zip(src_arr, ids)
        ]
        urls, texts = [], []
        txt = b["text"].to_pylist()
        for i, d in enumerate(ids):
            urls.append(base[i]); texts.append(txt[i])
            urls.append(f"{base[i]}?sid=a{d % 13}"); texts.append(txt[i])
            if d % 2 == 1:
                urls.append(f"{base[i]}?ref=r{d % 3}"); texts.append(txt[i])
            urls.append(f"http://{src_arr[i]}.site/list?page={d % 4}")
            texts.append(f"listing {src_arr[i]} {d}")
        return pa.table(
            {"url": pa.array(urls, pa.string()), "text": pa.array(texts, pa.string())}
        )

    pages = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).map_batches(synth, batch_format="pyarrow")
    return dust_param_rules(pages, ["page", "ref", "sid"], min_support=2)


def _q_crawl_budget(sf_dir: str) -> pa.Table:
    """Crawl-budget apportionment gate: a 1000-fetch recrawl budget is
    split across hosts proportional to their integer change mass (sum
    of the 8-visit change counts of the recrawl_priority estimator)
    with the largest-remainder (Hamilton) method — integer-exact, ties
    to the smaller host. The oracle replays the visit hash chain, the
    per-source mass fold, and the apportionment arithmetic."""
    from dcs_ray.functions.crawl import crawl_budget_allocation

    return crawl_budget_allocation(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ),
        budget=1000, n_visits=8, seed=11,
    )


def _serp_ctr_sql(n_sessions: int = 200, seed: int = 7) -> str:
    """CTR-curve replay: the PBM gate's click synthesis (same hash
    chains) aggregated to per-(variant, position) impressions / clicks
    / 6dp CTR."""
    full = _pbm_sql(n_sessions=n_sessions, seed=seed, iters=1)
    # reuse everything up to (and including) the agg CTE, then select
    head = full.split("alpha0 AS")[0].rstrip().rstrip(",")
    return head + """
SELECT variant, pos, sum(n)::bigint AS impressions, sum(k)::bigint AS clicks,
       round(sum(k)::double / greatest(sum(n), 1), 6) + 0.0 AS ctr
FROM agg GROUP BY variant, pos ORDER BY variant, pos
"""


def _q_serp_ctr(sf_dir: str) -> pa.Table:
    """Observed CTR by (variant, position) over the PBM click log —
    the raw position-bias curve the PBM gate de-biases; integer
    impression/click folds, 6dp CTR."""
    from dcs_ray.functions.clickmodel import ctr_by_position, synth_click_log
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    log = synth_click_log(t["doc_id"].to_pylist(), n_sessions=200, seed=7)
    return ctr_by_position(log)


def _nqc_sql(k: int = 50) -> str:
    """NQC replay: shared tok/df/stats CTEs, one scores+top-k+moments
    chain per query, population std over the top-k and the sigma/mu
    normalization — same expression tree as ``evaluate.nqc_difficulty``."""
    from dcs_ray.functions.evaluate import NQC_QUERIES

    parts, sels = [], []
    for i, q in enumerate(NQC_QUERIES):
        terms = sorted(set(q.split()))
        inl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""sc{i} AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ({inl}) GROUP BY tf.doc_id),
top{i} AS (SELECT score FROM sc{i} ORDER BY score DESC, doc_id ASC LIMIT {k}),
m{i} AS (SELECT count(*)::bigint AS k, avg(score) AS mu FROM top{i}),
s{i} AS (SELECT m.k, m.mu,
                sqrt(sum((t.score - m.mu) * (t.score - m.mu)) / m.k) AS sigma
         FROM top{i} t, m{i} m GROUP BY m.k, m.mu)""")
        sels.append(
            f"SELECT {i}::bigint AS query_id, k AS k_used, round(mu, 6) + 0.0 AS mu,"
            f" round(sigma, 6) + 0.0 AS sigma,"
            f" round(CASE WHEN mu <> 0 THEN sigma / mu ELSE 0.0 END, 6) + 0.0 AS nqc"
            f" FROM s{i}"
        )
    body = "\nUNION ALL\n".join(sels)
    chains = ",\n".join(parts)
    return f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
{chains}
{body}
ORDER BY query_id
"""


def _q_nqc_difficulty(sf_dir: str) -> pa.Table:
    """Post-retrieval query-performance prediction: NQC (Shtok '09) —
    the normalized deviation of the top-50 BM25 scores per query, the
    post-retrieval companion of the clarity gate. Five fixed queries;
    the oracle replays every score distribution and both moments."""
    from dcs_ray.functions.evaluate import NQC_QUERIES, nqc_difficulty

    idx = _index_dir(sf_dir, "words")
    return nqc_difficulty(idx, NQC_QUERIES, k=50)


def _q_static_cache(sf_dir: str) -> pa.Table:
    """Static result-cache evaluation (Baeza-Yates SIGIR '07): a
    20,000-request deterministic skewed query stream over 200 query
    ids, folded to frequencies, top-20 cached, cumulative hit-rate
    curve reported — every draw, the frequency fold, the (freq desc,
    qid asc) cache ranking and the 6dp curve replay in SQL."""
    from dcs_ray.functions.cachesim import static_cache_hit_curve, synth_query_stream

    log = synth_query_stream(20000, 200, seed=21)
    return static_cache_hit_curve(log, 200, cache_m=20)


def _q_rbp_err_eval(sf_dir: str) -> pa.Table:
    """Rank-biased precision (Moffat & Zobel '08, p=0.8) and expected
    reciprocal rank (Chapelle '09, binary relevance mapped to R=0.5)
    of the BM25 top-10 vs the lexical relevance oracle — the
    user-model metric family next to NDCG/MRR/MAP:

        RBP = (1-p) * Sum rel_i * p^(i-1)
        ERR = Sum rel_i * (0.5/i) * 0.5^(#relevant above i)

    Shares the one-pass streaming labeler; both metrics are 10-row
    arithmetic the oracle replays rank by rank."""
    from dcs_ray.functions.evaluate import relevance_hits
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    ranked = np.asarray(t["doc_id"].to_pylist(), np.int64)
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_relevant, hit_set = relevance_hits(docs, ranked, BM25_QUERY.split())
    rel = np.array([1.0 if d in hit_set else 0.0 for d in ranked])
    i = np.arange(1, len(rel) + 1, dtype=np.float64)
    rbp = (1.0 - 0.8) * float(np.sum(rel * np.power(0.8, i - 1.0)))
    before = np.concatenate(([0.0], np.cumsum(rel)[:-1]))
    err = float(np.sum(rel * (0.5 / i) * np.power(0.5, before)))
    return pa.table(
        {
            "n_relevant": pa.array([n_relevant], pa.int64()),
            "rbp_08": pa.array([round(rbp, 6) + 0.0], pa.float64()),
            "err": pa.array([round(err, 6) + 0.0], pa.float64()),
        }
    )


def _hyperanf_sql(rounds: int = 3) -> str:
    """HyperANF replay: node-seeded single-register HLL counters
    (splitmix64 chain, j = top-4 bits, rank = lz+1 capped 61), per
    round one (node, j) group-max over counters arriving along
    reversed edges, then the integer-exact estimate chain (dyadic
    power sum as hugeint) for the 20 smallest nodes."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    rcte = []
    for t in range(1, rounds + 1):
        rcte.append(f"""r{t} AS MATERIALIZED (
  SELECT node, j, max(r) AS r FROM (
    SELECT e.src AS node, p.j, p.r FROM edges e JOIN r{t - 1} p ON p.node = e.dst
    UNION ALL SELECT node, j, r FROM r{t - 1}
  ) GROUP BY node, j)""")
        rcte.append(f"""e{t} AS (
  SELECT s.node, {t}::bigint AS round,
         coalesce(sum(p.r), 0)::bigint AS reg_sum,
         coalesce(count(p.r), 0)::bigint AS cnt,
         coalesce(sum(1::hugeint << (61 - p.r)), 0)::hugeint AS snz
  FROM sample s LEFT JOIN r{t} p ON p.node = s.node
  GROUP BY s.node)""")
    sels = []
    for t in range(1, rounds + 1):
        sels.append(f"""SELECT round, node, reg_sum,
       round(CASE WHEN (0.7213 / (1 + 1.079 / 16.0)) * 16.0 * 16.0
                       * (1::hugeint << 61)::double
                       / ((16 - cnt) * (1::hugeint << 61) + snz)::double <= 2.5 * 16
                       AND (16 - cnt) > 0
                  THEN 16 * ln(16.0 / (16 - cnt))
                  ELSE (0.7213 / (1 + 1.079 / 16.0)) * 16.0 * 16.0
                       * (1::hugeint << 61)::double
                       / ((16 - cnt) * (1::hugeint << 61) + snz)::double
             END, 6) + 0.0 AS est
FROM e{t}""")
    body = "\nUNION ALL\n".join(sels)
    chain = ",\n".join(rcte)
    return f"""
WITH {_LINK_EDGES_CTE},
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
sample AS (SELECT node FROM nodes ORDER BY node LIMIT 20),
h0 AS (SELECT node, node::ubigint::hugeint AS x0 FROM nodes),
h1 AS (SELECT node, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT node, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT node, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT node, (h >> 60)::bigint AS j,
              CASE WHEN (h % (1::hugeint << 60)) = 0 THEN 61
                   ELSE least(65 - length(bin(((h % (1::hugeint << 60)) * 16)::ubigint::hugeint)), 61)
              END::bigint AS r
       FROM hf),
{chain}
{body}
ORDER BY round, node
"""


def _q_hyperanf(sf_dir: str) -> pa.Table:
    """HyperANF gate (Boldi, Rosa & Vigna WWW '11): per-node HLL
    counters of the out-reachability ball over the page link graph,
    three counter-union rounds shipped along reversed edges as two
    hash shuffles per round (no node-state broadcast), reported for
    the 20 smallest nodes as (round, node, integer register sum,
    estimate). The oracle replays the hash seeding, every round's
    group-max, and the dyadic-integer estimate chain."""
    from dcs_ray.functions.graph import hyperanf, hyperanf_sample_estimates

    edges = _link_edges_ds(sf_dir).materialize()
    small = np.empty(0, np.int64)
    for b in edges.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        vals = np.unique(np.concatenate((
            t["src"].to_numpy().astype(np.int64),
            t["dst"].to_numpy().astype(np.int64),
        )))
        small = np.unique(np.concatenate((small, vals)))[:20]
    rounds = hyperanf(edges, rounds=3)
    return hyperanf_sample_estimates(rounds, small.tolist())


def _q_kleinberg_bursts(sf_dir: str) -> pa.Table:
    """Kleinberg two-state burst detection (KDD '02) over the daily
    click stream: per-day (target, total) counts fold with one integer
    groupby; every 7th day's click count is deterministically tripled
    (capped at n) so real burst intervals exist; the two-state Viterbi
    runs day-by-day with ties to the quiet state. The oracle replays
    the fold, the injection, and the ENTIRE DP as a recursive CTE with
    the identical expression tree and tie rules."""
    from dcs_ray.functions.bursts import daily_type_counts, kleinberg_bursts

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    daily = daily_type_counts(ev, "click")
    day = daily["day"].to_numpy()
    r = daily["r"].to_numpy().astype(np.int64)
    n = daily["n"].to_numpy().astype(np.int64)
    r = np.where(day % 7 == 3, np.minimum(n, r * 3), r)
    daily = pa.table(
        {
            "day": daily["day"],
            "r": pa.array(r, pa.int64()),
            "n": daily["n"],
        }
    )
    return kleinberg_bursts(daily, s=2.0, gamma=1.0)


def _trustrank_sql() -> str:
    """TrustRank / spam-mass replay: the uniform PageRank chain and a
    seed-teleport (trusted nodes ≡ node % 10 = 0) chain composed in one
    statement — the personalized chain's CTE names are mechanically
    prefixed so both 5-iteration chains coexist; spam mass is computed
    from the ROUNDED ranks on both sides."""
    import re as _re

    uni = _pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)
    pers_full = _pagerank_sql(
        5, 0.85,
        edges_cte="edges AS (SELECT src, dst FROM EDGEBASE)",
        seeds_cte="seeds AS (SELECT node FROM nodes WHERE node % 10 = 0)",
    )
    pers = pers_full[len("WITH "): pers_full.rindex("\nSELECT node, round")]
    pers = _re.sub(
        r"\b(edges|nodes|nn|outdeg|tp|ns|seeds|dang\d+|c\d+|r\d+)\b",
        r"T\1", pers,
    )
    pers = pers.replace("EDGEBASE", "edges")
    return f"""
WITH {uni},
{pers},
comb AS (
  SELECT u.node, round(u.r, 6) + 0.0 AS pagerank, round(t.r, 6) + 0.0 AS trust
  FROM r5 u JOIN Tr5 t USING (node)),
sm AS (
  SELECT node, pagerank, trust,
         round(CASE WHEN pagerank > 0 THEN (pagerank - trust) / pagerank
                    ELSE 0.0 END, 6) + 0.0 AS spam_mass
  FROM comb)
SELECT node, pagerank, trust, spam_mass
FROM sm ORDER BY spam_mass DESC, node ASC LIMIT 20
"""


def _q_trustrank_spam_mass(sf_dir: str) -> pa.Table:
    """TrustRank spam-mass estimation (Gyongyi, Garcia-Molina &
    Pedersen, VLDB '04): rank trust propagated from a seed set (nodes
    ≡ 0 mod 10) via seed-teleport personalized PageRank next to the
    uniform PageRank; spam mass = (pr − trust)/pr. Pages whose rank
    comes mostly from untrusted regions of the graph float to the top
    — the classic link-spam demotion signal. Both chains reuse the
    engine's canonical-fold power iteration; the oracle composes both
    5-iteration replays in one statement."""
    from dcs_ray.functions.links import link_pagerank

    edges = _link_edges_ds(sf_dir).materialize()
    pr = link_pagerank(edges, n_iter=5, damping=0.85)
    nodes = pr["node"].to_numpy().astype(np.int64)
    seeds = [int(x) for x in nodes if x % 10 == 0]
    tr = link_pagerank(edges, n_iter=5, damping=0.85, seeds=seeds)
    prv = pr["rank"].to_numpy()
    trv = tr["rank"].to_numpy()  # node orders identical (sorted unique)
    assert np.array_equal(nodes, tr["node"].to_numpy().astype(np.int64))
    prv = np.round(prv, 6) + 0.0
    trv = np.round(trv, 6) + 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        sm = np.where(prv > 0, (prv - trv) / prv, 0.0)
    sm = np.round(sm, 6) + 0.0
    order = np.lexsort((nodes, -sm))[:20]
    return pa.table(
        {
            "node": pa.array(nodes[order], pa.int64()),
            "pagerank": pa.array(prv[order], pa.float64()),
            "trust": pa.array(trv[order], pa.float64()),
            "spam_mass": pa.array(sm[order], pa.float64()),
        }
    )


def _ring_sql() -> str:
    """Consistent-hash replay: ring positions for 8 nodes × 64 virtual
    nodes and the full corpus assignment counts under scenario 'full'
    plus scenario 'minus3' (node 3 removed) — one correlated first-
    position-clockwise lookup per key, wrap via the global ring min."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)

    def chain(expr):
        x0 = f"xor(({expr})::ubigint, 0::ubigint)::hugeint"
        x1 = _mulmod64(f"xor(({x0})::ubigint, ({x0})::ubigint >> 30)::hugeint", MIX1 + "::hugeint")
        x2 = _mulmod64(f"xor(({x1})::ubigint, ({x1})::ubigint >> 27)::hugeint", MIX2 + "::hugeint")
        return f"xor(({x2})::ubigint, ({x2})::ubigint >> 31)::hugeint"

    return f"""
WITH ring AS MATERIALIZED (
  SELECT node, v, {chain("node * 1024 + v")} AS pos
  FROM (SELECT unnest(range(8)) AS node), (SELECT unnest(range(64)) AS v)),
keys AS MATERIALIZED (
  SELECT doc_id, {chain("doc_id")} AS h FROM documents),
scen AS (SELECT unnest(['full', 'minus3']) AS scenario),
live AS (SELECT s.scenario, r.node, r.pos FROM scen s JOIN ring r
         ON s.scenario = 'full' OR r.node <> 3),
ass AS (
  SELECT s.scenario, k.doc_id,
         coalesce(
           (SELECT l.node FROM live l WHERE l.scenario = s.scenario
              AND l.pos >= k.h ORDER BY l.pos, l.node LIMIT 1),
           (SELECT l.node FROM live l WHERE l.scenario = s.scenario
            ORDER BY l.pos, l.node LIMIT 1)) AS node
  FROM keys k, scen s)
SELECT scenario, node, count(*)::bigint AS n_keys
FROM ass GROUP BY scenario, node ORDER BY scenario, node
"""


def _q_consistent_hash(sf_dir: str) -> pa.Table:
    """Consistent-hash ring gate (Karger '97): per-node key counts over
    the corpus for the full 8-node ring and with node 3 removed; the
    removal-stability invariant (only node 3's keys move) is asserted
    inline. Both scenarios' assignment replays in SQL via the
    first-position-clockwise rule."""
    from dcs_ray.functions.ring import assign_keys, removal_stability

    keys = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    nodes = list(range(8))
    a = assign_keys(keys, nodes, vnodes=64)
    b = assign_keys(keys, [n for n in nodes if n != 3], vnodes=64)
    stab = removal_stability(keys, nodes, removed=3, vnodes=64)
    assert stab["moved_not_owned"] == 0, stab
    assert stab["moved"] == stab["owned_by_removed"], stab
    return pa.table(
        {
            "scenario": pa.array(
                ["full"] * len(a) + ["minus3"] * len(b), pa.string()
            ),
            "node": pa.concat_arrays(
                [a["node"].combine_chunks(), b["node"].combine_chunks()]
            ),
            "n_keys": pa.concat_arrays(
                [a["n_keys"].combine_chunks(), b["n_keys"].combine_chunks()]
            ),
        }
    )


def _q_bm25plus_topk(sf_dir: str) -> pa.Table:
    """BM25+ retrieval (Lv & Zhai CIKM '11, delta=1): the per-present-
    term lower bound that fixes BM25's long-document over-penalization
    — completing the probabilistic family next to the exact-BM25,
    MaxScore and BMW paths; same fan-out, oracle replays the delta'd
    saturation term for term."""
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10, method="bm25plus")
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()),
        }
    )


_ALERT_QUERIES = [
    ["join", "merge"], ["spark", "window"], ["customer", "value"],
    ["data", "stream", "fast"], ["sort", "key", "table"],
    ["slow", "filter"], ["group", "query", "row"], ["batch", "line"],
]


def _q_prospective_alerts(sf_dir: str) -> pa.Table:
    """Prospective search / selective dissemination (SIFT — Yan &
    Garcia-Molina TODS '94; the Google-Alerts shape): eight standing
    conjunctive queries compiled into a broadcast term→query CSR, the
    document stream probed per batch with zero shuffles, alert on
    all-terms containment. Output (query_id, n_alerts) plus the first
    five matching doc ids per query (deterministic head); the oracle
    replays containment with tokenized EXISTS-all joins."""
    import ray as _ray

    from dcs_ray.functions.prospective import compile_queries, match_stream

    comp_ref = _ray.put(compile_queries(_ALERT_QUERIES))
    ds = match_stream(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        comp_ref,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    qid = t["query_id"].to_numpy()
    did = t["doc_id"].to_numpy()
    rows = {"query_id": [], "n_alerts": [], "head_docs": []}
    for q in range(len(_ALERT_QUERIES)):
        docs_q = np.sort(did[qid == q])
        rows["query_id"].append(q)
        rows["n_alerts"].append(len(docs_q))
        rows["head_docs"].append(",".join(str(int(x)) for x in docs_q[:5]))
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "n_alerts": pa.array(rows["n_alerts"], pa.int64()),
            "head_docs": pa.array(rows["head_docs"], pa.string()),
        }
    )


def _alerts_sql() -> str:
    parts = []
    for qi, q in enumerate(_ALERT_QUERIES):
        uq = sorted(set(q))
        inl = ", ".join(f"'{t}'" for t in uq)
        parts.append(f"""SELECT {qi}::bigint AS query_id,
       count(*)::bigint AS n_alerts,
       coalesce(string_agg(doc_id, ',' ORDER BY doc_id)
                FILTER (WHERE rn <= 5), '') AS head_docs
FROM (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM (SELECT doc_id FROM tok WHERE term IN ({inl})
        GROUP BY doc_id HAVING count(DISTINCT term) = {len(uq)}))""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS ({_TOK})
{body}
ORDER BY query_id
"""


def _q_related_queries(sf_dir: str) -> pa.Table:
    """Related-searches mining (the query-clustering signal of
    Beeferman & Berger KDD '00): queries co-issued within a session
    vote for relatedness. The 20k-request synthetic stream (the static-
    cache gate's log) splits into 10-request sessions; co-occurrence
    counts run through the bucketed ``copair_counts`` kernel (one
    lexsort per bucket, multiplicity = product of within-session
    occurrence counts, self-pairs dropped); top-20 pairs reported.
    Oracle replays the stream, the session split, and the pair
    multiplicities with a per-session count self-join."""
    from dcs_ray.functions.cachesim import synth_query_stream
    from dcs_ray.functions.links import copair_counts

    log = synth_query_stream(20000, 200, seed=21)

    def with_session(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "session": pa.array(
                    b["request"].to_numpy() // 10, pa.int64()
                ),
                "query_id": b["query_id"],
            }
        )

    pairs = copair_counts(
        log.map_batches(with_session, batch_format="pyarrow"),
        group_col="session",
        pair_col="query_id",
    )
    t = pa.concat_tables(
        [pa.table(b) for b in pairs.iter_batches(batch_format="pyarrow")]
    )
    a = t["id_a"].to_numpy().astype(np.int64)
    b_ = t["id_b"].to_numpy().astype(np.int64)
    n = t["n_shared"].to_numpy().astype(np.int64)
    order = np.lexsort((b_, a, -n))[:20]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "query_a": pa.array(a[order], pa.int64()),
            "query_b": pa.array(b_[order], pa.int64()),
            "n_sessions": pa.array(n[order], pa.int64()),
        }
    )


def _q_winnowing_fingerprints(sf_dir: str) -> pa.Table:
    """Winnowing fingerprint gate (Schleimer-Wilkerson-Aiken MOSS,
    SIGMOD '03): per-doc count of selected fingerprint positions over
    5-char grams with window 4 — guarantees any shared substring of
    length >= 8 shares a fingerprint; the partial-overlap near-dup
    family next to MinHash/SimHash. Gram hashes are the engine's
    canonical string hash, replayed by the shared integer-SQL chain;
    the window minimum + rightmost-tie selection replays with a frame
    min and a position join."""
    from dcs_ray.functions.winnow import winnowing_fingerprint_counts

    ds = winnowing_fingerprint_counts(
        read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        k=5, w=4,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_combmnz_fusion(sf_dir: str) -> pa.Table:
    """CombMNZ metasearch fusion (Fox & Shaw, TREC-2 '94): BM25,
    Dirichlet-QL (mu=300) and Jelinek-Mercer (lambda=0.3) each retrieve
    top-20; every system's scores are min-max normalized over its own
    list, and the fused score is (sum of normalized scores) x (number
    of systems retrieving the doc) — the score-based fusion classic
    next to the rank-based RRF gate. Fixed fold order bm25+qld+jm; the
    oracle replays all three score chains, the per-system min-max and
    the MNZ product."""
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    runs = [
        search_bm25(idx, [BM25_QUERY], k=20),
        search_lm(idx, [BM25_QUERY], k=20, model="qld", mu=300.0),
        search_lm(idx, [BM25_QUERY], k=20, model="jm", lam=0.3),
    ]
    norm = {}
    for si, t in enumerate(runs):
        ids = t["doc_id"].to_numpy().astype(np.int64)
        sc = t["score"].to_numpy()
        mn, mx = float(sc.min()), float(sc.max())
        ns = np.ones(len(sc)) if mx == mn else (sc - mn) / (mx - mn)
        for d, v in zip(ids, ns):
            norm.setdefault(int(d), [0.0, 0.0, 0.0, 0])[si] = float(v)
            norm[int(d)][3] += 1
    docs = np.array(sorted(norm), np.int64)
    fused = np.array(
        [(norm[d][0] + norm[d][1] + norm[d][2]) * norm[d][3] for d in docs]
    )
    fused = np.round(fused, 6) + 0.0
    order = np.lexsort((docs, -fused))[:10]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(docs[order], pa.int64()),
            "mnz_score": pa.array(fused[order], pa.float64()),
        }
    )


def _q_bm25_proximity(sf_dir: str) -> pa.Table:
    """Term-proximity-boosted BM25 (Tao & Zhai SIGIR '07 shape): the
    BM25 top-50 is re-ranked by adding ln(1 + 1/(1 + d_min)) where
    d_min is the minimum byte distance between occurrences of any two
    DISTINCT query terms — occurrences served by the positional trigram
    index (the exact-literal machinery of the grep gates, substring
    semantics), so document text is never touched engine-side. The
    oracle recomputes occurrences with a position scan over the
    candidate docs only and replays the boost."""
    import math as _math

    from dcs_ray.search import _open, positional_matches_shard, search_bm25, shard_paths

    widx = _index_dir(sf_dir, "words")
    tidx = _index_dir(sf_dir, "trigram")
    t = search_bm25(widx, [BM25_QUERY], k=50)
    cand = t["doc_id"].to_numpy().astype(np.int64)
    base = t["score"].to_numpy()
    terms = sorted(set(BM25_QUERY.split()))
    occ: dict[str, dict[int, list[int]]] = {w: {} for w in terms}
    cset = set(int(x) for x in cand)
    for sp in shard_paths(tidx):
        seg = _open(sp)
        for w in terms:
            d, p = positional_matches_shard(seg, w)
            for dd, pp in zip(d.astype(np.int64), p.astype(np.int64)):
                if int(dd) in cset:
                    occ[w].setdefault(int(dd), []).append(int(pp))
    boost = np.zeros(len(cand))
    for i, d in enumerate(cand):
        dmin = None
        for ai in range(len(terms)):
            pa_ = occ[terms[ai]].get(int(d))
            if not pa_:
                continue
            for bi in range(ai + 1, len(terms)):
                pb = occ[terms[bi]].get(int(d))
                if not pb:
                    continue
                a_arr = np.sort(np.asarray(pa_, np.int64))
                b_arr = np.sort(np.asarray(pb, np.int64))
                pos = np.searchsorted(a_arr, b_arr)
                cd = []
                m = pos < len(a_arr)
                cd.append(np.abs(a_arr[np.minimum(pos, len(a_arr) - 1)][m] - b_arr[m]))
                m2 = pos > 0
                cd.append(np.abs(a_arr[np.maximum(pos - 1, 0)][m2] - b_arr[m2]))
                dd_ = int(np.min(np.concatenate(cd)))
                dmin = dd_ if dmin is None else min(dmin, dd_)
        if dmin is not None:
            boost[i] = _math.log(1 + 1.0 / (1 + dmin))
    fused = np.round(base + boost, 6) + 0.0
    order = np.lexsort((cand, -fused))[:10]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(cand[order], pa.int64()),
            "score": pa.array(fused[order], pa.float64()),
        }
    )


def _q_rm3_expansion(sf_dir: str) -> pa.Table:
    """RM3 relevance-model query expansion (Lavrenko & Croft SIGIR '01;
    RM3 interpolation per Abdul-Jaleel '04): the Dirichlet-QL top-10
    docs weighted by softmax of their log-likelihoods, RM1(w) =
    Σ_d w_d·tf_w,d/dl_d, interpolated with the uniform original-query
    model at α=0.5 — the LM-family pseudo-relevance feedback next to
    the Rocchio gate. Output: top-10 expansion terms by weight. The
    oracle replays the QLD chain, the softmax, and both models."""
    import pyarrow.dataset as pads

    from dcs_ray.search import search_lm
    from dcs_ray.tokenize import word_tokens_flat

    idx = _index_dir(sf_dir, "words")
    t = search_lm(idx, [BM25_QUERY], k=10, model="qld", mu=300.0)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    sc = t["score"].to_numpy()
    mx = float(sc.max())
    ex = np.exp(sc - mx)
    wd = ex / float(np.sum(ex))
    dt = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        filter=pads.field("doc_id").isin(ids.tolist()),
        columns=["doc_id", "text"],
    )
    flat, parents = word_tokens_flat(dt["text"])
    toks = np.asarray(flat.to_pylist(), dtype=object)
    row_ids = dt["doc_id"].to_numpy().astype(np.int64)
    pos = {int(d): i for i, d in enumerate(row_ids)}
    w_of_row = np.zeros(len(dt))
    for d, w in zip(ids, wd):
        w_of_row[pos[int(d)]] = w
    dl = np.bincount(parents, minlength=len(dt)).astype(np.float64)
    # rm1 per term: sum over rows of w_row * tf/dl
    order = np.lexsort((toks, parents))
    tp, pp = toks[order], parents[order]
    new = np.concatenate(([True], (pp[1:] != pp[:-1]) | (tp[1:] != tp[:-1])))
    starts = np.flatnonzero(new)
    cnt = np.diff(np.concatenate((starts, [len(tp)]))).astype(np.float64)
    gterm, gdoc = tp[starts], pp[starts]
    contrib = w_of_row[gdoc] * (cnt / dl[gdoc])
    uniq_terms, tinv = np.unique(gterm, return_inverse=True)
    rm1 = np.bincount(tinv, weights=contrib, minlength=len(uniq_terms))
    qterms = BM25_QUERY.split()
    pq = {t_: qterms.count(t_) / len(qterms) for t_ in set(qterms)}
    rm3 = 0.5 * rm1 + 0.5 * np.array(
        [pq.get(str(w), 0.0) for w in uniq_terms]
    )
    rm3 = np.round(rm3, 6) + 0.0
    o = np.lexsort((uniq_terms, -rm3))[:10]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(o) + 1), pa.int64()),
            "term": pa.array([str(x) for x in uniq_terms[o]], pa.string()),
            "weight": pa.array(rm3[o], pa.float64()),
        }
    )


def _q_chunk_dedup(sf_dir: str) -> pa.Table:
    """Chunk-level cross-document dedup gate (the line/paragraph dedup
    of CCNet/RefinedWeb curation, on 16-token windows): every doc in a
    4-doc group is prefixed with its group leader's first-16-token
    prefix, so chunk 0 duplicates across the group and dedup must keep
    only the lexicographically first (doc, chunk) copy. One hash
    groupby whose fold emits the survivor; per-doc integer stats
    (n_chunks, n_kept, kept_tokens). Prefix side-table built in one
    column pass and broadcast (at corpus scale it is a stored side
    table, not a driver dict)."""
    from dcs_ray.functions.textprep import chunk_dedup_stats, chunk_documents
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    prefixes = {}
    for b in docs.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        flat, parents = word_tokens_flat(t["text"])
        toks = np.asarray(flat.to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        cnt = np.bincount(parents, minlength=len(t))
        offs = np.concatenate(([0], np.cumsum(cnt)))
        for i, d in enumerate(ids):
            prefixes[int(d)] = " ".join(
                toks[offs[i]: offs[i] + min(16, cnt[i])]
            )
    pref_ref = ray.put(prefixes)

    def inject(b: pa.Table) -> pa.Table:
        pr = ray.get(pref_ref)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        texts = b["text"].to_pylist()
        out = [
            pr.get(int(d - d % 4), "") + " " + tx
            for d, tx in zip(ids, texts)
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "text": pa.array(out, pa.string())}
        )

    injected = docs.map_batches(inject, batch_format="pyarrow")
    ch = chunk_documents(injected, chunk_tokens=16)
    out = chunk_dedup_stats(ch)
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_mi_feature_selection(sf_dir: str) -> pa.Table:
    """Mutual-information feature selection for text classification
    (Manning/Raghavan/Schutze IIR ch.13, the 2x2 doc-level contingency
    form): MI(t, lang='en') from integer presence counts — the feature-
    ranking step in front of the NB classifier gates. One distinct
    (doc, term) presence pass + per-term integer folds; the MI
    arithmetic runs the identical 4-cell expression tree in numpy and
    SQL. Top-15 terms by (rounded MI desc, term asc)."""
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    acc: dict[str, list[int]] = {}
    n_docs = 0
    n_en = 0
    for b in docs.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        flat, parents = word_tokens_flat(t["text"])
        toks = np.asarray(flat.to_pylist(), dtype=object)
        en = (np.asarray(t["lang"].to_pylist(), dtype=object) == "en")
        n_docs += len(t)
        n_en += int(en.sum())
        order = np.lexsort((toks, parents))
        tp, pp = toks[order], parents[order]
        first = np.concatenate(([True], (pp[1:] != pp[:-1]) | (tp[1:] != tp[:-1])))
        tp, pp = tp[first], pp[first]
        en_row = en[pp]
        # vectorized per-term presence partials: one unique + 2 bincounts
        uterms, tinv = np.unique(tp, return_inverse=True)
        c11 = np.bincount(tinv, weights=en_row.astype(np.float64))
        c10 = np.bincount(tinv, weights=(~en_row).astype(np.float64))
        for term, a_, b_ in zip(uterms, c11.astype(np.int64), c10.astype(np.int64)):
            cur = acc.setdefault(str(term), [0, 0])
            cur[0] += int(a_)
            cur[1] += int(b_)
    terms = sorted(acc)
    n11 = np.array([acc[t][0] for t in terms], np.float64)
    n10 = np.array([acc[t][1] for t in terms], np.float64)
    N = float(n_docs)
    Nc = float(n_en)
    n01 = Nc - n11
    n00 = (N - Nc) - n10
    nr1 = n11 + n10
    nr0 = N - nr1

    def cell(n, r, c):
        with np.errstate(divide="ignore", invalid="ignore"):
            v = (n / N) * np.log2((N * n) / (r * c))
        return np.where(n > 0, v, 0.0)

    mi = cell(n11, nr1, Nc) + cell(n10, nr1, N - Nc) \
        + cell(n01, nr0, Nc) + cell(n00, nr0, N - Nc)
    mi = np.round(mi, 6) + 0.0
    ta = np.asarray(terms, dtype=object)
    order = np.lexsort((ta, -mi))[:15]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "term": pa.array([str(x) for x in ta[order]], pa.string()),
            "mi": pa.array(mi[order], pa.float64()),
        }
    )


def _q_tput_topk(sf_dir: str) -> pa.Table:
    """TPUT exact distributed top-k (Cao & Wang PODC '04, the
    three-phase refinement of Fagin's threshold algorithm): the three
    ranking systems' min-max-normalized top-20 lists act as the m=3
    remote score lists (absent ⇒ 0); phase 1 fetches each list's
    top-5 and sets tau1 = 5th-best partial sum; phase 2 ships every
    list entry >= tau1/3 and prunes docs whose upper bound
    (partial2 + tau1/3 per unseen list) misses tau2; phase 3 resolves
    candidates exactly. Output: exact top-5 with the phase-2 shipped-
    row and candidate counters — the integers that prove the pruning
    replay. All partial sums are fixed-order 3-term adds (bm25, qld,
    jm) on both sides."""
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    runs = [
        search_bm25(idx, [BM25_QUERY], k=20),
        search_lm(idx, [BM25_QUERY], k=20, model="qld", mu=300.0),
        search_lm(idx, [BM25_QUERY], k=20, model="jm", lam=0.3),
    ]
    lists = []
    for t in runs:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        sc = t["score"].to_numpy()
        mn, mx = float(sc.min()), float(sc.max())
        ns = np.ones(len(sc)) if mx == mn else (sc - mn) / (mx - mn)
        lists.append(dict(zip(ids.tolist(), ns.tolist())))
    m_sys = 3
    k = 5

    def psum(d):
        return (
            lists[0].get(d, 0.0) + lists[1].get(d, 0.0) + lists[2].get(d, 0.0)
        )

    # phase 1: top-k per list by (score desc, doc asc)
    seen1 = set()
    for L in lists:
        top = sorted(L.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        seen1.update(d for d, _ in top)
    # partial sums over phase-1 KNOWLEDGE: only scores from lists where
    # the doc was inside that list's top-k
    p1 = {}
    for d in seen1:
        s = 0.0
        for L in lists:
            top = sorted(L.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            if d in dict(top):
                s = s + L[d]
        p1[d] = s
    tau1 = sorted(p1.values(), reverse=True)[k - 1] if len(p1) >= k else 0.0
    T = tau1 / m_sys
    # phase 2: ship everything >= T
    sent = [
        {d: v for d, v in L.items() if v >= T} for L in lists
    ]
    n_sent = sum(len(s) for s in sent)
    docs2 = sorted(set().union(*[set(s) for s in sent]))
    p2 = {
        d: sent[0].get(d, 0.0) + sent[1].get(d, 0.0) + sent[2].get(d, 0.0)
        for d in docs2
    }
    tau2 = sorted(p2.values(), reverse=True)[k - 1] if len(p2) >= k else 0.0
    cand = [
        d for d in docs2
        if p2[d] + T * sum(1 for s in sent if d not in s) >= tau2
    ]
    n_cand = len(cand)
    # phase 3: exact
    exact = {d: psum(d) for d in cand}
    order = sorted(exact.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array([d for d, _ in order], pa.int64()),
            "sum_score": pa.array(
                [round(v, 6) + 0.0 for _, v in order], pa.float64()
            ),
            "phase2_rows": pa.array([n_sent] * len(order), pa.int64()),
            "n_candidates": pa.array([n_cand] * len(order), pa.int64()),
        }
    )


def _q_impact_quantized(sf_dir: str) -> pa.Table:
    """Impact-ordered quantized ranking (Anh & Moffat, SIGIR '06
    family): per-term BM25 contributions are quantized to 8-bit
    integer impacts, 1 + floor(254·s/max_s(term)), and ranking is the
    INTEGER impact sum — the precomputed-impact serving tier that
    replaces float scoring with small-int adds at query time (ties to
    the smaller doc id). Impacts derive from the per-worker term score
    vectors (the ST2 cache); the oracle replays the per-term
    quantization and the integer sum — an all-integer gate."""
    from dcs_ray.search import (
        _open, _term_scores_cached, bm25_idf, global_df, load_stats,
        plan_queries, shard_paths,
    )

    idx = _index_dir(sf_dir, "words")
    stats = load_stats(idx)
    terms = sorted(set(BM25_QUERY.split()))
    dfs = global_df(idx, terms)
    per_term: dict[str, tuple[list, list]] = {t: ([], []) for t in terms}
    for sp in shard_paths(idx):
        seg = _open(sp)
        for t_ in terms:
            ti = seg.term_index(t_)
            if ti < 0:
                continue
            idf = bm25_idf(int(dfs.get(t_, 0)), int(stats["n_docs"]))
            d, s = _term_scores_cached(seg, ti, idf, stats)
            per_term[t_][0].append(d.astype(np.int64))
            per_term[t_][1].append(s)
    acc: dict[int, int] = {}
    for t_ in terms:
        if not per_term[t_][0]:
            continue
        d = np.concatenate(per_term[t_][0])
        s = np.concatenate(per_term[t_][1])
        m = float(s.max())
        imp = (1 + np.floor(254.0 * s / m)).astype(np.int64)
        for dd, ii in zip(d, imp):
            acc[int(dd)] = acc.get(int(dd), 0) + int(ii)
    docs = np.array(sorted(acc), np.int64)
    val = np.array([acc[d] for d in docs], np.int64)
    order = np.lexsort((docs, -val))[:10]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(docs[order], pa.int64()),
            "impact": pa.array(val[order], pa.int64()),
        }
    )


_BLOOM_PROBE_TERMS = ["join", "nosuchterm12345", "pmark0", "pmark3", "pmark7", "spark"]


def _q_partition_bloom_pruning(sf_dir: str) -> pa.Table:
    """Per-partition term Bloom filters for selective index reads (the
    Bloom-skip sidecar next to the zone maps): each range partition
    builds a 4096-bit k=7 double-hashing Bloom over its DISTINCT terms
    (canonical string hash; h2 = splitmix(h1)|1), and a query term
    probes all partitions — bloom_hit=0 is a guaranteed skip. Output
    (term, partition, bloom_hit, actual) for six probe terms; the FP
    gap between the columns IS the filter's measured precision, and
    the oracle replays every bit position."""
    from dcs_ray.functions.sketches import (
        _hash64_column, bloom_from_hashes, bloom_might_contain,
    )
    from dcs_ray.tokenize import word_tokens_flat

    P = 8
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    id_max = 0
    part_terms: list[set] = [set() for _ in range(P)]
    for b in docs.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        id_max = max(id_max, int(ids.max()))
    span = (id_max + P) // P
    for b in docs.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        part = np.minimum(ids // span, P - 1)
        # per-partition marker token makes partition-selective terms
        # exist (the synthetic corpus's vocabulary is uniform), so the
        # gate exercises real skips, not just all-hit rows
        texts = pa.array(
            [f"pmark{int(p_)} {tx}" for p_, tx in zip(part, t["text"].to_pylist())],
            pa.string(),
        )
        flat, parents = word_tokens_flat(texts)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        pr = part[parents]
        for p in range(P):
            part_terms[p].update(map(str, np.unique(toks[pr == p])))
    blooms = []
    for p in range(P):
        terms_sorted = sorted(part_terms[p])
        h = _hash64_column(pa.array(terms_sorted, pa.string())) if terms_sorted \
            else np.empty(0, np.uint64)
        blooms.append(bloom_from_hashes(h, m_log2=12, k=7))
    probe_h = _hash64_column(pa.array(_BLOOM_PROBE_TERMS, pa.string()))
    rows = {"term": [], "partition": [], "bloom_hit": [], "actual": []}
    for ti, term in enumerate(_BLOOM_PROBE_TERMS):
        for p in range(P):
            hit = bool(
                bloom_might_contain(
                    blooms[p], probe_h[ti: ti + 1], m_log2=12, k=7
                )[0]
            )
            rows["term"].append(term)
            rows["partition"].append(p)
            rows["bloom_hit"].append(int(hit))
            rows["actual"].append(int(term in part_terms[p]))
    t = pa.table(
        {
            "term": pa.array(rows["term"], pa.string()),
            "partition": pa.array(rows["partition"], pa.int64()),
            "bloom_hit": pa.array(rows["bloom_hit"], pa.int64()),
            "actual": pa.array(rows["actual"], pa.int64()),
        }
    )
    return t.sort_by([("term", "ascending"), ("partition", "ascending")])


def _q_lang_rank_profile(sf_dir: str) -> pa.Table:
    """Cavnar-Trenkle '94 n-gram rank-profile language identification:
    per-language top-50 char-trigram rank profiles trained on the
    corpus's own labels, each doc classified by the out-of-place
    distance of its top-20 profile (penalty 50 for unranked grams,
    ties to the smaller language) — the integer-exact classic next to
    the marker-based langid and NB gates. First 50 docs reported with
    predictions and distances."""
    import pyarrow.dataset as pads
    import ray as _ray

    from dcs_ray.functions.langprofile import (
        classify_rank_profile, train_lang_profiles,
    )

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).materialize()
    profs = train_lang_profiles(docs, k=50)
    ref = _ray.put(profs)
    out = classify_rank_profile(docs, ref, doc_k=20, k=50)
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    keep = t.filter(pc.less(t["doc_id"], 50)).sort_by("doc_id")
    actual = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        filter=pads.field("doc_id") < 50, columns=["doc_id", "lang"]
    ).sort_by("doc_id")
    return pa.table(
        {
            "doc_id": keep["doc_id"].cast(pa.int64()),
            "pred_lang": keep["pred_lang"],
            "actual_lang": actual["lang"],
            "dist": keep["dist"],
        }
    )


def _q_borda_fusion(sf_dir: str) -> pa.Table:
    """Borda-count rank fusion (the positional voting rule of Aslam &
    Montague SIGIR '01 "Models for metasearch"): each of the three
    ranking systems' top-20 awards 21 − rank points; unranked docs get
    0. Fully INTEGER — the rank-based companion of RRF (reciprocal)
    and CombMNZ (score-based). Top-10 by (points desc, doc asc)."""
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    runs = [
        search_bm25(idx, [BM25_QUERY], k=20),
        search_lm(idx, [BM25_QUERY], k=20, model="qld", mu=300.0),
        search_lm(idx, [BM25_QUERY], k=20, model="jm", lam=0.3),
    ]
    pts: dict[int, int] = {}
    for t in runs:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        rank = t["rank"].to_numpy().astype(np.int64)
        for d, r in zip(ids, rank):
            pts[int(d)] = pts.get(int(d), 0) + (21 - int(r))
    docs = np.array(sorted(pts), np.int64)
    val = np.array([pts[d] for d in docs], np.int64)
    order = np.lexsort((docs, -val))[:10]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(docs[order], pa.int64()),
            "borda_points": pa.array(val[order], pa.int64()),
        }
    )


def _q_focused_hits(sf_dir: str) -> pa.Table:
    """Focused-subgraph HITS — the FULL Kleinberg '98 procedure, not
    just the iteration: the query's BM25 top-10 forms the ROOT set,
    the base set adds every 1-hop in/out neighbor, and HITS runs on
    the induced subgraph only — query-dependent hubs/authorities (the
    original "Authoritative sources in a hyperlinked environment"
    pipeline). Root retrieval, base expansion, edge induction and all
    five L1-normalized iterations replay in one SQL statement."""
    from dcs_ray.functions.links import link_hits
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    root = set(
        int(x)
        for x in search_bm25(idx, [BM25_QUERY], k=10)["doc_id"].to_numpy()
    )
    edges = _link_edges_ds(sf_dir).materialize()
    base = set(root)
    for b in edges.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        sm = np.isin(s, list(root))
        dm = np.isin(d, list(root))
        base.update(int(x) for x in d[sm])
        base.update(int(x) for x in s[dm])
    base_arr = np.array(sorted(base), np.int64)
    bref = ray.put(base_arr)

    def induce(b: pa.Table) -> pa.Table:
        ba = ray.get(bref)
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        keep = np.isin(s, ba) & np.isin(d, ba)
        return b.filter(pa.array(keep))

    induced = edges.map_batches(induce, batch_format="pyarrow")
    t = link_hits(induced, n_iter=5)
    return t.sort_by("node")


def _focused_hits_sql() -> str:
    """Kleinberg base-set HITS replay: the link-edge synthesis renamed
    to ``rawe``, the BM25 root chain, the 1-hop base expansion, the
    induced ``edges`` CTE, then the shared 5-iteration HITS chain."""
    ec = _LINK_EDGES_CTE.replace("edges AS (", "rawe AS (", 1)
    composite = f"""{ec},
{_BM25_SCORES},
root AS MATERIALIZED (SELECT doc_id AS node FROM scores
                      ORDER BY score DESC, doc_id ASC LIMIT 10),
base AS MATERIALIZED (SELECT DISTINCT node FROM (
  SELECT node FROM root
  UNION ALL SELECT r.dst FROM rawe r JOIN root ON r.src = root.node
  UNION ALL SELECT r.src FROM rawe r JOIN root ON r.dst = root.node)),
edges AS (SELECT r.src, r.dst FROM rawe r
          JOIN base b1 ON r.src = b1.node JOIN base b2 ON r.dst = b2.node)"""
    return _hits_sql(k=5, edges_cte=composite)


def _q_serp_diversity(sf_dir: str) -> pa.Table:
    """SERP provider-diversity telemetry: Simpson concentration
    λ = Σp², effective provider count 1/λ, and Shannon entropy (bits)
    of the source distribution of the BM25 top-20 — the anti-
    domination dashboard metric behind the per-host result caps
    (`bm25_top2_per_source` enforces; this measures). Counts are
    integers; the index arithmetic replays with one expression tree."""
    import math as _math

    import pyarrow.dataset as pads

    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=20)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    src_t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        filter=pads.field("doc_id").isin(ids.tolist()),
        columns=["doc_id", "source"],
    )
    srcs = dict(zip(src_t["doc_id"].to_numpy().astype(np.int64),
                    src_t["source"].to_pylist()))
    counts: dict[str, int] = {}
    for d in ids:
        s = srcs[int(d)]
        counts[s] = counts.get(s, 0) + 1
    n = len(ids)
    simpson = 0.0
    shannon = 0.0
    for s in sorted(counts):  # fixed fold order for the float sums
        p = counts[s] / n
        simpson = simpson + p * p
        shannon = shannon + (-(p) * _math.log2(p))
    return pa.table(
        {
            "n_results": pa.array([n], pa.int64()),
            "n_sources": pa.array([len(counts)], pa.int64()),
            "simpson": pa.array([round(simpson, 6) + 0.0], pa.float64()),
            "effective_sources": pa.array(
                [round(1.0 / simpson, 6) + 0.0], pa.float64()
            ),
            "shannon_bits": pa.array([round(shannon, 6) + 0.0], pa.float64()),
        }
    )


def _q_ab_ztest(sf_dir: str) -> pa.Table:
    """Online-experiment readout: two-proportion z-test of overall CTR
    between the two interleaved ranking variants of the PBM click log
    (the standard A/B significance test; pooled variance form):

        z = (p0 − p1) / sqrt(p̂(1−p̂)(1/n0 + 1/n1))

    Impression/click counts are the integer folds of the CTR gate; the
    z arithmetic runs one fixed expression tree on both sides."""
    import math as _math

    from dcs_ray.functions.clickmodel import ctr_by_position, synth_click_log
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    log = synth_click_log(t["doc_id"].to_pylist(), n_sessions=200, seed=7)
    c = ctr_by_position(log)
    v = c["variant"].to_numpy()
    n = c["impressions"].to_numpy().astype(np.int64)
    k = c["clicks"].to_numpy().astype(np.int64)
    n0, k0 = int(n[v == 0].sum()), int(k[v == 0].sum())
    n1, k1 = int(n[v == 1].sum()), int(k[v == 1].sum())
    p0 = k0 / n0
    p1 = k1 / n1
    pp = (k0 + k1) / (n0 + n1)
    z = (p0 - p1) / _math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    return pa.table(
        {
            "n0": pa.array([n0], pa.int64()),
            "clicks0": pa.array([k0], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "clicks1": pa.array([k1], pa.int64()),
            "ctr0": pa.array([round(p0, 6) + 0.0], pa.float64()),
            "ctr1": pa.array([round(p1, 6) + 0.0], pa.float64()),
            "z": pa.array([round(z, 6) + 0.0], pa.float64()),
        }
    )


def _ab_ztest_sql() -> str:
    """Two-proportion z-test replay on top of the CTR gate's click
    synthesis: fold to per-variant integer totals, then the pooled-
    variance z with the engine's expression tree."""
    full = _pbm_sql(n_sessions=200, seed=7, iters=1)
    head = full.split("alpha0 AS")[0].rstrip().rstrip(",")
    return head + """,
tot AS (SELECT variant, sum(n)::bigint AS n, sum(k)::bigint AS k
        FROM agg GROUP BY variant),
t0 AS (SELECT n, k FROM tot WHERE variant = 0),
t1 AS (SELECT n, k FROM tot WHERE variant = 1)
SELECT (SELECT n FROM t0) AS n0, (SELECT k FROM t0) AS clicks0,
       (SELECT n FROM t1) AS n1, (SELECT k FROM t1) AS clicks1,
       round((SELECT k FROM t0)::double / (SELECT n FROM t0), 6) + 0.0 AS ctr0,
       round((SELECT k FROM t1)::double / (SELECT n FROM t1), 6) + 0.0 AS ctr1,
       round(((SELECT k FROM t0)::double / (SELECT n FROM t0)
              - (SELECT k FROM t1)::double / (SELECT n FROM t1))
             / sqrt((((SELECT k FROM t0) + (SELECT k FROM t1))::double
                     / ((SELECT n FROM t0) + (SELECT n FROM t1)))
                    * (1.0 - ((SELECT k FROM t0) + (SELECT k FROM t1))::double
                             / ((SELECT n FROM t0) + (SELECT n FROM t1)))
                    * (1.0 / (SELECT n FROM t0) + 1.0 / (SELECT n FROM t1))), 6)
       + 0.0 AS z
"""


def _q_serp_abandonment(sf_dir: str) -> pa.Table:
    """Session-outcome telemetry over the cascade click log: click-
    through sessions, ABANDONED sessions (scanned everything, clicked
    nothing — the classic dissatisfaction proxy), success@k for
    k=1,3,5 (first click at rank <= k), and mean first-click rank over
    clicking sessions. All integer folds from the per-session
    first-click scan; one 6dp division per metric."""
    from dcs_ray.functions.clickmodel import synth_cascade_log
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    t = search_bm25(idx, [BM25_QUERY], k=10)
    log = synth_cascade_log(t["doc_id"].to_pylist(), n_sessions=400, seed=9)
    first: dict[int, int] = {}
    sessions = set()
    for b in log.iter_batches(batch_format="pyarrow"):
        bt = pa.table(b)
        s = bt["session"].to_numpy()
        p = bt["pos"].to_numpy()
        c = bt["click"].to_numpy()
        sessions.update(int(x) for x in np.unique(s))
        m = c == 1
        for ss, pp in zip(s[m], p[m]):
            first[int(ss)] = int(pp)  # cascade: at most one click
    n = len(sessions)
    clicked = len(first)
    fr = np.array(sorted(first.values()), np.int64)
    s1 = int((fr <= 1).sum())
    s3 = int((fr <= 3).sum())
    s5 = int((fr <= 5).sum())
    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "clicked": pa.array([clicked], pa.int64()),
            "abandoned": pa.array([n - clicked], pa.int64()),
            "abandonment_rate": pa.array(
                [round((n - clicked) / n, 6) + 0.0], pa.float64()
            ),
            "success_at_1": pa.array([round(s1 / n, 6) + 0.0], pa.float64()),
            "success_at_3": pa.array([round(s3 / n, 6) + 0.0], pa.float64()),
            "success_at_5": pa.array([round(s5 / n, 6) + 0.0], pa.float64()),
            "mean_first_click_rank": pa.array(
                [round(float(fr.sum()) / clicked, 6) + 0.0 if clicked else 0.0],
                pa.float64(),
            ),
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's correctness harness checks the first
    # 50 entries. Every SURVEY §2-mapped operator gate and the flagship
    # LLM-pipeline compositions come first (search/index core, then the
    # dedup/ANN/text-curation suite); auxiliary relational/window/sketch
    # gates follow — those stay covered by tests/test_entry_oracle.py at
    # both SFs regardless of the window.
    return {
        # --- search/index core (SURVEY §2: S/F/J/A/O/D/M/C rows) ---
        "bm25_topk": _q_bm25,
        "bm25_top2_per_source": _q_bm25_top2_per_source,
        "bm25_filtered": _q_bm25_filtered,
        "bm25_prior": _q_bm25_prior,
        "bm25_page2": _q_bm25_page2,
        "bm25_snippets": _q_bm25_snippets,
        "bm25_multi": _q_bm25_multi,
        "phrase_bm25": _q_phrase_bm25,
        "grep_literal": _q_grep_literal,
        "trigram_candidates": _q_trigram_candidates,
        "positional_match_count": _q_positional_matches,
        "proximity_search": _q_proximity_search,
        "regex_search": _q_regex_search,
        "filter_ignored": _q_filter_ignored,
        "term_df": _q_term_df,
        "corpus_stats": _q_corpus_stats,
        "lang_stats": _q_lang_stats,
        "latest_version_per_source": _q_latest_version_per_source,
        "latest_event_per_user": _q_latest_event,
        # --- flagship web-ranking chain (links → pagerank/anchors → rank) ---
        "bm25_anchor_topk": _q_bm25_anchor,
        "bm25_pagerank_prior": _q_bm25_pagerank,
        "link_pagerank": _q_link_pagerank,
        "personalized_pagerank": _q_personalized_pagerank,
        "host_rank_mass": _q_host_rank_mass,
        "link_hits": _q_link_hits,
        "cocitation_topk": _q_cocitation_topk,
        "coupling_topk": _q_coupling_topk,
        # --- flagship LLM-pipeline compositions ---
        "curate_corpus": _q_curate_corpus,
        "curate_web_corpus": _q_curate_web_corpus,
        "fuzzy_dedup_keep": _q_fuzzy_dedup,
        # --- dedup suite ---
        "dedup_exact": _q_dedup_exact,
        "minhash_pairs": _q_minhash_pairs,
        "jaccard_verified_pairs": _q_jaccard_verified,
        "connected_components": _q_connected_components,
        "cross_snapshot_dedup": _q_cross_snapshot_dedup,
        "simhash_signatures": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "duplicate_tile_spans": _q_duplicate_tile_spans,
        "text_near_dup_semantic": _q_text_near_dup_semantic,
        "remove_boilerplate": _q_remove_boilerplate,
        "paragraph_dedup": _q_paragraph_dedup,
        # --- similarity search / embeddings ---
        "knn_cosine": _q_knn,
        "knn_cosine_lsh": _q_knn_lsh,
        "knn_cosine_ivf": _q_knn_ivf,
        "lsh_bucket_assignment": _q_lsh_bucket_assignment,
        "ivf_list_assignment": _q_ivf_list_assignment,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "hash_embed_vectors": _q_hash_embed_vectors,
        # --- end of the driver's 50-query window ---
        "bm25_bmw": _q_bm25_bmw,
        "bm25_pr_eval": _q_bm25_pr_eval,
        "redde_collection_ranking": _q_redde_collection_ranking,
        "pbm_click_model": _q_pbm_click_model,
        "qljm_topk": _q_qljm_topk,
        "recrawl_priority": _q_recrawl_priority,
        "template_ngrams": _q_template_ngrams,
        "bm25f_topk": _q_bm25f_topk,
        "cascade_click_model": _q_cascade_click_model,
        "pairwise_ltr": _q_pairwise_ltr,
        "tfidf_cosine_index": _q_tfidf_cosine_topk,
        "query_selectivity": _q_query_selectivity,
        "dust_rules": _q_dust_rules,
        "crawl_budget": _q_crawl_budget,
        "serp_ctr_curve": _q_serp_ctr,
        "nqc_difficulty": _q_nqc_difficulty,
        "static_cache_hit_curve": _q_static_cache,
        "rbp_err_eval": _q_rbp_err_eval,
        "hyperanf_neighborhood": _q_hyperanf,
        "kleinberg_bursts": _q_kleinberg_bursts,
        "trustrank_spam_mass": _q_trustrank_spam_mass,
        "consistent_hash_ring": _q_consistent_hash,
        "bm25plus_topk": _q_bm25plus_topk,
        "prospective_alerts": _q_prospective_alerts,
        "related_queries": _q_related_queries,
        "winnowing_fingerprints": _q_winnowing_fingerprints,
        "combmnz_fusion": _q_combmnz_fusion,
        "bm25_proximity": _q_bm25_proximity,
        "rm3_expansion": _q_rm3_expansion,
        "chunk_dedup": _q_chunk_dedup,
        "mi_feature_selection": _q_mi_feature_selection,
        "tput_topk": _q_tput_topk,
        "impact_quantized_topk": _q_impact_quantized,
        "partition_bloom_pruning": _q_partition_bloom_pruning,
        "lang_rank_profile": _q_lang_rank_profile,
        "borda_fusion": _q_borda_fusion,
        "focused_hits": _q_focused_hits,
        "serp_diversity": _q_serp_diversity,
        "ab_ztest_clicks": _q_ab_ztest,
        "serp_abandonment": _q_serp_abandonment,
        "ef_posting_sizes": _q_ef_posting_sizes,
        "knn_cosine_ivf_hashmin": _q_knn_ivf_hashmin,
        "text_knn_hash_embed": _q_text_knn_hash_embed,
        "label_centroids": _q_label_centroids,
        "knn_label_classify": _q_knn_classify,
        "centroid_classify": _q_centroid_classify,
        "embedding_outliers": _q_embedding_outliers,
        # --- text analysis / filtering ---
        "token_count": _q_token_count,
        "quality_score": _q_quality,
        "quality_classifier": _q_quality_classifier,
        "nb_lang_classifier": _q_nb_lang_classifier,
        "nb_confusion": _q_nb_confusion,
        "distinctive_terms_by_lang": _q_distinctive_terms,
        "readability_scores": _q_readability,
        "token_entropy": _q_token_entropy,
        "bpe_token_count": _q_bpe_token_count,
        "langid": _q_langid,
        "doc_fingerprints": _q_fingerprints,
        "decontaminate": _q_decontaminate,
        "pii_scrub": _q_pii_scrub,
        "repetition_stats": _q_repetition_stats,
        "doc_lm_score": _q_doc_lm_score,
        "ccnet_perplexity_buckets": _q_ccnet_buckets,
        "tfidf_keywords": _q_tfidf_keywords,
        "related_terms_pmi": _q_related_terms,
        "autocomplete_prefix": _q_autocomplete,
        "next_word_suggest": _q_next_word_suggest,
        "autocomplete_suffix": _q_autocomplete_suffix,
        "stemmed_term_df": _q_stemmed_term_df,
        "bm25_eval_metrics": _q_bm25_eval,
        "bm25_pruned_topk": _q_bm25_pruned,
        "bm25_param_sweep": _q_bm25_tune,
        "more_like_this": _q_more_like_this,
        "bpe_word_counts": _q_bpe_word_counts,
        "bpe_merges": _q_bpe_merges,
        "bpe_subtoken_count": _q_bpe_subtoken_count,
        "dsir_weights": _q_dsir_weights,
        "dsir_select": _q_dsir_select,
        "pagerank_prior": _q_pagerank,
        # --- web link graph intermediates (chain gated above the window) ---
        "link_edges": _q_link_edges,
        "anchor_terms_topk": _q_anchor_terms_topk,
        "link_degree_stats": _q_link_degree_stats,
        "link_triangles": _q_link_triangles,
        "link_clustering": _q_link_clustering,
        "link_communities": _q_link_communities,
        "host_link_graph": _q_host_link_graph,
        "link_reachability": _q_link_reachability,
        "coupling_jaccard_topk": _q_coupling_jaccard,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "search_rrf": _q_search_rrf,
        "search_prf": _q_search_prf,
        "search_corrected": _q_search_corrected,
        "search_facets": _q_search_facets,
        "spell_suggest": _q_spell_suggest,
        "crawl_delta_stats": _q_crawl_delta,
        # --- training-data prep ---
        "rebalance_mixture": _q_rebalance_mixture,
        "train_val_test_split": _q_train_val_test_split,
        "training_shuffle_rank": _q_training_shuffle_rank,
        "pack_chunked": _q_pack_chunked,
        "chunk_documents": _q_chunk_documents,
        "pack_greedy": _q_pack_greedy,
        "tumbling_window_agg": _q_window_agg,
        "hopping_window_agg": _q_hopping_window,
        "session_window_agg": _q_session_window,
        "funnel_steps": _q_funnel_steps,
        "retention_cohorts": _q_retention_cohorts,
        "event_transitions": _q_event_transitions,
        "asof_join_purchase_view": _q_asof_join,
        "interval_join_views": _q_interval_join,
        "running_totals": _q_running_totals,
        "events_pivot": _q_events_pivot,
        "zscore_by_lang": _q_zscore_by_lang,
        "sample_fraction": _q_sample_fraction,
        "sample_stratified": _q_sample_stratified,
        "weighted_sample": _q_weighted_sample,
        "weighted_sample_by_lang": _q_weighted_sample_by_lang,
        "pricing_summary": _q_pricing_summary,
        "order_totals_by_nation": _q_order_totals_by_nation,
        "shipping_priority": _q_shipping_priority,
        "local_supplier_volume": _q_local_supplier_volume,
        "customer_returns": _q_customer_returns,
        "large_orders": _q_large_orders,
        "promo_revenue": _q_promo_revenue,
        "forecast_revenue": _q_forecast_revenue,
        "order_priority_counts": _q_order_priority_counts,
        "customer_order_histogram": _q_customer_order_histogram,
        "top_supplier": _q_top_supplier,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "host_cap_sample": _q_host_cap_sample,
        "daily_event_anomaly": _q_daily_event_anomaly,
        "volume_shipping": _q_volume_shipping,
        "market_share": _q_market_share,
        "daily_distinct_users": _q_daily_distinct_users,
        "nb_prf_metrics": _q_nb_prf_metrics,
        "kmv_distinct_users": _q_kmv_distinct_users,
        "degree_assortativity": _q_degree_assortativity,
        "ewma_daily_events": _q_ewma_daily_events,
        "event_interarrival": _q_event_interarrival,
        "link_kcore": _q_kcore,
        "community_top_terms": _q_community_top_terms,
        "mmr_diversified": _q_mmr_diversified,
        "intra_host_link_ratio": _q_intra_host_link_ratio,
        "type_token_ratio": _q_type_token_ratio,
        "event_burstiness": _q_event_burstiness,
        "gini_hosts": _q_gini_hosts,
        "length_percentile": _q_length_percentile,
        "trimmed_mean_length": _q_trimmed_mean_length,
        "weekly_active_users": _q_weekly_active_users,
        "product_profit_by_nation": _q_product_profit,
        "zipf_slope": _q_zipf_slope,
        "anova_length_by_lang": _q_anova_length_by_lang,
        "event_trigrams": _q_event_trigrams,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "adamic_adar_topk": _q_adamic_adar,
        "tfidf_cosine_topk": _q_tfidf_cosine,
        "qld_dirichlet_topk": _q_qld_topk,
        "dfr_pl2_topk": _q_pl2_topk,
        "collocations_llr": _q_collocations_llr,
        "containment_pairs": _q_containment_pairs,
        "lang_kl_matrix": _q_lang_kl_matrix,
        "burrows_delta": _q_burrows_delta,
        "price_model_ols": _q_price_model,
        "langid_model_gd": _q_langid_model,
        "lineitem_corr_matrix": _q_lineitem_corr,
        "kmeans_centroids": _q_kmeans,
        "pca_top_component": _q_pca,
        "customers_without_orders": _q_customers_without_orders,
        "top_events_per_user": _q_top_events_per_user,
        "windowed_top_users": _q_windowed_top_users,
        "source_length_stats": _q_source_length_stats,
        "distinct_users": _q_distinct_users,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "approx_distinct_users": _q_approx_distinct_users,
        "hll_set_algebra": _q_hll_set_algebra,
        "hll_registers": _q_hll_registers,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "heavy_hitters_event_type": _q_heavy_hitters,
        "lang_quantiles": _q_lang_quantiles,
        "lang_quantiles_hist": _q_lang_quantiles_hist,
        "value_quantiles_hist": _q_value_quantiles_hist,
        "quality_filter": _q_quality_filter,
        "normalize_text": _q_normalize_text,
        "bigram_topk": _q_bigram_topk,
        "host_stats": _q_host_stats,
        "canonical_url_dedup": _q_canonical_url_dedup,
        "media_metadata": _q_media_metadata,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "video_frame_sample": _q_video_frames,
        "benford_first_digit": _q_benford_first_digit,
        "cusum_daily_events": _q_cusum_daily_events,
        "spearman_chars_tokens": _q_spearman_chars_tokens,
        "ks_length_by_lang": _q_ks_length_by_lang,
        "markov_stationary": _q_markov_stationary,
        "session_type_pairs": _q_session_type_pairs,
        "hapax_ratio_by_lang": _q_hapax_ratio_by_lang,
        "roc_auc_quality": _q_roc_auc_quality,
        "log_loss_quality": _q_log_loss_quality,
        "host_split": _q_host_split,
        "theil_sen_daily_trend": _q_theil_sen_daily_trend,
        "mann_kendall_daily_trend": _q_mann_kendall_daily_trend,
        "acf_daily_events": _q_acf_daily_events,
        "dow_profile_events": _q_dow_profile_events,
        "mad_daily_events": _q_mad_daily_events,
        "shipping_delay_by_priority": _q_shipping_delay_by_priority,
        "suppliers_kept_waiting": _q_suppliers_kept_waiting,
        "calibration_quality": _q_calibration_quality,
        "pr_threshold_quality": _q_pr_threshold_quality,
        "rfm_segments": _q_rfm_segments,
        "kmeans_davies_bouldin": _q_kmeans_davies_bouldin,
        "textrank_keywords": _q_textrank_keywords,
        "event_value_stats": _q_event_value_stats,
        "revenue_concentration": _q_revenue_concentration,
        "arpu_percentiles": _q_arpu_percentiles,
        "props_field_stats": _q_props_field_stats,
        "salsa_scores": _q_salsa_scores,
        "churned_users": _q_churned_users,
        "daily_new_users": _q_daily_new_users,
        "user_activity_histogram": _q_user_activity_histogram,
        "chi2_lang_source": _q_chi2_lang_source,
        "word_length_hist": _q_word_length_hist,
        "boolean_not_search": _q_boolean_not_search,
        "calinski_harabasz": _q_calinski_harabasz,
        "silhouette_simplified": _q_silhouette_simplified,
        "cosine_pair_hist": _q_cosine_pair_hist,
        "link_reciprocity": _q_link_reciprocity,
        "rolling_median_daily": _q_rolling_median_daily,
        "lineitem_rollup": _q_lineitem_rollup,
        "customer_order_lag": _q_customer_order_lag,
        "supplier_balance_ntile": _q_supplier_balance_ntile,
        "char_trigram_topk": _q_char_trigram_topk,
        "langid_kappa": _q_langid_kappa,
        "length_skew_kurtosis": _q_length_skew_kurtosis,
        "purchase_attribution": _q_purchase_attribution,
        "link_transitivity": _q_link_transitivity,
        "bootstrap_mean_ci": _q_bootstrap_mean_ci,
        "robust_outliers_by_lang": _q_robust_outliers_by_lang,
        "multi_format_source": _q_multi_format_source,
        "warc_source_roundtrip": _q_warc_source_roundtrip,
        "robots_filtered_pages": _q_robots_filtered_pages,
        "sitemap_frontier": _q_sitemap_frontier,
        "charset_sniff_decode": _q_charset_sniff_decode,
        "warc_tolerant_parse": _q_warc_tolerant_parse,
        "pq_codes": _q_pq_codes,
        "psi_event_drift": _q_psi_event_drift,
        "knn_pq_adc": _q_knn_pq_adc,
        "gains_curve_quality": _q_gains_curve_quality,
        "hill_tail_events": _q_hill_tail_events,
        "term_burstiness": _q_term_burstiness,
        "markov_next_event_accuracy": _q_markov_next_event_accuracy,
        "quantile_sketch_error": _q_quantile_sketch_error,
        "rich_club": _q_rich_club,
        "rbo_bm25_qld": _q_rbo_bm25_qld,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "heaps_law_fit": _q_heaps_law_fit,
        "revenue_lorenz": _q_revenue_lorenz,
        "partitioned_write_roundtrip": _q_partitioned_write_roundtrip,
        "minhash_estimate_error": _q_minhash_estimate_error,
        "assoc_rules_sessions": _q_assoc_rules_sessions,
        "profile_orders": _q_profile_orders,
        "label_centroid_drift": _q_label_centroid_drift,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "ngram_dup_rate": _q_ngram_dup_rate,
        "orders_seasonality": _q_orders_seasonality,
        "shard_balance": _q_shard_balance,
        "dedup_method_agreement": _q_dedup_method_agreement,
        "capture_recapture_users": _q_capture_recapture_users,
        "negbin_overdispersion": _q_negbin_overdispersion,
        "bm25_tiered_topk": _q_bm25_tiered,
        "index_update_search": _q_index_update_search,
        "df_histogram": _q_df_histogram,
        "prune_report": _q_prune_report,
        "reshard_search": _q_reshard_search,
        "delete_search": _q_delete_search,
        "delete_compact_search": _q_delete_compact_search,
        "nrt_add_search": _q_nrt_add_search,
        "query_string_search": _q_query_string_search,
        "bm25_clustered_prune": _q_bm25_clustered_prune,
        "incremental_crawl_search": _q_incremental_crawl_search,
        "query_string_extended": _q_query_string_extended,
        "passage_best_window": _q_passage_best_window,
        "query_clarity": _q_query_clarity,
        "team_draft_interleave": _q_team_draft_interleave,
        "redirect_terminals": _q_redirect_terminals,
        "cori_collection_ranking": _q_cori_collection_ranking,
        "fetch_schedule": _q_fetch_schedule,
        "bm25_varint_topk": lambda sf: _q_bm25_codec_variant(sf, "varint"),
        "bm25_svbyte_topk": lambda sf: _q_bm25_codec_variant(sf, "svbyte"),
        "hll_error_audit": _q_hll_error_audit,
        "cms_error_audit": _q_cms_error_audit,
        "bm25_exhaustive_topk": _q_bm25_exhaustive,
        "user_rolling_value_7d": _q_user_rolling_value_7d,
        "bm25_filtered_exclude": _q_bm25_filtered_exclude,
        "service_cache_hit": _q_service_cache_hit,
        "sq8_codes": _q_sq8_codes,
        "image_features_lossless": _q_image_features_lossless,
        "image_features_jpeg": _q_image_features_jpeg,
        "video_frames_lossless": _q_video_frames_lossless,
        "video_frames_mjpeg": _q_video_frames_mjpeg,
        "pagerank_convergence": _q_pagerank_convergence,
        "funnel_within_1h": _q_funnel_within_1h,
        "top2_versions_per_source": _q_top2_versions_per_source,
        "kaplan_meier_churn": _q_kaplan_meier_churn,
        "ab_test_conversion": _q_ab_test_conversion,
        "holt_forecast_daily": _q_holt_forecast_daily,
        "lpa_modularity": _q_lpa_modularity,
        "feature_mi_quality": _q_feature_mi_quality,
        "max_tf_audit": _q_max_tf_audit,
        "serp_diversity_ild": _q_serp_diversity_ild,
        "churn_auc_baseline": _q_churn_auc_baseline,
        "min_cost_supplier": _q_min_cost_supplier,
        "important_parts": _q_important_parts,
        "part_supplier_counts": _q_part_supplier_counts,
        "sales_opportunity": _q_sales_opportunity,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_TOK = (
    "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM documents"
)

# (day, count) fold of events.ts — shared by the trend-suite oracles
_DAILY_SQL = (
    "SELECT (epoch_us(ts) // 86400000000)::bigint AS day, "
    "count(*)::bigint AS n FROM events GROUP BY 1"
)

_BM25_SCORES = f"""
tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','merge','spark']) AS term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
"""


def _xlx(e: str) -> str:
    """x·ln(x) with 0·ln(0)=0 in SQL — the G² entropy-form helper
    (mirrors ``functions/collocations._xlogx``)."""
    return f"(CASE WHEN {e} > 0 THEN ({e}) * ln({e}) ELSE 0.0 END)"


# FNV-1a over a (short, ASCII) token's bytes, in SQL — the byte-serial
# definition `dcs_ray.functions.textstats.fnv1a_bytes_rows` implements.
# hugeint arithmetic mod 2^64 avoids DuckDB's overflow errors.
_M64 = "18446744073709551616"
_FNV_TOK = (
    "list_reduce(list_prepend(14695981039346656037::hugeint, "
    "list_transform(range(1, length({t})+1), i -> ascii(substr({t}, i, 1))::hugeint)), "
    "(h, b) -> (xor(h::ubigint, b::ubigint)::hugeint * 1099511628211) % " + _M64 + ")"
)

_TOKS_LIST = (
    "SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> x <> '') AS toks FROM documents"
)

# link-graph replay: page_links() as SQL — tokens via the shared list
# CTE, targets (d//2, d//3, d+41), anchors = two tokens of the SOURCE
# page at positions ((d+5j) % n, (d+5j+1) % n); docs with zero tokens
# emit no links (sources/pages.py::page_links). Defines CTE ``edges``.
_LINK_EDGES_CTE = f"""ltoks AS ({_TOKS_LIST}),
lbase AS (SELECT doc_id, toks, len(toks) AS n FROM ltoks WHERE len(toks) > 0),
edges AS (
  SELECT doc_id::bigint AS src,
         (CASE j WHEN 0 THEN doc_id // 2 WHEN 1 THEN doc_id // 3
                 ELSE doc_id + 41 END)::bigint AS dst,
         toks[((doc_id + 5 * j) % n) + 1] || ' '
           || toks[((doc_id + 5 * j + 1) % n) + 1] AS anchor
  FROM lbase CROSS JOIN range(3) r(j))"""


def _tune_bm25_sql(grid: list[tuple[float, float]], k: int = 10) -> str:
    """The BM25 (k1, b) parameter sweep replayed in one statement: per
    combo a scores/ranked/hits CTE chain (score expression mirrors the
    ENGINE's association exactly — ``idf * (tf * (k1+1)) / (tf + k1 *
    ((1-b) + b*dl/avgdl))`` with the (k1+1)/(1-b) constants computed in
    Python so both sides use identical doubles), shared relevance
    labels, UNION ALL of one metrics row per combo."""
    parts = [
        f"""tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','merge','spark']) AS term),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
idcg AS (
  SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0.0) AS v
  FROM (SELECT unnest(range(1, 1 + least((SELECT r FROM nrel), {k}))) AS i))"""
    ]
    selects = []
    for i, (k1, b) in enumerate(grid):
        k1p, omb = repr(float(k1) + 1.0), repr(1.0 - float(b))
        k1r, br = repr(float(k1)), repr(float(b))
        parts.append(
            f"""s{i} AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * (tf.tf * {k1p})
              / (tf.tf + {k1r} * ({omb} + {br} * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id),
r{i} AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM s{i} ORDER BY score DESC, doc_id ASC LIMIT {k}),
h{i} AS (SELECT rank FROM r{i} JOIN rel USING (doc_id))"""
        )
        selects.append(
            f"""SELECT {k1r} AS k1, {br} AS b,
       round(CASE WHEN (SELECT v FROM idcg) > 0
                  THEN (SELECT coalesce(sum(1.0 / log2(rank + 1.0)), 0.0) FROM h{i})
                       / (SELECT v FROM idcg)
                  ELSE 0.0 END, 6) AS ndcg_at_{k},
       round(CASE WHEN (SELECT count(*) FROM h{i}) = 0 THEN 0.0
                  ELSE 1.0 / (SELECT min(rank)::double FROM h{i}) END, 6) AS mrr"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(selects)
        + "\n) ORDER BY k1, b"
    )


def _pagerank_sql(
    k: int = 5,
    d: float = 0.85,
    edges_cte: str | None = None,
    seeds_cte: str | None = None,
) -> str:
    """All ``k`` PageRank power iterations replayed as chained SQL CTEs.
    ``edges_cte`` overrides the edge-set definition (must define a CTE
    named ``edges`` with at least ``src``/``dst`` bigint columns);
    default is the deterministic events functional graph. ``seeds_cte``
    (a CTE named ``seeds`` with a ``node`` bigint column) switches to
    personalized PageRank: teleport and dangling mass go to the seed
    set instead of uniform 1/N — operation order mirrors the engine's
    ``(1-d)*p + d*(contrib + dang*p)`` exactly so rounded ranks
    hash-match."""
    parts = [
        edges_cte
        or """edges AS (
  SELECT src, dst FROM (
    SELECT event_id::bigint AS src,
           ((event_id // 20) * 20 + (event_id * 13 + 5) % 20)::bigint AS dst
    FROM events
    UNION ALL
    SELECT event_id::bigint,
           ((event_id // 20) * 20 + (event_id * 7 + 3) % 20)::bigint
    FROM events WHERE event_id % 3 = 0))""",
        """nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
nn AS (SELECT count(*)::double AS n FROM nodes),
outdeg AS (SELECT src AS node, count(*)::double AS deg FROM edges GROUP BY src)""",
    ]
    if seeds_cte is None:
        parts.append(
            """tp AS (SELECT node, 1.0 / (SELECT n FROM nn) AS p FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
        )
    else:
        parts.append(seeds_cte)
        parts.append(
            """ns AS (SELECT count(*)::double AS c FROM seeds),
tp AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / (SELECT c FROM ns)
              ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN seeds s USING (node)),
r0 AS (SELECT node, p AS r FROM tp)"""
        )
    for i in range(1, k + 1):
        p = i - 1
        if seeds_cte is None:
            update = f"""(1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (coalesce(c.contrib, 0.0) + (SELECT m FROM dang{p}) / (SELECT n FROM nn))"""
            tp_join = ""
        else:
            update = f"""(1.0 - {d}) * t.p
         + {d} * (coalesce(c.contrib, 0.0) + (SELECT m FROM dang{p}) * t.p)"""
            tp_join = " JOIN tp t USING (node)"
        parts.append(
            f"""dang{p} AS (
  SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r LEFT JOIN outdeg o USING (node)
  WHERE o.node IS NULL),
c{i} AS (
  SELECT e.dst AS node, sum(r.r / o.deg) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN outdeg o ON e.src = o.node
  GROUP BY e.dst),
r{i} AS (
  SELECT n.node,
         {update} AS r
  FROM nodes n LEFT JOIN c{i} c USING (node){tp_join})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(r, 6) AS rank FROM r{k} ORDER BY node"
    )


def _hits_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` HITS mutual-reinforcement iterations replayed as
    chained SQL CTEs (authority then hub per iteration, L1-normalized
    after each half-step — exactly the engine's update order, so the
    rounded vectors hash-match). ``edges_cte`` must define a CTE named
    ``edges`` with ``src``/``dst`` bigint columns."""
    parts = [
        edges_cte,
        # MATERIALIZED: the chain references the edge set twice per
        # iteration; inlining would re-expand (and re-open) the source
        # parquet per reference and exhaust file descriptors
        """em AS MATERIALIZED (SELECT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM em UNION SELECT dst FROM em)),
nn AS (SELECT count(*)::double AS n FROM nodes),
a0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS a FROM nodes),
h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes)""",
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h) AS s
  FROM em e JOIN h{p} h ON e.src = h.node GROUP BY e.dst),
at{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM at{i}) > 0
              THEN coalesce(ar.s, 0.0) / (SELECT t FROM at{i})
              ELSE coalesce(ar.s, 0.0) END AS a
  FROM nodes n LEFT JOIN ar{i} ar USING (node)),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.a) AS s
  FROM em e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
ht{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM ht{i}) > 0
              THEN coalesce(hr.s, 0.0) / (SELECT t FROM ht{i})
              ELSE coalesce(hr.s, 0.0) END AS h
  FROM nodes n LEFT JOIN hr{i} hr USING (node))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, round(a, 6) AS authority, round(h, 6) AS hub
FROM a{k} JOIN h{k} USING (node) ORDER BY node"""
    )


def _salsa_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` SALSA iterations replayed as chained SQL CTEs — the
    ``_hits_sql`` chain with explicit outdeg/indeg joins on the push
    (a(v) = Σ h(u)/outdeg(u), h(u) = Σ a(v)/indeg(v)), L1-normalized
    after each half-step exactly like the engine. Degrees count edge
    ROWS so duplicate edges contribute multiply on both sides."""
    parts = [
        edges_cte,
        """em AS MATERIALIZED (SELECT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM em UNION SELECT dst FROM em)),
od AS MATERIALIZED (SELECT src AS node, count(*)::double AS d FROM em GROUP BY 1),
idg AS MATERIALIZED (SELECT dst AS node, count(*)::double AS d FROM em GROUP BY 1),
nn AS (SELECT count(*)::double AS n FROM nodes),
a0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS a FROM nodes),
h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes)""",
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h / od.d) AS s
  FROM em e JOIN h{p} h ON e.src = h.node JOIN od ON od.node = e.src
  GROUP BY e.dst),
at{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM at{i}) > 0
              THEN coalesce(ar.s, 0.0) / (SELECT t FROM at{i})
              ELSE coalesce(ar.s, 0.0) END AS a
  FROM nodes n LEFT JOIN ar{i} ar USING (node)),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.a / idg.d) AS s
  FROM em e JOIN a{i} a ON e.dst = a.node JOIN idg ON idg.node = e.dst
  GROUP BY e.src),
ht{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM ht{i}) > 0
              THEN coalesce(hr.s, 0.0) / (SELECT t FROM ht{i})
              ELSE coalesce(hr.s, 0.0) END AS h
  FROM nodes n LEFT JOIN hr{i} hr USING (node))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, round(a, 6) AS authority, round(h, 6) AS hub
FROM a{k} JOIN h{k} USING (node) ORDER BY node"""
    )


# multinomial NB replay shared by the classifier + confusion oracles:
# CTE ``pred(doc_id, lang, score, rn)`` where rn = 1 is the argmax on
# ROUND(score, 6) with ties to the smallest class
_NB_PRED_CTES = f"""tok AS ({_TOK}),
cls AS (SELECT lang, count(*)::bigint AS nd FROM documents GROUP BY lang),
ntot AS (SELECT count(*)::double AS n FROM documents),
tc AS MATERIALIZED (
  SELECT d.lang, t.term, count(*)::bigint AS c
  FROM tok t JOIN documents d USING (doc_id) GROUP BY d.lang, t.term),
ctot AS (SELECT lang, sum(c)::bigint AS tot FROM tc GROUP BY lang),
v AS (SELECT count(DISTINCT term)::double AS v FROM tok),
dtf AS MATERIALIZED (
  SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY doc_id, term),
ts AS (
  SELECT dtf.doc_id, c.lang,
         sum(dtf.tf * ln((coalesce(tc.c, 0) + 1.0)
                         / (ct.tot + (SELECT v FROM v)))) AS s
  FROM dtf CROSS JOIN cls c
  LEFT JOIN tc ON tc.lang = c.lang AND tc.term = dtf.term
  JOIN ctot ct ON ct.lang = c.lang
  GROUP BY dtf.doc_id, c.lang),
scores AS (
  SELECT d.doc_id, c.lang,
         ln(c.nd / (SELECT n FROM ntot)) + coalesce(ts.s, 0.0) AS score
  FROM documents d CROSS JOIN cls c
  LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.lang = c.lang),
pred AS (
  SELECT doc_id, lang, score,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(score, 6) DESC, lang ASC) AS rn
  FROM scores)"""


def _lpa_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` synchronous label-propagation rounds replayed as
    chained (count, argmax) CTE pairs — labels start as node ids,
    each round takes the most frequent neighbor label with ties to
    the SMALLEST label (graph.py::label_propagation's deterministic
    update rule). MATERIALIZED: inlined CTEs re-expand exponentially."""
    return (
        "WITH "
        + _lpa_ctes(k, edges_cte)
        + f"\nSELECT node, lbl AS community FROM l{k} ORDER BY node"
    )


def _lpa_ctes(k: int = 5, edges_cte: str | None = None) -> str:
    """The label-propagation CTE chain (through ``l{k}``) without the
    final SELECT, so compositions can keep building on the labels."""
    parts = [
        edges_cte or _LINK_EDGES_CTE,
        """ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst),
und AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM ce UNION ALL SELECT v AS node, u AS nbr FROM ce),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM und)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT und.node, l{i - 1}.lbl, count(*) AS c
  FROM und JOIN l{i - 1} ON l{i - 1}.node = und.nbr
  GROUP BY und.node, l{i - 1}.lbl),
l{i} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM c{i}) WHERE rn = 1)"""
        )
    return ",\n".join(parts)


def _pagerank_ctes(k: int, d: float, edges_cte: str) -> str:
    """The pagerank replay as a bare CTE chain (terminal rank relation
    ``r{k}(node, r)``) for composition into larger oracles."""
    full = _pagerank_sql(k, d, edges_cte)
    return full[len("WITH ") : full.rindex("\nSELECT node, round")]


# shared CTE chain for the DSIR oracles: string-bigram replay of the
# hashed count tables (target = lang 'en', raw = all docs), add-1
# smoothing, V = raw vocabulary size
_DSIR_W_CTES = f"""toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
tgt AS (SELECT bg, count(*) AS ct FROM pairs JOIN documents USING (doc_id)
        WHERE lang = 'en' GROUP BY bg),
rawc AS (SELECT bg, count(*) AS cr FROM pairs GROUP BY bg),
vv AS (SELECT count(*) AS v FROM rawc),
nt AS (SELECT count(*) AS n FROM pairs p JOIN documents d USING (doc_id) WHERE d.lang = 'en'),
nr AS (SELECT count(*) AS n FROM pairs),
scored AS (
  SELECT p.doc_id,
         ln((coalesce(t.ct, 0) + 1.0) / ((SELECT n FROM nt) + 1.0 * (SELECT v FROM vv)))
       - ln((r.cr + 1.0) / ((SELECT n FROM nr) + 1.0 * (SELECT v FROM vv))) AS lw
  FROM pairs p LEFT JOIN tgt t USING (bg) JOIN rawc r USING (bg)),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lw) AS s FROM scored GROUP BY doc_id)"""


def _langid_values() -> str:
    from dcs_ray.functions.textstats import LANG_MARKERS

    rows = [
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_MARKERS)
        for w in sorted(LANG_MARKERS[lang])
    ]
    return ", ".join(rows)


def _mulmod64(a: str, b: str) -> str:
    """SQL for ``(a*b) mod 2^64`` via 32-bit limbs — hugeint is a signed
    128-bit type, so a direct 64×64 product overflows."""
    B32 = "4294967296"
    return (
        f"((({a}) % {B32}) * (({b}) % {B32})"
        f" + (((({a}) % {B32}) * (({b}) // {B32})"
        f"   + (({a}) // {B32}) * (({b}) % {B32})) % {B32}) * {B32}) % {_M64}"
    )


def _minhash_chain_ctes() -> str:
    """The ENTIRE MinHash+LSH chain of ``dcs_ray.functions.dedup`` —
    word-wise content hash (``textstats.content_hash_rows``: 8-byte-LE
    word polynomial + splitmix64 finalizer), 3-gram shingle Horner
    combine, 64 mod-(2^61−1) permutations (constants from the same
    seeded rng, inlined), 16×4 FNV band hashes — replayed bit-exactly
    in DuckDB hugeint arithmetic, as a CTE list ending at
    ``bh(doc_id, band, bhash)`` (plus ``tok(doc_id, t, pos)``) so the
    pair/verify/cluster oracles can compose on top."""
    OFF = "14695981039346656037"
    P = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    P256 = "list_value(" + ",".join(str(1 << (8 * i)) for i in range(8)) + ")"
    PRIME = "1099511628211"
    MERS = str((1 << 61) - 1)
    rng = np.random.default_rng(7)  # same seed as minhash_signatures
    a = rng.integers(1, (1 << 61) - 1, 64, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, 64, dtype=np.uint64)
    perms = ", ".join(
        f"({p}, {int(a[p])}::hugeint, {int(b[p])}::hugeint)" for p in range(64)
    )
    tokhash = f"""
list_reduce(
  list_prepend({OFF}::hugeint,
    list_transform(range(0, greatest((length(t)+7)//8, 1)), j ->
      list_sum(list_transform(range(0, 8), i ->
        CASE WHEN j*8+i < length(t)
             THEN ascii(substr(t, (j*8+i+1)::int, 1))::hugeint * ({P256})[i+1]
             ELSE 0::hugeint END)))),
  (h, w) -> ({_mulmod64('h', P + '::hugeint')} + w) % {_M64})
"""
    return f"""
tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos FROM tokl),
dtok AS (SELECT DISTINCT t FROM tok),
th0 AS (SELECT t, ({tokhash}) AS hp FROM dtok),
th1 AS (SELECT t, xor(hp::ubigint, length(t)::ubigint)::hugeint AS h1 FROM th0),
th2 AS (SELECT t, ({_mulmod64("xor(h1::ubigint, h1::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS h2 FROM th1),
th3 AS (SELECT t, ({_mulmod64("xor(h2::ubigint, h2::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS h3 FROM th2),
th  AS (SELECT t, xor(h3::ubigint, h3::ubigint >> 31)::hugeint AS h FROM th3),
seq AS (
  SELECT tok.doc_id, tok.pos, th.h,
         lead(th.h, 1) OVER w AS h1n, lead(th.h, 2) OVER w AS h2n
  FROM tok JOIN th USING (t) WINDOW w AS (PARTITION BY tok.doc_id ORDER BY tok.pos)
),
sh AS (
  SELECT doc_id, ((({_mulmod64('h', PRIME + '::hugeint')}) + h1n) % {_M64}) AS acc1, h2n
  FROM seq WHERE h2n IS NOT NULL
),
sh2 AS (SELECT doc_id, ((({_mulmod64('acc1', PRIME + '::hugeint')}) + h2n) % {_M64}) AS s FROM sh),
bases AS (SELECT doc_id, s % {MERS} AS base FROM sh2),
perms(p, pa, pb) AS (VALUES {perms}),
hv AS (SELECT doc_id, p, ((pa * base + pb) % {_M64}) % {MERS} AS v FROM bases CROSS JOIN perms),
smin AS (SELECT doc_id, p, min(v) AS mv FROM hv GROUP BY doc_id, p),
sigs AS (
  SELECT d.doc_id, pr.p, coalesce(sm.mv, 18446744073709551615::hugeint) AS sv
  FROM documents d CROSS JOIN perms pr
  LEFT JOIN smin sm ON sm.doc_id = d.doc_id AND sm.p = pr.p
),
bandl AS (
  SELECT doc_id, p // 4 AS band, list(sv ORDER BY p) AS svs
  FROM sigs GROUP BY doc_id, p // 4
),
bh AS (
  SELECT doc_id, band,
    ((xor(list_reduce(list_prepend(1469598103934665603::hugeint, svs),
          (h, s) -> (xor(h::ubigint, s::ubigint)::hugeint * {PRIME}) % {_M64})::ubigint,
         band::ubigint))::hugeint * {PRIME}) % {_M64} AS bhash
  FROM bandl
)"""


def _minhash_pairs_sql() -> str:
    return f"""
WITH {_minhash_chain_ctes()}
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id
ORDER BY id_a, id_b
"""


def _verify_chain_ctes() -> str:
    """Candidate pairs from the band hashes + exact shingle-set Jaccard
    verify (``dedup.jaccard_verify_pairs`` semantics: union of distinct
    3-gram shingles; empty-vs-empty union ⇒ jaccard 1.0), ending at
    ``verified(id_a, id_b, jaccard)`` with jaccard >= 0.5."""
    return f"""{_minhash_chain_ctes()},
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id
),
shw AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w2 || ' ' || lead(t, 2) OVER w2 AS shingle
  FROM tok WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w2 IS NOT NULL
),
dsh AS (SELECT DISTINCT doc_id, shingle FROM shw),
ssz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN dsh a ON a.doc_id = c.id_a
  JOIN dsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
),
verified AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT c.id_a, c.id_b,
           CASE WHEN coalesce(za.sz,0) + coalesce(zb.sz,0) - coalesce(p.i,0) = 0
                THEN 1.0
                ELSE coalesce(p.i,0)::double
                     / (coalesce(za.sz,0) + coalesce(zb.sz,0) - coalesce(p.i,0))
           END AS jaccard
    FROM cand c
    LEFT JOIN pint p ON p.id_a = c.id_a AND p.id_b = c.id_b
    LEFT JOIN ssz za ON za.doc_id = c.id_a
    LEFT JOIN ssz zb ON zb.doc_id = c.id_b
  ) WHERE jaccard >= 0.5
)"""


def _jaccard_verified_sql() -> str:
    return f"""
WITH {_verify_chain_ctes()}
SELECT id_a, id_b, jaccard FROM verified ORDER BY id_a, id_b
"""


def _fuzzy_dedup_sql() -> str:
    """minhash→verify→connected components (recursive min-label
    propagation) → keep min id per cluster — the full
    ``dedup.fuzzy_dedup_keep`` pipeline in one statement."""
    return f"""
WITH RECURSIVE {_verify_chain_ctes()},
sym AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
),
lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM lab l WHERE l.node = d.doc_id AND l.comp < d.doc_id)
ORDER BY doc_id
"""


def _connected_components_sql(tail: str | None = None) -> str:
    """Recursive-CTE min-label propagation over the deterministic
    event-derived edge set (same construction as
    ``_q_connected_components``). ``tail`` overrides the final SELECT
    (it sees CTE ``labels(node, component)``)."""
    return """
WITH RECURSIVE edges AS (
  SELECT event_id::bigint AS u,
         ((event_id // 20) * 20 + (event_id * 13 + 5) % 20)::bigint AS v
  FROM events
),
canon AS (SELECT DISTINCT greatest(u, v) AS u, least(u, v) AS v FROM edges WHERE u <> v),
sym AS (SELECT u, v FROM canon UNION ALL SELECT v, u FROM canon),
reach(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
),
labels AS (
  SELECT node::bigint AS node, min(label)::bigint AS component
  FROM reach GROUP BY node
)
""" + (
        tail
        or "SELECT node, component FROM labels ORDER BY node"
    )


def _pow2_values() -> str:
    return ", ".join(f"({b}, {1 << b}::hugeint)" for b in range(64))


# quality-classifier replay (textstats.QualityClassifier's fixed public
# weights): shared by the classifier gate and its AUC / log-loss evals
_QC_CTES = f"""tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id),
feats AS (
  SELECT d.doc_id,
         coalesce(a.n_tokens,0)::bigint AS n_tokens,
         coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0) AS stop_ratio,
         coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0) AS mean_len
  FROM documents d LEFT JOIN agg a USING (doc_id)),
z AS (
  SELECT doc_id,
         -2.0 + 0.45 * ln(1.0 + n_tokens) + 4.0 * stop_ratio + (-0.15) * mean_len AS zv
  FROM feats),
qprob AS (SELECT doc_id, round(1.0 / (1.0 + exp(-zv)), 6) AS p FROM z)"""


def _markov_sql(k: int) -> str:
    """Generated power-iteration CTE chain for the stationary
    event-type distribution: row-normalized transition probabilities,
    v₀ uniform, each step vᵢ₊₁ ∝ vᵢ·P renormalized (mirrors
    ``functions/stats.markov_stationary``)."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""r{i} AS (
  SELECT ty.event_type, coalesce(sum(v{i - 1}.pr * p.p), 0.0) AS pr
  FROM ty LEFT JOIN p ON p.nxt = ty.event_type
          LEFT JOIN v{i - 1} ON v{i - 1}.event_type = p.prev
  GROUP BY ty.event_type),
v{i} AS (SELECT event_type, pr / (SELECT sum(pr) FROM r{i}) AS pr FROM r{i})"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH tr AS (
  SELECT prev, event_type AS nxt, count(*)::double AS n FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_type) AS prev
    FROM events) s
  WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS (SELECT prev, sum(n) AS tot FROM tr GROUP BY prev),
p AS (SELECT tr.prev, tr.nxt, tr.n / rs.tot AS p FROM tr JOIN rs USING (prev)),
ty AS (SELECT DISTINCT event_type FROM events),
v0 AS (SELECT event_type, 1.0 / (SELECT count(*) FROM ty) AS pr FROM ty),
{chain}
SELECT event_type, round(pr, 6) AS pr FROM v{k} ORDER BY event_type
"""


def oracle_sql() -> dict[str, str]:
    tris = sorted({LITERAL[i : i + 3] for i in range(len(LITERAL) - 2)})
    tri_conds = " AND ".join(f"contains(text, '{t}')" for t in tris)
    return {
        "bm25_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_bmw": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_top2_per_source": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT s.doc_id, d.source, s.score,
         row_number() OVER (PARTITION BY d.source ORDER BY s.score DESC, s.doc_id ASC) AS rn,
         row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS grank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT doc_id, source, round(score, 6) AS score
FROM ranked WHERE rn <= 2 ORDER BY grank LIMIT 10
""",
        "term_df": f"""
SELECT term, count(DISTINCT doc_id)::bigint AS df FROM ({_TOK}) GROUP BY term ORDER BY term
""",
        # Elias-Fano size replay: header 26 B + 2 stream-width bytes +
        # low bits (m*l, byte-padded) + unary high bits (m + (U >> l))
        # + fixed-width tfs; l = floor_log2(U // m) by integer division,
        # blocks of 128 within each range partition (span = (max_id+8)//8)
        "ef_posting_sizes": f"""
WITH tok AS ({_TOK}),
posting AS (SELECT term, doc_id, count(*)::bigint AS tf FROM tok GROUP BY term, doc_id),
span AS (SELECT ((max(doc_id) + 8) // 8)::bigint AS s FROM documents),
placed AS (
  SELECT term, doc_id, tf,
         (row_number() OVER (
            PARTITION BY term, least(doc_id // (SELECT s FROM span), 7)
            ORDER BY doc_id) - 1) // 128 AS blk,
         least(doc_id // (SELECT s FROM span), 7) AS part
  FROM posting
),
blocks AS (
  SELECT term, part, blk, count(*)::bigint AS n,
         (count(*) - 1)::bigint AS m,
         (max(doc_id) - min(doc_id))::bigint AS U,
         max(tf)::bigint AS max_tf
  FROM placed GROUP BY term, part, blk
),
sized AS (
  SELECT term,
         26 + 2 + (m * l + 7) // 8
         + CASE WHEN m > 0 THEN (m + (U >> l) + 7) // 8 ELSE 0 END
         + (n * length(bin(max_tf)) + 7) // 8 AS bytes
  FROM (SELECT *, CASE WHEN m = 0 THEN 0 ELSE length(bin(U // m)) - 1 END AS l
        FROM blocks)
)
SELECT term, sum(bytes)::bigint AS ef_bytes FROM sized GROUP BY term ORDER BY term
""",
        "corpus_stats": f"""
WITH tok AS ({_TOK}), dl AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id)
SELECT (SELECT count(*) FROM documents)::bigint AS n_docs,
       (SELECT coalesce(sum(n),0) FROM dl)::bigint AS total_tokens,
       round((SELECT sum(n) FROM dl)::double / (SELECT count(*) FROM documents), 6) AS avgdl
""",
        "token_count": f"""
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_tokens
FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM ({_TOK}) GROUP BY doc_id) c
USING (doc_id) ORDER BY doc_id
""",
        "bpe_token_count": r"""
SELECT doc_id,
       length(regexp_extract_all(text,'''[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))::bigint AS n_bpe_tokens
FROM documents ORDER BY doc_id
""",
        "quality_score": f"""
WITH tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_tokens,0)::bigint AS n_tokens,
       coalesce(a.n_stop,0)::bigint AS n_stopwords,
       coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0) AS stopword_ratio,
       coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0) AS mean_token_len
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
""",
        "tfidf_keywords": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT count(*) FROM documents)::double / df.df) AS score
  FROM tf JOIN df USING (term)),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, rank::bigint AS rank, term, round(score, 6) AS tfidf
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
""",
        "bpe_word_counts": f"""
SELECT term AS word, count(*)::bigint AS n FROM ({_TOK}) GROUP BY term ORDER BY word
""",
        # BPE training replayed as 50 generated merge-round CTEs
        # (sentinel-delimited token strings; replace() = greedy merge)
        "bpe_merges": _bpe_merges_sql(),
        # + recursive-CTE encode walk (leftmost minimum-rank pair)
        "bpe_subtoken_count": _bpe_subtoken_count_sql(),
        # document-level PMI query expansion: distinct (doc, term) pairs,
        # co-df conditioned on docs containing the query term; pmi
        # rounded BEFORE the order-by (engine sorts the rounded value)
        "related_terms_pmi": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
nn AS (SELECT count(*)::double AS n FROM documents),
qd AS (SELECT doc_id FROM dt WHERE term = 'spark'),
nq AS (SELECT count(*)::double AS c FROM qd),
df AS (SELECT term, count(*)::double AS df FROM dt GROUP BY term),
codf AS (SELECT dt.term, count(*)::double AS codf
         FROM dt JOIN qd USING (doc_id) GROUP BY dt.term)
SELECT term, codf::bigint AS pair_df,
       round(ln(((SELECT n FROM nn) * codf) / (df * (SELECT c FROM nq))), 6) AS pmi
FROM codf JOIN df USING (term)
WHERE term <> 'spark' AND codf >= 2
ORDER BY pmi DESC, term ASC LIMIT 20
""",
        "autocomplete_prefix": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks)
SELECT term, count(*)::bigint AS df FROM dt
WHERE starts_with(term, 'st')
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10
""",
        # leading-wildcard completion (*er): the reversed-dictionary query
        "autocomplete_suffix": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks)
SELECT term, count(*)::bigint AS df FROM dt
WHERE ends_with(term, 'er')
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10
""",
        # Harman '91 S-stemmer as a CASE chain (rules fire in order and
        # TERMINATE — an exception leaves the word unchanged, it does
        # not fall through), then df over distinct (doc, stem)
        "stemmed_term_df": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
st AS (SELECT doc_id,
  CASE
    WHEN len(term) >= 4 AND term LIKE '%ies' THEN
      CASE WHEN term LIKE '%aies' OR term LIKE '%eies' THEN term
           ELSE substr(term, 1, len(term) - 3) || 'y' END
    WHEN len(term) >= 3 AND term LIKE '%es' THEN
      CASE WHEN term LIKE '%aes' OR term LIKE '%ees' OR term LIKE '%oes' THEN term
           ELSE substr(term, 1, len(term) - 1) END
    WHEN len(term) >= 3 AND term LIKE '%s' THEN
      CASE WHEN term LIKE '%us' OR term LIKE '%ss' THEN term
           ELSE substr(term, 1, len(term) - 1) END
    ELSE term END AS term
  FROM dt),
sd AS (SELECT DISTINCT doc_id, term FROM st)
SELECT term, count(*)::bigint AS df FROM sd GROUP BY term ORDER BY term
""",
        # static pruning tier: per-term top-32 postings by (tf desc,
        # doc_id asc), scored with FULL-corpus df/doc_len/avgdl
        "bm25_pruned_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
pruned AS (
  SELECT doc_id, term, tf FROM (
    SELECT tf.*, row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
    FROM tf) WHERE rn <= 32),
q AS (SELECT unnest(['join','merge','spark']) AS term),
scores AS (
  SELECT p.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * p.tf * 2.2
              / (p.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM pruned p JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE p.term IN (SELECT term FROM q)
  GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # BM25 (k1, b) sweep: one metrics row per combo, shared labels
        "bm25_param_sweep": _tune_bm25_sql(_TUNE_GRID, k=10),
        # MoreLikeThis for doc 42: top-5 tf·ln(N/df) terms -> BM25,
        # source doc excluded, ranks renumbered
        "more_like_this": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tsel AS (
  SELECT term FROM (
    SELECT tf.term,
           tf.tf * ln((SELECT n_docs FROM stats)::double / df.df) AS s
    FROM tf JOIN df USING (term) WHERE tf.doc_id = 42)
  ORDER BY s DESC, term ASC LIMIT 5),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM tsel)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM (SELECT * FROM scores WHERE doc_id <> 42
      ORDER BY score DESC, doc_id ASC LIMIT 10)
ORDER BY score DESC, doc_id ASC
""",
        # NDCG@10 + MRR of the BM25 top-10 vs the lexical relevance
        # oracle (doc contains ALL query terms); binary gains
        "bm25_eval_metrics": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
hits AS (SELECT rank FROM ranked JOIN rel USING (doc_id)),
dcg AS (SELECT coalesce(sum(1.0 / log2(rank + 1.0)), 0.0) AS v FROM hits),
idcg AS (
  SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0.0) AS v
  FROM (SELECT unnest(range(1, 1 + least((SELECT r FROM nrel), 10))) AS i)),
mrr AS (
  SELECT CASE WHEN (SELECT count(*) FROM hits) = 0 THEN 0.0
              ELSE 1.0 / (SELECT min(rank)::double FROM hits) END AS v)
SELECT (SELECT r FROM nrel) AS n_relevant,
       round(CASE WHEN (SELECT v FROM idcg) > 0
                  THEN (SELECT v FROM dcg) / (SELECT v FROM idcg)
                  ELSE 0.0 END, 6) AS ndcg_at_10,
       round((SELECT v FROM mrr), 6) AS mrr
""",
        "bm25_pr_eval": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
hits AS (SELECT rank FROM ranked JOIN rel USING (doc_id)),
ap AS (
  SELECT coalesce(sum(cnt_le::double / rank), 0.0) AS s
  FROM (SELECT rank, row_number() OVER (ORDER BY rank) AS cnt_le FROM hits))
SELECT (SELECT r FROM nrel) AS n_relevant,
       round((SELECT count(*) FROM hits)::double / 10, 6) AS precision_at_10,
       round(CASE WHEN (SELECT r FROM nrel) = 0 THEN 0.0
                  ELSE (SELECT count(*) FROM hits)::double / (SELECT r FROM nrel) END, 6) AS recall_at_10,
       round(CASE WHEN (SELECT r FROM nrel) = 0 THEN 0.0
                  ELSE (SELECT s FROM ap) / least((SELECT r FROM nrel), 10) END, 6) AS avg_precision
""",
        "redde_collection_ranking": """
WITH samp AS (
  SELECT doc_id, text, (CAST(substr(source, 4) AS BIGINT) % 3) AS coll
  FROM documents WHERE doc_id % 5 = 0),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
        '[^a-z0-9]+'), x -> x <> '')) AS term FROM samp),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM samp) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM samp) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ('join','merge','spark')
  GROUP BY tf.doc_id),
hits AS (
  SELECT s.doc_id, p.coll FROM scores s JOIN samp p USING (doc_id)
  ORDER BY s.score DESC, s.doc_id ASC LIMIT 20),
fullc AS (SELECT (CAST(substr(source, 4) AS BIGINT) % 3) AS coll,
                 count(*)::bigint AS n FROM documents GROUP BY 1),
sampc AS (SELECT coll, count(*)::bigint AS n FROM samp GROUP BY 1),
votes AS (SELECT coll, count(*)::bigint AS v FROM hits GROUP BY 1),
est AS (
  SELECT f.coll, round(coalesce(v.v, 0) * f.n::double / s.n, 6) + 0.0 AS est_rel
  FROM fullc f JOIN sampc s USING (coll) LEFT JOIN votes v USING (coll))
SELECT coll AS collection, est_rel,
       row_number() OVER (ORDER BY est_rel DESC, coll ASC)::bigint AS rank
FROM est ORDER BY collection
""",
        "pbm_click_model": _pbm_sql(n_sessions=200, seed=7, iters=5),
        "dsir_weights": f"""
WITH {_DSIR_W_CTES}
SELECT d.doc_id, coalesce(a.n_bigrams, 0)::bigint AS n_bigrams,
       coalesce(round(a.s, 6), 0.0) AS log_weight
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "dsir_select": f"""
WITH {_DSIR_W_CTES},
w AS (SELECT d.doc_id, coalesce(round(a.s, 6), 0.0) AS lw
      FROM documents d LEFT JOIN agg a USING (doc_id)),
cut AS (SELECT quantile_disc(lw, 0.75) AS c FROM w)
SELECT doc_id FROM w WHERE lw >= (SELECT c FROM cut) ORDER BY doc_id
""",
        "pagerank_prior": _pagerank_sql(k=5, d=0.85),
        "link_edges": f"""
WITH {_LINK_EDGES_CTE}
SELECT src, dst, anchor FROM edges ORDER BY src, dst, anchor
""",
        "anchor_terms_topk": f"""
WITH {_LINK_EDGES_CTE},
at AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
ct AS (SELECT doc_id, term, count(*)::bigint AS anchor_tf FROM at GROUP BY doc_id, term)
SELECT doc_id, term, anchor_tf FROM ct
ORDER BY anchor_tf DESC, doc_id, term LIMIT 100
""",
        "link_pagerank": _pagerank_sql(k=5, d=0.85, edges_cte=_LINK_EDGES_CTE),
        "personalized_pagerank": _pagerank_sql(
            k=5,
            d=0.85,
            edges_cte=_LINK_EDGES_CTE,
            seeds_cte="""seeds AS (
  SELECT DISTINCT src AS node FROM edges ORDER BY src LIMIT 3)""",
        ),
        # site-level authority: page ranks folded per host in exact
        # integer micro-units (round(r,6)*1e6) — order-independent sum,
        # LEFT JOIN so linkless docs count with zero mass
        "host_rank_mass": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},
hm AS (
  SELECT d.source || '.example.org' AS host,
         coalesce(round(round(r.r, 6) * 1000000.0), 0.0)::bigint AS m
  FROM documents d LEFT JOIN r5 r ON d.doc_id = r.node)
SELECT host, count(*)::bigint AS n_docs, sum(m)::bigint AS rank_mass_e6
FROM hm GROUP BY host ORDER BY host
""",
        "link_hits": _hits_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        "cocitation_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT src, dst FROM edges),
cc AS (SELECT e1.dst AS id_a, e2.dst AS id_b, count(*)::bigint AS n_shared
       FROM em e1 JOIN em e2 ON e1.src = e2.src AND e1.dst < e2.dst
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM cc
ORDER BY n_shared DESC, id_a, id_b LIMIT 100
""",
        "coupling_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT src, dst FROM edges),
cc AS (SELECT e1.src AS id_a, e2.src AS id_b, count(*)::bigint AS n_shared
       FROM em e1 JOIN em e2 ON e1.dst = e2.dst AND e1.src < e2.src
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM cc
ORDER BY n_shared DESC, id_a, id_b LIMIT 100
""",
        # degree features: LEFT JOIN zeros for docs outside the graph
        "link_degree_stats": f"""
WITH {_LINK_EDGES_CTE},
outd AS (SELECT src AS node, count(*)::bigint AS c FROM edges GROUP BY src),
ind AS (SELECT dst AS node, count(*)::bigint AS c FROM edges GROUP BY dst)
SELECT d.doc_id::bigint AS doc_id,
       coalesce(o.c, 0)::bigint AS out_links,
       coalesce(i.c, 0)::bigint AS in_links
FROM documents d
LEFT JOIN outd o ON o.node = d.doc_id
LEFT JOIN ind i ON i.node = d.doc_id
ORDER BY doc_id
""",
        # per-node triangle counts: canonical undirected dedup then the
        # textbook 3-way edge self-join (a < b < c); each corner counts
        "link_triangles": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, count(*)::bigint AS n_triangles
FROM corners GROUP BY node ORDER BY node
""",
        "link_communities": _lpa_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        # outlink-Jaccard coupling over DISTINCT edges: one integer
        # division per pair, ordered by the unrounded ratio
        "coupling_jaccard_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
outd AS (SELECT src, count(*)::bigint AS d FROM em GROUP BY src),
cc AS (SELECT e1.src AS id_a, e2.src AS id_b, count(*)::bigint AS s
       FROM em e1 JOIN em e2 ON e1.dst = e2.dst AND e1.src < e2.src
       GROUP BY 1, 2)
SELECT id_a, id_b, s AS n_shared,
       round(s::double / (da.d + db.d - s), 6) AS jaccard
FROM cc
JOIN outd da ON da.src = cc.id_a
JOIN outd db ON db.src = cc.id_b
ORDER BY s::double / (da.d + db.d - s) DESC, id_a, id_b LIMIT 20
""",
        # host-level link graph: edges joined to the doc→host mapping
        # on both endpoints (INNER — synthetic targets drop), counted
        "host_link_graph": f"""
WITH {_LINK_EDGES_CTE}
SELECT ds.source || '.example.org' AS src_host,
       dd.source || '.example.org' AS dst_host,
       count(*)::bigint AS n_links
FROM edges e
JOIN documents ds ON ds.doc_id = e.src
JOIN documents dd ON dd.doc_id = e.dst
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # BFS reachability from the 3 smallest sources: one frontier
        # CTE per hop (new = targets of the frontier not yet visited)
        "link_reachability": f"""
WITH {_LINK_EDGES_CTE},
seeds AS (SELECT DISTINCT src AS node FROM edges ORDER BY src LIMIT 3),
c0 AS MATERIALIZED (SELECT node, 0::bigint AS hops FROM seeds),
n1 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN c0 ON c0.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c0)),
c1 AS MATERIALIZED (
  SELECT node, hops FROM c0 UNION ALL SELECT node, 1::bigint FROM n1),
n2 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN n1 ON n1.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c1)),
c2 AS MATERIALIZED (
  SELECT node, hops FROM c1 UNION ALL SELECT node, 2::bigint FROM n2),
n3 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN n2 ON n2.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c2)),
c3 AS MATERIALIZED (
  SELECT node, hops FROM c2 UNION ALL SELECT node, 3::bigint FROM n3)
SELECT node, hops FROM c3 ORDER BY node
""",
        # local clustering coefficient: triangles per node over the
        # canonical undirected graph ÷ (deg choose 2); degree<2 → 0.0
        "link_clustering": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (
  SELECT node, count(*)::bigint AS d
  FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce) GROUP BY node),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
tcnt AS (
  SELECT node, count(*)::bigint AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT deg.node, deg.d AS degree, coalesce(tcnt.t, 0)::bigint AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN round((2.0 * coalesce(tcnt.t, 0)) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN tcnt USING (node) ORDER BY deg.node
""",
        # spell-corrected search: in-vocab terms pass through, each
        # out-of-vocab term takes its best levenshtein≤1 suggestion
        # (df desc, term asc), corrected set rescored with BM25
        "search_corrected": f"""
WITH {_BM25_SCORES},
qw AS (SELECT unnest(['join', 'merje', 'spork']) AS w),
inv AS (SELECT w FROM qw WHERE EXISTS (SELECT 1 FROM df WHERE df.term = qw.w)),
miss AS (SELECT w FROM qw WHERE w NOT IN (SELECT w FROM inv)),
corr AS (
  SELECT term FROM (
    SELECT m.w, df.term,
           row_number() OVER (
             PARTITION BY m.w ORDER BY df.df DESC, df.term ASC) AS rn
    FROM miss m JOIN df ON levenshtein(m.w, df.term) <= 1) WHERE rn = 1),
q2 AS (SELECT w AS term FROM inv UNION SELECT term FROM corr),
scores2 AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q2)
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores2 ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # pseudo-relevance feedback: base top-10 → pseudo-relevant tf
        # over those docs minus the query terms → 3 expansion terms by
        # round-6 tf·ln(N/df) (ties term asc) → rescore with q ∪ exp
        "search_prf": f"""
WITH {_BM25_SCORES},
r AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rtf AS (
  SELECT t.term, count(*)::bigint AS tf
  FROM tok t JOIN r USING (doc_id)
  WHERE t.term NOT IN (SELECT term FROM q)
  GROUP BY t.term),
expn AS (
  SELECT term FROM (
    SELECT rtf.term,
           row_number() OVER (
             ORDER BY round(rtf.tf * ln((SELECT n_docs FROM stats)::double
                                        / df.df), 6) DESC,
                      rtf.term ASC) AS rn
    FROM rtf JOIN df USING (term)) WHERE rn <= 3),
q2 AS (SELECT term FROM q UNION SELECT term FROM expn),
scores2 AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q2)
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores2 ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # reciprocal-rank fusion of the three gated rankings: body BM25,
        # standalone anchor-field BM25, pagerank static order — each
        # subsystem's rank list replayed exactly, then the fixed-order
        # coalesce sum 1/(60+rank) (Cormack '09)
        "search_rrf": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},{_BM25_SCORES},
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (
  SELECT (SELECT count(*) FROM adl) AS n_docs,
         (SELECT sum(doc_len) FROM adl)::double / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok GROUP BY doc_id, term),
adf AS (SELECT term, count(DISTINCT doc_id) AS df FROM atok GROUP BY term),
ascores AS (
  SELECT atf.doc_id,
         sum( ln((astats.n_docs - adf.df + 0.5)/(adf.df + 0.5) + 1.0)
              * atf.tf * 2.2
              / (atf.tf + 1.2 * (0.25 + 0.75 * adl.doc_len / astats.avgdl)) ) AS ascore
  FROM atf JOIN adf USING (term) JOIN adl USING (doc_id), astats
  WHERE atf.term IN (SELECT term FROM q)
  GROUP BY atf.doc_id),
br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
ar AS (SELECT doc_id, row_number() OVER (ORDER BY ascore DESC, doc_id ASC) AS rnk
       FROM ascores ORDER BY ascore DESC, doc_id ASC LIMIT 20),
prr AS (SELECT node AS doc_id,
               row_number() OVER (ORDER BY round(r, 6) DESC, node ASC) AS rnk
        FROM r5 ORDER BY round(r, 6) DESC, node ASC LIMIT 20),
fused AS (
  SELECT coalesce(br.doc_id, ar.doc_id, prr.doc_id) AS doc_id,
         coalesce(1.0 / (60 + br.rnk), 0.0)
           + coalesce(1.0 / (60 + ar.rnk), 0.0)
           + coalesce(1.0 / (60 + prr.rnk), 0.0) AS rrf
  FROM br
  FULL OUTER JOIN ar ON ar.doc_id = br.doc_id
  FULL OUTER JOIN prr ON prr.doc_id = coalesce(br.doc_id, ar.doc_id))
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
       doc_id, round(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10
""",
        # two-field BM25: body scores from the shared _BM25_SCORES chain,
        # anchor field rebuilt from the link edges with its OWN df/dl/avgdl
        # over the anchor pseudo-corpus (one pseudo-doc per link target),
        # combined body + 0.5·anchor via FULL OUTER JOIN (anchor-only docs
        # rank too — search.py::search_bm25_fielded)
        "bm25_anchor_topk": f"""
WITH {_LINK_EDGES_CTE},{_BM25_SCORES},
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (
  SELECT (SELECT count(*) FROM adl) AS n_docs,
         (SELECT sum(doc_len) FROM adl)::double / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok GROUP BY doc_id, term),
adf AS (SELECT term, count(DISTINCT doc_id) AS df FROM atok GROUP BY term),
ascores AS (
  SELECT atf.doc_id,
         sum( ln((astats.n_docs - adf.df + 0.5)/(adf.df + 0.5) + 1.0)
              * atf.tf * 2.2
              / (atf.tf + 1.2 * (0.25 + 0.75 * adl.doc_len / astats.avgdl)) ) AS ascore
  FROM atf JOIN adf USING (term) JOIN adl USING (doc_id), astats
  WHERE atf.term IN (SELECT term FROM q)
  GROUP BY atf.doc_id),
comb AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         coalesce(b.score, 0.0) + 0.5 * coalesce(a.ascore, 0.0) AS score
  FROM scores b FULL OUTER JOIN ascores a ON b.doc_id = a.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM comb ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # BM25 × computed pagerank prior: the full rank chain in one
        # statement — link edges → 5 pagerank iterations → prior
        # (1 + N·round(rank,6), matching the engine's baked doc_meta
        # value) → multiplied into the body score inside `scores`
        "bm25_pagerank_prior": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},{_BM25_SCORES},
pri AS (SELECT node AS doc_id,
               1.0 + (SELECT count(*) FROM nodes) * round(r, 6) AS prior
        FROM r5),
boosted AS (
  SELECT s.doc_id, s.score * coalesce(p.prior, 1.0) AS score
  FROM scores s LEFT JOIN pri p USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM boosted ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "search_facets": f"""
WITH tok AS ({_TOK}),
cand AS (SELECT DISTINCT doc_id FROM tok
         WHERE term IN (SELECT unnest(['join','merge','spark'])))
SELECT d.source AS facet, count(*)::bigint AS n_docs
FROM cand JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY n_docs DESC, facet LIMIT 10
""",
        "spell_suggest": f"""
WITH tok AS ({_TOK}),
v AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term),
w AS (SELECT unnest(['merje','spork']) AS word)
SELECT word, term, df FROM (
  SELECT w.word, v.term, v.df,
         row_number() OVER (PARTITION BY w.word ORDER BY v.df DESC, v.term) AS rn
  FROM w JOIN v ON levenshtein(w.word, v.term) <= 1)
WHERE rn <= 5 ORDER BY word, df DESC, term
""",
        "crawl_delta_stats": """
WITH oldp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' legacy' ELSE text END AS content
  FROM documents WHERE doc_id % 11 <> 3),
newp AS (SELECT doc_id, text AS content FROM documents WHERE doc_id % 13 <> 5),
j AS (SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.content <> n.content THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM oldp o FULL OUTER JOIN newp n ON o.doc_id = n.doc_id)
SELECT status, count(*)::bigint AS n_urls FROM j GROUP BY status ORDER BY status
""",
        "dedup_exact": """
SELECT min(doc_id)::bigint AS doc_id FROM documents GROUP BY text ORDER BY doc_id
""",
        # the full web-curation chain in one SQL statement: boilerplate
        # lines out (source-scoped ≥3 docs), surviving lines re-numbered,
        # global paragraph keep-first on the NEW ordinals, rebuilt text
        # (a doc with zero surviving lines re-splits to ONE '' paragraph
        # — the ren0 branch), token filter, exact dedup keep-min
        "curate_web_corpus": f"""
WITH ln AS (
  SELECT doc_id, source,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
freq AS (
  SELECT source, line FROM ln GROUP BY source, line
  HAVING count(DISTINCT doc_id) >= 3),
kept1 AS (
  SELECT l.doc_id, l.line, l.ord
  FROM ln l LEFT JOIN freq f ON l.source = f.source AND l.line = f.line
  WHERE f.line IS NULL),
ren AS (
  SELECT doc_id, line,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS ord2
  FROM kept1),
ren_all AS (
  SELECT * FROM ren
  UNION ALL
  SELECT doc_id, '' AS line, 0 AS ord2 FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM kept1)),
win AS (SELECT line, min(doc_id * 1048576 + ord2) AS r FROM ren_all GROUP BY line),
kept2 AS (
  SELECT n.doc_id, n.line, n.ord2 FROM ren_all n JOIN win w ON n.line = w.line
  WHERE n.doc_id * 1048576 + n.ord2 = w.r),
final AS (
  SELECT d.doc_id, coalesce(t.text, '') AS text
  FROM documents d LEFT JOIN (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY ord2) AS text
    FROM kept2 GROUP BY doc_id) t USING (doc_id)),
tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))::bigint AS n_tokens,
         text
  FROM final),
longdocs AS (SELECT * FROM tok WHERE n_tokens >= 10)
SELECT doc_id::bigint AS doc_id, n_tokens
FROM (SELECT *, min(doc_id) OVER (PARTITION BY text) AS keeper FROM longdocs)
WHERE doc_id = keeper ORDER BY doc_id
""",
        # semantic replay (string-level) of the hash-keyed line ops —
        # a stronger gate than a hash replay: it also verifies the
        # 64-bit line keys are collision-free on the corpus
        "remove_boilerplate": """
WITH ln AS (
  SELECT doc_id, source,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
freq AS (
  SELECT source, line FROM ln GROUP BY source, line
  HAVING count(DISTINCT doc_id) >= 3)
SELECT l.doc_id::bigint AS doc_id,
       coalesce(string_agg(CASE WHEN f.line IS NULL THEN l.line END,
                           chr(10) ORDER BY l.ord), '') AS text,
       count(f.line)::bigint AS n_removed
FROM ln l LEFT JOIN freq f ON l.source = f.source AND l.line = f.line
GROUP BY l.doc_id ORDER BY l.doc_id
""",
        "paragraph_dedup": """
WITH ln AS (
  SELECT doc_id,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
win AS (SELECT line, min(doc_id * 1048576 + ord) AS r FROM ln GROUP BY line)
SELECT l.doc_id::bigint AS doc_id,
       coalesce(string_agg(CASE WHEN l.doc_id * 1048576 + l.ord = w.r
                                THEN l.line END, chr(10) ORDER BY l.ord), '') AS text,
       count(CASE WHEN l.doc_id * 1048576 + l.ord <> w.r THEN 1 END)::bigint AS n_dropped
FROM ln l JOIN win w ON l.line = w.line
GROUP BY l.doc_id ORDER BY l.doc_id
""",
        "latest_event_per_user": """
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1 ORDER BY user_id
""",
        "latest_version_per_source": """
SELECT source, doc_id, version FROM (
  SELECT d.source, d.doc_id,
         concat(d.doc_id % 4, '.', d.doc_id % 10,
                CASE WHEN d.doc_id % 3 = 0 THEN '~rc1' ELSE '' END) AS version,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY d.doc_id % 4 DESC, d.doc_id % 10 DESC,
                    CASE WHEN d.doc_id % 3 = 0 THEN 0 ELSE 1 END DESC,
                    d.doc_id DESC) AS rn
  FROM documents d) WHERE rn = 1 ORDER BY source
""",
        "tumbling_window_agg": """
SELECT user_id::bigint AS user_id,
       ((epoch_us(ts) // 3600000000) * 3600000000)::bigint AS window_start,
       count(*)::bigint AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "hopping_window_agg": """
SELECT user_id::bigint AS user_id, ws::bigint AS window_start,
       count(*)::bigint AS n_events, round(sum(value), 6) AS sum_value
FROM (
  SELECT user_id, value,
         unnest(generate_series(
            greatest((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000, 0),
            (epoch_us(ts) // 1800000000) * 1800000000,
            1800000000)) AS ws
  FROM events)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "session_window_agg": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
flag AS (
  SELECT user_id, t, value,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
sess AS (
  SELECT user_id, t, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag)
SELECT user_id::bigint AS user_id, min(t)::bigint AS session_start,
       count(*)::bigint AS n_events, round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
""",
        "bm25_filtered": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rank,
       s.doc_id, round(s.score, 6) AS score
FROM scores s JOIN documents d USING (doc_id)
WHERE d.source = 'src3'
ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
""",
        "bm25_prior": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY p.pscore DESC, p.doc_id ASC) AS rank,
       p.doc_id, round(p.pscore, 6) AS score
FROM (SELECT doc_id, score * (1.0 + (doc_id % 5) / 10.0) AS pscore FROM scores) p
ORDER BY p.pscore DESC, p.doc_id ASC LIMIT 10
""",
        "grep_literal": f"""
SELECT doc_id,
       ((length(text) - length(replace(text, '{LITERAL}', ''))) / {len(LITERAL)})::bigint AS n_matches
FROM documents WHERE contains(text, '{LITERAL}') ORDER BY doc_id
""",
        "trigram_candidates": f"""
SELECT doc_id::bigint AS doc_id FROM documents WHERE {tri_conds} ORDER BY doc_id
""",
        "positional_match_count": f"""
SELECT doc_id,
       ((length(text) - length(replace(text, '{LITERAL}', ''))) / {len(LITERAL)})::bigint AS n_matches
FROM documents WHERE contains(text, '{LITERAL}') ORDER BY doc_id
""",
        # occurrence byte offsets via split-part cumulative lengths
        # (ASCII corpus: char offsets == byte offsets, same assumption
        # as positional_match_count)
        "proximity_search": """
WITH occ_a AS (
  SELECT doc_id, (s + (ord - 1) * 5)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(length(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'spark')) AS part,
                 unnest(range(1, len(str_split(text, 'spark')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts),
occ_b AS (
  SELECT doc_id, (s + (ord - 1) * 4)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(length(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'join')) AS part,
                 unnest(range(1, len(str_split(text, 'join')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts)
SELECT a.doc_id::bigint AS doc_id, count(*)::bigint AS n_pairs
FROM occ_a a JOIN occ_b b ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) <= 40
GROUP BY a.doc_id ORDER BY doc_id
""",
        "regex_search": f"""
SELECT doc_id::bigint AS doc_id, count(*)::bigint AS n_lines FROM (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
) WHERE regexp_matches(line, '{REGEX}') GROUP BY doc_id ORDER BY doc_id
""",
        "filter_ignored": """
SELECT doc_id, lang FROM documents
WHERE length(text) >= 50 AND length(text) <= 100000 AND lang NOT IN ('de')
ORDER BY doc_id
""",
        "lang_stats": """
SELECT lang, count(*)::bigint AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        "lsh_bucket_assignment": _lsh_assignment_sql(),
        "ivf_list_assignment": _ivf_assignment_sql(8),
        "knn_cosine_lsh": _lsh_knn_sql(),
        "knn_cosine_ivf_hashmin": _ivf_knn_hashmin_sql(),
        "embedding_near_dup_lsh": _near_dup_lsh_sql(),
        "embedding_near_dup": """
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS e FROM embeddings
)
SELECT a.vec_id::bigint AS id_a, b.vec_id::bigint AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.42
ORDER BY id_a, id_b
""",
        "langid": f"""
WITH tok AS ({_TOK}),
hits AS (
  SELECT t.doc_id, l.lang, count(*) AS score
  FROM tok t JOIN (VALUES {_langid_values()}) l(lang, word) ON t.term = l.word
  GROUP BY t.doc_id, l.lang),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM hits)
SELECT d.doc_id,
       coalesce(CASE WHEN b.score > 0 THEN b.lang END, 'unknown') AS pred_lang,
       coalesce(b.score, 0)::bigint AS lang_score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY doc_id
""",
        "doc_fingerprints": f"""
WITH fp AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(14695981039346656037::hugeint,
             list_transform(toks, t -> {_FNV_TOK.format(t='t')})),
           (h, th) -> (h * 1099511628211 + th) % {_M64}
         ) AS v
  FROM ({_TOKS_LIST})
)
SELECT doc_id,
       (CASE WHEN v >= 9223372036854775808 THEN v - {_M64} ELSE v END)::bigint
         AS fingerprint
FROM fp ORDER BY doc_id
""",
        "minhash_pairs": _minhash_pairs_sql(),
        "jaccard_verified_pairs": _jaccard_verified_sql(),
        "fuzzy_dedup_keep": _fuzzy_dedup_sql(),
        "connected_components": _connected_components_sql(),
        "dup_cluster_sizes": _connected_components_sql(
            tail="""SELECT sz AS cluster_size, count(*)::bigint AS n_clusters
FROM (SELECT component, count(*)::bigint AS sz FROM labels GROUP BY component)
GROUP BY sz ORDER BY sz"""
        ),
        # per-language log-odds keyness over the NB training counts
        "distinctive_terms_by_lang": f"""
WITH tok AS ({_TOK}),
tc AS MATERIALIZED (
  SELECT d.lang, t.term, count(*)::bigint AS c
  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2),
vocab AS (SELECT DISTINCT term FROM tok),
langs AS (SELECT DISTINCT lang FROM documents),
ctot AS (SELECT lang, sum(c)::double AS tot FROM tc GROUP BY lang),
ag AS (SELECT term, sum(c)::bigint AS call FROM tc GROUP BY term),
tota AS (SELECT sum(c)::double AS t FROM tc),
v AS (SELECT count(*)::double AS v FROM vocab),
s AS (
  SELECT l.lang, vb.term,
         ln((coalesce(tc.c, 0) + 1.0) / (ct.tot + (SELECT v FROM v)))
           - ln((ag.call + 1.0) / ((SELECT t FROM tota) + (SELECT v FROM v))) AS sc
  FROM langs l CROSS JOIN vocab vb
  LEFT JOIN tc ON tc.lang = l.lang AND tc.term = vb.term
  JOIN ctot ct ON ct.lang = l.lang
  JOIN ag ON ag.term = vb.term)
SELECT lang AS label, term, round(sc, 6) AS keyness
FROM (
  SELECT lang, term, sc,
         row_number() OVER (
           PARTITION BY lang ORDER BY round(sc, 6) DESC, term ASC) AS rn
  FROM s) WHERE rn <= 5
ORDER BY label, keyness DESC, term
""",
        "pricing_summary": """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
         round(l_quantity * 100)::bigint AS q,
         round(l_extendedprice * 100)::bigint AS p,
         round(l_discount * 100)::bigint AS d,
         round(l_tax * 100)::bigint AS t
  FROM lineitem WHERE l_shipdate <= DATE '1998-09-02')
SELECT l_returnflag, l_linestatus,
       sum(q)::double / 100.0 AS sum_qty,
       sum(p)::double / 100.0 AS sum_base_price,
       sum(p * (100 - d))::double / 10000.0 AS sum_disc_price,
       sum(p * (100 - d) * (100 + t))::double / 1000000.0 AS sum_charge,
       round(sum(q)::double / (100.0 * count(*)), 6) AS avg_qty,
       round(sum(p)::double / (100.0 * count(*)), 6) AS avg_price,
       round(sum(d)::double / (100.0 * count(*)), 6) AS avg_disc,
       count(*)::bigint AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "order_totals_by_nation": """
SELECT n_name, count(*)::bigint AS n_orders,
       sum(round(o_totalprice * 100)::bigint)::double / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
        # TPC-H-Q10-style returned-item customer revenue (1996Q1)
        "customer_returns": """
WITH j AS (
  SELECT o_custkey,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'),
pc AS (SELECT o_custkey, sum(rev1e4) AS r FROM j GROUP BY o_custkey)
SELECT c.c_custkey, c.c_name, pc.r::double / 10000.0 AS revenue,
       c.c_acctbal, n.n_name
FROM pc
JOIN customer c ON c.c_custkey = pc.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY pc.r DESC, c.c_custkey ASC LIMIT 20
""",
        # TPC-H-Q14-style promotion effect (Jan 1996)
        "promo_revenue": """
WITH j AS (
  SELECT p.p_type,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-02-01'),
s AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev1e4 ELSE 0 END)::bigint AS pr,
         sum(rev1e4)::bigint AS tot
  FROM j)
SELECT pr AS promo_rev1e4, tot AS total_rev1e4,
       round(CASE WHEN tot > 0 THEN (100.0 * pr) / tot ELSE 0.0 END, 6)
         AS promo_pct
FROM s
""",
        # TPC-H-Q18-style large-volume orders (total qty > 100)
        "large_orders": """
WITH q AS (
  SELECT l_orderkey, sum(round(l_quantity * 100)::bigint) AS q1e2
  FROM lineitem GROUP BY l_orderkey HAVING q1e2 > 10000)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       q.q1e2::double / 100.0 AS total_qty
FROM orders o JOIN q ON q.l_orderkey = o.o_orderkey
ORDER BY round(o.o_totalprice * 100)::bigint DESC, o.o_orderkey ASC LIMIT 20
""",
        "local_supplier_volume": """
WITH j AS (
  SELECT n_name,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT n_name, sum(rev1e4)::double / 10000.0 AS revenue
FROM j GROUP BY n_name ORDER BY revenue DESC, n_name
""",
        "shipping_priority": """
WITH j AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15')
SELECT l_orderkey, sum(rev1e4)::double / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM j GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
""",
        # TPC-H-Q6-style forecast revenue (integer 1e-4 units)
        "forecast_revenue": """
WITH f AS (
  SELECT round(l_extendedprice * 100)::bigint
           * round(l_discount * 100)::bigint AS d1e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND round(l_discount * 100) BETWEEN 5 AND 7
    AND round(l_quantity * 100) < 2400)
SELECT coalesce(sum(d1e4), 0)::bigint AS disc_rev1e4,
       round(coalesce(sum(d1e4), 0) / 10000.0, 6) AS revenue
FROM f
""",
        # TPC-H-Q4-shape: EXISTS semi-join, counts per priority
        "order_priority_counts": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        # TPC-H-Q13-shape: order-count histogram incl. the zero bucket
        "customer_order_histogram": """
WITH pc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT c_count, count(*) AS custdist
FROM pc GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
        # TPC-H-Q15-style top supplier (all ties at the max)
        "top_supplier": """
WITH r AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice * 100)::bigint
               * (100 - round(l_discount * 100)::bigint)) AS rev1e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, round(r.rev1e4 / 10000.0, 6) AS total_revenue
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev1e4 = (SELECT max(rev1e4) FROM r)
ORDER BY s.s_suppkey
""",
        # TPC-H-Q17-shape: correlated per-part AVG as exact integers
        # (5*q*cnt < sum_q  <=>  q < 0.2*avg(q))
        "small_quantity_revenue": """
WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
li AS (
  SELECT l_partkey,
         round(l_quantity * 100)::bigint AS q1e2,
         round(l_extendedprice * 100)::bigint AS p1e2
  FROM lineitem JOIN pp ON pp.p_partkey = lineitem.l_partkey),
st AS (SELECT l_partkey, sum(q1e2) AS sq, count(*) AS cnt FROM li GROUP BY 1)
SELECT coalesce(sum(p1e2), 0)::bigint AS sum_p1e2,
       round(coalesce(sum(p1e2), 0) / 700.0, 6) AS avg_yearly
FROM li JOIN st USING (l_partkey)
WHERE 5 * q1e2 * cnt < sq
""",
        # TPC-H-Q19-shape: disjunctive (brand, size, qty) predicate arms
        "disjunctive_revenue": """
WITH j AS (
  SELECT round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND round(l_quantity * 100) BETWEEN 100 AND 1100)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND round(l_quantity * 100) BETWEEN 1000 AND 2000)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         AND round(l_quantity * 100) BETWEEN 2000 AND 3000))
SELECT coalesce(sum(rev1e4), 0)::bigint AS rev1e4,
       round(coalesce(sum(rev1e4), 0) / 10000.0, 6) AS revenue
FROM j
""",
        # domain-diversity cap: ≤3 longest docs per source host
        "host_cap_sample": """
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, source, n_chars FROM rk WHERE rn <= 3 ORDER BY doc_id
""",
        # TPC-H-Q7-shape cross-bloc shipping volume by ship year
        "volume_shipping": """
WITH j AS (
  SELECT CASE WHEN s.s_nationkey < 12 THEN 'WEST' ELSE 'EAST' END AS supp_bloc,
         EXTRACT(year FROM l_shipdate)::bigint AS l_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((s.s_nationkey < 12) <> (c.c_nationkey < 12)))
SELECT supp_bloc, l_year, round(sum(rev1e4) / 10000.0, 6) AS revenue
FROM j GROUP BY 1, 2 ORDER BY 1, 2
""",
        # TPC-H-Q8-shape market share of NATION_1 suppliers in AMERICA
        "market_share": """
WITH j AS (
  SELECT EXTRACT(year FROM o_orderdate)::bigint AS o_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4,
         CASE WHEN ns.n_name = 'NATION_1' THEN 1 ELSE 0 END AS is_nat
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'),
a AS (
  SELECT o_year, sum(is_nat * rev1e4)::bigint AS nat_rev1e4,
         sum(rev1e4)::bigint AS total_rev1e4
  FROM j GROUP BY o_year)
SELECT o_year, nat_rev1e4, total_rev1e4,
       CASE WHEN total_rev1e4 > 0
            THEN round(nat_rev1e4 / total_rev1e4::double, 6) ELSE 0.0 END
         AS mkt_share
FROM a ORDER BY o_year
""",
        # exact daily distinct actives (DAU)
        "daily_distinct_users": """
SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id)::bigint AS n_users
FROM events GROUP BY 1 ORDER BY 1
""",
        # per-class precision/recall/F1 over the replayed NB confusion
        "nb_prf_metrics": f"""
WITH {{NB}}
conf AS (
  SELECT d.lang AS t, p.lang AS pr, count(*)::bigint AS n
  FROM (SELECT doc_id, lang FROM pred WHERE rn = 1) p
  JOIN documents d USING (doc_id) GROUP BY 1, 2),
klass AS (SELECT DISTINCT lang FROM documents),
st AS (
  SELECT c.lang,
         coalesce((SELECT sum(n) FROM conf WHERE t = c.lang AND pr = c.lang), 0)
           ::bigint AS tp,
         coalesce((SELECT sum(n) FROM conf WHERE t = c.lang), 0)::bigint AS n_true,
         coalesce((SELECT sum(n) FROM conf WHERE pr = c.lang), 0)::bigint AS n_pred
  FROM klass c),
pr_ AS (
  SELECT lang, tp, n_true, n_pred,
         CASE WHEN n_pred > 0 THEN tp / n_pred::double ELSE 0.0 END AS p,
         CASE WHEN n_true > 0 THEN tp / n_true::double ELSE 0.0 END AS r
  FROM st)
SELECT lang, tp, n_true, n_pred,
       round(p, 6) AS prec, round(r, 6) AS rec,
       round(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
FROM pr_ ORDER BY lang
""".replace("{NB}", _NB_PRED_CTES + ","),
        # KMV bottom-k distinct sketch, bit-exact splitmix64 replay
        "kmv_distinct_users": _kmv_sql(k=8),
        # undirected Newman degree assortativity over the link graph
        # (integer moments + the canonical corr float recipe); the
        # directed out→in variant is degenerate here — every page has
        # out-degree exactly 3, so x would be constant
        "degree_assortativity": f"""
WITH {_LINK_EDGES_CTE},
ce AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       FROM edges WHERE src <> dst),
und AS (SELECT u AS a, v AS b FROM ce UNION ALL SELECT v, u FROM ce),
dg AS (SELECT a AS node, count(*)::bigint AS d FROM und GROUP BY a),
xy AS (SELECT da.d AS x, db.d AS y
       FROM und JOIN dg da ON und.a = da.node JOIN dg db ON und.b = db.node),
m AS (SELECT count(*)::bigint AS n, sum(x)::bigint AS sx, sum(y)::bigint AS sy,
             sum(x * y)::bigint AS sxy, sum(x * x)::bigint AS sxx,
             sum(y * y)::bigint AS syy
      FROM xy)
SELECT n AS n_edges,
       CASE WHEN ((n::double * sxx::double) - (sx::double * sx::double)) > 0
             AND ((n::double * syy::double) - (sy::double * sy::double)) > 0
            THEN round(((n::double * sxy::double) - (sx::double * sy::double))
                   / (sqrt((n::double * sxx::double) - (sx::double * sx::double))
                      * sqrt((n::double * syy::double) - (sy::double * sy::double))), 6)
            ELSE 0.0 END AS assortativity
FROM m
""",
        # k-core peeling of the undirected link graph (k=4, 4 rounds)
        "link_kcore": _kcore_sql(k=4, rounds=4),
        # MMR result diversification: 5 greedy rounds over BM25 top-20
        # with hash-embedding cosine redundancy, rounded-argmax gated
        "mmr_diversified": _mmr_sql(n_cand=20, k_sel=5),
        # per-host intra-site link share
        "intra_host_link_ratio": f"""
WITH {_LINK_EDGES_CTE},
m AS (
  SELECT ds.source AS src_host,
         CASE WHEN ds.source = dd.source THEN 1 ELSE 0 END AS intra
  FROM edges e
  JOIN documents ds ON ds.doc_id = e.src
  JOIN documents dd ON dd.doc_id = e.dst)
SELECT src_host, count(*)::bigint AS n_links, sum(intra)::bigint AS n_intra,
       round(sum(intra) / count(*)::double, 6) AS intra_ratio
FROM m GROUP BY src_host ORDER BY src_host
""",
        # per-doc lexical diversity (type-token ratio)
        "type_token_ratio": f"""
SELECT doc_id, count(*)::bigint AS n_tokens,
       count(DISTINCT term)::bigint AS n_types,
       round(count(DISTINCT term) / count(*)::double, 6) AS ttr
FROM ({_TOK}) GROUP BY doc_id ORDER BY doc_id
""",
        # per-type variance-to-mean ratio of the daily count series
        "event_burstiness": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, count(*)::bigint AS n_days, sum(n)::bigint AS sx,
         sum(n * n)::bigint AS sxx
  FROM c GROUP BY event_type)
SELECT event_type, n_days, sx AS sum_n,
       round((sxx::double / n_days - (sx::double / n_days) * (sx::double / n_days))
               / (sx::double / n_days), 6) AS vmr
FROM m ORDER BY event_type
""",
        # rolling 7-day WAU + DAU/WAU stickiness per observed day
        "weekly_active_users": """
WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM p),
w AS (SELECT d.day, p.user_id
      FROM days d JOIN p ON p.day BETWEEN d.day - 6 AND d.day),
wau AS (SELECT day, count(DISTINCT user_id)::bigint AS wau FROM w GROUP BY day),
dau AS (SELECT day, count(DISTINCT user_id)::bigint AS dau FROM p GROUP BY day)
SELECT day, dau, wau, round(dau / wau::double, 6) AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day
""",
        # TPC-H-Q9-shape (adapted: no partsupp → profit = discounted revenue)
        "product_profit_by_nation": """
WITH j AS (
  SELECT n.n_name AS nation,
         EXTRACT(year FROM l_shipdate)::bigint AS o_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey)
SELECT nation, o_year, round(sum(rev1e4) / 10000.0, 6) AS sum_profit
FROM j GROUP BY 1, 2 ORDER BY nation, o_year DESC
""",
        # Zipf rank-frequency OLS over the top-500 corpus terms
        "zipf_slope": f"""
WITH tok AS ({_TOK}),
tc AS (SELECT term, count(*)::bigint AS c FROM tok GROUP BY term),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM tc),
top AS (SELECT ln(r::double) AS x, ln(c::double) AS y FROM rk WHERE r <= 500),
s AS (SELECT count(*)::bigint AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM top),
fit AS (SELECT n, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope, sx, sy FROM s)
SELECT n AS n_terms, round(slope, 6) AS slope,
       round((sy - slope * sx) / n, 6) AS intercept
FROM fit
""",
        # one-way ANOVA of n_chars across languages, from exact integer partials
        "anova_length_by_lang": """
WITH g AS (
  SELECT lang, count(*)::bigint AS n, sum(n_chars)::bigint AS s,
         sum(n_chars * n_chars)::bigint AS ss
  FROM documents GROUP BY lang),
t AS (SELECT count(*)::bigint AS k, sum(n)::bigint AS big_n,
             sum(s)::double AS big_s, sum(ss)::double AS big_ss,
             sum(ss::double - s::double * s / n) AS ssw
      FROM g),
f AS (SELECT k, big_n, big_ss - big_s * big_s / big_n AS sst, ssw FROM t)
SELECT k AS k_groups, big_n AS n_rows,
       round(((sst - ssw) / (k - 1)) / (ssw / (big_n - k)), 6) AS f_stat,
       round((sst - ssw) / sst, 6) AS eta_sq
FROM f
""",
        # top-20 consecutive event-type trigrams per user (ts, event_id order)
        "event_trigrams": """
WITH s AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT e1, e2, e3, count(*)::bigint AS cnt
      FROM s WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT e1, e2, e3, cnt FROM g
ORDER BY cnt DESC, e1, e2, e3 LIMIT 20
""",
        # MOSS winnowing (k=3 token-grams, w=4): per-doc count + XOR of the
        # selected min-hash set; gram hash = the doc_fingerprints FNV fold
        "winnow_fingerprints": f"""
WITH tl AS ({_TOKS_LIST}),
lb AS (SELECT doc_id, toks, len(toks) AS n FROM tl WHERE len(toks) >= 3),
tp AS (SELECT doc_id, unnest(range(1, n + 1)) AS i, toks FROM lb),
-- NB: toks[i] must be materialized BEFORE the FNV macro — its lambda
-- variable is also named i and would shadow the position column
tt AS (SELECT doc_id, i, toks[i] AS tok FROM tp),
th AS (SELECT doc_id, i, {_FNV_TOK.format(t='tok')} AS h FROM tt),
g1 AS (SELECT doc_id, i,
         (14695981039346656037::hugeint * 1099511628211 % {_M64} + h) % {_M64} AS s1,
         lead(h, 1) OVER win AS h2, lead(h, 2) OVER win AS h3
       FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
g AS (SELECT doc_id, i,
        ((s1 * 1099511628211 % {_M64} + h2) % {_M64}
           * 1099511628211 % {_M64} + h3) % {_M64} AS gh
      FROM g1 WHERE h3 IS NOT NULL),
wm AS (SELECT doc_id,
         min(gh) OVER fr AS fp, count(*) OVER fr AS cw
       FROM g
       WINDOW fr AS (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
sel AS (SELECT DISTINCT doc_id, fp FROM wm WHERE cw = 4),
per AS (SELECT doc_id, count(*)::bigint AS n_fp,
               bit_xor((CASE WHEN fp >= 9223372036854775808 THEN fp - {_M64}
                             ELSE fp END)::bigint) AS fp_xor
        FROM sel GROUP BY doc_id)
SELECT d.doc_id::bigint AS doc_id,
       coalesce(p.n_fp, 0)::bigint AS n_fp,
       coalesce(p.fp_xor, 0)::bigint AS fp_xor
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
""",
        # Adamic–Adar co-citation over DISTINCT edges, top-20 by round(score,6)
        "adamic_adar_topk": f"""
WITH {_LINK_EDGES_CTE},
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
deg AS (SELECT src, count(*)::bigint AS d FROM ed GROUP BY src),
aa AS (SELECT e1.dst AS id_a, e2.dst AS id_b,
              sum(1.0 / ln(deg.d::double)) AS score
       FROM ed e1 JOIN ed e2 ON e1.src = e2.src AND e1.dst < e2.dst
       JOIN deg ON deg.src = e1.src
       GROUP BY 1, 2)
SELECT id_a, id_b, round(score, 6) AS aa_score FROM aa
ORDER BY round(score, 6) DESC, id_a, id_b LIMIT 20
""",
        # SMART lnc.ltc tf-idf cosine retrieval, top-10 by round(score,6)
        "tfidf_cosine_topk": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
wd AS (SELECT doc_id, term, 1.0 + ln(tf::double) AS w FROM tf),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS norm_d FROM wd GROUP BY doc_id),
nd AS (SELECT count(*)::double AS n FROM documents),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
df AS (SELECT term, count(DISTINCT doc_id)::double AS df
       FROM tok WHERE term IN (SELECT term FROM q) GROUP BY term),
qw AS (SELECT term, ln((SELECT n FROM nd) / df) AS w FROM df),
qn AS (SELECT sqrt(sum(w * w)) AS norm_q FROM qw),
s AS (SELECT wd.doc_id, sum(wd.w * qw.w) AS num
      FROM wd JOIN qw USING (term) GROUP BY wd.doc_id),
sc AS (SELECT s.doc_id,
              round(num / (nrm.norm_d * (SELECT norm_q FROM qn)), 6) AS score
       FROM s JOIN nrm ON nrm.doc_id = s.doc_id WHERE num > 0)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10
""",
        # Dirichlet query likelihood (mu=300): sparse rewrite
        # ln(1 + tf/(mu*p_c)) + m*ln(mu/(dl+mu)) over matching docs
        "qljm_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
konst AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                     / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
       FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
       GROUP BY tf.doc_id),
scores AS (SELECT doc_id, sp + (SELECT c0 FROM konst) AS score FROM sp)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "recrawl_priority": """
WITH pu0 AS (SELECT doc_id, xor(doc_id::ubigint, 12::ubigint)::hugeint AS x0 FROM documents),
pu1 AS (SELECT doc_id, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM pu0),
pu2 AS (SELECT doc_id, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM pu1),
pu AS (SELECT doc_id, 5 + (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 90)::bigint AS p FROM pu2),
vis AS (SELECT doc_id, unnest(range(1, 9)) AS i FROM documents),
v0 AS (SELECT doc_id, i, xor((doc_id * 16 + i)::ubigint, 11::ubigint)::hugeint AS x0 FROM vis),
v1 AS (SELECT doc_id, i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM v0),
v2 AS (SELECT doc_id, i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM v1),
vh AS (SELECT doc_id, i, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM v2),
agg AS (SELECT v.doc_id,
               sum(CASE WHEN (v.h % 100) < p.p THEN 1 ELSE 0 END)::bigint AS x
        FROM vh v JOIN pu p USING (doc_id) GROUP BY v.doc_id)
SELECT row_number() OVER (ORDER BY x DESC, doc_id ASC)::bigint AS rank,
       doc_id, x AS n_changes,
       round(-ln((8 - x + 0.5) / (8 + 0.5)), 6) + 0.0 AS lambda_hat
FROM agg ORDER BY x DESC, doc_id ASC LIMIT 50
""",
        "template_ngrams": """
WITH injected AS (
  SELECT doc_id, source,
         'tplheader ' || source || ' nav home about contact privacy end ' || text AS text
  FROM documents),
toks AS (SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '') AS ts
         FROM injected),
tpos AS (SELECT doc_id, source, unnest(ts) AS term,
                unnest(range(1, len(ts) + 1)) AS pos
         FROM toks),
g AS (SELECT a.doc_id, a.source,
             a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term || ' ' || e.term AS gram
      FROM tpos a
      JOIN tpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN tpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      JOIN tpos d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
      JOIN tpos e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4),
dg AS (SELECT DISTINCT source, gram, doc_id FROM g),
cnt AS (SELECT source, gram, count(*)::bigint AS n_docs FROM dg GROUP BY source, gram),
tot AS (SELECT source, count(*)::bigint AS t FROM documents GROUP BY source)
SELECT c.source, c.gram, c.n_docs,
       round(c.n_docs::double / t.t, 6) + 0.0 AS frac
FROM cnt c JOIN tot t USING (source)
WHERE c.n_docs * 5 >= 3 * t.t
ORDER BY source, gram
""",
        "bm25f_topk": f"""
WITH {_LINK_EDGES_CTE},
tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
              (SELECT sum(doc_len) FROM dl)::double
                / (SELECT count(*) FROM documents) AS avgdl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
btfn AS (SELECT tf.doc_id, tf.term,
                tf.tf / (1.0 + 0.75 * (dl.doc_len / st.avgdl - 1.0)) AS tfn
         FROM tf JOIN dl USING (doc_id), st),
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (SELECT (SELECT sum(doc_len) FROM adl)::double
                    / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
atfn AS (SELECT atf.doc_id, atf.term,
                atf.tf / (1.0 + 0.75 * (adl.doc_len / astats.avgdl - 1.0)) AS tfn
         FROM atf JOIN adl USING (doc_id), astats),
comb AS (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
                coalesce(b.term, a.term) AS term,
                coalesce(b.tfn, 0.0) + 2.0 * coalesce(a.tfn, 0.0) AS c
         FROM btfn b FULL OUTER JOIN atfn a
           ON b.doc_id = a.doc_id AND b.term = a.term),
ts AS (SELECT c.doc_id,
              ln(((SELECT n_docs FROM st) - coalesce(df.df, 0) + 0.5)
                 / (coalesce(df.df, 0) + 0.5) + 1.0)
              * c.c * 2.2 / (c.c + 1.2) AS s
       FROM comb c LEFT JOIN df ON c.term = df.term),
scores AS (SELECT doc_id, sum(s) AS score FROM ts GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "cascade_click_model": f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos,
         (SELECT doc_id FROM ranked r WHERE r.rank = pos) AS doc_id
  FROM (SELECT unnest(range(400)) AS s), (SELECT unnest(range(1, 11)) AS pos)),
c0 AS (SELECT *, xor((s*16+pos)::ubigint, 10::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, 11::ubigint)::hugeint AS d0 FROM imp),
c1 AS (SELECT *, ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a1,
               ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d1 FROM c0),
c2 AS (SELECT *, ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a2,
               ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d2 FROM c1),
att AS MATERIALIZED (
  SELECT s, pos, doc_id,
         CASE WHEN (xor(a2::ubigint, a2::ubigint >> 31)::hugeint % 16)
                   < (3 + (xor(d2::ubigint, d2::ubigint >> 31)::hugeint % 10))
              THEN 1 ELSE 0 END AS att
  FROM c2),
firstp AS (SELECT s, coalesce(min(pos) FILTER (WHERE att = 1), 11) AS fp
           FROM att GROUP BY s),
clog AS (
  SELECT a.doc_id,
         CASE WHEN a.pos <= least(f.fp, 10) THEN 1 ELSE 0 END AS examined,
         CASE WHEN a.att = 1 AND a.pos = f.fp THEN 1 ELSE 0 END AS click
  FROM att a JOIN firstp f USING (s)),
agg AS (SELECT doc_id, sum(click)::bigint AS n_clicks,
               sum(examined)::bigint AS n_examined
        FROM clog GROUP BY doc_id)
SELECT doc_id, n_clicks, n_examined,
       CASE WHEN n_examined > 0
            THEN round(n_clicks::double / n_examined, 6) + 0.0
            ELSE 0.0 END AS a_hat
FROM agg ORDER BY doc_id
""",
        "pairwise_ltr": _ltr_sql(n_iter=8, lr=0.1),
        "tfidf_cosine_index": f"""
WITH tok AS ({_TOK}),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
idf AS (SELECT term, ln((SELECT n FROM st) / df) AS idf FROM df),
tfv AS (SELECT doc_id, term, count(*)::double AS tf FROM tok GROUP BY doc_id, term),
norms AS (SELECT t.doc_id,
                 round(sqrt(sum((t.tf * i.idf) * (t.tf * i.idf))), 6) + 0.0 AS norm
          FROM tfv t JOIN idf i USING (term) GROUP BY t.doc_id),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
qn AS (SELECT sqrt(sum(idf * idf)) AS v FROM idf
       WHERE term IN (SELECT term FROM q)),
sp AS (SELECT t.doc_id, sum(t.tf * i.idf * i.idf) AS s
       FROM tfv t JOIN idf i USING (term)
       WHERE t.term IN (SELECT term FROM q) GROUP BY t.doc_id),
scores AS (SELECT sp.doc_id, sp.s / ((SELECT v FROM qn) * n.norm) AS score
           FROM sp JOIN norms n USING (doc_id) WHERE n.norm > 0)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) + 0.0 AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "query_selectivity": _selectivity_sql(),
        "dust_rules": r"""
WITH raws AS (
  SELECT 'http://' || source || '.site/p' || doc_id AS url, text FROM documents
  UNION ALL
  SELECT 'http://' || source || '.site/p' || doc_id || '?sid=a' || (doc_id % 13), text
  FROM documents
  UNION ALL
  SELECT 'http://' || source || '.site/p' || doc_id || '?ref=r' || (doc_id % 3), text
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'http://' || source || '.site/list?page=' || (doc_id % 4),
         'listing ' || source || ' ' || doc_id
  FROM documents),
keys AS (SELECT unnest(['page', 'ref', 'sid']) AS pkey),
stripped AS (
  SELECT k.pkey, r.url AS raw, r.text,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           r.url, '(?:([?&])' || k.pkey || '=[^&]*)', '\1'),
           '[?&]+$', ''), '\?&', '?'), '&&', '&') AS bucket
  FROM raws r, keys k),
rows2 AS (
  SELECT pkey, bucket, raw, text FROM stripped WHERE bucket <> raw
  UNION ALL
  SELECT k.pkey, r.url, r.url, r.text FROM raws r, keys k),
per AS (SELECT pkey, bucket, count(DISTINCT raw) AS nraw,
               count(DISTINCT text) AS nh
        FROM rows2 GROUP BY pkey, bucket),
agg AS (SELECT pkey,
               sum(CASE WHEN nraw >= 2 AND nh = 1 THEN 1 ELSE 0 END)::bigint AS support,
               sum(CASE WHEN nraw >= 2 AND nh > 1 THEN 1 ELSE 0 END)::bigint AS violations
        FROM per GROUP BY pkey)
SELECT pkey AS param_key, support, violations,
       (support >= 2 AND violations = 0) AS valid
FROM agg ORDER BY param_key
""",
        "crawl_budget": """
WITH pu0 AS (SELECT doc_id, source, xor(doc_id::ubigint, 12::ubigint)::hugeint AS x0 FROM documents),
pu1 AS (SELECT doc_id, source, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM pu0),
pu2 AS (SELECT doc_id, source, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM pu1),
pu AS (SELECT doc_id, source, 5 + (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 90)::bigint AS p FROM pu2),
vis AS (SELECT doc_id, unnest(range(1, 9)) AS i FROM documents),
v0 AS (SELECT doc_id, i, xor((doc_id * 16 + i)::ubigint, 11::ubigint)::hugeint AS x0 FROM vis),
v1 AS (SELECT doc_id, i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM v0),
v2 AS (SELECT doc_id, i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM v1),
vh AS (SELECT doc_id, i, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM v2),
perdoc AS (SELECT p.source, p.doc_id,
                  sum(CASE WHEN (v.h % 100) < p.p THEN 1 ELSE 0 END)::bigint AS x
           FROM vh v JOIN pu p USING (doc_id) GROUP BY p.source, p.doc_id),
mass AS (SELECT source, sum(x)::bigint AS m FROM perdoc GROUP BY source),
tot AS (SELECT sum(m)::bigint AS t FROM mass),
ap AS (SELECT source, m,
              (1000 * m) // (SELECT t FROM tot) AS base,
              (1000 * m) % (SELECT t FROM tot) AS rem
       FROM mass),
lft AS (SELECT 1000 - sum(base)::bigint AS l FROM ap),
rk AS (SELECT source, m, base, rem,
              row_number() OVER (ORDER BY rem DESC, source ASC) AS r
       FROM ap)
SELECT source, m AS change_mass,
       (base + CASE WHEN r <= (SELECT l FROM lft) THEN 1 ELSE 0 END)::bigint AS alloc
FROM rk ORDER BY source
""",
        "serp_ctr_curve": _serp_ctr_sql(n_sessions=200, seed=7),
        "nqc_difficulty": _nqc_sql(k=50),
        "static_cache_hit_curve": """
WITH req AS (SELECT unnest(range(20000)) AS i),
a0 AS (SELECT i, xor(i::ubigint, 21::ubigint)::hugeint AS x0,
             xor(i::ubigint, 22::ubigint)::hugeint AS y0 FROM req),
a1 AS (SELECT i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1,
             ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y1 FROM a0),
a2 AS (SELECT i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2,
             ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y2 FROM a1),
draws AS (SELECT i, least(xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 200,
                          xor(y2::ubigint, y2::ubigint >> 31)::hugeint % 200)::bigint AS qid
          FROM a2),
freq AS (SELECT qid, count(*)::bigint AS f FROM draws GROUP BY qid),
ranked AS (SELECT qid, f, row_number() OVER (ORDER BY f DESC, qid ASC) AS r
           FROM freq ORDER BY f DESC, qid ASC LIMIT 20)
SELECT r AS rank, qid AS query_id, f AS freq,
       round(sum(f) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)::double
             / 20000, 6) + 0.0 AS cum_hit_rate
FROM ranked ORDER BY rank
""",
        "rbp_err_eval": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
lab AS (
  SELECT r.rank,
         CASE WHEN r.doc_id IN (SELECT doc_id FROM rel) THEN 1.0 ELSE 0.0 END AS g
  FROM ranked r),
labc AS (
  SELECT rank, g,
         coalesce(sum(g) OVER (ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS before
  FROM lab),
nrel AS (SELECT count(*)::bigint AS r FROM rel)
SELECT (SELECT r FROM nrel) AS n_relevant,
       round((1.0 - 0.8) * (SELECT sum(g * power(0.8, rank - 1.0)) FROM lab), 6) + 0.0 AS rbp_08,
       round((SELECT sum(g * (0.5 / rank) * power(0.5, before)) FROM labc), 6) + 0.0 AS err
""",
        "hyperanf_neighborhood": _hyperanf_sql(rounds=3),
        "kleinberg_bursts": """
WITH RECURSIVE
raw AS (SELECT (epoch_us(ts) // 86400000000)::bigint AS day,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS r0,
               count(*)::bigint AS n
        FROM events GROUP BY 1),
dd AS (SELECT row_number() OVER (ORDER BY day) AS i, day,
              CASE WHEN day % 7 = 3 THEN least(n, r0 * 3) ELSE r0 END AS r, n
       FROM raw),
st AS (SELECT sum(r)::bigint AS R, sum(n)::bigint AS N, count(*)::bigint AS T FROM dd),
params AS (SELECT R::double / N AS p0,
                  least(2.0 * (R::double / N), 0.9999) AS p1,
                  1.0 * ln(T) AS g
           FROM st),
dp(i, c0, c1, s0, s1) AS (
  SELECT 1::bigint,
         -(d.r * ln(p.p0) + (d.n - d.r) * ln(1 - p.p0)),
         p.g + (-(d.r * ln(p.p1) + (d.n - d.r) * ln(1 - p.p1))),
         '0', '1'
  FROM dd d, params p WHERE d.i = 1
  UNION ALL
  SELECT d.i,
         (-(d.r * ln(p.p0) + (d.n - d.r) * ln(1 - p.p0)))
           + CASE WHEN dp.c0 <= dp.c1 THEN dp.c0 ELSE dp.c1 END,
         (-(d.r * ln(p.p1) + (d.n - d.r) * ln(1 - p.p1)))
           + CASE WHEN dp.c0 + p.g <= dp.c1 THEN dp.c0 + p.g ELSE dp.c1 END,
         (CASE WHEN dp.c0 <= dp.c1 THEN dp.s0 ELSE dp.s1 END) || '0',
         (CASE WHEN dp.c0 + p.g <= dp.c1 THEN dp.s0 ELSE dp.s1 END) || '1'
  FROM dp JOIN dd d ON d.i = dp.i + 1, params p
),
fin AS (SELECT CASE WHEN c0 <= c1 THEN s0 ELSE s1 END AS seq
        FROM dp WHERE i = (SELECT T FROM st))
SELECT d.day, d.r, d.n, CAST(substr(f.seq, d.i::int, 1) AS BIGINT) AS state
FROM dd d, fin f ORDER BY d.day
""",
        "trustrank_spam_mass": _trustrank_sql(),
        "consistent_hash_ring": _ring_sql(),
        "bm25plus_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * (tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl))
                 + 1.0) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ('join', 'merge', 'spark')
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) + 0.0 AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "prospective_alerts": _alerts_sql(),
        "related_queries": """
WITH req AS (SELECT unnest(range(20000)) AS i),
a0 AS (SELECT i, xor(i::ubigint, 21::ubigint)::hugeint AS x0,
             xor(i::ubigint, 22::ubigint)::hugeint AS y0 FROM req),
a1 AS (SELECT i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1,
             ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y1 FROM a0),
a2 AS (SELECT i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2,
             ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y2 FROM a1),
draws AS (SELECT (i // 10)::bigint AS session,
                 least(xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 200,
                       xor(y2::ubigint, y2::ubigint >> 31)::hugeint % 200)::bigint AS qid
          FROM a2),
cnt AS (SELECT session, qid, count(*)::bigint AS c FROM draws GROUP BY session, qid),
pairs AS (
  SELECT a.qid AS query_a, b.qid AS query_b, sum(a.c * b.c)::bigint AS n_sessions
  FROM cnt a JOIN cnt b ON a.session = b.session AND a.qid < b.qid
  GROUP BY a.qid, b.qid)
SELECT row_number() OVER (ORDER BY n_sessions DESC, query_a ASC, query_b ASC) AS rank,
       query_a, query_b, n_sessions
FROM pairs ORDER BY n_sessions DESC, query_a ASC, query_b ASC LIMIT 20
""",
        "winnowing_fingerprints": f"""
WITH docs5 AS (SELECT doc_id, text, length(text) AS L FROM documents),
pos AS (SELECT doc_id, unnest(range(1, greatest(L - 3, 1))) AS i, text
        FROM docs5 WHERE L >= 5),
grams AS (SELECT doc_id, i, substr(text, i, 5) AS term FROM pos),
terms AS (SELECT DISTINCT term FROM grams),
{_term_hash64_sql()},
gh AS MATERIALIZED (SELECT g.doc_id, g.i, t.h FROM grams g JOIN th t USING (term)),
win AS (
  SELECT doc_id, i AS s,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS span
  FROM gh),
sel AS (
  SELECT w.doc_id, max(g.i) AS p
  FROM win w JOIN gh g
    ON g.doc_id = w.doc_id AND g.i BETWEEN w.s AND w.s + 3 AND g.h = w.wmin
  WHERE w.span = 4
  GROUP BY w.doc_id, w.s),
fp AS (SELECT DISTINCT doc_id, p FROM sel),
cnt AS (SELECT doc_id, count(*)::bigint AS n FROM fp GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_fingerprints
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
""",
        "combmnz_fusion": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
t1 AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
t2 AS (SELECT doc_id, score FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
t3 AS (SELECT doc_id, score FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
n1 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t1) = (SELECT min(score) FROM t1)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t1))
                                / ((SELECT max(score) FROM t1) - (SELECT min(score) FROM t1)) END AS ns
       FROM t1),
n2 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t2) = (SELECT min(score) FROM t2)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t2))
                                / ((SELECT max(score) FROM t2) - (SELECT min(score) FROM t2)) END AS ns
       FROM t2),
n3 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t3) = (SELECT min(score) FROM t3)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t3))
                                / ((SELECT max(score) FROM t3) - (SELECT min(score) FROM t3)) END AS ns
       FROM t3),
allid AS (SELECT DISTINCT doc_id FROM (
  SELECT doc_id FROM t1 UNION ALL SELECT doc_id FROM t2 UNION ALL SELECT doc_id FROM t3)),
fused AS (
  SELECT a.doc_id,
         round((coalesce(n1.ns, 0.0) + coalesce(n2.ns, 0.0) + coalesce(n3.ns, 0.0))
               * ((CASE WHEN n1.doc_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN n2.doc_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN n3.doc_id IS NULL THEN 0 ELSE 1 END)), 6) + 0.0 AS mnz
  FROM allid a
  LEFT JOIN n1 USING (doc_id) LEFT JOIN n2 USING (doc_id) LEFT JOIN n3 USING (doc_id))
SELECT row_number() OVER (ORDER BY mnz DESC, doc_id ASC) AS rank,
       doc_id, mnz AS mnz_score
FROM fused ORDER BY mnz DESC, doc_id ASC LIMIT 10
""",
        "bm25_proximity": f"""
WITH {_BM25_SCORES},
cands AS (SELECT doc_id, score FROM scores
          ORDER BY score DESC, doc_id ASC LIMIT 50),
occ AS (
  SELECT c.doc_id, 'join' AS term, ii AS p
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 2, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 4) = 'join'
  UNION ALL
  SELECT c.doc_id, 'merge', ii
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 3, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 5) = 'merge'
  UNION ALL
  SELECT c.doc_id, 'spark', ii
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 3, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 5) = 'spark'),
mind AS (
  SELECT a.doc_id, min(abs(a.p - b.p))::bigint AS d
  FROM occ a JOIN occ b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.doc_id),
fused AS (
  SELECT c.doc_id,
         round(c.score + CASE WHEN m.d IS NULL THEN 0.0
               ELSE ln(1 + 1.0 / (1 + m.d)) END, 6) + 0.0 AS score
  FROM cands c LEFT JOIN mind m USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "rm3_expansion": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
       FROM tf JOIN cf USING (term), coll GROUP BY tf.doc_id),
qscores AS (SELECT sp.doc_id,
                   sp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
            FROM sp JOIN dl USING (doc_id)),
top10 AS MATERIALIZED (SELECT doc_id, score FROM qscores
                       ORDER BY score DESC, doc_id ASC LIMIT 10),
mx AS (SELECT max(score) AS v FROM top10),
sm AS (SELECT sum(exp(score - (SELECT v FROM mx))) AS z FROM top10),
wts AS (SELECT doc_id, exp(score - (SELECT v FROM mx)) / (SELECT z FROM sm) AS w
        FROM top10),
atf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
        WHERE doc_id IN (SELECT doc_id FROM top10) GROUP BY doc_id, term),
rm1 AS (SELECT a.term, sum(w.w * (a.tf / dl.doc_len)) AS p
        FROM atf a JOIN wts w USING (doc_id) JOIN dl USING (doc_id)
        GROUP BY a.term),
rm3 AS (SELECT term,
               round(0.5 * p + 0.5 * (CASE WHEN term IN ('join','merge','spark')
                     THEN 1.0 / 3 ELSE 0.0 END), 6) + 0.0 AS weight
        FROM rm1)
SELECT row_number() OVER (ORDER BY weight DESC, term ASC) AS rank, term, weight
FROM rm3 ORDER BY weight DESC, term ASC LIMIT 10
""",
        "chunk_dedup": f"""
WITH toksl AS ({_TOKS_LIST}),
pre AS (SELECT doc_id, array_to_string(toks[1:16], ' ') AS p FROM toksl),
inj AS (SELECT d.doc_id, pre.p || ' ' || d.text AS text
        FROM documents d JOIN pre ON pre.doc_id = d.doc_id - (d.doc_id % 4)),
t2 AS (SELECT doc_id,
              list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                          x -> x <> '') AS toks
       FROM inj),
ch AS (SELECT doc_id, toks, len(toks) AS n,
              unnest(range(0, 1 + greatest(len(toks) - 16 + 15, 0) // 16)) AS chunk_id
       FROM t2 WHERE len(toks) > 0),
sel AS (SELECT doc_id, chunk_id, chunk_id * 16 AS st,
               least(chunk_id * 16 + 16, n) AS en, toks FROM ch),
dd AS (SELECT doc_id, chunk_id, (en - st)::bigint AS ntok,
              array_to_string(toks[st + 1 : en], ' ') AS ctext FROM sel),
rn AS (SELECT *, row_number() OVER (PARTITION BY ctext
                                    ORDER BY doc_id, chunk_id) AS rn FROM dd),
kept AS (SELECT doc_id, count(*)::bigint AS nk, sum(ntok)::bigint AS ktok
         FROM rn WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id, count(*)::bigint AS nc FROM dd GROUP BY doc_id)
SELECT d.doc_id, coalesce(t.nc, 0)::bigint AS n_chunks,
       coalesce(k.nk, 0)::bigint AS n_kept,
       coalesce(k.ktok, 0)::bigint AS kept_tokens
FROM documents d LEFT JOIN tot t USING (doc_id) LEFT JOIN kept k USING (doc_id)
ORDER BY d.doc_id
""",
        "mi_feature_selection": f"""
WITH tok AS ({_TOK}),
pres AS (SELECT DISTINCT doc_id, term FROM tok),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
st AS (SELECT count(*)::double AS N,
              sum(y)::double AS Nc FROM lab),
cnt AS (SELECT p.term, sum(l.y)::double AS n11, sum(1 - l.y)::double AS n10
        FROM pres p JOIN lab l USING (doc_id) GROUP BY p.term),
mi AS (
  SELECT term,
    (CASE WHEN n11 > 0 THEN (n11 / st.N) * log2((st.N * n11) / ((n11 + n10) * st.Nc)) ELSE 0.0 END)
  + (CASE WHEN n10 > 0 THEN (n10 / st.N) * log2((st.N * n10) / ((n11 + n10) * (st.N - st.Nc))) ELSE 0.0 END)
  + (CASE WHEN (st.Nc - n11) > 0 THEN ((st.Nc - n11) / st.N)
          * log2((st.N * (st.Nc - n11)) / ((st.N - (n11 + n10)) * st.Nc)) ELSE 0.0 END)
  + (CASE WHEN ((st.N - st.Nc) - n10) > 0 THEN (((st.N - st.Nc) - n10) / st.N)
          * log2((st.N * ((st.N - st.Nc) - n10)) / ((st.N - (n11 + n10)) * (st.N - st.Nc))) ELSE 0.0 END)
  AS v
  FROM cnt, st)
SELECT row_number() OVER (ORDER BY round(v, 6) DESC, term ASC) AS rank,
       term, round(v, 6) + 0.0 AS mi
FROM mi ORDER BY round(v, 6) DESC, term ASC LIMIT 15
""",
        "tput_topk": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
t1 AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
t2 AS (SELECT doc_id, score FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
t3 AS (SELECT doc_id, score FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
n1 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t1) = (SELECT min(score) FROM t1)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t1))
                                / ((SELECT max(score) FROM t1) - (SELECT min(score) FROM t1)) END AS ns
       FROM t1),
n2 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t2) = (SELECT min(score) FROM t2)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t2))
                                / ((SELECT max(score) FROM t2) - (SELECT min(score) FROM t2)) END AS ns
       FROM t2),
n3 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t3) = (SELECT min(score) FROM t3)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t3))
                                / ((SELECT max(score) FROM t3) - (SELECT min(score) FROM t3)) END AS ns
       FROM t3),
p1t1 AS (SELECT doc_id, ns FROM n1 ORDER BY ns DESC, doc_id ASC LIMIT 5),
p1t2 AS (SELECT doc_id, ns FROM n2 ORDER BY ns DESC, doc_id ASC LIMIT 5),
p1t3 AS (SELECT doc_id, ns FROM n3 ORDER BY ns DESC, doc_id ASC LIMIT 5),
seen1 AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id FROM p1t1 UNION ALL SELECT doc_id FROM p1t2
           UNION ALL SELECT doc_id FROM p1t3)),
p1 AS (SELECT s.doc_id,
         coalesce((SELECT ns FROM p1t1 WHERE doc_id = s.doc_id), 0.0)
       + coalesce((SELECT ns FROM p1t2 WHERE doc_id = s.doc_id), 0.0)
       + coalesce((SELECT ns FROM p1t3 WHERE doc_id = s.doc_id), 0.0) AS v
       FROM seen1 s),
tau1 AS (SELECT min(v) AS v FROM (SELECT v FROM p1 ORDER BY v DESC LIMIT 5)),
tt AS (SELECT (SELECT v FROM tau1) / 3 AS t),
s1 AS (SELECT doc_id, ns FROM n1 WHERE ns >= (SELECT t FROM tt)),
s2 AS (SELECT doc_id, ns FROM n2 WHERE ns >= (SELECT t FROM tt)),
s3 AS (SELECT doc_id, ns FROM n3 WHERE ns >= (SELECT t FROM tt)),
nsent AS (SELECT (SELECT count(*) FROM s1) + (SELECT count(*) FROM s2)
                 + (SELECT count(*) FROM s3) AS n),
docs2 AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
           UNION ALL SELECT doc_id FROM s3)),
p2 AS (SELECT d.doc_id,
              coalesce(s1.ns, 0.0) + coalesce(s2.ns, 0.0) + coalesce(s3.ns, 0.0) AS v,
              ((CASE WHEN s1.doc_id IS NULL THEN 1 ELSE 0 END)
               + (CASE WHEN s2.doc_id IS NULL THEN 1 ELSE 0 END)
               + (CASE WHEN s3.doc_id IS NULL THEN 1 ELSE 0 END)) AS miss
       FROM docs2 d LEFT JOIN s1 USING (doc_id) LEFT JOIN s2 USING (doc_id)
            LEFT JOIN s3 USING (doc_id)),
tau2 AS (SELECT min(v) AS v FROM (SELECT v FROM p2 ORDER BY v DESC LIMIT 5)),
cand AS (SELECT doc_id FROM p2
         WHERE v + (SELECT t FROM tt) * miss >= (SELECT v FROM tau2)),
ex AS (SELECT c.doc_id,
              coalesce(n1.ns, 0.0) + coalesce(n2.ns, 0.0) + coalesce(n3.ns, 0.0) AS v
       FROM cand c LEFT JOIN n1 USING (doc_id) LEFT JOIN n2 USING (doc_id)
            LEFT JOIN n3 USING (doc_id))
SELECT row_number() OVER (ORDER BY round(v, 6) DESC, doc_id ASC) AS rank,
       doc_id, round(v, 6) + 0.0 AS sum_score,
       (SELECT n FROM nsent)::bigint AS phase2_rows,
       (SELECT count(*) FROM cand)::bigint AS n_candidates
FROM ex ORDER BY round(v, 6) DESC, doc_id ASC LIMIT 5
""",
        "impact_quantized_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
ts AS (SELECT tf.doc_id, tf.term,
              ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) AS s
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
       WHERE tf.term IN ('join', 'merge', 'spark')),
mx AS (SELECT term, max(s) AS m FROM ts GROUP BY term),
imp AS (SELECT ts.doc_id,
               (1 + floor(254 * ts.s / mx.m))::bigint AS i
        FROM ts JOIN mx USING (term)),
agg AS (SELECT doc_id, sum(i)::bigint AS impact FROM imp GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY impact DESC, doc_id ASC) AS rank,
       doc_id, impact
FROM agg ORDER BY impact DESC, doc_id ASC LIMIT 10
""",
        "partition_bloom_pruning": f"""
WITH span AS (SELECT ((max(doc_id) + 8) // 8)::bigint AS s FROM documents),
inj AS (SELECT doc_id,
               'pmark' || least(doc_id // (SELECT s FROM span), 7) || ' ' || text AS text
        FROM documents),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9]+'), x -> x <> '')) AS term FROM inj),
pterms AS (SELECT DISTINCT least(doc_id // (SELECT s FROM span), 7)::bigint AS part, term
           FROM tok),
probes AS (SELECT unnest(['join', 'nosuchterm12345', 'pmark0', 'pmark3', 'pmark7', 'spark']) AS term),
terms AS (SELECT DISTINCT term FROM
          (SELECT term FROM pterms UNION ALL SELECT term FROM probes)),
{_term_hash64_sql()},
y0 AS (SELECT term, h, (h + 11400714819323198485) % 18446744073709551616 AS v FROM th),
y1 AS (SELECT term, h, ((((xor(v::ubigint, v::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(v::ubigint, v::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(v::ubigint, v::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS v FROM y0),
y2 AS (SELECT term, h, ((((xor(v::ubigint, v::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(v::ubigint, v::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(v::ubigint, v::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS v FROM y1),
hh AS (SELECT term, h AS h1,
              (xor(v::ubigint, v::ubigint >> 31)::hugeint // 2) * 2 + 1 AS h2
       FROM y2),
pos AS MATERIALIZED (
  SELECT term, ((h1 + ((i * h2) % 18446744073709551616)) % 18446744073709551616) % 4096 AS p
  FROM hh, (SELECT unnest(range(7)) AS i)),
partbits AS MATERIALIZED (
  SELECT DISTINCT pt.part, pos.p FROM pterms pt JOIN pos USING (term)),
parts AS (SELECT unnest(range(8)) AS part)
SELECT pr.term, parts.part::bigint AS partition,
       CASE WHEN NOT EXISTS (
         SELECT 1 FROM pos q WHERE q.term = pr.term AND NOT EXISTS (
           SELECT 1 FROM partbits pb WHERE pb.part = parts.part AND pb.p = q.p))
       THEN 1 ELSE 0 END AS bloom_hit,
       CASE WHEN EXISTS (SELECT 1 FROM pterms x
                         WHERE x.part = parts.part AND x.term = pr.term)
       THEN 1 ELSE 0 END AS actual
FROM probes pr, parts
ORDER BY pr.term, parts.part
""",
        "lang_rank_profile": """
WITH low AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
g AS (SELECT doc_id, lang, substr(t, i::int, 3) AS gram
      FROM low, unnest(range(1, greatest(length(t) - 1, 1))) u(i)),
lc AS (SELECT lang, gram, count(*)::bigint AS c FROM g GROUP BY lang, gram),
lp AS (SELECT lang, gram, r FROM (
         SELECT lang, gram,
                row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram ASC) AS r
         FROM lc) WHERE r <= 50),
dc AS (SELECT doc_id, gram, count(*)::bigint AS c FROM g GROUP BY doc_id, gram),
dp AS (SELECT doc_id, gram, r FROM (
         SELECT doc_id, gram,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS r
         FROM dc) WHERE r <= 20),
langs AS (SELECT DISTINCT lang FROM documents),
dist AS (
  SELECT d.doc_id, l.lang,
         sum(CASE WHEN lp.r IS NULL THEN 50 ELSE abs(d.r - lp.r) END)::bigint AS dist
  FROM dp d CROSS JOIN langs l
  LEFT JOIN lp ON lp.lang = l.lang AND lp.gram = d.gram
  GROUP BY d.doc_id, l.lang),
pred AS (SELECT doc_id, lang AS pred_lang, dist,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY dist ASC, lang ASC) AS rn
         FROM dist)
SELECT p.doc_id, p.pred_lang, d.lang AS actual_lang, p.dist
FROM pred p JOIN documents d USING (doc_id)
WHERE p.rn = 1 AND p.doc_id < 50 ORDER BY p.doc_id
""",
        "borda_fusion": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
r3 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
pts AS (
  SELECT doc_id, sum(21 - r)::bigint AS p FROM (
    SELECT doc_id, r FROM r1 UNION ALL SELECT doc_id, r FROM r2
    UNION ALL SELECT doc_id, r FROM r3)
  GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY p DESC, doc_id ASC) AS rank,
       doc_id, p AS borda_points
FROM pts ORDER BY p DESC, doc_id ASC LIMIT 10
""",
        "focused_hits": _focused_hits_sql(),
        "serp_diversity": f"""
WITH {_BM25_SCORES},
top20 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
cnt AS (SELECT d.source, count(*)::bigint AS c
        FROM top20 JOIN documents d USING (doc_id) GROUP BY d.source),
n AS (SELECT sum(c)::double AS n FROM cnt),
agg AS (
  SELECT sum((c / (SELECT n FROM n)) * (c / (SELECT n FROM n))) AS simpson,
         sum(-(c / (SELECT n FROM n)) * log2(c / (SELECT n FROM n))) AS shannon,
         count(*)::bigint AS ns
  FROM cnt)
SELECT (SELECT n FROM n)::bigint AS n_results, ns AS n_sources,
       round(simpson, 6) + 0.0 AS simpson,
       round(1.0 / simpson, 6) + 0.0 AS effective_sources,
       round(shannon, 6) + 0.0 AS shannon_bits
FROM agg
""",
        "ab_ztest_clicks": _ab_ztest_sql(),
        "serp_abandonment": f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos,
         (SELECT doc_id FROM ranked r WHERE r.rank = pos) AS doc_id
  FROM (SELECT unnest(range(400)) AS s), (SELECT unnest(range(1, 11)) AS pos)),
c0 AS (SELECT *, xor((s*16+pos)::ubigint, 10::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, 11::ubigint)::hugeint AS d0 FROM imp),
c1 AS (SELECT *, ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a1,
               ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d1 FROM c0),
c2 AS (SELECT *, ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a2,
               ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d2 FROM c1),
att AS MATERIALIZED (
  SELECT s, pos,
         CASE WHEN (xor(a2::ubigint, a2::ubigint >> 31)::hugeint % 16)
                   < (3 + (xor(d2::ubigint, d2::ubigint >> 31)::hugeint % 10))
              THEN 1 ELSE 0 END AS att
  FROM c2),
firstp AS (SELECT s, min(pos) FILTER (WHERE att = 1) AS fp FROM att GROUP BY s),
agg AS (
  SELECT count(*)::bigint AS n,
         count(fp)::bigint AS clicked,
         sum(CASE WHEN fp <= 1 THEN 1 ELSE 0 END)::bigint AS s1,
         sum(CASE WHEN fp <= 3 THEN 1 ELSE 0 END)::bigint AS s3,
         sum(CASE WHEN fp <= 5 THEN 1 ELSE 0 END)::bigint AS s5,
         coalesce(sum(fp), 0)::bigint AS fsum
  FROM firstp)
SELECT n AS n_sessions, clicked, (n - clicked)::bigint AS abandoned,
       round((n - clicked)::double / n, 6) + 0.0 AS abandonment_rate,
       round(s1::double / n, 6) + 0.0 AS success_at_1,
       round(s3::double / n, 6) + 0.0 AS success_at_3,
       round(s5::double / n, 6) + 0.0 AS success_at_5,
       CASE WHEN clicked > 0
            THEN round(fsum::double / clicked, 6) + 0.0 ELSE 0.0 END
         AS mean_first_click_rank
FROM agg
""",
        "qld_dirichlet_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
       FROM tf JOIN cf USING (term), coll GROUP BY tf.doc_id),
scores AS (SELECT sp.doc_id,
                  sp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
           FROM sp JOIN dl USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # DFR PL2 (c=1): tfn = tf*log2(1+avgdl/dl), lambda = cf/N
        "dfr_pl2_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n,
              (SELECT sum(doc_len) FROM dl)::double
                / (SELECT count(*) FROM documents) AS avgdl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
tn AS (SELECT tf.doc_id, tf.term,
              tf.tf * log2(1.0 + 1.0 * st.avgdl / dl.doc_len) AS tfn
       FROM tf JOIN dl USING (doc_id), st),
scores AS (SELECT tn.doc_id,
              sum((tn.tfn * log2(tn.tfn / (cf.cf / st.n))
                   + (cf.cf / st.n - tn.tfn) * log2(exp(1))
                   + 0.5 * log2(2.0 * pi() * tn.tfn)) / (tn.tfn + 1.0)) AS score
           FROM tn JOIN cf USING (term), st GROUP BY tn.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # Dunning G² collocations over consecutive bigrams (min count 5),
        # entropy form with the 0*ln(0)=0 convention
        "collocations_llr": f"""
WITH tokl AS ({_TOKS_LIST}),
tp AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos
       FROM tokl),
bg AS (SELECT t AS t1, lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
       FROM tp QUALIFY t2 IS NOT NULL),
bc AS (SELECT t1, t2, count(*)::bigint AS a FROM bg GROUP BY 1, 2),
c1 AS (SELECT t1, sum(a)::bigint AS c1 FROM bc GROUP BY t1),
c2 AS (SELECT t2, sum(a)::bigint AS c2 FROM bc GROUP BY t2),
nn AS (SELECT sum(a)::double AS n FROM bc),
cell AS (SELECT bc.t1, bc.t2, bc.a::bigint AS cnt,
                bc.a::double AS a, (c1.c1 - bc.a)::double AS b,
                (c2.c2 - bc.a)::double AS c,
                (nn.n - c1.c1 - c2.c2 + bc.a)::double AS d, nn.n AS n
         FROM bc JOIN c1 USING (t1) JOIN c2 USING (t2), nn WHERE bc.a >= 5),
g AS (SELECT t1, t2, cnt,
             round(2.0 * ({_xlx('a')} + {_xlx('b')} + {_xlx('c')} + {_xlx('d')}
                          - {_xlx('a + b')} - {_xlx('c + d')}
                          - {_xlx('a + c')} - {_xlx('b + d')} + {_xlx('n')}), 6) AS g2
      FROM cell)
SELECT t1, t2, cnt, g2 FROM g ORDER BY g2 DESC, t1, t2 LIMIT 20
""",
        # max-containment |A∩B|/min(|A|,|B|) >= 0.6 over word 3-gram sets
        "containment_pairs": """
WITH tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos FROM tokl
),
sh AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS shingle
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w IS NOT NULL
),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ds a JOIN ds b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, round(c::double / least(sa.sz, sb.sz), 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c::double / least(sa.sz, sb.sz) >= 0.6
ORDER BY id_a, id_b
""",
        # pairwise KL between per-lang unigram LMs, add-one smoothing
        # over the global vocab; token-less langs are uniform
        "lang_kl_matrix": f"""
WITH lt AS (SELECT d.lang, t.term FROM ({_TOK}) t JOIN documents d USING (doc_id)),
vocab AS (SELECT DISTINCT term FROM lt),
v AS (SELECT count(*)::double AS v FROM vocab),
cnt AS (SELECT lang, term, count(*)::bigint AS c FROM lt GROUP BY 1, 2),
nl AS (SELECT lang, count(*)::bigint AS n FROM lt GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM documents),
nall AS (SELECT langs.lang, coalesce(nl.n, 0)::double AS n
         FROM langs LEFT JOIN nl USING (lang)),
grid AS (SELECT a.lang AS la, b.lang AS lb
         FROM langs a CROSS JOIN langs b WHERE a.lang <> b.lang),
cell AS (SELECT g.la, g.lb,
                (coalesce(ca.c, 0) + 1)::double / (na.n + v.v) AS pa,
                (coalesce(cb.c, 0) + 1)::double / (nb.n + v.v) AS pb
         FROM grid g CROSS JOIN vocab vb CROSS JOIN v
         LEFT JOIN cnt ca ON ca.lang = g.la AND ca.term = vb.term
         LEFT JOIN cnt cb ON cb.lang = g.lb AND cb.term = vb.term
         JOIN nall na ON na.lang = g.la JOIN nall nb ON nb.lang = g.lb)
SELECT la AS lang_a, lb AS lang_b, round(sum(pa * ln(pa / pb)), 6) AS kl
FROM cell GROUP BY 1, 2 ORDER BY lang_a, lang_b
""",
        # Burrows' Delta over the top-50 corpus words: z-scored relative
        # freqs across sources (population sigma), mean |z_a - z_b|
        "burrows_delta": f"""
WITH tok AS ({_TOK}),
tc AS (SELECT term, count(*)::bigint AS c FROM tok GROUP BY term),
top AS (SELECT term FROM tc ORDER BY c DESC, term LIMIT 50),
ls AS (SELECT t.term, d.source FROM ({_TOK}) t JOIN documents d USING (doc_id)),
ns AS (SELECT source, count(*)::bigint AS n FROM ls GROUP BY source),
stc AS (SELECT source, term, count(*)::bigint AS c FROM ls
        WHERE term IN (SELECT term FROM top) GROUP BY 1, 2),
grid AS (SELECT ns.source, top.term, coalesce(stc.c, 0)::double / ns.n AS f
         FROM ns CROSS JOIN top
         LEFT JOIN stc ON stc.source = ns.source AND stc.term = top.term),
mz AS (SELECT term, avg(f) AS mu, stddev_pop(f) AS sd FROM grid GROUP BY term),
z AS (SELECT g.source, g.term, (g.f - mz.mu) / mz.sd AS z
      FROM grid g JOIN mz USING (term) WHERE mz.sd > 0),
d AS (SELECT a.source AS source_a, b.source AS source_b,
             round(avg(abs(a.z - b.z)), 6) AS delta
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
SELECT source_a, source_b, delta FROM d ORDER BY source_a, source_b
""",
        # per-doc exact CUME_DIST of document length
        "length_percentile": """
SELECT doc_id, n_chars,
       round(cume_dist() OVER (ORDER BY n_chars), 6) AS pctl
FROM documents ORDER BY doc_id
""",
        # per-lang 10%-trimmed mean of doc length (positional trim)
        "trimmed_mean_length": """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id)::bigint AS rn,
         count(*) OVER (PARTITION BY lang)::bigint AS n
  FROM documents)
SELECT lang, max(n) AS n_docs, (max(n) // 10)::bigint AS n_trimmed_each,
       round(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                      THEN n_chars ELSE 0 END)::double
               / (max(n) - 2 * (max(n) // 10))::double, 6) AS trimmed_mean
FROM r GROUP BY lang ORDER BY lang
""",
        # Gini concentration of docs per host (exact integer rank sum)
        "gini_hosts": """
WITH c AS (SELECT source, count(*)::bigint AS x FROM documents GROUP BY source),
r AS (SELECT x,
             row_number() OVER (ORDER BY x ASC, source ASC)::bigint AS i,
             count(*) OVER ()::bigint AS n,
             sum(x) OVER ()::bigint AS sx
      FROM c)
SELECT max(n)::bigint AS n_hosts, max(sx)::bigint AS n_docs,
       round((2 * sum(i * x) - (max(n) + 1) * max(sx))::double
               / (max(n) * max(sx))::double, 6) AS gini
FROM r
""",
        # LPA communities × token counts → top-3 terms per community
        "community_top_terms": f"""
WITH {_lpa_ctes(5, _LINK_EDGES_CTE)},
tok AS ({_TOK}),
tt AS (
  SELECT l5.lbl AS community, tok.term, count(*)::bigint AS n
  FROM tok JOIN l5 ON l5.node = tok.doc_id GROUP BY 1, 2),
rk AS (
  SELECT community, term, n,
         row_number() OVER (PARTITION BY community
                            ORDER BY n DESC, term ASC) AS rn
  FROM tt)
SELECT community, term, n FROM rk WHERE rn <= 3
ORDER BY community, n DESC, term
""",
        # per-type dyadic-decay EWMA of daily counts: integer
        # numerator sum(n_i * 2^rank_i) and denominator 2^(t+1)-1,
        # one float division at the end — bit-exact replay
        "ewma_daily_events": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day, n,
         (row_number() OVER (PARTITION BY event_type ORDER BY day))::bigint - 1
           AS rk
  FROM c),
nm AS (
  SELECT a.event_type, a.day, a.n, a.rk,
         sum(b.n * (1::bigint << b.rk::int))::bigint AS num
  FROM r a JOIN r b ON a.event_type = b.event_type AND b.rk <= a.rk
  GROUP BY 1, 2, 3, 4)
SELECT event_type, day, n,
       round(num::double / ((1::bigint << (rk + 1)::int) - 1)::double, 6) AS ewma
FROM nm ORDER BY event_type, day
""",
        # per-user inter-arrival gap stats (the LAG-window family)
        "event_interarrival": """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events),
a AS (
  SELECT user_id, count(gap)::bigint AS n_gaps, sum(gap)::bigint AS sum_gap_us,
         max(gap)::bigint AS max_gap_us
  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps, sum_gap_us, max_gap_us,
       round(sum_gap_us::double / n_gaps::double / 1000000.0, 6) AS avg_gap_s
FROM a ORDER BY user_id
""",
        # per-type daily event-rate z-score anomalies (population std)
        "daily_event_anomaly": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, avg(n) AS m, stddev_pop(n) AS sd
      FROM c GROUP BY event_type)
SELECT c.event_type, c.day, c.n,
       round(CASE WHEN s.sd > 0 THEN (c.n - s.m) / s.sd ELSE 0.0 END, 6) AS z,
       (abs(round(CASE WHEN s.sd > 0 THEN (c.n - s.m) / s.sd ELSE 0.0 END, 6))
          > 2.0)::bigint AS is_anomaly
FROM c JOIN s USING (event_type) ORDER BY c.event_type, c.day
""",
        # distributed OLS training: integer moment fold + fixed-order
        # Cramer expansion (identical float expression tree both sides)
        "price_model_ols": _price_model_sql(),
        # distributed logistic GD training: every iteration replayed
        "langid_model_gd": _logreg_sql(n_iter=5, lr=1e-3),
        # distributed Pearson correlations: exact integer moment fold
        "lineitem_corr_matrix": _corr_sql(),
        # distributed k-means: every Lloyd iteration replayed
        "kmeans_centroids": _kmeans_sql(k=4, n_iter=3, dim=64),
        # distributed PCA: moment fold + power iteration replayed
        "pca_top_component": _pca_sql(n_iter=10, dim=64),
        "distinct_users": """
SELECT count(DISTINCT user_id)::bigint AS n_distinct FROM events
""",
        "hll_registers": _hll_registers_sql(),
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
""",
        "top_events_per_user": """
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3
ORDER BY user_id, value DESC, event_id
""",
        "value_quantiles_hist": """
WITH lohi AS (SELECT min(value)::double AS lo, max(value)::double AS hi,
                     CASE WHEN max(value)-min(value) = 0 THEN 1.0 ELSE max(value)::double - min(value)::double END AS w
              FROM events WHERE value IS NOT NULL),
bins AS (SELECT least(floor((value::double - lo) / w * 4096)::bigint, 4095) AS bin
         FROM events, lohi WHERE value IS NOT NULL),
hist AS (SELECT bin, count(*)::bigint AS cnt FROM bins GROUP BY bin),
cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS c FROM hist),
n AS (SELECT count(*)::bigint AS n FROM bins),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
tgt AS (SELECT q, greatest(1, ceil(q * n)::bigint) AS target FROM qs, n),
hit AS (SELECT t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.c >= t.target GROUP BY t.q, t.target),
fin AS (SELECT h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2 WHERE c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE bin = h.bin) AS cnt
        FROM hit h)
SELECT q::double AS q, lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 4096 AS value
FROM fin, lohi ORDER BY q
""",
        "source_length_stats": """
SELECT source, count(*)::bigint AS n_rows, sum(n_chars)::bigint AS sum_n_chars,
       min(n_chars)::bigint AS min_n_chars, max(n_chars)::bigint AS max_n_chars
FROM documents GROUP BY source ORDER BY source
""",
        "windowed_top_users": """
WITH agg AS (
  SELECT ((epoch_us(ts) // 3600000000) * 3600000000)::bigint AS window_start,
         user_id::bigint AS user_id, sum(value) AS sv
  FROM events GROUP BY 1, 2),
rk AS (
  SELECT window_start, user_id, sv,
         row_number() OVER (PARTITION BY window_start ORDER BY sv DESC, user_id) AS rn
  FROM agg)
SELECT window_start, user_id, round(sv, 6) AS sum_value
FROM rk WHERE rn <= 2 ORDER BY window_start, sv DESC, user_id
""",
        "quality_classifier": f"""
WITH {_QC_CTES}
SELECT doc_id, p AS quality_prob, (p >= 0.5) AS keep
FROM qprob ORDER BY doc_id
""",
        # multinomial NB self-classification: (lang, term) counts, add-1
        # smoothing over the distinct-term vocabulary, per-(doc, class)
        # log-prob sums, argmax on ROUND(score, 6) with ties to the
        # smallest class (classify.py::naive_bayes_predict)
        "nb_lang_classifier": f"""
WITH {_NB_PRED_CTES}
SELECT doc_id, lang AS pred_label, round(score, 6) AS best_score
FROM pred WHERE rn = 1
ORDER BY doc_id
""",
        # confusion matrix of the NB self-classification vs true labels
        "nb_confusion": f"""
WITH {_NB_PRED_CTES}
SELECT d.lang AS true_label, p.lang AS pred_label, count(*)::bigint AS n_docs
FROM (SELECT doc_id, lang FROM pred WHERE rn = 1) p
JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # Flesch readability: tokenizer words, [.!?]+ sentence runs
        # (min 1), [aeiou]+ vowel groups per token (min 1/word)
        "readability_scores": f"""
WITH tok AS ({_TOK}),
syl AS (
  SELECT doc_id,
         sum(greatest(len(regexp_extract_all(term, '[aeiou]+')), 1))::bigint AS n_syl,
         count(*)::bigint AS n_words
  FROM tok GROUP BY doc_id),
sent AS (
  SELECT doc_id,
         greatest(coalesce(len(regexp_extract_all(text, '[.!?]+')), 0), 1)::bigint AS n_sent
  FROM documents)
SELECT d.doc_id,
       coalesce(s.n_words, 0)::bigint AS n_words,
       sent.n_sent AS n_sentences,
       coalesce(s.n_syl, 0)::bigint AS n_syllables,
       CASE WHEN coalesce(s.n_words, 0) > 0
            THEN round(206.835 - 1.015 * (s.n_words::double / sent.n_sent)
                       - 84.6 * (s.n_syl::double / s.n_words), 6)
            ELSE 0.0 END AS flesch
FROM documents d
LEFT JOIN syl s USING (doc_id)
JOIN sent USING (doc_id)
ORDER BY doc_id
""",
        # unigram Shannon entropy per doc: tf distribution over tokens
        "token_entropy": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS c FROM tok GROUP BY doc_id, term),
n AS (SELECT doc_id, count(*)::bigint AS nt FROM tok GROUP BY doc_id),
h AS (
  SELECT tf.doc_id,
         sum(-(tf.c::double / n.nt) * ln(tf.c::double / n.nt)) AS ent
  FROM tf JOIN n USING (doc_id) GROUP BY tf.doc_id)
SELECT d.doc_id,
       coalesce(n.nt, 0)::bigint AS n_tokens,
       coalesce(round(h.ent, 6), 0.0) AS entropy
FROM documents d LEFT JOIN n USING (doc_id) LEFT JOIN h USING (doc_id)
ORDER BY d.doc_id
""",
        # ordered conversion funnel: each step's earliest occurrence
        # strictly after the previous step's time, per user
        "funnel_steps": """
WITH e1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
e2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN e1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > e1.t1 GROUP BY e.user_id),
e3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN e2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > e2.t2 GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       (CASE WHEN e3.user_id IS NOT NULL THEN 3
             WHEN e2.user_id IS NOT NULL THEN 2
             WHEN e1.user_id IS NOT NULL THEN 1
             ELSE 0 END)::bigint AS steps_completed
FROM u
LEFT JOIN e1 USING (user_id)
LEFT JOIN e2 USING (user_id)
LEFT JOIN e3 USING (user_id)
ORDER BY u.user_id
""",
        # next-word suggestion: bigram continuations of 'scan'
        "next_word_suggest": f"""
WITH ltoks AS ({_TOKS_LIST}),
pairs AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM ltoks WHERE len(toks) > 1),
cnt AS (
  SELECT string_split(bg, ' ')[2] AS next_word, count(*)::bigint AS n
  FROM pairs WHERE bg LIKE 'scan %' GROUP BY 1)
SELECT next_word, n FROM cnt ORDER BY n DESC, next_word ASC LIMIT 5
""",
        # Markov transition matrix over per-user event sequences
        "event_transitions": """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_type) AS prev
  FROM events)
SELECT prev AS prev_type, event_type AS next_type, count(*)::bigint AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # cohort retention: first-seen week per user, one count per
        # distinct active (user, week)
        "retention_cohorts": """
WITH wk AS (
  SELECT user_id, (epoch_us(ts) // 604800000000)::bigint AS w FROM events),
coh AS (SELECT user_id, min(w) AS c FROM wk GROUP BY user_id),
uw AS (SELECT DISTINCT user_id, w FROM wk)
SELECT coh.c AS cohort_week, (uw.w - coh.c)::bigint AS week_offset,
       count(*)::bigint AS n_users
FROM uw JOIN coh USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "pack_greedy": """
WITH RECURSIVE tc AS (
  SELECT doc_id, (doc_id % 16)::bigint AS bucket,
         len(list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> ''))::bigint AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rn
  FROM documents),
walk AS (
  SELECT bucket, rn, doc_id, n_tokens, 0::bigint AS seq_id, n_tokens AS acc
  FROM tc WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.acc > 0 AND w.acc + t.n_tokens > 256 THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.acc > 0 AND w.acc + t.n_tokens > 256 THEN t.n_tokens ELSE w.acc + t.n_tokens END
  FROM tc t JOIN walk w ON t.bucket = w.bucket AND t.rn = w.rn + 1)
SELECT doc_id, bucket, n_tokens, seq_id FROM walk ORDER BY doc_id
""",
        "decontaminate": f"""
WITH toks AS ({_TOKS_LIST}),
ng AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
  FROM toks WHERE len(toks) >= 3),
bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 97 = 0),
cnt AS (SELECT ng.doc_id, count(DISTINCT ng.ngram) AS n
        FROM ng JOIN bench USING (ngram) GROUP BY ng.doc_id)
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_contaminated,
       coalesce(c.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
""",
        "pii_scrub": r"""
WITH injected AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
           THEN ' contact user' || doc_id || '@example.com or +1 (20'
                || (doc_id % 10) || ') 555-01' || lpad((doc_id % 89)::varchar, 2, '0')
           ELSE '' END AS text
  FROM documents),
e AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::bigint AS n_emails,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
  FROM injected),
p AS (
  SELECT doc_id, n_emails,
         length(regexp_extract_all(text, '\+?[0-9][0-9 ()-]{6,}[0-9]'))::bigint AS n_phones,
         regexp_replace(text, '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS text
  FROM e)
SELECT doc_id, text, n_emails, n_phones FROM p ORDER BY doc_id
""",
        "repetition_stats": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS max_c
        FROM tf GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0)::bigint AS n_tokens,
       coalesce(a.n_distinct, 0)::bigint AS n_distinct_tokens,
       coalesce(round(1.0 - a.n_distinct::double / a.n_tokens, 6), 0.0) AS dup_token_frac,
       coalesce(round(a.max_c::double / a.n_tokens, 6), 0.0) AS top_token_frac
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "approx_distinct_users": f"""
WITH t AS ({_hll_registers_sql()}),
s AS (SELECT count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz FROM t),
c AS (SELECT (4096 - nz) AS zeros, (4096 - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT zeros, (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 / ssum AS est FROM c)
SELECT round(CASE WHEN est <= 2.5 * 4096 AND zeros > 0
             THEN 4096.0 * ln(4096.0 / zeros) ELSE est END, 6) AS approx_distinct
FROM e
""",
        "hash_embed_vectors": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb AS (SELECT vec.doc_id, dim,
               round(CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double, 6) AS val
        FROM vec JOIN nrm USING (doc_id))
SELECT doc_id, dim, val FROM emb WHERE val <> 0.0 ORDER BY doc_id, dim
""",
        "cms_heavy_hitters": _cms_heavy_hitters_sql(k=3),
        "curate_corpus": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
rep AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct FROM tf GROUP BY 1),
s1 AS (
  SELECT d.doc_id, d.text, d.lang, rep.n_tokens
  FROM documents d JOIN rep USING (doc_id)
  WHERE rep.n_tokens >= 15
    AND round(1.0 - rep.n_distinct::double / rep.n_tokens, 6) <= 0.6),
s2 AS (
  SELECT * FROM s1
  WHERE doc_id IN (SELECT min(doc_id) FROM s1 GROUP BY text)),
toksl AS ({_TOKS_LIST}),
ng AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
  FROM toksl WHERE len(toks) >= 3),
bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 97 = 0),
dirty AS (SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (ngram)),
s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
cnt AS (SELECT lang, count(*) AS c FROM s3 GROUP BY lang),
w(lang, wnum) AS (SELECT * FROM (VALUES ('de', 2), ('en', 3), ('es', 2), ('fr', 1), ('zh', 1))),
thr AS (SELECT cnt.lang,
               least(18446744073709551616::hugeint * {_CURATE_TOTAL} * w.wnum
                       // (9 * cnt.c),
                     18446744073709551615::hugeint) AS t
        FROM cnt JOIN w USING (lang)),
h0 AS (SELECT s3.*, xor(doc_id::ubigint, 11::ubigint)::hugeint AS x0 FROM s3),
h1 AS (SELECT *, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", str(0xBF58476D1CE4E5B9) + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT *, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", str(0x94D049BB133111EB) + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT *, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2)
SELECT hf.doc_id, hf.lang, hf.n_tokens::bigint AS n_tokens
FROM hf JOIN thr USING (lang)
WHERE hf.h < thr.t ORDER BY hf.doc_id
""",
        "interval_join_views": """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT * FROM e WHERE event_type = 'purchase'),
r AS (SELECT * FROM e WHERE event_type = 'view')
SELECT l.event_id::bigint AS event_id, l.user_id::bigint AS user_id,
       l.ts_us::bigint AS ts_us,
       r.event_id::bigint AS event_id_right, r.ts_us::bigint AS ts_us_right
FROM l JOIN r ON l.user_id = r.user_id
              AND r.ts_us BETWEEN l.ts_us - 1800000000 AND l.ts_us
ORDER BY l.event_id, r.event_id
""",
        "chunk_documents": f"""
WITH toksl AS ({_TOKS_LIST}),
ch AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, 1 + greatest(len(toks) - 16 + 7, 0) // 8)) AS chunk_id
  FROM toksl WHERE len(toks) > 0),
sel AS (SELECT doc_id, chunk_id, chunk_id * 8 AS st,
               least(chunk_id * 8 + 16, n) AS en, toks FROM ch)
SELECT doc_id, chunk_id::bigint AS chunk_id, st::bigint AS start_token,
       (en - st)::bigint AS n_chunk_tokens,
       array_to_string(toks[st + 1 : en], ' ') AS chunk_text
FROM sel ORDER BY doc_id, chunk_id
""",
        "zscore_by_lang": """
WITH s AS (SELECT lang, avg(n_chars) AS m, stddev_pop(n_chars) AS sd
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       round(CASE WHEN s.sd > 0 THEN (d.n_chars - s.m) / s.sd ELSE 0.0 END, 6) AS z
FROM documents d JOIN s USING (lang) ORDER BY d.doc_id
""",
        "text_knn_hash_embed": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb32 AS (SELECT vec.doc_id, dim,
                 CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double AS val
          FROM vec JOIN nrm USING (doc_id)),
q AS (SELECT * FROM emb32 WHERE doc_id IN (0, 1, 2)),
qn AS (SELECT doc_id AS qid, sqrt(sum(val * val)) AS qnorm FROM q GROUP BY 1),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS dnorm FROM emb32 GROUP BY 1),
dots AS (SELECT q.doc_id AS qid, e.doc_id AS did, sum(q.val * e.val) AS dot
         FROM q JOIN emb32 e ON q.dim = e.dim GROUP BY 1, 2),
cos AS (SELECT qid, did, dot / (qnorm * dnorm) AS c
        FROM dots JOIN qn USING (qid) JOIN dn ON did = dn.doc_id
        WHERE qnorm > 0 AND dnorm > 0),
rk AS (SELECT qid, did, c,
              row_number() OVER (PARTITION BY qid ORDER BY c DESC, did ASC) AS rn
       FROM cos)
SELECT qid::int AS query_id, rn::int AS rank, did::bigint AS doc_id,
       round(c, 6) AS cos_sim
FROM rk WHERE rn <= 5 ORDER BY query_id, rank
""",
        "phrase_bm25": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','batch','value']) AS term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
    AND tf.doc_id IN (SELECT doc_id FROM documents WHERE contains(text, '{LITERAL}'))
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "distinct_users_by_type": _grouped_hll_sql(p=8),
        "hll_set_algebra": _hll_sets_sql(p=8, key_a="view", key_b="click"),
        "bm25_snippets": f"""
WITH {_BM25_SCORES},
topk AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, round(score, 6) AS score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
pos AS (
  SELECT t.rank, t.doc_id, t.score, d.text,
         least(
           CASE WHEN instr(d.text, 'spark') > 0 THEN instr(d.text, 'spark') ELSE 2147483647 END,
           CASE WHEN instr(d.text, 'merge') > 0 THEN instr(d.text, 'merge') ELSE 2147483647 END,
           CASE WHEN instr(d.text, 'join') > 0 THEN instr(d.text, 'join') ELSE 2147483647 END
         ) AS p
  FROM topk t JOIN documents d USING (doc_id))
SELECT rank, doc_id, score,
       CASE WHEN p = 2147483647 THEN ''
            ELSE substr(text, greatest(p - 20, 1), 50) END AS snippet
FROM pos ORDER BY rank
""",
        "running_totals": """
WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id,
       row_number() OVER w::bigint AS row_number,
       round(percent_rank() OVER w, 6) AS percent_rank,
       ntile(4) OVER w::bigint AS ntile4,
       round(sum(value) OVER w, 6) AS running_sum,
       lag(value) OVER w AS lag_value
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, row_number
""",
        "events_pivot": """
SELECT user_id::bigint AS user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint AS n_view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS n_purchase
FROM events GROUP BY user_id ORDER BY user_id
""",
        "text_near_dup_semantic": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb32 AS (SELECT vec.doc_id, dim,
                 CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double AS val
          FROM vec JOIN nrm USING (doc_id)),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS dnorm FROM emb32 GROUP BY 1),
dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.val * b.val) AS dot
         FROM emb32 a JOIN emb32 b ON a.dim = b.dim AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
cos AS (SELECT id_a, id_b, dot / (x.dnorm * y.dnorm) AS c
        FROM dots JOIN dn x ON id_a = x.doc_id JOIN dn y ON id_b = y.doc_id)
SELECT id_a, id_b, round(c, 6) AS cos_sim FROM cos
WHERE c >= 0.9 ORDER BY id_a, id_b
""",
        "lang_quantiles_hist": """
WITH lohi AS (SELECT lang, min(n_chars)::double AS lo, max(n_chars)::double AS hi,
                     CASE WHEN max(n_chars) - min(n_chars) = 0 THEN 1.0
                          ELSE max(n_chars)::double - min(n_chars)::double END AS w
              FROM documents GROUP BY lang),
bins AS (SELECT d.lang,
                least(floor((d.n_chars::double - lo) / w * 1024)::bigint, 1023) AS bin
         FROM documents d JOIN lohi USING (lang)),
hist AS (SELECT lang, bin, count(*)::bigint AS cnt FROM bins GROUP BY 1, 2),
cum AS (SELECT lang, bin, cnt, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS c FROM hist),
n AS (SELECT lang, count(*)::bigint AS n FROM bins GROUP BY lang),
qs AS (SELECT unnest([0.5, 0.9]) AS q),
tgt AS (SELECT lang, q, greatest(1, ceil(q * n)::bigint) AS target FROM n, qs),
hit AS (SELECT t.lang, t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.lang = t.lang AND c.c >= t.target
        GROUP BY 1, 2, 3),
fin AS (SELECT h.lang, h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2
                         WHERE c2.lang = h.lang AND c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE lang = h.lang AND bin = h.bin) AS cnt
        FROM hit h)
SELECT f.lang, q::double AS q,
       lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 1024 AS value
FROM fin f JOIN lohi USING (lang) ORDER BY f.lang, q
""",
        "training_shuffle_rank": f"""
WITH {_splitmix_docs_ctes(7)}
SELECT doc_id::bigint AS doc_id,
       (row_number() OVER (ORDER BY h, doc_id) - 1)::bigint AS shuffle_rank
FROM hf ORDER BY doc_id
""",
        "train_val_test_split": f"""
WITH {_splitmix_docs_ctes(17)}
SELECT doc_id,
       CASE WHEN h < 14757395258967642112 THEN 'train'
            WHEN h < 16602069666338596864 THEN 'val'
            ELSE 'test' END AS split
FROM hf ORDER BY doc_id
""",
        "bm25_page2": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
""",
        "bm25_multi": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q(query_id, term) AS (SELECT * FROM (VALUES
  (0, 'spark'), (0, 'merge'), (0, 'join'),
  (1, 'customer'), (1, 'window'), (1, 'batch'),
  (2, 'vector'), (2, 'column'), (2, 'agg'))),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) JOIN q ON tf.term = q.term, stats
  GROUP BY q.query_id, tf.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
       FROM scores)
SELECT query_id::bigint AS query_id, rn::bigint AS rank, doc_id,
       round(score, 6) AS score
FROM rk WHERE rn <= 5 ORDER BY query_id, rank
""",
        "doc_lm_score": f"""
WITH toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
uni AS (SELECT term, count(*) AS c1 FROM ({_TOK}) GROUP BY term),
vv AS (SELECT count(*) AS v FROM uni),
bgc AS (SELECT bg, count(*) AS c12 FROM pairs GROUP BY bg),
scored AS (
  SELECT p.doc_id, ln((bgc.c12 + 1.0) / (uni.c1 + 1.0 * vv.v)) AS lp
  FROM pairs p JOIN bgc USING (bg) JOIN uni ON p.w1 = uni.term, vv),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS s FROM scored GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_bigrams, 0)::bigint AS n_bigrams,
       coalesce(round(a.s / a.n_bigrams, 6), 0.0) AS avg_logprob
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        # doc_lm_score chain + per-lang exact-thirds rank cut
        "ccnet_perplexity_buckets": f"""
WITH toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
uni AS (SELECT term, count(*) AS c1 FROM ({_TOK}) GROUP BY term),
vv AS (SELECT count(*) AS v FROM uni),
bgc AS (SELECT bg, count(*) AS c12 FROM pairs GROUP BY bg),
scored AS (
  SELECT p.doc_id, ln((bgc.c12 + 1.0) / (uni.c1 + 1.0 * vv.v)) AS lp
  FROM pairs p JOIN bgc USING (bg) JOIN uni ON p.w1 = uni.term, vv),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS s FROM scored GROUP BY doc_id),
sc AS (SELECT d.doc_id, d.lang,
              coalesce(round(a.s / a.n_bigrams, 6), 0.0) AS s
       FROM documents d LEFT JOIN agg a USING (doc_id)),
rk AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY s DESC, doc_id) - 1 AS r,
              count(*) OVER (PARTITION BY lang) AS n
       FROM sc)
SELECT doc_id, lang,
       CASE WHEN 3 * r < n THEN 'head'
            WHEN 3 * r < 2 * n THEN 'middle' ELSE 'tail' END AS bucket
FROM rk ORDER BY doc_id
""",
        "rebalance_mixture": f"""
WITH {_splitmix_docs_ctes(5)},
cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
w(lang, wnum) AS (SELECT * FROM (VALUES {", ".join(f"('{g}', {n})" for g, n in sorted(_MIX_WEIGHTS.items()))})),
thr AS (SELECT cnt.lang,
               least(18446744073709551616::hugeint * {_MIX_TOTAL} * w.wnum
                       // ({sum(_MIX_WEIGHTS.values())} * cnt.c),
                     18446744073709551615::hugeint) AS t
        FROM cnt JOIN w USING (lang))
SELECT hf.doc_id, hf.lang FROM hf JOIN thr USING (lang)
WHERE hf.h < thr.t ORDER BY hf.doc_id
""",
        "cross_snapshot_dedup": """
SELECT doc_id FROM documents
WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
ORDER BY doc_id
""",
        "quality_filter": """
WITH cut AS (SELECT lang, quantile_disc(n_chars, 0.1) AS c FROM documents GROUP BY lang)
SELECT doc_id, d.lang, n_chars FROM documents d JOIN cut USING (lang)
WHERE n_chars >= c ORDER BY doc_id
""",
        "lang_quantiles": """
SELECT lang, 0.5 AS q, quantile_disc(n_chars, 0.5) AS value FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.9 AS q, quantile_disc(n_chars, 0.9) AS value FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.99 AS q, quantile_disc(n_chars, 0.99) AS value FROM documents GROUP BY lang
ORDER BY lang, q
""",
        "canonical_url_dedup": r"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN
      'https://WWW.example' || ((doc_id // 2) % 97) || '.ORG/p/' || (doc_id // 2)
        || '/?utm_source=x'
        || CASE WHEN (doc_id // 2) % 3 = 0 THEN '&b=2&a=1' ELSE '' END
    ELSE
      'https://example' || ((doc_id // 2) % 97) || '.org:443/p/' || (doc_id // 2)
        || '?gclid=g'
        || CASE WHEN (doc_id // 2) % 3 = 0 THEN '&a=1&b=2' ELSE '' END
    END AS url
  FROM documents),
p AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host0,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
    regexp_extract(url, '\?([^#]*)', 1) AS q0
  FROM u),
c AS (
  SELECT doc_id,
    scheme || '://' ||
    CASE WHEN scheme = 'http'
         THEN regexp_replace(regexp_replace(host0, '^www\.', ''), ':80$', '')
         WHEN scheme = 'https'
         THEN regexp_replace(regexp_replace(host0, '^www\.', ''), ':443$', '')
         ELSE regexp_replace(host0, '^www\.', '') END ||
    CASE WHEN path0 = '' THEN '/' ELSE regexp_replace(path0, '^(.+?)/+$', '\1') END ||
    CASE WHEN len(qp) = 0 THEN '' ELSE '?' || array_to_string(qp, '&') END
      AS canonical_url
  FROM (SELECT *, list_sort(list_filter(str_split(q0, '&'),
          x -> x <> '' AND NOT regexp_matches(x,
               '^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)'))) AS qp
        FROM p))
SELECT doc_id::bigint AS doc_id, canonical_url,
       (CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canonical_url)
             THEN 1 ELSE 0 END)::int AS keep
FROM c ORDER BY doc_id
""",
        "host_stats": """
WITH pages AS (
  SELECT source || '.example.org' AS host, length(text)::bigint AS tc FROM documents
  UNION ALL
  SELECT source || '.example.org' AS host,
         length(substr(text, 1, greatest(1, length(text) // 2)))::bigint AS tc
  FROM documents WHERE doc_id % 50 = 0
)
SELECT host, count(*)::bigint AS n_pages, sum(tc)::bigint AS total_text_chars
FROM pages GROUP BY host ORDER BY host
""",
        "normalize_text": """
SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g')) AS norm_text
FROM documents ORDER BY doc_id
""",
        "bigram_topk": """
WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
u AS (SELECT doc_id, unnest(generate_series(1, len(toks)-1)) AS i, toks FROM d WHERE len(toks) >= 2)
SELECT toks[i] || ' ' || toks[i+1] AS bigram, count(*)::bigint AS n
FROM u GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
""",
        "pack_chunked": """
WITH tc AS (
  SELECT doc_id, (doc_id % 16)::bigint AS bucket,
         len(list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> ''))::bigint AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, bucket, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tokens)::bigint AS prior
  FROM tc)
SELECT doc_id, bucket, n_tokens,
       (prior // 256)::bigint AS seq_id, (prior % 256)::bigint AS seq_offset
FROM c ORDER BY doc_id
""",
        "heavy_hitters_event_type": """
SELECT event_type, count(*)::bigint AS n_rows FROM events
GROUP BY event_type ORDER BY n_rows DESC, event_type ASC LIMIT 3
""",
        "asof_join_purchase_view": """
WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT * FROM e WHERE event_type = 'purchase'),
r AS (SELECT * FROM e WHERE event_type = 'view')
SELECT l.event_id::bigint AS event_id, l.user_id::bigint AS user_id,
       l.ts_us::bigint AS ts_us,
       r.event_id::bigint AS event_id_right, r.value AS value_right
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
ORDER BY l.event_id
""",
        "sample_fraction": f"""
WITH {_splitmix_docs_ctes(42)}
SELECT doc_id, text, lang, source, n_chars FROM hf
WHERE h < {int(0.2 * 2 ** 64)} ORDER BY doc_id
""",
        # A-ES weighted sampling: u = (splitmix64(id^13)+0.5)/2^64,
        # keep the 100 largest ln(u)/weight keys (ties doc_id asc)
        "weighted_sample": f"""
WITH {_splitmix_docs_ctes(13)},
keys AS (
  SELECT doc_id, n_chars::bigint AS weight,
         ln((h::double + 0.5) / 18446744073709551616.0) / n_chars AS k
  FROM hf WHERE n_chars > 0)
SELECT doc_id, weight, round(k, 6) AS sel_key
FROM keys ORDER BY k DESC, doc_id ASC LIMIT 100
""",
        # stratified A-ES: top-20 per language by the same key
        "weighted_sample_by_lang": f"""
WITH {_splitmix_docs_ctes(13)},
keys AS (
  SELECT lang, doc_id, n_chars::bigint AS weight,
         ln((h::double + 0.5) / 18446744073709551616.0) / n_chars AS k
  FROM hf WHERE n_chars > 0)
SELECT lang, doc_id, weight, round(k, 6) AS sel_key
FROM (
  SELECT lang, doc_id, weight, k,
         row_number() OVER (
           PARTITION BY lang ORDER BY k DESC, doc_id ASC) AS rn
  FROM keys) WHERE rn <= 20
ORDER BY lang, sel_key DESC, doc_id
""",
        "sample_stratified": f"""
WITH {_splitmix_docs_ctes(1)},
rk AS (
  SELECT doc_id, text, lang, source, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM hf)
SELECT doc_id, text, lang, source, n_chars FROM rk WHERE rn <= 5 ORDER BY doc_id
""",
        "ngram_jaccard_pairs": """
WITH tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos FROM tokl
),
sh AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS shingle
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w IS NOT NULL
),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ds a JOIN ds b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, c::double / (sa.sz + sb.sz - c) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c::double / (sa.sz + sb.sz - c) >= 0.5
ORDER BY id_a, id_b
""",
        "duplicate_tile_spans": f"""
WITH tl AS (
  SELECT doc_id, unnest(range(0, length(text) // 32)) AS i, text FROM documents
),
grams AS (SELECT doc_id, substr(text, (i * 32) + 1, 32) AS term FROM tl),
terms AS (SELECT DISTINCT term FROM grams),
{_strhash64_sql(4)},
occ AS (SELECT doc_id, h FROM grams JOIN th USING (term)),
perdoc AS (SELECT h, doc_id, count(*) AS cnt FROM occ GROUP BY 1, 2),
tot AS (SELECT h, sum(cnt) AS total FROM perdoc GROUP BY 1),
dup AS (SELECT doc_id, sum(cnt) AS d FROM perdoc JOIN tot USING (h)
        WHERE total >= 2 GROUP BY 1)
SELECT doc.doc_id,
       coalesce(dup.d, 0)::bigint AS dup_tiles,
       (length(doc.text) // 32)::bigint AS total_tiles
FROM documents doc LEFT JOIN dup ON doc.doc_id = dup.doc_id
ORDER BY doc.doc_id
""",
        "simhash_signatures": f"""
WITH tok AS ({_TOK}),
tokh AS (
  SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
  FROM (SELECT DISTINCT term FROM tok)),
bits AS (
  SELECT t.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok t JOIN tokh th USING (term)
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY t.doc_id, p.bit, p.pw),
sig AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
  FROM bits GROUP BY doc_id)
SELECT d.doc_id,
       (CASE WHEN coalesce(v, 0) >= 9223372036854775808
             THEN coalesce(v, 0) - {_M64}
             ELSE coalesce(v, 0) END)::bigint AS simhash
FROM documents d LEFT JOIN sig USING (doc_id) ORDER BY doc_id
""",
        "simhash_pairs": f"""
WITH tok AS ({_TOK}),
tokh AS (
  SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
  FROM (SELECT DISTINCT term FROM tok)),
bits AS (
  SELECT t.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok t JOIN tokh th USING (term)
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY t.doc_id, p.bit, p.pw),
sig AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
  FROM bits GROUP BY doc_id),
u AS (
  SELECT d.doc_id, coalesce(s.v, 0)::ubigint AS uv
  FROM documents d LEFT JOIN sig s USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.uv, b.uv))::bigint AS hamming
FROM u a JOIN u b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.uv, b.uv)) <= 3
ORDER BY id_a, id_b
""",
        "label_centroids": """
WITH e AS (SELECT label, unnest(embedding) AS v, unnest(range(len(embedding))) AS dim
           FROM embeddings)
SELECT label::bigint AS label, dim::bigint AS dim,
       avg(v::double) AS centroid, count(*)::bigint AS n_vecs
FROM e GROUP BY label, dim ORDER BY label, dim
""",
        # nearest-centroid classification: per-label mean vectors, then
        # cosine argmax per query (ties -> smallest label)
        "centroid_classify": """
WITH e AS (SELECT label, unnest(embedding)::double AS v,
                  unnest(range(len(embedding))) AS dim
           FROM embeddings),
c AS (SELECT label, dim, avg(v) AS centroid FROM e GROUP BY label, dim),
q AS (SELECT vec_id AS qid, unnest(embedding)::double AS qv,
             unnest(range(len(embedding))) AS dim
      FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.qid, c.label,
         sum(q.qv * c.centroid)
           / (sqrt(sum(q.qv * q.qv)) * sqrt(sum(c.centroid * c.centroid))) AS cs
  FROM q JOIN c USING (dim) GROUP BY q.qid, c.label)
SELECT qid::bigint AS query_vec_id, label::bigint AS pred_label,
       round(cs, 6) AS cos_sim
FROM (
  SELECT qid, label, cs,
         row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label ASC) AS rn
  FROM s) WHERE rn = 1
ORDER BY qid
""",
        # centroid-distance outliers: 50 vectors least similar to their
        # own label centroid (ascending cosine, ties vec_id asc)
        "embedding_outliers": """
WITH e AS (SELECT label, unnest(embedding)::double AS v,
                  unnest(range(len(embedding))) AS dim
           FROM embeddings),
c AS (SELECT label, dim, avg(v) AS centroid FROM e GROUP BY label, dim),
p AS (SELECT vec_id, label, unnest(embedding)::double AS x,
             unnest(range(len(embedding))) AS dim
      FROM embeddings),
s AS (
  SELECT p.vec_id, p.label,
         sum(p.x * c.centroid)
           / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.centroid * c.centroid))) AS cs
  FROM p JOIN c ON c.label = p.label AND c.dim = p.dim
  GROUP BY p.vec_id, p.label)
SELECT vec_id::bigint AS vec_id, label::bigint AS label,
       round(cs, 6) AS cos_to_centroid
FROM s ORDER BY cs ASC, vec_id ASC LIMIT 50
""",
        # kNN majority-vote classification: first 5 vectors as queries,
        # self excluded, k=10, ties (count desc, label asc)
        "knn_label_classify": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.qid, e.vec_id, e.label,
         unnest(e.embedding)::double AS x, unnest(q.qe)::double AS y
  FROM embeddings e, q WHERE e.vec_id <> q.qid),
sims AS (
  SELECT qid, vec_id, label,
         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cs
  FROM pairs GROUP BY qid, vec_id, label),
nn AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id ASC) AS rn
    FROM sims) WHERE rn <= 10),
votes AS (SELECT qid, label, count(*)::bigint AS c FROM nn GROUP BY qid, label)
SELECT qid::bigint AS query_vec_id, label::bigint AS pred_label, c AS votes
FROM (
  SELECT qid, label, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, label ASC) AS rn
  FROM votes) WHERE rn = 1
ORDER BY qid
""",
        "knn_cosine": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::double AS x, unnest(qe)::double AS y
  FROM embeddings e, q
),
sims AS (
  SELECT vec_id, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos_sim
  FROM pairs GROUP BY vec_id
)
SELECT row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cos_sim, 6) AS cos_sim
FROM sims ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
""",
        # Benford first-digit profile: exact cents, digit off the
        # decimal string (no float log10 on the data side)
        "benford_first_digit": """
WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders),
d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
g AS (SELECT digit, count(*)::bigint AS n FROM d GROUP BY digit),
t AS (SELECT sum(n)::bigint AS tot FROM g)
SELECT digit, n, round(n::double / t.tot::double, 6) AS share,
       round(log10(1.0 + 1.0 / digit::double), 6) AS benford_p
FROM g, t ORDER BY digit
""",
        # CUSUM of daily counts around the global mean
        "cusum_daily_events": """
WITH d AS (SELECT (epoch_us(ts) // 86400000000)::bigint AS day,
                  count(*)::bigint AS n
           FROM events GROUP BY 1),
m AS (SELECT sum(n)::double / count(*)::double AS mu FROM d)
SELECT day, n,
       round(sum(n::double - m.mu) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING), 6) AS cusum
FROM d, m ORDER BY day
""",
        # Spearman via integer 2×midranks (2*rank + tiecount - 1),
        # hugeint moment sums, ONE float expression at the end
        "spearman_chars_tokens": f"""
WITH tc AS (
  SELECT d.doc_id, d.n_chars::bigint AS x, coalesce(c.n, 0)::bigint AS y
  FROM documents d LEFT JOIN (
    SELECT doc_id, count(*) AS n FROM ({_TOK}) GROUP BY doc_id) c USING (doc_id)),
r AS (SELECT
   (2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1)::bigint AS rx,
   (2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1)::bigint AS ry
  FROM tc),
s AS (SELECT count(*)::hugeint AS n, sum(rx)::hugeint AS sx, sum(ry)::hugeint AS sy,
             sum(rx*rx)::hugeint AS sxx, sum(ry*ry)::hugeint AS syy,
             sum(rx*ry)::hugeint AS sxy
      FROM r)
SELECT n::bigint AS n_docs,
       round((n*sxy - sx*sy)::double
             / (sqrt((n*sxx - sx*sx)::double) * sqrt((n*syy - sy*sy)::double)),
             6) AS spearman_rho
FROM s
""",
        # two-sample KS between the two largest languages' length CDFs
        "ks_length_by_lang": """
WITH lc AS (SELECT lang, count(*)::bigint AS n FROM documents GROUP BY lang),
top2 AS (SELECT lang, n,
                row_number() OVER (ORDER BY n DESC, lang ASC) AS rn FROM lc),
la AS (SELECT lang, n FROM top2 WHERE rn = 1),
lb AS (SELECT lang, n FROM top2 WHERE rn = 2),
g AS (SELECT n_chars AS v,
        count(*) FILTER (WHERE lang = (SELECT lang FROM la))::bigint AS ca,
        count(*) FILTER (WHERE lang = (SELECT lang FROM lb))::bigint AS cb
      FROM documents
      WHERE lang IN ((SELECT lang FROM la), (SELECT lang FROM lb))
      GROUP BY v),
c AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma,
             sum(cb) OVER (ORDER BY v) AS cumb FROM g)
SELECT (SELECT lang FROM la) AS lang_a, (SELECT lang FROM lb) AS lang_b,
       (SELECT n FROM la)::bigint AS n_a, (SELECT n FROM lb)::bigint AS n_b,
       round(max(abs(cuma::double / (SELECT n FROM la)::double
                     - cumb::double / (SELECT n FROM lb)::double)), 6) AS ks_stat
FROM c
""",
        "markov_stationary": _markov_sql(5),
        # session co-occurrence: distinct (session, type) incidence
        # self-joined within session, pair ordered alphabetically
        "session_type_pairs": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
flag AS (
  SELECT user_id, t, event_type,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_type)),
sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_type
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM st a JOIN st b USING (user_id, sid)
      WHERE a.event_type < b.event_type)
SELECT type_a, type_b, count(*)::bigint AS n
FROM p GROUP BY 1, 2 ORDER BY 1, 2
""",
        # hapax share of each language's vocabulary
        "hapax_ratio_by_lang": f"""
WITH tok AS ({_TOK}),
lt AS (SELECT d.lang, t.term, count(*)::bigint AS n
       FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2)
SELECT lang, count(*)::bigint AS vocab,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::bigint AS hapax,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::double
               / count(*)::double, 6) AS hapax_ratio
FROM lt GROUP BY lang ORDER BY lang
""",
        # Mann–Whitney AUC on integer 2×midranks of the rounded score
        "roc_auc_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id, q.p,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
r AS (SELECT y,
             (2 * rank() OVER (ORDER BY p)
              + count(*) OVER (PARTITION BY p) - 1)::bigint AS r2
      FROM lab),
s AS (SELECT sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)::hugeint AS s2,
             sum(y)::hugeint AS n1, count(*)::hugeint AS n FROM r)
SELECT n1::bigint AS n_pos, (n - n1)::bigint AS n_neg,
       round((s2 - n1 * (n1 + 1))::double
               / (2 * n1 * (n - n1))::double, 6) AS auc
FROM s
""",
        # per-doc cross-entropy of the clipped classifier probability
        "log_loss_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id,
               least(greatest(q.p, 0.000001), 0.999999) AS p,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id))
SELECT doc_id, y::bigint AS label,
       round(-(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS loss
FROM lab ORDER BY doc_id
""",
        # host-grouped 80/10/10 split on the shared string hash
        "host_split": f"""
WITH terms AS (SELECT DISTINCT source AS term FROM documents),
{_strhash64_sql(1)}
SELECT d.doc_id, d.source,
       CASE WHEN th.h < {(1 << 64) * 8 // 10} THEN 'train'
            WHEN th.h < {(1 << 64) * 9 // 10} THEN 'val'
            ELSE 'test' END AS split
FROM documents d JOIN th ON th.term = d.source ORDER BY d.doc_id
""",
        # Theil–Sen: median of all pairwise day-slopes; even-n median
        # as the explicit mean of the two middle order statistics
        "theil_sen_daily_trend": f"""
WITH d AS ({_DAILY_SQL}),
p AS (SELECT (b.n - a.n)::double / (b.day - a.day)::double AS slope
      FROM d a JOIN d b ON b.day > a.day),
r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS cnt FROM p)
SELECT (SELECT count(*) FROM d)::bigint AS n_days,
       (SELECT count(*) FROM p)::bigint AS n_pairs,
       round(avg(slope), 6) AS slope
FROM r WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
""",
        # Mann–Kendall S and tau-a: exact integer sign-sum over
        # day-ordered pairs, one final division
        "mann_kendall_daily_trend": f"""
WITH d AS ({_DAILY_SQL}),
p AS (SELECT sign(b.n - a.n)::bigint AS s
      FROM d a JOIN d b ON b.day > a.day),
t AS (SELECT sum(s)::bigint AS s_stat, count(*)::bigint AS n_pairs FROM p)
SELECT (SELECT count(*) FROM d)::bigint AS n_days, s_stat, n_pairs,
       round(s_stat::double / n_pairs::double, 6) AS tau
FROM t
""",
        # ACF lags 1..7 via exact hugeint moments:
        # r_k = (n²P_k − nS(A_k+B_k) + (n−k)S²) / (n(nQ − S²))
        "acf_daily_events": f"""
WITH d AS ({_DAILY_SQL}),
r AS (SELECT n::hugeint AS x, row_number() OVER (ORDER BY day) AS rn FROM d),
s AS (SELECT count(*)::hugeint AS nn, sum(x)::hugeint AS sx,
             sum(x * x)::hugeint AS sxx FROM r),
m AS (SELECT l.lag,
             sum(a.x * b.x)::hugeint AS pk,
             sum(a.x)::hugeint AS ak, sum(b.x)::hugeint AS bk,
             count(*)::hugeint AS mk
      FROM range(1, 8) l(lag)
      JOIN r a ON TRUE JOIN r b ON b.rn = a.rn - l.lag
      GROUP BY l.lag)
SELECT m.lag::bigint AS lag,
       round((s.nn * s.nn * m.pk - s.nn * s.sx * (m.ak + m.bk)
              + m.mk * s.sx * s.sx)::double
             / (s.nn * (s.nn * s.sxx - s.sx * s.sx))::double, 6) AS acf
FROM m, s ORDER BY lag
""",
        # ISO day-of-week (0=Monday) share — epoch day 0 was a Thursday
        "dow_profile_events": """
WITH d AS (SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow FROM events),
g AS (SELECT dow::bigint AS dow, count(*)::bigint AS n FROM d GROUP BY 1),
t AS (SELECT sum(n)::bigint AS tot FROM g)
SELECT dow, n, round(n::double / t.tot::double, 6) AS share
FROM g, t ORDER BY dow
""",
        # MAD of daily counts: both medians via explicit two-middle avg
        "mad_daily_events": f"""
WITH d AS ({_DAILY_SQL}),
r1 AS (SELECT n::double AS v, row_number() OVER (ORDER BY n) AS rn,
              count(*) OVER () AS cnt FROM d),
med AS (SELECT avg(v) AS m FROM r1 WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)),
dev AS (SELECT abs(d.n::double - med.m) AS v FROM d, med),
r2 AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
              count(*) OVER () AS cnt FROM dev)
SELECT (SELECT count(*) FROM d)::bigint AS n_days,
       round((SELECT m FROM med), 6) AS median_n,
       round(avg(v), 6) AS mad
FROM r2 WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
""",
        # Q12-shape: ship delay in whole days, >60-day late share
        "shipping_delay_by_priority": """
WITH j AS (SELECT o_orderpriority,
                  (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                    // 86400000000 AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, count(*)::bigint AS n_lines,
       sum(CASE WHEN d > 60 THEN 1 ELSE 0 END)::bigint AS n_late,
       round(sum(CASE WHEN d > 60 THEN 1 ELSE 0 END)::double
             / count(*)::double, 6) AS late_share
FROM j GROUP BY 1 ORDER BY 1
""",
        # Q21-shape: sole late supplier of multi-supplier orders
        "suppliers_kept_waiting": """
WITH l AS (SELECT l_orderkey, l_suppkey,
                  CASE WHEN (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                            // 86400000000 > 90 THEN 1 ELSE 0 END AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ps AS (SELECT l_orderkey, l_suppkey, max(late) AS late FROM l GROUP BY 1, 2),
os AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
       FROM ps GROUP BY 1),
w AS (SELECT ps.l_suppkey FROM ps JOIN os USING (l_orderkey)
      WHERE ps.late = 1 AND os.n_supp > 1 AND os.n_late = 1),
c AS (SELECT l_suppkey, count(*)::bigint AS numwait FROM w GROUP BY 1)
SELECT s.s_suppkey::bigint AS s_suppkey, s.s_name, c.numwait
FROM c JOIN supplier s ON s.s_suppkey = c.l_suppkey
ORDER BY numwait DESC, s_name ASC LIMIT 20
""",
        # reliability bins: integer micro-unit sums, two final divisions
        "calibration_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT CAST(floor(q.p * 1000000 + 0.5) AS BIGINT) AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
b AS (SELECT least(p6 // 100000, 9)::bigint AS bin, p6, y FROM lab),
g AS (SELECT bin, count(*)::bigint AS n, sum(y)::bigint AS n_pos,
             sum(p6)::bigint AS sp6 FROM b GROUP BY bin)
SELECT bin, n, n_pos,
       round(sp6::double / (n * 1000000)::double, 6) AS mean_p,
       round(n_pos::double / n::double, 6) AS frac_pos
FROM g ORDER BY bin
""",
        # P/R/F1 at 0.1..0.9: integer tp/fp/fn, one division per metric
        "pr_threshold_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT CAST(floor(q.p * 1000000 + 0.5) AS BIGINT) AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
th AS (SELECT (t.t * 100000)::bigint AS t6 FROM range(1, 10) t(t)),
m AS (SELECT th.t6,
             sum(CASE WHEN p6 >= th.t6 THEN y ELSE 0 END)::bigint AS tp,
             sum(CASE WHEN p6 >= th.t6 THEN 1 - y ELSE 0 END)::bigint AS fp,
             sum(CASE WHEN p6 < th.t6 THEN y ELSE 0 END)::bigint AS fn
      FROM lab, th GROUP BY th.t6)
SELECT round(t6::double / 1000000.0, 6) AS threshold, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN 0.0
            ELSE round(tp::double / (tp + fp)::double, 6) END AS precision,
       CASE WHEN tp + fn = 0 THEN 0.0
            ELSE round(tp::double / (tp + fn)::double, 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
            ELSE round(2 * tp::double / (2 * tp + fp + fn)::double, 6) END AS f1
FROM m ORDER BY t6
""",
        # RFM: exact-cents folds, two-middle medians, threshold segments
        "rfm_segments": """
WITH m AS (SELECT o_custkey AS c_custkey, count(*)::bigint AS freq,
                  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::bigint
                    AS monetary_cents,
                  max(epoch_us(o_orderdate)) AS mx
           FROM orders GROUP BY 1),
gm AS (SELECT max(mx) AS gmx FROM m),
r AS (SELECT c_custkey, freq, monetary_cents,
             ((gm.gmx - mx) // 86400000000)::bigint AS r_days FROM m, gm),
medr AS (SELECT avg(v) AS v FROM (
  SELECT r_days::double AS v, row_number() OVER (ORDER BY r_days) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2)),
medf AS (SELECT avg(v) AS v FROM (
  SELECT freq::double AS v, row_number() OVER (ORDER BY freq) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2)),
medm AS (SELECT avg(v) AS v FROM (
  SELECT monetary_cents::double AS v,
         row_number() OVER (ORDER BY monetary_cents) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2))
SELECT c_custkey, r_days, freq, monetary_cents,
       concat(CASE WHEN r_days::double <= medr.v THEN 'R1' ELSE 'R0' END,
              CASE WHEN freq::double >= medf.v THEN 'F1' ELSE 'F0' END,
              CASE WHEN monetary_cents::double >= medm.v THEN 'M1' ELSE 'M0' END)
         AS segment
FROM r, medr, medf, medm ORDER BY c_custkey
""",
        "kmeans_davies_bouldin": _kmeans_db_sql(k=4, n_iter=3, dim=64),
        "textrank_keywords": _textrank_sql(k=3, n_iter=5),
        # per-type exact-cents revenue profile
        "event_value_stats": """
WITH c AS (SELECT event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
g AS (SELECT event_type, count(*)::bigint AS n, sum(cents)::bigint AS sum_cents
      FROM c GROUP BY 1),
t AS (SELECT sum(sum_cents)::bigint AS tot FROM g)
SELECT event_type, n, sum_cents,
       round(sum_cents::double / (n * 100)::double, 6) AS mean_value,
       round(sum_cents::double / t.tot::double, 6) AS value_share
FROM g, t ORDER BY event_type
""",
        # top-1%/10% purchaser share, integer-ceil head sizes
        "revenue_concentration": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id ASC) AS rn,
             count(*) OVER () AS n, sum(c) OVER () AS tot FROM u)
SELECT max(n)::bigint AS n_users, max(tot)::bigint AS total_cents,
       ((max(n) + 99) // 100)::bigint AS top1pct_users,
       round(sum(CASE WHEN rn <= (n + 99) // 100 THEN c ELSE 0 END)::double
             / max(tot)::double, 6) AS top1pct_share,
       ((max(n) + 9) // 10)::bigint AS top10pct_users,
       round(sum(CASE WHEN rn <= (n + 9) // 10 THEN c ELSE 0 END)::double
             / max(tot)::double, 6) AS top10pct_share
FROM r
""",
        # explicit-interpolation per-purchaser revenue percentiles
        "arpu_percentiles": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c::double AS v, row_number() OVER (ORDER BY c) AS rn,
             count(*) OVER () AS n FROM u),
q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
pos AS (SELECT q.q, (max(r.n) - 1) * q.q AS p, max(r.n)::bigint AS n
        FROM q, r GROUP BY q.q),
pick AS (SELECT p.q, p.n, p.p - floor(p.p) AS frac,
                lo.v AS vlo, hi.v AS vhi
         FROM pos p
         JOIN r lo ON lo.rn = CAST(floor(p.p) AS BIGINT) + 1
         JOIN r hi ON hi.rn = least(CAST(floor(p.p) AS BIGINT) + 2, p.n))
SELECT q, n AS n_users,
       round((vlo + (vhi - vlo) * frac) / 100.0, 6) AS revenue
FROM pick ORDER BY q
""",
        # JSON sidecar k-field profile per type
        "props_field_stats": """
WITH k AS (SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events),
f AS (SELECT event_type, k FROM k WHERE k IS NOT NULL)
SELECT event_type, count(*)::bigint AS n_with_k, sum(k)::bigint AS sum_k,
       round(sum(k)::double / count(*)::double, 6) AS mean_k,
       min(k)::bigint AS min_k, max(k)::bigint AS max_k
FROM f GROUP BY event_type ORDER BY event_type
""",
        # SALSA: degree-normalized HITS, every iteration a CTE pair
        "salsa_scores": _salsa_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        # midpoint-split churn flags, per-user presence max
        "churned_users": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id)
SELECT (SELECT mid FROM b)::bigint AS mid_us,
       count(*)::bigint AS n_users,
       sum(f)::bigint AS n_first_half,
       sum(s)::bigint AS n_second_half,
       sum(CASE WHEN f = 1 AND s = 0 THEN 1 ELSE 0 END)::bigint AS n_churned,
       sum(CASE WHEN s = 1 AND f = 0 THEN 1 ELSE 0 END)::bigint AS n_new,
       CASE WHEN sum(f) > 0
            THEN round(sum(CASE WHEN f = 1 AND s = 0 THEN 1 ELSE 0 END)::double
                       / sum(f)::double, 6)
            ELSE 0.0 END AS churn_rate
FROM u
""",
        # per-user first-seen day fold
        "daily_new_users": """
SELECT day, count(*)::bigint AS new_users FROM (
  SELECT user_id, (min(epoch_us(ts)) // 86400000000)::bigint AS day
  FROM events GROUP BY user_id
) GROUP BY day ORDER BY day
""",
        # ⌊log2 n⌋ buckets via binary-string length (no float log)
        "user_activity_histogram": """
WITH u AS (SELECT user_id, count(*)::bigint AS n FROM events GROUP BY user_id),
b AS (SELECT (length(bin(n)) - 1)::bigint AS bucket, n FROM u)
SELECT bucket, (1::bigint << bucket)::bigint AS lo,
       count(*)::bigint AS n_users, sum(n)::bigint AS n_events
FROM b GROUP BY bucket ORDER BY bucket
""",
        # zero-cell-free chi² identity: N·(Σ O²/(R·C) − 1)
        "chi2_lang_source": """
WITH o AS (SELECT lang, source, count(*)::bigint AS n FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, sum(n)::bigint AS r FROM o GROUP BY 1),
ct AS (SELECT source, sum(n)::bigint AS c FROM o GROUP BY 1),
t AS (SELECT sum(n)::bigint AS tot FROM o),
dims AS (SELECT (SELECT count(*) FROM rt)::bigint AS r,
                (SELECT count(*) FROM ct)::bigint AS c),
s AS (SELECT sum(o.n::double * o.n::double / (rt.r::double * ct.c::double)) AS ss
      FROM o JOIN rt USING (lang) JOIN ct USING (source))
SELECT t.tot AS n_docs, dims.r AS n_langs, dims.c AS n_sources,
       ((dims.r - 1) * (dims.c - 1))::bigint AS dof,
       round(t.tot::double * (s.ss - 1.0), 6) + 0.0 AS chi2,
       round(sqrt(greatest(t.tot::double * (s.ss - 1.0), 0.0)
                  / (t.tot::double * least(dims.r - 1, dims.c - 1)::double)), 6)
         + 0.0 AS cramers_v
FROM t, dims, s
""",
        # vocabulary-shape profile per token length
        "word_length_hist": """
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                       x -> x <> '')) AS term FROM documents),
lt AS (SELECT length(term)::bigint AS len, term, count(*)::bigint AS n
       FROM tok GROUP BY 1, 2)
SELECT len, sum(n)::bigint AS n_tokens, count(*)::bigint AS n_terms
FROM lt GROUP BY len ORDER BY len
""",
        # posting AND + NOT: spark ∧ join ∧ ¬merge
        "boolean_not_search": f"""
WITH tok AS ({_TOK}),
t AS (SELECT DISTINCT doc_id, term FROM tok),
inc AS (SELECT doc_id FROM t WHERE term IN ('spark', 'join')
        GROUP BY doc_id HAVING count(*) = 2)
SELECT doc_id::bigint AS doc_id FROM inc
WHERE doc_id NOT IN (SELECT doc_id FROM t WHERE term = 'merge')
ORDER BY doc_id
""",
        # variance-ratio index over the same k-means chain
        "calinski_harabasz": _kmeans_ch_sql(k=4, n_iter=3, dim=64),
        # centroid-based silhouette from the rn=1/rn=2 distance rows
        "silhouette_simplified": _kmeans_sil_sql(k=4, n_iter=3, dim=64),
        # (2m, 2m+1) cosine pairs in ten 0.2 bins, round-6 before binning
        "cosine_pair_hist": """
WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
od AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
p AS (SELECT a.vec_id AS pid, a.embedding AS ea, b.embedding AS eb
      FROM ev a JOIN od b ON b.vec_id = a.vec_id + 1),
l AS (SELECT pid, i.i AS dim, ea[i.i]::double AS av, eb[i.i]::double AS bv
      FROM p, (SELECT unnest(range(1, 65)) AS i) i),
d AS (SELECT pid, sum(av * bv) AS dot, sqrt(sum(av * av)) AS na,
             sqrt(sum(bv * bv)) AS nb
      FROM l GROUP BY pid),
c AS (SELECT round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS c
      FROM d),
b AS (SELECT least(greatest(CAST(floor((c + 1.0) * 5) AS BIGINT), 0), 9) AS bin
      FROM c)
SELECT bin, round(bin * 0.2 - 1.0, 6) AS lo, count(*)::bigint AS n_pairs
FROM b GROUP BY bin ORDER BY bin
""",
        # share of distinct directed non-loop edges with a reverse edge
        "link_reciprocity": f"""
WITH {_LINK_EDGES_CTE},
d AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
p AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
      FROM d GROUP BY 1, 2)
SELECT (SELECT count(*) FROM d)::bigint AS n_edges,
       count(*)::bigint AS n_pairs,
       sum(CASE WHEN f = 1 AND r = 1 THEN 1 ELSE 0 END)::bigint AS n_reciprocal_pairs,
       round(sum(CASE WHEN f = 1 AND r = 1 THEN 2 ELSE 0 END)::double
             / (SELECT count(*) FROM d)::double, 6) + 0.0 AS reciprocity
FROM p
""",
        # 7-day rolling median, explicit two-middle picks
        "rolling_median_daily": f"""
WITH dc AS ({_DAILY_SQL}),
w AS (SELECT d.day AS day, e.n AS n
      FROM dc d JOIN dc e ON e.day BETWEEN d.day - 6 AND d.day),
r AS (SELECT day, n, row_number() OVER (PARTITION BY day ORDER BY n) AS rn,
             count(*) OVER (PARTITION BY day) AS w FROM w)
SELECT day, max(w)::bigint AS window_n,
       round((max(CASE WHEN rn = (w + 1) // 2 THEN n END)
              + max(CASE WHEN rn = w // 2 + 1 THEN n END)) / 2.0, 6) AS med
FROM r GROUP BY day ORDER BY day
""",
        # GROUP BY ROLLUP with 'ALL' markers, exact 1e-4 revenue units
        "lineitem_rollup": """
WITH f AS (SELECT l_returnflag, l_linestatus,
                  round(l_extendedprice * 100)::bigint AS p,
                  round(l_discount * 100)::bigint AS d
           FROM lineitem)
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*)::bigint AS n,
       sum(p * (100 - d))::bigint AS rev1e4
FROM f GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY 1, 2
""",
        # LAG over each customer's (date, orderkey)-ordered orders
        "customer_order_lag": """
WITH o AS (SELECT o_custkey, o_orderkey,
                  round(o_totalprice * 100)::bigint AS cents,
                  epoch_us(o_orderdate) AS us
           FROM orders)
SELECT o_custkey, o_orderkey, cents,
       lag(cents) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey) AS lag_cents,
       cents - lag(cents) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey)
         AS delta_cents
FROM o ORDER BY o_custkey, o_orderkey
""",
        # global NTILE(4) by balance desc, suppkey tiebreak
        "supplier_balance_ntile": """
WITH s AS (SELECT s_suppkey, round(s_acctbal * 100)::bigint AS cents FROM supplier),
t AS (SELECT cents, ntile(4) OVER (ORDER BY cents DESC, s_suppkey) AS tile FROM s)
SELECT tile::bigint AS tile, count(*)::bigint AS n_suppliers,
       min(cents)::bigint AS min_cents, max(cents)::bigint AS max_cents,
       sum(cents)::bigint AS sum_cents
FROM t GROUP BY tile ORDER BY tile
""",
        # per-doc character 3-windows, global top-50
        "char_trigram_topk": """
WITH d AS (SELECT text, length(text) AS L FROM documents WHERE length(text) >= 3),
u AS (SELECT text, unnest(generate_series(1, L - 2)) AS i FROM d)
SELECT substr(text, i, 3) AS trigram, count(*)::bigint AS n
FROM u GROUP BY trigram ORDER BY n DESC, trigram LIMIT 50
""",
        # Cohen's kappa of the langid heuristic vs the label
        "langid_kappa": f"""
WITH tok AS ({_TOK}),
hits AS (
  SELECT t.doc_id, l.lang, count(*) AS score
  FROM tok t JOIN (VALUES {_langid_values()}) l(lang, word) ON t.term = l.word
  GROUP BY t.doc_id, l.lang),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM hits),
pred AS (
  SELECT d.lang AS true_lang,
         coalesce(CASE WHEN b.score > 0 THEN b.lang END, 'unknown') AS pred_lang
  FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)),
cm AS (SELECT true_lang, pred_lang, count(*)::bigint AS n FROM pred GROUP BY 1, 2),
tot AS (SELECT sum(n)::bigint AS n FROM cm),
cl AS (SELECT DISTINCT c FROM (SELECT true_lang AS c FROM cm
                               UNION SELECT pred_lang FROM cm)),
rowm AS (SELECT cl.c, coalesce(sum(cm.n), 0)::bigint AS r
         FROM cl LEFT JOIN cm ON cm.true_lang = cl.c GROUP BY cl.c),
colm AS (SELECT cl.c, coalesce(sum(cm.n), 0)::bigint AS cc
         FROM cl LEFT JOIN cm ON cm.pred_lang = cl.c GROUP BY cl.c),
ag AS (SELECT coalesce(sum(CASE WHEN true_lang = pred_lang THEN n END), 0)::bigint
         AS agree FROM cm),
pe AS (SELECT sum(rowm.r * colm.cc)::bigint AS x
       FROM rowm JOIN colm USING (c))
SELECT tot.n AS n_docs, ag.agree AS n_agree,
       round(ag.agree::double / tot.n::double, 6) + 0.0 AS po,
       round(pe.x::double / (tot.n::double * tot.n::double), 6) + 0.0 AS pe,
       round((ag.agree::double / tot.n::double
              - pe.x::double / (tot.n::double * tot.n::double))
             / (1.0 - pe.x::double / (tot.n::double * tot.n::double)), 6)
         + 0.0 AS kappa
FROM tot, ag, pe
""",
        # two-pass central moments: g1 and excess g2 per language
        "length_skew_kurtosis": """
WITH m AS (SELECT lang, count(*)::bigint AS n, sum(n_chars)::bigint AS sx
           FROM documents GROUP BY lang),
mu AS (SELECT lang, n, sx::double / n::double AS mean FROM m),
c AS (SELECT d.lang, (d.n_chars::double - mu.mean) AS dd, mu.n, mu.mean
      FROM documents d JOIN mu USING (lang)),
p AS (SELECT lang, max(n) AS n, max(mean) AS mean,
             sum(dd * dd) / max(n) AS m2,
             sum(dd * dd * dd) / max(n) AS m3,
             sum(dd * dd * dd * dd) / max(n) AS m4
      FROM c GROUP BY lang)
SELECT lang, n::bigint AS n,
       round(mean, 6) + 0.0 AS mean_len,
       round(sqrt(m2), 6) + 0.0 AS sd_len,
       round(CASE WHEN m2 > 0 THEN m3 / (m2 ^ 1.5) ELSE 0.0 END, 6) + 0.0
         AS skewness,
       round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 ELSE 0.0 END, 6) + 0.0
         AS kurtosis_excess
FROM p ORDER BY lang
""",
        # first-touch (min ts, event_id) revenue attribution
        "purchase_attribution": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
ft AS (SELECT user_id, event_type AS first_touch_type FROM (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         FROM e) WHERE rn = 1),
rev AS (SELECT user_id,
               sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)::bigint AS c,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS isp
        FROM e GROUP BY user_id)
SELECT ft.first_touch_type, count(*)::bigint AS n_users,
       sum(rev.isp)::bigint AS n_purchasers,
       sum(rev.c)::bigint AS purchase_cents,
       round(sum(rev.c)::double / (SELECT sum(c) FROM rev)::double, 6) + 0.0
         AS revenue_share
FROM ft JOIN rev USING (user_id)
GROUP BY 1 ORDER BY 1
""",
        # 3·triangles / wedges over the undirected distinct pair set
        "link_transitivity": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (
  SELECT node, count(*)::bigint AS d
  FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce) GROUP BY node),
tri AS (
  SELECT count(*)::bigint AS t
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
w AS (SELECT count(*)::bigint AS n_nodes,
             sum(d * (d - 1) // 2)::bigint AS wedges FROM deg)
SELECT w.n_nodes, tri.t AS n_triangles, w.wedges AS n_wedges,
       round(3.0 * tri.t / w.wedges, 6) + 0.0 AS transitivity
FROM w, tri
""",
        # counter-mode splitmix64 draws through the inverse CDF
        "bootstrap_mean_ci": f"""
WITH vc AS (SELECT n_chars::bigint AS v, count(*)::bigint AS c
            FROM documents GROUP BY 1),
s AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM vc),
bnd AS (SELECT (cum - c)::bigint AS lo, cum::bigint AS hi, v FROM s),
nn AS (SELECT count(*)::bigint AS n FROM documents),
ts AS (SELECT unnest(range(0, {_BOOT_B * _BOOT_M}))::bigint AS t),
h0 AS (SELECT t, xor(t::ubigint, {_BOOT_SEED}::ubigint)::hugeint AS x0 FROM ts),
h1 AS (SELECT t, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", str(0xBF58476D1CE4E5B9) + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT t, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", str(0x94D049BB133111EB) + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT t, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
u AS (SELECT t, (h % (SELECT n FROM nn))::bigint AS u FROM hf),
d AS (SELECT u.t // {_BOOT_M} AS b, bnd.v
      FROM u JOIN bnd ON u.u >= bnd.lo AND u.u < bnd.hi),
mm AS (SELECT b, sum(v)::bigint AS sv FROM d GROUP BY b),
r AS (SELECT sv::double / {_BOOT_M}.0 AS mean,
             row_number() OVER (ORDER BY sv) AS rn,
             count(*) OVER () AS nb FROM mm),
q AS (SELECT unnest([0.025, 0.5, 0.975]) AS q),
pos AS (SELECT q.q, (max(r.nb) - 1) * q.q AS p, max(r.nb)::bigint AS nb
        FROM q, r GROUP BY q.q),
pick AS (SELECT p.q, p.p - floor(p.p) AS frac, lo.mean AS vlo, hi.mean AS vhi
         FROM pos p
         JOIN r lo ON lo.rn = CAST(floor(p.p) AS BIGINT) + 1
         JOIN r hi ON hi.rn = least(CAST(floor(p.p) AS BIGINT) + 2, p.nb))
SELECT q, {_BOOT_B}::bigint AS n_resamples, {_BOOT_M}::bigint AS m_draws,
       round(vlo + (vhi - vlo) * frac, 6) + 0.0 AS boot_mean
FROM pick ORDER BY q
""",
        # exact-integer median/MAD outlier rule: 2·dev2 > 3·mad2x2
        "robust_outliers_by_lang": """
WITH r AS (SELECT lang, n_chars::bigint AS v,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents),
med AS (SELECT lang, max(n)::bigint AS n,
               (max(CASE WHEN rn = (n + 1) // 2 THEN v END)
                + max(CASE WHEN rn = n // 2 + 1 THEN v END))::bigint AS med2
        FROM r GROUP BY lang),
d AS (SELECT r.lang, abs(2 * r.v - m.med2)::bigint AS dev2, m.med2, m.n
      FROM r JOIN med m USING (lang)),
dr AS (SELECT lang, dev2, med2, n,
              row_number() OVER (PARTITION BY lang ORDER BY dev2) AS rn
       FROM d),
mad AS (SELECT lang, max(med2)::bigint AS med2, max(n)::bigint AS n,
               (max(CASE WHEN rn = (n + 1) // 2 THEN dev2 END)
                + max(CASE WHEN rn = n // 2 + 1 THEN dev2 END))::bigint AS mad2x2
        FROM dr GROUP BY lang),
o AS (SELECT d.lang,
             sum(CASE WHEN 2 * d.dev2 > 3 * m.mad2x2 THEN 1 ELSE 0 END)::bigint
               AS n_outliers
      FROM d JOIN mad m USING (lang) GROUP BY d.lang)
SELECT m.lang, m.n, round(m.med2 / 2.0, 6) AS median_len,
       round(m.mad2x2 / 4.0, 6) AS mad_len, o.n_outliers
FROM mad m JOIN o USING (lang) ORDER BY m.lang
""",
        # WARC roundtrip: pages synthesis replayed in pure SQL (url
        # format, epoch+doc_id seconds, every-50th 1h-earlier stale
        # half-text crawl); text compares byte-identical
        "warc_source_roundtrip": """
WITH base AS (
  SELECT 'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us,
         text
  FROM documents),
stale AS (
  SELECT 'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us,
         substr(text, 1, greatest(1, length(text) // 2)) AS text
  FROM documents WHERE doc_id % 50 = 0)
SELECT url, ts_us, text
FROM (SELECT * FROM base UNION ALL SELECT * FROM stale)
ORDER BY url, ts_us
""",
        # robots longest-match replayed as predicates over the pages
        # replay: odd-ranked hosts blocked; even: ids<100 except 40-49
        "robots_filtered_pages": """
WITH hr AS (
  SELECT source, (dense_rank() OVER (ORDER BY source) - 1) % 2 AS p
  FROM (SELECT DISTINCT source FROM documents)),
pages AS (
  SELECT source, doc_id,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us
  FROM documents
  UNION ALL
  SELECT source, doc_id,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us
  FROM documents WHERE doc_id % 50 = 0)
SELECT url, ts_us
FROM pages JOIN hr USING (source)
WHERE p = 0 AND (doc_id >= 100 OR (doc_id >= 40 AND doc_id < 50))
ORDER BY url, ts_us
""",
        # survivors = page rows whose member index j % 13 != 5, in
        # fresh-then-stale synthesis order per doc
        "warc_tolerant_parse": """
WITH pages AS (
  SELECT doc_id, 0 AS ord,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us
  FROM documents
  UNION ALL
  SELECT doc_id, 1 AS ord,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us
  FROM documents WHERE doc_id % 50 = 0),
seq AS (SELECT url, ts_us,
               row_number() OVER (ORDER BY doc_id, ord) - 1 AS j
        FROM pages)
SELECT url, ts_us FROM seq WHERE j % 13 <> 5 ORDER BY url, ts_us
""",
        # sitemap frontier = exactly the phantom ids (never crawled)
        "sitemap_frontier": """
SELECT 'https://' || source || '.example.org/doc/'
         || lpad(CAST(doc_id + 10000000 AS VARCHAR), 8, '0') AS url,
       strftime(DATE '2023-11-14' + ((doc_id + 10000000) % 400)::int,
                '%Y-%m-%d') AS lastmod
FROM documents WHERE doc_id % 7 = 0 ORDER BY url
""",
        # charset rule + injected markers replayed directly
        "charset_sniff_decode": """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'latin-1' ELSE 'utf-8' END AS charset,
       CASE WHEN doc_id % 5 = 0 THEN 'café ¿señor? ' || text
            ELSE '☃ búttèrfly ' || text END AS text
FROM documents ORDER BY doc_id
""",
        # JSONL/CSV ingest parity: same exact-cents aggregate as parquet
        "multi_format_source": """
SELECT event_type, count(*)::bigint AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS cents
FROM events GROUP BY event_type ORDER BY event_type
""",
        # 4 independent subspace k-means chains + final assignments
        "pq_codes": _pq_codes_sql(
            M=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, subdim=_PQ_SUBDIM
        ),
        # PSI drift of the event-type mix across the timeline midpoint
        "psi_event_drift": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
g AS (SELECT event_type,
             sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END)::bigint AS f,
             sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END)::bigint AS s
      FROM events GROUP BY event_type),
t AS (SELECT sum(f)::bigint AS nf, sum(s)::bigint AS ns FROM g),
d AS (SELECT (g.f::double / t.nf::double) AS p, (g.s::double / t.ns::double) AS q
      FROM g, t WHERE g.f > 0 AND g.s > 0)
SELECT t.nf AS n_first, t.ns AS n_second,
       (SELECT count(*) FROM d)::bigint AS n_types_both,
       round((SELECT sum((p - q) * ln(p / q)) FROM d), 6) + 0.0 AS psi
FROM t
""",
        # PQ asymmetric-distance scan against the smallest-id query
        "knn_pq_adc": _knn_pq_adc_sql(
            M=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, subdim=_PQ_SUBDIM, topk=5
        ),
        # gains/lift at the ten score-decile thresholds (whole tie groups)
        "gains_curve_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id, floor(q.p * 1e6 + 0.5)::bigint AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
vc AS (SELECT p6, count(*)::bigint AS c, sum(y)::bigint AS pos
       FROM lab GROUP BY p6),
o AS (SELECT p6, sum(c) OVER (ORDER BY p6 DESC) AS cum,
             sum(pos) OVER (ORDER BY p6 DESC) AS cumpos FROM vc),
t AS (SELECT count(*)::bigint AS n, sum(y)::bigint AS npos FROM lab),
dd AS (SELECT unnest(generate_series(1, 10)) AS d),
th AS (SELECT dd.d, max(o.p6) AS thr
       FROM dd CROSS JOIN t JOIN o ON o.cum >= (t.n * dd.d + 9) // 10
       GROUP BY dd.d),
sel AS (SELECT th.d, th.thr, o.cum AS n_sel, o.cumpos AS pos_sel
        FROM th JOIN o ON o.p6 = th.thr)
SELECT d::bigint AS decile, thr::bigint AS p6_threshold,
       n_sel::bigint AS n_selected, pos_sel::bigint AS n_pos_selected,
       round(pos_sel::double / t.npos::double, 6) + 0.0 AS recall,
       round(pos_sel::double / n_sel::double, 6) + 0.0 AS precision,
       round((pos_sel::double / n_sel::double)
             / (t.npos::double / t.n::double), 6) + 0.0 AS lift
FROM sel, t ORDER BY d
""",
        # Hill estimator over the 5% purchase-value tail
        "hill_tail_events": """
WITH p AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
vc AS (SELECT cents, count(*)::bigint AS c FROM p WHERE cents > 0 GROUP BY cents),
o AS (SELECT cents, c, sum(c) OVER (ORDER BY cents DESC) AS cum FROM vc),
t AS (SELECT sum(c)::bigint AS n, ((sum(c) + 19) // 20)::bigint AS k FROM vc),
tk AS (SELECT o.cents, least(o.c, t.k - (o.cum - o.c)) AS taken
       FROM o, t WHERE o.cum - o.c < t.k),
sl AS (SELECT sum(taken * ln(cents::double)) AS sum_ln FROM tk),
x1 AS (SELECT max(cents)::bigint AS xk1 FROM o, t WHERE o.cum >= t.k + 1)
SELECT t.n AS n_purchases, t.k AS k_tail, x1.xk1 AS xk1_cents,
       round(t.k::double / (sl.sum_ln - t.k * ln(x1.xk1::double)), 6) + 0.0
         AS hill_alpha
FROM t, sl, x1
""",
        # cf/df burstiness, top-20 among df ≥ 5
        "term_burstiness": f"""
WITH tok AS ({_TOK}),
dt AS (SELECT doc_id, term, count(*)::bigint AS c FROM tok GROUP BY 1, 2),
t AS (SELECT term, sum(c)::bigint AS cf, count(*)::bigint AS df
      FROM dt GROUP BY term)
SELECT term, cf, df, round(cf::double / df::double, 6) + 0.0 AS burstiness
FROM t WHERE df >= 5
ORDER BY cf::double / df::double DESC, term LIMIT 20
""",
        # argmax-transition predictor scored from its own count matrix
        "markov_next_event_accuracy": """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_type) AS prev
           FROM events),
cm AS (SELECT prev AS p, event_type AS nx, count(*)::bigint AS n
       FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
pr AS (SELECT p, nx FROM (
         SELECT p, nx,
                row_number() OVER (PARTITION BY p ORDER BY n DESC, nx ASC) AS rn
         FROM cm) WHERE rn = 1),
t AS (SELECT sum(n)::bigint AS tot, count(DISTINCT p)::bigint AS np FROM cm),
c AS (SELECT coalesce(sum(cm.n), 0)::bigint AS corr
      FROM cm JOIN pr ON cm.p = pr.p AND cm.nx = pr.nx)
SELECT t.tot AS n_transitions, t.np AS n_prev_types, c.corr AS n_correct,
       round(c.corr::double / t.tot::double, 6) + 0.0 AS accuracy
FROM t, c
""",
        # 64-bin histogram estimate vs the exact order statistic
        "quantile_sketch_error": """
WITH lohi AS (SELECT min(n_chars)::double AS lo,
                     CASE WHEN max(n_chars) - min(n_chars) = 0 THEN 1.0
                          ELSE max(n_chars)::double - min(n_chars)::double END AS w
              FROM documents),
bins AS (SELECT least(floor((n_chars::double - lo) / w * 64)::bigint, 63) AS bin
         FROM documents, lohi),
hist AS (SELECT bin, count(*)::bigint AS cnt FROM bins GROUP BY bin),
cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS c FROM hist),
n AS (SELECT count(*)::bigint AS n FROM documents),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
tgt AS (SELECT q, greatest(1, ceil(q * n)::bigint) AS target FROM qs, n),
hit AS (SELECT t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.c >= t.target GROUP BY t.q, t.target),
fin AS (SELECT h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2 WHERE c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE bin = h.bin) AS cnt
        FROM hit h),
ap AS (SELECT q, lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 64 AS v
       FROM fin, lohi),
r AS (SELECT n_chars::bigint AS v, row_number() OVER (ORDER BY n_chars) AS rn
      FROM documents),
ex AS (SELECT t.q, min(r.v)::double AS ev FROM tgt t JOIN r ON r.rn = t.target
       GROUP BY t.q)
SELECT ap.q::double AS q, ex.ev AS exact, round(ap.v, 6) + 0.0 AS approx,
       round(ap.v - ex.ev, 6) + 0.0 AS abs_err,
       round((ap.v - ex.ev) / ex.ev, 6) + 0.0 AS rel_err
FROM ap JOIN ex USING (q) ORDER BY q
""",
        # hub-core density among nodes with degree > 3
        "rich_club": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (SELECT node, count(*)::bigint AS d
        FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
        GROUP BY node),
club AS (SELECT node FROM deg WHERE d > 3),
ec AS (SELECT count(*)::bigint AS e FROM ce
       WHERE a IN (SELECT node FROM club) AND b IN (SELECT node FROM club)),
m AS (SELECT count(*)::bigint AS m FROM club)
SELECT 3::bigint AS k, m.m AS n_club, ec.e AS n_club_edges,
       CASE WHEN m.m > 1
            THEN round(2.0 * ec.e / (m.m * (m.m - 1)), 6) + 0.0
            ELSE 0.0 END AS rich_club_phi
FROM m, ec
""",
        # truncated prefix-form RBO between the BM25 and QLD rankings
        "rbo_bm25_qld": f"""
WITH {_BM25_SCORES},
ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
qcoll AS (SELECT sum(doc_len)::double AS ct FROM dl),
qcf AS (SELECT term, count(*)::double AS cf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY term),
qm AS (SELECT count(*)::bigint AS m FROM qcf),
qtf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
qsp AS (SELECT qtf.doc_id,
               sum(ln(1.0 + qtf.tf / (300.0 * (qcf.cf / qcoll.ct)))) AS sp
        FROM qtf JOIN qcf USING (term), qcoll GROUP BY qtf.doc_id),
qsc AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM qm) * ln(300.0 / (dl.doc_len + 300.0))
                 AS score
        FROM qsp JOIN dl USING (doc_id)),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM qsc ORDER BY score DESC, doc_id ASC LIMIT 20),
ab AS (SELECT ra.r AS x, rb.r AS y FROM ra JOIN rb USING (doc_id)),
d AS (SELECT unnest(generate_series(1, 20)) AS i),
ov AS (SELECT d.i,
              (SELECT count(*) FROM ab WHERE ab.x <= d.i AND ab.y <= d.i) AS o
       FROM d)
SELECT 20::bigint AS depth, 0.9 AS p,
       (SELECT count(*) FROM ab)::bigint AS n_common,
       round(sum(0.1 * power(0.9, i - 1) * o / i), 6) + 0.0 AS rbo
FROM ov
""",
        # entropy rate / perplexity of the event-type chain
        "markov_entropy_rate": _markov_entropy_sql(5),
        # Heaps' law: vocab vs prefix size at ten id-value cuts + OLS fit
        "heaps_law_fit": f"""
WITH tok AS ({_TOK}),
ft AS (SELECT term, min(doc_id) AS fid FROM tok GROUP BY term),
mm AS (SELECT min(doc_id)::bigint AS lo, max(doc_id)::bigint AS hi FROM documents),
dd AS (SELECT unnest(generate_series(1, 10)) AS d),
cut AS (SELECT dd.d, (mm.lo + ((mm.hi - mm.lo) * dd.d) // 10)::bigint AS t
        FROM dd, mm),
pts AS (SELECT c.d, c.t,
               (SELECT count(*) FROM documents WHERE doc_id <= c.t)::bigint AS n,
               (SELECT count(*) FROM ft WHERE fid <= c.t)::bigint AS v
        FROM cut c),
l AS (SELECT d, n, v, ln(n::double) AS x, ln(v::double) AS y FROM pts),
m AS (SELECT avg(x) AS mx, avg(y) AS my FROM l),
f AS (SELECT sum((l.x - m.mx) * (l.y - m.my)) / sum((l.x - m.mx) * (l.x - m.mx))
        AS beta FROM l, m)
SELECT l.d, l.n AS n_docs, l.v AS vocab,
       round((SELECT beta FROM f), 6) + 0.0 AS heaps_beta,
       round(exp((SELECT my FROM m) - (SELECT beta FROM f) * (SELECT mx FROM m)),
             6) + 0.0 AS heaps_k
FROM l ORDER BY l.d
""",
        # cumulative revenue share of the poorest ⌈n·d/10⌉ purchasers
        "revenue_lorenz": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS rn,
             sum(c) OVER (ORDER BY c, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM u),
t AS (SELECT count(*)::bigint AS n, sum(c)::bigint AS tot FROM u),
dd AS (SELECT unnest(generate_series(1, 10)) AS d)
SELECT dd.d AS decile, ((t.n * dd.d + 9) // 10)::bigint AS n_users_cut,
       r.cum::bigint AS cum_cents,
       round(r.cum::double / t.tot::double, 6) + 0.0 AS cum_share
FROM dd CROSS JOIN t JOIN r ON r.rn = (t.n * dd.d + 9) // 10
ORDER BY dd.d
""",
        # partition-pruned read of the lang=es hive directory
        "partitioned_write_roundtrip": """
SELECT 'es' AS lang, count(*)::bigint AS n_docs,
       sum(n_chars)::bigint AS sum_chars
FROM documents WHERE lang = 'es'
""",
        # 64-perm signature-agreement estimate vs exact shingle Jaccard
        "minhash_estimate_error": f"""
WITH {_minhash_chain_ctes()},
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id),
est AS (SELECT c.id_a, c.id_b,
               sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END)::bigint AS m
        FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a
                    JOIN sigs sb ON sb.doc_id = c.id_b AND sb.p = sa.p
        GROUP BY 1, 2),
shw AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w2 || ' ' || lead(t, 2) OVER w2 AS shingle
  FROM tok WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w2 IS NOT NULL),
dsh AS (SELECT DISTINCT doc_id, shingle FROM shw),
ssz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN dsh a ON a.doc_id = c.id_a
  JOIN dsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b),
ex AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN coalesce(za.sz, 0) + coalesce(zb.sz, 0) - coalesce(p.i, 0) = 0
              THEN 1.0
              ELSE coalesce(p.i, 0)::double
                   / (coalesce(za.sz, 0) + coalesce(zb.sz, 0) - coalesce(p.i, 0))
         END AS j
  FROM cand c
  LEFT JOIN pint p ON p.id_a = c.id_a AND p.id_b = c.id_b
  LEFT JOIN ssz za ON za.doc_id = c.id_a
  LEFT JOIN ssz zb ON zb.doc_id = c.id_b)
SELECT e.id_a, e.id_b,
       round(e.m / 64.0, 6) + 0.0 AS est_jaccard,
       round(x.j, 6) + 0.0 AS exact_jaccard,
       round(abs(e.m / 64.0 - x.j), 6) + 0.0 AS abs_err
FROM est e JOIN ex x USING (id_a, id_b) ORDER BY id_a, id_b
""",
        # support / directed confidences / lift over 30-min sessions
        "assoc_rules_sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
flag AS (
  SELECT user_id, t, event_type,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_type)),
sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_type
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
tot AS (SELECT count(*)::bigint AS s
        FROM (SELECT DISTINCT user_id, sid FROM sess)),
sing AS (SELECT event_type, count(*)::bigint AS n FROM st GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM st a JOIN st b USING (user_id, sid)
      WHERE a.event_type < b.event_type),
jc AS (SELECT type_a, type_b, count(*)::bigint AS n FROM p GROUP BY 1, 2)
SELECT jc.type_a, jc.type_b, jc.n AS n_both, sa.n AS n_a, sb.n AS n_b,
       tot.s AS n_sessions,
       round(jc.n::double / tot.s::double, 6) + 0.0 AS support,
       round(jc.n::double / sa.n::double, 6) + 0.0 AS conf_a_to_b,
       round(jc.n::double / sb.n::double, 6) + 0.0 AS conf_b_to_a,
       round(jc.n::double * tot.s::double / (sa.n::double * sb.n::double), 6)
         + 0.0 AS lift
FROM jc JOIN sing sa ON sa.event_type = jc.type_a
        JOIN sing sb ON sb.event_type = jc.type_b
        CROSS JOIN tot
ORDER BY jc.type_a, jc.type_b
""",
        # per-column profiling: rows, exact distinct, nulls
        "profile_orders": """
SELECT 'o_custkey' AS column_name, count(*)::bigint AS n_rows,
       count(DISTINCT o_custkey)::bigint AS n_distinct,
       (count(*) - count(o_custkey))::bigint AS n_null FROM orders
UNION ALL
SELECT 'o_orderdate', count(*)::bigint, count(DISTINCT o_orderdate)::bigint,
       (count(*) - count(o_orderdate))::bigint FROM orders
UNION ALL
SELECT 'o_orderkey', count(*)::bigint, count(DISTINCT o_orderkey)::bigint,
       (count(*) - count(o_orderkey))::bigint FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*)::bigint,
       count(DISTINCT o_orderpriority)::bigint,
       (count(*) - count(o_orderpriority))::bigint FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*)::bigint, count(DISTINCT o_orderstatus)::bigint,
       (count(*) - count(o_orderstatus))::bigint FROM orders
UNION ALL
SELECT 'o_totalprice', count(*)::bigint, count(DISTINCT o_totalprice)::bigint,
       (count(*) - count(o_totalprice))::bigint FROM orders
ORDER BY column_name
""",
        # per-label cosine between even-id and odd-id mean vectors
        "label_centroid_drift": """
WITH e AS (SELECT vec_id, label, i.i AS dim, embedding[i.i]::double AS v
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
cnt AS (SELECT label, (vec_id % 2)::bigint AS par, count(*)::bigint AS n
        FROM embeddings GROUP BY 1, 2),
mm AS (SELECT label, (vec_id % 2)::bigint AS par, dim, sum(v) AS sv
       FROM e GROUP BY 1, 2, 3),
mv AS (SELECT mm.label, mm.par, mm.dim, mm.sv / cnt.n AS m
       FROM mm JOIN cnt USING (label, par)),
c AS (SELECT a.label, sum(a.m * b.m) AS dot,
             sqrt(sum(a.m * a.m)) AS na, sqrt(sum(b.m * b.m)) AS nb
      FROM mv a JOIN mv b ON a.label = b.label AND a.dim = b.dim
                AND a.par = 0 AND b.par = 1
      GROUP BY a.label)
SELECT c.label::bigint AS label, ce.n AS n_even, co.n AS n_odd,
       round(c.dot / (c.na * c.nb), 6) + 0.0 AS cosine
FROM c JOIN cnt ce ON ce.label = c.label AND ce.par = 0
       JOIN cnt co ON co.label = c.label AND co.par = 1
ORDER BY label
""",
        # exact-dup share per source feed
        "dup_rate_by_source": """
SELECT source, count(*)::bigint AS n_docs,
       count(DISTINCT text)::bigint AS n_unique,
       round(1.0 - count(DISTINCT text)::double / count(*)::double, 6) + 0.0
         AS dup_rate
FROM documents GROUP BY source ORDER BY source
""",
        # share of 8-token windows occurring more than once corpus-wide
        "ngram_dup_rate": """
WITH tokl AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks FROM documents),
w AS (SELECT unnest(generate_series(1, len(toks) - 7)) AS i, toks
      FROM tokl WHERE len(toks) >= 8),
gr AS (SELECT array_to_string(toks[i:i+7], ' ') AS gram FROM w),
c AS (SELECT gram, count(*)::bigint AS n FROM gr GROUP BY gram),
s AS (SELECT (SELECT count(*) FROM gr)::bigint AS n_windows,
             (SELECT count(*) FROM c)::bigint AS n_distinct,
             (SELECT coalesce(sum(n), 0) FROM c WHERE n > 1)::bigint AS n_dup)
SELECT n_windows, n_distinct, n_dup AS n_dup_windows,
       round(n_dup::double / n_windows::double, 6) + 0.0 AS dup_rate
FROM s
""",
        # month-of-year order volume, exact cents
        "orders_seasonality": """
SELECT month(o_orderdate)::bigint AS month, count(*)::bigint AS n_orders,
       sum(round(o_totalprice * 100)::bigint)::bigint AS cents
FROM orders GROUP BY 1 ORDER BY 1
""",
        # routing replay: range span → posting weights → greedy 2-shard cut
        "shard_balance": f"""
WITH tok AS ({_TOK}),
mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
pd AS (SELECT doc_id,
              least(doc_id // ((mm.mx + 8) // 8), 7)::bigint AS part
       FROM documents, mm),
post AS (SELECT pd.part,
                count(*)::bigint + 1 AS w
         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         JOIN pd USING (doc_id)
         GROUP BY pd.part),
cum AS (SELECT part, w, sum(w) OVER (ORDER BY part) AS acc FROM post),
tot AS (SELECT sum(w)::bigint AS t FROM post),
q0 AS (SELECT min(part) AS q FROM cum, tot WHERE 2 * acc >= t),
sh AS (SELECT pd.doc_id,
              CASE WHEN pd.part <= q0.q THEN 0 ELSE 1 END AS shard_id
       FROM pd, q0)
SELECT shard_id::bigint AS shard_id, count(*)::bigint AS n_docs,
       min(doc_id)::bigint AS min_doc, max(doc_id)::bigint AS max_doc
FROM sh GROUP BY 1 ORDER BY 1
""",
        # SimHash(≤3) vs MinHash-LSH candidate-pair agreement
        "dedup_method_agreement": f"""
WITH {_minhash_chain_ctes()},
mcand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id),
stokh AS (SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
          FROM (SELECT DISTINCT t AS term FROM tok)),
sbits AS (
  SELECT tok.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok JOIN stokh th ON th.term = tok.t
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY tok.doc_id, p.bit, p.pw),
ssig AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
         FROM sbits GROUP BY doc_id),
su AS (SELECT d.doc_id, coalesce(s.v, 0)::ubigint AS uv
       FROM documents d LEFT JOIN ssig s USING (doc_id)),
scand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM su a JOIN su b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.uv, b.uv)) <= 3),
b2 AS (SELECT count(*)::bigint AS nb
       FROM (SELECT * FROM scand INTERSECT SELECT * FROM mcand)),
un AS (SELECT count(*)::bigint AS nu
       FROM (SELECT * FROM scand UNION SELECT * FROM mcand))
SELECT (SELECT count(*) FROM scand)::bigint AS n_simhash_pairs,
       (SELECT count(*) FROM mcand)::bigint AS n_minhash_pairs,
       b2.nb AS n_both,
       CASE WHEN un.nu > 0
            THEN round(b2.nb::double / un.nu::double, 6) + 0.0
            ELSE 1.0 END AS agreement_jaccard
FROM b2, un
""",
        # Chapman estimator over the two timeline halves
        "capture_recapture_users": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id)
SELECT sum(f)::bigint AS n_first, sum(s)::bigint AS n_second,
       sum(CASE WHEN f = 1 AND s = 1 THEN 1 ELSE 0 END)::bigint AS n_both,
       count(*)::bigint AS n_observed,
       round((sum(f) + 1)::double * (sum(s) + 1)::double
             / (sum(CASE WHEN f = 1 AND s = 1 THEN 1 ELSE 0 END) + 1)::double
             - 1.0, 6) + 0.0 AS chapman_estimate
FROM u
""",
        # method-of-moments NB fit of events-per-user
        "negbin_overdispersion": """
WITH u AS (SELECT user_id, count(*)::bigint AS n FROM events GROUP BY user_id),
s AS (SELECT count(*)::bigint AS k, sum(n)::bigint AS s1,
             sum(n * n)::bigint AS s2 FROM u),
m AS (SELECT k, s1::double / k::double AS mean,
             s2::double / k::double
               - (s1::double / k::double) * (s1::double / k::double) AS var
      FROM s)
SELECT k AS n_users, round(mean, 6) + 0.0 AS mean_events,
       round(var, 6) + 0.0 AS var_events,
       round(var / mean, 6) + 0.0 AS vmr,
       round(CASE WHEN var > mean THEN mean * mean / (var - mean)
                  ELSE 0.0 END, 6) + 0.0 AS nb_r,
       round(CASE WHEN var > mean THEN mean / var ELSE 0.0 END, 6) + 0.0 AS nb_p
FROM m
""",
        # tiered serving: head query = full-tier BM25 top-10 + routing counters
        "bm25_tiered_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       'full' AS route, 1::bigint AS full_served, 1::bigint AS pruned_served
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # BM25 over the corpus with the partition-0 edit applied first
        "index_update_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
mdocs AS (SELECT doc_id,
                 CASE WHEN doc_id < (mm.mx + 8) // 8 AND doc_id % 97 = 0
                      THEN text || ' spark' ELSE text END AS text
          FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM mdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # ⌊log2 df⌋ posting-list-size histogram, recomputed from raw text
        "df_histogram": f"""
WITH tok AS ({_TOK}),
dfs AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term),
b AS (SELECT (length(bin(df)) - 1)::bigint AS bucket, df FROM dfs)
SELECT bucket, count(*)::bigint AS n_terms, sum(df)::bigint AS n_postings
FROM b GROUP BY bucket ORDER BY bucket
""",
        # Σdf vs Σmin(df, 32): the global top-m prune cut
        "prune_report": f"""
WITH tok AS ({_TOK}),
dfs AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term)
SELECT count(*)::bigint AS n_terms_full, count(*)::bigint AS n_terms_pruned,
       sum(df)::bigint AS postings_full,
       sum(least(df, 32))::bigint AS postings_pruned,
       round(sum(least(df, 32))::double / sum(df)::double, 6) + 0.0 AS kept_ratio
FROM dfs
""",
        # resharded index: same modified corpus, rank-identical + shard count
        "reshard_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
mdocs AS (SELECT doc_id,
                 CASE WHEN doc_id < (mm.mx + 8) // 8 AND doc_id % 97 = 0
                      THEN text || ' spark' ELSE text END AS text
          FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM mdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 4::bigint AS n_shards
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # continuous-crawl lifecycle: delete+compact+NRT-add of the
        # recrawled docs must equal a batch build of the final state,
        # with the changed docs' id remap replayed arithmetically
        "incremental_crawl_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
fin AS (SELECT CASE WHEN doc_id % 50 = 0
                    THEN mm.mx + 1 + doc_id // 50
                    ELSE doc_id END AS doc_id,
               text
        FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM fin").lstrip().rstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT count(*) FROM documents WHERE doc_id % 50 = 0)::bigint
         AS n_changed
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # zone-map shard pruning over the source-clustered remap: BM25
        # filtered to src0 + the posting-balanced 2-shard split replay
        "bm25_clustered_prune": f"""
WITH remap AS (
  SELECT row_number() OVER (ORDER BY source, doc_id) - 1 AS doc_id,
         text, source
  FROM documents
),
{_BM25_SCORES.replace("FROM documents", "FROM remap").lstrip().rstrip()},
mm AS (SELECT max(doc_id)::bigint AS mx FROM remap),
pd AS (SELECT doc_id, source,
              least(doc_id // ((mm.mx + 8) // 8), 7)::bigint AS part
       FROM remap, mm),
post AS (SELECT pd.part, count(*)::bigint + 1 AS w
         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         JOIN pd USING (doc_id)
         GROUP BY pd.part),
cum AS (SELECT part, w, sum(w) OVER (ORDER BY part) AS acc FROM post),
tot AS (SELECT sum(w)::bigint AS t FROM post),
q0 AS (SELECT min(part) AS q FROM cum, tot WHERE 2 * acc >= t),
scanned AS (SELECT count(DISTINCT CASE WHEN pd.part <= q0.q THEN 0 ELSE 1 END)::bigint AS n
            FROM pd, q0 WHERE pd.source = 'src0')
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT n FROM scanned) AS n_shards_scanned
FROM scores
WHERE doc_id IN (SELECT doc_id FROM remap WHERE source = 'src0')
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # politeness fetch schedule: slot = per-host url rank, wave order
        "fetch_schedule": """
WITH u AS (SELECT DISTINCT
             'https://' || source || '.example.org/doc/'
               || lpad(doc_id::varchar, 8, '0') AS url,
             source || '.example.org' AS host
           FROM documents),
s AS (SELECT url, host,
             (row_number() OVER (PARTITION BY host ORDER BY url) - 1)::bigint
               AS slot
      FROM u)
SELECT url, host, slot FROM s
ORDER BY slot, host, url LIMIT 60
""",
        # CORI collection selection: per-source-group df/cw T·I beliefs
        "cori_collection_ranking": """
WITH g AS (SELECT doc_id, text,
                  (CAST(substr(source, 4) AS INT) % 3) AS coll
           FROM documents),
tok AS (SELECT coll, doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '')) AS term
        FROM g),
cw AS (SELECT coll, count(*)::double AS cw FROM tok GROUP BY coll),
avgcw AS (SELECT avg(cw) AS a FROM cw),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
df AS (SELECT coll, term, count(DISTINCT doc_id)::double AS df
       FROM tok WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
cft AS (SELECT term, count(*)::double AS cf FROM df WHERE df > 0
        GROUP BY term),
ct AS (SELECT cw.coll, q.term FROM cw CROSS JOIN q),
bel AS (SELECT ct.coll,
               0.4 + 0.6
                 * (coalesce(df.df, 0)
                    / (coalesce(df.df, 0) + 50.0
                       + 150.0 * cw.cw / avgcw.a))
                 * (CASE WHEN cft.cf IS NULL THEN 0.0
                         ELSE ln((3 + 0.5) / cft.cf) / ln(4.0) END) AS b
        FROM ct
        JOIN cw USING (coll)
        LEFT JOIN df ON df.coll = ct.coll AND df.term = ct.term
        LEFT JOIN cft ON cft.term = ct.term, avgcw),
s AS (SELECT coll, round(sum(b) / 3.0, 6) + 0.0 AS belief
      FROM bel GROUP BY coll)
SELECT coll::bigint AS collection, belief,
       row_number() OVER (ORDER BY belief DESC, coll ASC)::bigint AS rank
FROM s ORDER BY collection
""",
        # redirect terminals: 6 materialized pointer-doubling self-joins
        "redirect_terminals": """
WITH m0 AS MATERIALIZED (
  SELECT doc_id AS s, doc_id // 2 AS d FROM documents
  WHERE doc_id % 3 = 0 AND doc_id > 0),
m1 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m0 a LEFT JOIN m0 b ON b.s = a.d),
m2 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m1 a LEFT JOIN m1 b ON b.s = a.d),
m3 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m2 a LEFT JOIN m2 b ON b.s = a.d),
m4 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m3 a LEFT JOIN m3 b ON b.s = a.d),
m5 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m4 a LEFT JOIN m4 b ON b.s = a.d),
m6 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m5 a LEFT JOIN m5 b ON b.s = a.d),
res AS (SELECT coalesce(m6.d, documents.doc_id) AS terminal_id
        FROM documents LEFT JOIN m6 ON m6.s = documents.doc_id)
SELECT terminal_id, count(*)::bigint AS n_docs
FROM res GROUP BY 1
ORDER BY n_docs DESC, terminal_id ASC LIMIT 20
""",
        # team-draft interleave of BM25 vs QLD top-10s (coin = splitmix)
        "team_draft_interleave": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
ra AS MATERIALIZED (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cfq AS (SELECT term, count(*)::double AS cf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY term),
mq AS (SELECT count(*)::bigint AS m FROM cfq),
spq AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cfq.cf / coll.ct)))) AS sp
        FROM tf JOIN cfq USING (term), coll
        WHERE tf.term IN (SELECT term FROM q)
        GROUP BY tf.doc_id),
qsc AS (SELECT spq.doc_id,
               spq.sp + (SELECT m FROM mq)
                 * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM spq JOIN dl USING (doc_id)),
rb AS MATERIALIZED (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       FROM qsc ORDER BY score DESC, doc_id ASC LIMIT 10),
{_interleave_sql(10, 7)}
""",
        # clarity score: KL(top-10 uniform-mixture LM || collection LM)
        "query_clarity": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
top10 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
ttok AS (SELECT doc_id, term FROM tok
         WHERE doc_id IN (SELECT doc_id FROM top10)),
dl2 AS (SELECT doc_id, count(*)::double AS dl FROM ttok GROUP BY doc_id),
ptf AS (SELECT t.term, sum(t.cnt / (10.0 * dl2.dl)) AS pq
        FROM (SELECT doc_id, term, count(*)::double AS cnt
              FROM ttok GROUP BY 1, 2) t
        JOIN dl2 USING (doc_id)
        GROUP BY t.term),
cf AS (SELECT term, count(*)::double AS c FROM tok GROUP BY term),
tot AS (SELECT count(*)::double AS n FROM tok)
SELECT round(sum(pq * log2(pq / (c / n))), 6) + 0.0 AS clarity,
       count(*)::bigint AS n_vocab, 10::bigint AS n_docs
FROM ptf JOIN cf USING (term), tot
""",
        # best 30-token passage per top-10 doc: zipped unnest positions,
        # RANGE-frame hit count per candidate start, argmax w/ early tie
        "passage_best_window": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
top10 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
tokp AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM top10))
),
hits AS (SELECT doc_id, pos FROM tokp
         WHERE term IN ('join', 'merge', 'spark')),
wnd AS (SELECT doc_id, pos,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                              RANGE BETWEEN CURRENT ROW AND 29 FOLLOWING)
                 AS n
        FROM hits),
best AS (SELECT doc_id, pos AS pass_start, n AS pass_hits,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, pos ASC) AS rn
         FROM wnd)
SELECT t.rank, t.doc_id,
       b.pass_start::bigint AS pass_start, b.pass_hits::bigint AS pass_hits
FROM top10 t JOIN best b USING (doc_id)
WHERE b.rn = 1
ORDER BY t.rank
""",
        # extended grammar: +required membership, negated exact phrase
        "query_string_extended": f"""
WITH {_BM25_SCORES.replace(
    "unnest(['join','merge','spark'])",
    "unnest(['batch','join','value'])",
).lstrip().rstrip()},
req AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
ban AS (SELECT doc_id FROM documents WHERE instr(text, 'spark merge') > 0)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores
WHERE doc_id IN (SELECT doc_id FROM req)
  AND doc_id NOT IN (SELECT doc_id FROM ban)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # full query grammar: phrase (instr), per-shard posting negation
        # (tokenized NOT-IN), keyword exclusion, full-corpus BM25 stats
        "query_string_search": f"""
WITH {_BM25_SCORES.replace(
    "unnest(['join','merge','spark'])",
    "unnest(['batch','join','merge','spark','value'])",
).lstrip().rstrip()},
neg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
cand AS (SELECT doc_id FROM documents
         WHERE instr(text, 'spark merge') > 0 AND source <> 'src5')
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores
WHERE doc_id IN (SELECT doc_id FROM cand)
  AND doc_id NOT IN (SELECT doc_id FROM neg)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # NRT adds: main + two delta segments must rank exactly like the
        # batch full-corpus build — the oracle IS the plain BM25 chain
        "nrt_add_search": f"""
WITH {_BM25_SCORES.lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 2::bigint AS n_delta_segments
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # tombstone deletes: full-corpus stats, dead docs filtered AFTER
        # scoring (Lucene live-docs semantics — idf counts deleted docs
        # until compaction); dead = pre-delete top-1 ∪ partition-0 band
        "delete_search": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
mm AS (SELECT ((SELECT max(doc_id) FROM documents) + 8) // 8 AS span),
top1 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 1),
dead AS (
  SELECT doc_id FROM documents, mm WHERE doc_id < mm.span AND doc_id % 5 = 2
  UNION SELECT doc_id FROM top1
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT count(*) FROM dead)::bigint AS n_tombstones
FROM scores WHERE doc_id NOT IN (SELECT doc_id FROM dead)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # post-compaction: the whole BM25 chain (df, N, avgdl) recomputes
        # over the surviving corpus; exactly one partition was rewritten
        "delete_compact_search": f"""
WITH mm AS (SELECT ((SELECT max(doc_id) FROM documents) + 8) // 8 AS span),
sdocs AS (SELECT doc_id, text FROM documents, mm
          WHERE NOT (doc_id < mm.span AND doc_id % 5 = 2)),
{_BM25_SCORES.replace("FROM documents", "FROM sdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 1::bigint AS n_compacted_parts
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # codec variants: bytes change, ranks must not
        "bm25_varint_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_svbyte_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # HLL p=12 estimate vs exact distinct, abs/rel error
        "hll_error_audit": f"""
WITH t AS ({_hll_registers_sql()}),
s AS (SELECT count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz FROM t),
c AS (SELECT (4096 - nz) AS zeros, (4096 - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT zeros, (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 / ssum AS est
      FROM c),
ap AS (SELECT round(CASE WHEN est <= 2.5 * 4096 AND zeros > 0
                    THEN 4096.0 * ln(4096.0 / zeros) ELSE est END, 6) AS est
       FROM e),
ex AS (SELECT count(DISTINCT user_id)::bigint AS n FROM events)
SELECT ex.n AS n_exact, ap.est + 0.0 AS estimate,
       round(abs(ap.est - ex.n), 6) + 0.0 AS abs_err,
       round(abs(ap.est - ex.n) / ex.n, 6) + 0.0 AS rel_err
FROM ex, ap
""",
        # CMS top-3 estimates vs exact counts (overcount ≥ 0 invariant)
        "cms_error_audit": f"""
WITH cms AS ({_cms_heavy_hitters_sql(k=3)}),
ex AS (SELECT event_type, count(*)::bigint AS n FROM events GROUP BY 1)
SELECT cms.event_type, cms.n_est AS cms_count, ex.n AS exact_count,
       (cms.n_est - ex.n)::bigint AS overcount
FROM cms JOIN ex USING (event_type) ORDER BY cms.event_type
""",
        # exhaustive scorer must equal the MaxScore gates
        "bm25_exhaustive_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # trailing-7-day RANGE-frame sum per user, exact cents
        "user_rolling_value_7d": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events)
SELECT event_id, user_id,
       sum(cents) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                        AND CURRENT ROW)::bigint AS cents_7d
FROM e ORDER BY event_id
""",
        # negated keyword filter: two sources excluded inside the shard task
        "bm25_filtered_exclude": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rank,
       s.doc_id, round(s.score, 6) AS score
FROM scores s JOIN documents d USING (doc_id)
WHERE d.source NOT IN ('src0', 'src1')
ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
""",
        # repeated query served from the finished-query cache
        "service_cache_hit": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       1::bigint AS cache_hits, 1::bigint AS cache_misses
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # int8-range scalar quantization codes at four sampled dims
        "sq8_codes": """
WITH dims AS (SELECT unnest([1, 17, 33, 49]) AS dim),
e AS (SELECT vec_id, d.dim, embedding[d.dim]::double AS v
      FROM embeddings, dims d),
b AS (SELECT dim, min(v) AS lo,
             CASE WHEN max(v) - min(v) > 0 THEN max(v) - min(v)
                  ELSE 1.0 END AS w
      FROM e GROUP BY dim),
c AS (SELECT e.vec_id, e.dim,
             least(greatest(CAST(floor((e.v - b.lo) / b.w * 255) AS BIGINT), 0),
                   255) AS code
      FROM e JOIN b USING (dim))
SELECT vec_id,
       max(CASE WHEN dim = 1 THEN code END)::bigint AS code_d1,
       max(CASE WHEN dim = 17 THEN code END)::bigint AS code_d17,
       max(CASE WHEN dim = 33 THEN code END)::bigint AS code_d33,
       max(CASE WHEN dim = 49 THEN code END)::bigint AS code_d49
FROM c GROUP BY vec_id ORDER BY vec_id
""",
        # header-parse round-trip vs the synthesis parameters
        "media_metadata": _media_expected_sql(),
        # windowed RMS over the REAL-decoded PCM, replayed from the
        # signal formula: s(t) = trunc(6000·sin(2πtf/256) + (t·g mod
        # 4000)) as int16, f = i%7+1, g = i%5; FLAC clips (ids 64..95)
        # are lossless re-encodings of recipe i−64
        "audio_features": """
WITH ids0 AS (SELECT unnest(range(0, 96)) AS m),
par AS (SELECT m::bigint AS media_id,
               (CASE WHEN m < 64 THEN m ELSE m - 64 END)::bigint AS i
        FROM ids0),
ts0 AS (SELECT unnest(range(0, 2048)) AS t0),
ts AS (SELECT t0::bigint AS t FROM ts0),
sig AS (SELECT p.media_id, ts.t,
               trunc(6000 * sin(2 * pi() * ts.t * ((p.i % 7) + 1) / 256.0)
                     + ((ts.t * (p.i % 5)) % 4000))::bigint AS s
        FROM par p, ts),
w AS (SELECT media_id, (t // 256)::bigint AS win, sum(s * s)::bigint AS ss,
             count(*)::bigint AS n
      FROM sig GROUP BY 1, 2)
SELECT media_id, win AS "window",
       round(CAST(sqrt(ss::double / n::double) AS FLOAT)::double, 6) + 0.0
         AS rms
FROM w ORDER BY media_id, win
""",
        # lossless-codec image features replayed from the pixel recipe:
        # dims 0-2 channel means, 3-5 channel stds (population), 6-9 the
        # 2×2 luma-grid means (row-major); GIF rows quantize //43·43
        "image_features_lossless": """
WITH ids0 AS (SELECT unnest(range(0, 96)) AS m),
par AS (SELECT m::bigint AS media_id, (m % 32)::bigint AS i,
               (m >= 64) AS quant FROM ids0),
xs0 AS (SELECT unnest(range(0, 24)) AS x),
ys0 AS (SELECT unnest(range(0, 16)) AS y),
px0 AS (SELECT p.media_id, p.quant, x.x::bigint AS x, y.y::bigint AS y,
               ((x.x * 255 // 23) + p.i * 7) % 256 AS r0,
               ((y.y * 255 // 15) + p.i * 13) % 256 AS g0,
               (((x.x + y.y) * 255 // 38) + p.i * 29) % 256 AS b0
        FROM par p, xs0 x, ys0 y),
px AS (SELECT media_id, x, y,
              (CASE WHEN quant THEN (r0 // 43) * 43 ELSE r0 END)::bigint AS r,
              (CASE WHEN quant THEN (g0 // 43) * 43 ELSE g0 END)::bigint AS g,
              (CASE WHEN quant THEN (b0 // 43) * 43 ELSE b0 END)::bigint AS b
       FROM px0),
mn AS (SELECT media_id,
              sum(r)::double / 384.0 AS mr, sum(g)::double / 384.0 AS mg,
              sum(b)::double / 384.0 AS mb
       FROM px GROUP BY media_id),
sd AS (SELECT px.media_id,
              sqrt(sum((px.r - mn.mr) * (px.r - mn.mr)) / 384.0) AS sr,
              sqrt(sum((px.g - mn.mg) * (px.g - mn.mg)) / 384.0) AS sg,
              sqrt(sum((px.b - mn.mb) * (px.b - mn.mb)) / 384.0) AS sb
       FROM px JOIN mn USING (media_id) GROUP BY px.media_id),
lu AS (SELECT media_id, (y * 2) // 16 AS gy, (x * 2) // 24 AS gx,
              sum(r * 0.299 + g * 0.587 + b * 0.114)
                / count(*) AS gm
       FROM px GROUP BY 1, 2, 3),
f AS (
  SELECT media_id, 0::bigint AS dim, mr AS v FROM mn
  UNION ALL SELECT media_id, 1, mg FROM mn
  UNION ALL SELECT media_id, 2, mb FROM mn
  UNION ALL SELECT media_id, 3, sr FROM sd
  UNION ALL SELECT media_id, 4, sg FROM sd
  UNION ALL SELECT media_id, 5, sb FROM sd
  UNION ALL SELECT media_id, (6 + gy * 2 + gx)::bigint, gm FROM lu)
SELECT media_id, dim, round(CAST(v AS FLOAT)::double, 6) + 0.0 AS val
FROM f ORDER BY media_id, dim
""",
        # DC-only baseline-JPEG decode replayed as pure arithmetic over
        # the screened flat-tile params (see _image_features_jpeg_sql)
        "image_features_jpeg": _image_features_jpeg_sql(),
        # MJPEG-AVI demux + sampled-frame JPEG decode → integer sums
        "video_frames_mjpeg": _video_frames_mjpeg_sql(),
        # 4-evenly sampled frames (0/3/6/9 of 12) of PPM/GIF videos:
        # exact channel sums from r=(x·11+f·17+i)%256, g=(y·7+f·29)%256,
        # b=(x+y+f+i)%256 over 16×12, GIF rows quantized //43·43;
        # ts = 480·f//12
        "video_frames_lossless": """
WITH ids0 AS (SELECT unnest(range(0, 48)) AS m),
par AS (SELECT m::bigint AS media_id,
               (CASE WHEN m < 32 THEN m ELSE m - 32 END)::bigint AS i,
               (m >= 32) AS quant FROM ids0),
fr0 AS (SELECT unnest([0, 3, 6, 9]) AS f),
xs0 AS (SELECT unnest(range(0, 16)) AS x),
ys0 AS (SELECT unnest(range(0, 12)) AS y),
px0 AS (SELECT p.media_id, p.quant, fr0.f::bigint AS f,
               (x.x * 11 + fr0.f * 17 + p.i) % 256 AS r0,
               (y.y * 7 + fr0.f * 29) % 256 AS g0,
               (x.x + y.y + fr0.f + p.i) % 256 AS b0
        FROM par p, fr0, xs0 x, ys0 y),
px AS (SELECT media_id, f,
              (CASE WHEN quant THEN (r0 // 43) * 43 ELSE r0 END)::bigint AS r,
              (CASE WHEN quant THEN (g0 // 43) * 43 ELSE g0 END)::bigint AS g,
              (CASE WHEN quant THEN (b0 // 43) * 43 ELSE b0 END)::bigint AS b
       FROM px0)
SELECT media_id, f AS frame_idx, (480 * f // 12)::bigint AS ts_ms,
       sum(r)::bigint AS sum_r, sum(g)::bigint AS sum_g,
       sum(b)::bigint AS sum_b
FROM px GROUP BY media_id, f ORDER BY media_id, f
""",
        # L1 gap between successive round-6 PageRank vectors
        "pagerank_convergence": _pagerank_convergence_sql(5, 0.85),
        # windowed funnel: each step within 1h of the previous
        "funnel_within_1h": """
WITH e1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
e2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN e1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > e1.t1
    AND e.ts <= e1.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id),
e3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN e2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > e2.t2
    AND e.ts <= e2.t2 + INTERVAL 1 HOUR
  GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       (CASE WHEN e3.user_id IS NOT NULL THEN 3
             WHEN e2.user_id IS NOT NULL THEN 2
             WHEN e1.user_id IS NOT NULL THEN 1
             ELSE 0 END)::bigint AS steps_completed
FROM u
LEFT JOIN e1 USING (user_id)
LEFT JOIN e2 USING (user_id)
LEFT JOIN e3 USING (user_id)
ORDER BY u.user_id
""",
        # keep the two newest versions per source, ranked
        "top2_versions_per_source": """
SELECT source, rn::bigint AS version_rank, doc_id, version FROM (
  SELECT d.source, d.doc_id,
         concat(d.doc_id % 4, '.', d.doc_id % 10,
                CASE WHEN d.doc_id % 3 = 0 THEN '~rc1' ELSE '' END) AS version,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY d.doc_id % 4 DESC, d.doc_id % 10 DESC,
                    CASE WHEN d.doc_id % 3 = 0 THEN 0 ELSE 1 END DESC,
                    d.doc_id DESC) AS rn
  FROM documents d) WHERE rn <= 2
ORDER BY source, rn
""",
        # KM survival of time-to-first-purchase, never-buyers censored
        "kaplan_meier_churn": """
WITH ul AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS fp
            FROM events GROUP BY 1),
u AS (SELECT user_id,
             CASE WHEN fp IS NOT NULL THEN (fp - f) // 86400000000
                  ELSE (l - f) // 86400000000 END AS dur,
             CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ul),
dt AS (SELECT dur AS t, count(*)::bigint AS d FROM u WHERE ev = 1 GROUP BY dur),
rk AS (SELECT dt.t, dt.d,
              (SELECT count(*) FROM u WHERE u.dur >= dt.t)::bigint AS n
       FROM dt)
SELECT t::bigint AS t_days, n AS n_at_risk, d AS n_events,
       CASE WHEN max(CASE WHEN d >= n THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE round(exp(sum(CASE WHEN d < n
                                    THEN ln(1.0 - d::double / n::double)
                                    ELSE 0.0 END)
                           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
                 + 0.0
       END AS survival
FROM rk ORDER BY t
""",
        # two-proportion z between the user-parity arms
        "ab_test_conversion": """
WITH u AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
           FROM events GROUP BY user_id),
s AS (SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::bigint AS na,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::bigint AS nb,
             sum(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END)::bigint AS ca,
             sum(CASE WHEN user_id % 2 = 1 THEN c ELSE 0 END)::bigint AS cb
      FROM u),
m AS (SELECT na, nb, ca, cb,
             ca::double / na::double AS pa, cb::double / nb::double AS pb,
             (ca + cb)::double / (na + nb)::double AS pp
      FROM s)
SELECT na AS n_a, nb AS n_b, ca AS conv_a, cb AS conv_b,
       round(pa, 6) + 0.0 AS p_a, round(pb, 6) + 0.0 AS p_b,
       CASE WHEN pp > 0 AND pp < 1
            THEN round((pa - pb) / sqrt(pp * (1.0 - pp)
                 * (1.0 / na + 1.0 / nb)), 6) + 0.0
            ELSE 0.0 END AS z_stat
FROM m
""",
        # Holt double-exponential smoothing, dyadic α=1/2 β=1/4
        "holt_forecast_daily": f"""
WITH RECURSIVE dc AS ({_DAILY_SQL}),
o AS (SELECT n, row_number() OVER (ORDER BY day) AS i FROM dc),
h(i, l, b) AS (
  SELECT 1::bigint,
         (SELECT n::double FROM o WHERE i = 1),
         (SELECT n::double FROM o WHERE i = 2)
           - (SELECT n::double FROM o WHERE i = 1)
  UNION ALL
  SELECT h.i + 1,
         0.5 * o.n + 0.5 * (h.l + h.b),
         0.25 * ((0.5 * o.n + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b
  FROM h JOIN o ON o.i = h.i + 1
  WHERE h.i < (SELECT max(i) FROM o)),
fin AS (SELECT l, b FROM h WHERE i = (SELECT max(i) FROM o)),
hh AS (SELECT unnest([1, 2, 3]) AS hz)
SELECT hh.hz::bigint AS horizon,
       round(fin.l + hh.hz * fin.b, 6) + 0.0 AS forecast,
       round(fin.l, 6) + 0.0 AS level, round(fin.b, 6) + 0.0 AS trend
FROM hh, fin ORDER BY horizon
""",
        # Newman modularity of the LPA partition over the pair set
        "lpa_modularity": f"""
WITH {_lpa_ctes(5)},
m AS (SELECT count(*)::bigint AS m FROM ce),
deg AS (SELECT node, count(*)::bigint AS d FROM und GROUP BY node),
nl AS (SELECT l5.node, l5.lbl, deg.d FROM l5 JOIN deg USING (node)),
mc AS (SELECT a.lbl, count(*)::bigint AS mc
       FROM ce JOIN nl a ON a.node = ce.u
               JOIN nl b ON b.node = ce.v AND b.lbl = a.lbl
       GROUP BY a.lbl),
dc AS (SELECT lbl, sum(d)::bigint AS dsum FROM nl GROUP BY lbl)
SELECT (SELECT count(DISTINCT lbl) FROM l5)::bigint AS n_communities,
       (SELECT m FROM m) AS n_edges,
       round(sum(coalesce(mc.mc, 0)::double / (SELECT m FROM m)
                 - (dc.dsum::double / (2.0 * (SELECT m FROM m)))
                   * (dc.dsum::double / (2.0 * (SELECT m FROM m)))), 6) + 0.0
         AS modularity
FROM dc LEFT JOIN mc USING (lbl)
""",
        # 2×2 mutual information of each quality feature vs the en label
        "feature_mi_quality": f"""
WITH tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it')
                  THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id),
feats AS (
  SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         coalesce(a.n_tokens, 0)::bigint AS f_ntok,
         floor(coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0)
               * 1e6 + 0.5)::bigint AS f_stop,
         floor(coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0)
               * 1e6 + 0.5)::bigint AS f_mlen
  FROM documents d LEFT JOIN agg a USING (doc_id)),
lf AS (SELECT 'n_tokens' AS feature, f_ntok AS v, y FROM feats
       UNION ALL SELECT 'stopword_ratio', f_stop, y FROM feats
       UNION ALL SELECT 'mean_token_len', f_mlen, y FROM feats),
vc AS (SELECT feature, v, count(*)::bigint AS c FROM lf GROUP BY 1, 2),
cum AS (SELECT feature, v, c, sum(c) OVER (PARTITION BY feature ORDER BY v)
          AS cm FROM vc),
nn AS (SELECT feature, sum(c)::bigint AS n FROM vc GROUP BY 1),
thr AS (SELECT c.feature, min(c.v)::bigint AS thr
        FROM cum c JOIN nn USING (feature)
        WHERE c.cm >= (nn.n + 1) // 2 GROUP BY c.feature),
cells AS (SELECT lf.feature,
                 CASE WHEN lf.v > t.thr THEN 1 ELSE 0 END AS x, lf.y,
                 count(*)::bigint AS c
          FROM lf JOIN thr t USING (feature) GROUP BY 1, 2, 3),
rs AS (SELECT feature, x, sum(c)::bigint AS r FROM cells GROUP BY 1, 2),
cs AS (SELECT feature, y, sum(c)::bigint AS s FROM cells GROUP BY 1, 2),
mi AS (SELECT cells.feature,
              sum((cells.c::double / nn.n)
                  * ln(cells.c::double * nn.n / (rs.r::double * cs.s::double)))
                AS mi
       FROM cells JOIN nn USING (feature)
            JOIN rs ON rs.feature = cells.feature AND rs.x = cells.x
            JOIN cs ON cs.feature = cells.feature AND cs.y = cells.y
       WHERE cells.c > 0 GROUP BY cells.feature)
SELECT t.feature, t.thr AS thr_micro,
       coalesce(max(CASE WHEN cells.x = 0 AND cells.y = 0 THEN cells.c END), 0)::bigint AS n00,
       coalesce(max(CASE WHEN cells.x = 0 AND cells.y = 1 THEN cells.c END), 0)::bigint AS n01,
       coalesce(max(CASE WHEN cells.x = 1 AND cells.y = 0 THEN cells.c END), 0)::bigint AS n10,
       coalesce(max(CASE WHEN cells.x = 1 AND cells.y = 1 THEN cells.c END), 0)::bigint AS n11,
       round(max(mi.mi), 6) + 0.0 AS mi
FROM thr t JOIN cells ON cells.feature = t.feature
     JOIN mi ON mi.feature = t.feature
GROUP BY t.feature, t.thr ORDER BY t.feature
""",
        # block-max metadata vs raw-text max tf, top-20 df terms
        "max_tf_audit": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
t AS (SELECT term, count(*)::bigint AS df, max(tf)::bigint AS max_tf
      FROM tf GROUP BY term)
SELECT term, df, max_tf FROM t
ORDER BY df DESC, term LIMIT 20
""",
        # pairwise hash-embed cosine of the BM25 top-10 (45 rows)
        "serp_diversity_ild": f"""
WITH {_BM25_SCORES},
top AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT t2.doc_id, th.h FROM tok t2 JOIN th USING (term)
        WHERE t2.doc_id IN (SELECT doc_id FROM top)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint
                        THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
e32 AS (SELECT vec.doc_id, dim,
               CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double
                 AS val
        FROM vec JOIN nrm USING (doc_id)),
n2 AS (SELECT doc_id, sqrt(sum(val * val)) AS nn FROM e32 GROUP BY 1),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.val * b.val) AS dot
         FROM e32 a JOIN e32 b ON a.dim = b.dim AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM top a JOIN top b ON a.doc_id < b.doc_id)
SELECT p.doc_a, p.doc_b,
       CASE WHEN na.nn > 0 AND nb.nn > 0
            THEN round(coalesce(d.dot, 0.0) / (na.nn * nb.nn), 6) + 0.0
            ELSE 0.0 END AS cos_sim
FROM pairs p
LEFT JOIN dots d ON d.doc_a = p.doc_a AND d.doc_b = p.doc_b
JOIN n2 na ON na.doc_id = p.doc_a
JOIN n2 nb ON nb.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
""",
        # Mann–Whitney AUC of first-half activity predicting churn
        "churn_auc_baseline": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                      THEN 1 ELSE 0 END)::bigint AS a,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                      THEN 1 ELSE 0 END) AS act2
      FROM events GROUP BY user_id),
k AS (SELECT a, CASE WHEN act2 = 0 THEN 1 ELSE 0 END AS y FROM u WHERE a > 0),
r AS (SELECT y, (2 * rank() OVER (ORDER BY a)
                 + count(*) OVER (PARTITION BY a) - 1)::bigint AS r2 FROM k),
s AS (SELECT sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)::hugeint AS s2,
             sum(y)::hugeint AS n1, count(*)::hugeint AS n FROM r)
SELECT n::bigint AS n_users, n1::bigint AS n_churned,
       CASE WHEN n1 > 0 AND n1 < n
            THEN round((s2 - n1 * (n1 + 1))::double
                       / (2 * n1 * (n - n1))::double, 6) + 0.0
            ELSE 0.0 END AS auc
FROM s
""",
        "min_cost_supplier": """
WITH sel_parts AS (
  SELECT p_partkey, p_brand FROM part WHERE p_type = 'LARGE' AND p_size <= 15),
sup_r AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'),
offers AS (
  SELECT l_partkey, l_suppkey,
         min(round(l_extendedprice * 100)::bigint) AS min_cents
  FROM lineitem
  JOIN sel_parts ON l_partkey = p_partkey
  JOIN sup_r ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT l_partkey, l_suppkey, min_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY min_cents ASC, l_suppkey ASC) AS rn
  FROM offers)
SELECT b.l_partkey AS p_partkey, sp.p_brand, s.s_name,
       round(s.s_acctbal, 6) AS s_acctbal,
       round(b.min_cents / 100.0, 6) AS min_cost
FROM best b
JOIN sel_parts sp ON b.l_partkey = sp.p_partkey
JOIN sup_r s ON b.l_suppkey = s.s_suppkey
WHERE rn = 1 ORDER BY p_partkey
""",
        "important_parts": """
WITH sup_n AS (
  SELECT s_suppkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'),
rev AS (
  SELECT l_partkey,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem JOIN sup_n ON l_suppkey = s_suppkey),
per_part AS (SELECT l_partkey, sum(rev1e4)::bigint AS v FROM rev GROUP BY l_partkey),
tot AS (SELECT sum(v)::hugeint AS t FROM per_part)
SELECT l_partkey, round(v / 10000.0, 6) AS value
FROM per_part, tot WHERE v::hugeint * 1000 > t
ORDER BY value DESC, l_partkey
""",
        "part_supplier_counts": """
SELECT p_brand, p_type, p_size::bigint AS p_size,
       count(DISTINCT l_suppkey)::bigint AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
        "sales_opportunity": """
WITH cb AS (
  SELECT c_custkey, c_nationkey, round(c_acctbal * 100)::bigint AS cents
  FROM customer),
stat AS (SELECT sum(cents)::hugeint AS s, count(*)::hugeint AS n
         FROM cb WHERE cents > 0),
rich AS (SELECT cb.* FROM cb, stat WHERE cb.cents::hugeint * stat.n > stat.s),
no_ord AS (SELECT * FROM rich
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_orderdate >= DATE '2000-01-01'))
SELECT c_nationkey::bigint AS c_nationkey, count(*)::bigint AS numcust,
       round(sum(cents) / 100.0, 6) AS totacctbal
FROM no_ord GROUP BY c_nationkey ORDER BY c_nationkey
""",
    }
