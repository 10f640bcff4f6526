"""Keyword-filtered / grouped / prior-weighted BM25 search — the dcs
FilterByKeywords + per-package-top-2 + pre-ranking read path
(``internal/sourcebackend/sourcebackend.go:28-129,354``,
``cmd/dcs-web/querymanager.go:728-747``, ``ranking/pre-ranking.go:54-103``)
rebuilt inside the distributed shard tasks: no full-corpus ranking ever
reaches the driver."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import (
    _open,
    filters_from_keywords,
    load_stats,
    plan_queries,
    score_shard_all,
    search_bm25,
    search_bm25_grouped,
    shard_doc_filter,
    shard_paths,
)

SF = "/root/testdata/sf0.001"
Q = "spark merge join"


@pytest.fixture(scope="module")
def meta_index(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("idx") / "meta_index")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")

    def with_prior(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        prior = 1.0 + (ids % 5) / 10.0
        return b.append_column("prior", pa.array(prior, pa.float64()))

    docs = docs.map_batches(with_prior, batch_format="pyarrow")
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        url_col="url", dedup_latest=False, meta_cols=("source", "prior"),
    )
    build_index(docs, out, conf)
    return out


def _reference_full_ranking(meta_index):
    """Rank-all-then-post-process reference, computed driver-side (the
    r1 shape — correct, just not scale-safe; used here as the oracle)."""
    stats = load_stats(meta_index)
    full = search_bm25(meta_index, [Q], k=stats["n_docs"], stats=stats).to_pandas()
    meta = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    return full.merge(meta, on="doc_id")


def test_filtered_search_matches_rank_then_filter(meta_index):
    filters = {"include": {"source": ["src3"]}}
    got = search_bm25(meta_index, [Q], k=10, filters=filters).to_pandas()
    ref = _reference_full_ranking(meta_index)
    want = ref[ref.source == "src3"].sort_values("rank").head(10)
    assert got.doc_id.tolist() == want.doc_id.tolist()
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())


def test_filter_scores_candidates_only_never_full_corpus(meta_index):
    """The shard kernel with a doc_filter of size m scores at most m docs
    — k never degenerates to n_docs (the r1 anti-pattern)."""
    stats = load_stats(meta_index)
    plan = plan_queries(meta_index, [Q], stats)[0]
    filters = {"include": {"source": ["src3"]}}
    total_scored = 0
    total_filter = 0
    for p in shard_paths(meta_index):
        seg = _open(p)
        df = shard_doc_filter(seg, filters)
        assert df is not None and len(df) < len(seg.doc_ids)
        docs, sums = score_shard_all(seg, plan, stats, doc_filter=df)
        assert np.isin(docs, df).all()  # only filtered docs scored
        # scores are unchanged by filtering (filter-then-rank == rank-then-filter)
        docs_all, sums_all = score_shard_all(seg, plan, stats)
        pos = np.searchsorted(docs_all, docs)
        np.testing.assert_array_equal(sums, sums_all[pos])
        total_scored += len(docs)
        total_filter += len(df)
    assert total_scored <= total_filter < stats["n_docs"]


def test_maxscore_respects_doc_filter(meta_index):
    from dcs_ray.search import score_shard_bm25_maxscore, topk

    stats = load_stats(meta_index)
    plan = plan_queries(meta_index, [Q], stats)[0]
    filters = {"include": {"source": ["src1", "src4"]}}
    for p in shard_paths(meta_index):
        seg = _open(p)
        df = shard_doc_filter(seg, filters)
        d_ms, s_ms = score_shard_bm25_maxscore(seg, plan, stats, 10, doc_filter=df)
        d_ex, s_ex = topk(*score_shard_all(seg, plan, stats, doc_filter=df), 10)
        assert d_ms.tolist() == d_ex.tolist()
        np.testing.assert_array_equal(s_ms, s_ex)


def test_grouped_top2_matches_reference(meta_index):
    got = search_bm25_grouped(meta_index, [Q], group_col="source", per_group=2, k=10)
    got = got.to_pandas()
    ref = _reference_full_ranking(meta_index)
    want = (
        ref.sort_values("rank").groupby("source", sort=False).head(2)
        .sort_values("rank").head(10)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.group.tolist() == want.source.tolist()
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())


def test_prior_weighted_search(meta_index):
    got = search_bm25(meta_index, [Q], k=10, prior_col="prior").to_pandas()
    ref = _reference_full_ranking(meta_index)
    ref["pscore"] = ref.score * (1.0 + (ref.doc_id % 5) / 10.0)
    want = ref.sort_values(["pscore", "doc_id"], ascending=[False, True]).head(10)
    assert got.doc_id.tolist() == want.doc_id.tolist()
    np.testing.assert_allclose(got.score.to_numpy(), want.pscore.to_numpy(), rtol=1e-15)


def test_filters_from_keywords_mapping():
    from dcs_ray.queryplan import rewrite_query

    q, inc, neg = rewrite_query("spark source:src3 -lang:fr path:blog merge")
    assert q == "spark merge"
    spec = filters_from_keywords(inc, neg)
    assert spec["include"] == {"source": ["src3"]}
    assert spec["exclude"] == {"lang": ["fr"]}
    assert spec["url_regex"] == ["blog"]
    assert filters_from_keywords({}, {}) is None


def test_url_regex_filter(meta_index):
    # id-mode indexes synthesize url = str(doc_id)
    filters = {"url_regex": ["^[0-9]$"], "not_url_regex": ["^[5-9]$"]}
    got = search_bm25(meta_index, [Q], k=10, filters=filters).to_pandas()
    assert len(got) > 0
    assert (got.doc_id < 5).all()


def test_doc_ids_filter_restricts_ranking(ray_session, meta_index):
    """An explicit doc_ids candidate set restricts scoring to exactly
    those docs; an empty set returns no rows."""
    from dcs_ray.search import search_bm25

    full = search_bm25(meta_index, ["spark merge join"], k=10).to_pandas()
    some = full.doc_id.tolist()[2:5]
    got = search_bm25(
        meta_index, ["spark merge join"], k=10, filters={"doc_ids": some}
    ).to_pandas()
    assert set(got.doc_id) <= set(some)
    assert len(got) == len(some)
    # scores are unchanged by the filter (same global stats)
    merged = got.merge(full, on="doc_id", suffixes=("_f", "_full"))
    assert (merged.score_f == merged.score_full).all()
    empty = search_bm25(
        meta_index, ["spark merge join"], k=10, filters={"doc_ids": []}
    ).to_pandas()
    assert len(empty) == 0


def test_more_like_this_excludes_source_and_ranks(meta_index):
    import pyarrow.parquet as pq2

    from dcs_ray.search import more_like_this

    target = pq2.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).filter(pa.compute.equal(pa.compute.field("doc_id"), 42))
    text = target["text"][0].as_py()
    out = more_like_this(meta_index, text, exclude_doc_id=42, n_terms=5, k=10)
    ids = out["doc_id"].to_pylist()
    assert 42 not in ids and len(ids) == 10
    assert out["rank"].to_pylist() == list(range(1, 11))
    # scores non-increasing
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    # empty text -> empty result, schema intact
    e = more_like_this(meta_index, "", n_terms=5, k=10)
    assert len(e) == 0 and e.column_names == ["rank", "doc_id", "score"]


def test_search_prf_expands_and_reranks(meta_index, ray_session):
    from dcs_ray.search import search_prf

    base = search_bm25(meta_index, [Q], k=10)
    out = search_prf(meta_index, Q, f"{SF}/documents.parquet",
                     n_docs=10, n_terms=3, k=10)
    assert len(out) == 10
    assert out["rank"].to_pylist() == list(range(1, 11))
    # expansion adds terms → scores differ from the base pass
    assert out["score"].to_pylist() != [
        round(s, 6) for s in base["score"].to_pylist()
    ]
    # deterministic: second run identical
    again = search_prf(meta_index, Q, f"{SF}/documents.parquet",
                       n_docs=10, n_terms=3, k=10)
    assert out.equals(again)


def test_search_prf_unknown_query_returns_empty(meta_index, ray_session):
    from dcs_ray.search import search_prf

    out = search_prf(meta_index, "zzzzqqqq", f"{SF}/documents.parquet", k=10)
    assert len(out) == 0


def test_search_corrected_matches_clean_query(meta_index, ray_session):
    from dcs_ray.search import search_corrected

    # misspellings correct back to the real terms → identical ranking
    # to the clean query, provided each correction wins on (df, term)
    from dcs_ray.search import global_df
    import ray.data as rd
    from dcs_ray.functions.spell import suggest
    import os as _os

    vocab = rd.read_parquet(_os.path.join(meta_index, "stats", "df.parquet"))
    sugg = suggest(vocab, ["merje", "spork"], k=1)
    best = dict(zip(sugg["word"].to_pylist(), sugg["term"].to_pylist()))
    got = search_corrected(meta_index, "spork merje join", k=10)
    want = search_bm25(
        meta_index, [" ".join(sorted({best["merje"], best["spork"], "join"}))], k=10
    )
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()


def test_search_corrected_all_unknown_returns_empty(meta_index, ray_session):
    from dcs_ray.search import search_corrected

    out = search_corrected(meta_index, "qqqqqqqqqqzzzzzzzz", k=10)
    assert len(out) == 0
