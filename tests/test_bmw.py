"""Interval-decomposed Block-Max WAND (``score_shard_bm25_bmw``) — the
north rule's named scorer (Ding & Suel '11 re-expressed over the
elementary intervals of the doc-id axis, so bound computation and block
skipping are a sorted-events prefix sum instead of a DAAT walk).

Exactness bar: bit-identical (doc_ids AND float scores) to the
exhaustive scorer on every query/k/filter — the same bar the MaxScore
path meets. Efficiency bar: on a skewed corpus (rare high-idf term +
huge common term) it must DECODE strictly fewer blocks than exist,
because θ from the rare term's intervals prunes the common term's
block ranges."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import (
    _open,
    load_stats,
    plan_queries,
    score_shard_bm25,
    score_shard_bm25_bmw,
    score_shard_bm25_maxscore,
    search_bm25,
    shard_paths,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def words_idx(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bmw") / "idx")
    build_index(
        ray.data.read_parquet(f"{SF}/documents.parquet"), out,
        IndexConfig(num_partitions=4, num_shards=2, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    return out


def test_bmw_bit_identical_to_exhaustive(words_idx):
    stats = load_stats(words_idx)
    queries = [
        "spark merge join", "customer value", "the data pipeline",
        "a", "merge", "value join merge spark customer", "zzz nothere",
    ]
    plans = plan_queries(words_idx, queries, stats)
    for sp in shard_paths(words_idx):
        seg = _open(sp)
        for plan in plans:
            for k in (1, 5, 20, 1000):
                d1, s1 = score_shard_bm25(seg, plan, stats, k)
                d2, s2 = score_shard_bm25_bmw(seg, plan, stats, k)
                d3, s3 = score_shard_bm25_maxscore(seg, plan, stats, k)
                np.testing.assert_array_equal(d1, d2)
                np.testing.assert_array_equal(s1, s2)
                np.testing.assert_array_equal(d1, d3)
                np.testing.assert_array_equal(s1, s3)


def test_bmw_doc_filter_identity(words_idx):
    stats = load_stats(words_idx)
    plans = plan_queries(words_idx, ["spark merge join", "customer value"], stats)
    seg = _open(shard_paths(words_idx)[0])
    df = seg.doc_ids[::3].astype(np.uint64)
    for plan in plans:
        d1, s1 = score_shard_bm25(seg, plan, stats, 10, doc_filter=df)
        d2, s2 = score_shard_bm25_bmw(seg, plan, stats, 10, doc_filter=df)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)


def test_bmw_search_pipeline_matches_maxscore(words_idx):
    a = search_bm25(words_idx, ["spark merge join", "customer value"], k=10).to_pandas()
    b = search_bm25(
        words_idx, ["spark merge join", "customer value"], k=10, method="bmw"
    ).to_pandas()
    assert a[["query_id", "rank", "doc_id"]].equals(b[["query_id", "rank", "doc_id"]])
    np.testing.assert_array_equal(a.score.values, b.score.values)


def test_bmw_skips_blocks_on_skewed_corpus(ray_session, tmp_path):
    """Zipf regime: 'common' in every doc, 'rare'+'needle' in a tight
    id band. θ from the high-bound band prunes the bulk of 'common's
    blocks — decoded must be a strict subset; results still exact."""
    n = 60_000
    rng = np.random.default_rng(17)
    texts = np.full(n, "common filler words here", dtype=object)
    band = np.arange(1000, 1040)
    for i in band:
        texts[i] = "common rare needle token"
    # sprinkle 'rare' thinly elsewhere so its idf stays moderate
    sprinkle = rng.choice(np.setdiff1d(np.arange(n), band), 50, replace=False)
    for i in sprinkle:
        texts[i] = "common rare words here"
    path = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "text": pa.array(list(texts), pa.string()),
        }),
        path,
    )
    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet(str(path)), out,
        IndexConfig(num_partitions=4, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    stats = load_stats(out)
    plans = plan_queries(out, ["rare needle common"], stats)
    seg = _open(shard_paths(out)[0])
    d1, s1 = score_shard_bm25(seg, plans[0], stats, 10)
    counters = {}
    d2, s2 = score_shard_bm25_bmw(seg, plans[0], stats, 10, counters=counters)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)
    # "touched" = fresh decodes + cache-sliced blocks (the exhaustive
    # call above warms the full-term decode cache, so BMW may reach
    # blocks without decoding) — the PRUNING claim is about touched
    touched = counters.get("blocks_decoded", 0) + counters.get("blocks_from_cache", 0)
    assert 0 < touched < counters["blocks_total"], counters
    # the bulk of 'common' (60k docs / 128 per block ≈ 470 blocks) must
    # be skipped, not just a few stragglers
    assert touched < counters["blocks_total"] * 0.5, counters
