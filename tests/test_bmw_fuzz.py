"""Differential fuzz of the three BM25 scorers: on random corpora and
random queries, exhaustive / MaxScore / interval-BMW must return
BIT-IDENTICAL (doc, score) top-k — the guard for the round-5 BMW
overhaul (per-posting sparse events, incremental θ, block cache,
galloping chunks), whose pruning decisions must never change results."""

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
    shard_paths,
)

VOCAB = [
    "the", "data", "spark", "merge", "join", "row", "key", "scan",
    "zz1", "zz2", "needle", "rare",
]


@pytest.fixture(scope="module")
def fuzz_idx(ray_session, tmp_path_factory):
    """One corpus with every regime the scorers branch on: Zipf term
    mix, heavy duplication (tie plateaus), a sparse needle band, empty
    docs, and single-term docs."""
    rng = np.random.default_rng(99)
    n = 20_000
    texts = []
    for i in range(n):
        if i % 997 == 0:
            texts.append("needle rare spark")  # sparse high-scoring band
        elif i % 13 == 0:
            texts.append("the data spark merge join")  # duplicated plateau
        elif i % 101 == 0:
            texts.append("")  # empty doc
        else:
            kk = rng.integers(1, 9)
            probs = 1.0 / np.arange(1, len(VOCAB) + 1)
            probs /= probs.sum()
            texts.append(" ".join(rng.choice(VOCAB, size=kk, p=probs)))
    p = tmp_path_factory.mktemp("bmwfuzz") / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    out = str(tmp_path_factory.mktemp("bmwfuzz") / "idx")
    build_index(
        ray.data.read_parquet(str(p)), out,
        IndexConfig(num_partitions=4, num_shards=2, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    return out


def test_three_scorers_bit_identical_fuzz(fuzz_idx):
    rng = np.random.default_rng(7)
    stats = load_stats(fuzz_idx)
    segs = [_open(p) for p in shard_paths(fuzz_idx)]
    queries = []
    for _ in range(24):
        kk = int(rng.integers(1, 5))
        queries.append(" ".join(rng.choice(VOCAB, size=kk, replace=False)))
    queries += ["needle", "needle rare", "the", "the the the", "zz1 zz2 needle"]
    plans = plan_queries(fuzz_idx, queries, stats)
    for qi, plan in enumerate(plans):
        k = int(rng.choice([1, 3, 10, 100, 50_000]))
        for seg in segs:
            d1, s1 = score_shard_bm25(seg, plan, stats, k)
            d2, s2 = score_shard_bm25_maxscore(seg, plan, stats, k)
            d3, s3 = score_shard_bm25_bmw(seg, plan, stats, k)
            np.testing.assert_array_equal(d1, d2, err_msg=f"maxscore {queries[qi]} k={k}")
            np.testing.assert_array_equal(s1, s2, err_msg=f"maxscore {queries[qi]} k={k}")
            np.testing.assert_array_equal(d1, d3, err_msg=f"bmw {queries[qi]} k={k}")
            np.testing.assert_array_equal(s1, s3, err_msg=f"bmw {queries[qi]} k={k}")


def test_bmw_doc_filter_fuzz(fuzz_idx):
    """With a random doc_filter (the tombstone/terms_all path), the
    pruned scorers must stay identical to the exhaustive one."""
    rng = np.random.default_rng(11)
    stats = load_stats(fuzz_idx)
    segs = [_open(p) for p in shard_paths(fuzz_idx)]
    plans = plan_queries(
        fuzz_idx, ["spark merge join", "needle rare", "the data"], stats
    )
    for plan in plans:
        flt = np.sort(
            rng.choice(np.arange(20_000, dtype=np.uint64), size=4096, replace=False)
        )
        for seg in segs:
            d1, s1 = score_shard_bm25(seg, plan, stats, 10, doc_filter=flt)
            d3, s3 = score_shard_bm25_bmw(seg, plan, stats, 10, doc_filter=flt)
            np.testing.assert_array_equal(d1, d3)
            np.testing.assert_array_equal(s1, s3)
