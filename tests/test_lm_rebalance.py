"""Bigram-LM quality scores and training-mixture rebalancing."""

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.lm import bigram_lm_scores, train_bigram_counts
from dcs_ray.functions.sampling import rebalance_to_weights, splitmix64


def _tiny_corpus() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["the cat sat", "the cat ran", "dog", ""]
            ),
        }
    )


def test_bigram_lm_matches_hand_computation(ray_session):
    ds = ray.data.from_arrow(_tiny_corpus())
    counts = train_bigram_counts(ds)
    ref = ray.put(counts)
    out = (
        bigram_lm_scores(ray.data.from_arrow(_tiny_corpus()), ref)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus: unigrams the:2 cat:2 sat:1 ran:1 dog:1 -> V=5
    # bigrams: "the cat":2, "cat sat":1, "cat ran":1
    V = 5
    lp_the_cat = math.log((2 + 1) / (2 + V))
    lp_cat_sat = math.log((1 + 1) / (2 + V))
    lp_cat_ran = math.log((1 + 1) / (2 + V))
    assert out.n_bigrams.tolist() == [2, 2, 0, 0]
    assert abs(out.avg_logprob[0] - round((lp_the_cat + lp_cat_sat) / 2, 6)) < 1e-9
    assert abs(out.avg_logprob[1] - round((lp_the_cat + lp_cat_ran) / 2, 6)) < 1e-9
    assert out.avg_logprob[2] == 0.0 and out.avg_logprob[3] == 0.0


def test_train_counts_layout_independent(ray_session):
    t = _tiny_corpus()
    a = train_bigram_counts(ray.data.from_arrow(t))
    b = train_bigram_counts(ray.data.from_arrow(t).repartition(3))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_rebalance_to_weights_rates_and_determinism(ray_session):
    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "grp": pa.array(["big" if i % 4 else "small" for i in range(n)]),
        }
    )
    # big: 1500 rows, small: 500 rows; target 400 split 1:1 -> 200 each
    # big sampled at ~200/1500, small at ~200/500
    out = rebalance_to_weights(
        ray.data.from_arrow(t), "grp", {"big": 1, "small": 1}, 400,
        id_col="doc_id", seed=3,
    ).to_pandas()
    vc = out.grp.value_counts()
    assert 140 <= vc.get("big", 0) <= 260, vc
    assert 140 <= vc.get("small", 0) <= 260, vc
    # deterministic: second run identical
    out2 = rebalance_to_weights(
        ray.data.from_arrow(t), "grp", {"big": 1, "small": 1}, 400,
        id_col="doc_id", seed=3,
    ).to_pandas()
    assert out.doc_id.tolist() == out2.doc_id.tolist()
    # membership matches the published rule: h < floor(2^64 * t * w / (W * c))
    thr_big = ((1 << 64) * 400 * 1) // (2 * 1500)
    kept_big = {
        i for i in range(n)
        if i % 4 and int(splitmix64(np.array([i], np.uint64) ^ np.uint64(3))[0]) < thr_big
    }
    assert set(out[out.grp == "big"].doc_id) == kept_big


def test_rebalance_drops_unweighted_groups(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "grp": pa.array(["keep" if i % 2 else "drop" for i in range(100)]),
        }
    )
    out = rebalance_to_weights(
        ray.data.from_arrow(t), "grp", {"keep": 1}, 1_000_000, id_col="doc_id"
    ).to_pandas()
    assert set(out.grp) == {"keep"}
    assert len(out) == 50  # rate capped at keep-everything
