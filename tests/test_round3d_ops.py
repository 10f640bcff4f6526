"""Round-3 session-d operators: PR metrics, ReDDE resource selection,
PBM click-model EM."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.clickmodel import pbm_em, synth_click_log
from dcs_ray.functions.evaluate import pr_metrics_from_hits


def test_pr_metrics_known_values():
    ranked = np.array([1, 2, 3, 4, 5], np.int64)
    # hits at ranks 1 and 4; 3 relevant total in the corpus
    p, r, ap = pr_metrics_from_hits(ranked, {1, 4, 99}, 3, 5)
    assert p == 2 / 5
    assert r == 2 / 3
    # AP = (P@1 + P@4) / min(3, 5) = (1 + 2/4) / 3
    assert abs(ap - (1.0 + 0.5) / 3) < 1e-12


def test_pr_metrics_no_relevant():
    ranked = np.array([1, 2], np.int64)
    p, r, ap = pr_metrics_from_hits(ranked, set(), 0, 2)
    assert (p, r, ap) == (0.0, 0.0, 0.0)


def test_synth_click_log_shape_and_determinism(ray_session):
    ranked = list(range(100, 110))
    a = synth_click_log(ranked, n_sessions=40, seed=7).take_all()
    b = synth_click_log(ranked, n_sessions=40, seed=7).take_all()
    assert len(a) == 400
    key = lambda r: (r["session"], r["pos"])
    assert sorted(a, key=key) == sorted(b, key=key)
    # variant 1 shows the reversed ranking
    for row in a[:40]:
        if row["variant"] == 1:
            assert row["doc_id"] == ranked[10 - row["pos"]]
        else:
            assert row["doc_id"] == ranked[row["pos"] - 1]


def test_pbm_em_separates_position_from_doc(ray_session):
    """With the two-variant log, EM must recover a monotonically
    DECREASING examination curve (true alpha = (11-p)/12) and rank the
    docs' attractiveness consistently with their true thresholds."""
    from dcs_ray.functions.sampling import splitmix64

    ranked = list(range(500, 510))
    log = synth_click_log(ranked, n_sessions=2000, seed=7)
    t = pbm_em(log, n_positions=10, iters=20)
    kind = np.array(t["kind"].to_pylist())
    key = t["key"].to_numpy()
    val = t["value"].to_numpy()
    alpha = val[kind == "exam"][np.argsort(key[kind == "exam"])]
    # head of the curve must clearly dominate the tail
    assert alpha[0] > alpha[5] > alpha[9]
    # doc attractiveness order ~ true integer thresholds
    docs = key[kind == "attr"]
    attr = val[kind == "attr"]
    true_t = 3 + (splitmix64(docs.astype(np.uint64) ^ np.uint64(7 + 3))
                  % np.uint64(10)).astype(np.int64)
    lo = attr[true_t <= 5].mean()
    hi = attr[true_t >= 10].mean()
    assert hi > lo


def test_redde_votes_scale_with_inverse_sampling_rate(ray_session, tmp_path):
    """A collection sampled at half the rate must get double the weight
    per hit: build a CSI where collection 1's docs dominate the top-k
    and check est_rel reflects |C|/|S| scaling."""
    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import redde_collection_scores

    n = 400
    ids = np.arange(n)
    coll = (ids % 2).astype(np.int64)  # two collections
    text = np.where(coll == 1, "needle term here", "filler words only")
    path = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array([f"u{i}" for i in ids], pa.string()),
            "text": pa.array(list(text), pa.string()),
            "coll": pa.array(coll, pa.int64()),
        }),
        path,
    )
    # CSI: every 3rd doc (hits both parities/collections)
    tbl = pq.read_table(path)
    sub = tbl.filter(pa.array(ids % 3 == 0))
    out = str(tmp_path / "csi")
    build_index(
        ray.data.from_arrow(sub), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False, meta_cols=("coll",)),
    )
    full = [int((coll == c).sum()) for c in range(2)]
    samp_coll = coll[ids % 3 == 0]
    samp = [int((samp_coll == c).sum()) for c in range(2)]
    t = redde_collection_scores(out, "needle", "coll", full, samp, k=10)
    est = t["est_rel"].to_numpy()
    rank = t["rank"].to_numpy()
    # all 10 hits are collection 1 ⇒ est = 10 * |C1|/|S1|; C0 gets 0
    assert est[0] == 0.0
    assert abs(est[1] - 10 * full[1] / samp[1]) < 1e-5  # est_rel rounds to 6dp
    assert rank[1] == 1 and rank[0] == 2


def test_change_rate_estimator_monotone_and_bounds(ray_session):
    """lambda_hat must be strictly increasing in the observed change
    count and equal the closed form -ln((n-X+.5)/(n+.5))."""
    import ray.data as rd

    from dcs_ray.functions.crawl import change_rate_estimates

    ds = rd.range(500).map_batches(lambda b: {"doc_id": b["id"]})
    t = pa.concat_tables(
        [pa.table(b) for b in change_rate_estimates(ds, n_visits=8, seed=11)
         .iter_batches(batch_format="pyarrow")]
    )
    x = t["n_changes"].to_numpy()
    lam = t["lambda_hat"].to_numpy()
    assert x.min() >= 0 and x.max() <= 8
    expect = np.round(-np.log((8 - x + 0.5) / 8.5), 6)
    np.testing.assert_allclose(lam, expect, atol=1e-9)
    # monotone: group means strictly increase with x
    for a, b in zip(np.unique(x)[:-1], np.unique(x)[1:]):
        assert lam[x == a].max() < lam[x == b].min()


def test_template_ngrams_finds_injected_boilerplate(ray_session):
    rows = []
    for d in range(40):
        src = f"h{d % 2}"
        boiler = "alpha beta gamma delta epsilon zeta" if src == "h0" \
            else "one two three four five six"
        rows.append({"doc_id": d, "source": src,
                     "text": boiler + f" unique{d} filler{d} tail{d}"})
    import ray.data as rd

    from dcs_ray.functions.crawl import template_ngrams

    out = template_ngrams(rd.from_items(rows), n=5, min_frac=0.9).take_all()
    grams = {(r["source"], r["gram"]) for r in out}
    # the two all-boiler 5-grams per host are present in 100% of docs
    assert ("h0", "alpha beta gamma delta epsilon") in grams
    assert ("h0", "beta gamma delta epsilon zeta") in grams
    assert ("h1", "one two three four five") in grams
    assert ("h1", "two three four five six") in grams
    # nothing containing per-doc unique words survives the 90% cut
    assert all("unique" not in g for _, g in grams)
    assert all(r["frac"] == 1.0 for r in out)


def test_bm25f_reduces_to_bm25_with_zero_anchor_weight(ray_session, tmp_path):
    """Algebraic identity: dividing BM25's numerator and denominator by
    the length normalizer shows single-field BM25F (shared saturation,
    anchor_weight=0) IS classic BM25 — scores must match to float
    noise, ranks exactly."""
    import ray.data as rd

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25, search_bm25f

    out = str(tmp_path / "idx")
    build_index(
        rd.read_parquet("/root/testdata/sf0.001/documents.parquet"), out,
        IndexConfig(num_partitions=4, num_shards=2, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    a = search_bm25(out, ["spark merge join"], k=10).to_pandas()
    b = search_bm25f(out, out, ["spark merge join"], k=10,
                     anchor_weight=0.0).to_pandas()
    assert a[["rank", "doc_id"]].values.tolist() == b[["rank", "doc_id"]].values.tolist()
    np.testing.assert_allclose(a.score.values, b.score.values, rtol=1e-12)


def test_cascade_log_stops_at_first_click(ray_session):
    from dcs_ray.functions.clickmodel import synth_cascade_log

    ranked = list(range(700, 710))
    rows = synth_cascade_log(ranked, n_sessions=100, seed=9).take_all()
    by_sess = {}
    for r in rows:
        by_sess.setdefault(r["session"], []).append(r)
    for s, rs in by_sess.items():
        rs.sort(key=lambda r: r["pos"])
        clicks = [r["pos"] for r in rs if r["click"]]
        assert len(clicks) <= 1  # cascade: at most one click
        if clicks:
            fp = clicks[0]
            for r in rs:
                assert r["examined"] == (1 if r["pos"] <= fp else 0)
        else:
            assert all(r["examined"] == 1 for r in rs)


def test_cascade_mle_recovers_attractiveness_order(ray_session):
    from dcs_ray.functions.clickmodel import cascade_mle, synth_cascade_log
    from dcs_ray.functions.sampling import splitmix64

    ranked = list(range(700, 710))
    t = cascade_mle(synth_cascade_log(ranked, n_sessions=3000, seed=9))
    docs = t["doc_id"].to_numpy()
    a = t["a_hat"].to_numpy()
    true_t = 3 + (splitmix64(docs.astype(np.uint64) ^ np.uint64(9 + 2))
                  % np.uint64(10)).astype(np.int64)
    # a_hat ~ true threshold / 16 within sampling noise; the cascade
    # starves tail positions of examinations, so only assert where the
    # estimator actually has samples
    ex = t["n_examined"].to_numpy()
    well = ex >= 100
    assert well.sum() >= 4
    np.testing.assert_allclose(a[well], true_t[well] / 16, atol=0.07)


def test_pairwise_ltr_learns_separating_weight(ray_session):
    """A 1-D separable pair set must converge to positive weight and
    perfect pair accuracy."""
    import ray.data as rd

    from dcs_ray.functions.ltr import pairwise_accuracy, pairwise_ltr_fit

    rng = np.random.default_rng(3)
    deltas = np.abs(rng.normal(1.0, 0.2, 200))[:, None]  # all positive diffs
    ds = rd.from_arrow(pa.table({"d1": pa.array(deltas[:, 0], pa.float64())}))
    w = pairwise_ltr_fit(ds, ["d1"], n_iter=20, lr=0.5)
    assert w[0] > 0
    n, c = pairwise_accuracy(deltas, w)
    assert (n, c) == (200, 200)


def test_dust_rules_mine_and_refute(ray_session):
    import ray.data as rd

    from dcs_ray.functions.dust import dust_param_rules

    rows = []
    for d in range(40):
        base_text = f"content {d % 10}"
        rows.append({"url": f"http://h/p{d % 10}", "text": base_text})
        rows.append({"url": f"http://h/p{d % 10}?sessionid=s{d}", "text": base_text})
        rows.append({"url": f"http://h/q?page={d % 5}", "text": f"listing {d % 5} v{d}"})
    t = dust_param_rules(
        rd.from_items(rows), ["sessionid", "page"], min_support=2
    ).to_pandas().set_index("param_key")
    assert bool(t.loc["sessionid", "valid"])
    assert t.loc["sessionid", "violations"] == 0
    assert t.loc["sessionid", "support"] == 10
    assert not bool(t.loc["page", "valid"])
    assert t.loc["page", "violations"] >= 1


def test_nqc_peaked_vs_flat(ray_session, tmp_path):
    """A query with one dominant doc must have higher NQC than a query
    whose matches all score identically (sigma = 0 → nqc = 0)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from dcs_ray.functions.evaluate import nqc_difficulty
    from dcs_ray.index import IndexConfig, build_index

    texts = ["flat term here"] * 30 + ["peaked " + "peaked " * 9] + ["peaked x"] * 29
    path = tmp_path / "d.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(60), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(60)], pa.string()),
            "text": pa.array(texts, pa.string()),
        }),
        path,
    )
    out = str(tmp_path / "idx")
    build_index(
        rd.read_parquet(str(path)), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    t = nqc_difficulty(out, ["flat", "peaked"], k=20).to_pandas()
    flat_nqc = t.loc[t.query_id == 0, "nqc"].iloc[0]
    peaked_nqc = t.loc[t.query_id == 1, "nqc"].iloc[0]
    assert flat_nqc == 0.0          # identical docs → zero deviation
    assert peaked_nqc > 0.05        # tf-10 outlier spreads the top-k
    assert peaked_nqc > flat_nqc


def test_static_cache_curve_monotone_and_skewed(ray_session):
    from dcs_ray.functions.cachesim import static_cache_hit_curve, synth_query_stream

    log = synth_query_stream(5000, 100, seed=21)
    t = static_cache_hit_curve(log, 100, cache_m=10).to_pandas()
    assert len(t) == 10
    assert (np.diff(t.cum_hit_rate.values) > 0).all()
    assert (np.diff(t.freq.values) <= 0).all()
    # min-of-two-uniforms skew: top-10 of 100 queries must absorb far
    # more than the uniform 10% of traffic
    assert t.cum_hit_rate.iloc[-1] > 0.2


def test_hyperanf_ball_growth_on_chain(ray_session):
    """On the chain 5→0→1→2→3→4 the reachability balls are known
    exactly; with m=16 registers the small-range (linear counting)
    branch fires, so estimates are a deterministic function of the
    distinct-register count — and register sums grow monotonically."""
    import ray.data as rd

    from dcs_ray.functions.graph import hyperanf, hyperanf_sample_estimates

    edges = rd.from_items(
        [{"src": i, "dst": i + 1} for i in range(4)] + [{"src": 5, "dst": 0}]
    )
    t = hyperanf_sample_estimates(hyperanf(edges, rounds=3), [0, 3, 4, 5])
    df = t.to_pandas().set_index(["round", "node"])
    # node 4 has no out-edges: its counter never changes
    assert df.loc[(1, 4), "reg_sum"] == df.loc[(3, 4), "reg_sum"]
    # node 0's ball grows 2 → 3 → 4 docs; register sum is monotone
    assert (
        df.loc[(1, 0), "reg_sum"]
        <= df.loc[(2, 0), "reg_sum"]
        <= df.loc[(3, 0), "reg_sum"]
    )
    # ball(0,3) = {0,1,2,3} strictly exceeds ball(3,3) = {3,4}
    assert df.loc[(3, 0), "est"] > df.loc[(3, 3), "est"]


def test_kleinberg_detects_injected_burst(ray_session):
    """A flat series with a 3-day tripled window must flag exactly the
    injected window as the burst state."""
    from dcs_ray.functions.bursts import kleinberg_bursts

    days = np.arange(20, dtype=np.int64)
    n = np.full(20, 1000, np.int64)
    r = np.full(20, 100, np.int64)
    r[8:11] = 300
    daily = pa.table({
        "day": pa.array(days, pa.int64()),
        "r": pa.array(r, pa.int64()),
        "n": pa.array(n, pa.int64()),
    })
    t = kleinberg_bursts(daily, s=2.0, gamma=1.0).to_pandas()
    assert t.state.tolist() == ([0] * 8 + [1] * 3 + [0] * 9)


def test_consistent_hash_minimal_movement(ray_session):
    """Removing a node must move exactly its own keys — and additions
    of virtual nodes keep per-node load within a sane spread."""
    import ray.data as rd

    from dcs_ray.functions.ring import assign_keys, removal_stability

    keys = rd.range(5000).map_batches(lambda b: {"doc_id": b["id"]})
    nodes = list(range(6))
    stab = removal_stability(keys, nodes, removed=2, vnodes=64)
    assert stab["moved_not_owned"] == 0
    assert stab["moved"] == stab["owned_by_removed"] > 0
    t = assign_keys(keys, nodes, vnodes=64).to_pandas()
    assert t.n_keys.sum() == 5000
    # 64 vnodes keep the max/min load spread moderate
    assert t.n_keys.max() < 3 * t.n_keys.min()


def test_prospective_matches_conjunctive_containment(ray_session):
    import ray as _ray
    import ray.data as rd

    from dcs_ray.functions.prospective import compile_queries, match_stream

    docs = [
        {"doc_id": 0, "text": "alpha beta gamma"},
        {"doc_id": 1, "text": "alpha delta"},
        {"doc_id": 2, "text": "beta alpha beta"},
        {"doc_id": 3, "text": "nothing here"},
    ]
    comp = _ray.put(compile_queries([["alpha", "beta"], ["delta"], ["alpha"]]))
    got = {
        (r["doc_id"], r["query_id"])
        for r in match_stream(rd.from_items(docs), comp).take_all()
    }
    assert got == {(0, 0), (2, 0), (1, 1), (0, 2), (1, 2), (2, 2)}


def test_winnowing_matches_bruteforce(ray_session):
    """Vectorized winnowing must equal the rank-by-rank brute force on
    assorted shapes (short, repeated, normal)."""
    import ray.data as rd

    from dcs_ray.functions.sketches import _hash64_column
    from dcs_ray.functions.winnow import winnowing_fingerprint_counts

    texts = ["hello world example text here", "abcabcabcabc", "tiny",
             "x" * 25, "the quick brown fox jumps over the lazy dog"]

    def brute(s, k=5, w=4):
        if len(s) < k + w - 1:
            return 0
        hs = [int(_hash64_column(pa.array([s[i:i + k]]))[0])
              for i in range(len(s) - k + 1)]
        sel = set()
        for st in range(len(hs) - w + 1):
            win = hs[st:st + w]
            mn = min(win)
            sel.add(st + max(i for i in range(w) if win[i] == mn))
        return len(sel)

    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = {r["doc_id"]: r["n_fingerprints"]
           for r in winnowing_fingerprint_counts(ds).take_all()}
    for i, t in enumerate(texts):
        assert got[i] == brute(t), (i, got[i], brute(t))
    # shared-substring guarantee: docs sharing >= w+k-1 chars share a
    # fingerprint value
