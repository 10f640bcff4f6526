"""Auto-split from the round-3 __ray_entry__.py monolith (verbatim
segments; see entry/__init__.py).  Do not import directly — go
through __ray_entry__.
"""

from __future__ import annotations
import os
import sys
from collections.abc import Callable
from typing import Any
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from dcs_ray.sources.io import read_parquet_sized

from entry._helpers import (  # noqa: F401
    BM25_QUERY,
    _BOOT_B,
    _BOOT_M,
    _BOOT_SEED,
    _QualityWithLabel,
    _US_PER_DAY,
    _daily_event_counts,
    _docs,
    _index_dir,
    _li_rev1e4,
    _link_edges_ds,
    _link_pair_edges,
    _nation_keys,
)
from entry._gates_1 import (  # noqa: F401
    _q_nb_confusion,
)

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

