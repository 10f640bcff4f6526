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
    _ALERT_QUERIES,
    _BLOOM_PROBE_TERMS,
    _CACHE_ROOT,
    _SELECTIVITY_COMBOS,
    _anchor_index_dir,
    _index_dir,
    _li_rev1e4,
    _link_edges_ds,
)
from entry._helpers import REGEX  # noqa: F401


def _q_regex_search_linear(sf_dir: str) -> Any:
    """The regex gate served end-to-end by the worst-case-linear Pike-VM
    engine (``dcs_ray/nfa.py``) instead of the budgeted backtracker:
    identical trigram planning + fused per-shard verify, engine="nfa"
    forced — hash-gated against the SAME DuckDB oracle as regex_search,
    proving the linear engine's match semantics on real corpus text."""
    from dcs_ray.grep import search_regex_fused

    idx = _index_dir(sf_dir, "trigram")
    ds = search_regex_fused(
        idx, f"{sf_dir}/documents.parquet", REGEX, engine="nfa"
    )
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    if len(t) == 0:
        return pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64())]).empty_table()
    g = t.group_by("doc_id").aggregate([("line", "count_distinct")])
    return pa.table(
        {"doc_id": g["doc_id"].cast(pa.int64()), "n_lines": g["line_count_distinct"].cast(pa.int64())}
    ).sort_by("doc_id")


def _q_feed_alerts(sf_dir: str) -> pa.Table:
    """The live-ingest composition: feeder tick (drop-dir parquet → NRT
    delta adds) with prospective standing-query alerts evaluated over
    ONLY the ingested docs (dcs-feeder × SIFT). Deterministic replay:
    base index = docs with doc_id<100, two delta files carrying docs
    0..39 re-idd at +1_000_000; output (query_id, n_alerts, head_docs)
    over the delta stream, which the oracle replays as tokenized
    containment on the same re-idd slice."""
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from dcs_ray.feeder import feed_with_alerts
    from dcs_ray.index import IndexConfig, build_index

    root = tempfile.mkdtemp(prefix="feed_alerts_", dir="/tmp")
    try:
        idx = os.path.join(root, "idx")
        inc = os.path.join(root, "inc")
        os.makedirs(inc)
        base = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).filter(lambda r: r["doc_id"] < 100)
        build_index(base, idx, IndexConfig(
            num_partitions=2, num_shards=1, mode="words", id_col="doc_id",
            dedup_latest=False,
        ))
        t = _pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filters=[("doc_id", "<", 40)],
        ).sort_by("doc_id")
        t = t.set_column(
            0, "doc_id", pa.array(t["doc_id"].to_numpy() + 1_000_000, pa.int64())
        )
        _pq.write_table(t.slice(0, 20), os.path.join(inc, "000.parquet"))
        _pq.write_table(t.slice(20), os.path.join(inc, "001.parquet"))
        res, alerts = feed_with_alerts(idx, inc, _ALERT_QUERIES)
        assert res["ingested"] == 2, res
        qid = alerts["query_id"].to_numpy()
        did = alerts["doc_id"].to_numpy()
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
    finally:
        shutil.rmtree(root, ignore_errors=True)


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

