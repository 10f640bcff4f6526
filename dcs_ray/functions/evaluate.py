"""Ranking evaluation: NDCG@k and MRR of a retrieval run against
corpus-derived relevance labels — the measurement loop a ranking
pipeline ships with (dcs validates ranking changes against curated
query sets; `ranking/` + `cmd/dcs-web/search.go` result ordering).

Relevance here is the classic lexical oracle: a document is relevant
to a query iff it contains EVERY query term (token-level membership).
That makes labels a pure function of the corpus, so the whole
evaluation is SQL-replayable.

Scale shape: the ranked list (≤ k ids) is broadcast; labeling streams
the corpus ONCE with a vectorized all-terms membership test per batch
(query-term codes resolved against each batch's token dictionary);
each batch emits ONE partial row — (its relevant-doc count, the ≤ k
ranked ids it proved relevant) — so the driver folds #blocks rows and
the exchange never carries per-doc labels. Metrics are then a ≤ k-row
computation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dcs_ray.tokenize import word_tokens_flat


def _contains_all_mask(
    batch: pa.Table, terms: list[str], text_col: str
) -> np.ndarray:
    """Boolean mask over batch rows: text contains every term (as a
    whole token). Vectorized: one tokenize, one dictionary probe per
    query term."""
    n_rows = len(batch)
    flat, parents = word_tokens_flat(batch[text_col])
    if len(flat) == 0:
        return np.zeros(n_rows, bool)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    qcodes = pc.index_in(pa.array(terms), value_set=enc.dictionary)
    mask = np.ones(n_rows, bool)
    for qc in qcodes.to_pylist():
        if qc is None:  # term absent from the whole batch
            return np.zeros(n_rows, bool)
        has = np.zeros(n_rows, bool)
        has[parents[codes == qc]] = True
        mask &= has
    return mask


def relevance_hits(
    docs: ray.data.Dataset,
    candidate_ids: list[int] | np.ndarray,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int, set[int]]:
    """ONE streaming labeling pass → (total relevant count, the subset
    of ``candidate_ids`` that are relevant). Candidates are broadcast;
    each block emits one partial row. Factored out so several rankings
    (parameter sweeps, A/B variants) share a single corpus pass."""
    rset = np.unique(np.asarray(list(candidate_ids), np.int64))
    ref = ray.put(rset)

    def partial(b: pa.Table) -> pa.Table:
        rs = ray.get(ref)
        rel = _contains_all_mask(b, terms, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rel]
        if len(rs) and len(ids):
            idx = np.clip(np.searchsorted(rs, ids), 0, len(rs) - 1)
            hits = ids[rs[idx] == ids]
        else:
            hits = np.empty(0, np.int64)
        return pa.table(
            {
                "n_rel": pa.array([int(rel.sum())], pa.int64()),
                "hits": pa.array([hits.tolist()], pa.list_(pa.int64())),
            }
        )

    n_relevant = 0
    hit_set: set[int] = set()
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n_relevant += int(pc.sum(b["n_rel"]).as_py() or 0)
        for row in b["hits"].to_pylist():
            hit_set.update(row)
    return n_relevant, hit_set


def metrics_from_hits(
    ranked: np.ndarray, hit_set: set[int], n_relevant: int, k: int
) -> tuple[float, float]:
    """(ndcg@k, mrr) of one ranked list given shared labels — ≤ k-row
    math, no corpus access."""
    rel_at = np.array([1.0 if d in hit_set else 0.0 for d in ranked[:k]])
    pos = np.arange(1, len(rel_at) + 1, dtype=np.float64)
    dcg = float(np.sum(rel_at / np.log2(pos + 1.0)))
    n_ideal = min(n_relevant, k)
    idcg = float(
        np.sum(1.0 / np.log2(np.arange(1, n_ideal + 1, dtype=np.float64) + 1.0))
    )
    ndcg = dcg / idcg if idcg > 0 else 0.0
    first = np.flatnonzero(rel_at)
    mrr = 1.0 / float(pos[first[0]]) if len(first) else 0.0
    return ndcg, mrr


def pr_metrics_from_hits(
    ranked: np.ndarray, hit_set: set[int], n_relevant: int, k: int
) -> tuple[float, float, float]:
    """(precision@k, recall@k, average precision@k) of one ranked list
    given shared labels — ≤ k-row math, no corpus access. AP follows
    the TREC convention: Σ_{hit at rank i} P@i, normalized by
    min(n_relevant, k) (the best achievable hit count at depth k)."""
    rel_at = np.array([1.0 if d in hit_set else 0.0 for d in ranked[:k]])
    pos = np.arange(1, len(rel_at) + 1, dtype=np.float64)
    n_hits = float(rel_at.sum())
    p_at_k = n_hits / k
    r_at_k = n_hits / n_relevant if n_relevant else 0.0
    if n_relevant:
        csum = np.cumsum(rel_at)
        ap = float(np.sum((csum / pos) * rel_at)) / min(n_relevant, k)
    else:
        ap = 0.0
    return p_at_k, r_at_k, ap


def pr_ranking_metrics(
    docs: ray.data.Dataset,
    ranked_doc_ids: list[int],
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Precision/recall/MAP evaluation of a ranked list → one row
    (n_relevant, precision_at_k, recall_at_k, avg_precision) vs the
    lexical all-terms relevance oracle; shares the single streaming
    labeling pass with ``ranking_metrics``."""
    ranked = np.asarray(ranked_doc_ids[:k], np.int64)
    n_relevant, hit_set = relevance_hits(
        docs, ranked, terms, id_col=id_col, text_col=text_col
    )
    p, r, ap = pr_metrics_from_hits(ranked, hit_set, n_relevant, k)
    return pa.table(
        {
            "n_relevant": pa.array([n_relevant], pa.int64()),
            f"precision_at_{k}": pa.array([round(p, 6) + 0.0], pa.float64()),
            f"recall_at_{k}": pa.array([round(r, 6) + 0.0], pa.float64()),
            "avg_precision": pa.array([round(ap, 6) + 0.0], pa.float64()),
        }
    )


def ranking_metrics(
    docs: ray.data.Dataset,
    ranked_doc_ids: list[int],
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Evaluate a ranked list → one row (n_relevant, ndcg_at_k, mrr).

    ndcg = DCG@k / IDCG@k with binary gains 1/log2(rank+1); IDCG uses
    min(n_relevant, k) ideal hits. mrr = 1/rank of the first relevant
    result (0 if none). Values rounded to 6 decimals."""
    ranked = np.asarray(ranked_doc_ids[:k], np.int64)
    n_relevant, hit_set = relevance_hits(
        docs, ranked, terms, id_col=id_col, text_col=text_col
    )
    ndcg, mrr = metrics_from_hits(ranked, hit_set, n_relevant, k)
    return pa.table(
        {
            "n_relevant": pa.array([n_relevant], pa.int64()),
            f"ndcg_at_{k}": pa.array([round(ndcg, 6)], pa.float64()),
            "mrr": pa.array([round(mrr, 6)], pa.float64()),
        }
    )


def tune_bm25(
    index_dir: str,
    docs: ray.data.Dataset,
    query: str,
    grid: list[tuple[float, float]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Distributed BM25 parameter sweep: score ``query`` at every
    (k1, b) in ``grid`` and measure NDCG@k / MRR against the lexical
    all-terms relevance oracle → (k1, b, ndcg_at_k, mrr) sorted by
    (k1, b). The eval-driven tuning loop a ranking deployment runs
    before switching parameters.

    Cost shape: each combo is one fan-out over the resident shard tasks
    (the per-worker score cache keys on (k1, b, n_docs, avgdl), so
    combos never poison each other); labeling is ONE corpus pass over
    the UNION of all combos' top-k ids — metrics per combo are then
    ≤ k-row local math."""
    from dcs_ray.search import load_stats, search_bm25
    from dcs_ray.tokenize import tokenize_query_words

    base = load_stats(index_dir)
    ranked_per: list[np.ndarray] = []
    for k1, b in grid:
        stats = dict(base, k1=float(k1), b=float(b))
        t = search_bm25(index_dir, [query], k=k, stats=stats)
        ranked_per.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    union = np.unique(np.concatenate(ranked_per)) if ranked_per else np.empty(0, np.int64)
    terms = sorted(set(tokenize_query_words(query)))
    n_relevant, hit_set = relevance_hits(
        docs, union, terms, id_col=id_col, text_col=text_col
    )
    rows_k1, rows_b, rows_ndcg, rows_mrr = [], [], [], []
    for (k1, b), ranked in zip(grid, ranked_per):
        ndcg, mrr = metrics_from_hits(ranked, hit_set, n_relevant, k)
        rows_k1.append(float(k1))
        rows_b.append(float(b))
        rows_ndcg.append(round(ndcg, 6))
        rows_mrr.append(round(mrr, 6))
    out = pa.table(
        {
            "k1": pa.array(rows_k1, pa.float64()),
            "b": pa.array(rows_b, pa.float64()),
            f"ndcg_at_{k}": pa.array(rows_ndcg, pa.float64()),
            "mrr": pa.array(rows_mrr, pa.float64()),
        }
    )
    return out.sort_by([("k1", "ascending"), ("b", "ascending")])


def team_draft_interleave(ids_a, ids_b, k: int = 10, seed: int = 0) -> pa.Table:
    """Team-draft interleaving (Radlinski & Craswell '08): merge two
    rankings into one list for online A/B ranking comparison — clicks
    on team-0 docs credit ranker A, team-1 ranker B. At each step the
    team with fewer picks selects its best not-yet-picked doc; on a
    balance tie a coin decides, here ``splitmix64(seed + step) & 1`` so
    an integer SQL chain replays every decision. Result-set-sized
    (k ≤ tens), so the driver loop is O(k); returns (pos, doc_id, team).
    """
    import numpy as np
    import pyarrow as pa

    from dcs_ray.functions.sketches import _splitmix64

    a = [int(x) for x in ids_a]
    b = [int(x) for x in ids_b]
    picked: list[int] = []
    teams: list[int] = []
    chosen: set[int] = set()
    ia = ib = na = nb = 0
    step = 0
    while len(picked) < k:
        while ia < len(a) and a[ia] in chosen:
            ia += 1
        while ib < len(b) and b[ib] in chosen:
            ib += 1
        a_ok, b_ok = ia < len(a), ib < len(b)
        if not a_ok and not b_ok:
            break
        coin = int(_splitmix64(np.array([seed + step], np.uint64))[0] & np.uint64(1))
        if a_ok and (not b_ok or na < nb or (na == nb and coin == 0)):
            picked.append(a[ia])
            teams.append(0)
            na += 1
        else:
            picked.append(b[ib])
            teams.append(1)
            nb += 1
        chosen.add(picked[-1])
        step += 1
    return pa.table(
        {
            "pos": pa.array(range(1, len(picked) + 1), pa.int64()),
            "doc_id": pa.array(picked, pa.int64()),
            "team": pa.array(teams, pa.int64()),
        }
    )


NQC_QUERIES = [
    "join merge spark", "customer value", "the",
    "data fast query", "sort window",
]


def nqc_difficulty(index_dir: str, queries: list[str], k: int = 50) -> pa.Table:
    """Post-retrieval query-performance prediction: NQC (Shtok,
    Kurland & Carmel '09 — Normalized Query Commitment). A peaked
    score distribution at the top of the ranking signals an easy,
    well-separated query; a flat one signals difficulty:

        mu    = mean(top-k scores)
        sigma = sqrt(mean((s - mu)^2))       (population std)
        nqc   = sigma / mu                   (the CV normalization)

    Higher nqc → better-separated → predicted-easier. Pre-retrieval
    companion to the clarity gate (KL of result LM vs collection LM);
    everything here is <= k-row math per query on top of the ordinary
    distributed BM25 fan-out."""
    from dcs_ray.search import search_bm25

    t = search_bm25(index_dir, queries, k=k)
    qids = t["query_id"].to_numpy()
    scores = t["score"].to_numpy()
    rows = {"query_id": [], "k_used": [], "mu": [], "sigma": [], "nqc": []}
    for qid in range(len(queries)):
        s = scores[qids == qid]
        if len(s) == 0:
            mu = sigma = nqc = 0.0
            kk = 0
        else:
            kk = len(s)
            mu = float(np.mean(s))
            sigma = float(np.sqrt(np.mean((s - mu) * (s - mu))))
            nqc = sigma / mu if mu != 0 else 0.0
        rows["query_id"].append(qid)
        rows["k_used"].append(kk)
        rows["mu"].append(round(mu, 6) + 0.0)
        rows["sigma"].append(round(sigma, 6) + 0.0)
        rows["nqc"].append(round(nqc, 6) + 0.0)
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "k_used": pa.array(rows["k_used"], pa.int64()),
            "mu": pa.array(rows["mu"], pa.float64()),
            "sigma": pa.array(rows["sigma"], pa.float64()),
            "nqc": pa.array(rows["nqc"], pa.float64()),
        }
    )
