"""TextRank keyword extraction (Mihalcea & Tarau 2004) — per-document
PageRank over the word-adjacency graph, the unsupervised keyword stage
of a web-corpus curation pipeline.

Scale shape: documents are independent, so the whole operator is ONE
``map_batches`` pass with no exchange at all; within a batch every step
(tokenize, adjacency, degree, power iteration, top-k) is vectorized
ACROSS all documents at once via flat node/edge arrays and scatter-adds
— no per-document Python loop.

Determinism contract (what the SQL oracle replays):
- graph: directed adjacent-token pairs (u≠v) symmetrized by reversal,
  edge weight = total count in both directions;
- scores: s₀ = 1/|V_doc|; each step s'(v) = RESID/|V_doc| +
  DAMP·Σ_{(u,v)∈E} w/deg(u)·s(u) (isolated nodes keep RESID/|V_doc|);
  RESID and DAMP are exact float literals (0.15, 0.85 — NOT 1−0.85,
  which is 0.15000000000000002 in IEEE754);
- output: top-k per doc by (round(s,6) DESC, term ASC).
Float caveat: neighbor sums are order-sensitive at the ULP level; the
final round(·,6) absorbs it (same contract as pagerank/k-means).

Reference parity: the reference ranks packages with static priors
(`cmd/dcs-compute-ranking/main.go`); this is the per-document analogue
used for corpus keyword metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.tokenize import word_tokens_flat

RESID = 0.15  # exact literal, mirrored in the SQL replay
DAMP = 0.85


def _batch_textrank(
    b: pa.Table, k: int, n_iter: int, text_col: str, id_col: str
) -> pa.Table:
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        }
    )
    if len(b) == 0:
        return empty
    doc_ids = b[id_col].cast(pa.int64()).to_numpy()
    flat, parents = word_tokens_flat(b[text_col])
    if len(flat) == 0:
        return empty

    # node id per token: (local doc index, term dictionary code)
    dic = pa.chunked_array([flat]).combine_chunks().dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms_dict = dic.dictionary  # string array, code -> term
    n_codes = len(terms_dict)
    tok_key = parents.astype(np.int64) * n_codes + codes
    node_keys, tok_node = np.unique(tok_key, return_inverse=True)
    node_doc = node_keys // n_codes  # local doc index per node
    node_code = node_keys % n_codes
    n_nodes = len(node_keys)

    # directed adjacent pairs within a doc, u != v, then symmetrize
    same_doc = parents[1:] == parents[:-1]
    u = tok_node[:-1][same_doc]
    v = tok_node[1:][same_doc]
    ne = u != v
    u, v = u[ne], v[ne]
    eu = np.concatenate([u, v])
    ev = np.concatenate([v, u])
    ekey, w_int = np.unique(eu.astype(np.int64) * n_nodes + ev, return_counts=True)
    e_u = (ekey // n_nodes).astype(np.int64)
    e_v = (ekey % n_nodes).astype(np.int64)
    w = w_int.astype(np.float64)

    deg = np.zeros(n_nodes, np.float64)
    np.add.at(deg, e_u, w)
    nv = np.bincount(node_doc, minlength=len(doc_ids)).astype(np.float64)
    nv_of_node = nv[node_doc]

    s = 1.0 / nv_of_node
    base = RESID / nv_of_node
    wd = w / deg[e_u]  # w/deg(u) is iteration-invariant
    for _ in range(n_iter):
        acc = np.zeros(n_nodes, np.float64)
        np.add.at(acc, e_v, wd * s[e_u])
        s = base + DAMP * acc

    score = np.round(s, 6) + 0.0
    out = pa.table(
        {
            id_col: pa.array(doc_ids[node_doc], pa.int64()),
            "term": terms_dict.take(pa.array(node_code)),
            "score": pa.array(score, pa.float64()),
        }
    ).sort_by(
        [(id_col, "ascending"), ("score", "descending"), ("term", "ascending")]
    )
    d_sorted = out[id_col].to_numpy()
    # rank = position within each doc run of the sorted table
    starts = np.flatnonzero(np.r_[True, d_sorted[1:] != d_sorted[:-1]])
    run_id = np.cumsum(np.r_[True, d_sorted[1:] != d_sorted[:-1]]) - 1
    rank = np.arange(len(d_sorted), dtype=np.int64) - starts[run_id] + 1
    keep = rank <= k
    sel = pa.array(np.flatnonzero(keep))
    return pa.table(
        {
            id_col: out[id_col].take(sel),
            "rank": pa.array(rank[keep], pa.int64()),
            "term": out["term"].take(sel),
            "score": out["score"].take(sel),
        }
    )


def textrank_keywords(
    ds: ray.data.Dataset,
    k: int = 3,
    n_iter: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k TextRank keywords per document; see module docstring."""
    return ds.map_batches(
        lambda b: _batch_textrank(b, k, n_iter, text_col, id_col),
        batch_format="pyarrow",
    )
