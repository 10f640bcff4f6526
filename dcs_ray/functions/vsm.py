"""Vector-space model retrieval: tf-idf cosine ranking.

The classical Salton/SMART family next to the probabilistic (BM25),
language-model (QLD/JM) and DFR (PL2) scorers already in the engine:
documents and queries are tf·idf vectors, ranked by cosine,

    idf_t   = ln(N / df_t)                     (classic smooth-free idf)
    d_t     = tf_t,d · idf_t
    ||d||   = sqrt(Σ_t d_t²)          (over ALL the doc's terms)
    score   = Σ_{t∈q} tf_t,d · idf_t² / (||q|| · ||d||)

with query weights q_t = idf_t (unit query tf), so ||q|| is the
rank-neutral per-query constant kept for exact score replay.

Scale shape: the doc-norm table is the one piece BM25 doesn't need —
it requires every term of every doc (not just query terms), so it is
computed ONCE as an index-side artifact: a single streaming pass over
the corpus (per-batch: token counts → idf lookup against the
broadcast vocab-scale df table → one bincount fold per doc) written
as doc-id-sorted Parquet next to the index. Query-time shard tasks
then read ONLY their doc-id range of the norm table (predicate
pushdown), exactly like doc_meta. The df broadcast is the ST2
ranking-data role (vocab-scale, not corpus-scale).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


def _df_arrays(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted term array, df array) from the index's stats sink."""
    t = pq.read_table(os.path.join(index_dir, "stats", "df.parquet"))
    terms = np.asarray(t["term"].to_pylist(), dtype=object)
    dfs = t["df"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    return terms[order], dfs[order]


def tfidf_doc_norms(
    docs: ray.data.Dataset,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """One streaming pass → ``out_dir`` Parquet of (doc_id, norm):
    ||d|| = sqrt(Σ_t (tf·idf)²) over every term of the doc. The df
    table ships once via ``ray.put``; per batch the fold is a token
    count + searchsorted idf gather + one squared-weight bincount."""
    from dcs_ray.tokenize import word_tokens_flat

    from dcs_ray.search import load_stats

    terms_s, dfs_s = _df_arrays(index_dir)
    n_docs = int(load_stats(index_dir)["n_docs"])
    idf_s = np.log(n_docs / np.maximum(dfs_s.astype(np.float64), 1.0))
    ref = ray.put((terms_s, idf_s))

    def f(b: pa.Table) -> pa.Table:
        ts, idfs = ray.get(ref)
        flat, parents = word_tokens_flat(b[text_col])
        toks = np.asarray(flat.to_pylist(), dtype=object)
        n = len(b)
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: b[id_col],
                    "norm": pa.array(np.zeros(n), pa.float64()),
                }
            )
        # distinct (doc, term) counts within the batch (docs never span
        # batches): sort by (parent, term), run-length count
        order = np.lexsort((toks, parents))
        tp, pp = toks[order], parents[order]
        new = np.concatenate(
            ([True], (pp[1:] != pp[:-1]) | (tp[1:] != tp[:-1]))
        )
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(tp)]))).astype(np.float64)
        gterm = tp[starts]
        gdoc = pp[starts]
        pos = np.searchsorted(ts, gterm)
        pos_c = np.minimum(pos, len(ts) - 1)
        hit = (pos < len(ts)) & (ts[pos_c] == gterm)
        idf = np.where(hit, idfs[pos_c], 0.0)
        w2 = (cnt * idf) ** 2
        norm2 = np.bincount(gdoc, weights=w2, minlength=n)
        return pa.table(
            {
                id_col: b[id_col],
                "norm": pa.array(
                    np.round(np.sqrt(norm2), 6) + 0.0, pa.float64()
                ),
            }
        )

    docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    ).write_parquet(out_dir)
    return out_dir


def search_tfidf_cosine(
    index_dir: str,
    norms_dir: str,
    queries: list[str] | str,
    k: int = 10,
    task_num_cpus: float = 1.0,
) -> pa.Table:
    """tf-idf cosine top-k over the inverted index + the norm artifact.

    Same query×shard fan-out as BM25; a shard task reads only its
    doc-id range of the norm table (Parquet predicate pushdown) and
    caches it per worker keyed on the shard generation. The doc norm is
    pre-ROUNDED to 6 dp in the artifact (it is an on-disk float
    column), which the SQL oracle mirrors — scores then replay
    exactly."""
    import pyarrow.dataset as pads

    from dcs_ray.search import (
        _decode_term_filtered,
        _collect,
        _open,
        global_df,
        load_stats,
        shard_paths,
        topk,
    )
    from dcs_ray.tokenize import tokenize_query_words

    if isinstance(queries, str):
        queries = [queries]
    stats = load_stats(index_dir)
    n_docs = int(stats["n_docs"])
    per_query = [sorted(set(tokenize_query_words(q))) for q in queries]
    all_terms = sorted({t for ts in per_query for t in ts})
    dfs = global_df(index_dir, all_terms)
    idf = {
        t: math.log(n_docs / df) for t, df in dfs.items() if df > 0
    }
    q_norms = [
        math.sqrt(sum(idf[t] ** 2 for t in ts if t in idf)) or 1.0
        for ts in per_query
    ]
    shards = shard_paths(index_dir)

    def run_shard(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for sid in batch["shard_id"].to_pylist():
            seg = _open(shards[sid])
            lo, hi = int(seg.doc_ids[0]), int(seg.doc_ids[-1])
            nt = pads.dataset(norms_dir).to_table(
                filter=(pads.field("doc_id") >= lo)
                & (pads.field("doc_id") <= hi),
                columns=["doc_id", "norm"],
            ).sort_by("doc_id")
            nid = nt["doc_id"].to_numpy().astype(np.int64)
            nvals = nt["norm"].to_numpy()
            for qid, ts in enumerate(per_query):
                doc_chunks, score_chunks = [], []
                for t in ts:
                    if t not in idf:
                        continue
                    tidx = seg.term_index(t)
                    if tidx < 0:
                        continue
                    d, tf = _decode_term_filtered(seg, tidx, None)
                    if not len(d):
                        continue
                    doc_chunks.append(d)
                    score_chunks.append(
                        tf.astype(np.float64) * idf[t] * idf[t]
                    )
                if not doc_chunks:
                    continue
                docs_a = np.concatenate(doc_chunks)
                sc = np.concatenate(score_chunks)
                o = np.argsort(docs_a, kind="stable")
                docs_a, sc = docs_a[o], sc[o]
                bnd = np.concatenate(
                    ([0], np.flatnonzero(docs_a[1:] != docs_a[:-1]) + 1)
                )
                uniq = docs_a[bnd]
                sums = np.add.reduceat(sc, bnd)
                pos = np.searchsorted(nid, uniq.astype(np.int64))
                pos_c = np.minimum(pos, len(nid) - 1)
                dn = np.where(
                    (pos < len(nid)) & (nid[pos_c] == uniq.astype(np.int64)),
                    nvals[pos_c],
                    0.0,
                )
                ok = dn > 0
                uniq, sums, dn = uniq[ok], sums[ok], dn[ok]
                scores = sums / (q_norms[qid] * dn)
                d, s = topk(uniq, scores, k)
                out_q.extend([qid] * len(d))
                out_d.append(d)
                out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "score": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, np.float64),
                    pa.float64(),
                ),
            }
        )

    work = ray.data.from_items([{"shard_id": s} for s in range(len(shards))])
    cand = _collect(
        work.map_batches(
            run_shard, batch_size=1, batch_format="pyarrow",
            num_cpus=task_num_cpus,
        ),
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("score", pa.float64())]
        ),
    )
    qids = cand["query_id"].to_numpy()
    docs_a = cand["doc_id"].to_numpy()
    scores = cand["score"].to_numpy()
    out_tables = []
    for qid in range(len(queries)):
        m = qids == qid
        dd, ss = topk(docs_a[m], scores[m], k)
        out_tables.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                    "rank": pa.array(
                        np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()
                    ),
                    "doc_id": pa.array(dd, pa.uint64()),
                    "score": pa.array(ss, pa.float64()),
                }
            )
        )
    return pa.concat_tables(out_tables)
