"""Prospective search: match a DOCUMENT STREAM against registered
standing queries (Google-Alerts / publish-subscribe IR; the classic
design is SIFT — Yan & Garcia-Molina, "Index structures for selective
dissemination of information", TODS '94).

The retrieval index is INVERTED twice: the standing queries (tiny,
vs the corpus) are compiled into a term → (query, slot) table that is
broadcast once; each arriving document batch tokenizes, probes the
table, and counts per (doc, query) how many of the query's DISTINCT
terms the doc contains — a conjunctive query fires when the count
reaches its term count. No shuffle at all: the stream maps straight to
(doc_id, query_id) alert rows.

Per-batch kernel: one tokenize, one per-doc term dedup (lexsort +
run-length), one searchsorted probe into the broadcast term list, one
bincount over (doc, query) pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def compile_queries(queries: list[list[str]]) -> dict:
    """Standing conjunctive queries → broadcastable probe table:
    sorted unique term array, per-term (query_id, ...) postings as a
    flat CSR, and per-query required distinct-term counts."""
    if any(not q for q in queries):
        # an empty conjunction compiles to need=0 and `cnt >= 0` fires
        # an alert for every document in the stream — reject up front
        raise ValueError("standing queries must contain at least one term")
    terms = sorted({t for q in queries for t in q})
    tarr = np.asarray(terms, dtype=object)
    post: list[list[int]] = [[] for _ in terms]
    tindex = {t: i for i, t in enumerate(terms)}
    need = np.zeros(len(queries), np.int64)
    for qid, q in enumerate(queries):
        uq = sorted(set(q))
        need[qid] = len(uq)
        for t in uq:
            post[tindex[t]].append(qid)
    lens = np.array([len(p) for p in post], np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = np.array([q for p in post for q in p], np.int64)
    return {"terms": tarr, "offs": offs, "flat": flat, "need": need}


def match_stream(
    docs: ray.data.Dataset,
    compiled_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, query_id) alert rows: doc contains EVERY distinct term
    of the standing query. ``compiled_ref`` is ``ray.put(compile_
    queries(...))`` — shipped once, probed per batch."""
    from dcs_ray.tokenize import word_tokens_flat

    def f(b: pa.Table) -> pa.Table:
        comp = ray.get(compiled_ref) if not isinstance(compiled_ref, dict) \
            else compiled_ref
        terms, offs, flat, need = (
            comp["terms"], comp["offs"], comp["flat"], comp["need"],
        )
        nq = len(need)
        ids = b[id_col].to_numpy()
        ftoks, parents = word_tokens_flat(b[text_col])
        toks = np.asarray(ftoks.to_pylist(), dtype=object)
        if len(toks) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "query_id": pa.array([], pa.int64())}
            )
        # per-doc distinct terms
        order = np.lexsort((toks, parents))
        tp, pp = toks[order], parents[order]
        first = np.concatenate(
            ([True], (pp[1:] != pp[:-1]) | (tp[1:] != tp[:-1]))
        )
        tp, pp = tp[first], pp[first]
        # probe the broadcast term list
        pos = np.searchsorted(terms, tp)
        pos_c = np.minimum(pos, len(terms) - 1)
        hit = (pos < len(terms)) & (terms[pos_c] == tp)
        tp_i, pp_i = pos_c[hit], pp[hit]
        if len(tp_i) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "query_id": pa.array([], pa.int64())}
            )
        # expand to (doc, query) pairs via the CSR postings (vectorized
        # range concat — the codec's scatter-range helper)
        from dcs_ray.codec import _ranges

        lens = (offs[tp_i + 1] - offs[tp_i]).astype(np.int64)
        doc_rep = np.repeat(pp_i, lens)
        idx = _ranges(offs[tp_i], lens)
        q_rep = flat[idx]
        key = doc_rep * nq + q_rep
        cnt = np.bincount(key, minlength=len(ids) * nq)
        cnt = cnt.reshape(len(ids), nq)
        dd, qq = np.nonzero(cnt >= need[None, :])
        return pa.table(
            {
                id_col: pa.array(ids[dd].astype(np.int64), pa.int64()),
                "query_id": pa.array(qq.astype(np.int64), pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
