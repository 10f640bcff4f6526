"""Query engine: BM25 top-k + trigram candidate generation over shards.

The read path mirrors dcs's source-backend (``SURVEY.md §3.2``):
queries fan out to every doc-sharded index, each shard computes local
candidates/scores with globally-broadcast corpus stats, then a global
top-k merge per query (``cmd/dcs-web/querymanager.go:479-548``'s
incremental top-10, rebuilt as a small deterministic sort).

Shard state (the dcs mmap'd open index, ST1 —
``internal/index/read.go:374-407``) is held in a per-worker-process
cache: a shard's term dictionary and memory-mapped postings are opened
once per worker and reused across query batches. With
``groupby(shard_id).map_groups`` each group lands on some worker whose
cache warms after the first batch — the Ray-idiomatic stand-in for
pinned per-shard actors, and correct at any placement.

Scoring determinism (SURVEY §7.5): scores are float64, accumulated per
document in ascending-term order; every posting of a document lives in
exactly one shard, so the summation order — and hence the score bits —
is independent of shard count and parallelism. Ties break by ascending
doc_id (dcs breaks by pathHash, ``querymanager.go:119-124``).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from dcs_ray.codec import decode_postings, iter_blocks, decode_block, unpack_positions
from dcs_ray.index.merge import shard_name
from dcs_ray.index.segment import Segment
from dcs_ray.tokenize import string_trigrams, tokenize_query_words

_SEGMENT_CACHE: dict[str, Segment] = {}


def _open(path: str) -> Segment:
    seg = _SEGMENT_CACHE.get(path)
    if seg is not None:
        # an updated/rebuilt index at the same path must be re-opened
        # (dcs re-opens after the ReplaceIndex symlink swap)
        st = os.stat(os.path.join(path, "term_dict.parquet"))
        if (st.st_mtime_ns, st.st_size) != seg.gen:
            seg = None
    if seg is None:
        seg = Segment(path)
        _SEGMENT_CACHE[path] = seg
    return seg


# Bounded per-worker cache of decoded posting lists, keyed by
# (segment path, term index). Production query logs repeat hot terms
# constantly; dcs keeps reusable decode buffers per open index for the
# same reason (``internal/index/read.go:84-98,417-446``). FIFO-with-
# promotion (LRU) eviction under a byte cap.
from collections import OrderedDict

_DECODE_CACHE: "OrderedDict[tuple[str, int], tuple[np.ndarray, np.ndarray]]" = OrderedDict()
_DECODE_CACHE_BYTES = 0
DECODE_CACHE_CAP = 256 << 20


def _decode_term_cached(seg: Segment, idx: int) -> tuple[np.ndarray, np.ndarray]:
    global _DECODE_CACHE_BYTES
    key = (seg.path, seg.gen, idx)
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        _DECODE_CACHE.move_to_end(key)
        return hit
    d, t = decode_postings(seg.term_blob(idx))
    _DECODE_CACHE[key] = (d, t)
    _DECODE_CACHE_BYTES += d.nbytes + t.nbytes
    while _DECODE_CACHE_BYTES > DECODE_CACHE_CAP and _DECODE_CACHE:
        _, (od, ot) = _DECODE_CACHE.popitem(last=False)
        _DECODE_CACHE_BYTES -= od.nbytes + ot.nbytes
    return d, t


_BLOCK_CACHE: "OrderedDict[tuple[str, int, int, int], tuple[np.ndarray, np.ndarray]]" = OrderedDict()
_BLOCK_CACHE_BYTES = 0


def _block_cache_get(seg: Segment, idx: int, bi: int):
    """Per-worker LRU of decoded posting BLOCKS — the partial-decode
    sibling of ``_decode_term_cached``: BMW decodes only the blocks a
    query's θ couldn't prune, and query logs repeat hot terms, so the
    same blocks recur across calls (without this, a 20-query batch paid
    a fresh decode per query while the exhaustive path amortized
    through its full-term caches)."""
    hit = _BLOCK_CACHE.get((seg.path, seg.gen, idx, bi))
    if hit is not None:
        _BLOCK_CACHE.move_to_end((seg.path, seg.gen, idx, bi))
    return hit


def _block_cache_put(seg: Segment, idx: int, bi: int, hit) -> None:
    # HALF the full-decode budget: a worker serving mixed bmw +
    # exhaustive traffic can hold a term both here (blocks) and in
    # _DECODE_CACHE (full) — the smaller cap bounds that worst-case
    # duplication instead of adding a third full-size budget
    global _BLOCK_CACHE_BYTES
    _BLOCK_CACHE[(seg.path, seg.gen, idx, bi)] = hit
    _BLOCK_CACHE_BYTES += hit[0].nbytes + hit[1].nbytes
    while _BLOCK_CACHE_BYTES > DECODE_CACHE_CAP // 2 and _BLOCK_CACHE:
        _, (od, ot) = _BLOCK_CACHE.popitem(last=False)
        _BLOCK_CACHE_BYTES -= od.nbytes + ot.nbytes


_POS_DECODE_CACHE: "OrderedDict[tuple, tuple[np.ndarray, np.ndarray, np.ndarray]]" = OrderedDict()
_POS_DECODE_CACHE_BYTES = 0


def _decode_positions_cached(seg: Segment, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-worker LRU of decoded positional sections — literal/phrase
    query logs repeat hot trigrams just like scoring terms do (same
    rationale as ``_decode_term_cached``; shares the byte cap)."""
    global _POS_DECODE_CACHE_BYTES
    key = (seg.path, seg.gen, idx)
    hit = _POS_DECODE_CACHE.get(key)
    if hit is not None:
        _POS_DECODE_CACHE.move_to_end(key)
        return hit
    d, off, p = unpack_positions(seg.position_blob(idx))
    _POS_DECODE_CACHE[key] = (d, off, p)
    _POS_DECODE_CACHE_BYTES += d.nbytes + off.nbytes + p.nbytes
    while _POS_DECODE_CACHE_BYTES > DECODE_CACHE_CAP and _POS_DECODE_CACHE:
        _, (od, oo, op_) = _POS_DECODE_CACHE.popitem(last=False)
        _POS_DECODE_CACHE_BYTES -= od.nbytes + oo.nbytes + op_.nbytes
    return d, off, p


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats", "global.json")) as f:
        return json.load(f)


def shard_paths(index_dir: str) -> list[str]:
    root = os.path.join(index_dir, "shards")
    return [
        os.path.join(root, d)
        for d in sorted(os.listdir(root))
        if d.startswith("shard_") and not d.endswith(".tmp")
    ]


def global_df(index_dir: str, terms: list[str]) -> dict[str, int]:
    """Global document frequencies for query terms, via predicate-pushdown
    read of the term-sorted stats table (vocab-scale, not corpus-scale)."""
    if not terms:
        return {}
    import pyarrow.dataset as pads

    dset = pads.dataset(os.path.join(index_dir, "stats", "df.parquet"))
    tbl = dset.to_table(filter=pads.field("term").isin(terms))
    return dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))


def bm25_idf(df: int, n_docs: int) -> float:
    """idf = ln((N - df + 0.5)/(df + 0.5) + 1) — the north-rule formula."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def plan_query(index_dir: str, query: str, stats: dict) -> list[tuple[str, float]]:
    """Tokenize a query and attach per-term idf; terms sorted ascending so
    the per-doc accumulation order is fixed."""
    return plan_queries(index_dir, [query], stats)[0]


def plan_queries(index_dir: str, queries: list[str], stats: dict) -> list[list[tuple[str, float]]]:
    """Plan a whole query batch with ONE df-table read (the term dict is
    consulted once per batch, not once per query — dcs opens its meta
    index once per process, ``internal/index/read.go:374-407``)."""
    per_query = [sorted(tokenize_query_words(q)) for q in queries]
    all_terms = sorted({t for terms in per_query for t in terms})
    dfs = global_df(index_dir, all_terms)
    return [
        [(t, bm25_idf(dfs[t], stats["n_docs"])) for t in terms if dfs.get(t, 0) > 0]
        for terms in per_query
    ]


_ZONE_CACHE: dict[str, tuple[float, dict]] = {}


def _shard_lineage_cached(path: str) -> dict:
    lin = os.path.join(path, "lineage.json")
    try:
        mtime = os.stat(lin).st_mtime
    except OSError:
        return {}
    hit = _ZONE_CACHE.get(lin)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    with open(lin) as f:
        data = json.load(f)
    _ZONE_CACHE[lin] = (mtime, data)
    return data


def prune_shards(paths: list[str], filters: dict | None) -> list[str]:
    """Filter-dimension shard pruning: drop shards the filter spec can
    prove empty BEFORE any task is scheduled, from metadata alone —

    - ``include`` equality filters check the shard's zone map (the
      per-meta-column distinct-value sets merge records in its lineage,
      ``index/merge.py``; absent for high-cardinality columns → shard
      kept),
    - ``doc_ids`` candidate sets check the shard's doc-id range from
      parquet row-group statistics (``shard_id_bounds``).

    At web scale this is the keyword-routing step: a ``source:feedX``
    query fans out only to the shards whose partitions ever ingested
    feedX — O(shards) driver-side JSON/stat reads (mtime-cached), zero
    object-store traffic for the skipped shards."""
    if not filters:
        return list(paths)
    inc = filters.get("include") or {}
    ids = filters.get("doc_ids")
    if ids is not None and len(ids) == 0:
        return []
    if ids is not None:
        ids = np.asarray(ids, dtype=np.int64)
    keep = []
    for p in paths:
        zones = _shard_lineage_cached(p).get("meta_values") or {}
        ok = True
        for col, vals in inc.items():
            zone = zones.get(col)
            if zone is not None and not (set(vals) & set(zone)):
                ok = False
                break
        if ok and ids is not None:
            lo, hi = shard_id_bounds(p)
            if not ((ids >= lo) & (ids <= hi)).any():
                ok = False
        if ok:
            keep.append(p)
    return keep


def _with_tombstones(index_dir: str, filters: dict | None) -> dict | None:
    """Fold the index's tombstone set (``index/deletes.py``) into the
    filter spec as ``not_doc_ids`` so a deleted doc can never be
    returned, Lucene live-docs style: one driver-side parquet read per
    search call, broadcast to shard tasks inside the filters dict.
    No-op (returns ``filters`` unchanged) when no tombstones exist."""
    from dcs_ray.index.deletes import load_tombstones

    dead = load_tombstones(index_dir)
    if len(dead) == 0:
        return filters
    filters = dict(filters or {})
    prev = filters.get("not_doc_ids")
    if prev is not None and len(prev):
        dead = np.union1d(np.asarray(prev, dtype=np.uint64), dead)
    filters["not_doc_ids"] = dead
    return filters


def shard_doc_filter(seg: Segment, filters: dict | None) -> np.ndarray | None:
    """Sorted doc ids of one shard passing the keyword filters — the
    FilterByKeywords stage applied *inside the backend before ranking*
    (``internal/sourcebackend/sourcebackend.go:28-129,354``), vectorized
    over the shard's doc_meta attributes.

    ``filters`` spec: ``{"include": {col: [vals]}, "exclude": {col:
    [vals]}, "url_regex": [rx], "not_url_regex": [rx], "doc_ids":
    [ids], "not_doc_ids": [ids], "terms_all": [t], "terms_none": [t]}``
    — OR within a column's value list, AND across entries;
    ``not_doc_ids`` excludes an explicit id set (how tombstone deletes
    reach ranking, ``index/deletes.py``); ``terms_all``/``terms_none``
    require/forbid posting-list membership, evaluated per shard (the
    ``-term`` query operator);
    ``doc_ids`` restricts to an explicit candidate set (how a phrase /
    positional pre-pass composes with ranking). Returns None when no
    filtering is requested (score everything)."""
    if not filters:
        return None
    mask = np.ones(len(seg.doc_ids), dtype=bool)
    dead = filters.get("not_doc_ids")  # tombstones (index/deletes.py)
    if dead is not None and len(dead):
        dead = np.sort(np.asarray(dead, dtype=np.uint64))
        pos = np.searchsorted(dead, seg.doc_ids)
        mask &= ~(
            (pos < len(dead))
            & (dead[np.minimum(pos, len(dead) - 1)] == seg.doc_ids)
        )
    ids = filters.get("doc_ids")
    if ids is not None:
        ids = np.sort(np.asarray(ids, dtype=np.int64))
        if len(ids) == 0:
            mask &= False
        else:
            pos = np.searchsorted(ids, seg.doc_ids)
            mask &= (pos < len(ids)) & (
                ids[np.minimum(pos, len(ids) - 1)] == seg.doc_ids
            )
    for col, vals in (filters.get("include") or {}).items():
        mask &= pc.is_in(seg.meta(col), value_set=pa.array(vals)).to_numpy(
            zero_copy_only=False
        )
    for col, vals in (filters.get("exclude") or {}).items():
        mask &= ~pc.is_in(seg.meta(col), value_set=pa.array(vals)).to_numpy(
            zero_copy_only=False
        )
    for rx in filters.get("url_regex") or ():
        mask &= pc.match_substring_regex(seg.urls, rx).to_numpy(zero_copy_only=False)
    for rx in filters.get("not_url_regex") or ():
        mask &= ~pc.match_substring_regex(seg.urls, rx).to_numpy(zero_copy_only=False)
    # posting-membership constraints, evaluated against THIS shard's own
    # posting lists (decoded through the per-worker LRU) — the -term /
    # +term query operators with NO driver-side id materialization: a
    # negated stopword would otherwise ship half the corpus's ids
    def _member(term: str) -> np.ndarray:
        idx = seg.term_index(term)
        if idx < 0:
            return np.zeros(len(seg.doc_ids), dtype=bool)
        pl = _decode_term_cached(seg, idx)[0]  # sorted uint64 doc ids
        pos = np.searchsorted(pl, seg.doc_ids)
        return (pos < len(pl)) & (pl[np.minimum(pos, len(pl) - 1)] == seg.doc_ids)

    for term in filters.get("terms_none") or ():
        mask &= ~_member(term)
    for term in filters.get("terms_all") or ():
        mask &= _member(term)
    return seg.doc_ids[mask]  # doc_ids are ascending by construction


def filters_from_keywords(includes: dict, negates: dict) -> dict | None:
    """Map ``rewrite_query`` keyword dicts (F4) onto the filter spec:
    ``source:``/``site:`` → doc_meta column equality, ``lang:``/
    ``filetype:`` → lang column, ``path:``/``file:`` → url regex."""
    spec: dict = {"include": {}, "exclude": {}, "url_regex": [], "not_url_regex": []}
    col_of = {"source": "source", "site": "source", "lang": "lang", "filetype": "lang"}
    for kw, vals in includes.items():
        if kw in col_of:
            spec["include"].setdefault(col_of[kw], []).extend(vals)
        elif kw in ("path", "file", "package", "pkg"):
            spec["url_regex"].extend(vals)
    for kw, vals in negates.items():
        if kw in col_of:
            spec["exclude"].setdefault(col_of[kw], []).extend(vals)
        elif kw in ("path", "file", "package", "pkg"):
            spec["not_url_regex"].extend(vals)
    if not any(spec.values()):
        return None
    return spec


def _shard_prior(seg: Segment, prior_col: str, uniq_docs: np.ndarray) -> np.ndarray:
    """Static per-doc rank prior for the given docs (the broadcast
    pkg→ranking join J6: ``ranking/pre-ranking.go:54-103`` — here a
    doc_meta column multiplied into the text score)."""
    vals = seg.meta(prior_col).combine_chunks().to_numpy(zero_copy_only=False)
    return vals[np.searchsorted(seg.doc_ids, uniq_docs)].astype(np.float64)


def score_shard_all(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    doc_filter: np.ndarray | None = None,
    return_counts: bool = False,
) -> tuple[np.ndarray, np.ndarray] | tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exhaustive BM25 scores of every (filtered) candidate doc in one
    shard → (doc_ids ascending, scores). Per-doc accumulation is in
    ascending-term order (determinism, SURVEY §7.5). With
    ``return_counts`` also returns the number of DISTINCT query terms
    matched per doc (posting lists hold each doc at most once per term,
    so the per-doc contribution count IS the distinct-match count) —
    the minimum-should-match input."""
    doc_chunks, score_chunks = [], []
    for term, idf in plan:  # ascending term order
        idx = seg.term_index(term)
        if idx < 0:
            continue
        doc_ids, s = _term_contribs(seg, idx, idf, stats, doc_filter=doc_filter)
        doc_chunks.append(doc_ids)
        score_chunks.append(s)
    if not doc_chunks:
        empty = (np.empty(0, np.uint64), np.empty(0, np.float64))
        return (*empty, np.empty(0, np.int64)) if return_counts else empty
    docs = np.concatenate(doc_chunks)
    scores = np.concatenate(score_chunks)
    order = np.argsort(docs, kind="stable")  # term order preserved per doc
    docs, scores = docs[order], scores[order]
    boundaries = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
    uniq_docs = docs[boundaries]
    sums = np.add.reduceat(scores, boundaries)
    if return_counts:
        counts = np.diff(np.append(boundaries, len(docs)))
        return uniq_docs, sums, counts
    return uniq_docs, sums


def score_shard_bm25(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
    prior_col: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """BM25-score one query against one shard → (top-k doc_ids, scores)."""
    uniq_docs, sums = score_shard_all(seg, plan, stats, doc_filter)
    if prior_col is not None and len(uniq_docs):
        sums = sums * _shard_prior(seg, prior_col, uniq_docs)
    return topk(uniq_docs, sums, k)


def score_shard_bm25_msm(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
    min_match: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-should-match BM25: rank only docs matching at least
    ``min_match`` DISTINCT query terms (Lucene's minimumShouldMatch on
    a BooleanQuery of SHOULD term clauses). Counting happens shard-
    locally on the same contribution stream the exhaustive scorer
    already builds — no extra posting decode, and the per-shard top-k
    is taken AFTER the filter, so the driver merge still sees only
    k×shards survivors."""
    uniq_docs, sums, counts = score_shard_all(seg, plan, stats, doc_filter, return_counts=True)
    keep = counts >= min_match
    return topk(uniq_docs[keep], sums[keep], k)


def _bm25_term_scores(
    seg: Segment, doc_ids: np.ndarray, tfs: np.ndarray, idf: float, stats: dict
) -> np.ndarray:
    k1, b, avgdl = stats["k1"], stats["b"], stats["avgdl"] or 1.0
    tf = tfs.astype(np.float64)
    dl = seg.doc_len[np.searchsorted(seg.doc_ids, doc_ids)].astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


# Per-(segment, term) BM25 contribution vectors are QUERY-INDEPENDENT:
# idf, tf and dl are all fixed given the corpus stats, so the scored
# vector is computed once and reused across every query that mentions
# the term (the ranking-data caching role of dcs's per-backend state,
# ``ranking/pre-ranking.go:28-42``). Keyed with a stats fingerprint so a
# rebuilt index never reuses stale scores. Shares the LRU byte budget
# with the decode cache.
_SCORE_CACHE: "OrderedDict[tuple, tuple[np.ndarray, np.ndarray]]" = OrderedDict()
_SCORE_CACHE_BYTES = 0


def _score_key(seg: Segment, idx: int, stats: dict) -> tuple:
    """Cache key covering everything a BM25 contribution vector depends
    on: the exact on-disk build (path+gen) and every scoring parameter
    (k1/b/n_docs/avgdl) — a caller-supplied stats dict with different
    k1/b can never hit a stale vector."""
    return (seg.path, seg.gen, idx, stats["k1"], stats["b"], stats["n_docs"], stats["avgdl"])


def _term_scores_cached(
    seg: Segment, idx: int, idf: float, stats: dict
) -> tuple[np.ndarray, np.ndarray]:
    global _SCORE_CACHE_BYTES
    key = _score_key(seg, idx, stats)
    hit = _SCORE_CACHE.get(key)
    if hit is not None:
        _SCORE_CACHE.move_to_end(key)
        return hit
    doc_ids, tfs = _decode_term_cached(seg, idx)
    s = _bm25_term_scores(seg, doc_ids, tfs, idf, stats)
    _SCORE_CACHE[key] = (doc_ids, s)
    _SCORE_CACHE_BYTES += doc_ids.nbytes + s.nbytes
    while _SCORE_CACHE_BYTES > DECODE_CACHE_CAP and _SCORE_CACHE:
        _, (od, os_) = _SCORE_CACHE.popitem(last=False)
        _SCORE_CACHE_BYTES -= od.nbytes + os_.nbytes
    return doc_ids, s


def _term_contribs(
    seg: Segment,
    idx: int,
    idf: float,
    stats: dict,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact BM25 contributions of one term: (doc_ids, scores).

    With ``doc_filter`` (sorted unique doc ids), only blocks whose
    ``[first_docid, max_docid]`` range contains a candidate are decoded —
    the block-max skip of dcs's windowed DeltaReader
    (``internal/index/read.go:269-308``) put to WAND use. A cached
    full-score vector short-circuits both paths."""
    key = _score_key(seg, idx, stats)
    if doc_filter is None or key in _SCORE_CACHE:
        doc_ids, s = _term_scores_cached(seg, idx, idf, stats)
        if doc_filter is not None:
            pos = np.searchsorted(doc_filter, doc_ids)
            pos = np.minimum(pos, len(doc_filter) - 1)
            m = doc_filter[pos] == doc_ids
            doc_ids, s = doc_ids[m], s[m]
        return doc_ids, s
    firsts, maxes, _mtf, boffs, blens = seg.term_headers(idx)
    lo = np.searchsorted(doc_filter, firsts)
    hi = np.searchsorted(doc_filter, maxes, side="right")
    keep = np.flatnonzero(hi > lo)  # block contains >=1 candidate
    if len(keep) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    blob = seg.term_blob(idx)
    parts_d, parts_t = [], []
    for bi in keep:
        h_and_body = blob[boffs[bi] : boffs[bi] + blens[bi]]
        for header, body in iter_blocks(np.ascontiguousarray(h_and_body)):
            d, t = decode_block(header, body)
            parts_d.append(d)
            parts_t.append(t)
    doc_ids = np.concatenate(parts_d)
    tfs = np.concatenate(parts_t)
    pos = np.searchsorted(doc_filter, doc_ids)
    pos = np.minimum(pos, len(doc_filter) - 1)
    m = doc_filter[pos] == doc_ids
    doc_ids, tfs = doc_ids[m], tfs[m]
    if len(doc_ids) == 0:
        return doc_ids, np.empty(0, np.float64)
    return doc_ids, _bm25_term_scores(seg, doc_ids, tfs, idf, stats)


def _merge_sorted_acc(
    a_docs: np.ndarray, a_scores: np.ndarray, b_docs: np.ndarray, b_scores: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    docs = np.concatenate((a_docs, b_docs))
    scores = np.concatenate((a_scores, b_scores))
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    boundaries = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
    return docs[boundaries], np.add.reduceat(scores, boundaries)


def score_shard_bm25_maxscore(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND/MaxScore BM25 top-k over one shard — exact, same
    bits as the exhaustive path.

    Terms ordered by score upper bound (idf·(k1+1)·max_tf/(max_tf+k1(1−b)),
    the dl→0 bound); a term whose suffix upper-bound sum can no longer
    lift a new document over the running kth-best threshold θ is
    *non-essential*: only surviving candidates are looked up in it, and
    only blocks whose (first_docid, max_docid) range holds a candidate are
    decoded (codec block-max metadata). Final scores are re-summed per doc
    in ascending-term order, so output bits are identical to
    ``score_shard_bm25`` regardless of pruning order (SURVEY §7.5
    determinism requirement)."""
    k1, b = stats["k1"], stats["b"]
    resolved = []
    for rank, (term, idf) in enumerate(plan):  # plan is term-ascending
        idx = seg.term_index(term)
        if idx < 0:
            continue
        mtf = float(seg.max_tf[idx])
        ub = idf * (mtf * (k1 + 1.0)) / (mtf + k1 * (1.0 - b))
        resolved.append((ub, rank, idx, idf))
    if not resolved:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    resolved.sort(key=lambda t: (-t[0], t[1]))
    ubs = np.array([t[0] for t in resolved], dtype=np.float64)
    suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1], [0.0]))

    contrib_docs: list[np.ndarray] = []
    contrib_ranks: list[np.ndarray] = []
    contrib_scores: list[np.ndarray] = []
    acc_docs = np.empty(0, np.uint64)
    acc_scores = np.empty(0, np.float64)
    theta = -np.inf
    for j, (_ub, rank, idx, idf) in enumerate(resolved):
        essential = j == 0 or suffix[j] >= theta
        if essential:
            d, s = _term_contribs(seg, idx, idf, stats, doc_filter=doc_filter)
            acc_docs, acc_scores = _merge_sorted_acc(acc_docs, acc_scores, d, s)
        else:
            # prune: doc needs acc + remaining upper bounds >= θ (with a
            # 1-ulp-scale safety margin so float order never mis-prunes)
            bound = theta * (1.0 - 1e-12) - 1e-300
            alive = acc_scores + suffix[j] >= bound
            acc_docs, acc_scores = acc_docs[alive], acc_scores[alive]
            if len(acc_docs) == 0:
                break
            d, s = _term_contribs(seg, idx, idf, stats, doc_filter=acc_docs)
            if len(d):
                pos = np.searchsorted(acc_docs, d)
                acc_scores[pos] += s
        if len(d):
            contrib_docs.append(d)
            contrib_ranks.append(np.full(len(d), rank, dtype=np.int32))
            contrib_scores.append(s)
        if len(acc_scores) >= k:
            kth = np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
            if kth > theta:
                theta = kth

    if not contrib_docs:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    docs = np.concatenate(contrib_docs)
    ranks = np.concatenate(contrib_ranks)
    scores = np.concatenate(contrib_scores)
    # deterministic re-sum: per doc, ascending term (plan rank) order —
    # bit-identical to the exhaustive path's accumulation
    order = np.lexsort((ranks, docs))
    docs, scores = docs[order], scores[order]
    boundaries = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
    uniq_docs = docs[boundaries]
    sums = np.add.reduceat(scores, boundaries)
    return topk(uniq_docs, sums, k)


def _bmw_block(
    seg: Segment,
    idx: int,
    bi: int,
    firsts: np.ndarray,
    maxes: np.ndarray,
    boffs: np.ndarray,
    blens: np.ndarray,
    term_full: dict,
    counters: dict | None,
):
    """Resolve one posting block WITHOUT fresh decode work when
    possible: a full-term decode left by the exhaustive/maxscore caches
    is sliced by the block's id range (zero-copy views); otherwise the
    per-worker block LRU. Returns None on a true miss (caller decodes
    and publishes)."""
    full = term_full.get(idx)
    if full is not None:
        lo = int(np.searchsorted(full[0], firsts[bi]))
        hi = int(np.searchsorted(full[0], maxes[bi], side="right"))
        hit = (full[0][lo:hi], full[1][lo:hi])
        if counters is not None:
            counters["blocks_from_cache"] = counters.get("blocks_from_cache", 0) + 1
        return hit
    hit = _block_cache_get(seg, idx, bi)
    if hit is not None and counters is not None:
        counters["blocks_from_cache"] = counters.get("blocks_from_cache", 0) + 1
    return hit


def score_shard_bm25_bmw(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
    counters: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Interval-decomposed Block-Max WAND BM25 top-k — exact, same bits
    as the exhaustive path (a vectorized re-expression of Ding & Suel
    '11; dcs's block skip metadata is ``internal/index/read.go:269-308``).

    Where classic BMW walks documents DAAT and skips blocks whose
    max-score sum can't beat the running threshold θ, this variant works
    on the *elementary intervals* of the doc-id axis induced by every
    query term's block boundaries: within one interval the covering
    block set — hence the BM25 upper bound Σ_t blockmax(t) — is
    constant, so the bound for ALL intervals is one sorted-events prefix
    sum. Intervals are then scored in descending-bound chunks: decode
    only the blocks overlapping the chunk (each block at most once per
    call), full-score the chunk's docs, raise θ to the kth-best scored,
    and drop every remaining interval whose bound falls below θ (with
    the same 1-ulp margin MaxScore uses, so float order never
    mis-prunes). Docs in dropped intervals provably score < θ ≤ the
    final kth-best. Final per-doc accumulation is re-summed in
    ascending-term order → bit-identical to ``score_shard_bm25``.

    ``counters``: optional dict accumulating ``blocks_decoded`` /
    ``blocks_total`` — the pruning-effectiveness instrumentation the
    BMW pytest asserts on (skew ⇒ decoded ≪ total)."""
    k1, b = stats["k1"], stats["b"]
    resolved = []  # (plan_rank, idx, idf)
    for rank, (term, idf) in enumerate(plan):
        idx = seg.term_index(term)
        if idx >= 0:
            resolved.append((rank, idx, idf))
    if not resolved:
        return np.empty(0, np.uint64), np.empty(0, np.float64)

    # per-term block metadata + per-block score upper bounds (dl→0).
    # SPARSE terms (few blocks) get PER-POSTING events instead: a rare
    # term's single block typically spans the whole doc-id axis, so its
    # block-max would inflate EVERY interval's bound and defeat pruning
    # (measured: 72% of 'common' blocks decoded on a 4M-doc skew corpus
    # whose 50-posting 'rare' block covered the axis; with per-posting
    # events the bound collapses to ub_common outside the actual rare
    # docs and those intervals prune). Decoding a sparse term up front
    # costs ≤ SPARSE_BLOCKS tiny blocks — cached for the scoring loop.
    SPARSE_BLOCKS = 32  # ≤ ~4k postings at 128/block
    term_hdrs = []
    all_firsts, all_ends, all_ubs = [], [], []
    blocks_total = 0
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    term_full: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for rank, idx, idf in resolved:
        firsts, maxes, mtfs, boffs, blens = seg.term_headers(idx)
        mtf = mtfs.astype(np.float64)
        ubs = idf * (mtf * (k1 + 1.0)) / (mtf + k1 * (1.0 - b))
        term_hdrs.append((rank, idx, idf, firsts, maxes, boffs, blens, ubs))
        blocks_total += len(firsts)
        # an earlier exhaustive/maxscore call may have left the FULL
        # decode in the worker cache — slice blocks out of it for free
        full = _DECODE_CACHE.get((seg.path, seg.gen, idx))
        if full is not None:
            _DECODE_CACHE.move_to_end((seg.path, seg.gen, idx))
            term_full[idx] = full
        if 0 < len(firsts) <= SPARSE_BLOCKS:
            blob = None
            pd_, pt_ = [], []
            for bi in range(len(firsts)):
                hit = _bmw_block(
                    seg, idx, int(bi), firsts, maxes, boffs, blens,
                    term_full, counters,
                )
                if hit is None:
                    if blob is None:
                        blob = seg.term_blob(idx)
                    h_and_body = blob[boffs[bi] : boffs[bi] + blens[bi]]
                    for header, body in iter_blocks(np.ascontiguousarray(h_and_body)):
                        hit = decode_block(header, body)
                    _block_cache_put(seg, idx, int(bi), hit)
                    if counters is not None:
                        counters["blocks_decoded"] = counters.get("blocks_decoded", 0) + 1
                decoded[(idx, int(bi))] = hit
                pd_.append(hit[0])
                pt_.append(hit[1])
            dall = np.concatenate(pd_).astype(np.int64)
            tall = np.concatenate(pt_).astype(np.float64)
            all_firsts.append(dall)
            all_ends.append(dall + 1)
            all_ubs.append(idf * (tall * (k1 + 1.0)) / (tall + k1 * (1.0 - b)))
        else:
            all_firsts.append(firsts)
            all_ends.append(maxes.astype(np.int64) + 1)
            all_ubs.append(ubs)
    if counters is not None:
        counters["blocks_total"] = counters.get("blocks_total", 0) + blocks_total

    # elementary intervals: breakpoints at every block edge; bound per
    # interval via a +ub/-ub event prefix sum
    bp = np.unique(np.concatenate(
        [f.astype(np.int64) for f in all_firsts] + all_ends
    ))
    n_iv = len(bp) - 1
    if n_iv <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    delta = np.zeros(n_iv + 1, np.float64)
    for (f, e, u) in zip(all_firsts, all_ends, all_ubs):
        lo = np.searchsorted(bp, f.astype(np.int64))
        hi = np.searchsorted(bp, e)
        np.add.at(delta, lo, u)
        np.add.at(delta, hi, -u)
    bound = np.cumsum(delta[:-1])

    # per-term interval spans of each block (for chunk→block mapping)
    spans = []
    for (rank, idx, idf, firsts, maxes, boffs, blens, ubs) in term_hdrs:
        lo = np.searchsorted(bp, firsts.astype(np.int64))
        hi = np.searchsorted(bp, maxes.astype(np.int64) + 1)
        spans.append((lo, hi))

    order = np.lexsort((bp[:-1], -bound))  # bound desc, start asc
    got_d: list[np.ndarray] = []
    got_r: list[np.ndarray] = []
    got_s: list[np.ndarray] = []
    n_scored = 0
    # running top-k of per-doc totals for θ — incremental, NOT a full
    # history re-concat per chunk (that was O(rounds²) and dominated
    # wall-clock in the tie-degenerate regime where θ never prunes)
    best_pool = np.empty(0, np.float64)
    theta = -np.inf
    CHUNK = max(64, 2 * k // 128 + 1)
    chunk = CHUNK
    pos = 0
    while pos < len(order):
        margin = theta * (1.0 - 1e-12) - 1e-300
        raw = order[pos : pos + chunk]
        take = raw[bound[raw] >= margin]
        if len(take) == 0:
            # bounds are sorted desc: everything beyond is below θ too
            if theta > -np.inf:
                break
            pos += len(raw)
            continue
        pos += len(raw)
        # galloping chunk growth: a round where θ pruned nothing means
        # the bound landscape is flat where we are (tie-heavy corpora,
        # e.g. heavily duplicated crawls) — double the chunk so the
        # no-prune regime converges to one big vectorized pass instead
        # of paying per-round interval machinery ~n_iv/CHUNK times;
        # any successful prune resets to fine-grained chunks
        chunk = min(chunk * 2, len(order)) if len(take) == len(raw) else CHUNK
        chosen = np.zeros(n_iv, bool)
        chosen[take] = True
        csum = np.concatenate(([0], np.cumsum(chosen)))
        chunk_d, chunk_r, chunk_s = [], [], []
        for ti, ((rank, idx, idf, firsts, maxes, boffs, blens, ubs), (lo, hi)) in enumerate(
            zip(term_hdrs, spans)
        ):
            need = np.flatnonzero(csum[hi] - csum[lo] > 0)
            if len(need) == 0:
                continue
            parts_d, parts_t = [], []
            blob = None
            for bi in need:
                key = (idx, int(bi))
                hit = decoded.get(key)
                if hit is None:
                    hit = _bmw_block(
                        seg, idx, int(bi), firsts, maxes, boffs, blens,
                        term_full, counters,
                    )
                    if hit is None:
                        if blob is None:
                            blob = seg.term_blob(idx)
                        h_and_body = blob[boffs[bi] : boffs[bi] + blens[bi]]
                        for header, body in iter_blocks(np.ascontiguousarray(h_and_body)):
                            hit = decode_block(header, body)
                        _block_cache_put(seg, idx, int(bi), hit)
                        if counters is not None:
                            counters["blocks_decoded"] = counters.get("blocks_decoded", 0) + 1
                    decoded[key] = hit
                parts_d.append(hit[0])
                parts_t.append(hit[1])
            d = np.concatenate(parts_d)
            t = np.concatenate(parts_t)
            iv = np.searchsorted(bp, d.astype(np.int64), side="right") - 1
            m = chosen[iv]
            if doc_filter is not None and m.any():
                p = np.searchsorted(doc_filter, d)
                p = np.minimum(p, len(doc_filter) - 1)
                m &= doc_filter[p] == d
            d, t = d[m], t[m]
            if len(d) == 0:
                continue
            s = _bm25_term_scores(seg, d, t, idf, stats)
            chunk_d.append(d)
            chunk_r.append(np.full(len(d), rank, np.int32))
            chunk_s.append(s)
        if chunk_d:
            cd = np.concatenate(chunk_d)
            cr = np.concatenate(chunk_r)
            cs = np.concatenate(chunk_s)
            got_d.append(cd)
            got_r.append(cr)
            got_s.append(cs)
            # per-doc totals of this chunk (docs never span chunks)
            o = np.lexsort((cr, cd))
            sd, ss = cd[o], cs[o]
            bnd = np.concatenate(([0], np.flatnonzero(sd[1:] != sd[:-1]) + 1))
            sums_chunk = np.add.reduceat(ss, bnd)
            n_scored += len(bnd)
            best_pool = np.concatenate((best_pool, sums_chunk))
            if len(best_pool) > k:
                best_pool = np.partition(best_pool, len(best_pool) - k)[
                    len(best_pool) - k :
                ]
        if n_scored >= k and len(best_pool) >= k:
            kth = best_pool.min()  # == kth-best of everything scored
            if kth > theta:
                theta = kth

    if not got_d:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    docs = np.concatenate(got_d)
    ranks = np.concatenate(got_r)
    scores = np.concatenate(got_s)
    o = np.lexsort((ranks, docs))  # per doc, ascending plan order (bit parity)
    docs, scores = docs[o], scores[o]
    boundaries = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
    uniq_docs = docs[boundaries]
    sums = np.add.reduceat(scores, boundaries)
    return topk(uniq_docs, sums, k)


def topk(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k: score desc, doc_id asc tie-break."""
    n = len(doc_ids)
    if n == 0:
        return doc_ids, scores
    if n > k:
        # keep every candidate scoring >= the kth score (ties included),
        # then resolve order deterministically
        kth = np.partition(scores, n - k)[n - k]
        cand = np.flatnonzero(scores >= kth)
        doc_ids, scores = doc_ids[cand], scores[cand]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def search_bm25(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    stats: dict | None = None,
    method: str = "maxscore",
    task_num_cpus: float = 1.0,
    chunk_queries: int | None = None,
    filters: dict | None = None,
    prior_col: str | None = None,
    min_match: int | None = None,
) -> pa.Table:
    """BM25 top-k for a batch of queries as a Ray Data pipeline.

    Work rows are (query × shard) pairs; shard affinity comes from
    ``groupby(shard_id)`` so one task scores all queries against one
    shard (per-worker segment cache = actor-style state). Global top-k
    merge per query is a small deterministic sort.

    ``filters`` (see ``shard_doc_filter``) restricts ranking to matching
    docs INSIDE each shard task — candidate generation, scoring and the
    per-shard top-k all see only the filtered doc set, so the driver
    merge stays k×shards rows no matter how selective the filter
    (``sourcebackend.go:28-129`` applies FilterByKeywords before ranking
    for the same reason). ``prior_col`` multiplies a static per-doc
    doc_meta prior into every score (``ranking/pre-ranking.go:54-103``);
    it forces the exhaustive scorer since MaxScore's upper bounds don't
    account for per-doc multipliers.
    """
    if isinstance(queries, str):  # a bare string would iterate per-char
        queries = [queries]
    if prior_col is not None and method in ("bm25plus", "bmw"):
        # the exhaustive prior scorer would silently drop the δ lower
        # bound / block-max semantics the caller asked for
        raise ValueError(
            f"prior_col is incompatible with method={method!r}: the "
            "per-doc multiplier forces the exhaustive classic-BM25 "
            "scorer (use method='maxscore' or 'bm25')"
        )
    if min_match is not None and method not in ("maxscore", "bm25"):
        # MaxScore/BMW prune docs by score bound before the match count
        # is known; minimum-should-match needs the exhaustive stream
        raise ValueError(
            f"min_match is incompatible with method={method!r}: the "
            "distinct-term-count filter forces the exhaustive scorer"
        )
    if min_match is not None and prior_col is not None:
        raise ValueError("min_match and prior_col cannot be combined")
    filters = _with_tombstones(index_dir, filters)
    stats = stats or load_stats(index_dir)
    shards = prune_shards(shard_paths(index_dir), filters)
    plans = plan_queries(index_dir, queries, stats)
    if min_match is not None:
        def score_fn(seg, plan, st, kk, doc_filter=None):
            return score_shard_bm25_msm(seg, plan, st, kk, doc_filter, min_match)
    elif prior_col is not None:
        def score_fn(seg, plan, st, kk, doc_filter=None):
            return score_shard_bm25(seg, plan, st, kk, doc_filter, prior_col)
    elif method == "maxscore":
        score_fn = score_shard_bm25_maxscore
    elif method == "bmw":
        score_fn = score_shard_bm25_bmw
    elif method == "bm25plus":
        score_fn = score_shard_bm25plus
    else:
        score_fn = score_shard_bm25

    # one task per shard is the dcs fan-out shape (dcs-web → one backend
    # per shard → incremental global top-k): every shard's term vectors
    # are scored by exactly ONE worker per batch, so per-worker caches
    # never duplicate work — parallelism comes from num_shards, which is
    # the cluster-sizing knob. ``chunk_queries`` optionally splits the
    # query batch into (shard × chunk) tasks when shards ≪ CPUs.
    chunk = chunk_queries or len(queries) or 1
    qchunks = [list(range(i, min(i + chunk, len(queries)))) for i in range(0, len(queries), chunk)]
    work = ray.data.from_items(
        [
            {"shard_id": sid, "chunk_id": cid}
            for sid in range(len(shards))
            for cid in range(len(qchunks))
        ]
    )

    def run_shard(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for sid, cid in zip(batch["shard_id"].to_pylist(), batch["chunk_id"].to_pylist()):
            seg = _open(shards[sid])
            doc_filter = shard_doc_filter(seg, filters)  # once per shard task
            for qid in qchunks[cid]:
                if doc_filter is not None and len(doc_filter) == 0:
                    d = np.empty(0, np.uint64)
                    s = np.empty(0, np.float64)
                else:
                    d, s = score_fn(seg, plans[qid], stats, k, doc_filter=doc_filter)
                out_q.extend([qid] * len(d))
                out_d.append(d)
                out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.uint64), pa.uint64()
                ),
                "score": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, np.float64), pa.float64()
                ),
            }
        )

    schema = pa.schema(
        [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("score", pa.float64())]
    )
    if shards:
        per_shard = work.map_batches(
            run_shard, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
        )
        cand = _collect(per_shard, schema)
    else:  # every shard pruned away by the filter zone maps
        cand = schema.empty_table()

    qids = cand["query_id"].to_numpy()
    docs = cand["doc_id"].to_numpy()
    scores = cand["score"].to_numpy()
    out_tables = []
    for qid in range(len(queries)):
        m = qids == qid
        dd, ss = topk(docs[m], scores[m], k)
        out_tables.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                    "rank": pa.array(np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()),
                    "doc_id": pa.array(dd, pa.uint64()),
                    "score": pa.array(ss, pa.float64()),
                }
            )
        )
    return pa.concat_tables(out_tables)


def collection_cf(
    index_dir: str, terms: list[str], task_num_cpus: float = 1.0
) -> dict[str, int]:
    """Global collection frequency (total occurrence count) of the given
    terms: one task per shard sums tf over each term's postings and the
    driver folds ``|terms| × |shards|`` integers — the postings decoded
    here stay in the per-worker block cache, so a scoring pass that
    follows on the same worker pays nothing extra. The reference keeps
    only df in its ranking data (``cmd/dcs-compute-ranking``); language-
    model scorers need cf, so it is derived on demand from the same
    posting lists rather than widening the stats sink."""
    terms = sorted(set(terms))
    if not terms:
        return {}
    shards = shard_paths(index_dir)
    work = ray.data.from_items([{"shard_id": sid} for sid in range(len(shards))])

    def shard_cf(batch: pa.Table) -> pa.Table:
        out_t, out_c = [], []
        for sid in batch["shard_id"].to_pylist():
            seg = _open(shards[sid])
            for t in terms:
                idx = seg.term_index(t)
                if idx < 0:
                    continue
                _, tfs = _decode_term_cached(seg, idx)
                out_t.append(t)
                out_c.append(int(tfs.astype(np.int64).sum()))
        return pa.table(
            {
                "term": pa.array(out_t, pa.large_string()),
                "cf": pa.array(out_c, pa.int64()),
            }
        )

    t = _collect(
        work.map_batches(
            shard_cf, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
        ),
        pa.schema([("term", pa.large_string()), ("cf", pa.int64())]),
    )
    cf: dict[str, int] = {}
    for term, c in zip(t["term"].to_pylist(), t["cf"].to_pylist()):
        cf[term] = cf.get(term, 0) + c
    return cf


def _decode_term_filtered(
    seg: Segment, idx: int, doc_filter: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray]:
    """Raw (doc_ids, tfs) of one term restricted to the filter set."""
    doc_ids, tfs = _decode_term_cached(seg, idx)
    if doc_filter is not None and len(doc_ids):
        pos = np.searchsorted(doc_filter, doc_ids)
        pos = np.minimum(pos, max(len(doc_filter) - 1, 0))
        m = (
            doc_filter[pos] == doc_ids
            if len(doc_filter)
            else np.zeros(len(doc_ids), bool)
        )
        doc_ids, tfs = doc_ids[m], tfs[m]
    return doc_ids, tfs


def _accumulate_per_doc(
    doc_chunks: list[np.ndarray], score_chunks: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Sum per-term contribution vectors per doc, ascending-term
    accumulation order (the determinism rule of ``score_shard_all``)."""
    if not doc_chunks:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    docs = np.concatenate(doc_chunks)
    scores = np.concatenate(score_chunks)
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    boundaries = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
    return docs[boundaries], np.add.reduceat(scores, boundaries)


def score_shard_qld(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Query-likelihood with Dirichlet smoothing (Zhai & Lafferty '01)
    over one shard. ``plan`` carries (term, p_c) with p_c = cf/|C| the
    collection unigram probability; candidates are docs matching ≥1
    query term, scored with the FULL smoothed likelihood

        score(d) = Σ_t ln(1 + tf_t,d / (μ·p_c(t))) + |q|·ln(μ/(dl_d+μ))

    — the sparse rewrite keeps the postings pass identical in shape to
    BM25 while the dl-dependent tail uses the resident doc_len vector."""
    mu = float(stats["mu"])
    doc_chunks, score_chunks = [], []
    for term, p_c in plan:  # ascending term order
        idx = seg.term_index(term)
        if idx < 0:
            continue
        doc_ids, tfs = _decode_term_filtered(seg, idx, doc_filter)
        if not len(doc_ids):
            continue
        doc_chunks.append(doc_ids)
        score_chunks.append(np.log(1.0 + tfs.astype(np.float64) / (mu * p_c)))
    uniq, sums = _accumulate_per_doc(doc_chunks, score_chunks)
    if len(uniq):
        dl = seg.doc_len[np.searchsorted(seg.doc_ids, uniq)].astype(np.float64)
        sums = sums + len(plan) * np.log(mu / (dl + mu))
    return topk(uniq, sums, k)


def score_shard_bm25plus(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """BM25+ (Lv & Zhai, CIKM '11): classic BM25 with a per-present-
    term lower bound δ, fixing the over-penalization of long documents
    (a long doc containing a query term can otherwise score below one
    that lacks it entirely):

        s_t(d) = idf_t · ( tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) + δ )

    δ = stats["delta"] (1.0 per the paper's recommendation)."""
    k1, b = stats["k1"], stats["b"]
    delta = float(stats.get("delta", 1.0))
    avgdl = stats["avgdl"] or 1.0
    doc_chunks, score_chunks = [], []
    for term, idf in plan:  # ascending term order
        idx = seg.term_index(term)
        if idx < 0:
            continue
        doc_ids, tfs = _decode_term_filtered(seg, idx, doc_filter)
        if not len(doc_ids):
            continue
        tf = tfs.astype(np.float64)
        dl = seg.doc_len[np.searchsorted(seg.doc_ids, doc_ids)].astype(np.float64)
        s = idf * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)) + delta
        )
        doc_chunks.append(doc_ids)
        score_chunks.append(s)
    uniq, sums = _accumulate_per_doc(doc_chunks, score_chunks)
    return topk(uniq, sums, k)


def score_shard_qljm(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Query likelihood with Jelinek-Mercer (linear) smoothing (Zhai &
    Lafferty '01, the λ-mixture companion of the Dirichlet scorer):

        score(d) = Σ_t ln((1-λ)·tf/dl + λ·p_c(t))
                 = Σ_{t∈d} ln(1 + (1-λ)·tf / (λ·p_c·dl))  +  Σ_t ln(λ·p_c)

    The sparse rewrite keeps the postings pass BM25-shaped; the second
    sum is a per-query constant added to every candidate (rank-neutral
    but kept so absolute scores match the oracle replay)."""
    lam = float(stats["lam"])
    doc_chunks, score_chunks = [], []
    const = 0.0
    for term, p_c in plan:  # ascending term order
        const += math.log(lam * p_c)
        idx = seg.term_index(term)
        if idx < 0:
            continue
        doc_ids, tfs = _decode_term_filtered(seg, idx, doc_filter)
        if not len(doc_ids):
            continue
        dl = seg.doc_len[np.searchsorted(seg.doc_ids, doc_ids)].astype(np.float64)
        doc_chunks.append(doc_ids)
        score_chunks.append(
            np.log(1.0 + (1.0 - lam) * tfs.astype(np.float64) / (lam * p_c * dl))
        )
    uniq, sums = _accumulate_per_doc(doc_chunks, score_chunks)
    if len(uniq):
        sums = sums + const
    return topk(uniq, sums, k)


def score_shard_pl2(
    seg: Segment,
    plan: list[tuple[str, float]],
    stats: dict,
    k: int,
    doc_filter: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Divergence-From-Randomness PL2 (Poisson / Laplace / c-normalized,
    Amati & van Rijsbergen '02) over one shard. ``plan`` carries
    (term, λ) with λ = cf/N the mean term frequency per document:

        tfn = tf · log2(1 + c·avgdl/dl)
        score += (tfn·log2(tfn/λ) + (λ−tfn)·log2(e) + 0.5·log2(2π·tfn))
                 / (tfn + 1)
    """
    c = float(stats["c"])
    avgdl = float(stats["avgdl"]) or 1.0
    log2e = math.log2(math.e)
    doc_chunks, score_chunks = [], []
    for term, lam in plan:  # ascending term order
        idx = seg.term_index(term)
        if idx < 0:
            continue
        doc_ids, tfs = _decode_term_filtered(seg, idx, doc_filter)
        if not len(doc_ids):
            continue
        dl = seg.doc_len[np.searchsorted(seg.doc_ids, doc_ids)].astype(np.float64)
        tfn = tfs.astype(np.float64) * np.log2(1.0 + c * avgdl / dl)
        s = (
            tfn * np.log2(tfn / lam)
            + (lam - tfn) * log2e
            + 0.5 * np.log2(2.0 * np.pi * tfn)
        ) / (tfn + 1.0)
        doc_chunks.append(doc_ids)
        score_chunks.append(s)
    uniq, sums = _accumulate_per_doc(doc_chunks, score_chunks)
    return topk(uniq, sums, k)


def search_lm(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    model: str = "qld",
    mu: float = 300.0,
    c: float = 1.0,
    lam: float = 0.3,
    stats: dict | None = None,
    task_num_cpus: float = 1.0,
    filters: dict | None = None,
) -> pa.Table:
    """Language-model / DFR top-k retrieval over the inverted index —
    the non-BM25 ranking families sharing the exact ``search_bm25``
    fan-out (query × shard work rows, one task per shard, small
    deterministic driver merge). ``model``: "qld" (Dirichlet query
    likelihood, parameter ``mu``), "jm" (Jelinek-Mercer linear
    smoothing, parameter ``lam``) or "pl2" (DFR PL2, parameter ``c``).

    Collection frequencies for the query terms come from ONE extra
    vocab-thin pass (``collection_cf``): |terms|×|shards| integers on
    the wire, never the vocabulary."""
    from dcs_ray.tokenize import tokenize_query_words

    if isinstance(queries, str):
        queries = [queries]
    stats = dict(stats or load_stats(index_dir))
    stats["mu"], stats["c"], stats["lam"] = mu, c, lam
    per_query = [sorted(set(tokenize_query_words(q))) for q in queries]
    all_terms = sorted({t for terms in per_query for t in terms})
    cf = collection_cf(index_dir, all_terms, task_num_cpus=task_num_cpus)
    if model == "qld":
        c_total = float(stats["sum_doc_len"]) or 1.0
        plans = [
            [(t, cf[t] / c_total) for t in terms if cf.get(t, 0) > 0]
            for terms in per_query
        ]
        score_fn = score_shard_qld
    elif model == "jm":
        c_total = float(stats["sum_doc_len"]) or 1.0
        plans = [
            [(t, cf[t] / c_total) for t in terms if cf.get(t, 0) > 0]
            for terms in per_query
        ]
        score_fn = score_shard_qljm
    elif model == "pl2":
        n_docs = float(stats["n_docs"]) or 1.0
        plans = [
            [(t, cf[t] / n_docs) for t in terms if cf.get(t, 0) > 0]
            for terms in per_query
        ]
        score_fn = score_shard_pl2
    else:
        raise ValueError(f"unknown model {model!r}")

    shards = shard_paths(index_dir)
    work = ray.data.from_items(
        [{"shard_id": sid} for sid in range(len(shards))]
    )

    def run_shard(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for sid in batch["shard_id"].to_pylist():
            seg = _open(shards[sid])
            doc_filter = shard_doc_filter(seg, filters)
            for qid in range(len(queries)):
                if doc_filter is not None and len(doc_filter) == 0:
                    d = np.empty(0, np.uint64)
                    s = np.empty(0, np.float64)
                else:
                    d, s = score_fn(seg, plans[qid], stats, k, doc_filter=doc_filter)
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

    cand = _collect(
        work.map_batches(
            run_shard, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
        ),
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("score", pa.float64())]
        ),
    )
    qids = cand["query_id"].to_numpy()
    docs = cand["doc_id"].to_numpy()
    scores = cand["score"].to_numpy()
    out_tables = []
    for qid in range(len(queries)):
        m = qids == qid
        dd, ss = topk(docs[m], scores[m], k)
        out_tables.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                    "rank": pa.array(np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()),
                    "doc_id": pa.array(dd, pa.uint64()),
                    "score": pa.array(ss, pa.float64()),
                }
            )
        )
    return pa.concat_tables(out_tables)


def search_bm25_grouped(
    index_dir: str,
    queries: list[str],
    group_col: str,
    per_group: int = 2,
    k: int = 10,
    stats: dict | None = None,
    filters: dict | None = None,
    task_num_cpus: float = 1.0,
) -> pa.Table:
    """BM25 top-k with a per-group result cap — dcs's per-package top-2
    (``cmd/dcs-web/querymanager.go:728-747``), distributed.

    Each shard task scores its candidates, groups them by the doc_meta
    ``group_col`` and keeps only the ``per_group`` best rows per group
    (vectorized lexsort + run-length head). A group's global best
    ``per_group`` docs are necessarily within the union of per-shard
    per-group heads, so the driver merge — re-cap per group, then global
    top-k — is exact while receiving at most
    ``per_group × groups_touched × shards`` rows, never a full ranking.
    """
    if isinstance(queries, str):  # a bare string would iterate per-char
        queries = [queries]
    filters = _with_tombstones(index_dir, filters)
    stats = stats or load_stats(index_dir)
    shards = prune_shards(shard_paths(index_dir), filters)
    plans = plan_queries(index_dir, queries, stats)

    work = ray.data.from_items(
        [{"shard_id": sid, "qid": qid} for sid in range(len(shards)) for qid in range(len(queries))]
    )

    def run_shard(batch: pa.Table) -> pa.Table:
        out = {"query_id": [], "doc_id": [], "score": [], "group": []}
        for sid, qid in zip(batch["shard_id"].to_pylist(), batch["qid"].to_pylist()):
            seg = _open(shards[sid])
            doc_filter = shard_doc_filter(seg, filters)
            if doc_filter is not None and len(doc_filter) == 0:
                continue
            docs, sums = score_shard_all(seg, plans[qid], stats, doc_filter)
            if len(docs) == 0:
                continue
            groups = (
                seg.meta(group_col)
                .combine_chunks()
                .take(pa.array(np.searchsorted(seg.doc_ids, docs)))
            )
            gcodes = pc.dictionary_encode(groups)
            gidx = gcodes.indices.to_numpy(zero_copy_only=False)
            # per group: score desc, doc asc; keep first per_group rows
            order = np.lexsort((docs, -sums, gidx))
            g_sorted = gidx[order]
            run_start = np.concatenate(([0], np.flatnonzero(g_sorted[1:] != g_sorted[:-1]) + 1))
            rank_in_group = np.arange(len(order)) - np.repeat(
                run_start, np.diff(np.concatenate((run_start, [len(order)])))
            )
            keep = order[rank_in_group < per_group]
            out["query_id"].extend([qid] * len(keep))
            out["doc_id"].append(docs[keep])
            out["score"].append(sums[keep])
            out["group"].append(groups.take(pa.array(keep)))
        if not out["doc_id"]:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.uint64()),
                    "score": pa.array([], pa.float64()),
                    "group": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int32()),
                "doc_id": pa.array(np.concatenate(out["doc_id"]), pa.uint64()),
                "score": pa.array(np.concatenate(out["score"]), pa.float64()),
                "group": pa.concat_arrays(
                    [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g for g in out["group"]]
                ),
            }
        )

    per_shard = work.map_batches(
        run_shard, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
    )
    cand = _collect(
        per_shard,
        pa.schema(
            [
                ("query_id", pa.int32()),
                ("doc_id", pa.uint64()),
                ("score", pa.float64()),
                ("group", pa.string()),
            ]
        ),
    )

    out_tables = []
    for qid in range(len(queries)):
        sub = cand.filter(pc.equal(cand["query_id"], qid))
        docs = sub["doc_id"].to_numpy()
        sums = sub["score"].to_numpy()
        groups = sub["group"].combine_chunks()
        if len(docs) == 0:
            continue
        gidx = pc.dictionary_encode(groups).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, -sums, gidx))
        g_sorted = gidx[order]
        run_start = np.concatenate(([0], np.flatnonzero(g_sorted[1:] != g_sorted[:-1]) + 1))
        rank_in_group = np.arange(len(order)) - np.repeat(
            run_start, np.diff(np.concatenate((run_start, [len(order)])))
        )
        keep = order[rank_in_group < per_group]
        # global deterministic order: score desc, doc asc; head k
        final = keep[np.lexsort((docs[keep], -sums[keep]))][:k]
        out_tables.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(final), qid, np.int32), pa.int32()),
                    "rank": pa.array(np.arange(1, len(final) + 1, dtype=np.int32), pa.int32()),
                    "doc_id": pa.array(docs[final], pa.uint64()),
                    "group": groups.take(pa.array(final)),
                    "score": pa.array(sums[final], pa.float64()),
                }
            )
        )
    if not out_tables:
        return pa.schema(
            [
                ("query_id", pa.int32()),
                ("rank", pa.int32()),
                ("doc_id", pa.uint64()),
                ("group", pa.string()),
                ("score", pa.float64()),
            ]
        ).empty_table()
    return pa.concat_tables(out_tables)


def shard_id_bounds(path: str) -> tuple[int, int]:
    """(min, max) doc_id of a shard from parquet row-group statistics —
    a metadata-only read (no postings mmap, no doc_meta load), so the
    driver can plan range-refined work units over huge indexes."""
    refs = os.path.join(path, "doc_meta_refs.json")
    if os.path.exists(refs):
        with open(refs) as f:
            segs = json.load(f)["segments"]
        # refs are relative to the shards root (segment.py:388-397)
        metas = [
            os.path.join(os.path.dirname(path), s, "doc_meta.parquet")
            for s in (segs[0], segs[-1])
        ]
    else:
        metas = [os.path.join(path, "doc_meta.parquet")] * 2
    mlo, mhi = pq.read_metadata(metas[0]), pq.read_metadata(metas[1])
    ci = mlo.schema.names.index("doc_id")
    lo = min(mlo.row_group(g).column(ci).statistics.min for g in range(mlo.num_row_groups))
    hi = max(mhi.row_group(g).column(ci).statistics.max for g in range(mhi.num_row_groups))
    return int(lo), int(hi)


def search_bm25_fielded(
    body_dir: str,
    anchor_dir: str,
    queries: list[str],
    k: int = 10,
    anchor_weight: float = 0.5,
    task_num_cpus: float = 1.0,
) -> pa.Table:
    """Two-field BM25 (BM25F-lite): ``body + anchor_weight × anchor``
    where each field is a separate index with its own df/dl/avgdl —
    the web-ranking shape where anchor text (the linker's description
    of the target) is a second, highly-weighted field (Craswell '01;
    Robertson's BM25F simplified to a per-field score sum). A doc that
    only matches via in-link anchors still ranks.

    Work units are doc-id RANGES refined from the union of both
    indexes' shard boundaries (read from parquet metadata only), so a
    doc's body and anchor contributions always meet in ONE task even
    when the two indexes sharded differently (shard planning balances
    by posting count, so boundaries rarely coincide). Per-range local
    top-k is therefore exact and the driver merge stays
    k × O(shards_b + shards_a) rows. A shard spanning two ranges is
    scored twice, but the per-worker term-score cache
    (``_term_scores_cached``) makes the second pass a cached gather."""
    if isinstance(queries, str):
        queries = [queries]
    stats_b, stats_a = load_stats(body_dir), load_stats(anchor_dir)
    shards_b, shards_a = shard_paths(body_dir), shard_paths(anchor_dir)
    plans_b = plan_queries(body_dir, queries, stats_b)
    plans_a = plan_queries(anchor_dir, queries, stats_a)

    bounds_b = [shard_id_bounds(p) for p in shards_b]
    bounds_a = [shard_id_bounds(p) for p in shards_a]
    cuts = sorted(
        {lo for lo, _ in bounds_b + bounds_a} | {hi + 1 for _, hi in bounds_b + bounds_a}
    )
    units = []  # (body shard or -1, anchor shard or -1, lo, hi)
    for lo, hi in ((cuts[i], cuts[i + 1] - 1) for i in range(len(cuts) - 1)):
        bi = next((i for i, (l, h) in enumerate(bounds_b) if l <= lo <= h), -1)
        ai = next((i for i, (l, h) in enumerate(bounds_a) if l <= lo <= h), -1)
        if bi >= 0 or ai >= 0:
            units.append((bi, ai, lo, hi))

    work = ray.data.from_items(
        [
            {"unit": uid, "qid": qid}
            for uid in range(len(units))
            for qid in range(len(queries))
        ]
    )

    def run_shard(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for uid, qid in zip(batch["unit"].to_pylist(), batch["qid"].to_pylist()):
            bi, ai, lo, hi = units[uid]
            chunks_d, chunks_s = [], []
            # fixed fold order (body chunk first) so the float sum is
            # parallelism-independent
            if bi >= 0:
                db, sb = score_shard_all(_open(shards_b[bi]), plans_b[qid], stats_b)
                m = (db >= lo) & (db <= hi)
                chunks_d.append(db[m])
                chunks_s.append(sb[m])
            if ai >= 0:
                da, sa = score_shard_all(_open(shards_a[ai]), plans_a[qid], stats_a)
                m = (da >= lo) & (da <= hi)
                chunks_d.append(da[m])
                chunks_s.append(anchor_weight * sa[m])
            docs = np.concatenate(chunks_d) if chunks_d else np.empty(0, np.uint64)
            scores = np.concatenate(chunks_s) if chunks_s else np.empty(0, np.float64)
            order = np.argsort(docs, kind="stable")
            docs, scores = docs[order], scores[order]
            bounds = np.concatenate(([0], np.flatnonzero(docs[1:] != docs[:-1]) + 1))
            uniq = docs[bounds] if len(docs) else docs
            sums = np.add.reduceat(scores, bounds) if len(docs) else scores
            d, s = topk(uniq, sums, k)
            out_q.extend([qid] * len(d))
            out_d.append(d)
            out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.uint64), pa.uint64()
                ),
                "score": pa.array(
                    np.concatenate(out_s) if out_s else np.empty(0, np.float64), pa.float64()
                ),
            }
        )

    per_shard = work.map_batches(
        run_shard, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
    )
    cand = _collect(
        per_shard,
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("score", pa.float64())]
        ),
    )
    qids = cand["query_id"].to_numpy()
    docs = cand["doc_id"].to_numpy()
    scores = cand["score"].to_numpy()
    out_tables = []
    for qid in range(len(queries)):
        m = qids == qid
        dd, ss = topk(docs[m], scores[m], k)
        out_tables.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(dd), qid, np.int32), pa.int32()),
                    "rank": pa.array(np.arange(1, len(dd) + 1, dtype=np.int32), pa.int32()),
                    "doc_id": pa.array(dd, pa.uint64()),
                    "score": pa.array(ss, pa.float64()),
                }
            )
        )
    return pa.concat_tables(out_tables)


def search_bm25f(
    body_dir: str,
    anchor_dir: str,
    queries: list[str] | str,
    k: int = 10,
    anchor_weight: float = 2.0,
    k1: float = 1.2,
    b_body: float = 0.75,
    b_anchor: float = 0.75,
    task_num_cpus: float = 1.0,
) -> pa.Table:
    """TRUE BM25F (Robertson & Zaragoza '04 / Zaragoza et al. TREC '04):
    per-field length-normalized term frequencies are combined into ONE
    pseudo-frequency BEFORE saturation,

        tfn_f = tf_f / (1 + b_f·(dl_f/avgdl_f − 1))
        c_t,d = tfn_body + anchor_weight·tfn_anchor
        score = Σ_t idf_t · c·(k1+1) / (c + k1)

    — unlike the per-field score sum of ``search_bm25_fielded``
    (BM25F-lite), the shared saturation means a term that is frequent
    ONLY in anchors cannot dominate: fields compete inside one
    saturation curve, the property the original paper argues for.
    idf comes from the BODY corpus (the web-standard approximation —
    anchors cover a biased subset; documented so the SQL oracle
    mirrors it). Fan-out reuses the range-refined units of the fielded
    path so both fields of a doc meet in one task regardless of how
    the two indexes sharded."""
    from dcs_ray.tokenize import tokenize_query_words

    if isinstance(queries, str):
        queries = [queries]
    stats_b, stats_a = load_stats(body_dir), load_stats(anchor_dir)
    shards_b, shards_a = shard_paths(body_dir), shard_paths(anchor_dir)
    per_query = [sorted(set(tokenize_query_words(q))) for q in queries]
    all_terms = sorted({t for ts in per_query for t in ts})
    df_b = global_df(body_dir, all_terms)
    n_b = int(stats_b["n_docs"])
    idf = {t: bm25_idf(int(df_b.get(t, 0)), n_b) for t in all_terms}
    avg_b = float(stats_b["avgdl"]) or 1.0
    avg_a = float(stats_a["avgdl"]) or 1.0

    bounds_b = [shard_id_bounds(p) for p in shards_b]
    bounds_a = [shard_id_bounds(p) for p in shards_a]
    cuts = sorted(
        {lo for lo, _ in bounds_b + bounds_a}
        | {hi + 1 for _, hi in bounds_b + bounds_a}
    )
    units = []
    for lo, hi in ((cuts[i], cuts[i + 1] - 1) for i in range(len(cuts) - 1)):
        bi = next((i for i, (l, h) in enumerate(bounds_b) if l <= lo <= h), -1)
        ai = next((i for i, (l, h) in enumerate(bounds_a) if l <= lo <= h), -1)
        if bi >= 0 or ai >= 0:
            units.append((bi, ai, lo, hi))

    work = ray.data.from_items(
        [
            {"unit": uid, "qid": qid}
            for uid in range(len(units))
            for qid in range(len(queries))
        ]
    )

    def field_tfn(seg, term, lo, hi, b_f, avg_f):
        idx = seg.term_index(term)
        if idx < 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        d, tf = _decode_term_filtered(seg, idx, None)
        m = (d >= lo) & (d <= hi)
        d, tf = d[m], tf[m]
        if not len(d):
            return d, np.empty(0, np.float64)
        dl = seg.doc_len[np.searchsorted(seg.doc_ids, d)].astype(np.float64)
        tfn = tf.astype(np.float64) / (1.0 + b_f * (dl / avg_f - 1.0))
        return d, tfn

    def run_unit(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s = [], [], []
        for uid, qid in zip(batch["unit"].to_pylist(), batch["qid"].to_pylist()):
            bi, ai, lo, hi = units[uid]
            seg_b = _open(shards_b[bi]) if bi >= 0 else None
            seg_a = _open(shards_a[ai]) if ai >= 0 else None
            doc_chunks, score_chunks = [], []
            for term in per_query[qid]:  # ascending term order
                parts_d, parts_c = [], []
                if seg_b is not None:
                    d, tfn = field_tfn(seg_b, term, lo, hi, b_body, avg_b)
                    if len(d):
                        parts_d.append(d)
                        parts_c.append(tfn)
                if seg_a is not None:
                    d, tfn = field_tfn(seg_a, term, lo, hi, b_anchor, avg_a)
                    if len(d):
                        parts_d.append(d)
                        parts_c.append(anchor_weight * tfn)
                if not parts_d:
                    continue
                d = np.concatenate(parts_d)
                c = np.concatenate(parts_c)
                o = np.argsort(d, kind="stable")  # body chunk first per doc
                d, c = d[o], c[o]
                bnd = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
                ud = d[bnd]
                uc = np.add.reduceat(c, bnd)
                doc_chunks.append(ud)
                score_chunks.append(idf[term] * uc * (k1 + 1.0) / (uc + k1))
            uniq, sums = _accumulate_per_doc(doc_chunks, score_chunks)
            d, s = topk(uniq, sums, k)
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

    per_unit = work.map_batches(
        run_unit, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
    )
    cand = _collect(
        per_unit,
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("score", pa.float64())]
        ),
    )
    qids = cand["query_id"].to_numpy()
    docs = cand["doc_id"].to_numpy()
    scores = cand["score"].to_numpy()
    out_tables = []
    for qid in range(len(queries)):
        m = qids == qid
        dd, ss = topk(docs[m], scores[m], k)
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


def search_facets(
    index_dir: str,
    queries: list[str] | str,
    facet_col: str = "source",
    k_facets: int = 10,
    filters: dict | None = None,
    task_num_cpus: float = 1.0,
) -> pa.Table:
    """Facet counts over the candidate set (docs matching ≥1 query
    term): per query, the top-``k_facets`` facet values by matching-doc
    count — the dcs-web per-package result grouping
    (``cmd/dcs-web/querymanager.go:688-747`` buckets results by source
    package before display) as a distributed aggregate.

    Scale shape: each shard task decodes only the query terms' posting
    lists (no scoring), unions doc ids, gathers the doc_meta facet
    column and emits ONE (facet, partial-count) row per facet value it
    saw — the exchange is facet-cardinality × shards rows, never
    per-doc. The driver fold is a tiny group-sum + sort."""
    if isinstance(queries, str):
        queries = [queries]
    stats = load_stats(index_dir)
    shards = shard_paths(index_dir)
    plans = plan_queries(index_dir, queries, stats)

    work = ray.data.from_items(
        [{"shard_id": sid, "qid": qid} for sid in range(len(shards)) for qid in range(len(queries))]
    )

    def run_shard(batch: pa.Table) -> pa.Table:
        out_q, out_f, out_n = [], [], []
        for sid, qid in zip(batch["shard_id"].to_pylist(), batch["qid"].to_pylist()):
            seg = _open(shards[sid])
            doc_filter = shard_doc_filter(seg, filters)
            if doc_filter is not None and len(doc_filter) == 0:
                continue
            ids = []
            for term, _ in plans[qid]:
                ti = seg.term_index(term)
                if ti >= 0:
                    ids.append(_decode_term_cached(seg, ti)[0])
            if not ids:
                continue
            docs = np.unique(np.concatenate(ids))
            if doc_filter is not None:
                pos = np.searchsorted(doc_filter, docs)
                pos = np.clip(pos, 0, len(doc_filter) - 1)
                docs = docs[doc_filter[pos] == docs]
            if len(docs) == 0:
                continue
            vals = seg.meta(facet_col).combine_chunks().take(
                pa.array(np.searchsorted(seg.doc_ids, docs))
            )
            enc = pc.dictionary_encode(vals)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(idx, return_counts=True)
            out_q.extend([qid] * len(uniq))
            out_f.append(enc.dictionary.take(pa.array(uniq)))
            out_n.append(counts.astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "facet": pa.concat_arrays(
                    [f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f for f in out_f]
                )
                if out_f
                else pa.array([], pa.string()),
                "n_docs": pa.array(
                    np.concatenate(out_n) if out_n else np.empty(0, np.int64), pa.int64()
                ),
            }
        )

    cand = _collect(
        work.map_batches(
            run_shard, batch_size=1, batch_format="pyarrow", num_cpus=task_num_cpus
        ),
        pa.schema(
            [("query_id", pa.int32()), ("facet", pa.string()), ("n_docs", pa.int64())]
        ),
    )
    # tiny driver fold: group-sum partials, sort (n desc, facet), head k
    out_tables = []
    for qid in range(len(queries)):
        sub = cand.filter(pc.equal(cand["query_id"], qid))
        if len(sub) == 0:
            continue
        agg = sub.group_by("facet").aggregate([("n_docs", "sum")])
        t = agg.rename_columns(["facet", "n_docs"]).sort_by(
            [("n_docs", "descending"), ("facet", "ascending")]
        ).slice(0, k_facets)
        out_tables.append(
            t.add_column(0, "query_id", pa.array(np.full(len(t), qid, np.int32)))
        )
    if not out_tables:
        return pa.schema(
            [("query_id", pa.int32()), ("facet", pa.string()), ("n_docs", pa.int64())]
        ).empty_table()
    return pa.concat_tables(out_tables)


def _collect(ds: ray.data.Dataset, empty_schema: pa.Schema) -> pa.Table:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tables:
        return empty_schema.empty_table()
    return pa.concat_tables(tables)


# ---------------------------------------------------------------------------
# trigram candidate generation + positional matching (dcs literal mode)
# ---------------------------------------------------------------------------


def trigram_candidates_shard(
    seg: Segment, trigrams: list[int], early_exit: bool = False
) -> np.ndarray:
    """AND-intersect posting lists, rarest-first
    (``internal/index/query.go:48-116``: sort by Entries ascending).
    ``early_exit=True`` reproduces dcs's approximation — stop when a
    further restriction gains < 10 docs (``query.go:80-89``), yielding a
    candidate superset; False gives the exact all-trigrams-present set
    (what the SQL oracle checks)."""
    uniq = sorted(set(trigrams))
    entries = []
    for t in uniq:
        idx = seg.term_index(np.uint32(t))
        if idx < 0:
            return np.empty(0, np.uint64)  # a missing trigram ⇒ no candidates
        entries.append((int(seg.df[idx]), idx))
    entries.sort()
    result: np.ndarray | None = None
    for _, idx in entries:
        doc_ids, _ = _decode_term_cached(seg, idx)
        if result is None:
            result = doc_ids
        else:
            prev = len(result)
            result = np.intersect1d(result, doc_ids, assume_unique=True)
            if early_exit and prev - len(result) < 10:
                break
        if len(result) == 0:
            return result
    return result if result is not None else np.empty(0, np.uint64)


def positional_matches_shard(seg: Segment, literal: str | bytes) -> tuple[np.ndarray, np.ndarray]:
    """Exact literal matching via positional sections (dcs QueryPositional
    J4, ``internal/index/read.go:530-676``): join the first and last
    trigram's (docid, pos) lists on pos_last == pos_first + delta, then
    confirm every intermediate trigram — yielding exact match positions
    without touching document text."""
    b = literal.encode() if isinstance(literal, str) else literal
    tris = string_trigrams(b)
    if not tris:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    assert seg.positions is not None, "index built without positional sections"

    def term_positions(t: int):
        idx = seg.term_index(np.uint32(t))
        if idx < 0:
            return None
        return _decode_positions_cached(seg, idx)

    first = term_positions(tris[0])
    if first is None:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    # flatten to (doc, pos) pairs
    f_doc = np.repeat(first[0], np.diff(first[1]))
    f_pos = first[2]
    keep = np.ones(len(f_pos), dtype=bool)
    for delta in range(1, len(tris)):
        nxt = term_positions(tris[delta])
        if nxt is None:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        n_doc = np.repeat(nxt[0], np.diff(nxt[1]))
        n_pos = nxt[2]
        # candidate (doc, pos) survives iff (doc, pos+delta) exists in nxt;
        # key = (local doc index << 32 | position) — both < 2^32
        f_local = np.searchsorted(seg.doc_ids, f_doc).astype(np.uint64)
        n_local = np.searchsorted(seg.doc_ids, n_doc).astype(np.uint64)
        want_key = (f_local << np.uint64(32)) | (f_pos.astype(np.uint64) + np.uint64(delta))
        have_key = (n_local << np.uint64(32)) | n_pos.astype(np.uint64)
        keep &= np.isin(want_key, have_key, assume_unique=False)
        if not keep.any():
            break
    return f_doc[keep], f_pos[keep]


def proximity_matches_shard(
    seg: Segment,
    lit_a: str | bytes,
    lit_b: str | bytes,
    window: int,
    ordered: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Proximity join over positional sections (the J4 positional join
    generalized from exact phrase to a byte window): docs where an
    occurrence of ``lit_a`` starts within ``window`` bytes of an
    occurrence of ``lit_b``, with the exact pair count per doc —
    computed entirely from the index, never touching document text.

    Vectorized shape: both literals' exact (doc, byte-pos) occurrence
    lists come from :func:`positional_matches_shard`; pairs are counted
    with two searchsorteds per side over a composite
    ``(local_doc << 32 | pos)`` key (both < 2^32), so cost is
    O((|A| + |B|) log |B|) per shard, independent of document sizes.
    """
    da, pa_arr = positional_matches_shard(seg, lit_a)
    db, pb_arr = positional_matches_shard(seg, lit_b)
    if len(da) == 0 or len(db) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    la = np.searchsorted(seg.doc_ids, da).astype(np.int64)
    lb = np.searchsorted(seg.doc_ids, db).astype(np.int64)
    akey_doc = la << 32
    bkey = (lb << 32) + pb_arr.astype(np.int64)  # sorted: doc-major, pos asc
    pa_i = pa_arr.astype(np.int64)
    if ordered:
        # ordered window (INQUERY #N): b strictly AFTER a, within window
        lo = akey_doc + pa_i + 1
        hi = akey_doc + pa_i + window
    else:
        lo = akey_doc + np.maximum(pa_i - window, 0)
        hi = akey_doc + pa_i + window
    counts = np.searchsorted(bkey, hi, side="right") - np.searchsorted(
        bkey, lo, side="left"
    )
    uniq, inverse = np.unique(da, return_inverse=True)
    per_doc = np.bincount(inverse, weights=counts).astype(np.int64)
    keep = per_doc > 0
    return uniq[keep], per_doc[keep]


SLOPPY_SCALE = 1_000_000


def sloppy_weights_shard(
    seg: Segment, lit_a: str | bytes, lit_b: str | bytes, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Proximity-WEIGHTED ordered pair join (Lucene sloppy-phrase
    role, byte-gap variant): for every occurrence pair with ``b``
    strictly after ``a`` within ``window`` bytes, accumulate the
    INTEGER weight ``SLOPPY_SCALE // gap`` per doc — closer pairs count
    more, and integer division keeps the score bit-replayable in SQL
    (the same discipline as the unigram/HLL integer chains). Same
    composite-key searchsorted shape as ``proximity_matches_shard``;
    the pair expansion is bounded by the window, not document size."""
    da, pa_arr = positional_matches_shard(seg, lit_a)
    db, pb_arr = positional_matches_shard(seg, lit_b)
    if len(da) == 0 or len(db) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    la = np.searchsorted(seg.doc_ids, da).astype(np.int64)
    lb = np.searchsorted(seg.doc_ids, db).astype(np.int64)
    akey = (la << 32) + pa_arr.astype(np.int64)
    bkey = (lb << 32) + pb_arr.astype(np.int64)
    lo = np.searchsorted(bkey, akey + 1, side="left")
    hi = np.searchsorted(bkey, akey + window, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    idx = np.repeat(lo, counts) + (
        np.arange(total) - np.repeat(starts, counts)
    )
    gaps = bkey[idx] - np.repeat(akey, counts)  # same doc ⇒ pure pos gap
    w = SLOPPY_SCALE // np.maximum(gaps, 1)
    adoc = np.repeat(da, counts)
    uniq, inverse = np.unique(adoc, return_inverse=True)
    sums = np.bincount(inverse, weights=w.astype(np.float64)).astype(np.int64)
    return uniq, sums


def search_phrase_sloppy(
    index_dir: str,
    pair: tuple[str, str],
    window: int = 40,
    k: int = 10,
) -> pa.Table:
    """Rank docs by the sloppy-phrase weight of one ordered literal
    pair (``sloppy_weights_shard`` per shard — docs partition across
    shards so the global ranking is a k-row merge), ties to the lower
    doc id. Output: (rank, doc_id, sloppy_w)."""
    paths = shard_paths(index_dir)
    work = ray.data.from_items([{"path_id": pid} for pid in range(len(paths))])
    a, b = pair

    def run(batch: pa.Table) -> pa.Table:
        rows_d, rows_w = [], []
        for pid in batch["path_id"].to_pylist():
            seg = _open(paths[pid])
            d, w = sloppy_weights_shard(seg, a, b, window)
            if len(d):
                # per-shard top-k bounds the merge at k × shards rows
                o = np.lexsort((d, -w))[:k]
                rows_d.append(d[o])
                rows_w.append(w[o])
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(rows_d) if rows_d else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "sloppy_w": pa.array(
                    np.concatenate(rows_w) if rows_w else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    res = work.map_batches(run, batch_size=1, batch_format="pyarrow")
    t = _collect(
        res,
        pa.schema([("doc_id", pa.uint64()), ("sloppy_w", pa.int64())]),
    )
    d = t["doc_id"].to_numpy()
    w = t["sloppy_w"].to_numpy()
    o = np.lexsort((d, -w))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(d[o].astype(np.int64), pa.int64()),
            "sloppy_w": pa.array(w[o], pa.int64()),
        }
    )


def search_proximity(
    index_dir: str,
    pairs: list[tuple[str, str]],
    window: int = 40,
    ordered: bool = False,
) -> pa.Table:
    """(query_id, doc_id, n_pairs) for literal-pair proximity queries —
    one task per shard (docs partition across shards, so the global
    result is the plain union of shard results). ``ordered=True`` is
    the INQUERY ``#N`` operator (b strictly after a within the window)
    vs the default unordered ``#uwN``."""
    paths = shard_paths(index_dir)
    work = ray.data.from_items([{"path_id": pid} for pid in range(len(paths))])

    def run(batch: pa.Table) -> pa.Table:
        rows_q, rows_d, rows_n = [], [], []
        for pid in batch["path_id"].to_pylist():
            seg = _open(paths[pid])
            for qid, (a, b) in enumerate(pairs):
                d, n = proximity_matches_shard(seg, a, b, window, ordered=ordered)
                rows_q.extend([qid] * len(d))
                rows_d.append(d)
                rows_n.append(n)
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int32()),
                "doc_id": pa.array(
                    np.concatenate(rows_d) if rows_d else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "n_pairs": pa.array(
                    np.concatenate(rows_n) if rows_n else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    res = work.map_batches(run, batch_size=1, batch_format="pyarrow")
    out = _collect(
        res,
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("n_pairs", pa.int64())]
        ),
    )
    return out.sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def search_literal(index_dir: str, literals: list[str], positional: bool = False) -> pa.Table:
    """Candidate docs (and exact positions when the index is positional)
    for literal queries, fanned out across shards/segments."""
    if isinstance(literals, str):  # a bare string would iterate per-char
        literals = [literals]
    paths = shard_paths(index_dir)
    if positional and not all(
        os.path.exists(os.path.join(p, "positions.bin")) for p in paths
    ):
        # legacy index whose positional sections were never merged into
        # shards (pre-stitch format): fan out to segments instead
        seg_root = os.path.join(index_dir, "segments")
        paths = [
            os.path.join(seg_root, d)
            for d in sorted(os.listdir(seg_root))
            if d.startswith("seg_") and not d.endswith(".tmp")
        ]
    work = ray.data.from_items([{"path_id": pid} for pid in range(len(paths))])

    def run(batch: pa.Table) -> pa.Table:
        rows_q, rows_d, rows_p = [], [], []
        for pid in batch["path_id"].to_pylist():
            seg = _open(paths[pid])
            for qid, lit in enumerate(literals):
                if positional:
                    d, p = positional_matches_shard(seg, lit)
                else:
                    d = trigram_candidates_shard(seg, string_trigrams(lit))
                    p = np.zeros(len(d), dtype=np.uint64)
                rows_q.extend([qid] * len(d))
                rows_d.append(d)
                rows_p.append(p)
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int32()),
                "doc_id": pa.array(
                    np.concatenate(rows_d) if rows_d else np.empty(0, np.uint64), pa.uint64()
                ),
                "position": pa.array(
                    np.concatenate(rows_p) if rows_p else np.empty(0, np.uint64), pa.uint64()
                ),
            }
        )

    res = work.map_batches(run, batch_size=1, batch_format="pyarrow")
    out = _collect(
        res,
        pa.schema(
            [("query_id", pa.int32()), ("doc_id", pa.uint64()), ("position", pa.uint64())]
        ),
    )
    return out.sort_by(
        [("query_id", "ascending"), ("doc_id", "ascending"), ("position", "ascending")]
    )


def search_query(
    index_dir: str,
    raw: str,
    k: int = 10,
    phrase_index_dir: str | None = None,
    stats: dict | None = None,
    **kw,
) -> pa.Table:
    """The dcs-web front door: ONE raw query string with the full user
    grammar, composed onto the ranking fan-out —

    - plain terms rank by BM25 (phrase words join the scoring terms, so
      a phrase-only query still ranks);
    - ``"quoted phrases"`` restrict to exact-phrase candidates via a
      positional pre-pass on ``phrase_index_dir`` (the trigram index;
      required when phrases are present), intersected across phrases
      and pushed into every shard task as a ``doc_ids`` filter —
      the J4→ranking composition (``index/query.go`` postings AND →
      ``sourcebackend.go`` ranking). The candidate id set crosses the
      driver because the positional and words indexes shard
      independently; phrases selective enough to be worth quoting keep
      it small, and zone pruning drops shards outside its id range;

      a STOPWORD phrase would materialize a corpus-scale id list — the
      scale path for that case is co-sharding the two indexes (same
      id ranges) and evaluating the phrase inside each shard task;
    - ``-term`` excludes (``terms_none``) and ``+term`` requires
      (``terms_all``) docs by posting membership, evaluated inside each
      shard against its OWN posting lists — no driver-side id
      materialization even for negated stopwords;
    - ``-"quoted phrase"`` excludes exact-phrase matches via the same
      positional pre-pass (the excluded id set IS driver-materialized —
      fine for selective phrases, the only kind worth negating);
    - ``key:value`` / ``-key:value`` keywords map onto doc_meta filters
      (F4, ``query-rewrite.go:15-59``).
    """
    qtext, filters = _grammar_plan(raw, phrase_index_dir, expand_index_dir=index_dir)
    return search_bm25(
        index_dir, [qtext], k=k, stats=stats, filters=filters, **kw
    )


def _grammar_plan(
    raw: str,
    phrase_index_dir: str | None,
    expand_index_dir: str | None = None,
    max_expansions: int = 20,
) -> tuple[str, dict | None]:
    """Shared grammar→(scoring text, filter spec) builder behind
    :func:`search_query` and ``SearchService.query`` — parses the raw
    string and resolves phrase constraints through the positional
    pre-pass, returning what any BM25 executor needs.

    With ``expand_index_dir``, plain scoring terms additionally support
    the Lucene expansion operators against that index's vocabulary:
    ``spa*`` (trailing wildcard → top-``max_expansions`` prefix terms
    by df) and ``merg~`` (fuzzy → every term within levenshtein 1).
    ``+term``/``-term`` operands stay literal — membership constraints
    expand nothing."""
    from dcs_ray.queryplan import parse_user_query
    from dcs_ray.tokenize import tokenize_query_words

    p = parse_user_query(raw)
    if expand_index_dir is not None:
        expanded: list[str] = []
        fuzzy_words: list[str] = []  # batched: ONE vocab pass for all '~'
        for tok in p["terms"]:
            lead = tok.startswith("*") and len(tok) > 1
            trail = tok.endswith("*") and len(tok) > 1
            if (lead or trail) and tok.strip("*"):
                # foo* / *foo / *foo* — ONE routing table shared with
                # wildcard_terms (_expand_wildcard_word); previously
                # *core fell through as the LITERAL term 'core',
                # silently changing the query's meaning
                for w in tokenize_query_words(tok.strip("*")):
                    expanded.extend(
                        _expand_wildcard_word(
                            expand_index_dir, w, lead, trail, max_expansions
                        )
                    )
            elif tok.endswith("~") and len(tok) > 1:
                fuzzy_words.extend(tokenize_query_words(tok[:-1]))
            else:
                expanded.append(tok)
        if fuzzy_words:
            expanded.extend(
                _fuzzy_expand(
                    expand_index_dir, sorted(set(fuzzy_words)), max_expansions
                )
            )
        p = dict(p)
        p["terms"] = expanded
    filters = dict(filters_from_keywords(p["includes"], p["negates"]) or {})
    neg = sorted({t for nt in p["neg_terms"] for t in tokenize_query_words(nt)})
    if neg:
        filters["terms_none"] = neg
    req = sorted({t for rt in p["req_terms"] for t in tokenize_query_words(rt)})
    if req:
        filters["terms_all"] = req
    if p["phrases"] or p["neg_phrases"]:
        if phrase_index_dir is None:
            raise ValueError(
                "quoted phrases need a positional trigram index "
                "(pass phrase_index_dir)"
            )
        all_phrases = p["phrases"] + p["neg_phrases"]
        hits = search_literal(phrase_index_dir, all_phrases, positional=True)
        qids = hits["query_id"].to_numpy()

        def _ids(qid: int) -> set:
            return set(hits.filter(pa.array(qids == qid))["doc_id"].to_pylist())

        cand: set | None = None
        for qid in range(len(p["phrases"])):
            ids = _ids(qid)
            cand = ids if cand is None else (cand & ids)
        if cand is not None:
            filters["doc_ids"] = sorted(cand)
        banned: set = set()
        for qid in range(len(p["phrases"]), len(all_phrases)):
            banned |= _ids(qid)
        if banned:
            prev = filters.get("not_doc_ids")
            if prev is not None and len(prev):
                banned |= {int(x) for x in prev}
            filters["not_doc_ids"] = np.array(sorted(banned), dtype=np.uint64)
    qtext = " ".join(p["terms"] + p["phrases"])
    return qtext, (filters or None)


def query_clarity(
    index_dir: str,
    query: str,
    docs_path: str,
    k: int = 10,
    stats: dict | None = None,
) -> dict:
    """Post-retrieval query-performance prediction: the CLARITY score
    (Cronen-Townsend '02) — KL divergence in bits between the top-k
    result set's language model and the collection model. High clarity
    = a focused result vocabulary = the query will likely perform well;
    the canonical signal for selective query expansion / routing.

    Deterministic simplification: the result model is the uniform
    mixture ``P(w|Q) = (1/k) Σ_topk tf(w,d)/dl(d)`` (the original
    weights by P(Q|d); uniform keeps the replay free of score floats).
    ``P(w|C) = cf(w)/total_tokens`` with cf decoded from the index's
    OWN posting lists (``collection_cf`` — vocab-bounded, no corpus
    pass) and total tokens from the stats sink. Only the k result docs
    leave storage (pushdown read)."""
    from dcs_ray.tokenize import word_tokens_flat

    stats = stats or load_stats(index_dir)
    top = search_bm25(index_dir, [query], k=k, stats=stats)
    ids = sorted(int(d) for d in top["doc_id"].to_pylist())
    if not ids:
        return {"clarity": 0.0, "n_vocab": 0, "n_docs": 0}
    docs = pq.read_table(
        docs_path, columns=["doc_id", "text"], filters=[("doc_id", "in", ids)]
    ).sort_by("doc_id")
    flat, parents = word_tokens_flat(docs["text"])
    dl = np.bincount(parents, minlength=len(docs)).astype(np.float64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    tidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    p_q = np.zeros(len(vocab), np.float64)
    np.add.at(p_q, tidx, 1.0 / (len(ids) * dl[parents]))
    cf = collection_cf(index_dir, vocab)
    p_c = np.array([cf[t] for t in vocab], np.float64) / float(stats["sum_doc_len"])
    clarity = float(np.sum(p_q * np.log2(p_q / p_c)))
    return {
        "clarity": round(clarity, 6) + 0.0,
        "n_vocab": len(vocab),
        "n_docs": len(ids),
    }


def cori_collection_scores(
    index_dirs: list[str], query: str
) -> pa.Table:
    """CORI collection selection (Callan '95): rank whole sub-indexes by
    query belief so a federated query fans out only to the most
    promising collections — content-based shard routing one level above
    the zone maps (those prune on metadata equality; CORI ranks on term
    statistics). All inputs are vocab-thin metadata reads per
    collection: df of the query terms (predicate-pushdown on the stats
    table) and the collection token count from the stats sink — no
    document is touched.

    Per term t and collection c:  T = df / (df + 50 + 150·cw_c/avg_cw),
    I = ln((C + 0.5)/cf_t) / ln(C + 1), belief = 0.4 + 0.6·T·I; the
    collection score is the mean belief over the query terms (terms no
    collection holds contribute their floor 0.4). Returns
    (collection, belief, rank) with belief rounded to 6dp and ties to
    the smaller collection index."""
    from dcs_ray.tokenize import tokenize_query_words

    terms = sorted(tokenize_query_words(query))
    C = len(index_dirs)
    dfs = [global_df(d, terms) for d in index_dirs]
    cws = [float(load_stats(d)["sum_doc_len"]) for d in index_dirs]
    avg_cw = sum(cws) / C
    beliefs = []
    for ci in range(C):
        vals = []
        for t in terms:
            df = float(dfs[ci].get(t, 0))
            cf_t = sum(1 for d in dfs if d.get(t, 0) > 0)
            if cf_t == 0:
                vals.append(0.4)
                continue
            T = df / (df + 50.0 + 150.0 * cws[ci] / avg_cw)
            I = np.log((C + 0.5) / cf_t) / np.log(C + 1.0)
            vals.append(0.4 + 0.6 * T * I)
        beliefs.append(round(float(np.mean(vals)), 6) + 0.0)
    order = sorted(range(C), key=lambda i: (-beliefs[i], i))
    rank = [0] * C
    for r, i in enumerate(order):
        rank[i] = r + 1
    return pa.table(
        {
            "collection": pa.array(range(C), pa.int64()),
            "belief": pa.array(beliefs, pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


def redde_collection_scores(
    csi_dir: str,
    query: str,
    coll_col: str,
    full_sizes: list[int],
    sample_sizes: list[int],
    k: int = 20,
) -> pa.Table:
    """ReDDE resource selection (Si & Callan, SIGIR '03): rank whole
    collections by the ESTIMATED COUNT of relevant documents, computed
    from a central sample index (CSI) alone. The CSI holds a
    deterministic sample of every collection with the owning collection
    id as an in-index meta column; the query runs ordinary BM25 over
    the CSI, and each top-``k`` hit votes for its collection with the
    inverse sampling rate ``|C_c| / |S_c|`` (the hit "represents" that
    many source docs). The sample-based counterpart to
    ``cori_collection_scores`` (vocab-metadata belief): no per-
    collection term statistics, just ONE small index — the form that
    scales to thousands of collections because selection cost is
    independent of collection count. Returns
    ``(collection, est_rel, rank)``; ties rank the smaller id first."""
    t = search_bm25(csi_dir, [query], k=k)
    hit_ids = t["doc_id"].to_numpy().astype(np.uint64)
    colls = np.full(len(hit_ids), -1, np.int64)
    for sp in shard_paths(csi_dir):
        seg = _open(sp)
        if len(seg.doc_ids) == 0 or len(hit_ids) == 0:
            continue
        pos = np.searchsorted(seg.doc_ids, hit_ids)
        pos_c = np.minimum(pos, len(seg.doc_ids) - 1)
        m = seg.doc_ids[pos_c] == hit_ids
        if m.any():
            vals = seg.meta(coll_col).combine_chunks().to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            colls[m] = vals[pos_c[m]]
    C = len(full_sizes)
    est = np.zeros(C, np.float64)
    for c in range(C):
        est[c] = float((colls == c).sum()) * (
            full_sizes[c] / max(sample_sizes[c], 1)
        )
    est = np.round(est, 6) + 0.0
    order = sorted(range(C), key=lambda i: (-est[i], i))
    rank = [0] * C
    for r, i in enumerate(order):
        rank[i] = r + 1
    return pa.table(
        {
            "collection": pa.array(range(C), pa.int64()),
            "est_rel": pa.array(est, pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


def search_boolean(
    index_dir: str,
    include: list[str],
    exclude: list[str] | None = None,
) -> pa.Table:
    """Boolean AND/AND-NOT retrieval over the words index: docs whose
    posting lists contain EVERY ``include`` term and NONE of the
    ``exclude`` terms — the J1 posting-AND composed with the negation
    operator dcs exposes as ``-keyword`` query syntax
    (``internal/index/regexp.go`` query planning / keyword rewrite
    F4). One task per shard; postings decode through the per-worker
    LRU, the AND intersects rarest-first (shortest list first, like
    the BM25 planner), and the NOT is one ``np.setdiff1d`` against the
    union of excluded postings. Shards partition doc ids, so the
    driver's concat IS the global answer — no exchange at all."""
    exclude = exclude or []
    paths = shard_paths(index_dir)
    work = ray.data.from_items([{"path_id": pid} for pid in range(len(paths))])

    def run(batch: pa.Table) -> pa.Table:
        out = []
        for pid in batch["path_id"].to_pylist():
            seg = _open(paths[pid])
            lists = []
            ok = True
            for term in include:
                idx = seg.term_index(term)
                if idx < 0:
                    ok = False
                    break
                lists.append(_decode_term_cached(seg, idx)[0])
            if not ok or not lists:
                continue
            lists.sort(key=len)  # rarest-first AND
            cand = lists[0]
            for pl in lists[1:]:
                cand = cand[np.isin(cand, pl, assume_unique=True)]
                if len(cand) == 0:
                    break
            for term in exclude:
                if len(cand) == 0:
                    break
                idx = seg.term_index(term)
                if idx >= 0:
                    cand = np.setdiff1d(
                        cand, _decode_term_cached(seg, idx)[0], assume_unique=True
                    )
            out.append(cand)
        d = np.concatenate(out) if out else np.empty(0, np.uint64)
        return pa.table({"doc_id": pa.array(d.astype(np.int64), pa.int64())})

    res = work.map_batches(run, batch_size=1, batch_format="pyarrow")
    return _collect(res, pa.schema([("doc_id", pa.int64())])).sort_by("doc_id")


def more_like_this(
    index_dir: str,
    text: str,
    exclude_doc_id: int | None = None,
    n_terms: int = 5,
    k: int = 10,
    stats: dict | None = None,
) -> pa.Table:
    """"More like this": rank documents similar to ``text`` — the
    classic related-documents feature (Lucene MoreLikeThis shape).

    The document's terms are scored tf·ln(N/df) against the INDEX's
    global df table (one predicate-pushdown read, no corpus pass); the
    top ``n_terms`` (score desc, term asc) become a BM25 query; the
    source document (``exclude_doc_id``) is dropped from the result and
    ranks are renumbered. Everything downstream reuses the normal
    ``search_bm25`` shard fan-out, so filters/caches/MaxScore apply."""
    from dcs_ray.tokenize import word_tokens_flat

    stats = stats or load_stats(index_dir)
    # the DOCUMENT tokenizer (keeps duplicate occurrences — tf matters
    # here; the query tokenizer dedups)
    flat, _ = word_tokens_flat(pa.array([text], pa.string()))
    toks = flat.to_pylist()
    if not toks:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    terms, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    dfs = global_df(index_dir, [str(t) for t in terms])
    df = np.array([dfs.get(str(t), 0) for t in terms], np.float64)
    present = df > 0
    terms, tf, df = terms[present], tf[present], df[present]
    if len(terms) == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    score = tf.astype(np.float64) * np.log(float(stats["n_docs"]) / df)
    order = np.lexsort((terms.astype("U"), -score))[:n_terms]
    query = " ".join(str(t) for t in terms[order])
    t = search_bm25(index_dir, [query], k=k + 1, stats=stats)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = ids != (exclude_doc_id if exclude_doc_id is not None else -1)
    ids = ids[keep][:k]
    scores = t["score"].to_numpy(zero_copy_only=False)[keep][:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def search_prf(
    index_dir: str,
    query: str,
    docs_path: str,
    n_docs: int = 10,
    n_terms: int = 3,
    k: int = 10,
    stats: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Pseudo-relevance feedback (Rocchio '71 shape): run the query,
    treat the top ``n_docs`` results as relevant, expand the query with
    their ``n_terms`` strongest tf·ln(N/df) terms (original query terms
    excluded), and re-rank — the classic recall-boosting second pass.

    Scale shape: both ranking passes are the normal per-shard BM25
    fan-out; between them only the k pseudo-relevant docs leave storage
    (predicate-pushdown read on ``doc_id``), and term selection probes
    the index's vocab-scale df table — nothing corpus-sized anywhere.
    Expansion-term ties break on the ROUNDED (6dp) tf·idf then term
    asc, keeping selection deterministic and SQL-replayable."""
    from dcs_ray.tokenize import word_tokens_flat

    stats = stats or load_stats(index_dir)
    base = search_bm25(index_dir, [query], k=n_docs, stats=stats)
    ids = base["doc_id"].to_pylist()
    if not ids:
        return base
    docs = pq.read_table(
        docs_path, columns=[id_col, text_col], filters=[(id_col, "in", ids)]
    )
    flat, _ = word_tokens_flat(docs[text_col])
    qflat, _ = word_tokens_flat(pa.array([query], pa.string()))
    qterms = np.unique(np.asarray(qflat.to_pylist(), dtype=object))
    toks = np.asarray(flat.to_pylist(), dtype=object)
    terms, tf = np.unique(toks, return_counts=True) if len(toks) else (
        np.empty(0, object), np.empty(0, np.int64)
    )
    keep = ~np.isin(terms, qterms)
    terms, tf = terms[keep], tf[keep]
    if len(terms):
        dfs = global_df(index_dir, [str(t) for t in terms])
        df = np.array([dfs.get(str(t), 0) for t in terms], np.float64)
        present = df > 0
        terms, tf, df = terms[present], tf[present], df[present]
    if len(terms):
        sel = np.round(tf.astype(np.float64) * np.log(float(stats["n_docs"]) / df), 6)
        order = np.lexsort((terms.astype("U"), -sel))[:n_terms]
        expanded = query + " " + " ".join(str(t) for t in terms[order])
    else:
        expanded = query
    t = search_bm25(index_dir, [expanded], k=k, stats=stats)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def search_corrected(
    index_dir: str,
    query: str,
    k: int = 10,
    stats: dict | None = None,
) -> pa.Table:
    """Spell-corrected ("did you mean") BM25 search: query terms found
    in the index vocabulary pass through unchanged; each out-of-vocab
    term is replaced by its best SymSpell suggestion (levenshtein ≤ 1,
    ranked df desc then term asc — :mod:`dcs_ray.functions.spell`) or
    dropped if nothing is within distance 1. The corrected term set
    then runs the normal per-shard BM25 fan-out.

    Scale shape: vocabulary membership is a predicate-pushdown probe of
    the vocab-scale df table; correction streams the vocabulary once
    with the (tiny) deletion-key set broadcast; ranking is unchanged."""
    from dcs_ray.functions.spell import suggest
    from dcs_ray.tokenize import word_tokens_flat

    stats = stats or load_stats(index_dir)
    qflat, _ = word_tokens_flat(pa.array([query], pa.string()))
    words = sorted(set(qflat.to_pylist()))
    if not words:
        return search_bm25(index_dir, [query], k=k, stats=stats)
    dfs = global_df(index_dir, words)
    kept = [w for w in words if dfs.get(w, 0) > 0]
    missing = [w for w in words if dfs.get(w, 0) == 0]
    corrected = list(kept)
    if missing:
        vocab = ray.data.read_parquet(os.path.join(index_dir, "stats", "df.parquet"))
        sugg = suggest(vocab, missing, k=1)
        corrected += sugg["term"].to_pylist()
    corrected = sorted(set(corrected))
    if not corrected:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    t = search_bm25(index_dir, [" ".join(corrected)], k=k, stats=stats)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def _range_upper(prefix: str) -> str | None:
    """Exclusive upper bound for the key range of strings starting with
    ``prefix`` — ``prefix`` with its last char incremented. Returns
    None when the incremented char would be unrepresentable (past
    U+10FFFF) or a lone surrogate pyarrow cannot UTF-8-encode; callers
    fall back to the scan path (review r5c #2)."""
    nxt = ord(prefix[-1]) + 1
    if nxt > 0x10FFFF or 0xD800 <= nxt <= 0xDFFF:
        return None
    return prefix[:-1] + chr(nxt)


def expand_prefix_terms(
    index_dir: str, prefix: str, max_expansions: int = 20
) -> list[str]:
    """Expand a trailing-wildcard pattern prefix to concrete index terms:
    the ``max_expansions`` highest-df vocabulary terms starting with
    ``prefix`` (df desc, term asc — Lucene's TopTermsBlendedFreq rewrite
    shape with a deterministic tie-break).

    The vocab probe is a predicate-pushdown RANGE read of the
    term-sorted stats table (``term >= prefix AND term < next(prefix)``)
    — row-group statistics skip everything outside the prefix range, so
    the scan is range-sized, not vocabulary-sized."""
    if not prefix:
        raise ValueError("wildcard prefix must be non-empty")
    import pyarrow.dataset as pads

    upper = _range_upper(prefix)
    dset = pads.dataset(os.path.join(index_dir, "stats", "df.parquet"))
    if upper is not None:
        tbl = dset.to_table(
            filter=(pads.field("term") >= prefix) & (pads.field("term") < upper)
        )
    else:  # un-incrementable last char: starts_with scan fallback
        tbl = dset.to_table()
        tbl = tbl.filter(pc.starts_with(tbl["term"], prefix))
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_pylist()
    ranked = sorted(zip(terms, dfs), key=lambda td: (-td[1], td[0]))
    return [t for t, _ in ranked[:max_expansions]]


def expand_suffix_terms_reversed(
    index_dir: str, sub: str, max_expansions: int = 20
) -> list[str] | None:
    """Suffix wildcard (``*sub``) through the REVERSED-term dictionary
    (Lucene's ReversedWildcardFilter): ``reverse(term)`` is sorted in
    ``stats/df_rev.parquet`` (written at build since round 5), so the
    suffix match becomes the same row-group-pruned RANGE read the
    prefix form enjoys — range-sized, not vocab-sized. Returns None
    when the index predates the artifact (caller falls back to the
    documented vocab scan)."""
    path = os.path.join(index_dir, "stats", "df_rev.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.dataset as pads

    rev_pfx = sub[::-1]
    upper = _range_upper(rev_pfx)
    if upper is None:  # un-incrementable first char of sub: scan path
        return None
    dset = pads.dataset(path)
    tbl = dset.to_table(
        filter=(pads.field("term_rev") >= rev_pfx) & (pads.field("term_rev") < upper)
    )
    terms = [t[::-1] for t in tbl["term_rev"].to_pylist()]
    ranked = sorted(zip(terms, tbl["df"].to_pylist()), key=lambda td: (-td[1], td[0]))
    return [w for w, _ in ranked[:max_expansions]]


def expand_contains_terms(
    index_dir: str, sub: str, max_expansions: int = 20, suffix_only: bool = False
) -> list[str]:
    """Expand an infix (``*sub*``) or suffix (``*sub``) wildcard to the
    top-``max_expansions`` matching vocabulary terms by (df desc, term
    asc). Suffix forms route through the reversed-term dictionary when
    the index carries one (range-pruned; see
    :func:`expand_suffix_terms_reversed`); infix forms — and suffix on
    pre-round-5 indexes — scan the vocabulary (which is why Lucene
    gates leading wildcards behind a flag); the scan is vocab-sized,
    never corpus-sized, and at 10^12 docs the vocab is the one table
    that still fits a node."""
    if not sub:
        raise ValueError("wildcard substring must be non-empty")
    if suffix_only:
        fast = expand_suffix_terms_reversed(index_dir, sub, max_expansions)
        if fast is not None:
            return fast
    t = pq.read_table(
        os.path.join(index_dir, "stats", "df.parquet"), columns=["term", "df"]
    )
    terms = t["term"]
    m = pc.ends_with(terms, sub) if suffix_only else pc.match_substring(terms, sub)
    hit = t.filter(m)
    ranked = sorted(
        zip(hit["term"].to_pylist(), hit["df"].to_pylist()),
        key=lambda td: (-td[1], td[0]),
    )
    return [w for w, _ in ranked[:max_expansions]]


def _expand_wildcard_word(
    index_dir: str, w: str, lead: bool, trail: bool, max_expansions: int
) -> list[str]:
    """THE routing table for one wildcard word — shared by the query
    grammar, ``wildcard_terms`` (search_wildcard + CLI explain) and
    anything else that grows a wildcard form, so the three surfaces can
    never route the same token differently: ``w*`` → prefix range
    read, ``*w`` → reversed-dict range read (scan fallback),
    ``*w*`` → infix vocab scan."""
    if lead and trail:
        return expand_contains_terms(index_dir, w, max_expansions)
    if lead:
        return expand_contains_terms(index_dir, w, max_expansions, suffix_only=True)
    if trail:
        return expand_prefix_terms(index_dir, w, max_expansions)
    return [w]


def wildcard_terms(
    index_dir: str, pattern: str, max_expansions: int = 20
) -> list[str]:
    """The exact term set a wildcard pattern ranks with — shared by
    :func:`search_wildcard` and the CLI explain path, so a breakdown
    always describes the terms that produced the printed rows.
    Supported forms per token: ``foo*`` (prefix, range-pruned),
    ``*foo`` (suffix, vocab scan), ``*foo*`` (infix, vocab scan)."""
    from dcs_ray.tokenize import tokenize_query_words

    terms: set[str] = set()
    for raw in pattern.split():
        lead = raw.startswith("*") and len(raw) > 1
        trail = raw.endswith("*") and len(raw) > 1
        core = raw.strip("*").lower()
        if (lead or trail) and core:
            terms.update(
                _expand_wildcard_word(index_dir, core, lead, trail, max_expansions)
            )
        else:
            terms.update(tokenize_query_words(raw))
    return sorted(terms)


_FUZZY_LOCAL_VOCAB_BYTES = 64 * 1024 * 1024


def _fuzzy_expand(
    index_dir: str, words: list[str], max_expansions: int
) -> list[str]:
    """Distance-≤1 expansion of a word batch against the index vocab —
    one SymSpell pass. Small stats tables (the common case: the vocab
    parquet ≪ a worker heap) probe DRIVER-SIDE with zero Ray round
    trips (~3× faster interactive latency, identical output by
    construction — ``suggest_local`` shares the probe/verify kernels);
    large vocabularies stream through the Dataset path."""
    from dcs_ray.functions.spell import suggest, suggest_local

    path = os.path.join(index_dir, "stats", "df.parquet")
    if os.path.getsize(path) <= _FUZZY_LOCAL_VOCAB_BYTES:
        sugg = suggest_local(pq.read_table(path), words, k=max_expansions)
    else:
        sugg = suggest(ray.data.read_parquet(path), words, k=max_expansions)
    return sorted(set(sugg["term"].to_pylist()))


def fuzzy_terms(
    index_dir: str, query: str, max_expansions: int = 50
) -> list[str]:
    """The exact expanded term set a fuzzy query ranks with — shared by
    :func:`search_fuzzy` and the CLI explain path."""
    from dcs_ray.tokenize import word_tokens_flat

    qflat, _ = word_tokens_flat(pa.array([query], pa.string()))
    words = sorted(set(qflat.to_pylist()))
    if not words:
        return []
    return _fuzzy_expand(index_dir, words, max_expansions)


def search_wildcard(
    index_dir: str,
    pattern: str,
    k: int = 10,
    max_expansions: int = 20,
    stats: dict | None = None,
) -> pa.Table:
    """Trailing-wildcard BM25 search (``spa*``): expand the prefix to the
    top-``max_expansions`` vocabulary terms by df, then rank the
    disjunction with the normal per-shard BM25 fan-out (a multi-term
    query — idf per expanded term, scores summed per doc). Mixed
    queries (``merge spa*``) expand each ``*``-suffixed token and pass
    plain tokens through unchanged."""
    terms = wildcard_terms(index_dir, pattern, max_expansions)
    if not terms:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    t = search_bm25(index_dir, [" ".join(sorted(terms))], k=k, stats=stats)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def search_fuzzy(
    index_dir: str,
    query: str,
    k: int = 10,
    max_expansions: int = 50,
    stats: dict | None = None,
) -> pa.Table:
    """Fuzzy BM25 search (Lucene FuzzyQuery semantics at edit distance
    ≤ 1): every query word expands to ALL vocabulary terms within
    levenshtein distance 1 (itself included when in-vocab), capped at
    ``max_expansions`` per word by (df desc, term asc); the union ranks
    as one disjunctive BM25 query. Distinct from ``search_corrected``,
    which REPLACES out-of-vocab words with the single best suggestion —
    fuzzy expansion keeps every near neighbor, the recall-oriented
    behavior ("spark" also matches docs that only say "sparks").

    Candidate lookup is the SymSpell deletion-key probe over the
    vocabulary Dataset (:mod:`dcs_ray.functions.spell`) — one vocab
    stream with the tiny query-side key set broadcast, never an
    edit-distance pass over the corpus."""
    stats = stats or load_stats(index_dir)
    terms = fuzzy_terms(index_dir, query, max_expansions)
    if not terms:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    t = search_bm25(index_dir, [" ".join(terms)], k=k, stats=stats)
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(np.round(t["score"].to_numpy(), 6), pa.float64()),
        }
    )


def explain_scores(
    index_dir: str,
    query: str,
    k: int = 10,
    stats: dict | None = None,
    doc_ids: list | np.ndarray | None = None,
    ranks: list | np.ndarray | None = None,
) -> pa.Table:
    """Lucene-style score EXPLAIN: the normal top-k ranking plus the
    per-term BM25 contribution of every (result doc, query term) pair
    with tf > 0 — ``(rank, doc_id, term, tf, idf, contribution)``,
    ordered (rank asc, term asc), Σ contributions per doc equal to the
    ranking score by construction (same cached contribution vectors).

    Cost shape: ranking is the standard fan-out; the breakdown then
    decodes ONLY the query terms' postings in the shards that hold the
    k result docs (driver-side, k·|terms| searchsorted probes into the
    per-worker-cache-backed vectors) — result-set-sized, never
    corpus-sized. The serving analogue is debug tooling, not a hot
    path.

    With ``doc_ids`` the internal ranking is skipped and the breakdown
    covers exactly those docs (``ranks`` aligned, default 1..n in the
    given order) against the terms of ``query`` — the serving/CLI path
    hands in its ALREADY-RANKED rows plus the PLANNED (expanded) query
    text, so grammar operators, filters and expansions can never make
    the breakdown describe a different ranking than the one shown."""
    stats = stats or load_stats(index_dir)
    if doc_ids is not None:
        ids = np.asarray(doc_ids, dtype=np.uint64)
        ranks = (
            np.asarray(ranks, dtype=np.int64)
            if ranks is not None
            else np.arange(1, len(ids) + 1, dtype=np.int64)
        )
    else:
        top = search_bm25(index_dir, [query], k=k, stats=stats)
        ids = top["doc_id"].to_numpy().astype(np.uint64)
        ranks = top["rank"].to_numpy()
    if len(ids) == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "idf": pa.array([], pa.float64()),
                "contribution": pa.array([], pa.float64()),
            }
        )
    plan = plan_query(index_dir, query, stats)
    rows_rank, rows_doc, rows_term, rows_tf, rows_idf, rows_c = [], [], [], [], [], []
    for shard in shard_paths(index_dir):
        seg = _open(shard)
        in_shard = (ids >= seg.doc_ids[0]) & (ids <= seg.doc_ids[-1])
        if not in_shard.any():
            continue
        want = ids[in_shard]
        want_rank = ranks[in_shard]
        for term, idf in plan:
            idx = seg.term_index(term)
            if idx < 0:
                continue
            doc_ids, tfs = _decode_term_cached(seg, idx)
            pos = np.searchsorted(doc_ids, want)
            pos = np.minimum(pos, max(len(doc_ids) - 1, 0))
            hit = doc_ids[pos] == want
            if not hit.any():
                continue
            h_docs = want[hit]
            h_tf = tfs[pos[hit]]
            contrib = _bm25_term_scores(seg, h_docs, h_tf, idf, stats)
            rows_rank.extend(want_rank[hit].tolist())
            rows_doc.extend(h_docs.tolist())
            rows_term.extend([term] * int(hit.sum()))
            rows_tf.extend(h_tf.tolist())
            rows_idf.extend([idf] * int(hit.sum()))
            rows_c.extend(contrib.tolist())
    t = pa.table(
        {
            "rank": pa.array(np.asarray(rows_rank, np.int64), pa.int64()),
            "doc_id": pa.array(np.asarray(rows_doc, np.int64), pa.int64()),
            "term": pa.array(rows_term, pa.string()),
            "tf": pa.array(np.asarray(rows_tf, np.int64), pa.int64()),
            "idf": pa.array(np.round(np.asarray(rows_idf, np.float64), 6), pa.float64()),
            "contribution": pa.array(
                np.round(np.asarray(rows_c, np.float64), 6), pa.float64()
            ),
        }
    )
    return t.sort_by([("rank", "ascending"), ("term", "ascending")])


def query_difficulty_pre(
    index_dir: str,
    queries: list[str],
    stats: dict | None = None,
) -> pa.Table:
    """PRE-retrieval query-performance prediction (He & Ounis '04 /
    Zhao-Scholer-Tsegay '08): statistics of the query terms alone,
    computed before any ranking — the router's signal for choosing
    expansion, fusion or collection routing when the post-retrieval
    predictors (clarity, NQC) are not yet available.

    Per query, over its IN-VOCABULARY terms (OOV terms are dropped, the
    same convention as the planner): ``max_idf``/``avg_idf``/``var_idf``
    with idf = ln(N/df); ``avg_ictf`` with ICTF = ln(T/cf); ``nscq`` =
    mean over terms of (1 + ln cf)·ln(1 + N/df). df comes from the
    stats table probe and cf from one posting pass per shard
    (``collection_cf`` — both vocab-bounded, no corpus scan)."""
    stats = stats or load_stats(index_dir)
    from dcs_ray.tokenize import tokenize_query_words

    per_q = [sorted(set(tokenize_query_words(q))) for q in queries]
    all_terms = sorted({t for ts in per_q for t in ts})
    dfs = global_df(index_dir, all_terms)
    cfs = collection_cf(index_dir, [t for t in all_terms if dfs.get(t, 0) > 0])
    N = float(stats["n_docs"])
    T = float(stats["sum_doc_len"]) or 1.0
    out = {
        "query": [], "n_terms": [], "max_idf": [], "avg_idf": [],
        "var_idf": [], "avg_ictf": [], "nscq": [],
    }
    for q, terms in zip(queries, per_q):
        kept = [t for t in terms if dfs.get(t, 0) > 0]
        out["query"].append(q)
        out["n_terms"].append(len(kept))
        if not kept:
            for c in ("max_idf", "avg_idf", "var_idf", "avg_ictf", "nscq"):
                out[c].append(0.0)
            continue
        idf = np.array([math.log(N / dfs[t]) for t in kept], np.float64)
        ictf = np.array([math.log(T / cfs[t]) for t in kept], np.float64)
        scq = np.array(
            [(1.0 + math.log(cfs[t])) * math.log(1.0 + N / dfs[t]) for t in kept],
            np.float64,
        )
        out["max_idf"].append(round(float(idf.max()), 6))
        out["avg_idf"].append(round(float(idf.sum()) / len(kept), 6))
        out["var_idf"].append(
            round(float(((idf - idf.sum() / len(kept)) ** 2).sum()) / len(kept), 6)
        )
        out["avg_ictf"].append(round(float(ictf.sum()) / len(kept), 6))
        out["nscq"].append(round(float(scq.sum()) / len(kept), 6))
    return pa.table(
        {
            "query": pa.array(out["query"], pa.string()),
            "n_terms": pa.array(out["n_terms"], pa.int64()),
            "max_idf": pa.array(np.array(out["max_idf"]) + 0.0, pa.float64()),
            "avg_idf": pa.array(np.array(out["avg_idf"]) + 0.0, pa.float64()),
            "var_idf": pa.array(np.array(out["var_idf"]) + 0.0, pa.float64()),
            "avg_ictf": pa.array(np.array(out["avg_ictf"]) + 0.0, pa.float64()),
            "nscq": pa.array(np.array(out["nscq"]) + 0.0, pa.float64()),
        }
    )


def export_postings(
    index_dir: str, terms: list[str] | None = None
) -> ray.data.Dataset:
    """Decode the index back into a ``(term, doc_id, tf)`` Dataset — the
    migration/backfill path (index → data roundtrip): feed another
    engine, rebuild with different partitioning, or audit the postings
    themselves. One task per shard; with ``terms`` only those postings
    decode (dictionary binary search per shard), with ``None`` the
    whole shard streams out in vocab order. Output is shard-parallel
    and Parquet-ready (``.write_parquet``); each term's postings come
    from exactly one decode per shard (no cache churn — the raw blob
    decoder is used directly, not the query-path LRU)."""
    paths = shard_paths(index_dir)
    work = ray.data.from_items([{"path_id": pid} for pid in range(len(paths))])
    sel = sorted(set(terms)) if terms is not None else None

    def run(batch: pa.Table) -> pa.Table:
        out_t, out_d, out_f = [], [], []
        for pid in batch["path_id"].to_pylist():
            seg = _open(paths[pid])
            if sel is not None:
                idxs = [(t, seg.term_index(t)) for t in sel]
                idxs = [(t, i) for t, i in idxs if i >= 0]
            else:
                terms_np = seg.terms.to_numpy(zero_copy_only=False)
                idxs = [(terms_np[i], i) for i in range(len(terms_np))]
            for t, i in idxs:
                d, f = decode_postings(seg.term_blob(i))
                out_t.extend([t] * len(d))
                out_d.append(d)
                out_f.append(f)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "tf": pa.array(
                    np.concatenate(out_f).astype(np.int64)
                    if out_f
                    else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return work.map_batches(run, batch_size=1, batch_format="pyarrow")


def search_as_you_type(
    index_dir: str,
    query: str,
    k: int = 10,
    max_expansions: int = 20,
    stats: dict | None = None,
) -> pa.Table:
    """Instant-search-box semantics (Elasticsearch search_as_you_type):
    the LAST token is treated as an in-progress prefix and expanded
    against the vocabulary; completed tokens rank as typed. 'join me'
    ranks as 'join me*' — each keystroke re-runs this with the warm
    pool, so results refine as the user types."""
    toks = query.split()
    if not toks:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    if not toks[-1].endswith("*"):
        toks = toks[:-1] + [toks[-1] + "*"]
    return search_wildcard(
        index_dir, " ".join(toks), k=k, max_expansions=max_expansions, stats=stats
    )
