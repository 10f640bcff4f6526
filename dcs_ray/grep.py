"""Verification grep: run the real pattern over candidate documents and
emit matches with line context — the dcs source-backend read path
(F10/F11/F12, ``SURVEY.md §2.2``).

dcs greps candidate files with 1000 goroutines per query
(``internal/sourcebackend/sourcebackend.go:416``); here the same fan-out
is a ``map_batches`` stage over the text column, restricted to the
candidate doc ids from the trigram index (the J3 restrict semi-join:
``np.isin`` against a broadcast sorted candidate array). Per match we
keep at most one match per line (D3, ``sourcebackend.go:500-507``) and
extract two lines of context either side (FiveLines,
``internal/index/read.go:484-528``)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

# The reference greps with an RE2-style DFA whose match time is
# guaranteed linear (``regexp/regexp.go:17``, ``regexp/match.go``);
# Python's ``re`` is a backtracker that can go exponential on hostile
# patterns, letting one query wedge a worker for hours. Two layers
# restore the guarantee: the ``regex`` package's per-call deadline
# bounds the fast path, and a doc that blows the budget re-runs on the
# worst-case-linear Pike VM (``dcs_ray.nfa``) — full results, bounded
# time. Only patterns the NFA cannot express (backrefs, lookaround)
# still bail out with a counted sentinel row.
try:  # pragma: no cover - import probe
    import regex as _regex_engine

    _HAS_TIMEOUT = True
except ImportError:  # pragma: no cover
    _regex_engine = re
    _HAS_TIMEOUT = False


def five_lines(text: str, offset: int) -> tuple[int, list[str]]:
    """(line number (1-based), [ctx-2, ctx-1, line, ctx+1, ctx+2]) for the
    line containing byte ``offset`` — ``internal/index/read.go:484-528``
    semantics: missing neighbours are empty strings."""
    lines = text.split("\n")
    # find line index by cumulative offsets
    cum = 0
    idx = 0
    for i, ln in enumerate(lines):
        nxt = cum + len(ln) + 1
        if offset < nxt:
            idx = i
            break
        cum = nxt
    else:
        idx = len(lines) - 1
    out = []
    for j in range(idx - 2, idx + 3):
        out.append(lines[j] if 0 <= j < len(lines) else "")
    return idx + 1, out


def candidate_mask(ids: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """Membership of ``ids`` in the SORTED candidate array — the J3
    restrict-semi-join kernel, shared by the verify grep and ``replay
    --phases``'s doc-read stage so the two paths can never filter
    differently (one searchsorted probe; dtypes matched so the compare
    stays in integer space)."""
    if len(cand) == 0:
        return np.zeros(len(ids), bool)
    c = cand.astype(ids.dtype, copy=False)
    pos = np.clip(np.searchsorted(c, ids), 0, len(c) - 1)
    return c[pos] == ids


class RegexGrepper:
    """Actor-pool stage: compiled pattern held per actor (ST5 —
    one compiled matcher per worker, ``regexp/regexp.go:17``,
    ``sourcebackend.go:560-571``)."""

    def __init__(self, pattern: str, candidates=None,
                 id_col: str = "doc_id", max_matches_per_doc: int | None = None,
                 match_timeout: float = 2.0, engine: str = "auto",
                 progress: tuple | None = None):
        # progress = (query_id, report_every_s): per-batch cumulative
        # (docs_scanned, docs_total, n_match_rows) posts to the named
        # ProgressBus — the sourcebackend filesProcessed stream
        self.progress = progress
        self.rx = _regex_engine.compile(pattern)
        # per-doc wall budget for the backtracker (see module header);
        # None disables even when the engine supports it
        self.match_timeout = match_timeout if _HAS_TIMEOUT else None
        # worst-case-linear guarantee path (dcs's RE2-style automaton,
        # regexp/match.go:421-560): a doc that blows the backtracker's
        # budget re-runs on the Pike VM instead of bailing out, so
        # hostile patterns like (a+)+$ complete with ZERO lost docs.
        # engine="nfa" forces it for every doc (tests/differential use).
        from dcs_ray.nfa import Unsupported, compile_nfa

        self.engine = engine
        try:
            self.nfa = compile_nfa(pattern)
        except Unsupported:
            self.nfa = None  # backrefs/lookaround: budget + sentinel stays
        if engine == "nfa" and self.nfa is None:
            raise ValueError(f"pattern {pattern!r} unsupported by the NFA engine")
        # candidates may be an ndarray OR a ray.ObjectRef to one — a ref
        # costs one plasma fetch per worker (zero-copy, shared) instead of
        # pickling millions of ids into every task's closure
        self._cand_ref = None
        if candidates is not None and not isinstance(candidates, np.ndarray):
            self._cand_ref = candidates
            self.candidates = None
        else:
            self.candidates = np.sort(candidates) if candidates is not None else None
        self._resolved = candidates is None or self.candidates is not None
        self.id_col = id_col
        # no cap by default: the oracle-compared path counts every matching
        # line; a cap is an opt-in latency guard for interactive serving
        self.cap = max_matches_per_doc if max_matches_per_doc is not None else (1 << 62)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._resolved:
            # candidate_mask needs SORTED ids; producers ship sorted
            # arrays but a caller-supplied ref might not be — sorting a
            # sorted array is cheap, guessing wrong is a silent miss
            self.candidates = np.sort(ray.get(self._cand_ref))
            self._resolved = True
        ids = batch[self.id_col].to_numpy()
        if self.candidates is not None:
            keep = candidate_mask(ids, self.candidates)
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        texts = batch["text"].to_pylist()
        out = {"doc_id": [], "line": [], "position": [], "context": [],
               "ctx_before": [], "ctx_after": []}
        reporter = None
        if self.progress is not None and len(ids):
            from dcs_ray.progress import ProgressReporter, get_bus

            qid, every = self.progress
            reporter = ProgressReporter(
                get_bus(), qid, shard=f"grep-{int(ids[0])}",
                total=len(ids), report_every_s=every,
            )
        for did, text in zip(ids, texts):
            # split ONCE per doc; per match the containing line is a
            # searchsorted into the cumulative line-start offsets
            lines = text.split("\n")
            line_start = np.empty(len(lines) + 1, dtype=np.int64)
            line_start[0] = 0
            np.cumsum([len(ln) + 1 for ln in lines], out=line_start[1:])

            def collect(starts_iter, into=None) -> list[tuple[int, int]]:
                """(lineno, start) per matched line, ≤1/line (D3).
                ``into`` lets the timeout path keep partial results —
                the list survives the generator's TimeoutError."""
                rows: list[tuple[int, int]] = [] if into is None else into
                seen_lines: set[int] = {ln for ln, _s in rows}
                for start in starts_iter:
                    if len(seen_lines) >= self.cap:
                        break
                    idx = int(np.searchsorted(line_start, start, side="right")) - 1
                    lineno = idx + 1
                    if lineno in seen_lines:
                        continue
                    seen_lines.add(lineno)
                    rows.append((lineno, start))
                return rows

            if self.engine == "nfa":
                rows = collect(s for s, _e in self.nfa.finditer(text))
            else:
                it = (
                    self.rx.finditer(text, timeout=self.match_timeout)
                    if self.match_timeout is not None
                    else self.rx.finditer(text)
                )
                rows = []
                try:
                    collect((m.start() for m in it), into=rows)
                except TimeoutError:
                    if self.nfa is not None:
                        # budget blown: redo this doc on the linear
                        # engine — same matches, bounded time, no loss
                        rows = collect(s for s, _e in self.nfa.finditer(text))
                    else:
                        # pattern the NFA can't express (backrefs,
                        # lookaround): keep the matches found before the
                        # budget blew plus ONE sentinel row (line=-1) so
                        # the bail-out is counted downstream
                        rows.append((-1, -1))
            for lineno, start in rows:
                idx = lineno - 1
                ctx = (
                    [lines[j] if 0 <= j < len(lines) else ""
                     for j in range(idx - 2, idx + 3)]
                    if lineno > 0 else ["", "", "", "", ""]
                )
                out["doc_id"].append(int(did))
                out["line"].append(lineno)
                out["position"].append(start)
                out["context"].append(ctx[2])
                out["ctx_before"].append("\n".join(ctx[:2]))
                out["ctx_after"].append("\n".join(ctx[3:]))
            if reporter is not None:
                reporter.add(1, len(rows))
        if reporter is not None:
            reporter.flush(done=True)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "line": pa.array(out["line"], pa.int64()),
                "position": pa.array(out["position"], pa.int64()),
                "context": pa.array(out["context"], pa.string()),
                "ctx_before": pa.array(out["ctx_before"], pa.string()),
                "ctx_after": pa.array(out["ctx_after"], pa.string()),
            }
        )


def grep_regex(
    docs: ray.data.Dataset,
    pattern: str,
    candidates: np.ndarray | None = None,
    id_col: str = "doc_id",
    concurrency: int | None = None,
    progress: tuple | None = None,
    match_timeout: float = 2.0,
    engine: str = "auto",
) -> ray.data.Dataset:
    """Grep documents for a regex, optionally restricted to candidate doc
    ids (from the trigram planner), returning matches with context."""
    if progress is not None:
        # create the bus from the DRIVER so it owns the named actor —
        # a worker-created bus dies with that worker's actor pool
        from dcs_ray.progress import get_bus

        get_bus()
    fn = RegexGrepper(pattern, candidates, id_col, progress=progress,
                      match_timeout=match_timeout, engine=engine)
    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def shard_candidates(path: str, pattern: str) -> np.ndarray | None:
    """Evaluate a regex's trigram query tree against one shard → candidate
    doc ids (None = unfilterable for this shard)."""
    from dcs_ray.codec import decode_postings
    from dcs_ray.queryplan import eval_query, regexp_query
    from dcs_ray.search import _open

    seg = _open(path)
    q = regexp_query(pattern)

    def lookup(t: str):
        tri = (ord(t[0]) << 16) | (ord(t[1]) << 8) | ord(t[2])
        idx = seg.term_index(np.uint32(tri))
        if idx < 0:
            return np.empty(0, np.uint64)
        return decode_postings(seg.term_blob(idx))[0]

    r = eval_query(q, lookup)
    return None if isinstance(r, str) else r


def regex_candidates(index_dir: str, pattern: str) -> np.ndarray | None:
    """The posting-scan phase of the dcs query path in isolation: regex
    → trigram plan → candidate generation over every shard (one Ray
    task per shard — the source-backend fan-out, never a driver-side
    decode loop). Returns ``None`` when the query is unfilterable
    (grep everything), else a SORTED uint64 id array (possibly empty).
    ``search_regex`` composes this with the verify grep; ``replay
    --phases`` times it standalone (``cmd/dcs/replay.go:37-45``'s
    index-only phase)."""
    import pyarrow as pa2

    from dcs_ray.queryplan import regexp_query
    from dcs_ray.search import shard_paths

    q = regexp_query(pattern)
    if q.op == "NONE":
        return np.empty(0, np.uint64)
    if q.op == "ALL":
        return None  # unfilterable query: grep everything
    paths = shard_paths(index_dir)
    work = ray.data.from_items([{"path": p} for p in paths])

    def cand(batch: pa2.Table) -> pa2.Table:
        parts, unfilterable = [], False
        for p in batch["path"].to_pylist():
            r = shard_candidates(p, pattern)
            if r is None:
                unfilterable = True
            else:
                parts.append(r)
        if unfilterable:  # any unfilterable shard ⇒ grep everything
            return pa2.table(
                {"doc_id": pa2.array([0], pa2.uint64()),
                 "unfilterable": pa2.array([True])}
            )
        ids = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        return pa2.table(
            {
                "doc_id": pa2.array(ids, pa2.uint64()),
                "unfilterable": pa2.array(np.zeros(len(ids), dtype=bool)),
            }
        )

    tables = [
        pa2.table(b)
        for b in work.map_batches(cand, batch_size=1, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not tables:  # every shard returned zero candidates
        return np.empty(0, np.uint64)
    tbl = pa2.concat_tables(tables)
    import pyarrow.compute as pc2

    if pc2.any(tbl["unfilterable"]).as_py():
        return None
    return np.sort(tbl["doc_id"].to_numpy().astype(np.uint64))


def search_regex(index_dir: str, docs: ray.data.Dataset, pattern: str,
                 id_col: str = "doc_id", engine: str = "auto") -> ray.data.Dataset:
    """Full dcs query path: regex → trigram plan → candidate generation on
    the index (``regex_candidates``) → restricted verify grep
    (``SURVEY.md §3.2``)."""
    candidates = regex_candidates(index_dir, pattern)
    if candidates is not None and len(candidates) == 0:
        return docs.limit(0)
    if candidates is not None:
        # ship ids through the object store (one shared copy), not the
        # task closure
        candidates = ray.put(candidates)
    return grep_regex(docs, pattern, candidates, id_col, engine=engine)


MATCH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("line", pa.int64()),
        ("position", pa.int64()),
        ("context", pa.string()),
        ("ctx_before", pa.string()),
        ("ctx_after", pa.string()),
    ]
)


def search_regex_fused(
    index_dir: str,
    docs_files: list[str] | str,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "auto",
) -> ray.data.Dataset:
    """Regex search with candidate generation FUSED into the verify task
    — the scale path for id-range-partitioned corpora.

    One task per shard: evaluate the trigram query against the shard,
    then read ONLY the shard's doc-id range from the documents Parquet
    (row-group predicate pushdown), mask by the candidate ids in memory,
    and grep. Candidate ids never leave the task — no driver
    concatenation, no broadcast, regardless of how common the pattern's
    trigrams are (a common-trigram regex yields millions of ids per
    shard at web scale). The driver sees only match rows.
    """
    from dcs_ray.queryplan import regexp_query
    from dcs_ray.search import _open, shard_paths

    if isinstance(docs_files, str):
        docs_files = [docs_files]
    q = regexp_query(pattern)
    if q.op == "NONE":
        return ray.data.from_arrow(MATCH_SCHEMA.empty_table())
    unfilterable = q.op == "ALL"
    shards = shard_paths(index_dir)

    def run(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        out = []
        for sp in batch["path"].to_pylist():
            seg = _open(sp)
            if len(seg.doc_ids) == 0:
                continue
            cands = None if unfilterable else shard_candidates(sp, pattern)
            if cands is not None and len(cands) == 0:
                continue
            lo, hi = int(seg.doc_ids[0]), int(seg.doc_ids[-1])
            dset = pads.dataset(docs_files)
            tbl = dset.to_table(
                filter=(pads.field(id_col) >= lo) & (pads.field(id_col) <= hi),
                columns=[id_col, text_col],
            )
            grepper = RegexGrepper(pattern, cands, id_col, engine=engine)
            out.append(grepper(tbl))
        if not out:
            return MATCH_SCHEMA.empty_table()
        return pa.concat_tables(out)

    work = ray.data.from_items([{"path": p} for p in shards])
    return work.map_batches(run, batch_size=1, batch_format="pyarrow")


def first_match_snippets(
    texts: "pa.ChunkedArray | pa.Array",
    terms: list[str],
    before: int = 20,
    width: int = 50,
) -> "pa.Array":
    """Per row: the ``width``-char substring starting ``before`` chars
    ahead of the EARLIEST occurrence of any term (clipped to the text
    start); empty string when no term occurs. Vectorized: one
    ``find_substring`` kernel per term + one ``utf8_slice_codeunits``.
    The result-presentation stage of a search API (the reference shows
    per-match context the same way, ``internal/index/read.go:484-528``)."""
    import pyarrow as pa

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # find AND slice both on the Python str so offsets are codepoints
    # end-to-end (pc.find_substring returns BYTE offsets, which diverge
    # from codepoint slicing on any non-ASCII text); this stage runs on
    # RESULT sets (top-k rows), not the corpus, so the row loop is O(k)
    out = []
    for s in texts.to_pylist():
        s = s or ""
        best = -1
        for t in terms:
            p = s.find(t)
            if p >= 0 and (best < 0 or p < best):
                best = p
        if best < 0:
            out.append("")
        else:
            start = max(best - before, 0)
            out.append(s[start : start + width])
    return pa.array(out, pa.string())


def best_passage_windows(
    texts: pa.Array | pa.ChunkedArray, terms: list[str], window: int = 30
) -> pa.Table:
    """Best fixed-width passage per text row: the ``window``-token span
    holding the most query-term occurrences (Callan '94 fixed-arity
    passage retrieval) — the snippet seeder one level above
    ``first_match_snippets``' first-hit heuristic, and the passage
    scorer a QA pipeline feeds its reader from.

    One vectorized pass over the whole batch: flat tokenization, a
    term-membership mask, then for every hit h the number of hits in
    ``[h, h+window)`` is one global ``searchsorted`` on doc-offset
    composite keys (the optimal window always starts at a hit). Ties
    break to the earliest start; rows without any hit report (0, 0).
    Returns ``(pass_start, pass_hits)`` int64 columns aligned to rows —
    both token indices, so an SQL oracle replays them exactly from
    zipped ``unnest(toks) / unnest(range(len(toks)))`` positions.
    """
    import pyarrow.compute as pc

    from dcs_ray.tokenize import word_tokens_flat

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    best_start = np.zeros(n, np.int64)
    best_hits = np.zeros(n, np.int64)
    flat, parents = word_tokens_flat(texts)
    if len(flat) == 0:
        return pa.table(
            {"pass_start": pa.array(best_start), "pass_hits": pa.array(best_hits)}
        )
    counts = np.bincount(parents, minlength=n)
    offs = np.concatenate(([0], np.cumsum(counts)))
    pos = np.arange(len(parents), dtype=np.int64) - offs[parents]
    member = pc.is_in(
        flat, value_set=pa.array(sorted(set(terms)), pa.string())
    ).to_numpy(zero_copy_only=False)
    hp = parents[member].astype(np.int64)
    hpos = pos[member]
    if len(hp) == 0:
        return pa.table(
            {"pass_start": pa.array(best_start), "pass_hits": pa.array(best_hits)}
        )
    # composite keys: doc-major, position-minor — globally sorted, so ONE
    # searchsorted counts each hit's window across every doc at once
    big = np.int64(int(pos.max()) + window + 2)
    keys = hp * big + hpos
    cnt = np.searchsorted(keys, keys + window, side="left") - np.arange(len(keys))
    # per-doc argmax (hits desc, start asc): hp is already ascending, so
    # lexsort within doc and take each run's head
    order = np.lexsort((hpos, -cnt, hp))
    hp_o = hp[order]
    heads = order[np.concatenate(([0], np.flatnonzero(hp_o[1:] != hp_o[:-1]) + 1))]
    rows = hp[heads]
    best_start[rows] = hpos[heads]
    best_hits[rows] = cnt[heads]
    return pa.table(
        {"pass_start": pa.array(best_start), "pass_hits": pa.array(best_hits)}
    )
