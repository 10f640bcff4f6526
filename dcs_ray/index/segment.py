"""Per-partition index segments: build in memory, write atomically, read.

A segment is the Ray-Data rebuild of dcs's per-package index directory
(``internal/index/write.go:222-247`` — Flush writes docid.map +
posting.{docid,pos}.{meta,turbopfor} + posting.posrel.*). Ours is:

    seg_<part_id>/
      doc_meta.parquet    (doc_id u64, url str, doc_len u32)   # docid.map analogue
      term_dict.parquet   (term, df u32, offset i64, nbytes i64, max_tf u32)
                                                               # MetaEntry analogue
      postings.bin        block-max varint posting blobs (codec.py)
      positions.bin + pos_dict.parquet   (optional positional sections)

Doc ids are ``part_id << 32 | local_rank`` with local_rank = rank of url
within the partition after latest-crawl dedup — deterministic under any
parallelism and under resume (SURVEY §7.5), and globally ordered when
partitions are concatenated in part_id order, which is what makes the
k-way merge pure concatenation (``internal/index/merge.go:126-150``'s
docid-base trick, precomputed into the id).

Writes are temp-dir + atomic rename, mirroring
``cmd/dcs-package-importer/importer.go:399-466``.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcs_ray.codec import pack_postings
from dcs_ray.index.config import IndexConfig
from dcs_ray.tokenize import tokenize_batch_words_grouped, trigram_tokens

DOC_BITS = 32  # local-rank bits inside a doc_id


def segment_name(part_id: int) -> str:
    return f"seg_{part_id:06d}"


# ---------------------------------------------------------------------------
# build (pure in-memory, one partition)
# ---------------------------------------------------------------------------


def _dedup_latest(tbl: pa.Table, conf: IndexConfig) -> pa.Table:
    """Newest crawl per url within the partition (url → partition is
    deterministic, so partition-local dedup is globally exact)."""
    order = [(conf.url_col, "ascending"), (conf.ts_col, "descending")]
    tbl = tbl.sort_by(order)
    urls = tbl[conf.url_col].combine_chunks()
    n = len(urls)
    if n <= 1:
        return tbl
    first = np.ones(n, dtype=bool)
    eq = pc.equal(urls.slice(1), urls.slice(0, n - 1)).to_numpy(zero_copy_only=False)
    first[1:] = ~eq
    return tbl.filter(pa.array(first))


def build_segment_data(part_id: int, tbl: pa.Table, conf: IndexConfig) -> dict:
    """Build one segment's data structures from its documents (in memory).

    Returns a dict with doc_meta / term_dict arrays and the posting blob;
    ``write_segment`` persists it.
    """
    if conf.dedup_latest and conf.ts_col in tbl.column_names:
        tbl = _dedup_latest(tbl, conf)
    # deterministic doc ids
    if conf.id_col is not None:
        tbl = tbl.sort_by([(conf.id_col, "ascending")])
        doc_ids = tbl[conf.id_col].combine_chunks().to_numpy().astype(np.uint64)
        urls = tbl[conf.url_col] if conf.url_col in tbl.column_names else pa.array(
            [str(d) for d in doc_ids]
        )
    else:
        tbl = tbl.sort_by([(conf.url_col, "ascending")])
        doc_ids = (np.uint64(part_id) << np.uint64(DOC_BITS)) + np.arange(
            len(tbl), dtype=np.uint64
        )
        urls = tbl[conf.url_col]

    texts = tbl[conf.text_col].combine_chunks()

    if conf.mode == "words":
        uniq_terms, group_offsets, p_doc, p_tf, doc_len = tokenize_batch_words_grouped(
            texts, doc_ids
        )
        positions_blob, pos_dict = None, None
    else:  # trigram mode
        tri, tdoc, tpos = trigram_tokens(texts, doc_ids)
        # order by (trigram, doc, pos); tokens are already doc/pos ordered,
        # so a stable sort on trigram alone preserves (doc, pos) within term
        order = np.argsort(tri, kind="stable")
        tri, tdoc, tpos = tri[order], tdoc[order], tpos[order]
        doc_len = _doc_token_counts(tdoc, doc_ids)
        # collapse to (term, doc) groups with tf + positions
        boundaries = np.flatnonzero((tri[1:] != tri[:-1]) | (tdoc[1:] != tdoc[:-1])) + 1
        starts = np.concatenate(([0], boundaries))
        p_doc = tdoc[starts]
        p_tf = np.diff(np.concatenate((starts, [len(tri)]))).astype(np.uint64)
        term_per_pair = tri[starts]
        tb = np.flatnonzero(term_per_pair[1:] != term_per_pair[:-1]) + 1
        group_offsets = np.concatenate(([0], tb, [len(term_per_pair)]))
        uniq_terms = pa.array(term_per_pair[np.concatenate(([0], tb))].astype(np.uint32))
        if conf.positional:
            positions_blob, pos_dict = _pack_positional(
                uniq_terms, group_offsets, p_doc, starts, tpos
            )
        else:
            positions_blob, pos_dict = None, None

    blob, t_off, t_len = (
        pack_postings(group_offsets, p_doc, p_tf, codec=conf.codec)
        if len(p_doc)
        else (b"", np.empty(0, np.int64), np.empty(0, np.int64))
    )
    df = np.diff(group_offsets).astype(np.uint32) if len(p_doc) else np.empty(0, np.uint32)
    max_tf = (
        np.maximum.reduceat(p_tf, group_offsets[:-1]).astype(np.uint32)
        if len(p_doc)
        else np.empty(0, np.uint32)
    )
    return {
        "part_id": part_id,
        "doc_ids": doc_ids,
        "urls": urls,
        "meta": {
            c: tbl[c].combine_chunks() for c in conf.meta_cols if c in tbl.column_names
        },
        "doc_len": doc_len.astype(np.uint32),
        "terms": uniq_terms,
        "df": df,
        "offset": t_off,
        "nbytes": t_len,
        "max_tf": max_tf,
        "blob": blob,
        "positions_blob": positions_blob,
        "pos_dict": pos_dict,
        "mode": conf.mode,
    }


def _term_groups(terms: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """Group offsets over a term-sorted string array, vectorized via
    dictionary encoding."""
    n = len(terms)
    if n == 0:
        return np.array([0], dtype=np.int64), terms
    enc = pc.dictionary_encode(terms)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    boundaries = np.flatnonzero(idx[1:] != idx[:-1]) + 1
    group_offsets = np.concatenate(([0], boundaries, [n]))
    first_idx = np.concatenate(([0], boundaries))
    return group_offsets, terms.take(pa.array(first_idx))


def _doc_token_counts(tdoc: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    """Total token (trigram) count per doc in doc_ids order."""
    if len(tdoc) == 0:
        return np.zeros(len(doc_ids), dtype=np.uint32)
    sorted_ids = doc_ids  # already ascending
    pos = np.searchsorted(sorted_ids, tdoc)
    return np.bincount(pos, minlength=len(doc_ids)).astype(np.uint32)


def _pack_positional(uniq_terms, group_offsets, p_doc, pair_starts, tpos):
    """Pack positional sections per term (dcs posting.pos/posrel analogue,
    ``internal/index/write.go:333-441``).

    Besides (offset, nbytes) the dict carries the **stitch metadata** the
    shard merge needs to splice per-term runs without decoding them
    (``merge.go:343-405`` does the same with its raw-section copies):
    ndocs / npos locate the posrel bitmap and position stream inside the
    blob, first_doc / last_doc / d0_nbytes let the merge re-encode a
    run's leading absolute doc id as a delta from the previous run.
    """
    from dcs_ray.codec import _ranges, _varint_lengths, varint_encode

    n_terms = len(uniq_terms)
    go = np.asarray(group_offsets, dtype=np.int64)
    pair_starts = np.asarray(pair_starts, dtype=np.int64)
    pair_ends = np.concatenate((pair_starts[1:], [len(tpos)]))
    tpos = tpos.astype(np.uint64, copy=False)

    ndocs = np.diff(go)
    first_doc = p_doc[go[:-1]].astype(np.uint64)
    last_doc = p_doc[go[1:] - 1].astype(np.uint64)
    paircount = pair_ends - pair_starts
    npos = np.add.reduceat(paircount, go[:-1]) if n_terms else np.empty(0, np.int64)
    tok_lo = pair_starts[go[:-1]]  # each term's positions are ONE span

    # headers: varint(ndocs) ++ varint(npos) per term, encoded in one pass
    inter = np.empty(2 * n_terms, dtype=np.uint64)
    inter[0::2] = ndocs
    inter[1::2] = npos
    hdr_enc, hdr_lens = varint_encode(inter)
    hdr_term = hdr_lens[0::2] + hdr_lens[1::2]

    # docid-delta streams: deltas over the whole pair array with an
    # absolute reset at each term start; per-term stream = one byte span
    deltas = p_doc.astype(np.uint64).copy()
    deltas[1:] -= p_doc[:-1].astype(np.uint64)
    deltas[go[:-1]] = first_doc
    doc_enc, dlen = varint_encode(deltas)
    doc_nbytes = np.add.reduceat(dlen, go[:-1]) if n_terms else np.empty(0, np.int64)

    # posrel bitmaps: 1 bit per position, set at pair (doc) starts;
    # per-term byte alignment via the padded-scatter + packbits trick
    rel_len = (npos + 7) // 8
    bits = np.zeros(len(tpos), dtype=np.uint8)
    bits[pair_starts] = 1
    rel_excl = np.concatenate(([0], np.cumsum(rel_len)))[:-1] if n_terms else np.empty(0, np.int64)
    padded = np.zeros(int(rel_len.sum()) * 8 if n_terms else 0, dtype=np.uint8)
    if len(tpos):
        padded[_ranges(8 * rel_excl, npos)] = bits
    rel_packed = np.packbits(padded, bitorder="little")

    # position-delta streams: delta from the previous position within a
    # pair, absolute at pair starts; per-term stream = one byte span
    pdel = tpos.copy()
    with np.errstate(over="ignore"):
        pdel[1:] = tpos[1:] - tpos[:-1]
    pdel[pair_starts] = tpos[pair_starts]
    pos_enc, plen = varint_encode(pdel)
    pos_nbytes = np.add.reduceat(plen, tok_lo) if n_terms else np.empty(0, np.int64)

    # assemble per-term blobs: hdr | docsec | relsec | possec
    term_total = hdr_term + doc_nbytes + rel_len + pos_nbytes
    term_off = np.concatenate(([0], np.cumsum(term_total)))[:-1] if n_terms else np.empty(0, np.int64)
    out = np.zeros(int(term_total.sum()) if n_terms else 0, dtype=np.uint8)
    if n_terms:
        # each encoded stream already tiles in term order — the scatter
        # destinations interleave them into per-term blobs
        out[_ranges(term_off, hdr_term)] = hdr_enc
        dbase = term_off + hdr_term
        out[_ranges(dbase, doc_nbytes)] = doc_enc
        rbase = dbase + doc_nbytes
        out[_ranges(rbase, rel_len)] = rel_packed
        pbase = rbase + rel_len
        out[_ranges(pbase, pos_nbytes)] = pos_enc

    return out.tobytes(), {
        "offset": term_off.astype(np.int64),
        "nbytes": term_total.astype(np.int64),
        "ndocs": ndocs.astype(np.uint32),
        "npos": npos.astype(np.int64),
        "first_doc": first_doc,
        "last_doc": last_doc,
        "d0_nbytes": _varint_lengths(first_doc).astype(np.int32),
        "doc_nbytes": doc_nbytes.astype(np.int64),
    }


# ---------------------------------------------------------------------------
# write / read
# ---------------------------------------------------------------------------


def write_segment(
    out_dir: str, seg: dict, extra: dict | None = None, replace: bool = False
) -> dict:
    """Atomically persist a segment; returns its lineage record
    (per-partition lineage + per-stage metrics per the north rule).

    ``replace=False`` (build): a concurrently-written existing segment
    wins — idempotent under task retries. ``replace=True`` (incremental
    update, dcs re-import of one package): the new segment supersedes
    the old one via rename swap."""
    t0 = time.monotonic()
    name = segment_name(seg["part_id"])
    final = os.path.join(out_dir, name)
    tmp = final + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    term_field = (
        pa.field("term", pa.string()) if seg["mode"] == "words" else pa.field("term", pa.uint32())
    )
    term_dict = pa.table(
        {
            "term": seg["terms"],
            "df": pa.array(seg["df"], pa.uint32()),
            "offset": pa.array(seg["offset"], pa.int64()),
            "nbytes": pa.array(seg["nbytes"], pa.int64()),
            "max_tf": pa.array(seg["max_tf"], pa.uint32()),
        },
        schema=pa.schema(
            [
                term_field,
                pa.field("df", pa.uint32()),
                pa.field("offset", pa.int64()),
                pa.field("nbytes", pa.int64()),
                pa.field("max_tf", pa.uint32()),
            ]
        ),
    )
    pq.write_table(term_dict, os.path.join(tmp, "term_dict.parquet"))
    meta_cols = {
        "doc_id": pa.array(seg["doc_ids"], pa.uint64()),
        "url": seg["urls"],
        "doc_len": pa.array(seg["doc_len"], pa.uint32()),
    }
    meta_cols.update(seg.get("meta") or {})  # filter/prior attributes (F4/F7)
    pq.write_table(pa.table(meta_cols), os.path.join(tmp, "doc_meta.parquet"))
    with open(os.path.join(tmp, "postings.bin"), "wb") as f:
        f.write(seg["blob"])
    if seg["positions_blob"] is not None:
        with open(os.path.join(tmp, "positions.bin"), "wb") as f:
            f.write(seg["positions_blob"])
        pd_ = seg["pos_dict"]
        pq.write_table(
            pa.table(
                {
                    "term": seg["terms"],
                    "offset": pa.array(pd_["offset"], pa.int64()),
                    "nbytes": pa.array(pd_["nbytes"], pa.int64()),
                    "ndocs": pa.array(pd_["ndocs"], pa.uint32()),
                    "npos": pa.array(pd_["npos"], pa.int64()),
                    "first_doc": pa.array(pd_["first_doc"], pa.uint64()),
                    "last_doc": pa.array(pd_["last_doc"], pa.uint64()),
                    "d0_nbytes": pa.array(pd_["d0_nbytes"], pa.int32()),
                    "doc_nbytes": pa.array(pd_["doc_nbytes"], pa.int64()),
                }
            ),
            os.path.join(tmp, "pos_dict.parquet"),
        )
    # zone maps: per-meta-column distinct values when small — the
    # filter-dimension pruning statistics (Moerkotte '98 small
    # materialized aggregates / Parquet column-stats role): a keyword
    # filter can skip whole shards whose value set can't match
    meta_values = {}
    for col, arr in (seg.get("meta") or {}).items():
        u = pc.unique(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
        if len(u) <= 64:
            vals = [v for v in u.to_pylist() if v is not None]
            meta_values[col] = sorted(vals)
    lineage = {
        "part_id": seg["part_id"],
        "segment": name,
        "n_docs": int(len(seg["doc_ids"])),
        "n_terms": int(len(seg["df"])),
        "n_postings": int(seg["df"].astype(np.int64).sum()) if len(seg["df"]) else 0,
        "sum_doc_len": int(seg["doc_len"].astype(np.int64).sum()),
        "blob_bytes": len(seg["blob"]),
        "checksum": zlib.crc32(seg["blob"]),
        "wall_s": round(time.monotonic() - t0, 4),
    }
    if meta_values:
        lineage["meta_values"] = meta_values
    if extra:
        lineage.update(extra)
        build_s = extra.get("build_wall_s")
        if build_s:  # per-partition stage metrics (north rule)
            lineage["docs_per_s"] = round(lineage["n_docs"] / build_s, 1)
            lineage["postings_per_s"] = round(lineage["n_postings"] / build_s, 1)
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f)
    if os.path.exists(final):
        import shutil

        if replace:  # update flow: swap the old segment out
            old = final + ".old"
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old)
        else:  # concurrent/retried build task lost the race — idempotent
            shutil.rmtree(tmp)
    else:
        os.rename(tmp, final)
    return lineage


class Segment:
    """Open segment: memory-mapped postings + loaded dictionaries
    (dcs ``index.Open`` analogue, ``internal/index/read.go:374-407``)."""

    def __init__(self, path: str):
        self.path = path
        # build generation: identifies THIS on-disk index build, so
        # per-worker caches keyed on it can never serve a rebuilt/updated
        # index stale results (dcs swaps a symlink and re-opens; we swap
        # directory contents in place on update_partition)
        st = os.stat(os.path.join(path, "term_dict.parquet"))
        self.gen = (st.st_mtime_ns, st.st_size)
        td = pq.read_table(os.path.join(path, "term_dict.parquet"))
        self.terms = td["term"].combine_chunks()
        self.df = td["df"].combine_chunks().to_numpy()
        self.offset = td["offset"].combine_chunks().to_numpy()
        self.nbytes = td["nbytes"].combine_chunks().to_numpy()
        self.max_tf = td["max_tf"].combine_chunks().to_numpy()
        refs = os.path.join(path, "doc_meta_refs.json")
        if os.path.exists(refs):
            # merged shard: doc_meta = ordered concat of its segments'
            # tables (segment order == doc-id order; merge.py)
            with open(refs) as f:
                seg_rel = json.load(f)["segments"]
            dm = pa.concat_tables(
                pq.read_table(os.path.join(os.path.dirname(path), s, "doc_meta.parquet"))
                for s in seg_rel
            ).combine_chunks()
        else:
            dm = pq.read_table(os.path.join(path, "doc_meta.parquet"))
        self.doc_ids = dm["doc_id"].combine_chunks().to_numpy()
        self.urls = dm["url"].combine_chunks()
        self.doc_len = dm["doc_len"].combine_chunks().to_numpy()
        self.doc_meta = dm  # full table incl. filter/prior columns
        pb = os.path.join(path, "postings.bin")
        self.postings = (
            np.memmap(pb, dtype=np.uint8, mode="r") if os.path.getsize(pb) else np.empty(0, np.uint8)
        )
        posb = os.path.join(path, "positions.bin")
        if os.path.exists(posb):
            self.positions = np.memmap(posb, dtype=np.uint8, mode="r") if os.path.getsize(posb) else np.empty(0, np.uint8)
            pd_tbl = pq.read_table(os.path.join(path, "pos_dict.parquet"))
            self.pos_offset = pd_tbl["offset"].combine_chunks().to_numpy()
            self.pos_nbytes = pd_tbl["nbytes"].combine_chunks().to_numpy()
        else:
            self.positions = None
        self._terms_np: np.ndarray | None = None
        self._hdr_cache: dict[int, tuple] = {}

    def term_index(self, term) -> int:
        """Binary search the sorted term dictionary; -1 if absent
        (MetaEntry binary search, ``internal/index/read.go:161-210``)."""
        if self._terms_np is None:
            self._terms_np = self.terms.to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(self._terms_np, term))
        if i < len(self._terms_np) and self._terms_np[i] == term:
            return i
        return -1

    def term_blob(self, idx: int) -> np.ndarray:
        return self.postings[self.offset[idx] : self.offset[idx] + self.nbytes[idx]]

    def term_headers(self, idx: int) -> tuple:
        """Block-max skip metadata for one term without decoding bodies:
        ``(first_docid, max_docid, max_tf, body_off, body_len)`` arrays,
        cached per open segment (the MetaEntry/skip-list role of
        ``internal/index/read.go:161-265``)."""
        cached = self._hdr_cache.get(idx)
        if cached is not None:
            return cached
        from dcs_ray.codec import HEADER_DTYPE, HEADER_SIZE

        blob = self.term_blob(idx)
        firsts, maxes, mtfs, boffs, blens = [], [], [], [], []
        pos, n = 0, len(blob)
        while pos < n:
            h = np.ascontiguousarray(blob[pos : pos + HEADER_SIZE]).view(HEADER_DTYPE)[0]
            nbytes = int(h["nbytes"])
            firsts.append(h["first_docid"])
            maxes.append(h["max_docid"])
            mtfs.append(h["max_tf"])
            boffs.append(pos)
            blens.append(HEADER_SIZE + nbytes)
            pos += HEADER_SIZE + nbytes
        cached = (
            np.array(firsts, dtype=np.uint64),
            np.array(maxes, dtype=np.uint64),
            np.array(mtfs, dtype=np.uint32),
            np.array(boffs, dtype=np.int64),
            np.array(blens, dtype=np.int64),
        )
        self._hdr_cache[idx] = cached
        return cached

    def meta(self, col: str) -> pa.ChunkedArray:
        """A doc_meta attribute column, row-aligned with ``doc_ids``."""
        return self.doc_meta[col]

    def position_blob(self, idx: int) -> np.ndarray:
        assert self.positions is not None
        return self.positions[self.pos_offset[idx] : self.pos_offset[idx] + self.pos_nbytes[idx]]
