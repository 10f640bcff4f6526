"""S-stemmer analyzer field: Harman's suffix-S removal rules
("How Effective Is Suffixing?", JASIS '91) — the conservative stemmer
web indexes use when Porter is too aggressive. Rules, applied first
match wins, on lowercase tokens:

1. ``-ies → -y``   unless the word ends in ``aies``/``eies`` (len ≥ 4)
2. ``-es  → -e``   unless the word ends in ``aes``/``ees``/``oes`` (len ≥ 3)
3. ``-s   → ``     unless the word ends in ``us``/``ss`` (len ≥ 3)

Everything is vectorized over the token DICTIONARY of a batch (stem
each distinct token once, then fan back out through the indices), with
Arrow kernels only — ``ends_with`` masks + negative-index
``utf8_slice_codeunits`` + one ``if_else`` chain. The rule set is
deliberately CASE-expressible so every consumer can be SQL-replayed
(see ``__ray_entry__.S_STEM_SQL``).

Role: the analyzer option dcs lacks (its trigram index is
language-blind) but any fulltext web index offers — plural/singular
conflation at index AND query time. Feed :func:`stem_text` output to
``build_index`` and stem query terms with :func:`s_stem_array` for a
stemmed field.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.tokenize import word_tokens_flat


def s_stem_array(words: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized S-stemmer over a string array (one entry per word)."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    w = words.cast(pa.string())
    n = pc.utf8_length(w)

    def ends(suf: str):
        return pc.ends_with(w, suf)

    # patterns fire in order and TERMINATE: a word matching a rule's
    # pattern but hitting its exception list is left unchanged (it does
    # NOT fall through to a later rule — 'goes' stays 'goes')
    p_ies = pc.and_(ends("ies"), pc.greater_equal(n, 4))
    p_es = pc.and_(ends("es"), pc.greater_equal(n, 3))
    p_s = pc.and_(ends("s"), pc.greater_equal(n, 3))
    exc_ies = pc.or_(ends("aies"), ends("eies"))
    exc_es = pc.or_(pc.or_(ends("aes"), ends("ees")), ends("oes"))
    exc_s = pc.or_(ends("us"), ends("ss"))
    ies_form = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(w, 0, -3), "y", ""
    )
    drop1 = pc.utf8_slice_codeunits(w, 0, -1)
    out = pc.if_else(
        p_ies,
        pc.if_else(exc_ies, w, ies_form),
        pc.if_else(
            p_es,
            pc.if_else(exc_es, w, drop1),
            pc.if_else(p_s, pc.if_else(exc_s, w, drop1), w),
        ),
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def stem_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace ``text_col`` with its stemmed-token rendition (tokens
    joined by single spaces) — the pre-index analyzer pass. Stems the
    per-batch token dictionary once, not every occurrence."""
    flat, parents = word_tokens_flat(batch[text_col])
    n_rows = len(batch)
    if len(flat) == 0:
        stemmed = pa.array([""] * n_rows, pa.string())
    else:
        enc = flat.dictionary_encode()
        sdict = s_stem_array(enc.dictionary)
        toks = sdict.take(enc.indices)
        # group flat tokens back per row and join with spaces
        offs = np.searchsorted(parents, np.arange(n_rows + 1))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), pa.int32()), toks.cast(pa.string())
        )
        stemmed = pc.binary_join(la, " ")
    cols = {c: batch[c] for c in batch.column_names}
    cols[text_col] = stemmed
    return pa.table(cols)


def stem_text(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: stem_text_batch(b, text_col), batch_format="pyarrow"
    )


def stemmed_term_df(ds: ray.data.Dataset, text_col: str = "text") -> pa.Table:
    """Document frequencies over STEMMED terms → (term, df) sorted by
    term — the stemmed field's dictionary (plural/singular conflated).
    Same vocabulary-sized-partials shape as ``textstats.corpus_df``;
    stems computed on each batch's token dictionary only."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        flat, parents = word_tokens_flat(batch[text_col])
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        stems = s_stem_array(enc.dictionary)
        # re-encode: distinct stems (dictionary may collapse)
        senc = stems.dictionary_encode()
        scodes = senc.indices.take(enc.indices).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nd = len(senc.dictionary)
        key = np.unique(parents.astype(np.int64) * nd + scodes)
        df = np.bincount(key % nd, minlength=nd)
        return pa.table(
            {
                "term": senc.dictionary.cast(pa.string()),
                "df": pa.array(df.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        pa.table(b)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.schema([("term", pa.string()), ("df", pa.int64())]).empty_table()
    agg = pa.concat_tables(parts).group_by("term").aggregate([("df", "sum")])
    order = pc.sort_indices(agg["term"])
    return pa.table(
        {
            "term": agg["term"].take(order).combine_chunks(),
            "df": agg["df_sum"].take(order).cast(pa.int64()),
        }
    )
