"""SymSpell-style spelling suggestion over the corpus vocabulary.

Public algorithm (Garbe's Symmetric Delete spelling correction): every
term at edit distance ≤ 1 from a query word shares at least one
single-character DELETION variant with it (substitution → delete the
differing position from both; insertion → delete the inserted char;
deletion → the term IS a deletion of the word). Candidate lookup is
therefore an exact-match key probe — no wildcard scan and no
edit-distance pass over the vocabulary. Shared-deletion pairs at
distance 2 slip through the probe; a levenshtein verify over the
(tiny) candidate set drops them.

Distributed shape: the vocabulary comes from
``textstats.corpus_df`` (two-level combiner, vocab-sized exchange);
the probe streams over a vocabulary Dataset with the query words'
deletion-key set — a few dozen strings — broadcast to every batch.
The per-batch loop is VOCABULARY-sized (like the BPE trainer's merge
table), never corpus-sized; candidates returned to the driver are
result-set-sized. The query-side role of dcs's "did you mean"
affordance is fulltext-engine standard (the reference has none — this
is part of the web-serving surface, SURVEY §2.11 adjacent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def deletions(word: str) -> list[str]:
    """All single-character deletions of ``word`` (length n list)."""
    return [word[:i] + word[i + 1 :] for i in range(len(word))]


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — verify step only (candidate-set-sized)."""
    if a == b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def suggest(
    vocab: ray.data.Dataset,
    words: list[str],
    k: int = 5,
    term_col: str = "term",
    df_col: str = "df",
) -> pa.Table:
    """Top-``k`` corrections per query word → (word, term, df), ranked
    by document frequency desc then term asc — exactly the terms at
    levenshtein distance ≤ 1, guaranteed complete by the symmetric
    deletion property. ``vocab`` is a (term, df) Dataset."""
    qkeys = {w: frozenset([w, *deletions(w)]) for w in words}
    keys_ref = ray.put(qkeys)

    def probe(batch: pa.Table, _k=keys_ref) -> pa.Table:
        return _probe_table(batch, ray.get(_k), term_col, df_col)

    parts = [
        pa.table(b)
        for b in vocab.map_batches(probe, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    cand = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "word": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    )
    return _verify_rank(cand, words, k)


def _probe_table(
    batch: pa.Table, qk: dict, term_col: str = "term", df_col: str = "df"
) -> pa.Table:
    """Symmetric-delete key probe of one vocab table against the query
    words' deletion-key sets — shared by the Dataset stream
    (:func:`suggest`) and the driver-side fast path
    (:func:`suggest_local`).

    VECTORIZED (round 5): the vocab side's deletion keys are computed
    as ``max_len`` sliced-concat Arrow columns (key_i = term[:i] +
    term[i+1:], plus the identity column), then each query word is one
    ``is_in`` per key column + a length-window mask — no Python loop
    over vocab rows. A web-scale vocabulary is millions of terms per
    batch; the old per-term/per-word Python loop was the exact
    hot-path shape this engine bans. For ``i >= len(term)`` the sliced
    key degenerates to the identity (term[:i] = term, suffix empty),
    which adds no matches the identity column didn't already have."""
    import numpy as np
    import pyarrow.compute as pc

    terms_all = batch[term_col]
    if isinstance(terms_all, pa.ChunkedArray):
        terms_all = terms_all.combine_chunks()
    # pre-filter to the query words' length window: a term longer than
    # max(len(w))+1 can never be within distance 1 of any word, and web
    # vocabularies carry long URL/hash tokens — without this one 60-char
    # outlier would force 61 full-column key materializations
    wlens = [len(w) for w in qk] or [0]
    lo_len, hi_len = min(wlens) - 1, max(wlens) + 1
    lens_all = pc.utf8_length(terms_all).to_numpy(zero_copy_only=False).astype(np.int64)
    window = (lens_all >= lo_len) & (lens_all <= hi_len)
    if not window.any():
        return pa.table(
            {
                "word": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    batch = batch.filter(pa.array(window))
    terms_arr = batch[term_col]
    if isinstance(terms_arr, pa.ChunkedArray):
        terms_arr = terms_arr.combine_chunks()
    lens_np = lens_all[window]
    max_len = int(lens_np.max()) if len(lens_np) else 0
    # separator typed to the COLUMN (large_string vocab columns would
    # otherwise hit 'no kernel matching input types')
    sep = pa.scalar("", type=terms_arr.type)
    key_cols = [terms_arr]
    big = 1 << 30
    for i in range(max_len):
        pre = pc.utf8_slice_codeunits(terms_arr, 0, i)
        suf = pc.utf8_slice_codeunits(terms_arr, i + 1, big)
        key_cols.append(pc.binary_join_element_wise(pre, suf, sep))

    parts = []
    for w in sorted(qk):
        wk_arr = pa.array(sorted(qk[w]), pa.string()).cast(terms_arr.type)
        m = np.abs(lens_np - len(w)) <= 1
        if not m.any():
            continue
        hit = np.zeros(len(terms_arr), bool)
        for col in key_cols:
            hit |= pc.is_in(col, value_set=wk_arr).to_numpy(zero_copy_only=False)
        m &= hit
        if m.any():
            sub = batch.filter(pa.array(m))
            parts.append(
                pa.table(
                    {
                        "word": pa.array([w] * len(sub), pa.string()),
                        "term": sub[term_col].cast(pa.string()),
                        "df": sub[df_col].cast(pa.int64()),
                    }
                )
            )
    if not parts:
        return pa.table(
            {
                "word": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def _verify_rank(cand: pa.Table, words: list[str], k: int) -> pa.Table:
    """Verify + rank (candidate-set-sized): drop shared-deletion pairs
    at distance 2, keep top-k per word by (df desc, term asc)."""
    out_w, out_t, out_d = [], [], []
    for w in sorted(set(words)):
        sub = cand.filter(pa.compute.equal(cand["word"], w))
        rows = [
            (t, d)
            for t, d in zip(sub["term"].to_pylist(), sub["df"].to_pylist())
            if levenshtein(w, t) <= 1
        ]
        rows.sort(key=lambda td: (-td[1], td[0]))
        for t, d in rows[:k]:
            out_w.append(w)
            out_t.append(t)
            out_d.append(d)
    return pa.table(
        {
            "word": pa.array(out_w, pa.string()),
            "term": pa.array(out_t, pa.string()),
            "df": pa.array(out_d, pa.int64()),
        }
    )


def suggest_local(
    vocab: pa.Table,
    words: list[str],
    k: int = 5,
    term_col: str = "term",
    df_col: str = "df",
) -> pa.Table:
    """Identical algorithm and output to :func:`suggest`, over an
    IN-MEMORY vocab table — the driver-side fast path for vocabularies
    that fit (no Ray task round trip; the interactive serving case).
    Callers route here when the stats table is small and keep the
    Dataset stream as the scale path."""
    qkeys = {w: frozenset([w, *deletions(w)]) for w in words}
    cand = _probe_table(vocab, qkeys, term_col, df_col)
    return _verify_rank(cand, words, k)
