"""Cavnar-Trenkle n-gram rank-profile text categorization (the '94
"N-Gram-Based Text Categorization" paper — the classic character-level
language identifier, pre-dating today's fastText-style models).

Per category (language), the training profile is the top-K character
trigrams ranked by frequency; a document is classified to the category
minimizing the OUT-OF-PLACE distance: for each gram of the document's
own top-k profile, the absolute rank displacement against the category
profile, with a fixed penalty K for grams the category never ranked.
Everything is INTEGER (counts, ranks, displacements) — ties rank the
lexicographically smaller gram first, predictions tie to the smaller
language — so the gate replays exactly.

Vectorized shape: trigrams are packed big-endian into int32 ids
straight off the concatenated UTF-8 buffer (numeric order ≡ byte-
lexicographic order, so the SQL substr tie-break matches); per-lang
count folds are one groupby; per-doc profiles fold inside the batch
that owns the doc."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _doc_gram_counts(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_row, packed gram id, count) over char trigrams of
    lower(text) — vectorized byte windows."""
    from dcs_ray.tokenize import _concat_utf8

    lowered = pc.utf8_lower(texts)
    buf, offsets = _concat_utf8(lowered.combine_chunks() if isinstance(
        lowered, pa.ChunkedArray) else lowered)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    n_g = np.maximum(lens - 2, 0)
    total = int(n_g.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    doc_of = np.repeat(np.arange(n), n_g)
    g0 = np.repeat(offsets[:-1], n_g)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(n_g)[:-1])), n_g
    )
    st = (g0 + within).astype(np.int64)
    gid = (
        buf[st].astype(np.int64) * 65536
        + buf[st + 1].astype(np.int64) * 256
        + buf[st + 2].astype(np.int64)
    )
    key = doc_of * (1 << 24) + gid
    uniq, cnt = np.unique(key, return_counts=True)
    return uniq // (1 << 24), uniq % (1 << 24), cnt.astype(np.int64)


def _top_profile(gids: np.ndarray, cnts: np.ndarray, k: int) -> dict[int, int]:
    """gram → rank (1-based) for the top-k by (count desc, gram asc)."""
    order = np.lexsort((gids, -cnts))[:k]
    return {int(g): r + 1 for r, g in enumerate(gids[order])}


def train_lang_profiles(
    docs: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
    label_col: str = "lang",
) -> dict[str, dict[int, int]]:
    """Per-language top-k trigram rank profiles: per-batch (lang, gram)
    integer partials, driver fold (profile tables are K-row tiny)."""
    acc: dict[tuple[str, int], int] = {}

    def partial(b: pa.Table) -> pa.Table:
        rows, gids, cnts = _doc_gram_counts(b[text_col])
        langs = np.asarray(b[label_col].to_pylist(), dtype=object)[rows]
        return pa.table(
            {
                "lang": pa.array([str(x) for x in langs], pa.string()),
                "gid": pa.array(gids, pa.int64()),
                "c": pa.array(cnts, pa.int64()),
            }
        )

    for b in docs.select_columns([text_col, label_col]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for lang, gid, c in zip(
            t["lang"].to_pylist(), t["gid"].to_pylist(), t["c"].to_pylist()
        ):
            acc[(lang, int(gid))] = acc.get((lang, int(gid)), 0) + int(c)
    langs = sorted({l for l, _ in acc})
    out = {}
    for lang in langs:
        gs = np.array([g for (l, g) in acc if l == lang], np.int64)
        cs = np.array([acc[(lang, int(g))] for g in gs], np.int64)
        out[lang] = _top_profile(gs, cs, k)
    return out


def classify_rank_profile(
    docs: ray.data.Dataset,
    profiles_ref,
    doc_k: int = 20,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, pred_lang, dist): out-of-place distance of each doc's
    top-``doc_k`` profile against every broadcast language profile;
    argmin with ties to the smaller language name."""
    import ray as _ray

    def f(b: pa.Table) -> pa.Table:
        profs = _ray.get(profiles_ref) if not isinstance(profiles_ref, dict) \
            else profiles_ref
        langs = sorted(profs)
        rows, gids, cnts = _doc_gram_counts(b[text_col])
        n = len(b)
        preds, dists = [], []
        for i in range(n):
            m = rows == i
            prof = _top_profile(gids[m], cnts[m], doc_k)
            best = None
            for lang in langs:  # sorted → ties to smaller language
                lp = profs[lang]
                d = 0
                for g, r in prof.items():
                    lr = lp.get(g)
                    d += abs(r - lr) if lr is not None else k
                if best is None or d < best[1]:
                    best = (lang, d)
            preds.append(best[0] if best else "")
            dists.append(best[1] if best else 0)
        return pa.table(
            {
                id_col: b[id_col],
                "pred_lang": pa.array(preds, pa.string()),
                "dist": pa.array(dists, pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
