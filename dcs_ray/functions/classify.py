"""Distributed multinomial Naive Bayes text classification — the
classic bag-of-words document classifier (McCallum & Nigam '98), here
in the self-training shape a curation pipeline uses (train on the
corpus's own labels — e.g. ``lang`` — then score/route every doc).
Complements the fixed-weight ``textstats.QualityClassifier`` (given
weights, inference only) with an actually TRAINED model whose training
pass is itself distributed.

Scale notes (100 TB): the trained model is (classes × vocabulary) —
model-sized, never corpus-sized. Training is one streaming corpus pass
of per-batch partial (label, term) counts folded by a combiner groupby
(the exchange is |distinct (label, term)| per block, same regime as
``lm.train_bigram_counts``); a web-scale vocabulary is pruned with a
``min_count`` knob exactly like the TF-IDF ``min_df`` tail cut.
Prediction broadcasts the dense log-prob matrix once via ``ray.put``
and scores each batch with one searchsorted + one row-gather +
``np.add.at`` — docs stream, nothing corpus-sized anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.tokenize import word_tokens_flat


def train_naive_bayes(
    ds: ray.data.Dataset,
    label_col: str = "lang",
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """One corpus pass → the multinomial NB model:

    - ``classes`` (sorted), ``class_docs`` (priors), ``n_docs``
    - ``terms`` (sorted vocabulary), ``counts[class, term]`` token
      counts, ``class_tokens`` totals, ``vocab_size``

    ``min_count`` prunes vocabulary entries whose TOTAL count is below
    the threshold (the web-scale tail cut); ``vocab_size`` (the V in
    add-alpha smoothing) is the post-prune vocabulary."""
    from dcs_ray.functions.relational import combiner_groupby

    def explode(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b[text_col])
        lbl = b[label_col].combine_chunks()
        return pa.table(
            {"lbl": lbl.take(pa.array(parents)), "term": flat}
        )

    tc = combiner_groupby(
        ds.map_batches(explode, batch_format="pyarrow"), ["lbl", "term"], [],
        count_col="c",
    )
    ls, ts, cs = [], [], []
    for b in tc.iter_batches(batch_format="pyarrow"):
        ls.append(pa.table(b)["lbl"])
        ts.append(pa.table(b)["term"])
        cs.append(pa.table(b)["c"].to_numpy(zero_copy_only=False))

    # per-class doc counts (priors) — a |classes|-sized fold
    def doc_partial(b: pa.Table) -> pa.Table:
        t = b.select([label_col]).group_by([label_col]).aggregate(
            [(label_col, "count")]
        )
        return pa.table(
            {"lbl": t[label_col], "n": t[f"{label_col}_count"].cast(pa.int64())}
        )

    dl, dn = [], []
    for b in ds.map_batches(doc_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        dl.append(pa.table(b)["lbl"])
        dn.append(pa.table(b)["n"].to_numpy(zero_copy_only=False))
    if not dl:
        return {
            "classes": np.empty(0, object), "class_docs": np.empty(0, np.int64),
            "n_docs": 0, "terms": np.empty(0, object),
            "counts": np.empty((0, 0), np.int64),
            "class_tokens": np.empty(0, np.int64), "vocab_size": 0,
        }
    dlbl = np.asarray(pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in dl]
    ).to_pylist(), object)
    dcnt = np.concatenate(dn)
    classes, cinv = np.unique(dlbl, return_inverse=True)
    class_docs = np.zeros(len(classes), np.int64)
    np.add.at(class_docs, cinv, dcnt)

    if ts:
        tlbl = np.asarray(pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in ls]
        ).to_pylist(), object)
        tterm = np.asarray(pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in ts]
        ).to_pylist(), object)
        tcnt = np.concatenate(cs)
    else:
        tlbl = tterm = np.empty(0, object)
        tcnt = np.empty(0, np.int64)
    terms, tinv = np.unique(tterm, return_inverse=True)
    totals = np.zeros(len(terms), np.int64)
    np.add.at(totals, tinv, tcnt)
    keep_terms = totals >= min_count
    terms_kept = terms[keep_terms]
    remap = np.full(len(terms), -1, np.int64)
    remap[keep_terms] = np.arange(int(keep_terms.sum()))
    counts = np.zeros((len(classes), len(terms_kept)), np.int64)
    li = np.searchsorted(classes, tlbl) if len(tlbl) else np.empty(0, np.int64)
    ti = remap[tinv] if len(tinv) else np.empty(0, np.int64)
    sel = ti >= 0
    np.add.at(counts, (li[sel], ti[sel]), tcnt[sel])
    return {
        "classes": classes,
        "class_docs": class_docs,
        "n_docs": int(class_docs.sum()),
        "terms": terms_kept,
        "counts": counts,
        "class_tokens": counts.sum(axis=1),
        "vocab_size": len(terms_kept),
    }


def naive_bayes_predict(
    ds: ray.data.Dataset,
    model_ref,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Score every doc under the broadcast model → ``(doc_id,
    pred_label, best_score)`` where ``pred_label`` is the argmax class
    of ``ln(prior) + Σ_tokens ln((c(term, class) + α) / (class_tokens +
    α·V))`` (out-of-vocabulary tokens smooth to count 0) and
    ``best_score`` is that score rounded to 6 decimals. The argmax
    compares ROUNDED scores with ties to the lexicographically smallest
    class — deterministic and SQL-replayable. ``model_ref`` is a
    ``ray.put`` handle to :func:`train_naive_bayes` output."""

    def per_batch(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        n_cls = len(m["classes"])
        n_rows = len(batch)
        if n_cls == 0:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "pred_label": pa.array([""] * n_rows, pa.string()),
                    "best_score": pa.array(np.zeros(n_rows), pa.float64()),
                    **{c: batch[c] for c in keep_cols},
                }
            )
        # dense log-prob matrix + the OOV (count-0) column, model-sized
        denom = m["class_tokens"].astype(np.float64) + alpha * m["vocab_size"]
        logp = np.log((m["counts"].astype(np.float64) + alpha) / denom[:, None])
        log_oov = np.log(alpha / denom)
        log_prior = np.log(m["class_docs"] / float(m["n_docs"]))

        flat, parents = word_tokens_flat(batch[text_col])
        scores = np.tile(log_prior, (n_rows, 1))
        if len(flat):
            toks = np.asarray(flat.to_pylist(), object)
            idx = np.searchsorted(m["terms"], toks)
            idx_c = np.minimum(idx, max(len(m["terms"]) - 1, 0))
            hit = (
                (idx < len(m["terms"])) & (m["terms"][idx_c] == toks)
                if len(m["terms"])
                else np.zeros(len(toks), bool)
            )
            tok_lp = np.where(
                hit[:, None], logp.T[idx_c], np.broadcast_to(log_oov, (len(toks), n_cls))
            )
            np.add.at(scores, parents, tok_lp)
        r = np.round(scores, 6)
        # argmax on rounded scores, ties to the smallest class label
        best = np.argmax(r, axis=1)  # np.argmax takes the FIRST max = smallest
        return pa.table(
            {
                id_col: batch[id_col],
                "pred_label": pa.array(m["classes"][best].tolist(), pa.string()),
                "best_score": pa.array(r[np.arange(n_rows), best], pa.float64()),
                **{c: batch[c] for c in keep_cols},
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def distinctive_terms(model: dict, k: int = 5, alpha: float = 1.0) -> pa.Table:
    """Per-class distinctive vocabulary (log-odds-style keyness,
    Monroe et al. '08 lite): for each class, the top-``k`` terms by
    ``ln((c_g + α)/(tot_g + α·V)) − ln((c_all + α)/(tot_all + α·V))``
    — what a class says that the corpus at large doesn't. Ranking uses
    the round-6 score with ties on term asc, so selection is
    deterministic and SQL-replayable. ``model`` is
    :func:`train_naive_bayes` output (model-sized; no further corpus
    pass)."""
    n_cls, n_terms = model["counts"].shape
    if n_cls == 0 or n_terms == 0:
        return pa.table(
            {
                "label": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "keyness": pa.array([], pa.float64()),
            }
        )
    v = model["vocab_size"]
    c = model["counts"].astype(np.float64)
    tot_g = model["class_tokens"].astype(np.float64)[:, None]
    c_all = c.sum(axis=0)
    tot_all = float(c_all.sum())
    score = np.log((c + alpha) / (tot_g + alpha * v)) - np.log(
        (c_all + alpha) / (tot_all + alpha * v)
    )
    r = np.round(score, 6)
    out_l, out_t, out_s = [], [], []
    terms_u = model["terms"].astype("U")
    for g in range(n_cls):
        order = np.lexsort((terms_u, -r[g]))[:k]
        out_l += [str(model["classes"][g])] * len(order)
        out_t += [str(t) for t in model["terms"][order]]
        out_s += r[g][order].tolist()
    return pa.table(
        {
            "label": pa.array(out_l, pa.string()),
            "term": pa.array(out_t, pa.string()),
            "keyness": pa.array(out_s, pa.float64()),
        }
    )
