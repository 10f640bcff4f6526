"""Multinomial Naive Bayes: trained counts match a hand fold, predictions
match an independent pure-Python reference, and results are independent
of batch layout."""

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.classify import naive_bayes_predict, train_naive_bayes

DOCS = [
    (0, "en", "the cat sat on the mat"),
    (1, "en", "the dog sat"),
    (2, "de", "der hund sitzt"),
    (3, "de", "die katze sitzt auf der matte"),
    (4, "en", "cat and dog"),
    (5, "de", "hund und katze"),
    (6, "en", ""),  # zero tokens → prior-only score
]


def _ds(rows, blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _nb_reference(rows, alpha=1.0):
    """Independent NB: dict folds, math.log."""
    from collections import Counter, defaultdict

    toks = {i: t.split() for i, _, t in rows}
    cls_docs = Counter(lbl for _, lbl, _ in rows)
    n = sum(cls_docs.values())
    counts = defaultdict(Counter)
    for i, lbl, _ in rows:
        counts[lbl].update(toks[i])
    vocab = set()
    for c in counts.values():
        vocab |= set(c)
    v = len(vocab)
    out = {}
    for i, _, _ in rows:
        best = None
        for lbl in sorted(cls_docs):
            tot = sum(counts[lbl].values())
            s = math.log(cls_docs[lbl] / n)
            for w in toks[i]:
                s += math.log((counts[lbl][w] + alpha) / (tot + alpha * v))
            s = round(s, 6)
            if best is None or s > best[1]:
                best = (lbl, s)
        out[i] = best
    return out


def _collect(ds):
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    return {
        int(d): (p, s)
        for d, p, s in zip(
            t["doc_id"].to_pylist(),
            t["pred_label"].to_pylist(),
            t["best_score"].to_pylist(),
        )
    }


def test_nb_trained_counts_match_hand_fold(ray_session):
    m = train_naive_bayes(_ds(DOCS))
    assert m["classes"].tolist() == ["de", "en"]
    assert m["class_docs"].tolist() == [3, 4]
    assert m["n_docs"] == 7
    ti = {t: i for i, t in enumerate(m["terms"])}
    de = m["counts"][0]
    assert de[ti["hund"]] == 2 and de[ti["katze"]] == 2 and de[ti["cat"]] == 0
    en = m["counts"][1]
    assert en[ti["the"]] == 3 and en[ti["cat"]] == 2
    assert m["class_tokens"].tolist() == [12, 12]


def test_nb_predictions_match_reference(ray_session):
    ds = _ds(DOCS)
    m_ref = ray.put(train_naive_bayes(ds))
    got = _collect(naive_bayes_predict(ds, m_ref))
    want = _nb_reference(DOCS)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert abs(got[i][1] - want[i][1]) < 2e-6, (i, got[i], want[i])
    # self-classification recovers the labels on this separable corpus
    for i, lbl, text in DOCS:
        if text:
            assert got[i][0] == lbl


def test_nb_layout_independent(ray_session):
    one = _collect(
        naive_bayes_predict(_ds(DOCS), ray.put(train_naive_bayes(_ds(DOCS))))
    )
    many = _collect(
        naive_bayes_predict(
            _ds(DOCS, blocks=4), ray.put(train_naive_bayes(_ds(DOCS, blocks=4)))
        )
    )
    assert one == many


def test_nb_min_count_prunes_vocab_and_v(ray_session):
    full = train_naive_bayes(_ds(DOCS))
    pruned = train_naive_bayes(_ds(DOCS), min_count=2)
    assert pruned["vocab_size"] < full["vocab_size"]
    assert "mat" not in set(pruned["terms"].tolist())  # appears once
    assert "der" in set(pruned["terms"].tolist())  # appears twice
    assert (np.asarray(pruned["counts"]).sum(axis=1) == pruned["class_tokens"]).all()
