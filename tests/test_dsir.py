"""DSIR importance weighting vs a from-scratch string-bigram reference
(the same math the DuckDB oracle replays), plus the bucketed scale path
and the quantile-threshold selection rule."""

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.dsir import bigram_counts, dsir_log_weights, dsir_select


def _toks(t):
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _bigrams(t):
    ts = _toks(t)
    return [f"{a} {b}" for a, b in zip(ts, ts[1:])]


TEXTS = [
    "the cat sat on the mat",          # en-ish
    "the dog sat on the log",          # en-ish
    "le chat est sur le tapis",        # fr-ish
    "el perro come la manzana",        # es-ish
    "the cat and the dog",             # en-ish
    "",                                # no bigrams
]
LANGS = ["en", "en", "fr", "es", "en", "en"]


def _table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS),
            "lang": pa.array(LANGS),
        }
    )


def _ref_weights(alpha=1.0):
    tgt_bgs = [bg for t, l in zip(TEXTS, LANGS) if l == "en" for bg in _bigrams(t)]
    raw_bgs = [bg for t in TEXTS for bg in _bigrams(t)]
    ct = {}
    for bg in tgt_bgs:
        ct[bg] = ct.get(bg, 0) + 1
    cr = {}
    for bg in raw_bgs:
        cr[bg] = cr.get(bg, 0) + 1
    v = len(cr)
    nt, nr = len(tgt_bgs), len(raw_bgs)
    out = []
    for t in TEXTS:
        s = 0.0
        for bg in _bigrams(t):
            s += math.log((ct.get(bg, 0) + alpha) / (nt + alpha * v)) - math.log(
                (cr[bg] + alpha) / (nr + alpha * v)
            )
        out.append(round(s, 6))
    return out


def _en(ds):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["lang"], "en")), batch_format="pyarrow"
    )


def _run_weights(n_buckets=None):
    docs = ray.data.from_arrow(_table())
    target = _en(docs)
    t_ref = ray.put(bigram_counts(target, n_buckets=n_buckets))
    r_ref = ray.put(bigram_counts(docs, n_buckets=n_buckets))
    ds = dsir_log_weights(docs, t_ref, r_ref, n_buckets=n_buckets)
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    return t


def test_weights_match_string_reference():
    t = _run_weights()
    got = t["log_weight"].to_pylist()
    want = _ref_weights()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # en-like docs weigh higher than the fr/es docs
    assert min(got[0], got[1], got[4]) > max(got[2], got[3])
    # the empty doc scores exactly 0 with 0 bigrams
    assert t["n_bigrams"].to_pylist()[5] == 0 and got[5] == 0.0


def test_bucketed_path_bounds_table_size():
    docs = ray.data.from_arrow(_table())
    c = bigram_counts(docs, n_buckets=8)
    assert len(c["h"]) <= 8 and c["h"].max() < 8
    t = _run_weights(n_buckets=8)
    assert np.isfinite(t["log_weight"].to_numpy()).all()


def test_select_keeps_ties_at_cutoff():
    docs = ray.data.from_arrow(_table())
    kept = dsir_select(docs, _en(docs), keep_frac=0.5)
    ids = sorted(
        pa.concat_tables(
            [pa.table(b) for b in kept.iter_batches(batch_format="pyarrow")]
        )["doc_id"].to_pylist()
    )
    # rule: weight >= quantile_disc(w, 0.5); replicate exactly
    w = _ref_weights()
    n = len(w)
    cut = sorted(w)[max(1, math.ceil(0.5 * n)) - 1]
    want = [i for i, x in enumerate(w) if x >= cut]
    assert ids == want
