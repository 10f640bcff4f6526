"""Round-3 batch 2: LM/DFR ranking on the index, G² collocations,
containment pairs, KL matrix, Burrows' Delta."""

import math

import numpy as np
import pyarrow as pa
import ray.data


def _docs_table():
    texts = [
        "spark merge join spark spark",
        "merge join merge merge window",
        "join join join batch window stream",
        "window stream batch batch",
        "spark window spark stream join",
        "batch stream stream merge",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "url": pa.array([f"d{i}" for i in range(len(texts))]),
        }
    )


def _build(tmp_path, ray_session):
    from dcs_ray.index import IndexConfig, build_index

    out = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(_docs_table()),
        out,
        IndexConfig(
            num_partitions=2,
            num_shards=2,
            mode="words",
            id_col="doc_id",
            dedup_latest=False,
        ),
    )
    return out


def _tok_stats():
    texts = [t.split() for t in _docs_table()["text"].to_pylist()]
    tf = [dict() for _ in texts]
    for d, toks in enumerate(texts):
        for t in toks:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = [len(t) for t in texts]
    cf = {}
    for toks in texts:
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    return tf, dl, cf, sum(dl), len(texts)


def test_search_qld_matches_bruteforce(tmp_path, ray_session):
    from dcs_ray.search import search_lm

    idx = _build(tmp_path, ray_session)
    mu = 50.0
    got = search_lm(idx, ["spark join"], k=10, model="qld", mu=mu)
    tf, dl, cf, c_total, n = _tok_stats()
    qterms = sorted({"spark", "join"})
    want = {}
    for d in range(n):
        if not any(tf[d].get(t, 0) for t in qterms):
            continue
        s = sum(
            math.log(1.0 + tf[d].get(t, 0) / (mu * (cf[t] / c_total)))
            for t in qterms
            if tf[d].get(t, 0)
        )
        s += len(qterms) * math.log(mu / (dl[d] + mu))
        want[d] = s
    order = sorted(want, key=lambda d: (-want[d], d))
    assert got["doc_id"].to_pylist() == order
    for doc, score in zip(got["doc_id"].to_pylist(), got["score"].to_pylist()):
        assert abs(score - want[doc]) < 1e-9


def test_search_pl2_matches_bruteforce(tmp_path, ray_session):
    from dcs_ray.search import search_lm

    idx = _build(tmp_path, ray_session)
    got = search_lm(idx, ["merge stream"], k=10, model="pl2", c=1.0)
    tf, dl, cf, c_total, n = _tok_stats()
    avgdl = c_total / n
    log2e = math.log2(math.e)
    want = {}
    for d in range(n):
        s = 0.0
        hit = False
        for t in sorted({"merge", "stream"}):
            f = tf[d].get(t, 0)
            if not f:
                continue
            hit = True
            lam = cf[t] / n
            tfn = f * math.log2(1.0 + avgdl / dl[d])
            s += (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) * log2e
                + 0.5 * math.log2(2.0 * math.pi * tfn)
            ) / (tfn + 1.0)
        if hit:
            want[d] = s
    order = sorted(want, key=lambda d: (-want[d], d))
    assert got["doc_id"].to_pylist() == order
    for doc, score in zip(got["doc_id"].to_pylist(), got["score"].to_pylist()):
        assert abs(score - want[doc]) < 1e-9


def test_bigram_llr_matches_bruteforce(ray_session):
    from dcs_ray.functions.collocations import bigram_llr_topk

    texts = ["a b a b c", "a b c d", "b c a b", "c d c d a b"] * 3
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = bigram_llr_topk(ds, k=10, min_count=2)

    bg = {}
    c1 = {}
    c2 = {}
    n = 0
    for t in texts:
        toks = t.split()
        for w1, w2 in zip(toks, toks[1:]):
            bg[(w1, w2)] = bg.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
            c2[w2] = c2.get(w2, 0) + 1
            n += 1

    def xlx(v):
        return v * math.log(v) if v > 0 else 0.0

    want = []
    for (w1, w2), a in bg.items():
        if a < 2:
            continue
        b = c1[w1] - a
        c = c2[w2] - a
        d = n - c1[w1] - c2[w2] + a
        g2 = 2.0 * (
            xlx(a) + xlx(b) + xlx(c) + xlx(d)
            - xlx(a + b) - xlx(c + d) - xlx(a + c) - xlx(b + d) + xlx(n)
        )
        want.append((round(g2, 6), w1, w2, a))
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = want[:10]
    assert got["t1"].to_pylist() == [w[1] for w in want]
    assert got["t2"].to_pylist() == [w[2] for w in want]
    assert got["cnt"].to_pylist() == [w[3] for w in want]
    np.testing.assert_allclose(
        got["g2"].to_numpy(), [w[0] for w in want], atol=1.1e-6, rtol=0
    )


def test_containment_pairs_asymmetric(ray_session):
    """A short doc fully inside a long one: containment 1.0, jaccard < 1."""
    from dcs_ray.functions.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa " + "filler words everywhere " * 5
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([short, long]),
            }
        )
    )
    got = pa.concat_tables(
        pa.table(b)
        for b in ngram_jaccard_pairs(
            ds, shingle_n=3, threshold=0.9, metric="containment"
        ).iter_batches(batch_format="pyarrow")
    )
    assert got["id_a"].to_pylist() == [1]
    assert got["id_b"].to_pylist() == [2]
    assert abs(got["containment"][0].as_py() - 1.0) < 1e-12
    n_jac = sum(
        len(b)
        for b in ngram_jaccard_pairs(
            ds, shingle_n=3, threshold=0.9, metric="jaccard"
        ).iter_batches(batch_format="pyarrow")
    )
    assert n_jac == 0  # jaccard dilutes the embedded copy below 0.9


def test_lang_kl_matrix_bruteforce(ray_session):
    from dcs_ray.functions.stylometry import lang_kl_matrix

    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "the dog sat"),
        ("fr", "le chat et le chien"),
        ("fr", "le chien dort"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array([r[0] for r in rows]),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )
    got = lang_kl_matrix(ds)
    counts = {}
    for lang, text in rows:
        for t in text.split():
            counts[(lang, t)] = counts.get((lang, t), 0) + 1
    vocab = sorted({t for (_, t) in counts})
    v = len(vocab)
    langs = ["en", "fr"]
    n = {l: sum(c for (ll, _), c in counts.items() if ll == l) for l in langs}
    p = {
        l: np.array([(counts.get((l, t), 0) + 1.0) / (n[l] + v) for t in vocab])
        for l in langs
    }
    want = {
        (a, b): float(np.sum(p[a] * np.log(p[a] / p[b])))
        for a in langs
        for b in langs
        if a != b
    }
    assert got["lang_a"].to_pylist() == ["en", "fr"]
    assert got["lang_b"].to_pylist() == ["fr", "en"]
    for la, lb, kl in zip(
        got["lang_a"].to_pylist(), got["lang_b"].to_pylist(), got["kl"].to_pylist()
    ):
        assert abs(kl - want[(la, lb)]) < 1.1e-6


def test_burrows_delta_bruteforce(ray_session):
    from dcs_ray.functions.stylometry import burrows_delta

    rows = [
        ("s1", "the and of the and the to"),
        ("s1", "the of to and"),
        ("s2", "of of of the to to and"),
        ("s3", "and and the to of extra terms here"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )
    got = burrows_delta(ds, top_terms=4)
    counts = {}
    totals = {}
    corpus = {}
    for src, text in rows:
        for t in text.split():
            counts[(src, t)] = counts.get((src, t), 0) + 1
            totals[src] = totals.get(src, 0) + 1
            corpus[t] = corpus.get(t, 0) + 1
    top = [t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    sources = sorted(totals)
    f = np.array(
        [[counts.get((s, t), 0) / totals[s] for s in sources] for t in top]
    )
    mu = f.mean(axis=1, keepdims=True)
    sd = f.std(axis=1, keepdims=True)
    keep = sd[:, 0] > 0
    z = (f[keep] - mu[keep]) / sd[keep]
    want = {}
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            want[(sa, sources[j])] = float(np.mean(np.abs(z[:, i] - z[:, j])))
    assert len(got) == len(want)
    for a, b, d in zip(
        got["source_a"].to_pylist(),
        got["source_b"].to_pylist(),
        got["delta"].to_pylist(),
    ):
        assert abs(d - want[(a, b)]) < 1.1e-6
