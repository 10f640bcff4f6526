"""Text-prep operators: normalization, bigram counts, sequence packing
(chunked + greedy), count-min heavy hitters."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from dcs_ray.functions.sketches import cms_fold_batch, cms_heavy_hitters, cms_query, _hash64_column
from dcs_ray.functions.textprep import (
    bigram_counts,
    bigram_counts_batch,
    greedy_boundaries,
    normalize_text_batch,
    pack_sequences_greedy,
)

SF = "/root/testdata/sf0.001"


def test_normalize_text_batch():
    import unicodedata

    b = pa.table({"doc_id": [1, 2], "text": ["  Héllo\t\nWORLD  x ", "KK k"]})
    out = normalize_text_batch(b)
    want = [unicodedata.normalize("NFC", s) for s in ["héllo world x", "kk k"]]
    assert out["norm_text"].to_pylist() == want
    # NFD input composes to the same NFC output
    b2 = pa.table({"doc_id": [1], "text": [unicodedata.normalize("NFD", "Héllo")]})
    assert normalize_text_batch(b2)["norm_text"].to_pylist() == [want[0].split(" ")[0]]


def test_bigram_batch_pairs_do_not_cross_docs():
    b = pa.table({"doc_id": [1, 2], "text": ["a b", "c d"]})
    out = bigram_counts_batch(b)
    assert sorted(out["bigram"].to_pylist()) == ["a b", "c d"]
    one = bigram_counts_batch(pa.table({"doc_id": [1], "text": ["x"]}))
    assert len(one) == 0


def test_bigram_counts_corpus(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = bigram_counts(docs, k=10)
    # reference: single-table count
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter

    c = Counter()
    import re

    for s in t["text"].to_pylist():
        toks = [x for x in re.split(r"[^a-z0-9]+", s.lower()) if x]
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert list(zip(got["bigram"].to_pylist(), got["n"].to_pylist())) == want


def test_greedy_boundaries_reference():
    rng = np.random.default_rng(5)
    n = rng.integers(1, 120, size=500)
    seq = greedy_boundaries(n, budget=256)
    # reference loop
    sid, acc, want = 0, 0, []
    for x in n:
        if acc and acc + x > 256:
            sid, acc = sid + 1, 0
        acc += x
        want.append(sid)
    assert seq.tolist() == want
    # oversized doc occupies its own sequence and advances
    seq2 = greedy_boundaries(np.array([100, 999, 100]), budget=256)
    assert seq2.tolist() == [0, 1, 2]
    # every sequence except possibly per-oversize respects the budget
    sums = np.bincount(seq, weights=n)
    assert (sums <= 256).all()


def test_pack_greedy_corpus(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = pa.concat_tables(
        pa.table(b)
        for b in pack_sequences_greedy(docs, budget=256, num_buckets=4).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    ids = out["doc_id"].to_numpy()
    assert (out["bucket"].to_numpy() == ids % 4).all()
    # bucket-local: within each bucket, reference greedy on id-ordered counts
    for bkt in range(4):
        m = out["bucket"].to_numpy() == bkt
        n = out["n_tokens"].to_numpy()[m]
        want = greedy_boundaries(n, 256)
        assert (out["seq_id"].to_numpy()[m] == want).all()
    # determinism across runs
    out2 = pa.concat_tables(
        pa.table(b)
        for b in pack_sequences_greedy(docs, budget=256, num_buckets=4).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    assert out.equals(out2)


def test_cms_overestimates_and_merges():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 200, size=20000, dtype=np.int64)
    h = _hash64_column(pa.chunked_array([pa.array(vals)]))
    whole = cms_fold_batch(h, 4, 4096)
    merged = cms_fold_batch(h[:9000], 4, 4096) + cms_fold_batch(h[9000:], 4, 4096)
    assert np.array_equal(whole, merged)
    uniq, true_counts = np.unique(vals, return_counts=True)
    hu = _hash64_column(pa.chunked_array([pa.array(uniq)]))
    est = cms_query(whole, hu)
    assert (est >= true_counts).all()
    # error bound ~ 2N/width per row, min over 4 rows is far tighter
    assert (est - true_counts).max() <= 2 * len(vals) / 4096 * 4


def test_cms_heavy_hitters_events(ray_session):
    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = cms_heavy_hitters(ev, "event_type", k=3, candidates_per_batch=16)
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type"])
    vc = t.group_by(["event_type"]).aggregate([("event_type", "count")])
    exact = dict(zip(vc["event_type"].to_pylist(), vc["event_type_count"].to_pylist()))
    top_exact = sorted(exact, key=lambda v: (-exact[v], v))[:3]
    assert sorted(got["event_type"].to_pylist()) == sorted(top_exact)
    for v, e in zip(got["event_type"].to_pylist(), got["n_est"].to_pylist()):
        assert e >= exact[v]
        assert e - exact[v] <= 2 * t.num_rows / 4096 * 4


def test_greedy_boundaries_zero_token_docs():
    # exact state-machine parity, including zero-token docs: an
    # oversize after zero-weight docs stays in the open sequence
    # (acc==0 never splits); a zero doc after an oversize splits
    # (acc > budget)
    from hypothesis import given, settings, strategies as st

    def ref(ns, budget):
        sid, acc, out = 0, 0, []
        for x in ns:
            if acc and acc + x > budget:
                sid, acc = sid + 1, 0
            acc += x
            out.append(sid)
        return out

    assert greedy_boundaries(np.array([0, 300, 5]), 256).tolist() == ref([0, 300, 5], 256)
    assert greedy_boundaries(np.array([0, 0]), 256).tolist() == [0, 0]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=400), max_size=60),
           st.integers(min_value=1, max_value=300))
    def prop(ns, budget):
        assert greedy_boundaries(np.array(ns, np.int64), budget).tolist() == ref(ns, budget)

    prop()


def test_quality_classifier_actor_pool(ray_session):
    from dcs_ray.functions.textstats import QualityClassifier, quality_classify

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = pa.concat_tables(
        pa.table(b)
        for b in quality_classify(docs).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert len(out) == docs.count()
    p = out["quality_prob"].to_numpy()
    assert ((p >= 0) & (p <= 1)).all()
    assert (out["keep"].to_numpy() == (p >= QualityClassifier.THRESHOLD)).all()
    # deterministic: single-actor local call matches the pool output
    ref = pa.concat_tables(
        QualityClassifier()(pa.table(b))
        for b in docs.iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert out.equals(ref)


def test_chunk_documents_matches_loop(ray_session):
    """Window starts/lengths/text equal a per-doc reference loop,
    including exact-multiple and shorter-than-window docs."""
    import numpy as np

    from dcs_ray.functions.textprep import chunk_documents

    texts = [
        " ".join(f"t{i}" for i in range(13)),  # 13 tokens: ragged tail
        " ".join(f"t{i}" for i in range(8)),   # exactly 2 strides
        " ".join(f"t{i}" for i in range(3)),   # shorter than window
        "",                                     # empty -> no chunks
        " ".join(f"t{i}" for i in range(4)),   # exactly one window
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (
        chunk_documents(ray.data.from_arrow(t), 4, 2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = []
    for did, txt in enumerate(texts):
        toks = txt.split()
        n = len(toks)
        n_chunks = 1 + -(-max(n - 4, 0) // 2) if n else 0
        for cid in range(n_chunks):
            st = cid * 2
            en = min(st + 4, n)
            want.append((did, cid, st, en - st, " ".join(toks[st:en])))
    got = list(zip(out.doc_id, out.chunk_id, out.start_token,
                   out.n_chunk_tokens, out.chunk_text))
    assert got == want


def test_next_word_suggest_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.textprep import next_word_suggest

    rows = pa.table(
        {
            "text": pa.array(
                [
                    "scan table scan index scan table",
                    "scan table fast",
                    "no match here. scandal scan",  # 'scandal' ≠ 'scan'; trailing 'scan' has no successor
                ],
                pa.string(),
            )
        }
    )
    t = next_word_suggest(ray.data.from_arrow(rows).repartition(2), "scan", k=2)
    assert t["next_word"].to_pylist() == ["table", "index"]
    assert t["n"].to_pylist() == [3, 1]


def test_next_word_suggest_unknown_word(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.textprep import next_word_suggest

    t = next_word_suggest(
        ray.data.from_arrow(pa.table({"text": pa.array(["a b c"], pa.string())})),
        "zzz",
    )
    assert len(t) == 0
