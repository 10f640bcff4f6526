"""Corpus-hygiene operators: decontamination, PII scrub, repetition
stats, bloom cross-snapshot dedup."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.filtering import (
    benchmark_ngram_set,
    decontaminate,
    ngram_hashes,
    pii_scrub_batch,
    repetition_stats_batch,
)
from dcs_ray.functions.sketches import (
    bloom_anti_join,
    bloom_build,
    bloom_from_hashes,
    bloom_might_contain,
)


def test_ngram_hashes_cross_row_isolation():
    texts = pa.array(["the cat sat on the mat", "the cat sat elsewhere", "x y", ""])
    p, h = ngram_hashes(texts, n=3)
    assert np.bincount(p, minlength=4).tolist() == [4, 2, 0, 0]
    # identical trigram hashes identically across rows; no n-gram spans rows
    assert len(set(h[p == 0]) & set(h[p == 1])) == 1  # "the cat sat"


def test_ngram_hashes_long_doc_vectorized():
    # a 100k-token doc must not blow up (hash is per-token + O(n) combine)
    long = " ".join(f"tok{i % 997}" for i in range(100_000))
    p, h = ngram_hashes(pa.array([long]), n=3)
    assert len(h) == 100_000 - 2


def test_decontaminate_flags_overlap(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta",  # benchmark doc
                    "noise alpha beta gamma more noise",  # contaminated
                    "totally different words here",  # clean
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    bench = benchmark_ngram_set(ray.data.from_arrow(docs.slice(0, 1)), n=3)
    ref = ray.put(bench)
    out = (
        decontaminate(ds, ref, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.contaminated.tolist() == [True, True, False]
    assert out.n_contaminated.tolist()[0] == 2  # both of its own trigrams
    # doc1 shares exactly the "alpha beta gamma" trigram (and no other)
    assert out.n_contaminated.tolist()[1] == 1


def test_pii_scrub_batch_redacts_and_counts():
    b = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "write a@b.co and c.d+e@f-g.org or ring +1 (555) 123-4567",
                    "no pii here",
                ]
            ),
        }
    )
    out = pii_scrub_batch(b)
    assert out["n_emails"].to_pylist() == [2, 0]
    assert out["n_phones"].to_pylist() == [1, 0]
    assert "<EMAIL>" in out["text"][0].as_py()
    assert "<PHONE>" in out["text"][0].as_py()
    assert "@" not in out["text"][0].as_py()


def test_repetition_stats_batch():
    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["spam spam spam eggs", "all distinct words", ""]),
        }
    )
    out = repetition_stats_batch(b)
    assert out["n_tokens"].to_pylist() == [4, 3, 0]
    assert out["n_distinct_tokens"].to_pylist() == [2, 3, 0]
    assert out["dup_token_frac"].to_pylist() == [0.5, 0.0, 0.0]
    assert out["top_token_frac"].to_pylist() == [0.75, 0.333333, 0.0]


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, 10_000, dtype=np.uint64)
    others = rng.integers(0, 2**63, 50_000, dtype=np.uint64)
    others = np.setdiff1d(others, members)
    bl = bloom_from_hashes(members, m_log2=20, k=7)
    assert bloom_might_contain(bl, members, 20, 7).all()  # never forgets
    fp = bloom_might_contain(bl, others, 20, 7).mean()
    assert fp < 0.01, fp  # theoretical ~ (1 - e^{-kn/m})^k ≈ 2e-5 here


def test_bloom_anti_join_cross_snapshot(ray_session):
    old = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["seen before", "also seen"]),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["seen before", "brand new", "also seen"]),
        }
    )
    bloom = bloom_build(ray.data.from_arrow(old), "text", m_log2=16, k=7)
    kept = bloom_anti_join(
        ray.data.from_arrow(new), ray.put(bloom), "text", m_log2=16, k=7
    ).to_pandas()
    assert kept.doc_id.tolist() == [11]


def test_bloom_build_tree_reduce_matches_flat_or(ray_session):
    """The layered map_batches OR-tree over 128+ one-row blocks yields
    the identical bitset to a single flat fold — OR is associative, the
    tree shape must not matter — and the driver-visible fold stays tiny."""
    n_blocks = 130
    texts = [f"doc number {i} payload" for i in range(n_blocks)]
    tbl = pa.table({"text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    tree = bloom_build(ds, "text", m_log2=16, k=7, fanin=4, levels=3)
    from dcs_ray.functions.sketches import _hash64_column as h64

    flat = bloom_from_hashes(h64(pa.array(texts)), m_log2=16, k=7)
    assert np.array_equal(tree, flat)
    # every member still probes positive through the tree-built filter
    assert bloom_might_contain(tree, h64(pa.array(texts)), 16, 7).all()


def test_curate_default_route_scale_safe(ray_session, monkeypatch):
    """Default (partitioned) route: identical output to the broadcast
    route, and the driver never ray.puts an id array proportional to
    the corpus — the VERDICT-r2 #1 done-condition."""
    from dcs_ray.functions.filtering import benchmark_ngram_set
    from dcs_ray.pipelines import curate_corpus
    import dcs_ray.pipelines as P

    n = 400
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en" if i % 3 else "de" for i in range(n)]),
            # every third doc duplicates its predecessor's text
            "text": pa.array(
                [
                    " ".join(f"tok{(i - (i % 3 == 0)) * 17 % 97}_{j}" for j in range(20))
                    for i in range(n)
                ]
            ),
        }
    )
    bench = benchmark_ngram_set(
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array([99], pa.int64()),
                      "text": pa.array(["tok0_0 tok0_1 tok0_2"])})
        ),
        n=3,
    )
    bench_ref = ray.put(bench)

    put_sizes = []
    real_put = P.ray.put

    def spy_put(obj, *a, **k):
        if isinstance(obj, np.ndarray):
            put_sizes.append(len(obj))
        return real_put(obj, *a, **k)

    monkeypatch.setattr(P.ray, "put", spy_put)
    out_part = curate_corpus(
        ray.data.from_arrow(docs), bench_ref, {"en": 2, "de": 1}, 10**9,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # no driver-side array anywhere near corpus size on the default route
    assert all(s < n // 4 for s in put_sizes), put_sizes
    out_bcast = curate_corpus(
        ray.data.from_arrow(docs), bench_ref, {"en": 2, "de": 1}, 10**9,
        dedup_route="broadcast",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out_part.equals(out_bcast)
    assert len(out_part) > 0


def test_curate_corpus_stage_semantics(ray_session):
    """The composition drops the right rows for the right reasons."""
    from dcs_ray.functions.filtering import benchmark_ngram_set
    from dcs_ray.pipelines import curate_corpus

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "lang": pa.array(["en"] * 6),
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(20)),        # 0: clean
                    " ".join(f"w{i}" for i in range(20)),        # 1: dup of 0
                    "short doc",                                  # 2: too short
                    "spam " * 20,                                 # 3: repetitive
                    " ".join(f"x{i}" for i in range(20)),        # 4: clean
                    "held out bench gram plus " + " ".join(f"y{i}" for i in range(15)),  # 5: contaminated
                ]
            ),
        }
    )
    bench = benchmark_ngram_set(
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array([99], pa.int64()),
                      "text": pa.array(["held out bench gram"])})
        ),
        n=3,
    )
    out = curate_corpus(
        ray.data.from_arrow(docs), ray.put(bench), {"en": 1}, 1_000_000,
        min_tokens=15, max_dup_frac=0.6,
    ).to_pandas()
    assert sorted(out.doc_id) == [0, 4]
    assert set(out.columns) == {"doc_id", "lang", "n_tokens"}


def test_gopher_rules_each_threshold(ray_session):
    """One crafted doc per rule violation; the base doc passes all."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.filtering import gopher_rules

    base = ("the data and value " * 15).strip()  # 60 words, all rules pass
    docs = {
        1: base,
        2: "the and " + "word " * 10,  # 12 words < 50 → word_count_ok fails
        3: ("the and " + "az " * 58).strip(),  # mean word len < 3
        4: base + " " + "#" * 8,  # 61 words, 8 '#' → 10·8 > 61 symbols fail
        5: "the and\n" + "\n".join("- bullet line" for _ in range(20))
           + " " + "pad " * 50,  # >90% bullet lines
        6: base.replace("the", "thx").replace("and", "anx"),  # no required words
        7: ("the and " + "12345 " * 58).strip(),  # <80% alphabetic words
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
        }
    )
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in gopher_rules(ray.data.from_arrow(tbl)).iter_batches(
                batch_format="pyarrow"
            )
        ]
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["keep"] is True
    assert rows[2]["word_count_ok"] is False and rows[2]["keep"] is False
    assert rows[3]["word_len_ok"] is False
    assert rows[4]["symbol_ok"] is False
    assert rows[5]["bullet_ok"] is False
    assert rows[6]["stop_ok"] is False
    assert rows[7]["alpha_ok"] is False


def test_gopher_bullet_trim_ascii_only(ray_session):
    """Bullet/ellipsis line detection trims the EXPLICIT ASCII
    whitespace set (space \\t \\r \\f \\v): a tab-indented '-' is a
    bullet for BOTH the engine and the SQL oracle, a NBSP-indented one
    for NEITHER (ADVICE r4 — utf8_trim_whitespace counted the NBSP line
    engine-side only)."""
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.filtering import gopher_rules

    pad = ("the data and value " * 15).strip()
    docs = {
        1: pad + "\n" + "\n".join("\t- tabbed bullet" for _ in range(20)),
        2: pad + "\n" + "\n".join(" - nbsp dash" for _ in range(20)),
        3: pad + "\n" + "\n".join("trailing dots...\t" for _ in range(20)),
        4: pad + "\n" + "\n".join("trailing dots... " for _ in range(20)),
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
        }
    )
    out = pa.concat_tables(
        [
            pa.table(b)
            for b in gopher_rules(ray.data.from_arrow(tbl)).iter_batches(
                batch_format="pyarrow"
            )
        ]
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["bullet_ok"] is False   # 20/21 tab-indented bullets
    assert rows[2]["bullet_ok"] is True    # NBSP is not in the trim set
    assert rows[3]["ellipsis_ok"] is False
    assert rows[4]["ellipsis_ok"] is True
