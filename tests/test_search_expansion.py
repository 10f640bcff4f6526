"""Wildcard / fuzzy / minimum-should-match / recency-prior BM25 and the
quality-aware fuzzy-dedup keep policy — term-expansion search operators
(Lucene WildcardQuery/FuzzyQuery/minimumShouldMatch semantics over the
dcs-style sharded index; the reference's query language stops at
literal/regex, so these are web-serving surface extensions)."""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import (
    expand_prefix_terms,
    load_stats,
    search_bm25,
    search_fuzzy,
    search_wildcard,
)

SF = "/root/testdata/sf0.001"
Q = "spark merge join"


@pytest.fixture(scope="module")
def words_index(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("idx") / "words_exp")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False, meta_cols=("source",),
    )
    build_index(docs, out, conf)
    return out


def test_expand_prefix_matches_vocab_scan(words_index):
    got = expand_prefix_terms(words_index, "spa", max_expansions=20)
    vocab = pq.read_table(os.path.join(words_index, "stats", "df.parquet"))
    want = sorted(
        (
            (t, d)
            for t, d in zip(vocab["term"].to_pylist(), vocab["df"].to_pylist())
            if t.startswith("spa")
        ),
        key=lambda td: (-td[1], td[0]),
    )[:20]
    assert got == [t for t, _ in want]
    assert len(got) >= 1  # 'spark' itself is corpus vocabulary


def test_wildcard_equals_manual_expansion(words_index):
    t = search_wildcard(words_index, "merge spa*", k=10, max_expansions=20)
    terms = set(expand_prefix_terms(words_index, "spa", 20)) | {"merge"}
    ref = search_bm25(words_index, [" ".join(sorted(terms))], k=10)
    assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()
    np.testing.assert_allclose(
        t["score"].to_numpy(), np.round(ref["score"].to_numpy(), 6), atol=1e-9
    )


def test_wildcard_beats_exact_on_recall(words_index):
    """The expansion must actually add matching docs vs the bare prefix
    token (which is typically not itself a corpus term)."""
    exp = expand_prefix_terms(words_index, "spa", 20)
    assert any(t != "spa" for t in exp)


def test_fuzzy_equals_manual_union(words_index):
    from dcs_ray.functions.spell import suggest

    t = search_fuzzy(words_index, "spark merge", k=10, max_expansions=50)
    vocab = ray.data.read_parquet(os.path.join(words_index, "stats", "df.parquet"))
    sugg = suggest(vocab, ["merge", "spark"], k=50)
    terms = sorted(set(sugg["term"].to_pylist()))
    assert "spark" in terms and "merge" in terms  # exact terms survive
    ref = search_bm25(words_index, [" ".join(terms)], k=10)
    assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()


def test_fuzzy_expansion_is_distance_1(words_index):
    from dcs_ray.functions.spell import levenshtein, suggest

    vocab = ray.data.read_parquet(os.path.join(words_index, "stats", "df.parquet"))
    sugg = suggest(vocab, ["spark"], k=50)
    for term in sugg["term"].to_pylist():
        assert levenshtein(term, "spark") <= 1


def test_msm_filters_by_distinct_match_count(words_index):
    stats = load_stats(words_index)
    got = search_bm25(words_index, [Q], k=10, min_match=2)
    # brute-force reference: full disjunctive ranking, then drop docs
    # matching < 2 distinct query terms (counted on the raw text with
    # the same tokenizer convention)
    full = search_bm25(words_index, [Q], k=stats["n_docs"], stats=stats)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    by_id = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    tok = re.compile(r"[a-z0-9]+")
    qterms = set(Q.split())
    rows = [
        (d, s)
        for d, s in zip(full["doc_id"].to_pylist(), full["score"].to_pylist())
        if len(qterms & set(tok.findall(by_id[d].lower()))) >= 2
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert got["doc_id"].to_pylist() == [d for d, _ in rows[:10]]
    # and every survivor really matches >= 2 distinct terms
    for d in got["doc_id"].to_pylist():
        assert len(qterms & set(tok.findall(by_id[d].lower()))) >= 2


def test_msm_incompatible_combinations_raise(words_index):
    with pytest.raises(ValueError, match="min_match"):
        search_bm25(words_index, [Q], k=5, min_match=2, method="bmw")
    with pytest.raises(ValueError, match="min_match"):
        search_bm25(words_index, [Q], k=5, min_match=2, prior_col="prior")


def test_keep_best_keeps_longest_per_cluster(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    texts = {
        1: base,
        2: base + "with an extra closing sentence tacked on the end",
        3: base[: len(base) - 20],
        4: "completely unrelated content about astrophysics and quasars "
           "radiating in the ultraviolet spectrum for many kiloparsecs",
        5: "another shared passage describing distributed index merges " * 4,
        6: "another shared passage describing distributed index merges " * 4
           + "plus one more trailing clause",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            "n_chars": pa.array([len(texts[i]) for i in sorted(texts)], pa.int64()),
        }
    )
    from dcs_ray.functions.dedup import fuzzy_dedup_keep, fuzzy_dedup_keep_best

    ds = ray.data.from_arrow(tbl)
    kept = pa.concat_tables(
        [
            pa.table(b)
            for b in fuzzy_dedup_keep_best(ds, quality_col="n_chars").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )["doc_id"].to_pylist()
    # cluster {1,2,3}: 2 is longest; cluster {5,6}: 6 is longest; 4 solo
    assert sorted(kept) == [2, 4, 6]
    # contrast with the min-id policy on the same clusters
    kept_min = pa.concat_tables(
        [
            pa.table(b)
            for b in fuzzy_dedup_keep(ds).iter_batches(batch_format="pyarrow")
        ]
    )["doc_id"].to_pylist()
    assert sorted(kept_min) == [1, 4, 5]


def test_grammar_wildcard_and_fuzzy_operators(words_index):
    """`spa*` / `merg~` in the query-string grammar expand against the
    index vocabulary; +/- membership operands stay literal."""
    from dcs_ray.search import search_query

    t = search_query(words_index, "spa* merge", k=10)
    terms = set(expand_prefix_terms(words_index, "spa", 20)) | {"merge"}
    ref = search_bm25(words_index, [" ".join(sorted(terms))], k=10)
    assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()

    t2 = search_query(words_index, "spark~", k=10)
    ref2 = search_fuzzy(words_index, "spark", k=10, max_expansions=20)
    assert t2["doc_id"].to_pylist() == ref2["doc_id"].to_pylist()

    # membership operators do NOT expand: '+spa*' requires the literal
    # token 'spa', which is not corpus vocabulary → empty result
    t3 = search_query(words_index, "merge +spa*", k=10)
    assert len(t3) == 0


def test_explain_contributions_sum_to_scores(words_index):
    """EXPLAIN invariant: per-doc Σ term contributions equals the
    ranking score, tfs are positive, terms ⊆ query."""
    from dcs_ray.search import explain_scores

    top = search_bm25(words_index, [Q], k=10)
    ex = explain_scores(words_index, Q, k=10)
    assert set(ex["term"].to_pylist()) <= set(Q.split())
    assert min(ex["tf"].to_pylist()) >= 1
    by_doc = {}
    for r in ex.to_pylist():
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["contribution"]
    for d, s in zip(top["doc_id"].to_pylist(), top["score"].to_pylist()):
        assert abs(by_doc[d] - s) < 5e-6, (d, by_doc[d], s)


def test_ordered_window_is_directional(ray_session, tmp_path):
    """#N vs #uwN: 'b then a' must count in the unordered window but
    NOT in the ordered one; pair counts are exact."""
    from dcs_ray.search import search_proximity

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta",           # a before b: ordered hit
                    "beta alpha",           # b before a: unordered only
                    "alpha x beta alpha beta",  # mixed: 3 ordered pairs? a@0,a@13; b@8,b@19 -> (0,8),(0,19),(13,19)
                ],
                pa.string(),
            ),
        }
    )
    out = str(tmp_path / "ordidx")
    from dcs_ray.index import IndexConfig, build_index

    build_index(
        ray.data.from_arrow(docs), out,
        IndexConfig(num_partitions=1, num_shards=1, mode="trigram",
                    positional=True, id_col="doc_id", dedup_latest=False),
    )
    uw = search_proximity(out, [("alpha", "beta")], window=40)
    od = search_proximity(out, [("alpha", "beta")], window=40, ordered=True)
    uw_rows = dict(zip(uw["doc_id"].to_pylist(), uw["n_pairs"].to_pylist()))
    od_rows = dict(zip(od["doc_id"].to_pylist(), od["n_pairs"].to_pylist()))
    assert uw_rows == {1: 1, 2: 1, 3: 4}
    assert od_rows == {1: 1, 3: 3}


def test_export_postings_full_roundtrip_invariants(words_index):
    """Index→data export: whole-index decode reproduces the corpus
    statistics exactly — Σtf = total tokens, distinct terms = the
    vocab, and per-term rows match a brute text recount."""
    from dcs_ray.search import export_postings

    ds = export_postings(words_index)
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    stats = load_stats(words_index)
    assert int(pa.compute.sum(t["tf"]).as_py()) == stats["sum_doc_len"]
    vocab = pq.read_table(
        os.path.join(words_index, "stats", "df.parquet"), columns=["term"]
    )["term"].to_pylist()
    assert set(t["term"].to_pylist()) == set(vocab)
    # spot-check one term against raw text
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    want = {}
    for d, x in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()):
        n = tok.findall(x.lower()).count("spark")
        if n:
            want[d] = n
    got = {
        d: f
        for term, d, f in zip(
            t["term"].to_pylist(), t["doc_id"].to_pylist(), t["tf"].to_pylist()
        )
        if term == "spark"
    }
    assert got == want


def test_infix_and_suffix_wildcard_forms(words_index):
    """*sub* (contains) and *sub (suffix) expansion match a brute vocab
    scan; leading wildcards rank through the normal fan-out."""
    from dcs_ray.search import expand_contains_terms, search_wildcard, wildcard_terms

    vocab = pq.read_table(os.path.join(words_index, "stats", "df.parquet"))
    pairs = list(zip(vocab["term"].to_pylist(), vocab["df"].to_pylist()))
    want_infix = [
        t for t, _ in sorted(
            ((t, d) for t, d in pairs if "par" in t), key=lambda td: (-td[1], td[0])
        )[:20]
    ]
    assert expand_contains_terms(words_index, "par", 20) == want_infix
    want_suffix = [
        t for t, _ in sorted(
            ((t, d) for t, d in pairs if t.endswith("er")), key=lambda td: (-td[1], td[0])
        )[:20]
    ]
    assert expand_contains_terms(words_index, "er", 20, suffix_only=True) == want_suffix
    assert set(wildcard_terms(words_index, "*par* merge")) == set(want_infix) | {"merge"}
    t = search_wildcard(words_index, "*par* merge", k=10)
    ref = search_bm25(words_index, [" ".join(sorted(set(want_infix) | {"merge"}))], k=10)
    assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()


def test_suggest_local_identical_to_dataset_path(words_index):
    """The driver-side SymSpell fast path returns byte-identical tables
    to the Dataset stream (shared probe/verify kernels)."""
    from dcs_ray.functions.spell import suggest, suggest_local

    path = os.path.join(words_index, "stats", "df.parquet")
    words = ["spark", "merge", "sprk", "zzz"]
    a = suggest(ray.data.read_parquet(path), words, k=50)
    b = suggest_local(pq.read_table(path), words, k=50)
    assert a.equals(b)


def test_search_as_you_type_last_token_prefix(words_index):
    """'join me' ranks as 'join me*'; an already-starred last token is
    left alone; empty input returns an empty table."""
    from dcs_ray.search import search_as_you_type, search_wildcard

    a = search_as_you_type(words_index, "join me", k=10)
    b = search_wildcard(words_index, "join me*", k=10)
    assert a.equals(b)
    c = search_as_you_type(words_index, "join me*", k=10)
    assert c.equals(b)
    assert len(search_as_you_type(words_index, "", k=10)) == 0


def test_suffix_wildcard_reversed_dictionary(ray_session, tmp_path):
    """Round 5: leading-wildcard (*sub) expansion routes through the
    reversed-term dictionary (range-pruned read of stats/df_rev.parquet)
    and must return EXACTLY what the documented vocab scan returns; an
    index without the artifact falls back to the scan."""
    import os

    import ray.data

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import (
        expand_contains_terms,
        expand_suffix_terms_reversed,
    )

    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet"), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    rev = os.path.join(out, "stats", "df_rev.parquet")
    assert os.path.exists(rev)
    for sub in ("ge", "rk", "e", "zzznope"):
        fast = expand_suffix_terms_reversed(out, sub, 20)
        os.rename(rev, rev + ".bak")
        try:
            slow = expand_contains_terms(out, sub, 20, suffix_only=True)
            # fallback path (no artifact) must equal the fast path
            assert expand_suffix_terms_reversed(out, sub, 20) is None
            assert expand_contains_terms(out, sub, 20, suffix_only=True) == slow
        finally:
            os.rename(rev + ".bak", rev)
        assert fast == slow, sub
        # and the routed public path uses the artifact
        assert expand_contains_terms(out, sub, 20, suffix_only=True) == fast


def test_wildcard_unincrementable_chars_no_crash(ray_session, tmp_path):
    """Review r5c: a wildcard whose boundary char cannot be incremented
    (U+10FFFF, or an increment landing in the surrogate range) must
    fall back to the scan path, not crash the range-bound arithmetic."""
    import ray.data

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import (
        expand_contains_terms,
        expand_prefix_terms,
        wildcard_terms,
    )

    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet"), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    top = "\U0010FFFF"
    sur = "퟿"
    assert expand_prefix_terms(out, "spa" + top, 10) == []
    assert expand_prefix_terms(out, "spa" + sur, 10) == []
    assert expand_contains_terms(out, top + "foo", 10, suffix_only=True) == []
    # the public routed surface stays calm too
    assert wildcard_terms(out, f"*{top}x") == []


def test_service_prior_method_guard_parity(ray_session, tmp_path):
    """Review r5c: the service must raise on prior_col × bmw exactly
    like search_bm25 — not silently serve the exhaustive-prior scorer."""
    import pytest
    import ray.data

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.service import search_service

    out = str(tmp_path / "idx")
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def with_prior(b):
        import numpy as np
        import pyarrow as pa

        ids = b["doc_id"].to_numpy()
        return b.append_column("prior", pa.array(1.0 + (ids % 5) / 10.0, pa.float64()))

    build_index(
        docs.map_batches(with_prior, batch_format="pyarrow"), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False, meta_cols=("prior",)),
    )
    svc = search_service(out, num_cpus=0.5)
    try:
        with pytest.raises(ValueError, match="prior_col is incompatible"):
            svc.search(["spark"], k=5, method="bmw", prior_col="prior")
        # the allowed combination still serves
        assert svc.search(["spark"], k=5, prior_col="prior").num_rows > 0
    finally:
        svc.shutdown()
