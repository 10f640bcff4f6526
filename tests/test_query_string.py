"""Unified query-string front door (``search.search_query``): the full
dcs-web grammar — terms, "quoted phrases", -negated terms, key:value /
-key:value keywords — parsed once and composed onto the shard fan-out,
with posting-membership negation evaluated per shard (``terms_none``)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.queryplan import parse_user_query
from dcs_ray.search import search_bm25, search_query

SF = "/root/testdata/sf0.001"


def test_parse_user_query_grammar():
    p = parse_user_query('join "spark merge" -window -source:src5 lang:EN value')
    assert p["terms"] == ["join", "value"]
    assert p["phrases"] == ["spark merge"]
    assert p["neg_terms"] == ["window"]
    assert p["includes"] == {"lang": ["en"]}
    assert p["negates"] == {"source": ["src5"]}
    # degenerate inputs parse, not crash
    assert parse_user_query('""  - -x')["neg_terms"] == ["x"]
    assert parse_user_query("")["terms"] == []


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    root = tmp_path_factory.mktemp("qs")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    words = str(root / "words")
    build_index(docs, words, IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False, meta_cols=("source", "lang"),
    ))
    tri = str(root / "tri")
    build_index(docs, tri, IndexConfig(
        num_partitions=4, num_shards=2, mode="trigram", id_col="doc_id",
        dedup_latest=False, positional=True,
    ))
    return words, tri


def test_plain_terms_equal_bm25(indexes):
    words, _ = indexes
    a = search_query(words, "spark merge join", k=10)
    b = search_bm25(words, ["spark merge join"], k=10)
    assert a.equals(b)


def test_terms_none_equals_explicit_not_doc_ids(indexes):
    """Per-shard posting negation ≡ a driver-materialized exclusion list
    of every doc containing the term (the shape it replaces)."""
    words, _ = indexes
    txt = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = [set(t.lower().replace(",", " ").replace(".", " ").split())
            for t in txt["text"].to_pylist()]
    ids = txt["doc_id"].to_numpy()
    having = [int(i) for i, s in zip(ids, toks) if "window" in s]
    a = search_bm25(words, ["spark merge join"], k=10,
                    filters={"terms_none": ["window"]})
    b = search_bm25(words, ["spark merge join"], k=10,
                    filters={"not_doc_ids": having})
    assert a.equals(b)
    assert len(a) > 0


def test_full_grammar_composition(indexes):
    words, tri = indexes
    raw = 'join batch value "spark merge" -window -source:src5'
    got = search_query(words, raw, k=10, phrase_index_dir=tri)
    txt = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "source"])
    by_id = {int(d): (t, s) for d, t, s in zip(
        txt["doc_id"].to_pylist(), txt["text"].to_pylist(),
        txt["source"].to_pylist())}
    assert len(got) > 0
    for d in got["doc_id"].to_pylist():
        text, source = by_id[int(d)]
        assert "spark merge" in text           # phrase constraint
        assert source != "src5"                # keyword negation
        words_set = set(
            "".join(c if c.isalnum() else " " for c in text.lower()).split()
        )
        assert "window" not in words_set       # term negation
    # scores match an explicit-filter run of the same plan
    ref = search_bm25(
        words, ["join batch value spark merge"], k=10,
        filters={
            "doc_ids": sorted(
                int(d) for d, (t, s) in by_id.items() if "spark merge" in t
            ),
            "exclude": {"source": ["src5"]},
            "terms_none": ["window"],
        },
    )
    assert got.equals(ref)


def test_phrase_requires_positional_index(indexes):
    words, _ = indexes
    with pytest.raises(ValueError, match="phrase"):
        search_query(words, '"spark merge"', k=5)


def test_unmatched_phrase_returns_empty(indexes):
    words, tri = indexes
    got = search_query(words, 'join "zzz qqq never"', k=5,
                       phrase_index_dir=tri)
    assert len(got) == 0


def test_terms_all_requires_posting_membership(indexes):
    """terms_all restricts ranking to docs whose posting lists contain
    EVERY listed term — equal to filtering the unrestricted ranking by
    the boolean-AND candidate set."""
    from dcs_ray.search import search_boolean

    words, _ = indexes
    a = search_bm25(words, ["spark merge join"], k=30,
                    filters={"terms_all": ["window", "batch"]})
    cand = set(search_boolean(words, ["window", "batch"])["doc_id"].to_pylist())
    full = search_bm25(words, ["spark merge join"], k=30)
    keep = [d in cand for d in full["doc_id"].to_pylist()]
    expect = full.filter(pa.array(keep))
    assert len(a) > 0 and len(expect) > 0
    # the candidates visible in the full top-30 must head the restricted
    # ranking in the same order (identical scores); the restricted run
    # may continue deeper than the full top-30 reaches
    assert a["doc_id"].to_pylist()[: len(expect)] == expect["doc_id"].to_pylist()
    assert set(a["doc_id"].to_pylist()) <= cand
    missing_term = search_bm25(words, ["spark merge join"], k=10,
                               filters={"terms_all": ["zzzznotaterm"]})
    assert len(missing_term) == 0


def test_parse_extended_grammar():
    p = parse_user_query('alpha +beta -"bad phrase" "good one" -gamma')
    assert p["terms"] == ["alpha"]
    assert p["req_terms"] == ["beta"]
    assert p["neg_terms"] == ["gamma"]
    assert p["phrases"] == ["good one"]
    assert p["neg_phrases"] == ["bad phrase"]


def test_required_term_operator(indexes):
    """+term filters by posting membership without changing scoring."""
    words, _ = indexes
    a = search_query(words, "spark merge join +window", k=10)
    b = search_bm25(words, ["spark merge join"], k=10,
                    filters={"terms_all": ["window"]})
    assert a.equals(b)
    assert len(a) > 0


def test_negated_phrase_operator(indexes):
    """-"phrase" excludes exact-phrase matches via the positional
    pre-pass; remaining ranking is the plain one minus those docs."""
    words, tri = indexes
    got = search_query(words, 'join batch value -"spark merge"', k=10,
                       phrase_index_dir=tri)
    txt = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    having = {int(d) for d, t in zip(txt["doc_id"].to_pylist(),
                                     txt["text"].to_pylist())
              if "spark merge" in t}
    assert having, "fixture phrase must occur"
    assert not (set(got["doc_id"].to_pylist()) & having)
    full = search_bm25(words, ["join batch value"], k=10 + len(having))
    keep = [int(d) not in having for d in full["doc_id"].to_pylist()]
    expect = full.filter(pa.array(keep)).slice(0, 10)
    assert got["doc_id"].to_pylist() == expect["doc_id"].to_pylist()


def test_grammar_leading_and_infix_wildcards(ray_session, tmp_path):
    """Round 5: the query grammar routes *core (suffix, reversed-dict
    range read) and *core* (infix, vocab scan) through the proper
    expanders — previously '*ing' silently ranked the LITERAL term
    'ing'. Identity against search_bm25 over the explicit expansion."""
    import ray.data

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import (
        expand_contains_terms,
        search_bm25,
        search_query,
    )

    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet"), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    # suffix form
    got = search_query(out, "*rk merge", k=10).to_pandas()
    terms = expand_contains_terms(out, "rk", 20, suffix_only=True)
    want = search_bm25(out, [" ".join(sorted(set(terms + ["merge"])))], k=10).to_pandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # infix form matches the infix expansion's semantics
    got_i = search_query(out, "*erg*", k=10).to_pandas()
    terms_i = expand_contains_terms(out, "erg", 20)
    want_i = search_bm25(out, [" ".join(sorted(set(terms_i)))], k=10).to_pandas()
    assert sorted(got_i["doc_id"]) == sorted(want_i["doc_id"])
    assert "merge" in terms_i  # the infix actually expanded
