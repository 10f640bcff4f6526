"""Regexp→trigram planner: the candidate-superset invariant.

Rather than string-goldens (the reference pins exact planner output,
``internal/index/regexp_test.go``), we test the semantic contract that
makes the planner correct: **every string matching the regex satisfies
the trigram query** — candidates are a superset of true matches — and
that the planner actually narrows (doesn't return ALL) for patterns
with literal content."""

import re

import numpy as np
import pytest

from dcs_ray.queryplan import ALL, NONE, Q_ALL, eval_query, regexp_query, rewrite_query

CORPUS = [
    "abcdef",
    "ABCDEF",
    "AbCdEf then DEF",
    "HELLO WORLD",
    "XXYYZZ",
    "hello world",
    "abc then def",
    "xxyyzz",
    "Georg hello",
    "wxyz abc",
    "no match here",
    "defabc",
    "aXcdef",
]


def satisfies(q, text) -> bool:
    tris = {text[i : i + 3] for i in range(len(text) - 2)}

    def ev(node):
        if node.op == ALL:
            return True
        if node.op == NONE:
            return False
        parts = [t in tris for t in node.trigram] + [ev(s) for s in node.sub]
        return all(parts) if node.op == "AND" else any(parts)

    return ev(q)


@pytest.mark.parametrize(
    "pattern",
    [
        "abcdef",
        "abc.*def",
        "abc|wxyz",
        "(abc)+",
        "ab[cX]def",
        "hel+o",
        "abc(def|ghi)",
        "a.c.e",
        "(hello|xxyy)zz?",
        "abc{2,3}",
        "(?i)abcdef",
        "(?i)abc|WXYZ",
        "(?i)hel+o",
        "A(?i:bC)def",
        "(?i)(hello|xxyy)zz?",
    ],
)
def test_candidates_superset_of_matches(pattern):
    q = regexp_query(pattern)
    rx = re.compile(pattern)
    for text in CORPUS:
        if rx.search(text):
            assert satisfies(q, text), (pattern, text, q)


@pytest.mark.parametrize("pattern", ["abcdef", "abc.*def", "abc|wxyz", "(abc)+hello"])
def test_planner_narrows(pattern):
    q = regexp_query(pattern)
    assert q.op not in (ALL, NONE), (pattern, q)


def test_unfilterable_queries_are_all():
    # dcs rejects these as "empty trigram query" (dcs-web.go:98-120)
    assert regexp_query("a.*b").op == ALL or satisfies(regexp_query("a.*b"), "axb")
    assert regexp_query(".*").op == ALL
    assert regexp_query("a?").op == ALL  # emptyable


def test_eval_query_and_or():
    postings = {
        "abc": np.array([1, 2, 5], dtype=np.uint64),
        "bcd": np.array([2, 5, 9], dtype=np.uint64),
        "xyz": np.array([3, 5], dtype=np.uint64),
    }

    def lookup(t):
        return postings.get(t, np.empty(0, np.uint64))

    q = regexp_query("abcd|xyz")
    res = eval_query(q, lookup)
    assert not isinstance(res, str)
    assert set(res.tolist()) == {2, 3, 5}
    q2 = regexp_query("abcd")
    assert eval_query(q2, lookup).tolist() == [2, 5]


def test_rewrite_query_keywords():
    rest, pos, neg = rewrite_query("filetype:C grpc -package:linux buffer")
    assert rest == "grpc buffer"
    assert pos == {"filetype": ["c"]}
    assert neg == {"package": ["linux"]}
    rest2, pos2, neg2 = rewrite_query("plain query")
    assert rest2 == "plain query" and not pos2 and not neg2


def test_case_insensitive_regex_candidates():
    """(?i) must widen the trigram restriction to all case mixtures —
    dcs folds case in its RE2 parse (regexp.go FoldCase); without it the
    candidate AND silently drops upper-case matches."""
    from dcs_ray.queryplan import regexp_query

    import numpy as np

    from dcs_ray.queryplan import eval_query
    from dcs_ray.tokenize import string_trigrams

    def candidates(q, text_by_doc):
        def lookup(tri):
            hits = [
                d for d, t in text_by_doc.items() if tri in set(
                    bytes([x >> 16, (x >> 8) & 255, x & 255]).decode()
                    for x in string_trigrams(t)
                )
            ]
            return np.array(sorted(hits), np.uint64)

        r = eval_query(q, lambda tri: lookup(tri))
        return set(text_by_doc) if isinstance(r, str) else set(int(x) for x in r)

    docs = {0: "xx SPARK xx", 1: "xx Spark xx", 2: "xx spark xx", 3: "nothing"}
    qi = regexp_query("(?i)spark")
    assert candidates(qi, docs) >= {0, 1, 2}  # every case mixture reachable
    # case-sensitive plan misses the upper-case docs (the old (?i) bug)
    assert candidates(regexp_query("spark"), docs) == {2}
    # scoped group folding
    gdocs = {0: "xaBCdx", 1: "xabcdx", 2: "xABCDx"}
    assert candidates(regexp_query("a(?i:bc)d"), gdocs) >= {0, 1}


def test_case_insensitive_regex_end_to_end(ray_session, tmp_path):
    """A trigram-index regex search with (?i) finds docs in EVERY case."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from dcs_ray.grep import search_regex
    from dcs_ray.index import IndexConfig, build_index

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "url": pa.array([f"u{i}" for i in range(4)]),
            "text": pa.array(
                ["the SPARK engine", "a Spark thing", "plain spark here", "no match"]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    out = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet(str(tmp_path / "docs.parquet")), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="trigram",
                    id_col="doc_id", url_col="url", dedup_latest=False),
    )
    ds = ray.data.read_parquet(str(tmp_path / "docs.parquet"))
    res = search_regex(out, ds, r"(?i)spark").to_pandas()
    assert set(res.doc_id) == {0, 1, 2}


def test_catastrophic_pattern_bounded_time(ray_session):
    """A hostile backtracking pattern ((a+)+$ over 10 KB of 'a') must
    complete the pipeline in bounded time (the reference's RE2 DFA
    guarantees linear time; regexp/regexp.go:17) with ZERO bailed-out
    docs — the budget blow-out re-runs on the Pike-VM linear engine
    (dcs_ray/nfa.py), so every doc gets real results."""
    import time

    import pyarrow as pa
    import ray.data

    from dcs_ray.grep import grep_regex

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a" * 10240 + "b", "first line\nbenign aaa"]),
        }
    )
    t0 = time.monotonic()
    out = grep_regex(
        ray.data.from_arrow(docs), r"(a+)+$"
    ).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 60, elapsed  # would be years with unbounded re
    # no sentinel rows anywhere: doc 0 truly has no match ('b' breaks
    # the $ anchor), doc 1's trailing "benign aaa" matches for real
    assert (-1) not in out.line.tolist()
    assert out[out.doc_id == 0].empty
    assert out[out.doc_id == 1].line.tolist() == [2]
