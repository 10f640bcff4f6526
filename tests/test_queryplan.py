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
