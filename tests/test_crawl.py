"""Crawl snapshot delta: bucketed vectorized classification matches a
brute-force dict diff; content equality decided by hash without text
crossing the exchange."""

import pyarrow as pa
import ray.data

from dcs_ray.functions.crawl import crawl_delta


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": [u for u, _ in rows],
                "text": [t for _, t in rows],
            }
        )
    ).repartition(3)


def test_crawl_delta_matches_bruteforce(ray_session):
    old = [(f"u{i}", f"body {i}") for i in range(40)]
    # new: drop every 5th, change every 7th, add 10 fresh
    new = [
        (u, (t + " v2") if i % 7 == 0 else t)
        for i, (u, t) in enumerate(old)
        if i % 5 != 0
    ] + [(f"fresh{i}", f"new {i}") for i in range(10)]

    od, nd = dict(old), dict(new)
    want = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for u in set(od) | set(nd):
        if u not in od:
            want["added"] += 1
        elif u not in nd:
            want["removed"] += 1
        elif od[u] != nd[u]:
            want["changed"] += 1
        else:
            want["unchanged"] += 1

    t = crawl_delta(_ds(old), _ds(new), n_buckets=5)
    got = dict(zip(t["status"].to_pylist(), t["n_urls"].to_pylist()))
    assert got == {k: v for k, v in want.items() if v > 0}


def test_crawl_delta_rejects_duplicate_urls(ray_session):
    import pytest

    dup = [("a", "x"), ("a", "y")]
    with pytest.raises(Exception, match="precondition"):
        crawl_delta(_ds(dup), _ds([("b", "z")]))


def test_crawl_delta_disjoint_and_identical(ray_session):
    a = [("a", "x"), ("b", "y")]
    b = [("c", "z")]
    t = crawl_delta(_ds(a), _ds(b))
    assert dict(zip(t["status"].to_pylist(), t["n_urls"].to_pylist())) == {
        "added": 1,
        "removed": 2,
    }
    t2 = crawl_delta(_ds(a), _ds(a))
    assert dict(zip(t2["status"].to_pylist(), t2["n_urls"].to_pylist())) == {
        "unchanged": 2
    }


def test_parse_robots_group_scoping_and_precedence():
    """RFC 9309 subset: only the `*` group applies; a new group header
    after rules closes the group; longest rule wins, allow on ties."""
    import numpy as np
    import pyarrow as pa

    from dcs_ray.functions.crawl import parse_robots, robots_decisions

    txt = (
        "# comment\n"
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /c/\nAllow: /c/\n\n"
        "User-agent: evil\nDisallow: /\n"
    )
    rules = parse_robots(txt)
    assert rules == [(False, "/a"), (True, "/a/b"), (False, "/c/"), (True, "/c/")]
    urls = pa.array(
        [
            "https://h/a/x",      # blocked by /a
            "https://h/a/b/x",    # allowed: /a/b longer than /a
            "https://h/c/z",      # equal-length tie -> allow
            "https://h/g",        # googlebot group does not apply
            "https://other/a/x",  # no rules for this host
        ]
    )
    got = robots_decisions(
        urls, {"h": rules}
    )
    assert got.tolist() == [False, True, True, True, True]
