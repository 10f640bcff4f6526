"""SURT keys + CDX capture index (Internet Archive / Common Crawl
conventions): host-label reversal puts every subdomain of a registrable
domain in one lexicographic range — the property CDX prefix scans and
host partitioning rely on."""

import pyarrow as pa
import ray.data

from dcs_ray.functions.urls import (
    cdx_capture_index,
    cdx_prefix_lookup,
    surt_key_batch,
)


def _surt(urls: list[str]) -> list[str]:
    b = pa.table({"url": pa.array(urls, pa.string())})
    return surt_key_batch(b)["surt"].to_pylist()


def test_surt_transform_cases():
    assert _surt(
        [
            "https://www.example.org/a",
            "http://example.org/",
            "https://a.b.example.co.uk/p/q",
            "https://HOST.Example.ORG/Path",
            "https://example.org",
        ]
    ) == [
        "org,example)/a",
        "org,example)/",
        "uk,co,example,b,a)/p/q",
        "org,example,host)/Path",  # host lowercased, path case preserved
        "org,example)/",
    ]


def test_subdomains_share_a_prefix_range():
    keys = _surt(
        [
            "https://a.example.org/x",
            "https://b.example.org/y",
            "https://example.org/z",
            "https://example.net/x",
        ]
    )
    in_range = [k for k in keys if "org,example" <= k < "org,examplf"]
    assert len(in_range) == 3  # .net excluded, every .org subdomain in


def test_cdx_rollup_and_prefix_lookup(ray_session):
    ts = pa.timestamp("us")
    pages = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.example.org/p1",
                    "https://a.example.org/p1",  # re-crawl
                    "https://a.example.org/p2",
                    "https://b.example.org/p1",
                ],
                pa.string(),
            ),
            "warc_ts": pa.array([1_000_000, 5_000_000, 2_000_000, 3_000_000], ts),
        }
    )
    cdx = cdx_capture_index(ray.data.from_arrow(pages))
    hits = cdx_prefix_lookup(cdx, "org,example,a)", k=10)
    assert hits["surt"].to_pylist() == [
        "org,example,a)/p1",
        "org,example,a)/p2",
    ]
    assert hits["n_captures"].to_pylist() == [2, 1]
    assert hits["first_ts"].to_pylist() == [1_000_000, 2_000_000]
    assert hits["last_ts"].to_pylist() == [5_000_000, 2_000_000]
    # the wider host range catches b. too
    all_org = cdx_prefix_lookup(cdx, "org,example,", k=10)
    assert len(all_org) == 3
