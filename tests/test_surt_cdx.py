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


def test_partitioned_cdx_write_and_pruned_lookup(ray_session, tmp_path):
    """The scale path: write_cdx produces surt-range-partitioned sorted
    parquet; cdx_lookup_dir answers the same prefix query from file +
    row-group statistics, opening only intersecting files."""
    import os

    from dcs_ray.functions.urls import cdx_lookup_dir, write_cdx
    from dcs_ray.sources.pages import read_pages

    SF = "/root/testdata/sf0.001"
    cdx = cdx_capture_index(read_pages(SF))
    want = cdx_prefix_lookup(cdx, "org,example,src1)", k=20)

    out = str(tmp_path / "cdx")
    paths = write_cdx(cdx_capture_index(read_pages(SF)), out, num_partitions=8)
    assert len(paths) >= 2  # real partitioning happened
    got = cdx_lookup_dir(out, "org,example,src1)", k=20)
    assert got.equals(want)
    # every file is internally sorted and file ranges are disjoint-ish:
    # a narrow prefix must NOT need every file
    import pyarrow.parquet as pq

    spans = []
    for p in paths:
        t = pq.read_table(p, columns=["surt"])
        v = t["surt"].to_pylist()
        assert v == sorted(v)
        spans.append((v[0], v[-1]))
    upper = "org,example,src1*"
    hit = [1 for lo, hi in spans if hi >= "org,example,src1)" and lo < upper]
    assert len(hit) < len(paths)


def test_surt_fuzz_matches_reference():
    """Differential fuzz of the vectorized label reversal against a
    per-row Python reference over random hosts/paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text(alphabet="abcz09", min_size=1, max_size=6)

    def brute(url: str) -> str:
        rest = url.split("://", 1)[1]
        host, _, path = rest.partition("/")
        host = host.lower()
        if host.startswith("www."):
            host = host[4:]
        return ",".join(reversed(host.split("."))) + ")/" + path

    @settings(max_examples=100, deadline=None)
    @given(
        hosts=st.lists(
            st.lists(label, min_size=1, max_size=5), min_size=1, max_size=20
        ),
        path=st.text(alphabet="abc/xy", max_size=10),
    )
    def run(hosts, path):
        urls = ["https://" + ".".join(h) + "/" + path for h in hosts]
        got = _surt(urls)
        assert got == [brute(u) for u in urls]

    run()


def test_malformed_url_null_surt(ray_session):
    """A URL that doesn't match the canonical pattern null-propagates
    (mirroring canonicalize_url_batch) instead of crashing the whole
    batch on a NaN→int cast, and cdx_capture_index drops the
    uncapturable rows (ADVICE r4)."""
    out = surt_key_batch(
        pa.table(
            {
                "url": pa.array(
                    ["https://ok.example.org/p", "not a url", "::::", ""],
                    pa.string(),
                )
            }
        )
    )
    assert out["surt"].to_pylist() == ["org,example,ok)/p", None, None, None]

    ts = pa.timestamp("us")
    pages = pa.table(
        {
            "url": pa.array(["https://ok.example.org/p", "garbage"], pa.string()),
            "warc_ts": pa.array([1_000_000, 2_000_000], ts),
        }
    )
    cdx = cdx_capture_index(ray.data.from_arrow(pages))
    t = pa.concat_tables(
        [pa.table(b) for b in cdx.iter_batches(batch_format="pyarrow")]
    )
    assert t["surt"].to_pylist() == ["org,example,ok)/p"]
