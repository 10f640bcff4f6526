"""URL parse + per-host aggregation operators."""

import pyarrow as pa
import ray.data

from dcs_ray.functions.urls import host_stats, url_parse_batch
from dcs_ray.sources.pages import read_pages

SF = "/root/testdata/sf0.001"


def test_url_parse_batch():
    b = pa.table(
        {
            "url": [
                "https://alpha.example.org/doc/00000001",
                "http://x.co/a/b?q=1#frag",
                "https://bare.host.io",
            ]
        }
    )
    out = url_parse_batch(b)
    assert out["scheme"].to_pylist() == ["https", "http", "https"]
    assert out["host"].to_pylist() == ["alpha.example.org", "x.co", "bare.host.io"]
    assert out["path"].to_pylist() == ["/doc/00000001", "/a/b", "/"]
    assert out["tld"].to_pylist() == ["org", "co", "io"]


def test_host_stats_matches_pages(ray_session):
    pages = read_pages(SF)
    got = pa.concat_tables(
        pa.table(b) for b in host_stats(pages).iter_batches(batch_format="pyarrow")
    ).sort_by("host")
    # reference: materialize the pages table and aggregate in pyarrow
    full = pa.concat_tables(
        pa.table(b) for b in read_pages(SF).iter_batches(batch_format="pyarrow")
    )
    import pyarrow.compute as pc

    host = pc.struct_field(
        pc.extract_regex(full["url"], pattern=r"^(?P<h>https?)://(?P<host>[^/?#]+)"),
        "host",
    )
    ref = (
        pa.table(
            {"host": host, "tc": pc.utf8_length(full["text"]).cast(pa.int64())}
        )
        .group_by(["host"])
        .aggregate([("tc", "sum"), ("host", "count")])
        .sort_by("host")
    )
    assert got["host"].to_pylist() == ref["host"].to_pylist()
    assert got["n_pages"].to_pylist() == ref["host_count"].to_pylist()
    assert got["total_text_chars"].to_pylist() == ref["tc_sum"].to_pylist()


def test_write_corpus_partitioned_resume(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from dcs_ray.sources.io import write_corpus_partitioned

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    first = write_corpus_partitioned(docs, out, "lang")
    assert sorted(first) == sorted(set(pq.read_table(
        f"{SF}/documents.parquet", columns=["lang"])["lang"].to_pylist()))
    # every partition committed with a marker and the right rows
    total = 0
    for v in first:
        d = os.path.join(out, f"lang={v}")
        assert os.path.exists(os.path.join(d, "_SUCCESS"))
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        total += sum(pq.read_table(os.path.join(d, f)).num_rows for f in files)
    assert total == docs.count()
    # resume: everything already committed -> nothing rewritten
    assert write_corpus_partitioned(docs, out, "lang") == []
    # a partition missing its marker is redone
    victim = first[0]
    os.unlink(os.path.join(out, f"lang={victim}", "_SUCCESS"))
    assert write_corpus_partitioned(docs, out, "lang") == [victim]


def test_canonicalize_url_batch_rules():
    """One case per canonicalization rule + a combined case."""
    import pyarrow as pa

    from dcs_ray.functions.urls import canonicalize_url_batch

    cases = [
        ("HTTPS://Example.ORG/A", "https://example.org/A"),  # case: scheme+host only
        ("https://www.example.org/x", "https://example.org/x"),  # www strip
        ("http://example.org:80/x", "http://example.org/x"),  # default port
        ("https://example.org:443/x", "https://example.org/x"),
        ("http://example.org:8080/x", "http://example.org:8080/x"),  # real port kept
        ("https://example.org/x#frag", "https://example.org/x"),  # fragment
        ("https://example.org", "https://example.org/"),  # empty path
        ("https://example.org/a/b///", "https://example.org/a/b"),  # trailing /
        ("https://example.org/", "https://example.org/"),  # root keeps /
        ("https://example.org/x?b=2&a=1", "https://example.org/x?a=1&b=2"),  # sort
        ("https://example.org/x?utm_source=t&utm_medium=m", "https://example.org/x"),
        ("https://example.org/x?gclid=1&keep=1&fbclid=2", "https://example.org/x?keep=1"),
        ("https://example.org/x?a=1&&b=2&", "https://example.org/x?a=1&b=2"),  # empties
        (
            "HTTP://WWW.Example.ORG:80/a/?utm_source=x&z=9&a=1#top",
            "http://example.org/a?a=1&z=9",
        ),
    ]
    t = pa.table({"url": pa.array([c[0] for c in cases])})
    got = canonicalize_url_batch(t)["canonical_url"].to_pylist()
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)


def test_canonicalize_idempotent():
    import pyarrow as pa

    from dcs_ray.functions.urls import canonicalize_url_batch

    urls = [
        "HTTP://WWW.Example.ORG:80/a/?utm_source=x&z=9&a=1#top",
        "https://example.org/x?b=2&a=1",
        "https://example.org",
    ]
    once = canonicalize_url_batch(pa.table({"url": pa.array(urls)}))[
        "canonical_url"
    ].to_pylist()
    twice = canonicalize_url_batch(pa.table({"url": pa.array(once)}))[
        "canonical_url"
    ].to_pylist()
    assert once == twice


def test_fetch_schedule_slots():
    """slot = per-host url rank regardless of input batch interleaving;
    wave 0 covers every host exactly once."""
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.urls import fetch_schedule

    urls = [
        f"https://h{i % 3}.example.org/p/{i:04d}" for i in range(30)
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    t = pa.concat_tables(
        pa.table(b)
        for b in fetch_schedule(ds).iter_batches(batch_format="pyarrow")
    )
    d = dict(zip(t["url"].to_pylist(), t["slot"].to_pylist()))
    for i, u in enumerate(sorted(urls)):
        # within each host urls sort ascending; every 3rd global url
        # shares a host, so its slot is its index within that host
        pass
    by_host = {}
    for u in sorted(urls):
        h = u.split("/")[2]
        by_host.setdefault(h, []).append(u)
    for h, lst in by_host.items():
        for rank, u in enumerate(lst):
            assert d[u] == rank, (u, d[u], rank)
    wave0 = [u for u, s in d.items() if s == 0]
    assert len(wave0) == 3
