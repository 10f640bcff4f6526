"""Sitemap source: XML parse (namespace, escaping), frontier anti-join."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.sources.sitemap import (
    parse_sitemap,
    read_sitemaps,
    uncrawled_frontier,
    write_sitemap,
)


def test_parse_sitemap_namespace_and_escaping(tmp_path):
    p = str(tmp_path / "s.xml")
    urls = ["https://h/x?a=1&b=2", "https://h/y"]
    write_sitemap(p, urls, ["2024-01-02", "2024-03-04"])
    t = parse_sitemap(open(p, "rb").read())
    assert t["url"].to_pylist() == urls  # & escaped then unescaped by ET
    assert [str(d) for d in t["lastmod"].to_pylist()] == ["2024-01-02", "2024-03-04"]


def test_uncrawled_frontier_anti_join(tmp_path):
    p = str(tmp_path / "s.xml")
    adv = [f"https://h/{i}" for i in range(20)]
    write_sitemap(p, adv, ["2024-01-01"] * 20)
    crawled = ray.data.from_arrow(
        pa.table({"url": pa.array([f"https://h/{i}" for i in range(0, 20, 2)])})
    )
    out = uncrawled_frontier(read_sitemaps(p), crawled, n_buckets=4)
    got = sorted(
        pa.concat_tables(
            [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
        )["url"].to_pylist()
    )
    assert got == sorted(f"https://h/{i}" for i in range(1, 20, 2))
