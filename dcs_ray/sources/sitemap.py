"""Sitemap (sitemaps.org XML) source and crawl-frontier diff.

The discovery side of a crawl pipeline: each host publishes a
``sitemap.xml`` (``<urlset><url><loc>…</loc><lastmod>…</lastmod>``);
the scheduler diffs the advertised url set against what was actually
crawled to get the UNCRAWLED FRONTIER (and recrawl candidates whose
lastmod is newer than the stored crawl).

Scale shape: sitemaps are read one-file-per-block (a host's sitemap is
bounded at 50k urls by the spec, so a file is a natural block); the
frontier diff is a bucketed hash anti-join — url text never crosses
the exchange twice, and no driver-side url set is ever built.

Parsing uses stdlib ``xml.etree`` (dependency-free); the writer exists
for deterministic fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SITEMAP_SCHEMA = pa.schema([("url", pa.string()), ("lastmod", pa.date32())])


def write_sitemap(path: str, urls: list[str], lastmods: list[str]) -> int:
    """Write one sitemaps.org urlset file. ``lastmods`` are ISO dates."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    ]
    for u, lm in zip(urls, lastmods):
        u = (
            u.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        parts.append(f"  <url><loc>{u}</loc><lastmod>{lm}</lastmod></url>\n")
    parts.append("</urlset>\n")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    return len(urls)


def parse_sitemap(buf: bytes) -> pa.Table:
    """One sitemap file's bytes → (url, lastmod) rows."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(buf.decode("utf-8"))
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    urls: list[str] = []
    lastmods: list[str] = []
    for el in root.findall(f"{ns}url"):
        loc = el.find(f"{ns}loc")
        lm = el.find(f"{ns}lastmod")
        if loc is None or loc.text is None:
            continue
        urls.append(loc.text.strip())
        lastmods.append((lm.text or "").strip() if lm is not None else "")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "lastmod": pc.strptime(
                pa.array(lastmods, pa.string()), format="%Y-%m-%d", unit="s"
            ).cast(pa.date32()),
        }
    )


def read_sitemaps(paths: str | list[str]) -> ray.data.Dataset:
    """Dataset of (url, lastmod) from sitemap XML files, one file per
    read block (spec-bounded at 50k urls/file)."""
    files = ray.data.read_binary_files(paths)

    def parse_batch(b: pa.Table) -> pa.Table:
        tables = [parse_sitemap(buf.as_py()) for buf in b["bytes"]]
        return (
            pa.concat_tables(tables)
            if tables
            else SITEMAP_SCHEMA.empty_table()
        )

    return files.map_batches(parse_batch, batch_format="pyarrow", batch_size=1)


def uncrawled_frontier(
    sitemap: ray.data.Dataset,
    crawled: ray.data.Dataset,
    url_col: str = "url",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Urls a sitemap advertises that the crawl has NOT fetched — a
    bucketed hash anti-join: both sides tag rows with a url-hash bucket,
    one groupby co-locates each bucket, and inside a bucket a vectorized
    membership test drops advertised urls present on the crawled side.
    No driver-side url set; buckets bound every group."""

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            h = pd.util.hash_array(b[url_col].to_pandas().to_numpy(dtype=object))
            out = {
                "url": b[url_col],
                "_bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "_side": pa.array(np.full(len(b), side, np.int8), pa.int8()),
            }
            if side == 0:
                out["lastmod"] = b["lastmod"]
            else:
                out["lastmod"] = pa.array([None] * len(b), pa.date32())
            return pa.table(out)

        return f

    both = sitemap.map_batches(tag(0), batch_format="pyarrow").union(
        crawled.map_batches(tag(1), batch_format="pyarrow")
    )

    def anti(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        urls = g["url"].combine_chunks()
        crawled_set = pc.unique(urls.filter(pa.array(side == 1)))
        adv = g.filter(pa.array(side == 0))
        keep = pc.invert(pc.is_in(adv["url"].combine_chunks(), value_set=crawled_set))
        return adv.filter(keep).select(["url", "lastmod"])

    return both.groupby("_bucket").map_groups(anti, batch_format="pyarrow")
