"""URL operators for web-corpus pipelines: vectorized URL parsing and
per-host aggregation.

Web-scale crawls group by host constantly — per-host page counts,
byte budgets, quality means, robots/politeness buckets. Both operators
here are shuffle-light:

- ``url_parse_batch``: ONE RE2 ``extract_regex`` pass per batch — no
  per-row Python, no urllib. Produces (scheme, host, path, tld).
- ``host_stats``: per-batch combiner partials keyed by host, so the
  groupby exchange carries |hosts-per-batch| rows, never |pages|. At
  100 TB the host key space (~10^8) is orders of magnitude below the
  page count (~10^12), and host is also the natural partitioning key
  to reuse downstream (politeness, per-host caps, domain-level dedup).

Reference parity: dcs groups results per source package
(internal/dcs-web/querymanager.go per-package grouping); host is the
web-corpus analogue of the package key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .relational import combiner_groupby

URL_PATTERN = r"^(?P<scheme>https?)://(?P<host>[^/?#]+)(?P<path>/[^?#]*)?"


def url_parse_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append (scheme, host, path, tld) parsed from ``url_col`` — one
    vectorized RE2 extract; tld = last dot-label of the host."""
    parts = pc.extract_regex(batch[url_col], pattern=URL_PATTERN)
    host = pc.struct_field(parts, "host")
    path = pc.struct_field(parts, "path")
    # RE2 leaves an unmatched optional group as "" (not null)
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    # last dot-label of the host, via an end-anchored extract
    tld = pc.struct_field(
        pc.extract_regex(host, pattern=r"(?P<tld>[^.]+)$"), "tld"
    )
    return batch.append_column("scheme", pc.struct_field(parts, "scheme")) \
                .append_column("host", host) \
                .append_column("path", path) \
                .append_column("tld", tld)


def parse_urls(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: url_parse_batch(b, url_col), batch_format="pyarrow"
    )


def host_stats(
    pages: ray.data.Dataset, url_col: str = "url", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-host page count and total text chars: (host, n_pages,
    total_text_chars), exchange bounded by |hosts per batch|."""

    def partial(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(b[url_col], pattern=URL_PATTERN)
        host = pc.struct_field(parts, "host")
        chars = pc.utf8_length(b[text_col]).cast(pa.int64())
        return pa.table({"host": host, "total_text_chars": chars})

    agg = combiner_groupby(
        pages.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        ["total_text_chars"],
        count_col="n_pages",
    )

    def order_cols(b: pa.Table) -> pa.Table:
        return b.select(["host", "n_pages", "total_text_chars"])

    return agg.map_batches(order_cols, batch_format="pyarrow")
