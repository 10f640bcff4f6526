"""DUST: Different URLs with Similar Text (Bar-Yossef, Keidar &
Schonfeld, WWW '07) — mine URL-normalization rules from crawl data.

A crawler that knows ``?sessionid=...`` is content-irrelevant on a
host can collapse duplicate URLs BEFORE fetching. The public
algorithm's parameter-rule slice: a candidate rule "drop query
parameter k" is SUPPORTED by every pair of crawled URLs that become
equal when k is dropped AND carry identical content, and REFUTED by
any such pair with differing content. Rules with enough support and
no refutation are safe rewrites.

Scale shape: one vectorized pass parses URLs and emits
(stripped_url, param_key, content_hash) rows — content itself never
crosses an exchange, only its 64-bit hash (``content_hash_rows``).
A ``groupby(param_key, stripped_url)`` then counts, per bucket, the
distinct raw URLs and distinct content hashes; a key's support is the
number of buckets that collapse ≥2 raw URLs into one content hash,
its violations the buckets where hashes differ. Both counts fold from
bucket-level partials — no pairwise joins anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.functions.textstats import content_hash_rows


def _strip_param(urls: pa.Array, key: str) -> pa.Array:
    """Remove ``key=value`` from each URL's query string, vectorized:
    ``(?<=[?&])key=[^&]*&?`` then tidy a dangling '?'/'&' — the same
    two regexp_replace calls the SQL oracle applies.  Keys are
    restricted to ``[A-Za-z0-9_-]+`` so the interpolation below cannot
    change the regex's shape (a key like ``a.b`` or ``id+`` would
    silently match unintended parameters and diverge from the oracle)."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z0-9_-]+", key):
        raise ValueError(f"dust param key must be [A-Za-z0-9_-]+: {key!r}")
    out = pc.replace_substring_regex(
        urls, pattern=rf"(?:([?&]){key}=[^&]*)", replacement=r"\1"
    )
    out = pc.replace_substring_regex(
        out, pattern=r"[?&]+$", replacement=""
    )
    out = pc.replace_substring_regex(
        out, pattern=r"\?&", replacement="?"
    )
    out = pc.replace_substring_regex(
        out, pattern=r"&&", replacement="&"
    )
    return out


def dust_param_rules(
    pages: ray.data.Dataset,
    param_keys: list[str],
    url_col: str = "url",
    text_col: str = "text",
    min_support: int = 2,
) -> pa.Table:
    """Mine drop-parameter DUST rules → (param_key, support,
    violations, valid) sorted by key.

    support    = buckets (stripped url) where the rule merges ≥2
                 distinct raw URLs and ALL their contents hash equal
    violations = buckets where merged URLs carry ≠ contents
    valid      = support ≥ min_support AND violations = 0
    """

    def emit(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b[text_col])
        urls = b[url_col]
        parts = []
        for key in param_keys:
            stripped = _strip_param(urls, key)
            changed = pc.not_equal(stripped, urls)
            t = pa.table(
                {
                    "pkey": pa.array(
                        [key] * len(b), pa.string()
                    ),
                    "bucket": stripped,
                    "raw": urls,
                    "h": pa.array(h, pa.uint64()),
                }
            ).filter(changed)
            parts.append(t)
            # the unchanged side of each bucket must participate too:
            # a URL already in stripped form anchors the pair
            anchor = pa.table(
                {
                    "pkey": pa.array([key] * len(b), pa.string()),
                    "bucket": urls,
                    "raw": urls,
                    "h": pa.array(h, pa.uint64()),
                }
            )
            parts.append(anchor)
        return pa.concat_tables(parts)

    rows = pages.select_columns([url_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        n_raw = len(pc.unique(g["raw"]))
        n_h = len(pc.unique(g["h"]))
        merged = n_raw >= 2
        return pa.table(
            {
                "pkey": g["pkey"].slice(0, 1),
                "supp": pa.array(
                    [1 if merged and n_h == 1 else 0], pa.int64()
                ),
                "viol": pa.array(
                    [1 if merged and n_h > 1 else 0], pa.int64()
                ),
            }
        )

    per = rows.groupby(["pkey", "bucket"]).map_groups(
        per_bucket, batch_format="pyarrow"
    )
    agg = per.groupby("pkey").sum(["supp", "viol"])
    t = pa.concat_tables(
        [pa.table(b) for b in agg.iter_batches(batch_format="pyarrow")]
    ).sort_by("pkey")
    supp = t["sum(supp)"].to_numpy().astype(np.int64)
    viol = t["sum(viol)"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "param_key": t["pkey"],
            "support": pa.array(supp, pa.int64()),
            "violations": pa.array(viol, pa.int64()),
            "valid": pa.array(
                (supp >= min_support) & (viol == 0), pa.bool_()
            ),
        }
    )
