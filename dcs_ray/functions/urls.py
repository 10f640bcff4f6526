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


_CANON_PATTERN = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]+)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
# tracking params dropped by every major canonicalizer (Google's
# URL-normalization guidance / ClueWeb-style pipelines)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)"


def canonicalize_url_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "canonical_url"
) -> pa.Table:
    """Append the canonical form of ``url_col`` — the normalization a
    crawl dedup runs before grouping by URL. All Arrow/numpy kernels,
    including the per-row query-parameter sort (flatten → one global
    lexsort keyed (row, param) → rebuild):

    - scheme + host lowercased; leading ``www.`` stripped
    - default port stripped (``:80`` http, ``:443`` https)
    - fragment dropped
    - path: empty → ``/``; trailing slashes collapsed (root keeps one)
    - query: tracking params (utm_*/gclid/fbclid/msclkid/mc_eid/ref)
      and empty params dropped; the rest SORTED bytewise; ``?`` dropped
      if nothing survives
    """
    parts = pc.extract_regex(batch[url_col], pattern=_CANON_PATTERN)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(host, r":443$", ""),
            host,
        ),
    )
    path = pc.struct_field(parts, "path")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    path = pc.replace_substring_regex(path, r"^(.+?)/+$", r"\1")

    # --- query params: drop tracking/empty, sort survivors per row ---
    q = pc.struct_field(parts, "query").combine_chunks() if isinstance(
        pc.struct_field(parts, "query"), pa.ChunkedArray
    ) else pc.struct_field(parts, "query")
    q = q.fill_null("")
    lists = pc.split_pattern(q, pattern="&")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
    drop = pc.match_substring_regex(flat, TRACKING_PARAM_RE)
    keep = ~(
        pc.or_(drop, pc.equal(flat, "")).to_numpy(zero_copy_only=False)
    )
    kept_params = flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    kept_rows = row_idx[keep]
    order = np.lexsort((kept_params, kept_rows))
    kept_counts = np.bincount(kept_rows, minlength=len(lists)).astype(np.int64)
    offsets = np.zeros(len(lists) + 1, np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    sorted_lists = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(kept_params[order], pa.string())
    )
    joined = pc.binary_join(sorted_lists, "&")
    query = pc.if_else(
        pc.equal(joined, ""), pa.scalar(""), pc.binary_join_element_wise("?", joined, "")
    )

    canonical = pc.binary_join_element_wise(scheme, "://", host, path, query, "")
    return batch.append_column(out_col, canonical)


def canonicalize_urls(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: canonicalize_url_batch(b, url_col), batch_format="pyarrow"
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


def fetch_schedule(
    ds: "ray.data.Dataset", url_col: str = "url", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Politeness-partitioned fetch schedule for a crawl frontier: one
    fetch per host per time slot, so ``slot`` is each url's 0-based rank
    within its host (ordered by url for determinism) — the frontier
    scheduler every polite crawler runs (RFC 9309 §2.4 crawl-delay
    semantics generalized to slot indices). The fetch ORDER is then
    (slot, host, url): wave 0 hits every host once, wave 1 the second
    url of each host, …

    Bucketed vectorized: hosts hash into ``n_buckets`` groups (bounded
    group count), one lexsort per bucket ranks every host's urls at
    once — the same shape as ``dedup_latest_crawl``. Emits
    (url, host, slot)."""
    import pandas as pd

    def with_host_bucket(b: pa.Table) -> pa.Table:
        t = url_parse_batch(b, url_col)
        h = pd.util.hash_array(t["host"].to_pandas().to_numpy(dtype=object))
        return pa.table(
            {
                "url": t[url_col],
                "host": t["host"],
                "_bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def rank_in_bucket(g: pa.Table) -> pa.Table:
        codes = (
            pc.dictionary_encode(g["host"].combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        urls = g["url"].combine_chunks()
        order = pc.sort_indices(
            pa.table({"c": pa.array(codes), "u": urls}),
            sort_keys=[("c", "ascending"), ("u", "ascending")],
        ).to_numpy(zero_copy_only=False)
        c_sorted = codes[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(c_sorted[1:] != c_sorted[:-1]) + 1)
        )
        sizes = np.diff(np.concatenate((starts, [len(order)])))
        slot_sorted = np.arange(len(order)) - np.repeat(starts, sizes)
        slot = np.empty(len(order), np.int64)
        slot[order] = slot_sorted
        return pa.table(
            {"url": urls, "host": g["host"], "slot": pa.array(slot, pa.int64())}
        )

    return (
        ds.map_batches(with_host_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_in_bucket, batch_format="pyarrow")
    )


def surt_key_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "surt"
) -> pa.Table:
    """Append the SURT key (Sort-friendly URI Reordering Transform — the
    Internet Archive / Common Crawl CDX convention): scheme dropped,
    host lowercased and ``www.``-stripped, dot-labels REVERSED and
    comma-joined, then ``)`` and the path:
    ``https://www.example.org/a`` → ``org,example)/a``.  Reversing the
    host puts every subdomain of a registrable domain in one
    lexicographic range, which is what makes CDX prefix range scans
    (and host-level partitioning) work.

    Vectorized label reversal: split hosts on ``.``, then ONE global
    lexsort keyed (row, -label_position) rebuilds every list reversed —
    no per-row Python."""
    parts = pc.extract_regex(batch[url_col], pattern=_CANON_PATTERN)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    path = pc.struct_field(parts, "path")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    lists = pc.split_pattern(host, pattern=".")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    # a URL that doesn't match _CANON_PATTERN extracts a null host →
    # null list row. flatten() skips null rows, so count those rows as
    # 0 labels (empty reversed host) and let the null path null out the
    # final surt — mirroring canonicalize_url_batch's null propagation
    # instead of crashing on the NaN→int cast (ADVICE r4).
    counts = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    offsets = np.zeros(len(lists) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
    pos = np.arange(len(flat), dtype=np.int64) - offsets[row_idx]
    order = np.lexsort((-pos, row_idx))
    rev_lists = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(flat[order], pa.string())
    )
    rev_host = pc.binary_join(rev_lists, ",")
    surt = pc.binary_join_element_wise(rev_host, ")", path, "")
    return batch.append_column(out_col, surt)


def cdx_capture_index(
    pages: ray.data.Dataset, url_col: str = "url", ts_col: str = "warc_ts"
) -> ray.data.Dataset:
    """CDX-style capture index over a crawl: one row per SURT key with
    ``(surt, n_captures, first_ts, last_ts)``, timestamps as int64
    epoch-microseconds. The groupby key is the SURT, so re-crawls of
    one url collapse into one row regardless of which partition each
    capture arrived in; writing the result sorted by surt gives the
    range-scannable CDX layout (prefix lookup = one key range, the
    Common Crawl index API's access path)."""
    import ray.data.aggregate as agg

    def to_rows(b: pa.Table) -> pa.Table:
        s = surt_key_batch(b, url_col=url_col)
        ts = s[ts_col].cast(pa.int64())
        t = pa.table({"surt": s["surt"], "ts": ts})
        # malformed URLs surface as null surts — uncapturable, drop
        return t.filter(pc.is_valid(t["surt"]))

    rows = pages.map_batches(to_rows, batch_format="pyarrow")
    return rows.groupby("surt").aggregate(
        agg.Count(), agg.Min("ts"), agg.Max("ts")
    )


def cdx_prefix_lookup(
    cdx: ray.data.Dataset, prefix: str, k: int = 20
) -> "pa.Table":
    """Range scan of a CDX capture index: every key in
    ``[prefix, prefix+1)``, first ``k`` by surt ascending. On a sorted
    partitioned CDX this is a partition-pruned range read (the filter
    pushes down through Ray Data's Arrow filter); here it composes on
    the Dataset."""
    upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    hits = cdx.filter(
        expr=f"surt >= {prefix!r} and surt < {upper!r}"
    )
    t = pa.concat_tables(
        [pa.table(b) for b in hits.iter_batches(batch_format="pyarrow")]
    )
    t = t.sort_by("surt").slice(0, k)
    return pa.table(
        {
            "surt": t["surt"],
            "n_captures": t["count()"].cast(pa.int64()),
            "first_ts": t["min(ts)"].cast(pa.int64()),
            "last_ts": t["max(ts)"].cast(pa.int64()),
        }
    )


def write_cdx(
    cdx: ray.data.Dataset, out_dir: str, num_partitions: int = 16
) -> list[str]:
    """Persist a CDX capture index as surt-RANGE-partitioned sorted
    Parquet — the layout that makes prefix lookups partition-pruned
    file reads at 100 TB (the Common Crawl index is exactly this: one
    sorted shard per key range plus a secondary index of range bounds).

    Partition bounds come from a sampled quantile sketch of the surt
    keys (sample-sized driver state); each output file is sorted by
    surt and named ``cdx_{i:05d}.parquet``, so parquet column
    statistics give [min_surt, max_surt] per file and a range probe
    opens only intersecting files. Returns the file paths."""
    import os

    import pyarrow.parquet as pq_mod

    os.makedirs(out_dir, exist_ok=True)
    # the capture index is consumed three times below (count + bounds
    # sample + the partitioned write); it is key-space-sized — far
    # smaller than the crawl — so pinning it beats re-running the
    # groupby pipeline
    cdx = cdx.materialize()
    # Range bounds from a HASH-sampled subset of the keys. limit() would
    # take the head of the key-sorted groupby output — the
    # lexicographically smallest keys — putting every bound inside that
    # head and funneling the rest of the index into the last partition.
    # A deterministic content-hash gate samples uniformly across the key
    # space instead (driver state = ~100k strings max).
    from dcs_ray.functions.sketches import _hash64_column

    n_keys = cdx.count()
    rate = max(1, n_keys // 100_000)

    def sample_keys(b: pa.Table, _r=rate) -> pa.Table:
        surt = b["surt"].combine_chunks()
        if _r <= 1:
            return pa.table({"surt": surt})
        keep = (_hash64_column(surt) % np.uint64(_r)) == np.uint64(0)
        return pa.table({"surt": surt.filter(pa.array(keep))})

    sample = cdx.map_batches(sample_keys, batch_format="pyarrow")
    s = pa.concat_tables(
        [pa.table(b) for b in sample.iter_batches(batch_format="pyarrow")]
    )["surt"].to_numpy(zero_copy_only=False)
    s = np.sort(s)
    bounds = [
        s[int(len(s) * i / num_partitions)] for i in range(1, num_partitions)
    ] if len(s) else []

    def assign(b: pa.Table) -> pa.Table:
        surt = b["surt"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(np.array(bounds, dtype=object), surt, side="right")
        return b.append_column("__part", pa.array(part.astype(np.int64), pa.int64()))

    parts = cdx.map_batches(assign, batch_format="pyarrow")

    def write_group(g: pa.Table) -> pa.Table:
        pid = int(g["__part"][0].as_py())
        t = g.drop_columns(["__part"]).sort_by("surt")
        path = os.path.join(out_dir, f"cdx_{pid:05d}.parquet")
        pq_mod.write_table(t, path, row_group_size=8192)
        return pa.table({"path": pa.array([path], pa.string())})

    out = parts.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    paths = sorted(
        p
        for b in out.iter_batches(batch_format="pyarrow")
        for p in pa.table(b)["path"].to_pylist()
    )
    return paths


def cdx_lookup_dir(out_dir: str, prefix: str, k: int = 20) -> pa.Table:
    """Prefix range lookup against a :func:`write_cdx` directory:
    parquet FILE statistics prune to the files whose [min, max] surt
    range intersects [prefix, next(prefix)), then row-group stats prune
    inside the survivors — a range-sized read, never an index scan."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    hit_files = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, f)
        md = pq_mod.read_metadata(path)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # surt is the first column
            st = col.statistics
            if st is None:
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None or (hi >= prefix and lo < upper):
            hit_files.append(path)
    if not hit_files:
        return pa.table(
            {
                "surt": pa.array([], pa.string()),
                "n_captures": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
            }
        )
    dset = pads.dataset(hit_files)
    t = dset.to_table(
        filter=(pads.field("surt") >= prefix) & (pads.field("surt") < upper)
    )
    t = t.sort_by("surt").slice(0, k)
    return pa.table(
        {
            "surt": t["surt"],
            "n_captures": t["count()"].cast(pa.int64()),
            "first_ts": t["min(ts)"].cast(pa.int64()),
            "last_ts": t["max(ts)"].cast(pa.int64()),
        }
    )
