"""Common-Crawl-style pages source.

The engine's canonical input (per the north rule) is a Parquet table of
web pages with columns ``(url: string, warc_ts: timestamp, html: binary,
text: string, lang: string)``. No such table ships with the sandbox
testdata, so we synthesize one **deterministically** from the
``documents`` table of a given sf dir (doc_id → url/warc_ts; text →
html wrapper). The synthesis is a pure function of the documents rows,
so every run — at any parallelism — produces identical bytes.

``extract_text(html)`` is the pure extraction function whose output must
be byte-identical to the ``text`` column per url (the input_hint
invariant; this mirrors dcs's golden-bytes discipline in
``index/write_test.go:16-166``). It inverts the wrapper exactly:
find the ``<p>`` payload, unescape the three HTML entities we escape.

In the real 100 TB deployment this module is replaced by
``ray.data.read_parquet`` of actual WARC-derived Parquet; everything
downstream is format-agnostic.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed epoch
# every DUP_EVERY-th doc gets a second, older crawl of the same url with
# stale text — exercising the latest-crawl-wins dedup (the web analogue of
# dcs's newest-package-version filter, cmd/dcs-web/querymanager.go:688-747)
DUP_EVERY = 50


def page_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.org/doc/{doc_id:08d}"


_TOKEN_RE = re.compile(r"[a-z0-9]+")
# outlinks per page; targets are pure functions of doc_id so the link
# graph is replayable in SQL (see __ray_entry__'s link-edge CTEs)
LINKS_PER_DOC = 3


def page_tokens(text: str) -> list[str]:
    """Lowercase alnum tokens — same convention as the index tokenizer
    (``dcs_ray.tokenize``) and the oracles' regexp_split_to_array."""
    return _TOKEN_RE.findall(text.lower())


def page_links(doc_id: int, toks: list[str]) -> list[tuple[int, str]]:
    """Deterministic outlinks for a page: ``[(target_doc_id, anchor)]``.

    Targets ``d//2, d//3, d+41`` keep most links resolvable on a dense
    id space while ``d+41`` dangles near the corpus edge (a real web
    graph has both). Anchor text is two tokens of the SOURCE page's own
    body — anchors describe the target in the linker's words, which is
    exactly what anchor-text ranking exploits. Pure function of
    ``(doc_id, toks)``; the SQL oracles replay it from ``documents``."""
    if not toks:
        return []
    n = len(toks)
    targets = (doc_id // 2, doc_id // 3, doc_id + 41)
    return [
        (t, f"{toks[(doc_id + 5 * j) % n]} {toks[(doc_id + 5 * j + 1) % n]}")
        for j, t in enumerate(targets)
    ]


def render_html(text: str, doc_id: int) -> bytes:
    toks = page_tokens(text)
    title = f"doc {doc_id}" + (f" {toks[0]}" if toks else "")
    nav = "".join(
        f'<a href="/doc/{t:08d}">{a}</a>' for t, a in page_links(doc_id, toks)
    )
    body = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><nav>{nav}</nav><p>{body}</p></body></html>"
    ).encode()


def extract_text_one(html: bytes) -> str:
    """Pure extraction: html bytes → text, byte-identical to the source.
    The body escapes every ``<``, so the first literal ``<p>`` in the
    document is the payload start regardless of title/nav content."""
    s = html.decode()
    start = s.index("<p>") + 3
    end = s.rindex("</p>")
    body = s[start:end]
    return body.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: recompute ``text`` from ``html`` (S3 analogue:
    dcs's unpack step ``cmd/dcs-package-importer/importer.go:486-523`` —
    "raw bytes → indexable text"). Vectorized via Arrow kernels."""
    s = batch["html"].cast(pa.string())
    # strip everything up to the first literal '<p>' (body escapes '<',
    # so title/nav can never contain one) and the constant suffix
    inner = pc.replace_substring_regex(s, r"^.*?<p>", "")
    inner = pc.replace_substring_regex(inner, r"</p></body></html>$", "")
    for ent, ch in ((pa.scalar("&gt;"), ">"), (pa.scalar("&lt;"), "<"), (pa.scalar("&amp;"), "&")):
        inner = pc.replace_substring(inner, ent.as_py(), ch)
    cols = {name: batch[name] for name in batch.column_names if name != "text"}
    cols["text"] = inner
    return pa.table(cols).select(["url", "warc_ts", "html", "text", "lang"])


def synthesize_pages_table(documents: pa.Table) -> pa.Table:
    """Deterministic pages table from a documents table (pure function)."""
    doc_ids = documents["doc_id"].to_numpy()
    texts = documents["text"].to_pylist()
    langs = documents["lang"].to_pylist()
    sources = documents["source"].to_pylist()
    urls, ts, htmls, out_texts, out_langs = [], [], [], [], []
    for i in range(len(doc_ids)):
        d = int(doc_ids[i])
        u = page_url(sources[i], d)
        urls.append(u)
        ts.append(_BASE_TS_US + d * 1_000_000)
        htmls.append(render_html(texts[i], d))
        out_texts.append(texts[i])
        out_langs.append(langs[i])
        if d % DUP_EVERY == 0:
            stale = texts[i][: max(1, len(texts[i]) // 2)]
            urls.append(u)
            ts.append(_BASE_TS_US + d * 1_000_000 - 3_600_000_000)  # 1h earlier
            htmls.append(render_html(stale, d))
            out_texts.append(stale)
            out_langs.append(langs[i])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def read_pages(sf_dir: str, cols: list[str] | None = None) -> ray.data.Dataset:
    """Pages Dataset for an sf dir: read documents.parquet and synthesize
    per batch (keeps synthesis distributed and streaming — at scale this
    is just ``read_parquet(pages/)``).

    The source read is always pruned to the four columns synthesis
    needs; ``cols`` additionally projects the OUTPUT (callers that drop
    ``html`` shouldn't ship rendered bytes through the exchange — at
    scale this becomes ``read_parquet(pages/, columns=cols)``)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    if cols is None:
        return ds.map_batches(
            lambda b: synthesize_pages_table(b), batch_format="pyarrow",
            batch_size=2048,
        )
    return ds.map_batches(
        lambda b: synthesize_pages_table(b).select(cols),
        batch_format="pyarrow", batch_size=2048,
    )


def dedup_latest_crawl(
    pages: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Keep only the newest crawl per url (dcs newest-version semantics,
    ``querymanager.go:688-747``; exact dedup via hash-partition groupby).

    Bucketed vectorized: one group per url-hash BUCKET (bounded group
    count, not one Python call per url); inside a bucket a single
    lexsort (url, ts desc) + run-length head keeps the newest row of
    every url at once."""

    def with_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(b["url"].to_pandas().to_numpy(dtype=object))
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def newest_in_bucket(g: pa.Table) -> pa.Table:
        codes = (
            pc.dictionary_encode(g["url"].combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = (
            g["warc_ts"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((-ts, codes))
        c = codes[order]
        runs = np.concatenate(([0], np.flatnonzero(c[1:] != c[:-1]) + 1))
        keep = order[runs]
        return g.take(pa.array(np.sort(keep))).drop_columns(["_bucket"])

    return (
        pages.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(newest_in_bucket, batch_format="pyarrow")
    )


def sniff_decode(raw: bytes) -> tuple[str, str]:
    """(charset, text) for one raw html payload: utf-8 when the bytes
    validate, else the latin-1 single-byte fallback — the sniffing rule
    every crawler ships for the long tail of mislabeled pages."""
    try:
        return "utf-8", raw.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1", raw.decode("latin-1")


def transcode_batch(batch: pa.Table, col: str = "raw") -> pa.Table:
    """map_batches stage: (.., raw: binary) → (.., charset, text) with
    per-payload charset sniffing. Fast path: if the WHOLE batch casts
    to utf-8 (the overwhelming case on the modern web), no per-row
    work happens at all; only a mixed batch walks rows."""
    arr = batch[col].combine_chunks()
    try:
        texts = arr.cast(pa.string())
        charsets = pa.array(["utf-8"] * len(batch), pa.string())
    except pa.ArrowInvalid:
        cs, ts = [], []
        for p in arr:
            c, t = sniff_decode(p.as_py())
            cs.append(c)
            ts.append(t)
        charsets = pa.array(cs, pa.string())
        texts = pa.array(ts, pa.string())
    cols = {n: batch[n] for n in batch.column_names if n != col}
    cols["charset"] = charsets
    cols["text"] = texts
    return pa.table(cols)
