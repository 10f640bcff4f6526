"""WARC source: read Common-Crawl-style ``.warc`` / ``.warc.gz`` files
into the canonical pages schema.

Dependency-free ISO 28500 (WARC/1.0–1.1) subset, the container Common
Crawl actually ships: a file is a sequence of records, each

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...                  (WARC headers)
    \\r\\n
    <Content-Length bytes of content>          (block)
    \\r\\n\\r\\n                                (record separator)

``response`` records carry an HTTP response in the block (status line +
HTTP headers + CRLFCRLF + payload); the payload is the page's raw HTML.
Common Crawl gzips each record as its OWN gzip member so readers can
split files without decompressing everything; stdlib ``zlib`` inflates
a multi-member stream transparently, which is all a sequential
per-file reader needs.

Scale shape: the parallelism unit is the FILE (Common Crawl segments
are ~1 GiB; a 100 TB crawl is ~10^5 files — plenty of blocks for a
256-node cluster). ``read_warc`` is ``read_binary_files`` (streaming,
one block per file) → a flat-map parse stage; per-record header
parsing is a few ``bytes.find`` calls — decompression and downstream
tokenization dominate, and those are vectorized.

Reference parity: the role of dcs's mirror-fetch + unpack ingest
(``cmd/dcs-package-importer/importer.go:486-523`` — "raw archive bytes
→ indexable text"), re-expressed over the web-crawl container; the
extracted text feeds the same byte-identity invariant
(``sources/pages.py::extract_text_batch``).
"""

from __future__ import annotations

import gzip
import io
import zlib

import pyarrow as pa
import ray.data

_CRLF2 = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# write (fixtures / export)
# ---------------------------------------------------------------------------


def _warc_date(ts_us: int) -> bytes:
    """WARC-Date with microseconds (WARC 1.1 allows fractional seconds)
    so timestamps round-trip exactly."""
    import datetime as _dt

    d = _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc)
    return d.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode()


def _parse_warc_date(v: bytes) -> int:
    import datetime as _dt

    s = v.decode()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    d = _dt.datetime.strptime(s, fmt).replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def _record(warc_type: bytes, headers: list[tuple[bytes, bytes]], block: bytes) -> bytes:
    out = [b"WARC/1.0\r\n", b"WARC-Type: ", warc_type, b"\r\n"]
    for k, v in headers:
        out += [k, b": ", v, b"\r\n"]
    out += [b"Content-Length: ", str(len(block)).encode(), b"\r\n\r\n", block, _CRLF2]
    return b"".join(out)


def write_warc(
    path: str,
    pages: pa.Table,
    compress: bool = True,
    crawl_id: str = "dcs-ray-synthetic",
) -> int:
    """Write pages rows (``url``, ``warc_ts``, ``html``) as a WARC file;
    one gzip member PER RECORD when ``compress`` (the Common Crawl
    layout). Returns the number of response records written."""
    members = warc_member_bytes(pages, filename=path.rsplit("/", 1)[-1],
                                crawl_id=crawl_id)
    with open(path, "wb") as f:
        for m in members:
            f.write(gzip.compress(m, mtime=0) if compress else m)
    return len(members) - 1  # minus warcinfo


def warc_member_bytes(
    pages: pa.Table, filename: str = "f.warc", crawl_id: str = "dcs-ray-synthetic"
) -> list[bytes]:
    """Uncompressed member payloads for a pages table: one warcinfo
    record followed by one response record per row (the Common Crawl
    one-record-per-gzip-member layout when each is compressed)."""
    urls = pages["url"].to_pylist()
    ts = pages["warc_ts"].cast(pa.int64()).to_pylist()  # timestamp(us) → µs
    htmls = pages["html"].to_pylist()
    out = [
        _record(
            b"warcinfo",
            [(b"WARC-Filename", filename.encode())],
            b"software: dcs_ray\r\nisPartOf: " + crawl_id.encode() + b"\r\n",
        )
    ]
    for u, t, h in zip(urls, ts, htmls):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: " + str(len(h)).encode() + b"\r\n\r\n" + h
        )
        out.append(
            _record(
                b"response",
                [
                    (b"WARC-Target-URI", u.encode()),
                    (b"WARC-Date", _warc_date(t)),
                    (b"Content-Type", b"application/http; msgtype=response"),
                ],
                http,
            )
        )
    return out


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _inflate_all(buf: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; passthrough for
    plain WARC bytes."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    out = io.BytesIO()
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(buf[pos:]))
        rest = d.unused_data
        if not rest:
            break
        pos = len(buf) - len(rest)
    return out.getvalue()


def parse_warc(buf: bytes) -> pa.Table:
    """Parse one WARC file's bytes → (url, warc_ts, html) rows for every
    ``response`` record. Tolerates warcinfo/request/metadata records."""
    data = _inflate_all(buf)
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if data.startswith(b"\r\n", pos):  # inter-record padding
            pos += 2
            continue
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        header = data[pos:hdr_end]
        if not header.startswith(b"WARC/"):
            raise ValueError(f"warc: bad record header at byte {pos}")
        fields: dict[bytes, bytes] = {}
        for line in header.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields[b"content-length"])
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get(b"warc-type") == b"response":
            body_at = block.find(_CRLF2)  # skip the HTTP response header
            htmls.append(block[body_at + 4 :] if body_at >= 0 else block)
            urls.append(fields[b"warc-target-uri"].decode())
            ts.append(_parse_warc_date(fields[b"warc-date"]))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Dataset of (url, warc_ts, html) from ``.warc`` / ``.warc.gz``
    files; one read block per file (Common Crawl segment granularity),
    records flat-mapped out per block."""
    files = ray.data.read_binary_files(paths)

    def parse_batch(b: pa.Table) -> pa.Table:
        tables = [parse_warc(buf.as_py()) for buf in b["bytes"]]
        return pa.concat_tables(tables) if tables else parse_warc(b"")

    return files.map_batches(parse_batch, batch_format="pyarrow", batch_size=1)


def parse_warc_tolerant(buf: bytes) -> tuple[pa.Table, int]:
    """Parse with PER-MEMBER fault isolation: a gzip member that fails
    to inflate or parse is counted and skipped by scanning to the next
    member magic — one mangled record cannot kill a whole segment file
    (the operational property a 100-TB ingest needs; strict
    :func:`parse_warc` is the fixture/golden path). Plain (uncompressed)
    input falls back to record-level resync on the ``WARC/`` marker.
    Returns ``(rows, n_bad_members)``."""
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
        }
    )
    if buf[:2] == b"\x1f\x8b":
        tables = []
        n_bad = 0
        pos, n = 0, len(buf)
        while pos < n:
            try:
                d = zlib.decompressobj(wbits=31)
                member = d.decompress(buf[pos:])
                if not d.eof:
                    raise ValueError("warc: truncated gzip member")
                tables.append(parse_warc(member))
                rest = d.unused_data
                pos = n - len(rest) if rest else n
            except Exception:
                n_bad += 1
                nxt = buf.find(b"\x1f\x8b\x08", pos + 3)
                pos = nxt if nxt >= 0 else n
        t = pa.concat_tables(tables) if tables else empty
        return t, n_bad
    # plain bytes: resync record-by-record on the header marker
    tables = []
    n_bad = 0
    pos, n = 0, len(buf)
    while pos < n:
        nxt = buf.find(b"WARC/", pos)
        if nxt < 0:
            break
        end = buf.find(b"\r\nWARC/", nxt + 5)
        chunk = buf[nxt : end + 2 if end >= 0 else n]
        try:
            tables.append(parse_warc(chunk))
        except Exception:
            n_bad += 1
        pos = (end + 2) if end >= 0 else n
    t = pa.concat_tables(tables) if tables else empty
    return t, n_bad
