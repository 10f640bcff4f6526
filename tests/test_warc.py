"""WARC container source: round-trip + ingest-to-index equivalence.

The WARC path must be a drop-in ingest alternative: pages → write_warc
→ read_warc → extract_text must reproduce the canonical pages table
byte-identically (url, warc_ts to the microsecond, html, text).
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from dcs_ray.sources.pages import extract_text_batch, synthesize_pages_table
from dcs_ray.sources.warc import parse_warc, read_warc, write_warc

SF = "/root/testdata/sf0.001"


def _pages(n=60) -> pa.Table:
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, n)
    return synthesize_pages_table(docs)


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    pages = _pages()
    for compress in (False, True):
        p = str(tmp_path / f"a.warc{'.gz' if compress else ''}")
        nw = write_warc(p, pages, compress=compress)
        assert nw == len(pages)
        got = parse_warc(open(p, "rb").read())
        assert got["url"].to_pylist() == pages["url"].to_pylist()
        assert got["warc_ts"].to_pylist() == pages["warc_ts"].to_pylist()
        assert got["html"].to_pylist() == pages["html"].to_pylist()


def test_warc_gzip_members_are_individually_decodable(tmp_path):
    """Common Crawl layout: every record its own gzip member, so a
    reader can split a file at member boundaries without inflating it
    all. Decode the second member alone and find a WARC header."""
    import zlib

    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _pages(5), compress=True)
    buf = open(p, "rb").read()
    # find the 2nd member boundary by inflating the 1st
    d = zlib.decompressobj(wbits=31)
    d.decompress(buf)
    second = buf[len(buf) - len(d.unused_data) :]
    rec = zlib.decompressobj(wbits=31).decompress(second)
    assert rec.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: response" in rec


def test_read_warc_dataset_extracts_byte_identical_text(ray_session, tmp_path):
    """Multi-file Dataset read → extract stage reproduces the canonical
    pages table byte-for-byte (the input_hint invariant through the
    container format)."""
    pages = _pages(90)  # 92 rows: two urls carry a second (stale) crawl
    step = (len(pages) + 2) // 3
    for i in range(3):
        write_warc(str(tmp_path / f"part-{i}.warc.gz"), pages.slice(i * step, step))
    ds = read_warc(sorted(glob.glob(str(tmp_path / "*.warc.gz"))))
    extracted = ds.map_batches(
        lambda b: extract_text_batch(b.append_column("lang", pa.array(["en"] * len(b)))),
        batch_format="pyarrow",
    )
    got = (
        pa.concat_tables(
            [pa.table(b) for b in extracted.iter_batches(batch_format="pyarrow")]
        )
        .sort_by([("url", "ascending"), ("warc_ts", "ascending")])
        .select(["url", "warc_ts", "html", "text"])
    )
    want = pages.sort_by([("url", "ascending"), ("warc_ts", "ascending")]).select(["url", "warc_ts", "html", "text"])
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["warc_ts"].to_pylist() == want["warc_ts"].to_pylist()
    assert got["html"].to_pylist() == want["html"].to_pylist()
    assert got["text"].to_pylist() == want["text"].to_pylist()


def test_parse_warc_tolerates_non_response_records(tmp_path):
    p = str(tmp_path / "a.warc")
    pages = _pages(3)
    write_warc(p, pages, compress=False)  # includes a warcinfo record
    got = parse_warc(open(p, "rb").read())
    assert len(got) == len(pages)


def test_parse_warc_tolerant_member_isolation():
    """A corrupt gzip member is counted and skipped; every other record
    survives bit-exact (per-member fault isolation)."""
    import gzip

    from dcs_ray.sources.warc import parse_warc_tolerant, warc_member_bytes

    pages = _pages(12)  # 13 rows: doc 0 gets a stale dup crawl
    members = warc_member_bytes(pages)
    gz = []
    for j, m in enumerate(members):
        c = bytearray(gzip.compress(m, mtime=0))
        if j in (2, 9):
            c[len(c) // 2] ^= 0xFF
        gz.append(bytes(c))
    t, n_bad = parse_warc_tolerant(b"".join(gz))
    assert n_bad == 2
    want = pages.take([i for i in range(len(pages)) if i not in (1, 8)])
    assert t["url"].to_pylist() == want["url"].to_pylist()
    assert t["html"].to_pylist() == want["html"].to_pylist()


def test_parse_warc_tolerant_plain_resync():
    """Uncompressed input: destroying one record's WARC/ magic resyncs
    on the next intact marker — the parse loses only the records up to
    it (here: the preceding record's chunk absorbs the junk), never the
    whole file."""
    from dcs_ray.sources.warc import parse_warc_tolerant, warc_member_bytes

    pages = _pages(4)  # 5 rows (doc 0 stale dup)
    members = warc_member_bytes(pages)
    blob = b"".join(members)
    # destroy the SECOND response record's magic (members: info, r1..r5)
    r2_at = len(members[0]) + len(members[1])
    blob = blob[:r2_at] + b"XXXXX" + blob[r2_at + 5 :]
    t, n_bad = parse_warc_tolerant(blob)
    # r1's chunk absorbs the mangled r2 and dies; r3..r5 survive
    assert n_bad == 1
    assert t["url"].to_pylist() == pages["url"].to_pylist()[2:]
