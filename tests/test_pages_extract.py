"""The input_hint invariant: extracted text is byte-identical per url —
extraction is a pure function of the html bytes (mirrors the reference's
golden-bytes discipline, ``index/write_test.go:16-86``)."""

import pyarrow.parquet as pq

from dcs_ray.functions.simsearch import near_dup_pairs_exact  # noqa: F401 (import smoke)
from dcs_ray.sources.pages import (
    extract_text_batch,
    extract_text_one,
    read_pages,
    synthesize_pages_table,
)

SF = "/root/testdata/sf0.001"


def test_extract_text_byte_identical():
    docs = pq.read_table(f"{SF}/documents.parquet")
    pages = synthesize_pages_table(docs)
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        got = extract_text_one(html)
        assert got == text  # byte-identical per url
        assert extract_text_one(html) == got  # pure function of html bytes


def test_extract_batch_matches_rowwise(ray_session):
    pages = read_pages(SF)
    out = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    batch = next(iter(out.iter_batches(batch_format="pyarrow", batch_size=64)))
    for html, text in zip(batch["html"].to_pylist(), batch["text"].to_pylist()):
        assert extract_text_one(html) == text
