"""Line-structured ops: boilerplate removal + global paragraph dedup.

Unit-level coverage of the vectorized split/rebuild layer (empty docs,
all-removed docs, separator-only docs) plus small end-to-end checks
against a hand-computed truth; the string-level DuckDB gate lives in
tests/test_entry_oracle.py (remove_boilerplate / paragraph_dedup).
"""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.lines import (
    _rebuild_texts,
    paragraph_dedup_keep_first,
    remove_boilerplate,
    split_lines_flat,
)


def test_split_rebuild_roundtrip_keep_all():
    texts = pa.array(["a\nb\nc", "", "x", "\n", "p\n\nq"])
    flat, row_idx, counts = split_lines_flat(texts)
    assert counts.tolist() == [3, 1, 1, 2, 3]
    assert row_idx.tolist() == [0, 0, 0, 1, 2, 3, 3, 4, 4, 4]
    out, kept = _rebuild_texts(flat, np.ones(len(flat), bool), counts)
    assert out.to_pylist() == ["a\nb\nc", "", "x", "\n", "p\n\nq"]
    assert kept.tolist() == counts.tolist()


def test_rebuild_drop_all_and_some():
    texts = pa.array(["a\nb", "c"])
    flat, _ri, counts = split_lines_flat(texts)
    keep = np.array([True, False, False])
    out, kept = _rebuild_texts(flat, keep, counts)
    assert out.to_pylist() == ["a", ""]
    assert kept.tolist() == [1, 0]


def test_split_offset_sliced_chunked_input():
    # ChunkedArray with a nonzero-offset slice must flatten correctly
    base = pa.chunked_array([["skip\nme", "a\nb", "c"]])
    sliced = base.slice(1, 2)
    flat, _ri, counts = split_lines_flat(sliced)
    assert flat.to_pylist() == ["a", "b", "c"]
    assert counts.tolist() == [2, 1]


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_remove_boilerplate_e2e():
    # "footer" appears in 3 docs of source s1 → removed there; the same
    # line in s2 appears only twice → kept (source-scoped).
    rows = [
        (1, "alpha\nfooter", "s1"),
        (2, "beta\nfooter", "s1"),
        (3, "footer\ngamma", "s1"),
        (4, "footer\ndelta", "s2"),
        (5, "footer", "s2"),
    ]
    ds = ray.data.from_arrow(_tbl(rows))
    out = (
        remove_boilerplate(ds, min_docs=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["alpha", "beta", "gamma", "footer\ndelta", "footer"]
    assert out["n_removed"].tolist() == [1, 1, 1, 0, 0]


def test_paragraph_dedup_keep_first_e2e():
    # "dup" survives only at its min (doc_id, ordinal) = doc 1 ord 1;
    # order inside a doc is preserved for survivors.
    rows = [
        (1, "a\ndup\nb", "s"),
        (2, "dup\nc", "s"),
        (3, "c\ndup", "s"),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(["doc_id", "text"]))
    out = (
        paragraph_dedup_keep_first(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["a\ndup\nb", "c", ""]
    assert out["n_dropped"].tolist() == [0, 1, 2]


def test_paragraph_dedup_within_doc_duplicates():
    # duplicate inside ONE doc: only the first ordinal survives
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["x\nx\ny\nx"], pa.string()),
            }
        )
    )
    out = paragraph_dedup_keep_first(ds).to_pandas()
    assert out["text"].tolist() == ["x\ny"]
    assert out["n_dropped"].tolist() == [2]


def test_curate_web_corpus_stage_semantics():
    """Each stage visible on a handcrafted corpus: boilerplate out,
    duplicate paragraph keeps first occurrence, short docs drop, docs
    identical after cleaning dedup to the min id."""
    from dcs_ray.pipelines import curate_web_corpus

    long_a = " ".join(f"w{i}" for i in range(12))  # 12 tokens, unique
    long_b = " ".join(f"x{i}" for i in range(12))
    rows = [
        # docs 1-3 share "footer" (source s1, >=3 docs -> boilerplate)
        (1, f"{long_a}\nfooter", "s1"),
        (2, f"{long_b}\nfooter", "s1"),
        (3, f"footer\n{long_a}", "s1"),  # after cleaning == doc 1 -> dedup
        # doc 4: duplicate paragraph long_b (first seen in doc 2) is
        # dropped here, leaving too few tokens -> filtered out
        (4, f"{long_b}\nshort bit", "s2"),
        # doc 5: plenty of tokens of its own + the duplicate paragraph
        (5, f"{long_b}\n" + " ".join(f"y{i}" for i in range(15)), "s3"),
    ]
    t = _tbl(rows)
    out = (
        curate_web_corpus(ray.data.from_arrow(t), min_docs=3, min_tokens=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 kept (12 tokens), doc 2 kept (12), doc 3 deduped against 1,
    # doc 4 dropped (2 tokens after paragraph dedup), doc 5 kept (15)
    assert out["doc_id"].tolist() == [1, 2, 5]
    assert out["n_tokens"].tolist() == [12, 12, 15]
