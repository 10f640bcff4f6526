"""Hypothesis property tests for round-2 pure-numpy kernels (no Ray
session needed — these run the per-batch kernels directly)."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dcs_ray.functions.filtering import ngram_hashes, pii_scrub_batch
from dcs_ray.functions.sketches import (
    bloom_from_hashes,
    bloom_might_contain,
)
from dcs_ray.grep import first_match_snippets

ascii_text = st.text(
    alphabet=st.sampled_from("abc XY12 .,-\n"), min_size=0, max_size=80
)


@settings(max_examples=150, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=8), st.integers(2, 4))
def test_ngram_hashes_match_python_reference(texts, n):
    """Same (row, n-gram multiset-size) layout as a per-row reference
    tokenize; identical n-grams hash identically across rows."""
    p, h = ngram_hashes(pa.array(texts), n=n)
    ref_counts = []
    ref_grams: dict[tuple, list[int]] = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        grams = [tuple(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))]
        ref_counts.append(len(grams))
        for g in grams:
            ref_grams.setdefault(g, []).append(i)
    assert np.bincount(p, minlength=len(texts)).tolist() == ref_counts
    # identical gram in two rows → identical hash in both rows
    by_row: dict[int, list] = {}
    for row, hv in zip(p.tolist(), h.tolist()):
        by_row.setdefault(row, []).append(hv)
    for g, rows in ref_grams.items():
        if len(set(rows)) > 1:
            # the gram's hash appears in every row that holds it
            first_row = rows[0]
            # all rows share at least one common hash value for g —
            # verify via intersection of the rows' hash sets
            common = set(by_row[rows[0]])
            for r in rows[1:]:
                common &= set(by_row[r])
            assert common, (g, rows)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200, unique=True),
    st.integers(12, 16),
    st.integers(1, 8),
)
def test_bloom_never_forgets(members, m_log2, k):
    arr = np.array(members, np.uint64)
    bl = bloom_from_hashes(arr, m_log2=m_log2, k=k)
    assert bloom_might_contain(bl, arr, m_log2, k).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(ascii_text, min_size=1, max_size=6),
    st.integers(0, 30),
    st.integers(1, 60),
)
def test_snippets_contain_earliest_match(texts, before, width):
    terms = ["ab", "XY"]
    out = first_match_snippets(pa.array(texts), terms, before=before, width=width)
    for t, s in zip(texts, out.to_pylist()):
        positions = [p for p in (t.find(x) for x in terms) if p >= 0]
        if not positions:
            assert s == ""
        else:
            pos = min(positions)
            start = max(pos - before, 0)
            assert s == t[start : start + width]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        # EMAIL_RE is a pragmatic scrubber pattern (common local-part
        # chars, not full RFC 5321 — exotic locals like "=@a.com" are
        # out of scope by design); generate within its documented scope
        st.emails().filter(
            lambda e: re.fullmatch(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", e)
        ),
        min_size=1,
        max_size=5,
    )
)
def test_pii_scrub_removes_all_emails(addrs):
    text = " noise ".join(addrs)
    out = pii_scrub_batch(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([text])})
    )
    scrubbed = out["text"][0].as_py()
    assert "@" not in scrubbed
    assert out["n_emails"][0].as_py() >= 1
