"""Tokenizer goldens — word mode parity with DuckDB, trigram semantics
mirroring the reference tokenizer (``internal/index/write.go:170-219``)."""

import duckdb
import numpy as np
import pyarrow as pa

from dcs_ray.tokenize import (
    MAX_DISTINCT_TRIGRAMS,
    indexable_mask,
    string_trigrams,
    tokenize_batch_words,
    tokenize_query_words,
    trigram_tokens,
)

TEXTS = [
    "Hello, World! hello again",
    "the quick brown fox 42 jumps-over the lazy dog",
    "",
    "  --- ",
    "C'est déjà l'été 123",
]


def test_word_tokens_match_duckdb():
    texts = pa.array(TEXTS)
    doc_ids = np.arange(len(TEXTS), dtype=np.uint64)
    postings, doc_lens = tokenize_batch_words(texts, doc_ids)
    got = postings.to_pandas().sort_values(["term", "doc_id"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", pa.table({"doc_id": doc_ids, "text": texts}))
    want = con.execute(
        """
        SELECT t AS term, doc_id, count(*)::int AS tf FROM (
          SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
          FROM docs
        ) GROUP BY t, doc_id ORDER BY term, doc_id
        """
    ).df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["doc_id"].astype(int).tolist() == want["doc_id"].astype(int).tolist()
    assert got["tf"].astype(int).tolist() == want["tf"].astype(int).tolist()

    want_len = con.execute(
        """
        SELECT doc_id, count(*)::int AS n FROM (
          SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
          FROM docs
        ) GROUP BY doc_id
        """
    ).df()
    dl = dict(zip(doc_lens["doc_id"].to_pylist(), doc_lens["doc_len"].to_pylist()))
    for _, row in want_len.iterrows():
        assert dl[int(row["doc_id"])] == int(row["n"])
    assert dl[2] == 0 and dl[3] == 0


def test_tokenize_query_words():
    assert tokenize_query_words("Hello WORLD hello") == ["hello", "world"]
    assert tokenize_query_words("a.*b c") == ["a", "b", "c"]
    assert tokenize_query_words("  ") == []


def test_trigram_golden():
    # write.go:170-219: trigram = t0<<16|t1<<8|t2 over raw bytes
    assert string_trigrams("abcd") == [
        (ord("a") << 16) | (ord("b") << 8) | ord("c"),
        (ord("b") << 16) | (ord("c") << 8) | ord("d"),
    ]
    texts = pa.array(["abcd", "xy", "hello"])
    tri, doc, pos = trigram_tokens(texts, np.array([10, 11, 12], dtype=np.uint64))
    # doc "xy" too short (< 3 bytes, write.go:139) → nothing
    assert doc.tolist() == [10, 10, 12, 12, 12]
    assert pos.tolist() == [0, 1, 0, 1, 2]
    assert tri[:2].tolist() == string_trigrams("abcd")
    assert tri[2:].tolist() == string_trigrams("hello")


def test_trigram_multibyte_utf8_uses_bytes():
    # é = 0xC3 0xA9 → trigrams over bytes, not runes
    texts = pa.array(["aé"])
    tri, doc, pos = trigram_tokens(texts, np.array([0], dtype=np.uint64))
    b = "aé".encode()
    assert len(b) == 3
    assert tri.tolist() == [(b[0] << 16) | (b[1] << 8) | b[2]]


def test_indexable_mask_line_length():
    long_line = "x" * 2001
    texts = pa.array(["ok doc", long_line, "a\n" + "y" * 1999])
    mask = indexable_mask(texts)
    assert mask.tolist() == [True, False, True]


def test_trigram_distinct_cap():
    # a doc with > 20000 distinct trigrams is skipped entirely (write.go:213)
    rng = np.random.default_rng(3)
    big = "".join(chr(33 + c) for c in rng.integers(0, 90, 40000))
    texts = pa.array([big, "abc"])
    tri, doc, pos = trigram_tokens(texts, np.array([0, 1], dtype=np.uint64))
    uniq0 = len(set(string_trigrams(big)))
    if uniq0 > MAX_DISTINCT_TRIGRAMS:
        assert 0 not in doc
    assert 1 in doc


def test_ascii_fast_path_matches_regex_path():
    """The byte-LUT ASCII tokenizer must be token- and parent-identical
    to the Arrow utf8_lower + RE2 split it replaces (which remains the
    fallback for any batch containing a non-ASCII byte)."""
    import pyarrow.compute as pc

    from dcs_ray.tokenize import WORD_SPLIT_PATTERN, word_tokens_flat

    def regex_path(arr):
        lowered = pc.utf8_lower(arr)
        lists = pc.split_pattern_regex(lowered, WORD_SPLIT_PATTERN)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(flat, "")
        return flat.filter(keep), parents[keep.to_numpy(zero_copy_only=False)]

    cases = [
        ["Hello, WORLD!! a1 b2-c3", "", "   ", "x", "123 abc", "tail token."],
        ["edge.case,with;many:separators", "UPPER lower MiXeD 0a9z"],
        ["a", "1", ".", "..a..", "a.."],
        [""],
        [],
        ["héllo wörld", "ascii here"],  # non-ASCII -> fallback path
    ]
    for texts in cases:
        arr = pa.array(texts, pa.string())
        f1, p1 = word_tokens_flat(arr)
        f2, p2 = regex_path(arr)
        assert f1.to_pylist() == f2.to_pylist(), texts
        assert p1.tolist() == p2.tolist(), texts


def test_ascii_fast_path_sliced_input():
    """Zero-copy buffer views must respect array offsets (a sliced Arrow
    array shares its parent's buffers)."""
    from dcs_ray.tokenize import word_tokens_flat

    arr = pa.array(["drop me", "Keep This one", "and me 2"]).slice(1, 2)
    flat, parents = word_tokens_flat(arr)
    assert flat.to_pylist() == ["keep", "this", "one", "and", "me", "2"]
    assert parents.tolist() == [0, 0, 0, 1, 1, 1]


def test_null_text_rows_are_empty_docs():
    """Web corpora carry null text rows; they must behave as empty docs
    everywhere (tokenizers, hashes, shingles), never crash."""
    import numpy as np

    from dcs_ray.functions.dedup import _shingle_hashes, minhash_signatures
    from dcs_ray.functions.textstats import content_hash_rows
    from dcs_ray.tokenize import trigram_tokens, word_tokens_flat

    arr = pa.array(["hello world", None, "", "ok"])
    flat, parents = word_tokens_flat(arr)
    assert flat.to_pylist() == ["hello", "world", "ok"]
    assert parents.tolist() == [0, 0, 3]
    tri, td, tp = trigram_tokens(arr, np.arange(4, dtype=np.uint64))
    assert set(td.tolist()) <= {0, 3}
    h = content_hash_rows(arr)
    assert h[1] == content_hash_rows(pa.array([""]))[0]  # null ≡ empty
    sh, offs = _shingle_hashes(arr, 3)
    assert offs[1] == offs[2]  # null doc owns no shingles
    sig = minhash_signatures(arr)
    assert (sig[1] == np.iinfo(np.uint64).max).all()
