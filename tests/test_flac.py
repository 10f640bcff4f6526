"""FLAC subset codec: lossless round-trips (fixed predictors, constant,
verbatim, multi-block, stereo, extremes), crafted-stream decode of the
paths the encoder doesn't emit (LPC, wasted bits, rice partitions,
escape-coded residuals), CRC/MD5 corruption detection, sniffing via
decode_audio, and cross-codec feature identity."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from dcs_ray.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    _write_rice,
    decode_flac,
    encode_flac,
)
from dcs_ray.functions.multimodal import DecodeUnavailable, decode_audio


def _sig(n=5000, tone=3, ramp=2):
    t = np.arange(n)
    return (
        6000 * np.sin(2 * np.pi * t * tone / 256.0) + (t * ramp % 4000)
    ).astype(np.int16)


def test_flac_roundtrip_mono_exact_and_compresses():
    sig = _sig()
    payload = encode_flac(sig, rate=32000)
    out, rate = decode_flac(payload)
    assert rate == 32000
    np.testing.assert_array_equal(out, sig)
    assert len(payload) < 0.5 * sig.nbytes  # tonal signal compresses
    assert encode_flac(sig, rate=32000) == payload  # deterministic


def test_flac_roundtrip_constant_verbatim_extremes_tiny():
    rng = np.random.default_rng(11)
    for x in (
        np.full(4096, -123, np.int16),                       # CONSTANT
        rng.integers(-32768, 32767, size=3000).astype(np.int16),  # ~VERBATIM
        np.array([32767, -32768] * 2000, np.int16),          # int16 extremes
        _sig(1), _sig(2), _sig(5),                           # tiny inputs
    ):
        out, _ = decode_flac(encode_flac(x))
        np.testing.assert_array_equal(out, x)


def test_flac_multiblock_and_stereo():
    long = (3000 * np.sin(np.arange(10001) / 17.0)).astype(np.int16)
    out, _ = decode_flac(encode_flac(long, block_size=4096))
    np.testing.assert_array_equal(out, long)
    st = np.stack([_sig(3000), _sig(3000, tone=5, ramp=3)], axis=1)
    out, _ = decode_flac(encode_flac(st))
    assert out.shape == (3000, 2)
    np.testing.assert_array_equal(out, st)


def test_flac_corruption_detected():
    payload = bytearray(encode_flac(_sig(4000)))
    payload[60] ^= 0x40  # flip a bit in the first frame body
    with pytest.raises(DecodeUnavailable):
        decode_flac(bytes(payload))


# ---------------------------------------------------------------------------
# Crafted streams: decoder paths the fixture encoder never emits
# ---------------------------------------------------------------------------


def _build_stream(x: np.ndarray, write_subframe, rate: int = 32000) -> bytes:
    """One mono 16-bit frame around a caller-written subframe body."""
    n = len(x)
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0)          # 16-bit blocksize-1 follows
    hdr.append((0 << 4) | (0b100 << 1))    # mono, 16-bit
    hdr += _utf8_number(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(_crc8(bytes(hdr)))
    bw = _BitWriter()
    write_subframe(bw)
    bw.align()
    frame = bytes(hdr) + bw.bytes()
    frame += struct.pack(">H", _crc16(frame))
    md5 = hashlib.md5(np.asarray(x, "<i2").tobytes()).digest()
    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)   # mono
    si.write(15, 5)  # 16-bit
    si.write(n, 36)
    body = si.bytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + frame


def test_flac_lpc_subframe_decodes():
    """LPC order 2, coefs [5, -3], shift 2 — build x forward from known
    residuals, then hand-encode the subframe; decode must reproduce x."""
    order, coefs, shift = 2, [5, -3], 2
    rng = np.random.default_rng(5)
    res = rng.integers(-40, 40, size=300).astype(np.int64)
    x = np.zeros(order + len(res), np.int64)
    x[:order] = [100, -200]
    for i in range(order, len(x)):
        acc = sum(coefs[j] * x[i - 1 - j] for j in range(order))
        x[i] = res[i - order] + (acc >> shift)
    assert np.abs(x).max() < 32768
    k = 6

    def write(bw):
        bw.write(0, 1)
        bw.write(32 | (order - 1), 6)  # LPC
        bw.write(0, 1)
        for v in x[:order].tolist():
            bw.write(int(v) & 0xFFFF, 16)
        bw.write(12 - 1, 4)            # precision 12
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & 0xFFF, 12)
        bw.write(0, 2)                 # method 0
        bw.write(0, 4)                 # partition order 0
        bw.write(k, 4)
        _write_rice(bw, res, k)

    out, _ = decode_flac(_build_stream(x.astype(np.int16), write))
    np.testing.assert_array_equal(out, x.astype(np.int16))


def test_flac_wasted_bits_constant():
    """CONSTANT subframe with 3 wasted bits: value stored >>3."""
    x = np.full(64, 8 * -401, np.int16)  # multiple of 8

    def write(bw):
        bw.write(0, 1)
        bw.write(0, 6)       # CONSTANT
        bw.write(1, 1)       # wasted-bits flag
        bw.write(0b001, 3)   # unary 2 → wasted = 3
        bw.write((-401) & ((1 << 13) - 1), 13)  # bps - wasted = 13

    out, _ = decode_flac(_build_stream(x, write))
    np.testing.assert_array_equal(out, x)


def test_flac_rice_partitions_and_escape():
    """FIXED order 1 with partition order 2 (first partition short by
    the predictor order) where one partition is escape-coded raw."""
    n = 16
    x = np.cumsum(np.array(
        [900, -5, 7, -2, 3, 30000, -60000, 29000, -100, 5, -7, 2, 1, -1, 4, -6],
        np.int64,
    ))
    assert np.abs(x).max() < 32768
    res = np.diff(x)  # order-1 residuals, len 15
    parts = [res[:3], res[3:7], res[7:11], res[11:15]]

    def write(bw):
        bw.write(0, 1)
        bw.write(0b001000 | 1, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write(int(x[0]) & 0xFFFF, 16)  # warmup
        bw.write(0, 2)   # method 0
        bw.write(2, 4)   # partition order 2 → 4 partitions
        for i, p in enumerate(parts):
            if i == 1:   # escape-coded: raw 18-bit two's complement
                bw.write(0xF, 4)
                bw.write(18, 5)
                for v in p.tolist():
                    bw.write(int(v) & ((1 << 18) - 1), 18)
            else:
                k = 4
                bw.write(k, 4)
                _write_rice(bw, p, k)

    out, _ = decode_flac(_build_stream(x.astype(np.int16), write))
    np.testing.assert_array_equal(out, x.astype(np.int16))


# ---------------------------------------------------------------------------
# Integration: sniffing + extractor + fixtures
# ---------------------------------------------------------------------------


def test_decode_audio_sniffs_flac_and_wav():
    from dcs_ray.functions.multimodal import encode_wav_pcm16

    sig = _sig(2048)
    s1, r1 = decode_audio(encode_wav_pcm16(sig))
    s2, r2 = decode_audio(encode_flac(sig, rate=32000))
    np.testing.assert_array_equal(s1, s2)
    with pytest.raises(DecodeUnavailable):
        decode_audio(b"ID3\x04mp3-payload")


def test_flac_features_bit_identical_to_wav(ray_session):
    """Mixed WAV+FLAC corpus through the extractor pool: FLAC is
    lossless, so features for the same media_id recipe are IDENTICAL."""
    import ray

    from dcs_ray.functions.multimodal import (
        WavAudioFeatureExtractor,
        synthesize_flac_media,
        synthesize_wav_media,
    )

    wav = synthesize_wav_media(8)
    flc = synthesize_flac_media(8)
    flc = flc.set_column(
        flc.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(8, 16), pa.int64()),
    )
    out = (
        ray.data.from_arrow(pa.concat_tables([wav, flc]))
        .map_batches(WavAudioFeatureExtractor, concurrency=2, batch_size=4,
                     batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(out) == 16
    for i in range(8):
        np.testing.assert_array_equal(
            np.array(out.feature[i]), np.array(out.feature[8 + i])
        )
    # compression actually happened on the FLAC side
    assert sum(len(p.as_py()) for p in flc["payload"]) < 0.6 * sum(
        len(p.as_py()) for p in wav["payload"]
    )
