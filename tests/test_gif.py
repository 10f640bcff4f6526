"""GIF87a/89a codec: LZW round-trips (KwKwK, table overflow + clear),
pixel-exact encode→decode, animated frames, interlace de-weaving,
transparency compositing, sniffing via decode_image, and the
frame-sampler demux path."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from dcs_ray.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from dcs_ray.functions.multimodal import DecodeUnavailable, decode_image


def _quant_img(h=16, w=24, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // max(w - 1, 1) + phase * 7) % 256,
            (yy * 255 // max(h - 1, 1) + phase * 13) % 256,
            ((xx + yy) * 255 // max(w + h - 2, 1) + phase * 29) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return (img // 43) * 43  # <=216 distinct colors


def test_lzw_roundtrip_repetitive_and_kwkwk():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 8, size=5000).astype(np.uint8)
    idx[1000:3000] = np.tile(idx[1000:1010], 200)
    np.testing.assert_array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, len(idx)), idx)
    # KwKwK: a run of one symbol forces the code==next_code branch
    run = np.zeros(1000, np.uint8)
    np.testing.assert_array_equal(_lzw_decode(_lzw_encode(run, 8), 8, 1000), run)
    # small min_code_size (4-color image path)
    idx4 = rng.integers(0, 4, size=2000).astype(np.uint8)
    np.testing.assert_array_equal(_lzw_decode(_lzw_encode(idx4, 2), 2, 2000), idx4)


def test_lzw_table_overflow_emits_clear_and_stays_exact():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, size=200_000).astype(np.uint8)  # >4096 entries
    np.testing.assert_array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, len(idx)), idx)


def test_gif_roundtrip_single_frame_exact():
    img = _quant_img(33, 47, phase=2)
    payload = encode_gif(img)
    assert payload.startswith(b"GIF89a") and payload.endswith(b"\x3b")
    np.testing.assert_array_equal(decode_gif(payload), img)
    # deterministic bytes
    assert encode_gif(img) == payload


def test_gif_animated_roundtrip_exact():
    frames = [_quant_img(20, 24, phase=f) for f in range(5)]
    got = decode_gif_frames(encode_gif(frames, delay_cs=10))
    assert len(got) == 5
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_gif_interlaced_decode():
    """Re-weave check: take a plain GIF, permute its index rows into
    interlace order, set the interlace flag — decode must restore the
    original raster."""
    img = _quant_img(13, 10, phase=1)  # odd height exercises pass bounds
    payload = bytearray(encode_gif(img))
    # locate the image descriptor (0x2c) after header+global table
    pos = payload.index(0x2C, 13 + 768)
    ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
    assert (iw, ih) == (10, 13)
    # decode the index stream of the original
    min_code = payload[pos + 10]
    body = bytearray()
    p = pos + 11
    while payload[p] != 0:
        ln = payload[p]
        body += payload[p + 1 : p + 1 + ln]
        p += 1 + ln
    idx = _lzw_decode(bytes(body), min_code, iw * ih).reshape(ih, iw)
    # interlace order: rows 0,8.. then 4,12.. then 2,6.. then 1,3..
    order = (
        list(range(0, ih, 8))
        + list(range(4, ih, 8))
        + list(range(2, ih, 4))
        + list(range(1, ih, 2))
    )
    woven = idx[order].reshape(-1)
    new_body = _lzw_encode(woven, min_code)
    out = bytearray(payload[: pos + 9])
    out.append(payload[pos + 9] | 0x40)  # set interlace flag
    out.append(min_code)
    for i in range(0, len(new_body), 255):
        chunk = new_body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    np.testing.assert_array_equal(decode_gif(bytes(out)), img)


def test_gif_transparency_composites_over_previous_frame():
    """Frame 2 marks palette index of one color transparent: those
    pixels must show frame 1's pixels."""
    f1 = np.zeros((6, 8, 3), np.uint8)
    f1[:] = (43, 86, 0)
    f2 = f1.copy()
    f2[2:4, 3:5] = (215, 0, 43)
    payload = bytearray(encode_gif([f1, f2]))
    # find f2's graphic control ext (second 0x21 0xf9) and mark the
    # f1-color palette index transparent in it
    first = payload.index(b"\x21\xf9")
    second = payload.index(b"\x21\xf9", first + 2)
    # palette index of (43,86,0): read global palette
    pal = np.frombuffer(bytes(payload[13 : 13 + 768]), np.uint8).reshape(256, 3)
    t_idx = int(np.where((pal == (43, 86, 0)).all(axis=1))[0][0])
    payload[second + 3] |= 0x01  # transparency flag
    payload[second + 6] = t_idx
    frames = decode_gif_frames(bytes(payload))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], f1)
    # transparent region shows f1 underneath; opaque block is f2's
    np.testing.assert_array_equal(frames[1], f2)


def test_decode_image_sniffs_gif():
    img = _quant_img(16, 24)
    out = decode_image(encode_gif(img))
    assert out.shape == (16, 24, 3)
    np.testing.assert_array_equal(out, img)
    with pytest.raises(DecodeUnavailable):
        decode_image(b"GIFXXba notagif")


def test_gif_encode_rejects_wide_palettes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(DecodeUnavailable):
        encode_gif(img)


def test_gif_features_match_lossless_ppm():
    """Same pixels through GIF (lossless for <=256 colors) and PPM give
    IDENTICAL features — GIF is exact, unlike JPEG."""
    from dcs_ray.functions.multimodal import image_features_real

    img = _quant_img(16, 24, phase=5)
    np.testing.assert_array_equal(
        image_features_real(decode_image(encode_gif(img))),
        image_features_real(img),
    )


def test_gif_video_frame_sampler_demux():
    """Animated-GIF payloads through PpmStreamFrameSampler: sampled
    frames re-emitted as standalone PPMs, pixel-exact vs the source
    frame recipe."""
    from dcs_ray.functions.multimodal import (
        PpmStreamFrameSampler,
        decode_ppm,
        synthesize_gif_video,
        synthesize_ppm_video,
    )

    gif_v = synthesize_gif_video(4, frames=10, w=16, h=12)
    ppm_v = synthesize_ppm_video(4, frames=10, w=16, h=12)
    mixed = pa.concat_tables(
        [
            ppm_v,
            gif_v.set_column(
                gif_v.schema.get_field_index("media_id"), "media_id",
                pa.array(np.arange(4, 8), pa.int64()),
            ),
        ]
    )
    out = PpmStreamFrameSampler(k=4)(mixed)
    assert out.num_rows == 8 * 4
    fi = out["frame_idx"].to_numpy()
    mid = out["media_id"].to_numpy()
    assert sorted(set(fi.tolist())) == [0, 2, 5, 7]  # even sampling over 10
    for r in range(out.num_rows):
        if mid[r] < 4:
            continue  # PPM rows covered by the existing sampler test
        i, f = int(mid[r]) - 4, int(fi[r])
        yy, xx = np.mgrid[0:12, 0:16]
        want = np.stack(
            [
                (xx * 11 + f * 17 + i) % 256,
                (yy * 7 + f * 29) % 256,
                (xx + yy + f + i) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        want = (want // 43) * 43
        got = decode_ppm(out["frame"][r].as_py())
        np.testing.assert_array_equal(got, want)
        # timestamps follow frame position
        assert out["ts_ms"][r].as_py() == 400 * f // 10
