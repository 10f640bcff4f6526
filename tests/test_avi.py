"""MJPEG AVI container: RIFF demux + per-frame JPEG decode.

The demuxer must index frames WITHOUT decoding (chunk walk only) and
each indexed byte range must be exactly the frame's JPEG payload, so
decode-via-container equals decode-of-payload bit-for-bit.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from dcs_ray.functions.avi import (
    avi_frame_ranges,
    decode_avi_frames,
    encode_avi_mjpeg,
    synthesize_avi_video,
)
from dcs_ray.functions.jpeg import decode_jpeg, encode_jpeg
from dcs_ray.functions.multimodal import DecodeUnavailable, decode_ppm


def _frames(n=7, w=16, h=12, salt=0):
    out = []
    for f in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(
            np.stack(
                [(xx * 11 + f * 17 + salt) % 256, (yy * 7 + f * 29) % 256,
                 (xx + yy + f + salt) % 256],
                axis=-1,
            ).astype(np.uint8)
        )
    return out


def test_frame_ranges_are_exact_jpeg_payloads():
    frames = _frames()
    avi = encode_avi_mjpeg(frames, fps=25, quality=90)
    ranges = avi_frame_ranges(avi)
    assert len(ranges) == len(frames)
    for f, (s, e) in zip(frames, ranges):
        assert avi[s : s + 2] == b"\xff\xd8"  # SOI right at the range start
        np.testing.assert_array_equal(
            decode_jpeg(avi[s:e]), decode_jpeg(encode_jpeg(f, quality=90))
        )


def test_decode_selected_frames_only():
    avi = encode_avi_mjpeg(_frames(9))
    got = decode_avi_frames(avi, [0, 4, 8])
    assert len(got) == 3
    all_f = decode_avi_frames(avi)
    np.testing.assert_array_equal(got[1], all_f[4])


def test_header_fields_and_idx1():
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    # avih dwTotalFrames (5th u32 of the avih chunk body)
    at = avi.index(b"avih") + 8
    total = struct.unpack_from("<I", avi, at + 16)[0]
    assert total == 5
    usec = struct.unpack_from("<I", avi, at)[0]
    assert usec == 100_000  # 10 fps
    assert b"idx1" in avi and b"MJPG" in avi


def test_rejects_non_avi():
    with pytest.raises(DecodeUnavailable):
        avi_frame_ranges(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(DecodeUnavailable):
        avi_frame_ranges(b"not a container")


def test_sampler_demuxes_avi_rows():
    """MJPEG AVIs through PpmStreamFrameSampler next to PPM/GIF rows:
    sampled PPM frames must equal the JPEG-decoded container frames."""
    from dcs_ray.functions.multimodal import PpmStreamFrameSampler, synthesize_ppm_video

    avi_v = synthesize_avi_video(3, frames=10, w=16, h=12)
    ppm_v = synthesize_ppm_video(3, frames=10, w=16, h=12)
    avi_v = avi_v.set_column(
        avi_v.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(3, 6), pa.int64()),
    )
    out = PpmStreamFrameSampler(k=4)(pa.concat_tables([ppm_v, avi_v]))
    assert out.num_rows == 6 * 4
    mid = out["media_id"].to_numpy()
    fi = out["frame_idx"].to_numpy()
    assert sorted(set(fi.tolist())) == [0, 2, 5, 7]
    payloads = avi_v["payload"].to_pylist()
    for r in range(out.num_rows):
        if mid[r] < 3:
            continue
        want = decode_avi_frames(payloads[int(mid[r]) - 3], [int(fi[r])])[0]
        got = decode_ppm(out["frame"][r].as_py())
        np.testing.assert_array_equal(got, want)


def test_avi_flat_tile_closed_form():
    """Sampled MJPEG frames decode BIT-EXACTLY to the closed-form tile
    recipe — the arithmetic the video_frames_mjpeg oracle replays."""
    from dcs_ray.functions.avi import (
        avi_flat_tile_params,
        decode_avi_frames,
        synthesize_avi_flat_video,
    )
    from dcs_ray.functions.multimodal import jpeg_expected_tile_rgb

    n, frames, tiles = 6, 12, 2
    media = synthesize_avi_flat_video(n, frames=frames, tiles=tiles)
    exp = {}
    for mid, fi, tix, r, g, b in avi_flat_tile_params(n, frames, tiles):
        exp.setdefault((mid, fi), np.zeros((16, 16, 3), np.uint8))
        ty, tx = divmod(tix, tiles)
        exp[(mid, fi)][ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = (
            jpeg_expected_tile_rgb(r, g, b, False)
        )
    take = [j * frames // 4 for j in range(4)]
    for i, p in enumerate(media["payload"].to_pylist()):
        for fi, img in zip(take, decode_avi_frames(p, take)):
            np.testing.assert_array_equal(img, exp[(i, fi)])
