"""Decode-nothing media metadata triage: container/frame-header parsers
for MP4 (ISO-BMFF box walk) and MP3 (MPEG-1 L3 frame sync), plus the
uniform sniff-and-parse stage across every supported format."""

import numpy as np
import pyarrow as pa
import pytest

from dcs_ray.functions.avi import synthesize_avi_video
from dcs_ray.functions.media_meta import (
    MediaMetadataExtractor,
    encode_mp3_skeleton,
    encode_mp4_skeleton,
    media_metadata_one,
    mp3_metadata,
    mp4_metadata,
)
from dcs_ray.functions.multimodal import (
    DecodeUnavailable,
    synthesize_flac_media,
    synthesize_gif_media,
    synthesize_jpeg_media,
    synthesize_png_media,
    synthesize_ppm_media,
    synthesize_wav_media,
)


def test_mp4_box_walk_roundtrip():
    m = mp4_metadata(encode_mp4_skeleton(duration_ms=5500, w=640, h=360, n_samples=137))
    assert m == {"format": "mp4", "duration_ms": 5500, "n_tracks": 1,
                 "width": 640, "height": 360, "n_samples": 137}


def test_mp4_rejects_non_bmff():
    with pytest.raises(DecodeUnavailable):
        mp4_metadata(b"RIFF....WAVE")


def test_mp3_frame_sync_and_estimates():
    m = mp3_metadata(encode_mp3_skeleton(100, 128, 44100))
    assert (m["bitrate_kbps"], m["samplerate_hz"], m["n_frames"]) == (128, 44100, 100)
    # duration ≈ n_frames * 1152 / rate = 2.612 s (CBR estimate from bytes)
    assert abs(m["duration_ms"] - 2612) < 20
    # garbage prefix before the first sync is skipped
    m2 = mp3_metadata(b"\x00" * 100 + encode_mp3_skeleton(10))
    assert m2["n_frames"] == 10


def test_mp3_rejects_unsyncable():
    with pytest.raises(DecodeUnavailable):
        mp3_metadata(b"\x00" * 4096 * 2)


def test_uniform_stage_all_formats():
    payloads = [
        synthesize_ppm_media(1)["payload"][0].as_py(),
        synthesize_png_media(1)["payload"][0].as_py(),
        synthesize_gif_media(1)["payload"][0].as_py(),
        synthesize_wav_media(1, samples=1600)["payload"][0].as_py(),
        synthesize_flac_media(1, samples=2048)["payload"][0].as_py(),
        synthesize_jpeg_media(1)["payload"][0].as_py(),
        synthesize_avi_video(1, frames=5)["payload"][0].as_py(),
        encode_mp4_skeleton(1000, 320, 240, 30),
        encode_mp3_skeleton(50),
    ]
    b = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = MediaMetadataExtractor()(b)
    got = dict(zip(out["media_id"].to_pylist(), out["format"].to_pylist()))
    assert list(got.values()) == [
        "ppm", "png", "gif", "wav", "flac", "jpeg", "avi", "mp4", "mp3"
    ]
    rows = {f: r for f, r in zip(out["format"].to_pylist(),
                                 out.to_pylist())}
    assert (rows["png"]["width"], rows["png"]["height"]) == (24, 16)
    assert (rows["jpeg"]["width"], rows["jpeg"]["height"]) == (24, 16)
    assert rows["wav"]["n_samples"] == 1600 and rows["wav"]["duration_ms"] == 100
    assert rows["flac"]["n_samples"] == 2048
    assert rows["avi"]["n_samples"] == 5 and rows["avi"]["duration_ms"] == 200
    assert rows["mp4"]["duration_ms"] == 1000 and rows["mp4"]["width"] == 320
    assert rows["mp3"]["samplerate_hz"] == 44100
