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


def test_mp4_sample_table_extraction_byte_identity():
    """stsz/stsc/stco demux returns EXACTLY the JPEG bytes the muxer
    placed in mdat; decoding them equals decoding those bytes directly
    (the AVI round-trip's third-container twin)."""
    import numpy as np

    from dcs_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from dcs_ray.functions.media_meta import (
        decode_mp4_frames,
        encode_mp4_mjpeg,
        mp4_sample_ranges,
    )

    imgs = [
        np.random.RandomState(i).randint(0, 255, (12, 16, 3)).astype(np.uint8)
        for i in range(6)
    ]
    payload = encode_mp4_mjpeg(imgs, fps=25)
    ranges = mp4_sample_ranges(payload)
    assert len(ranges) == 6
    for img, (s, e) in zip(imgs, ranges):
        assert payload[s:e] == encode_jpeg(img)  # byte identity
    for img, dec in zip(imgs, decode_mp4_frames(payload)):
        assert np.array_equal(dec, decode_jpeg(encode_jpeg(img)))


def test_mp4_cross_container_pixel_identity_with_avi():
    import numpy as np

    from dcs_ray.functions.avi import decode_avi_frames, synthesize_avi_video
    from dcs_ray.functions.media_meta import (
        decode_mp4_frames,
        synthesize_mp4_mjpeg_video,
    )

    ta = synthesize_avi_video(2)
    tm = synthesize_mp4_mjpeg_video(2)
    for i in range(2):
        a = decode_avi_frames(ta["payload"][i].as_py(), [0, 3, 11])
        b = decode_mp4_frames(tm["payload"][i].as_py(), [0, 3, 11])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_mp4_non_mjpeg_sample_raises():
    import numpy as np
    import pytest as _pytest

    from dcs_ray.functions.media_meta import decode_mp4_frames, encode_mp4_mjpeg
    from dcs_ray.functions.multimodal import DecodeUnavailable

    img = np.zeros((4, 4, 3), np.uint8)
    payload = bytearray(encode_mp4_mjpeg([img]))
    # corrupt the sample's SOI marker → honest triage, not garbage pixels
    from dcs_ray.functions.media_meta import mp4_sample_ranges

    s, _e = mp4_sample_ranges(bytes(payload))[0]
    payload[s:s + 2] = b"\x00\x00"
    with _pytest.raises(DecodeUnavailable):
        decode_mp4_frames(bytes(payload))


def test_sampler_demuxes_mp4():
    import numpy as np
    import pyarrow as pa2
    import ray.data

    from dcs_ray.functions.media_meta import synthesize_mp4_mjpeg_video
    from dcs_ray.functions.multimodal import PpmStreamFrameSampler

    t = synthesize_mp4_mjpeg_video(4)
    ds = ray.data.from_arrow(t).map_batches(
        PpmStreamFrameSampler, fn_constructor_kwargs={"k": 4},
        concurrency=1, batch_format="pyarrow",
    )
    out = pa2.concat_tables(
        [pa2.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    assert out.num_rows == 16  # 4 media × 4 sampled frames
    assert set(out["frame_idx"].to_pylist()) == {0, 3, 6, 9}
    assert all(f[:2] == b"P6" for f in out["frame"].to_pylist())
