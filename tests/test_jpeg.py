"""Baseline JPEG codec: round-trip fidelity, subsampling, restart
markers, sniffing via decode_image, and the actor-pool extractor path."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from dcs_ray.functions.jpeg import decode_jpeg, encode_jpeg
from dcs_ray.functions.multimodal import DecodeUnavailable, decode_image


def _smooth_img(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            ((np.sin(xx / 9.0) + np.sin(yy / 7.0)) * 60 + 128).astype(int) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else 99.0


def test_jpeg_roundtrip_444():
    img = _smooth_img()
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="444"))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) > 40.0


def test_jpeg_roundtrip_420_and_odd_dims():
    img = _smooth_img()[:21, :13]  # not multiples of 8/16: crop path
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 32.0


def test_jpeg_grey():
    yy, xx = np.mgrid[0:30, 0:22]
    g = ((xx + yy) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=85))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(g, dec) > 40.0


def test_jpeg_restart_markers_pixel_identical():
    """RSTn resync decodes to EXACTLY the same pixels as no-restart
    (same quantized coefficients, different framing)."""
    img = _smooth_img(40, 56)
    plain = decode_jpeg(encode_jpeg(img, quality=80, subsampling="420"))
    rst = decode_jpeg(encode_jpeg(img, quality=80, subsampling="420", restart_interval=2))
    np.testing.assert_array_equal(plain, rst)


def test_jpeg_deterministic_bytes():
    img = _smooth_img(16, 24)
    a = encode_jpeg(img, quality=75, subsampling="420", restart_interval=3)
    b = encode_jpeg(img, quality=75, subsampling="420", restart_interval=3)
    assert a == b
    assert a.startswith(b"\xff\xd8") and a.endswith(b"\xff\xd9")


def test_jpeg_progressive_raises():
    enc = bytearray(encode_jpeg(_smooth_img(16, 16)))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(DecodeUnavailable):
        decode_jpeg(bytes(enc))


def test_jpeg_quality_monotone_size():
    img = _smooth_img()
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_decode_image_sniffs_jpeg():
    img = _smooth_img(16, 24)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    # grey JPEG expands to 3 channels like grey PNG does
    g = decode_image(encode_jpeg(img[:, :, 0], quality=95))
    assert g.shape == (16, 24, 3)
    np.testing.assert_array_equal(g[:, :, 0], g[:, :, 1])


def test_jpeg_image_features_actor_pool(ray_session):
    """Mixed PPM+JPEG corpus through the extractor: JPEG features match
    straight-numpy features of the JPEG-decoded pixels, and sit close
    to the lossless PPM features of the same source pixels."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        decode_ppm,
        image_features_real,
        synthesize_jpeg_media,
        synthesize_ppm_media,
    )

    ppm = synthesize_ppm_media(8)
    jpg = synthesize_jpeg_media(8)
    jpg = jpg.set_column(
        jpg.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(8, 16), pa.int64()),
    )
    out = (
        ray.data.from_arrow(pa.concat_tables([ppm, jpg]))
        .map_batches(PpmImageFeatureExtractor, concurrency=2, batch_size=4,
                     batch_format="pyarrow", num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(out) == 16
    for i in range(8):
        want = image_features_real(decode_image(jpg["payload"][i].as_py()))
        np.testing.assert_allclose(np.array(out.feature[8 + i]), want, rtol=1e-5)
        # lossy-but-faithful: mean-channel features near the lossless ones
        lossless = image_features_real(decode_ppm(ppm["payload"][i].as_py()))
        got = np.array(out.feature[8 + i])
        assert np.all(np.abs(got[:3] - lossless[:3]) < 16.0)


def test_jpeg_flat_tile_closed_form():
    """Every flat-tile fixture (grey exact-roundtrip + screened color)
    decodes BIT-EXACTLY to the closed-form tile recipe — the arithmetic
    the image_features_jpeg oracle replays in SQL."""
    from dcs_ray.functions.multimodal import (
        decode_image,
        jpeg_expected_tile_rgb,
        jpeg_media_tile_params,
        synthesize_jpeg_flat_media,
    )

    n, tiles = 16, 4
    media = synthesize_jpeg_flat_media(n, tiles=tiles)
    exp = {m: np.zeros((tiles * 8, tiles * 8, 3), np.uint8) for m in range(n)}
    for mid, tix, grey, r, g, b in jpeg_media_tile_params(n, tiles=tiles):
        ty, tx = divmod(tix, tiles)
        exp[mid][ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = (
            jpeg_expected_tile_rgb(r, g, b, grey)
        )
    for i, p in enumerate(media["payload"].to_pylist()):
        np.testing.assert_array_equal(decode_image(p), exp[i])
