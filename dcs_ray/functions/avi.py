"""AVI (RIFF) container with MJPEG video — dependency-free demux.

The simplest REAL compressed video container a crawl serves: a RIFF
``AVI `` file whose ``movi`` list holds one baseline-JPEG chunk per
frame (fourcc ``00dc``/``00db``, handler ``MJPG``). The demuxer walks
RIFF chunks to index frames (no full decode needed to count/seek) and
hands each selected frame's bytes to the pure-numpy baseline JPEG
decoder (:mod:`dcs_ray.functions.jpeg`). The encoder exists for
deterministic fixtures and writes the standard header set
(``avih`` + ``strl(strh, strf)`` + ``movi`` + ``idx1``).

Public layout (Microsoft "AVI RIFF File Reference"): every chunk is
``fourcc u32le-size data [pad to even]``; lists are
``LIST u32le-size list-type data``.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import DecodeUnavailable


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90
) -> bytes:
    """Encode RGB uint8 frames (all same shape) as an MJPEG AVI."""
    from .jpeg import encode_jpeg  # lazy: jpeg.py is heavy

    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        sum(map(len, payloads)) * fps // max(len(payloads), 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max(map(len, payloads)),  # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, fps, 0, len(payloads),
                      max(map(len, payloads)), -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_chunks, idx_entries, off = [], [], 4  # offsets relative to 'movi' fourcc
    for p in payloads:
        c = _chunk(b"00dc", p)
        movi_chunks.append(c)
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_frame_ranges(payload: bytes) -> list[tuple[int, int]]:
    """(start, end) byte ranges of each video frame's JPEG bytes —
    index the container without decoding any frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise DecodeUnavailable("not a RIFF AVI payload")
    ranges: list[tuple[int, int]] = []
    for fourcc, data_at, size in _iter_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[data_at : data_at + 4] == b"movi":
            for cc, at, sz in _iter_chunks(payload, data_at + 4, data_at + size):
                if cc in (b"00dc", b"00db"):
                    ranges.append((at, at + sz))
    if not ranges:
        raise DecodeUnavailable("AVI: no MJPEG frames found")
    return ranges


def decode_avi_frames(payload: bytes, indices: list[int] | None = None) -> list[np.ndarray]:
    """Decode the selected (default: all) MJPEG frames to RGB arrays."""
    from .jpeg import decode_jpeg

    ranges = avi_frame_ranges(payload)
    if indices is None:
        indices = list(range(len(ranges)))
    out = []
    for i in indices:
        s, e = ranges[i]
        out.append(decode_jpeg(payload[s:e]))
    return out


def synthesize_avi_video(
    n: int = 8, frames: int = 12, w: int = 16, h: int = 12, seed: int = 4
) -> "pa.Table":
    """Deterministic MJPEG AVIs with the same per-frame gradient recipe
    as :func:`dcs_ray.functions.multimodal.synthesize_ppm_video` (so the
    sampler's frame selection is comparable across containers)."""
    import pyarrow as pa

    rows = []
    for i in range(n):
        imgs = []
        for f in range(frames):
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 11 + f * 17 + i) % 256,
                    (yy * 7 + f * 29) % 256,
                    (xx + yy + f + i) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            imgs.append(img)
        rows.append(encode_avi_mjpeg(imgs, fps=25))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(rows, pa.binary()),
            "width": pa.array(np.full(n, w, np.int32), pa.int32()),
            "height": pa.array(np.full(n, h, np.int32), pa.int32()),
            "duration_ms": pa.array(np.full(n, frames * 40, np.int32), pa.int32()),
        }
    )


def avi_flat_tile_params(
    n: int = 16, frames: int = 12, tiles: int = 2, seed: int = 401
) -> list[tuple[int, int, int, int, int, int]]:
    """(media_id, frame_idx, tile_idx, r, g, b) source parameters for
    :func:`synthesize_avi_flat_video` — colors taken in order from the
    first rejection-accepted candidates of a splitmix64 stream (the
    same screen as :func:`..multimodal._jpeg_color_accept`), so every
    decoded MJPEG pixel is a closed form of its tile params."""
    from .multimodal import _jpeg_color_accept
    from .sampling import splitmix64

    need = n * frames * tiles * tiles
    out: list[tuple[int, int, int, int, int, int]] = []
    got = 0
    t = 0
    per_frame = tiles * tiles
    per_vid = frames * per_frame
    while got < need:
        hv = int(splitmix64(np.uint64(seed * 999983 + t)))
        t += 1
        r, g, b = hv & 255, (hv >> 8) & 255, (hv >> 16) & 255
        if _jpeg_color_accept(r, g, b):
            out.append(
                (got // per_vid, (got % per_vid) // per_frame,
                 got % per_frame, r, g, b)
            )
            got += 1
    return out


def synthesize_avi_flat_video(
    n: int = 16, frames: int = 12, tiles: int = 2, fps: int = 25, seed: int = 401
) -> "pa.Table":
    """Deterministic MJPEG AVIs (quality 50, 4:4:4) whose frames are
    flat 8×8 color tiles with CLOSED-FORM decoded pixels (the
    ``image_features_jpeg`` screen) — so the RIFF demux + per-frame
    JPEG decode + even-sampling + timestamp arithmetic all gate
    against pure SQL arithmetic, extending the lossless video gate to
    a compressed container."""
    import pyarrow as pa

    size = tiles * 8
    params = avi_flat_tile_params(n, frames, tiles, seed)
    vids: dict[int, list[np.ndarray]] = {
        i: [np.zeros((size, size, 3), np.uint8) for _ in range(frames)]
        for i in range(n)
    }
    for mid, fi, tix, r, g, b in params:
        ty, tx = divmod(tix, tiles)
        vids[mid][fi][ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8] = (r, g, b)
    rows = [
        encode_avi_mjpeg(vids[i], fps=fps, quality=50) for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(rows, pa.binary()),
            "width": pa.array(np.full(n, size, np.int32), pa.int32()),
            "height": pa.array(np.full(n, size, np.int32), pa.int32()),
            "duration_ms": pa.array(
                np.full(n, frames * 1000 // fps, np.int32), pa.int32()
            ),
        }
    )
