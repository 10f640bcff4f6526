"""Media metadata extraction WITHOUT decoding — the triage stage a
multimodal crawl runs before deciding what to decode: parse container
headers only, emit (format, duration, dimensions, rates) per payload.

Two real parsers for the formats whose FULL decode is out of scope in
this sandbox (no codec libraries), both from the public specs:

- **MP4 / ISO-BMFF** (ISO 14496-12): walk the box tree (size+fourcc,
  size==1 → 64-bit largesize), read ``mvhd`` (timescale, duration),
  every ``trak``'s ``tkhd`` (dimensions) + ``mdhd`` + ``stsz`` (sample
  count) + ``hdlr`` (track kind). No sample data is touched.
- **MP3 / MPEG audio** (ISO 11172-3 frame header): sync on the first
  valid frame header, read version/layer/bitrate/samplerate indices
  from the public tables, estimate duration from file size × bitrate
  (CBR assumption, flagged), count a few frames to validate.

Plus an encoder for each (minimal valid fixtures) so parsing is
round-trip tested against known values.

The actor-pool stage (:class:`MediaMetadataExtractor`) dispatches on
magic bytes across ALL known formats (incl. the decodable ones, whose
headers are parsed directly — PPM/PNG/GIF/JPEG/WAV/FLAC/AVI) and emits
one uniform metadata row per payload.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .multimodal import DecodeUnavailable

# ---------------------------------------------------------------------------
# MP4 (ISO base media file format) box walk
# ---------------------------------------------------------------------------


def _iter_boxes(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr:
            raise DecodeUnavailable(f"mp4: bad box size at {pos}")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find_box(buf: bytes, pos: int, end: int, path: list[bytes]):
    """First box at ``path`` (e.g. [b'moov', b'mvhd']) → (start, end)."""
    for fourcc, s, e in _iter_boxes(buf, pos, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(buf, s, e, path[1:])
    return None


def mp4_metadata(payload: bytes) -> dict:
    """Container metadata from the box tree only (no sample data):
    duration_ms, n_tracks, per-first-video-track width/height, total
    sample count across tracks."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise DecodeUnavailable("not an ISO-BMFF payload")
    mvhd = _find_box(payload, 0, len(payload), [b"moov", b"mvhd"])
    if mvhd is None:
        raise DecodeUnavailable("mp4: no moov/mvhd")
    s, _e = mvhd
    version = payload[s]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, s + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", payload, s + 4 + 8)
    width = height = 0
    n_tracks = 0
    n_samples = 0
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    for fourcc, ts, te in _iter_boxes(payload, moov[0], moov[1]):
        if fourcc != b"trak":
            continue
        n_tracks += 1
        tkhd = _find_box(payload, ts, te, [b"tkhd"])
        if tkhd is not None and width == 0:
            v = payload[tkhd[0]]
            off = tkhd[0] + 4 + (32 if v == 1 else 20) + 8 + 2 * 2 + 4 + 36
            w16, h16 = struct.unpack_from(">II", payload, off)
            width, height = w16 >> 16, h16 >> 16  # 16.16 fixed point
        stsz = _find_box(payload, ts, te, [b"mdia", b"minf", b"stbl", b"stsz"])
        if stsz is not None:
            _flags, _ss, cnt = struct.unpack_from(">III", payload, stsz[0])
            n_samples += cnt
    return {
        "format": "mp4",
        "duration_ms": int(duration * 1000 // max(timescale, 1)),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "n_samples": n_samples,
    }


def encode_mp4_skeleton(
    duration_ms: int, w: int, h: int, n_samples: int, timescale: int = 1000
) -> bytes:
    """Minimal structurally-valid ISO-BMFF fixture: ftyp + moov(mvhd,
    trak(tkhd, mdia(minf(stbl(stsz))))) — headers only, no media data."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, timescale, dur) + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, 0)  # ctime mtime track_id rsv dur
        + b"\x00" * 8  # reserved
        + struct.pack(">HHI", 0, 0, 0)  # layer, group, volume+reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n_samples))
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2") + moov


# ---------------------------------------------------------------------------
# MP4 sample-table frame extraction (stsz/stsc/stco → per-sample byte
# ranges), so MJPEG-in-MP4 round-trips through the JPEG decoder the way
# AVI does (avi.py::avi_frame_ranges / decode_avi_frames)
# ---------------------------------------------------------------------------


def _full_box_payload(buf: bytes, s: int) -> int:
    """Skip the version+flags word of a full box → payload offset."""
    return s + 4


def mp4_sample_ranges(payload: bytes) -> list[tuple[int, int]]:
    """(start, end) absolute byte range of every sample in the first
    track that has a sample table — the ISO-BMFF demux: ``stsz`` gives
    per-sample sizes, ``stco`` chunk base offsets, ``stsc`` how many
    samples each chunk run holds; samples within a chunk are laid out
    back-to-back (ISO 14496-12 §8.7).  Indexing only — no sample byte
    is read, so a 2 GB video costs a few KB of moov parsing before the
    sampler decides which frames to decode."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise DecodeUnavailable("not an ISO-BMFF payload")
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    if moov is None:
        raise DecodeUnavailable("mp4: no moov")
    for fourcc, ts, te in _iter_boxes(payload, moov[0], moov[1]):
        if fourcc != b"trak":
            continue
        stbl = _find_box(payload, ts, te, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        stsz = _find_box(payload, stbl[0], stbl[1], [b"stsz"])
        stco = _find_box(payload, stbl[0], stbl[1], [b"stco"])
        stsc = _find_box(payload, stbl[0], stbl[1], [b"stsc"])
        if stsz is None or stco is None or stsc is None:
            continue
        # stsz: uniform size or per-sample table
        p = _full_box_payload(payload, stsz[0])
        uniform, n_samples = struct.unpack_from(">II", payload, p)
        if n_samples == 0:
            continue
        if uniform:
            sizes = [uniform] * n_samples
        else:
            sizes = list(struct.unpack_from(f">{n_samples}I", payload, p + 8))
        # stco: chunk offsets
        p = _full_box_payload(payload, stco[0])
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, p + 4))
        # stsc: (first_chunk, samples_per_chunk, sd_index) runs
        p = _full_box_payload(payload, stsc[0])
        (n_runs,) = struct.unpack_from(">I", payload, p)
        runs = [
            struct.unpack_from(">III", payload, p + 4 + 12 * i)
            for i in range(n_runs)
        ]
        # expand runs → samples per chunk
        per_chunk: list[int] = []
        for i, (first, spc, _sd) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        ranges: list[tuple[int, int]] = []
        si = 0
        for ci, base in enumerate(offsets):
            at = base
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                ranges.append((at, at + sizes[si]))
                at += sizes[si]
                si += 1
        if ranges:
            return ranges
    raise DecodeUnavailable("mp4: no track with a populated sample table")


def decode_mp4_frames(
    payload: bytes, indices: list[int] | None = None
) -> list:
    """Decode the selected (default: all) samples as JPEG → RGB arrays.
    Honest triage: a sample that isn't a JPEG bitstream (H.264 etc.)
    raises ``DecodeUnavailable`` instead of producing garbage."""
    from .jpeg import decode_jpeg

    ranges = mp4_sample_ranges(payload)
    if indices is None:
        indices = list(range(len(ranges)))
    out = []
    for i in indices:
        s, e = ranges[i]
        if payload[s : s + 2] != b"\xff\xd8":
            raise DecodeUnavailable("mp4: sample is not an MJPEG bitstream")
        out.append(decode_jpeg(payload[s:e]))
    return out


def encode_mp4_mjpeg(imgs: list, fps: int = 25) -> bytes:
    """Mux RGB frames as an MJPEG-in-MP4: real ``mdat`` of JPEG samples
    (one chunk per sample) + a correct ``stsz``/``stsc``/``stco``/
    ``stts`` sample table, so the demux above round-trips it
    byte-identically."""
    from .jpeg import encode_jpeg

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    samples = [encode_jpeg(img) for img in imgs]
    n = len(samples)
    h, w = (imgs[0].shape[0], imgs[0].shape[1]) if n else (0, 0)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat_at = len(ftyp)  # mdat box starts right after ftyp
    # absolute chunk offsets: one chunk per sample inside mdat's body
    offs, at = [], mdat_at + 8
    for smp in samples:
        offs.append(at)
        at += len(smp)
    timescale = 1000
    dur = n * timescale // max(fps, 1)
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHI", 0, 0, 0)
        + b"\x00" * 36
        + struct.pack(">II", w << 16, h << 16),
    )
    stsd = box(
        b"stsd",
        struct.pack(">B3xI", 0, 1)
        + box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1)),
    )
    stts = box(
        b"stts",
        struct.pack(">B3xI", 0, 1)
        + struct.pack(">II", n, timescale // max(fps, 1)),
    )
    stsc = box(b"stsc", struct.pack(">B3xI", 0, 1) + struct.pack(">III", 1, 1, 1))
    stsz = box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + struct.pack(f">{n}I", *[len(s) for s in samples]),
    )
    stco = box(b"stco", struct.pack(">B3xI", 0, n) + struct.pack(f">{n}I", *offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdhd = box(
        b"mdhd",
        struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = box(b"hdlr", struct.pack(">B3x", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + box(b"mdat", mdat_body) + moov


def synthesize_mp4_mjpeg_video(
    n: int = 8, frames: int = 12, w: int = 16, h: int = 12, seed: int = 4
) -> pa.Table:
    """Deterministic MJPEG MP4s with the SAME per-frame gradient recipe
    as ``avi.py::synthesize_avi_video`` — identical pixels in a third
    container, so cross-container decode identity is testable."""
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
        rows.append(encode_mp4_mjpeg(imgs, fps=25))
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


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2 audio) frame-header scan
# ---------------------------------------------------------------------------

_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLERATE_V1 = [44100, 48000, 32000]


def _parse_mp3_header(b0: int, b1: int, b2: int) -> tuple[int, int, int] | None:
    """(bitrate_kbps, samplerate_hz, frame_bytes) or None if invalid.
    MPEG-1 Layer III only (the overwhelming majority of crawl MP3s)."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3
    layer = (b1 >> 1) & 3
    if version != 3 or layer != 1:  # MPEG-1, Layer III
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 1
    bitrate = _BITRATE_V1_L3[br_idx]
    samplerate = _SAMPLERATE_V1[sr_idx]
    frame_bytes = 144 * bitrate * 1000 // samplerate + padding
    return bitrate, samplerate, frame_bytes


def mp3_metadata(payload: bytes) -> dict:
    """Frame-header metadata: sync to the first valid MPEG-1 Layer III
    header, validate by stepping ≥2 consecutive frames, estimate
    duration from size × bitrate (CBR assumption)."""
    n = len(payload)
    for start in range(min(n - 4, 4096)):
        h = _parse_mp3_header(payload[start], payload[start + 1], payload[start + 2])
        if h is None:
            continue
        bitrate, samplerate, frame_bytes = h
        nxt = start + frame_bytes
        if nxt + 4 <= n:
            h2 = _parse_mp3_header(payload[nxt], payload[nxt + 1], payload[nxt + 2])
            if h2 is None:
                continue  # false sync
        n_frames = (n - start) // frame_bytes
        return {
            "format": "mp3",
            "bitrate_kbps": bitrate,
            "samplerate_hz": samplerate,
            "duration_ms": int((n - start) * 8 // bitrate),  # bytes*8/(kbps) = ms
            "n_frames": n_frames,
        }
    raise DecodeUnavailable("mp3: no valid frame sync found")


def encode_mp3_skeleton(n_frames: int, bitrate_kbps: int = 128, samplerate: int = 44100) -> bytes:
    """CBR MPEG-1 Layer III frame skeletons (valid headers, zero
    payload) for parser fixtures."""
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _SAMPLERATE_V1.index(samplerate)
    frame_bytes = 144 * bitrate_kbps * 1000 // samplerate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0])
    frame = hdr + b"\x00" * (frame_bytes - 4)
    return frame * n_frames


# ---------------------------------------------------------------------------
# uniform actor-pool stage
# ---------------------------------------------------------------------------


def media_metadata_one(payload: bytes) -> dict:
    """Sniff + parse ONE payload's header → uniform metadata dict.

    Triage contract: NEVER raises.  Unrecognized bytes come back
    ``format="unknown"``; bytes whose magic is recognized but whose
    header is malformed (truncated moov, AVI without avih, …) come
    back ``format="corrupt:<fmt>"`` — one bad file must not fail a
    whole map_batches task."""
    try:
        return _media_metadata_one(payload)
    except Exception:
        sniffed = _sniff_format(payload)
        base = {"format": f"corrupt:{sniffed}" if sniffed else "unknown",
                "duration_ms": 0, "width": 0, "height": 0,
                "samplerate_hz": 0, "n_samples": 0, "n_tracks": 0}
        return base


def _sniff_format(payload: bytes) -> str:
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:2] == b"\xff\xfb" or payload[:3] == b"ID3":
        return "mp3"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return ""


def _media_metadata_one(payload: bytes) -> dict:
    from .multimodal import decode_ppm, decode_wav_pcm16

    base = {"format": "unknown", "duration_ms": 0, "width": 0, "height": 0,
            "samplerate_hz": 0, "n_samples": 0, "n_tracks": 0}
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        base.update(mp4_metadata(payload))
    elif payload[:2] == b"\xff\xfb" or payload[:3] == b"ID3":
        m = mp3_metadata(payload)
        base.update({k: m[k] for k in ("format", "duration_ms", "samplerate_hz")})
        base["n_samples"] = m["n_frames"] * 1152
    elif payload[:2] == b"P6":
        img = decode_ppm(payload)
        base.update({"format": "ppm", "height": img.shape[0], "width": img.shape[1]})
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", payload, 16)  # IHDR is always first
        base.update({"format": "png", "width": w, "height": h})
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        base.update({"format": "gif", "width": w, "height": h})
    elif payload[:2] == b"\xff\xd8":
        base["format"] = "jpeg"
        pos = 2  # marker scan to the first SOF for dimensions
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2):  # baseline/ext/progressive SOF
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                base.update({"width": w, "height": h})
                break
            pos += 2 + seglen
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, rate = decode_wav_pcm16(payload)
        base.update({"format": "wav", "samplerate_hz": rate,
                     "n_samples": len(samples),
                     "duration_ms": int(len(samples) * 1000 // max(rate, 1))})
    elif payload[:4] == b"fLaC":
        # STREAMINFO: bits 80..100 sample rate, 100..103 channels, ...
        info = int.from_bytes(payload[8:42], "big")  # 34-byte STREAMINFO
        rate = (info >> (272 - 80 - 20)) & ((1 << 20) - 1)
        total = (info >> (272 - 108 - 36)) & ((1 << 36) - 1)
        base.update({"format": "flac", "samplerate_hz": rate, "n_samples": total,
                     "duration_ms": int(total * 1000 // max(rate, 1))})
    elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .avi import avi_frame_ranges

        at = payload.index(b"avih") + 8
        usec, = struct.unpack_from("<I", payload, at)
        total, = struct.unpack_from("<I", payload, at + 16)
        w, h = struct.unpack_from("<II", payload, at + 32)
        base.update({"format": "avi", "width": w, "height": h,
                     "n_samples": len(avi_frame_ranges(payload)),
                     "duration_ms": int(usec * total // 1000)})
    return base


class MediaMetadataExtractor:
    """Actor-pool map_batches stage: one metadata row per payload —
    the decode-nothing triage pass over a mixed media column."""

    COLUMNS = ("format", "duration_ms", "width", "height",
               "samplerate_hz", "n_samples", "n_tracks")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].combine_chunks()
        rows = [media_metadata_one(p.as_py()) for p in batch["payload"].combine_chunks()]
        cols: dict = {"media_id": ids}
        cols["format"] = pa.array([r["format"] for r in rows], pa.string())
        for c in self.COLUMNS[1:]:
            cols[c] = pa.array([int(r[c]) for r in rows], pa.int64())
        return pa.table(cols)
