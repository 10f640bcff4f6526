"""GIF87a/89a codec — pure Python/numpy from the public GIF spec.

Decoder: logical screen + global/local color tables, LZW decompression,
interlace de-weaving, multi-frame (animated) streams with disposal
handling kept simple (each frame composited over the previous canvas —
the common browser behavior for disposal 0/1). The LZW code loop is the
inherently serial part; palette application and interlace gather are
vectorized numpy.

Encoder (for fixtures/sinks): single- or multi-frame, 256-color
palette built by exact color count (images with >256 distinct colors
are rejected — fixtures are synthetic), LZW-compressed with a fresh
dictionary per clear code.

Reference parity: Debian/dcs has no image pipeline; this module backs
the multimodal image/video stages (SURVEY §2 multimodal additions) —
a static GIF decodes through ``decode_image``; an animated GIF feeds
frame sampling like the concatenated-PPM video path.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import DecodeUnavailable

_GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index stream (stops at EOI or when
    ``n_expected`` pixels are produced)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    out = np.empty(n_expected, np.uint8)
    n_out = 0
    # dictionary as (prefix_code, last_byte) arrays; first byte cached
    max_entries = 4096
    prefix = np.full(max_entries, -1, np.int32)
    last = np.zeros(max_entries, np.uint8)
    first = np.zeros(max_entries, np.uint8)
    for c in range(clear):
        last[c] = c
        first[c] = c
    next_code = eoi + 1
    code_size = min_code_size + 1
    prev_code = -1
    buf = bytearray(32)  # scratch for expanding one code's byte chain

    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out[:n_out]
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev_code = -1
            continue
        if code == eoi:
            return out[:n_out]
        if code >= next_code + 1 or (code == next_code and prev_code < 0):
            raise DecodeUnavailable("corrupt LZW stream")

        if code == next_code:  # KwKwK case: emit prev + first(prev)
            emit_code = prev_code
            extra = first[prev_code]
            has_extra = True
        else:
            emit_code = code
            extra = 0
            has_extra = False
        # expand emit_code's chain (reversed), bounded by 4096
        n = 0
        c = emit_code
        while c >= 0:
            if n >= len(buf):
                buf.extend(bytes(len(buf)))
            buf[n] = last[c]
            c = prefix[c]
            n += 1
        end = min(n_out + n + (1 if has_extra else 0), n_expected)
        chain = np.frombuffer(bytes(buf[:n]), np.uint8)[::-1]
        take = min(n, end - n_out)
        out[n_out : n_out + take] = chain[:take]
        n_out += take
        if has_extra and n_out < end:
            out[n_out] = extra
            n_out += 1
        if n_out >= n_expected:
            return out
        if prev_code >= 0 and next_code < max_entries:
            # new entry = string(prev) + first byte of the just-emitted
            # string (== extra in the KwKwK case)
            prefix[next_code] = prev_code
            last[next_code] = extra if has_extra else first[emit_code]
            first[next_code] = first[prev_code]
            next_code += 1
            if next_code < max_entries and next_code == (1 << code_size):
                code_size += 1
        prev_code = code


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder with a dict-of-tuples table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {(-1, int(c)): c for c in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    prev = -1
    for v in indices.tolist():
        key = (prev, v)
        hit = table.get(key)
        if hit is not None:
            prev = hit
            continue
        put(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:  # table full: emit clear, reset
            put(clear)
            table = {(-1, int(c)): c for c in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prev = v
    if prev >= 0:
        put(prev)
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_gif(frames: np.ndarray | list[np.ndarray], delay_cs: int = 4) -> bytes:
    """One (h, w, 3) uint8 frame or a list of same-shape frames →
    GIF89a. All frames together must use <= 256 distinct colors (true
    for synthetic fixtures; real encoders quantize)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(
        flat.astype(np.uint32) @ np.array([65536, 256, 1], np.uint32),
        return_inverse=True,
    )
    if len(colors) > 256:
        raise DecodeUnavailable("encode_gif: >256 distinct colors (no quantizer)")
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(colors), 0] = colors >> 16
    pal[: len(colors), 1] = (colors >> 8) & 0xFF
    pal[: len(colors), 2] = colors & 0xFF
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries
    out += pal.tobytes()
    if len(frames) > 1:
        # NETSCAPE loop extension (public extension block)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    idx_stream = inverse.astype(np.uint8)
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x00])
        out.append(8)  # LZW min code size
        body = _lzw_encode(idx_stream[off : off + n], 8)
        off += n
        for i in range(0, len(body), 255):
            chunk = body[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (h, w, 3) uint8 RGB frames (composited over
    the running canvas). Transparency renders as the underlying canvas
    pixel (disposal kept simple; fixtures don't use disposal 2/3)."""
    if payload[:6] not in _GIF_SIGS:
        raise DecodeUnavailable("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if global_pal is not None:
        canvas[:] = global_pal[payload[11] % len(global_pal)]
    frames: list[np.ndarray] = []
    transparent_idx = -1

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gce = payload[pos + 1 : pos + 1 + size]
                transparent_idx = gce[3] if (gce[0] & 0x01) else -1
                pos += 1 + size
            while payload[pos] != 0:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
            iflags = payload[pos + 8]
            pos += 9
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise DecodeUnavailable("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            body = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                body += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(body), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise DecodeUnavailable("truncated GIF image data")
            grid = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: de-weave rows
                de = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    nrows = len(rows)
                    de[start::step] = grid[src : src + nrows]
                    src += nrows
                grid = de
            rgb = pal[np.minimum(grid, len(pal) - 1)]
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transparent_idx >= 0:
                mask = (grid == transparent_idx)[:, :, None]
                region[:] = np.where(mask, region, rgb)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            transparent_idx = -1
        else:
            raise DecodeUnavailable(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise DecodeUnavailable("GIF with no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First (or only) frame of a GIF → (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]
