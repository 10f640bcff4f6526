"""Baseline JPEG codec — pure numpy + stdlib, from the public ITU T.81 spec.

Decoder: baseline sequential DCT (SOF0/SOF1), 8-bit, 1 or 3
components, any 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers
(DRI/RSTn). Entropy (huffman) decode is the inherently serial part —
exactly as in libjpeg — while all the heavy math (dequantize,
de-zigzag, 2-D IDCT, chroma upsample, YCbCr→RGB) runs as batched
numpy over EVERY block of a component at once, so per-image cost is
a short bit-parse plus a handful of matmuls.

Encoder: baseline SOF0 with the Annex K example quantization tables
(quality-scaled per the public IJG formula), Annex K huffman tables,
4:4:4 or 4:2:0 subsampling, optional restart interval. Used for
fixtures and sinks; FDCT is batched the same way.

Progressive (SOF2), arithmetic coding, 12-bit and hierarchical modes
raise :class:`~dcs_ray.functions.multimodal.DecodeUnavailable`.

Reference parity: Debian/dcs has no image pipeline; this module backs
the multimodal image stage (SURVEY §2 multimodal additions) so
``image_features`` can consume real crawl-style compressed payloads.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import DecodeUnavailable

# ---------------------------------------------------------------------------
# Constants from ITU T.81 (public spec)
# ---------------------------------------------------------------------------

# zigzag index -> natural (row-major) index
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example quantization tables (natural order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K typical huffman tables: (bits per code length 1..16, symbol values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: C[u, x] = a(u) * cos((2x+1) u pi / 16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _a, _x


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _maglen(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Canonical huffman code assignment (shared by encoder and decoder)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]):
    """-> list of (symbol, code, length) in code order."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_map(table) -> dict[int, tuple[int, int]]:
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(*table)}


class _HuffDecoder:
    """T.81 F.2.2.3 mincode/maxcode/valptr decode tables."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = list(vals)
        code = 0
        k = 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            n = bits[length - 1]
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over unstuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def get(self, nbits: int) -> int:
        while self.n < nbits:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, tbl: _HuffDecoder) -> int:
        code = self.get(1)
        length = 1
        while code > tbl.maxcode[length]:
            code = (code << 1) | self.get(1)
            length += 1
            if length > 16:
                raise DecodeUnavailable("corrupt huffman stream")
        return tbl.vals[tbl.valptr[length] + code - tbl.mincode[length]]

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.get(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (bits & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:  # pad with 1-bits per T.81 B.2.1.1
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H8, W8) uint8 plane -> (brows, bcols, 64) quantized int32, batched."""
    h, w = plane.shape
    br, bc = h // 8, w // 8
    blocks = (
        plane.reshape(br, 8, bc, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    )
    coef = _DCT @ blocks @ _DCT.T
    q = qtab.reshape(8, 8).astype(np.float64)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(br, bc, 64)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dcmap, acmap) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _maglen(diff)
    code, ln = dcmap[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    if len(nz) == 0:
        code, ln = acmap[0x00]
        bw.write(code, ln)
        return dc
    last = int(nz[-1]) + 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = acmap[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _maglen(v)
        code, ln = acmap[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = acmap[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) or (h, w, 3) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the resync path a real crawl exercises constantly).
    """
    img = np.asarray(img)
    assert img.dtype == np.uint8
    grey = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise DecodeUnavailable("empty image")
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if grey:
        samp = [(1, 1)]
        planes = [img]
        qsel = [0]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            he, we = (h + 1) & ~1, (w + 1) & ~1
            planes = [y]
            for p in (cb, cr):
                pad = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
                ds = pad.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
                planes.append(np.clip(np.round(ds), 0, 255).astype(np.uint8))
        else:
            raise ValueError("subsampling must be '444' or '420'")
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    coefs = []
    for (hi, vi), plane in zip(samp, planes):
        th, tw = mcu_rows * vi * 8, mcu_cols * hi * 8
        pad = np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge"
        )
        q = qy if len(coefs) == 0 else qc
        quant = _fdct_quant(pad, q)  # (brows, bcols, 64) natural order
        coefs.append(quant[:, :, _ZIGZAG])  # -> zigzag order

    # --- entropy-coded data ---
    dcmaps = [_encode_map(_DC_LUMA)] + [_encode_map(_DC_CHROMA)] * (len(samp) - 1)
    acmaps = [_encode_map(_AC_LUMA)] + [_encode_map(_AC_CHROMA)] * (len(samp) - 1)
    bw = _BitWriter()
    preds = [0] * len(samp)
    rst = 0
    mcu_idx = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += struct.pack(">H", 0xFFD0 + (rst & 7))
                rst += 1
                preds = [0] * len(samp)
            for ci, (hi, vi) in enumerate(samp):
                for v in range(vi):
                    for hh in range(hi):
                        zz = coefs[ci][my * vi + v, mx * hi + hh]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dcmaps[ci], acmaps[ci])
            mcu_idx += 1
    bw.pad_to_byte()

    # --- headers ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0))
    out += _marker(0xFFDB, bytes([0x00]) + bytes(qy[_ZIGZAG].tolist()))
    if not grey:
        out += _marker(0xFFDB, bytes([0x01]) + bytes(qc[_ZIGZAG].tolist()))
    nf = len(samp)
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    out += _marker(0xFFC0, sof)
    for tc, th, tbl in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        if grey and th == 1:
            continue
        bits, vals = tbl
        out += _marker(0xFFC4, bytes([(tc << 4) | th] + bits + vals))
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy data from ``pos`` → (unstuffed segments split on RSTn,
    position of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        nxt = payload.find(b"\xff", pos)
        if nxt < 0:
            cur += payload[pos:]
            pos = n
            break
        cur += payload[pos:nxt]
        if nxt + 1 >= n:
            pos = n
            break
        m = payload[nxt + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            pos = nxt + 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos = nxt + 2
        else:  # real marker terminates the scan
            segments.append(bytes(cur))
            return segments, nxt
    segments.append(bytes(cur))
    return segments, n


def _idct_plane(zz_coefs: np.ndarray, qtab_zz: np.ndarray) -> np.ndarray:
    """(brows, bcols, 64) zigzag quantized coefs -> (brows*8, bcols*8)
    uint8 plane: dequantize + de-zigzag + batched IDCT."""
    br, bc, _ = zz_coefs.shape
    deq = zz_coefs.astype(np.float64) * qtab_zz.astype(np.float64)
    nat = np.zeros((br, bc, 64))
    nat[:, :, _ZIGZAG] = deq
    blocks = nat.reshape(br, bc, 8, 8)
    pix = _DCT.T @ blocks @ _DCT + 128.0
    plane = pix.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
    return np.clip(np.round(plane), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w) uint8 (greyscale) or (h, w, 3)
    uint8 RGB. Raises :class:`DecodeUnavailable` for progressive /
    arithmetic / 12-bit streams."""
    if payload[:2] != b"\xff\xd8":
        raise DecodeUnavailable("not a JPEG payload")
    n = len(payload)
    pos = 2
    qtabs: dict[int, np.ndarray] = {}  # id -> 64 zigzag-order values
    huff: dict[tuple[int, int], _HuffDecoder] = {}  # (class, id) -> decoder
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    scan_comps = None
    restart_interval = 0
    coefs = None
    samp = None

    while pos < n:
        # skip fill bytes to the next marker
        while pos < n and payload[pos] != 0xFF:
            pos += 1
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > n:
            raise DecodeUnavailable("truncated JPEG marker")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    qtabs[tq] = np.frombuffer(
                        body, np.uint8, count=64, offset=off
                    ).astype(np.int64)
                    off += 64
                else:  # 16-bit table
                    qtabs[tq] = (
                        np.frombuffer(body, ">u2", count=64, offset=off).astype(np.int64)
                    )
                    off += 128
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 baseline-compatible
            prec, fh, fw, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise DecodeUnavailable("only 8-bit JPEG supported")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeUnavailable("progressive/extended JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise DecodeUnavailable("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            segments, pos = _split_scan(payload, pos)
            fh, fw, comps = frame
            if ns != len(comps):
                raise DecodeUnavailable("multi-scan JPEG unsupported")
            by_id = {c[0]: c for c in comps}
            samp = [(by_id[cs][1], by_id[cs][2]) for cs, _, _ in scan_comps]
            hmax = max(s[0] for s in samp)
            vmax = max(s[1] for s in samp)
            mcu_cols = -(-fw // (8 * hmax))
            mcu_rows = -(-fh // (8 * vmax))
            coefs = [
                np.zeros((mcu_rows * vi, mcu_cols * hi, 64), np.int32)
                for hi, vi in samp
            ]
            dctabs, actabs = [], []
            for _, td, ta in scan_comps:
                if (0, td) not in huff or (1, ta) not in huff:
                    raise DecodeUnavailable("missing huffman table")
                dctabs.append(huff[(0, td)])
                actabs.append(huff[(1, ta)])
            preds = [0] * ns
            seg_i = 0
            br = _BitReader(segments[0] if segments else b"")
            ri = restart_interval
            mcu_idx = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    if ri and mcu_idx and mcu_idx % ri == 0:
                        seg_i += 1
                        if seg_i >= len(segments):
                            raise DecodeUnavailable("missing restart segment")
                        br = _BitReader(segments[seg_i])
                        preds = [0] * ns
                    for ci, (hi, vi) in enumerate(samp):
                        for v in range(vi):
                            for hh in range(hi):
                                zz = coefs[ci][my * vi + v, mx * hi + hh]
                                s = br.huff(dctabs[ci])
                                preds[ci] += br.receive_extend(s)
                                zz[0] = preds[ci]
                                k = 1
                                while k < 64:
                                    sym = br.huff(actabs[ci])
                                    r, s = sym >> 4, sym & 0x0F
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise DecodeUnavailable("AC index overflow")
                                    zz[k] = br.receive_extend(s)
                                    k += 1
                    mcu_idx += 1
        # APPn / COM / others: skipped via seglen

    if frame is None or coefs is None or samp is None or scan_comps is None:
        raise DecodeUnavailable("no scan data found")
    fh, fw, comps = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    for (cs, _, _), (hi, vi), zz in zip(scan_comps, samp, coefs):
        tq = by_id[cs][3]
        if tq not in qtabs:
            raise DecodeUnavailable("missing quantization table")
        plane = _idct_plane(zz, qtabs[tq])
        comp_h = -(-fh * vi // vmax)
        comp_w = -(-fw * hi // hmax)
        plane = plane[:comp_h, :comp_w]
        if vi != vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi != hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise DecodeUnavailable("only 1- or 3-component JPEG supported")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
