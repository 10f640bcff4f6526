"""FLAC subset codec — pure Python/numpy from the public FLAC spec
(xiph.org/flac/format.html). Lossless: decode(encode(x)) == x exactly.

Decoder: STREAMINFO + frame stream; CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC subframes, rice-coded residuals (methods 0 and 1,
partition orders >= 0, escape-to-raw partitions), wasted bits, mono
and independent stereo, 16-bit samples; header CRC-8, frame CRC-16
and the STREAMINFO MD5 are all verified. The rice quotient scan is
the inherently serial part (a pointer walk over the frame's 1-bit
positions); warmups, remainders and fixed-predictor integration are
vectorized numpy (``np.cumsum`` per order level).

Encoder (for fixtures/sinks): fixed 4096-sample blocks, per-block
best-of fixed predictor order 0-4 by Rice-bit cost, single-partition
rice residuals with optimal parameter, CONSTANT/VERBATIM fallbacks.

Reference parity: Debian/dcs has no audio pipeline; this backs the
multimodal audio stages (SURVEY §2 multimodal additions) next to the
RIFF/WAVE PCM16 path in :mod:`dcs_ray.functions.multimodal`.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .multimodal import DecodeUnavailable

_MAGIC = b"fLaC"

# ---------------------------------------------------------------------------
# CRCs (table-driven, polynomials from the FLAC spec)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TBL[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, per the spec)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over a numpy bit array; rice quotients scan a
    precomputed 1-bit position index instead of walking bit by bit."""

    def __init__(self, data: bytes, start_byte: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = start_byte * 8
        self.ones = np.flatnonzero(self.bits)
        self._pw = (1 << np.arange(63, -1, -1)).astype(object)

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        if end > len(self.bits):
            raise DecodeUnavailable("truncated FLAC bitstream")
        chunk = self.bits[self.pos : end]
        self.pos = end
        return int(chunk @ self._pw[-nbits:])

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        j = int(np.searchsorted(self.ones, self.pos))
        if j >= len(self.ones):
            raise DecodeUnavailable("truncated unary code")
        one = int(self.ones[j])
        q = one - self.pos
        self.pos = one + 1
        return q

    def read_rice_block(self, n: int, k: int) -> np.ndarray:
        """n rice(k) codes → signed int64 (zigzag undone). Quotients via
        the ones index (serial pointer walk); remainders gathered and
        folded in one vectorized pass."""
        if n == 0:
            return np.zeros(0, np.int64)
        ones = self.ones
        pos = self.pos
        q = np.empty(n, np.int64)
        rem_start = np.empty(n, np.int64)
        j = int(np.searchsorted(ones, pos))
        for i in range(n):
            while ones[j] < pos:  # skip 1-bits consumed by remainders
                j += 1
                if j >= len(ones):
                    raise DecodeUnavailable("truncated rice stream")
            one = int(ones[j])
            q[i] = one - pos
            rem_start[i] = one + 1
            pos = one + 1 + k
            j += 1
        if pos > len(self.bits):
            raise DecodeUnavailable("truncated rice stream")
        self.pos = pos
        u = q << k
        if k:
            idx = rem_start[:, None] + np.arange(k)
            rem = self.bits[idx].astype(np.int64) @ (
                1 << np.arange(k - 1, -1, -1)
            ).astype(np.int64)
            u |= rem
        return (u >> 1) ^ -(u & 1)  # zigzag → signed

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: np.array([], np.int64),
    1: np.array([1], np.int64),
    2: np.array([2, -1], np.int64),
    3: np.array([3, -3, 1], np.int64),
    4: np.array([4, -6, 4, -1], np.int64),
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-th difference given ``order`` warmup samples."""
    w = warmup.astype(np.int64)
    pyr = [w]
    for _ in range(order):
        pyr.append(np.diff(pyr[-1]))
    cur = res.astype(np.int64)
    for lvl in range(order, 0, -1):
        cur = np.cumsum(cur) + pyr[lvl - 1][-1] if len(pyr[lvl - 1]) else np.cumsum(cur)
    return np.concatenate([w, cur])


def _utf8_number(v: int) -> bytes:
    """UTF-8-style coded number (frame index), per the spec."""
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 6:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = b0 & (0x3F >> n)
    for _ in range(n):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise DecodeUnavailable("bad UTF-8 coded frame number")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _best_rice_k(res: np.ndarray) -> tuple[int, int]:
    u = (res << 1) ^ (res >> 63)  # zigzag
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 15):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
    return best_k, best_c


def _write_rice(bw: _BitWriter, res: np.ndarray, k: int) -> None:
    u = (res << 1) ^ (res >> 63)
    for v in u.tolist():
        bw.write_unary(v >> k)
        if k:
            bw.write(v & ((1 << k) - 1), k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    xi = x.astype(np.int64)
    if np.all(xi == xi[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(xi[0]) & ((1 << bps) - 1), bps)
        return
    # pick the fixed order with the cheapest single-partition rice body
    best = None
    for order in range(min(5, len(xi))):
        res = _fixed_residual(xi, order)
        k, cost = _best_rice_k(res)
        total = cost + order * bps
        if best is None or total < best[3]:
            best = (order, res, k, total)
    order, res, k, total = best
    if total >= len(xi) * bps:  # VERBATIM cheaper
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in xi.tolist():
            bw.write(v & ((1 << bps) - 1), bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for v in xi[:order].tolist():  # warmup
        bw.write(v & ((1 << bps) - 1), bps)
    bw.write(0, 2)  # residual method 0 (4-bit rice params)
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    _write_rice(bw, res, k)


def encode_flac(
    samples: np.ndarray, rate: int = 32000, block_size: int = 4096
) -> bytes:
    """int16 samples, shape (n,) mono or (n, 2) stereo → FLAC bytes."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise DecodeUnavailable("encode_flac: int16 samples only")
    if x.ndim == 1:
        chans = [x]
    elif x.ndim == 2 and x.shape[1] in (1, 2):
        chans = [x[:, c] for c in range(x.shape[1])]
    else:
        raise DecodeUnavailable("encode_flac: mono or stereo only")
    n = len(chans[0])
    bps = 16

    frames = bytearray()
    min_fs = max_fs = None
    for fi, start in enumerate(range(0, n, block_size)):
        bs = min(block_size, n - start)
        hdr = bytearray(b"\xff\xf8")  # sync + fixed-blocksize strategy
        hdr.append((0b0111 << 4) | 0b0000)  # 16-bit blocksize-1 follows; rate: STREAMINFO
        hdr.append((len(chans) - 1) << 4 | (0b100 << 1))  # channels, 16-bit
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        for ch in chans:
            _encode_subframe(bw, ch[start : start + bs], bps)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        min_fs = len(frame) if min_fs is None else min(min_fs, len(frame))
        max_fs = len(frame) if max_fs is None else max(max_fs, len(frame))

    md5 = hashlib.md5(
        np.stack(chans, axis=1).astype("<i2").tobytes()
    ).digest()
    # min/max block size over all blocks (the last block may be short)
    last = n % block_size or block_size
    si_bw = _BitWriter()
    si_bw.write(min(block_size, last) if n else block_size, 16)
    si_bw.write(block_size if n > block_size else last, 16)
    si_bw.write(min_fs or 0, 24)
    si_bw.write(max_fs or 0, 24)
    si_bw.write(rate, 20)
    si_bw.write(len(chans) - 1, 3)
    si_bw.write(bps - 1, 5)
    si_bw.write(n, 36)
    body = si_bw.bytes() + md5
    out = bytearray(_MAGIC)
    out.append(0x80 | 0x00)  # last metadata block, type STREAMINFO
    out += struct.pack(">I", len(body))[1:]
    out += body
    out += frames
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise DecodeUnavailable("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted bits: unary count - 1
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(bs, v, np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(bs)], np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        res = _decode_residual(br, bs, order)
        out = _restore_fixed(warm, res, order)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise DecodeUnavailable("invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise DecodeUnavailable("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        xs = out  # serial IIR — the honest non-vectorizable part
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += coefs[j] * xs[i - 1 - j]
            xs[i] = res[i - order] + (acc >> shift)
    else:
        raise DecodeUnavailable(f"reserved subframe type {stype}")
    return out << wasted


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise DecodeUnavailable("reserved residual method")
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise DecodeUnavailable("block size not divisible by partitions")
    out = []
    for p in range(nparts):
        n = bs // nparts - (order if p == 0 else 0)
        k = br.read(plen)
        if k == esc:  # escape: raw nbits two's-complement
            nb = br.read(5)
            if nb:
                out.append(
                    np.array([br.read_signed(nb) for _ in range(n)], np.int64)
                )
            else:
                out.append(np.zeros(n, np.int64))
        else:
            out.append(br.read_rice_block(n, k))
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int16 samples — (n,) mono or (n, ch) multichannel —
    sample rate). CRC-8/CRC-16/MD5 verified."""
    if payload[:4] != _MAGIC:
        raise DecodeUnavailable("not a FLAC payload")
    pos = 4
    rate = nch = bps = total = None
    md5_want = None
    while True:
        if pos + 4 > len(payload):
            raise DecodeUnavailable("truncated metadata")
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5_want = body[18:34]
        pos += 4 + blen
        if hdr & 0x80:
            break
    if rate is None:
        raise DecodeUnavailable("missing STREAMINFO")
    if bps != 16:
        raise DecodeUnavailable("only 16-bit FLAC supported")

    chans_out: list[list[np.ndarray]] = [[] for _ in range(nch)]
    got = 0
    while got < total:
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise DecodeUnavailable("lost frame sync")
        br = _BitReader(payload, start_byte=pos)
        br.read(16)  # sync + reserved + blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        size_code = br.read(3)
        if br.read(1):
            raise DecodeUnavailable("bad frame header reserved bit")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code == 0b0001:
            bs = 192
        else:
            raise DecodeUnavailable("reserved block size code")
        if rate_code == 0b1100:
            br.read(8)
        elif rate_code in (0b1101, 0b1110):
            br.read(16)
        elif rate_code == 0b1111:
            raise DecodeUnavailable("invalid sample rate code")
        hdr_end = br.pos // 8
        if _crc8(payload[pos : hdr_end]) != br.read(8):
            raise DecodeUnavailable("frame header CRC-8 mismatch")
        if size_code not in (0b100,):  # 16-bit only (0 = from STREAMINFO ok too)
            if size_code != 0:
                raise DecodeUnavailable("only 16-bit frames supported")
        if chan_code >= 0b1000:
            raise DecodeUnavailable("stereo decorrelation not supported (subset)")
        fch = chan_code + 1
        if fch != nch:
            raise DecodeUnavailable("frame/stream channel mismatch")
        subs = [_decode_subframe(br, bs, 16) for _ in range(fch)]
        br.align()
        crc_end = br.pos // 8
        want = struct.unpack(">H", payload[crc_end : crc_end + 2])[0]
        if _crc16(payload[pos:crc_end]) != want:
            raise DecodeUnavailable("frame CRC-16 mismatch")
        for c in range(fch):
            chans_out[c].append(subs[c])
        got += bs
        pos = crc_end + 2

    chans = [np.concatenate(c)[:total] for c in chans_out]
    out16 = np.stack(chans, axis=1).astype(np.int16)
    if hashlib.md5(out16.astype("<i2").tobytes()).digest() != md5_want:
        raise DecodeUnavailable("MD5 mismatch: decoded audio differs")
    return (out16[:, 0] if nch == 1 else out16), rate
