"""Baseline JPEG (ITU-T T.81 / JFIF) codec on stdlib + NumPy only.

The decoder is REAL and general over baseline, extended-sequential,
and FULL progressive files: marker walk (APPn/COM skipped by length),
8-bit DQT tables, SOF0/1/2 frame headers with arbitrary per-component
sampling factors (4:4:4, 4:2:0, 4:2:2, ...), DHT canonical Huffman
tables read FROM THE FILE, DRI restart intervals, interleaved-MCU and
non-interleaved (single-component) entropy decode (DC prediction +
category/extend, AC run-length with ZRL/EOB, progressive EOBn block
runs), spectral selection AND successive approximation (shifted-
domain DC/AC first passes, DC bit refinement, the T.81 G.1.2.3 AC
refinement dataflow with correction bits interleaved into symbol
advances and EOB runs — the libjpeg default progressive script),
0xFF00 byte unstuffing, every scan accumulating into one coefficient
store, then dequantize -> un-zigzag -> vectorized einsum IDCT per
component, nearest-neighbor chroma upsampling and BT.601 YCbCr->RGB.
The arithmetic/hierarchical/lossless frame types are rejected by
their markers with ``NotImplementedError`` — scoped, never silently
misdecoded.

The encoders exist for fixtures/tests (JPEG is lossy, so sequential
roundtrips assert tolerance): forward DCT + Annex-K-style
quality-scaled quantization tables, 4:4:4 or 4:2:0 sampling, optional
restart intervals, and self-describing FLAT canonical Huffman tables
(every DC category at 4 bits, every AC run/size/EOBn symbol at 8
bits — a valid incomplete code, emitted in DHT and therefore
exercising the decoder's general table reader rather than a baked-in
Annex K copy). ``encode_jpeg_progressive`` emits the SAME quantized
coefficients as the sequential encoder across a DC scan + per-band AC
scans with accumulated EOB runs, so progressive-vs-baseline decode
equality is exact and pinned in tests.

Reference semantics parity: the reference pipeline has no multimodal
surface at all; this module extends the engine's binary-column decode
family (operators/multimodal.py) to the dominant real-world image
codec so a 100-TB multimodal corpus needs no extra library for
dims/intensity/thumbnail features.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> natural (row-major) linear index, generated from the
# diagonal walk of T.81 figure A.6 (even diagonals run bottom-left to
# top-right).
_ZZ = np.array(
    [
        (r * 8 + s - r)
        for s in range(15)
        for r in (
            range(min(s, 7), max(0, s - 7) - 1, -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: C[u, x] = c(u) cos((2x+1) u pi / 16)
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex K base quantization tables (natural order)
_QLUM = np.array(
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
    dtype=np.float64,
)
_QCHR = np.array(
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
    dtype=np.float64,
)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * s + 50) / 100), 1, 255)


# --- Huffman ---------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """(length, code) -> symbol from the canonical (BITS, HUFFVAL)
    spec encoding (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# flat fixture tables: DC categories 0..11 at 4 bits, AC symbols at 8
# (run/size pairs, ZRL, EOB, and the progressive EOBn run symbols)
_DC_SYMS = list(range(12))
_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8
_DC_ENC = {sym: (i, 4) for i, sym in enumerate(_DC_SYMS)}
_AC_ENC = {sym: (i, 8) for i, sym in enumerate(_AC_SYMS)}


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                if self.data[self.pos + 1] != 0x00:
                    raise ValueError("marker inside entropy-coded segment")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def expect_restart(self) -> None:
        self.n = 0  # discard pad bits
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _decode_sym(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = 0
    for _ in range(size):
        v = (v << 1) | r.read_bit()
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- decoder ----------------------------------------------------------------


def decode_jpeg(raw: bytes) -> np.ndarray:
    """HxWx3 (or HxWx1 for grayscale files) uint8 from a baseline,
    extended-sequential, or progressive (spectral-selection) JPEG.
    Every scan accumulates into one persistent per-component
    coefficient store; reconstruction (dequantize -> IDCT -> upsample
    -> color) runs once at EOI. Progressive successive approximation
    (Ah/Al != 0) is rejected by the scan-header field."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    scanned = False
    i = 2
    while i < len(raw):
        if raw[i] != 0xFF:
            raise ValueError("marker sync lost")
        m = raw[i + 1]
        if m == 0xFF:  # optional fill byte before a marker (B.1.1.2)
            i += 1
            continue
        if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:  # SOI/TEM/stray RST
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", raw, i + 2)[0]
        seg = raw[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quantization table")
                tbl = np.zeros(64)
                tbl[_ZZ] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qtables[tq] = tbl
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                htables[(tc, th)] = _build_decode_table(
                    bits, seg[j + 17 : j + 17 + nv]
                )
                j += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / prog.
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = _init_frame(h, w, comps, progressive=(m == 0xC2))
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type 0x{m:02x}")
        elif m == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS: entropy-coded scan follows
            if frame is None:
                raise ValueError("SOS before SOF")
            i = _decode_scan(raw, i + 2 + ln, seg, frame, htables, restart)
            scanned = True
            continue
        i += 2 + ln
    if frame is None or not scanned:
        raise ValueError("JPEG contains no scan")
    return _reconstruct(frame, qtables)


def _init_frame(h, w, comps, progressive):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mx * c["h"]
        c["bh"] = my * c["v"]
        # non-interleaved (single-component) scans cover the grid of
        # the component's OWN sample dims, not the MCU-rounded grid
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-ch_ // 8)
        # integer store: successive-approximation refinement is bitwise
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
    return {
        "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
        "mx": mx, "my": my, "progressive": progressive,
    }


def _receive(r: _BitReader, n: int) -> int:
    v = 0
    for _ in range(n):
        v = (v << 1) | r.read_bit()
    return v


def _decode_scan(raw, pos, seg, frame, htables, restart):
    """Decode one entropy-coded scan into frame['comps'][*]['coef'];
    returns the byte position just past the scan data."""
    ns = seg[0]
    sel = {}
    order = []
    for c in range(ns):
        cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        sel[cid] = (tt >> 4, tt & 15)
        order.append(cid)
    ss_, se_, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    comps = [c for c in frame["comps"] if c["id"] in sel]
    if not frame["progressive"]:
        if (ss_, se_) != (0, 63):
            raise ValueError("sequential scan must cover the full band")
        if ah or al:
            raise ValueError("sequential scan with Ah/Al set")
    r = _BitReader(raw, pos)
    for c in comps:
        c["pred"] = 0

    def full_block(c, blk_idx, dc_tbl, ac_tbl):
        blk = c["coef"][blk_idx]
        t = _decode_sym(r, dc_tbl)
        c["pred"] += _receive_extend(r, t)
        blk[0] = c["pred"]
        k = 1
        while k < 64:
            rs = _decode_sym(r, ac_tbl)
            rr, s = rs >> 4, rs & 15
            if s == 0:
                if rr == 15:
                    k += 16
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise ValueError("JPEG AC index overrun")
            blk[_ZZ[k]] = _receive_extend(r, s)
            k += 1

    prog_dc = frame["progressive"] and ss_ == 0
    if ns == 1 and (frame["progressive"] or len(frame["comps"]) > 1):
        # non-interleaved: the scan walks the component's own grid
        # (progressive DC/AC-band scans, and sequential per-component
        # scans of multi-component frames)
        _single_component_scan(
            r, comps[0], sel, htables, restart, ss_, se_, ah, al
        )
        return r.pos
    # interleaved MCU walk: sequential full scans and progressive
    # multi-component DC scans (first pass or refinement)
    since = 0
    for myi in range(frame["my"]):
        for mxi in range(frame["mx"]):
            if restart and since == restart:
                r.expect_restart()
                since = 0
                for c in comps:
                    c["pred"] = 0
            since += 1
            for c in comps:
                dct, act = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bidx = (myi * c["v"] + by) * c["bw"] + (
                            mxi * c["h"] + bx
                        )
                        if prog_dc:
                            _dc_block(r, c, bidx, htables[(0, dct)], ah, al)
                        else:
                            full_block(
                                c, bidx,
                                htables[(0, dct)], htables[(1, act)],
                            )
    return r.pos


def _dc_block(r, c, bidx, dc_tbl, ah, al):
    """Progressive DC: first pass decodes the shifted-domain diff;
    refinement ORs in one magnitude bit (two's-complement arithmetic
    shifts make both exact for negatives, T.81 G.1.2.1)."""
    if ah:
        if r.read_bit():
            c["coef"][bidx][0] |= 1 << al
    else:
        t = _decode_sym(r, dc_tbl)
        c["pred"] += _receive_extend(r, t)
        c["coef"][bidx][0] = c["pred"] << al


def _single_component_scan(r, c, sel, htables, restart, ss_, se_, ah, al):
    """Non-interleaved scan over one component's own block grid:
    sequential full-band, progressive DC, progressive AC first pass
    (values arrive in the Al-shifted domain, EOBn block runs), or
    progressive AC successive-approximation refinement (T.81 G.1.2.3:
    one new-coefficient symbol stream interleaved with correction
    bits for every already-nonzero coefficient passed over)."""
    dct, act = sel[c["id"]]
    eobrun = 0
    since = 0
    c["pred"] = 0
    for row in range(c["nbh"]):
        for col in range(c["nbw"]):
            if restart and since == restart:
                r.expect_restart()
                since = 0
                c["pred"] = 0
                eobrun = 0
            since += 1
            blk = c["coef"][row * c["bw"] + col]
            if ss_ == 0 and se_ == 0:  # progressive DC
                _dc_block(r, c, row * c["bw"] + col, htables[(0, dct)], ah, al)
                continue
            if ss_ == 0:  # sequential full band, non-interleaved
                t = _decode_sym(r, htables[(0, dct)])
                c["pred"] += _receive_extend(r, t)
                blk[0] = c["pred"]
                k = 1
            elif ah:  # AC refinement
                eobrun = _ac_refine_block(
                    r, blk, htables[(1, act)], ss_, se_, al, eobrun
                )
                continue
            else:  # progressive AC first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss_
            ac_tbl = htables[(1, act)]
            while k <= se_:
                rs = _decode_sym(r, ac_tbl)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr == 15:
                        k += 16
                        continue
                    if ss_ > 0:  # EOBn: run of (1<<rr)+bits blocks
                        eobrun = (1 << rr) - 1 + (
                            _receive(r, rr) if rr else 0
                        )
                    break
                k += rr
                if k > se_:
                    raise ValueError("JPEG AC index overrun")
                blk[_ZZ[k]] = _receive_extend(r, s) << al
                k += 1


def _ac_refine_block(r, blk, ac_tbl, ss_, se_, al, eobrun):
    """One block of an AC successive-approximation refinement scan;
    returns the updated EOB-run counter. Already-nonzero coefficients
    receive a correction bit as the position pointer passes them; runs
    and new ±1<<Al coefficients count zero-HISTORY positions only."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if r.read_bit() and not (int(blk[_ZZ[k]]) & p1):
            blk[_ZZ[k]] += p1 if blk[_ZZ[k]] >= 0 else m1

    k = ss_
    if eobrun == 0:
        while k <= se_:
            rs = _decode_sym(r, ac_tbl)
            rr, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = p1 if r.read_bit() else m1
            elif rr != 15:
                eobrun = (1 << rr) - 1 + (_receive(r, rr) if rr else 0)
                break  # remaining positions handled below
            # advance: skip rr zero-history positions (16 for ZRL),
            # refining every nonzero coefficient passed over
            while k <= se_:
                if blk[_ZZ[k]] != 0:
                    correct(k)
                else:
                    rr -= 1
                    if rr < 0:
                        break
                k += 1
            if newval:
                if k > se_:
                    raise ValueError("JPEG AC refinement overrun")
                blk[_ZZ[k]] = newval
            k += 1
        else:
            return eobrun  # band exhausted without an EOBn
        # fall through: EOBn read mid-block — refine the rest
        for kk in range(k, se_ + 1):
            if blk[_ZZ[kk]] != 0:
                correct(kk)
        return eobrun
    # block entirely inside an EOB run: every nonzero coefficient in
    # the band still receives its correction bit
    for kk in range(ss_, se_ + 1):
        if blk[_ZZ[kk]] != 0:
            correct(kk)
    return eobrun - 1


def _reconstruct(frame, qtables):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        f = (c["coef"] * q).reshape(-1, 8, 8)
        px = np.einsum("ux,nuv,vy->nxy", _C, f, _C) + 128.0
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    rch = y + 1.402 * (cr - 128)
    gch = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    bch = y + 1.772 * (cb - 128)
    return np.clip(
        np.rint(np.stack([rch, gch, bch], axis=2)), 0, 255
    ).astype(np.uint8)


# --- encoder (fixtures/tests) ----------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)


def _encode_block(wtr: _BitWriter, coef: np.ndarray, pred: int) -> int:
    zz = coef[_ZZ].astype(np.int64)
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    code, ln = _DC_ENC[size]
    wtr.write(code, ln)
    if size:
        wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = _AC_ENC[0xF0]
            wtr.write(c, l)
            run -= 16
        size = int(abs(v)).bit_length()
        c, l = _AC_ENC[(run << 4) | size]
        wtr.write(c, l)
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, l = _AC_ENC[0x00]
        wtr.write(c, l)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n_blocks_y * n_blocks_x, 64) quantized DCT coefficients of an
    edge-padded plane."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)), "edge")
    blocks = (
        p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ) - 128.0
    f = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    return np.rint(f.reshape(-1, 64) / q).astype(np.int64)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 92,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for an HxWx{1,3} uint8 array. Grayscale
    input emits a 1-component file; color emits YCbCr at 4:4:4 or
    4:2:0. Huffman tables are the module's flat canonical fixtures,
    written into DHT (self-describing stream)."""
    h, w, nch = img.shape
    qlum = _quality_scale(_QLUM, quality)
    qchr = _quality_scale(_QCHR, quality)
    if nch == 1:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    elif nch == 3:
        rgb = img.astype(np.float64)
        rch, gch, bch = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * rch + 0.587 * gch + 0.114 * bch
        cb = -0.168736 * rch - 0.331264 * gch + 0.5 * bch + 128
        cr = 0.5 * rch - 0.418688 * gch - 0.081312 * bch + 128
        if subsampling == "4:4:4":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "4:2:0":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            sub = []
            for p in (cb, cr):
                pp = np.pad(p, ((0, ph - h), (0, pw - w)), "edge")
                sub.append(
                    pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
            planes, samp = [y, *sub], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        qsel = [0, 1, 1]
    else:
        raise ValueError("encode_jpeg wants HxWx1 or HxWx3")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    comp_blocks = []
    for p, (sh, sv), qs in zip(planes, samp, qsel):
        q = qlum if qs == 0 else qchr
        # pad the plane so its block grid is exactly (my*sv, mx*sh)
        th, tw = my * sv * 8, mx * sh * 8
        pp = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            "edge",
        )
        comp_blocks.append((_plane_blocks(pp, q), mx * sh))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, qlum),) + (((1, qchr),) if nch == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += q[_ZZ].astype(np.uint8).tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes))
    for ci, ((sh, sv), qs) in enumerate(zip(samp, qsel)):
        out += bytes([ci + 1, (sh << 4) | sv, qs])
    for tc, bits, syms in ((0, _DC_BITS, _DC_SYMS), (1, _AC_BITS, _AC_SYMS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), tc << 4)
        out += bytes(bits) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += bytes([ci + 1, 0])
    out += b"\x00\x3f\x00"

    wtr = _BitWriter()
    preds = [0] * len(planes)
    since = 0
    rst = 0
    for myi in range(my):
        for mxi in range(mx):
            if restart_interval and since == restart_interval:
                wtr.pad()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                since = 0
                preds = [0] * len(planes)
            since += 1
            for ci, ((sh, sv), (blocks, bw)) in enumerate(
                zip(samp, comp_blocks)
            ):
                for by in range(sv):
                    for bx in range(sh):
                        row = myi * sv + by
                        col = mxi * sh + bx
                        preds[ci] = _encode_block(
                            wtr, blocks[row * bw + col], preds[ci]
                        )
    wtr.pad()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 92,
    bands: tuple = ((1, 5), (6, 63)),
    successive: bool = False,
    restart_interval: int = 0,
    subsampling: str = "4:4:4",
) -> bytes:
    """Progressive (SOF2) JFIF bytes for an HxWx{1,3} uint8 array:
    one interleaved DC scan, then one non-interleaved AC scan per
    component per band (over the component's OWN block grid, which at
    4:2:0 differs from the MCU-rounded grid), with EOB runs
    accumulated across blocks. With ``successive`` the script is the
    libjpeg-style two-level successive approximation — DC first at
    Al=1 + DC refinement, AC band first passes at Al=1 + AC refinement
    scans (new ±1 coefficients interleaved with correction bits, T.81
    G.1.2.3). Either way the stream carries the SAME quantized
    coefficients as the matching sequential encoder, so
    ``decode_jpeg`` must reproduce the baseline decode EXACTLY."""
    h, w, nch = img.shape
    qlum = _quality_scale(_QLUM, quality)
    qchr = _quality_scale(_QCHR, quality)
    if nch == 1:
        planes, samp, qsel = [img[:, :, 0].astype(np.float64)], [(1, 1)], [0]
    elif nch == 3:
        rgb = img.astype(np.float64)
        rch, gch, bch = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * rch + 0.587 * gch + 0.114 * bch
        cb = -0.168736 * rch - 0.331264 * gch + 0.5 * bch + 128
        cr = 0.5 * rch - 0.418688 * gch - 0.081312 * bch + 128
        if subsampling == "4:4:4":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "4:2:0":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            sub = []
            for p in (cb, cr):
                pp = np.pad(p, ((0, ph - h), (0, pw - w)), "edge")
                sub.append(pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
            planes, samp = [y, *sub], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        qsel = [0, 1, 1]
    else:
        raise ValueError("encode_jpeg_progressive wants HxWx1 or HxWx3")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    comp_blocks = []
    bws = []
    grids = []  # non-interleaved (nbh, nbw) per component
    for p, (sh, sv), qs in zip(planes, samp, qsel):
        th, tw = my * sv * 8, mx * sh * 8
        pp = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge"
        )
        comp_blocks.append(_plane_blocks(pp, qlum if qs == 0 else qchr))
        bws.append(mx * sh)
        cw = -(-(w * sh) // hmax)
        ch_ = -(-(h * sv) // vmax)
        grids.append((-(-ch_ // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, qlum),) + (((1, qchr),) if nch == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += q[_ZZ].astype(np.uint8).tobytes()
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for ci, ((sh, sv), qs) in enumerate(zip(samp, qsel)):
        out += bytes([ci + 1, (sh << 4) | sv, qs])
    for tc, bits, syms in ((0, _DC_BITS, _DC_SYMS), (1, _AC_BITS, _AC_SYMS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(syms), tc << 4)
        out += bytes(bits) + bytes(syms)

    def mcu_blocks():
        """(ci, block_index) pairs of one MCU at a time, in the
        interleaved order DC scans use."""
        for myi in range(my):
            for mxi in range(mx):
                yield [
                    (ci, (myi * sv + by) * bws[ci] + (mxi * sh + bx))
                    for ci, (sh, sv) in enumerate(samp)
                    for by in range(sv)
                    for bx in range(sh)
                ]

    def grid_indices(ci):
        nbh, nbw = grids[ci]
        return [
            row * bws[ci] + col for row in range(nbh) for col in range(nbw)
        ]

    def sos(comp_ids, ss, se, ahal=0):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            hdr += bytes([cid, 0])
        return hdr + bytes([ss, se, ahal])

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    al1 = 1 if successive else 0
    ri = restart_interval
    # scan 1: interleaved DC (shifted domain when successive)
    out += sos(list(range(1, len(planes) + 1)), 0, 0, al1)
    wtr = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m, members in enumerate(mcu_blocks()):
        if ri and m and m % ri == 0:
            wtr.pad()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(planes)
        for ci, b in members:
            dc = int(comp_blocks[ci][b][0]) >> al1  # arithmetic shift
            diff = dc - preds[ci]
            preds[ci] = dc
            size = int(abs(diff)).bit_length()
            code, ln = _DC_ENC[size]
            wtr.write(code, ln)
            if size:
                wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    wtr.pad()
    out += wtr.out
    if successive:  # DC refinement: the held-back magnitude bit
        out += sos(list(range(1, len(planes) + 1)), 0, 0, 0x10)
        wtr = _BitWriter()
        rst = 0
        for m, members in enumerate(mcu_blocks()):
            if ri and m and m % ri == 0:
                wtr.pad()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            for ci, b in members:
                wtr.write(int(comp_blocks[ci][b][0]) & 1, 1)
        wtr.pad()
        out += wtr.out

    # AC band scans: non-interleaved, over the component's OWN grid
    for ci, blocks in enumerate(comp_blocks):
        for ss, se in bands:
            out += sos([ci + 1], ss, se, al1)
            out += _ac_first_scan(blocks, grid_indices(ci), ss, se, al1, ri)
    if successive:  # AC refinement scans
        for ci, blocks in enumerate(comp_blocks):
            for ss, se in bands:
                out += sos([ci + 1], ss, se, 0x10)
                out += _ac_refine_scan(blocks, grid_indices(ci), ss, se, 0, ri)
    out += b"\xff\xd9"
    return bytes(out)


def _ac_first_scan(blocks, indices, ss, se, al, ri=0) -> bytes:
    """Entropy bytes of one AC band scan over the given block indices
    (the component's own grid): run/size symbols over the Al-shifted
    (truncate-toward-zero) values, EOB runs accumulated; optional
    restart markers every ``ri`` blocks."""
    wtr = _BitWriter()
    eobrun = 0
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, ln = _AC_ENC[rbits << 4]
            wtr.write(code, ln)
            if rbits:
                wtr.write(eobrun - (1 << rbits), rbits)
            eobrun = 0

    for bi, b in enumerate(indices):
        if ri and bi and bi % ri == 0:
            flush_eob()
            wtr.pad()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        zz = blocks[b][_ZZ].astype(np.int64)
        vals = [
            (abs(int(v)) >> al) * (1 if v >= 0 else -1)
            for v in zz[ss : se + 1]
        ]
        nz = [j for j, v in enumerate(vals) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(nz[-1] + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _AC_ENC[0xF0]
                wtr.write(code, ln)
                run -= 16
            size = int(abs(v)).bit_length()
            code, ln = _AC_ENC[(run << 4) | size]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if nz[-1] + ss < se:
            eobrun += 1
    flush_eob()
    wtr.pad()
    return bytes(wtr.out)


def _ac_refine_scan(blocks, indices, ss, se, al, ri=0) -> bytes:
    """Entropy bytes of one AC successive-approximation refinement
    scan (T.81 G.1.2.3 / the jcphuff dataflow): newly significant
    coefficients emit (run<<4|1)+sign over zero-HISTORY positions,
    already-significant ones buffer a correction bit that flushes
    right after the next emitted symbol, trailing runs fold into
    accumulated EOBn symbols."""
    wtr = _BitWriter()
    eobrun = 0
    committed: list[int] = []  # bits owned by the pending EOB run (BE)
    pend: list[int] = []       # current block since the last symbol (BR)

    def drain():
        for bit in pend:
            wtr.write(bit, 1)
        pend.clear()

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, ln = _AC_ENC[rbits << 4]
            wtr.write(code, ln)
            if rbits:
                wtr.write(eobrun - (1 << rbits), rbits)
            eobrun = 0
            for bit in committed:
                wtr.write(bit, 1)
            committed.clear()

    rst = 0
    for bi, b in enumerate(indices):
        if ri and bi and bi % ri == 0:
            flush_eob()
            wtr.pad()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        zz = blocks[b][_ZZ].astype(np.int64)
        absv = [abs(int(v)) >> al for v in zz[ss : se + 1]]
        eob = -1  # index (into band) of the LAST newly significant coef
        for j, t in enumerate(absv):
            if t == 1:
                eob = j
        run = 0
        for j, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and j <= eob:
                flush_eob()
                code, ln = _AC_ENC[0xF0]
                wtr.write(code, ln)
                run -= 16
                drain()
            if t > 1:
                pend.append(t & 1)
                continue
            flush_eob()
            code, ln = _AC_ENC[(run << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if int(zz[ss + j]) >= 0 else 0, 1)
            drain()
            run = 0
        if run > 0 or pend:
            eobrun += 1
            committed.extend(pend)
            pend.clear()
            if eobrun == 32767 or len(committed) > 900:
                flush_eob()
    flush_eob()
    wtr.pad()
    return bytes(wtr.out)


def synth_jpeg(seed: int) -> bytes:
    """Deterministic little JPEG: same dimension formula as synth_ppm /
    synth_png / synth_gif (shared arithmetic oracle); a smooth gradient
    plus seeded low-frequency bumps (JPEG-friendly content), sampling,
    restart, and progressive-vs-sequential paths alternating by seed."""
    w, h = 8 + (seed % 9), 6 + (seed % 5)
    rng = np.random.RandomState((seed ^ 0x3A6) & 0x7FFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 7 + xx * 11) % 256
    img = np.stack(
        [(base + rng.randint(0, 40)) % 256 for _ in range(3)], axis=2
    ).astype(np.uint8)
    if seed % 10 == 0:
        return encode_jpeg_progressive(
            img, quality=90, successive=True,
            subsampling="4:2:0" if seed % 20 == 0 else "4:4:4",
        )
    if seed % 5 == 0:
        return encode_jpeg_progressive(img, quality=90)
    return encode_jpeg(
        img,
        quality=90,
        subsampling="4:2:0" if seed % 2 else "4:4:4",
        restart_interval=2 if seed % 3 == 0 else 0,
    )
