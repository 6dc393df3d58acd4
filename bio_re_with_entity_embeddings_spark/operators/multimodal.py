"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed in Arrow batches.

The decode step is REAL for the uncompressed container formats that
need no external library — decoded with struct/NumPy only:

* PPM/PGM (``P6``/``P5``) and uncompressed 24/32-bit BMP images —
  dimensions, channels, mean intensity, and an 8x8 grayscale thumbnail
  embedding (``array<float>``) that feeds the similarity operators
  (``operators/similarity.py``) like any other embedding column.
* PNG — a REAL compressed-codec decoder built on stdlib ``zlib``
  inflate + NumPy unfiltering: 8- and 16-bit
  gray/RGB/palette/gray+alpha/RGBA, all five scanline filters
  (None/Sub/Up/Average/Paeth), Adam7 interlace. Sub-byte packed
  depths are rejected by header field.
* GIF — a REAL from-scratch LZW decoder (GIF87a/89a): variable-width
  codes with giflib-compatible width bumps, clear/EOI handling, the
  cScSc special case, global AND local color tables, 4-pass row
  interlace, extension-block skipping. First image frame decoded.
* JPEG — a REAL baseline decoder (``operators/jpeg.py``): file-driven
  Huffman tables, interleaved MCUs with arbitrary sampling factors,
  restart intervals, vectorized IDCT, chroma upsampling, YCbCr->RGB.
  Progressive (SOF2) rejected by marker.
* PCM16 WAV audio — sample rate, channels, duration, RMS amplitude.
* FLAC — a REAL lossless decoder (``operators/flac.py``): all subframe
  types (CONSTANT/VERBATIM/FIXED/LPC), Rice residual partitions,
  stereo decorrelation, CRC-8/CRC-16 verification.
* video: modeled as a frame-indexed expansion plan (native explode)
  over per-frame payloads, each frame an image decode.

Remaining entropy codecs (FLAC/MP4) are detected by magic
number and rejected with ``NotImplementedError`` naming the format —
the ONLY stubbed branch, because their decoders aren't in this
environment; the dispatch, schema, partitioning, and Arrow batch shape
are identical, so adding PIL/ffmpeg is one branch per codec.

Everything runs in ``mapInPandas`` iterators: no per-row Python crosses
the JVM boundary, payload bytes stay in Arrow buffers, and the decode
parallelizes with partitions exactly like the mention detector.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("thumbnail", T.ArrayType(T.FloatType()), True),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

VIDEO_META = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("brand", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("track_id", T.IntegerType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_COMPRESSED_MAGICS = [
    (b"\x00\x00\x00\x18ftyp", "mp4"),
    (b"\x00\x00\x00\x20ftyp", "mp4"),
]


def _reject_compressed(raw: bytes) -> None:
    for magic, name in _COMPRESSED_MAGICS:
        if raw.startswith(magic):
            raise NotImplementedError(
                f"{name} decode needs a codec library (not in this env); "
                "PPM/PGM/BMP/PNG/GIF/JPEG images and WAV/FLAC audio are "
                "decoded natively"
            )


def decode_image(raw: bytes) -> tuple[str, np.ndarray]:
    """(format, HxWxC uint8 array) for PPM (P6), PGM (P5),
    uncompressed 24/32-bit BMP, 8-bit PNG, and GIF payloads."""
    _reject_compressed(raw)
    if raw[:2] in (b"P6", b"P5"):
        return _decode_pnm(raw)
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    if raw[:8] == _PNG_SIG:
        return _decode_png(raw)
    if raw[:4] == b"GIF8":
        return _decode_gif(raw)
    if raw[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return "jpeg", decode_jpeg(raw)
    raise ValueError(f"unrecognized image container: {raw[:8]!r}")


def _decode_pnm(raw: bytes) -> tuple[str, np.ndarray]:
    # header: magic, whitespace/comment-separated width height maxval
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":  # comment to EOL
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        fields.append(raw[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(x) for x in fields)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    channels = 3 if raw[:2] == b"P6" else 1
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * channels, offset=i)
    return ("ppm" if channels == 3 else "pgm"), px.reshape(h, w, channels)


def _decode_bmp(raw: bytes) -> tuple[str, np.ndarray]:
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flipped = h > 0
    h = abs(h)
    if bpp <= 8:  # paletted: packed indices + BGRX color table
        n_colors = struct.unpack_from("<I", raw, 46)[0] or (1 << bpp)
        pal = np.frombuffer(
            raw, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        row_bytes = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)
        if bpp == 8:
            idx = rows[:, :w]
        else:  # MSB-first packing, left pixel in high bits
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            v = bits.reshape(h, w, bpp)
            idx = np.zeros((h, w), dtype=np.uint8)
            for b in range(bpp):
                idx = (idx << 1) | v[:, :, b]
        img = pal[idx]
    else:
        nch = bpp // 8
        row_bytes = (w * nch + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)[:, : w * nch]
        img = rows.reshape(h, w, nch)[:, :, ::-1]  # BGR(A) -> (A)RGB
        if nch == 4:
            img = img[:, :, 1:]  # drop alpha (stored first after reverse)
    if flipped:
        img = img[::-1]
    return "bmp", np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> stored channels per pixel (before palette expansion /
# alpha drop)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass origins/steps: (x0, y0, dx, dy)
_PNG_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters over one (sub-)image: ``scan`` is
    (h, stride+1) filter-byte-prefixed rows, ``bpp`` the FILTER offset
    in bytes (channels x bytes-per-sample — PNG filters operate on
    bytes, not samples, at any depth)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(scan[y, 0])
        cur = scan[y, 1:]
        if f == 0:
            row = cur.copy()
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            row = cur.copy()
            for lane in range(bpp):
                row[lane::bpp] = np.cumsum(
                    cur[lane::bpp], dtype=np.int64
                ) & 0xFF
        elif f == 2:  # Up: uint8 addition wraps mod 256 natively
            row = cur + prev
        elif f == 3:  # Average — sequential in x; plain-Python lists
            # beat NumPy scalar indexing ~4x here (measured 482 -> 129
            # us/row for Paeth at stride 384)
            cl, pl, ol = cur.tolist(), prev.tolist(), [0] * stride
            for x in range(stride):
                left = ol[x - bpp] if x >= bpp else 0
                ol[x] = (cl[x] + ((left + pl[x]) >> 1)) & 0xFF
            row = np.frombuffer(bytes(ol), dtype=np.uint8)
        elif f == 4:  # Paeth — same sequential-in-x list kernel
            cl, pl, ol = cur.tolist(), prev.tolist(), [0] * stride
            for x in range(stride):
                a = ol[x - bpp] if x >= bpp else 0
                b = pl[x]
                c = pl[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                ol[x] = (cl[x] + pred) & 0xFF
            row = np.frombuffer(bytes(ol), dtype=np.uint8)
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = row
        prev = row
    return out


def _decode_png(raw: bytes) -> tuple[str, np.ndarray]:
    """Real PNG decode with stdlib zlib + NumPy: walk chunks, inflate
    the IDAT stream, undo per-scanline filters, expand the color type.
    Bit depths 8 AND 16 (16-bit samples downscale to their high byte —
    the standard decode-for-features behavior) and Adam7 INTERLACE
    (seven independently-filtered sub-images scattered onto the
    canvas). Sub-byte depths (1/2/4-bit packed) are rejected by header
    field, never silently misdecoded. Alpha is dropped after
    reconstruction (RGBA -> RGB, gray+alpha -> gray), matching the BMP
    32-bpp convention above. Chunk CRCs are not verified — zlib's
    inflate + adler32 already fail on corrupted pixel data, and
    features here are advisory signals, not archival validation.

    Cost note: filters None/Sub/Up reconstruct vectorized (Sub is a
    per-lane prefix sum mod 256); Average/Paeth are inherently
    sequential in x and run as per-byte loops — fine for the thumbnail/
    stats features this feeds, and still partition-parallel across
    payloads like every other decoder in this module."""
    import zlib

    w = h = depth = ctype = interlace = None
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    i = 8
    while i + 8 <= len(raw):
        ln, typ = struct.unpack_from(">I4s", raw, i)
        body = raw[i + 8 : i + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        i += 12 + ln  # len + type + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and ctype not in (0, 3)
    ) or (ctype == 3 and depth == 16):
        raise NotImplementedError(f"PNG bit depth {depth} for color type {ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace}")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype}")
    nch = _PNG_CHANNELS[ctype]
    # PNG filters offset by max(1, bytes-per-pixel); sub-byte rows
    # unpack AFTER unfiltering (spec: packed rows padded to the byte)
    bpp = max(1, nch * depth // 8)

    def row_bytes(pw: int) -> int:
        return -(-(pw * nch * depth) // 8)

    def samples(rows: np.ndarray, pw: int) -> np.ndarray:
        """(ph, row_bytes) filtered-out bytes -> (ph, pw, nch) uint8."""
        ph = rows.shape[0]
        if depth == 16:
            return rows.reshape(ph, pw, nch, 2)[:, :, :, 0]
        if depth == 8:
            return rows.reshape(ph, pw, nch)
        bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
        v = bits.reshape(ph, pw, depth)
        packed = np.zeros((ph, pw), dtype=np.uint8)
        for b in range(depth):
            packed = (packed << 1) | v[:, :, b]
        return packed[:, :, None]

    dec = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace:
        vals = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            stride = row_bytes(pw)
            n = ph * (stride + 1)
            sub = dec[off : off + n]
            if sub.size != n:
                raise ValueError("PNG interlaced stream truncated")
            off += n
            rows = _png_unfilter(sub.reshape(ph, stride + 1), ph, stride, bpp)
            vals[y0::dy, x0::dx] = samples(rows, pw)
        if off != dec.size:
            raise ValueError("PNG pixel stream size mismatch")
    else:
        stride = row_bytes(w)
        if dec.size != h * (stride + 1):
            raise ValueError("PNG pixel stream size mismatch")
        out = _png_unfilter(dec.reshape(h, stride + 1), h, stride, bpp)
        vals = samples(out, w)
    if depth < 8 and ctype == 0:  # gray sub-byte: scale to full range
        vals = vals * np.uint8(255 // ((1 << depth) - 1))

    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        img = plte[vals[:, :, 0]]
    elif ctype == 0:
        img = vals
    elif ctype == 2:
        img = vals
    elif ctype == 4:
        img = vals[:, :, :1]
    else:  # 6
        img = vals[:, :, :3]
    return "png", np.ascontiguousarray(img)


def _png_filter_rows(flat: np.ndarray, bpp: int) -> bytearray:
    """Filter (n, stride) int32 byte rows with the filter cycling
    0..4 by row, so decode roundtrips exercise EVERY reconstruction
    path; ``bpp`` is the byte offset PNG filters use."""
    n, stride = flat.shape
    lines = bytearray()
    for y in range(n):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth — vectorized predictor (encoder may vectorize:
            # it reads RECONSTRUCTED neighbors, which it already has)
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = cur - pred
        lines.append(f)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
    return lines


def encode_png(
    img: np.ndarray, interlace: bool = False, depth: int | None = None
) -> bytes:
    """Minimal PNG encoder for fixtures/tests: color type from the
    channel count (1 -> gray, 2 -> gray+alpha, 3 -> RGB, 4 -> RGBA),
    bit depth 16 when the input is uint16 (big-endian samples),
    explicit ``depth`` in (1, 2, 4) for packed sub-byte grayscale,
    and optional Adam7 interlace (each pass filtered independently)."""
    import zlib

    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if depth is None:
        depth = 16 if img.dtype == np.uint16 else 8
    if depth < 8 and (nch != 1 or int(img.max(initial=0)) >= (1 << depth)):
        raise ValueError("sub-byte PNG depth wants 1-channel small values")
    bpp = max(1, nch * depth // 8)

    def rows_bytes(sub: np.ndarray) -> np.ndarray:
        sh, sw = sub.shape[:2]
        if depth == 16:
            by = sub.astype(">u2").view(np.uint8).reshape(sh, sw * bpp)
        elif depth == 8:
            by = sub.reshape(sh, sw * nch)
        else:  # pack depth-bit samples MSB-first, zero-padded to bytes
            bits = (
                (sub[:, :, 0:1].astype(np.uint8)[:, :, None]
                 >> np.arange(depth - 1, -1, -1, dtype=np.uint8)) & 1
            ).reshape(sh, sw * depth)
            by = np.packbits(bits, axis=1)
        return by.astype(np.int32)

    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _PNG_ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _png_filter_rows(rows_bytes(sub), bpp)
    else:
        lines = _png_filter_rows(rows_bytes(img), bpp)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def synth_png(seed: int) -> bytes:
    """Deterministic little RGB PNG: same dimension formula as
    synth_ppm (so the arithmetic oracle restatement is shared), pixels
    from the seeded RNG, rows cycling through all five filters."""
    w, h = 8 + (seed % 9), 6 + (seed % 5)
    rng = np.random.RandomState((seed ^ 0x5EED) & 0x7FFFFFFF)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return encode_png(px)


def _gif_interlace_rows(h: int) -> np.ndarray:
    """Display-row order of GIF 4-pass interlaced storage: stored row j
    is display row order[j] (passes start/step 0/8, 4/8, 2/4, 1/2)."""
    return np.concatenate(
        [np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )


def _gif_lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable-width codes read LSB-first starting at
    mcs+1 bits. The width bump runs AFTER each dictionary append, when
    the table size reaches 2^width — the decoder's table is one entry
    behind the encoder's, and this bookkeeping (giflib's RunningCode
    counter) keeps both sides' widths in lockstep. ``code == len(table)``
    is the standard cScSc self-reference case. The table freezes at
    4096 entries until an explicit clear code."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = mcs + 1
    acc = nbits = pos = 0
    prev: bytes | None = None
    out = bytearray()
    while len(out) < n_pixels:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            raise ValueError("GIF LZW stream truncated")
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = mcs + 1
            prev = None
            continue
        if code == eoi:
            raise ValueError("GIF pixel stream ended early")
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _gif_lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Inverse of ``_gif_lzw_decode``: a REAL growing-dictionary LZW
    encoder (prefix map keyed by (prefix-code, symbol)), clear emitted
    up front and whenever the table fills at 4096; width bumps after
    the append, mirroring the decoder."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0
    code_size = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_slot = clear + 2
    emit(clear)
    w: int | None = None  # current prefix as its CODE
    for k in indices.tolist():
        if w is None:
            w = k
            continue
        got = table.get((w, k))
        if got is not None:
            w = got
            continue
        emit(w)
        table[(w, k)] = next_slot
        if next_slot == (1 << code_size) and code_size < 12:
            code_size += 1
        next_slot += 1
        if next_slot == 4096:
            emit(clear)
            table = {}
            next_slot = clear + 2
            code_size = mcs + 1
        w = k
    if w is not None:
        emit(w)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_images(raw: bytes):
    """Walk a GIF87a/89a stream: yields one (left, top, index_array,
    palette, transparent_idx) per image block, with graphic-control
    transparency tracked and all other extensions skipped by their
    sub-block framing. Returns (screen_w, screen_h) via StopIteration
    is awkward, so the logical screen is parsed by callers from the
    LSD directly (bytes 6..12)."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = raw[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(raw[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    transparent = None
    while i < len(raw):
        block = raw[i]
        if block == 0x21:  # extension: label byte + framed sub-blocks
            label = raw[i + 1]
            i += 2
            if label == 0xF9 and raw[i] >= 4:  # graphic control
                if raw[i + 1] & 0x01:
                    transparent = raw[i + 4]
                else:
                    transparent = None
            while raw[i] != 0:
                i += 1 + raw[i]
            i += 1
        elif block == 0x2C:
            left, top, w, h, ip = struct.unpack_from("<HHHHB", raw, i + 1)
            i += 10
            pal = gct
            if ip & 0x80:
                n = 1 << ((ip & 0x07) + 1)
                pal = np.frombuffer(
                    raw[i : i + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = raw[i]
            i += 1
            data = bytearray()
            while raw[i] != 0:
                ln = raw[i]
                data += raw[i + 1 : i + 1 + ln]
                i += 1 + ln
            i += 1  # sub-block terminator
            idx = _gif_lzw_decode(bytes(data), mcs, w * h).reshape(h, w)
            if ip & 0x40:
                out = np.empty_like(idx)
                out[_gif_interlace_rows(h)] = idx
                idx = out
            yield left, top, idx, pal, transparent
            transparent = None  # GCE applies to ONE following image
        elif block == 0x3B:
            return
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")


def _decode_gif(raw: bytes) -> tuple[str, np.ndarray]:
    """Real GIF87a/89a decode, stdlib + NumPy only: logical screen
    descriptor, global color table, extension blocks skipped by their
    sub-block framing, first image descriptor decoded (local color
    table preferred when present, 4-pass interlace undone), palette
    expanded to HxWx3. For animated files ``gif_frames`` composites
    every frame."""
    for _left, _top, idx, pal, _tr in _gif_images(raw):
        return "gif", np.ascontiguousarray(pal[idx])
    raise ValueError("GIF contains no image block")


def gif_frames(raw: bytes) -> list[np.ndarray]:
    """All frames of an (animated) GIF as full logical-screen HxWx3
    canvases: each image block is pasted at its (left, top) offset
    over the previous canvas, honoring graphic-control transparency
    (transparent pixels keep the underlying canvas — the do-not-
    dispose compositing that GIF optimizers assume)."""
    sw, sh = struct.unpack_from("<HH", raw, 6)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames = []
    for left, top, idx, pal, transparent in _gif_images(raw):
        h, w = idx.shape
        region = canvas[top : top + h, left : left + w]
        px = pal[idx]
        if transparent is not None:
            keep = idx == transparent
            px = np.where(keep[:, :, None], region, px)
        canvas[top : top + h, left : left + w] = px
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


def encode_gif(
    img: np.ndarray, interlace: bool = False, local_palette: bool = False
) -> bytes:
    """Minimal GIF89a encoder for fixtures/tests (real LZW, real
    dictionary growth): palette from the image's distinct colors
    (<= 256), optional 4-pass interlace, and with ``local_palette`` the
    true palette moves to the image's LOCAL color table while a decoy
    (inverted) GLOBAL table is emitted — a decode that ignores the LCT
    cannot roundtrip. A graphic-control extension is always included so
    decoders must skip extension framing."""
    h, w, nch = img.shape
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    palette, inverse = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF encoder: more than 256 distinct colors")
    bits = max(1, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    idx = inverse.reshape(-1).astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_gif_interlace_rows(h)]
    mcs = max(2, bits)
    lzw = _gif_lzw_encode(idx.reshape(-1), mcs)
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | (bits - 1), 0, 0)
    buf += (255 - pal).tobytes() if local_palette else pal.tobytes()
    buf += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (skipped on decode)
    ip = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_palette else 0)
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ip)
    if local_palette:
        buf += pal.tobytes()
    buf.append(mcs)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        buf.append(len(chunk))
        buf += chunk
    buf += b"\x00\x3b"
    return bytes(buf)


def synth_gif(seed: int) -> bytes:
    """Deterministic little GIF: same dimension formula as synth_ppm /
    synth_png (shared arithmetic oracle), pixels drawn from a seeded
    32-color palette; interlace and local-color-table paths alternate
    by seed so the oracle fixture exercises both."""
    w, h = 8 + (seed % 9), 6 + (seed % 5)
    rng = np.random.RandomState((seed ^ 0x61F) & 0x7FFFFFFF)
    pal = rng.randint(0, 256, size=(32, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 32, size=(h, w))]
    return encode_gif(
        px, interlace=bool(seed % 2), local_palette=bool(seed % 3 == 0)
    )


def decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, samples float64 in [-1, 1]) for
    PCM16 RIFF/WAVE payloads."""
    _reject_compressed(raw)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    while i + 8 <= len(raw):
        chunk_id = raw[i : i + 4]
        size = struct.unpack_from("<I", raw, i + 4)[0]
        body = i + 8
        if chunk_id == b"fmt ":
            audio_fmt, nch, rate = struct.unpack_from("<HHI", raw, body)
            bits = struct.unpack_from("<H", raw, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format={audio_fmt} bits={bits}; only PCM16 here"
                )
            fmt = (rate, nch)
        elif chunk_id == b"data" and fmt is not None:
            pcm = np.frombuffer(raw, dtype="<i2", count=size // 2, offset=body)
            rate, nch = fmt
            return rate, nch, pcm.astype(np.float64) / 32768.0
        i = body + size + (size & 1)
    raise ValueError("WAV data chunk not found")


def decode_audio(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, interleaved float64 in [-1, 1]) for
    PCM16 WAV or native FLAC payloads, dispatched by magic."""
    if raw[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(raw)
    return decode_wav(raw)


def _thumbnail(img: np.ndarray, side: int = 8) -> np.ndarray:
    """8x8 grayscale thumbnail embedding via block averaging (area
    interpolation) — the classic perceptual-hash feature; returned as
    float32 in [0, 1] for the cosine/LSH similarity operators."""
    gray = img.mean(axis=2, dtype=np.float64)
    h, w = gray.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    out = np.empty((side, side), dtype=np.float64)
    for r in range(side):
        for c in range(side):
            block = gray[ys[r] : max(ys[r + 1], ys[r] + 1),
                         xs[c] : max(xs[c + 1], xs[c] + 1)]
            out[r, c] = block.mean()
    return (out / 255.0).astype(np.float32).ravel()


def decode_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched image decode -> IMAGE_FEATURES rows (dims,
    channels, mean intensity, thumbnail embedding, lineage sha)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                raw = bytes(payload)
                fmt, img = decode_image(raw)
                out.append(
                    (
                        media_id,
                        fmt,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.shape[2]),
                        float(img.mean(dtype=np.float64)),
                        _thumbnail(img).tolist(),
                        hashlib.sha256(raw).hexdigest(),
                        len(raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "format", "width", "height", "n_channels",
                    "mean_intensity", "thumbnail", "payload_sha", "n_bytes",
                ],
            )

    return media.where(F.col("modality") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, IMAGE_FEATURES)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV/FLAC decode -> AUDIO_FEATURES rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                raw = bytes(payload)
                rate, nch, samples = decode_audio(raw)
                n = len(samples) // max(nch, 1)
                rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
                out.append(
                    (
                        media_id, rate, nch, n,
                        n / rate if rate else None, rms,
                        hashlib.sha256(raw).hexdigest(), len(raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "rms", "payload_sha", "n_bytes",
                ],
            )

    return media.where(F.col("modality") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(run, AUDIO_FEATURES)


def decode_video_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched ISO-BMFF box walk (operators/mp4.py) -> one
    VIDEO_META row per track: brand, movie duration, track dims from
    tkhd 16.16 fixed-point, frame counts from stts. Real container
    parsing; only the sample-payload codecs stay out of scope (the
    n_frames column feeds frame_sample_plan-style expansion)."""
    from .mp4 import mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                raw = bytes(payload)
                meta = mp4_metadata(raw)
                sha = hashlib.sha256(raw).hexdigest()
                for t in meta["tracks"]:
                    out.append(
                        (
                            media_id, meta["brand"], meta["duration_s"],
                            t["track_id"], t["kind"], t["width"], t["height"],
                            t["n_samples"], sha, len(raw),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "brand", "duration_s", "track_id", "kind",
                    "width", "height", "n_frames", "payload_sha", "n_bytes",
                ],
            )

    return media.where(F.col("modality") == "video").select(
        "media_id", "payload"
    ).mapInPandas(run, VIDEO_META)



def _spread(ids: DataFrame) -> DataFrame:
    """Round 6: a single-file documents scan plans ONE split, so every
    per-row synth+codec stage chained on it ran on one core (measured:
    the FLAC synth+Rice-decode pair was a 64 s single-task query at
    sf0.1). The guard repartitions only when planned parallelism is
    below the cluster width (functions/parallel.py) — a no-op on wide
    production scans."""
    from ..functions.parallel import ensure_min_parallelism

    return ensure_min_parallelism(ids, "doc_id")


def synth_media_mp4(docs: DataFrame) -> DataFrame:
    """Deterministic media table where EVERY doc is a minimal-valid
    MP4 container (operators/mp4.py::synth_mp4) — the fixture behind
    the mm_mp4_meta oracle: the Spark side must walk real box
    structures (v0/v1 headers, 64-bit largesize, skip boxes) to
    recover dims/duration/frame counts the oracle recomputes
    arithmetically."""
    from .mp4 import synth_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(int(d)), "video", synth_mp4(int(d)), "video/mp4")
                for d in pdf["doc_id"].values
            ]
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands (video, n_frames-metadata)
    into (media_id, frame_idx) rows natively; the per-frame payload
    decode slots in as decode_image_features over the frame table.
    n_frames is derived from payload size here (container parsing for
    real codecs would replace this expression only)."""
    vids = media.where(F.col("modality") == "video").select(
        "media_id", (F.length("payload") / 16).cast("int").alias("n_frames")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


# --- deterministic REAL-payload fixture generation (executor-side) -------


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table with REAL container payloads derived
    from each doc_id: PPM images (doc_id % 3 == 0), PCM16 WAVs
    (== 1), synthetic 'video' frame stacks (== 2). Generation happens
    inside mapInPandas — no driver materialization."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"].values:
                did = int(doc_id)
                if did % 3 == 0:
                    out.append((str(did), "image", synth_ppm(did), "image/x-portable-pixmap"))
                elif did % 3 == 1:
                    out.append((str(did), "audio", synth_wav(did), "audio/wav"))
                else:
                    payload = hashlib.sha256(str(did).encode()).digest() * ((did % 7) + 4)
                    out.append((str(did), "video", payload, "application/octet-stream"))
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def synth_media_png(docs: DataFrame) -> DataFrame:
    """Deterministic media table where EVERY doc is a compressed PNG
    payload (synth_png) — the fixture behind the mm_png_dims oracle:
    the Spark side must inflate + unfilter real zlib streams to
    recover dimensions the oracle recomputes arithmetically."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(int(d)), "image", synth_png(int(d)), "image/png")
                for d in pdf["doc_id"].values
            ]
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def synth_media_gif(docs: DataFrame) -> DataFrame:
    """Deterministic media table where EVERY doc is a GIF payload
    (synth_gif) — the fixture behind the mm_gif_dims oracle: the Spark
    side must run the full LZW decode (variable-width codes, interlace,
    local color tables) to recover dimensions the oracle recomputes
    arithmetically."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(int(d)), "image", synth_gif(int(d)), "image/gif")
                for d in pdf["doc_id"].values
            ]
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def synth_media_jpeg(docs: DataFrame) -> DataFrame:
    """Deterministic media table where EVERY doc is a baseline JPEG
    payload (operators/jpeg.py::synth_jpeg) — the fixture behind the
    mm_jpeg_dims oracle: the Spark side must run the full baseline
    decode (file-driven Huffman tables, 4:4:4/4:2:0 MCUs, restart
    intervals alternating by seed) to recover dimensions the oracle
    recomputes arithmetically."""
    from .jpeg import synth_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(int(d)), "image", synth_jpeg(int(d)), "image/jpeg")
                for d in pdf["doc_id"].values
            ]
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def synth_media_flac(docs: DataFrame) -> DataFrame:
    """Deterministic media table where EVERY doc is a native-FLAC
    payload (operators/flac.py::synth_flac — the SAME sine formula as
    synth_wav, mono/stereo and mid/side alternating by seed) — the
    fixture behind the mm_flac_audio oracle: the Spark side must
    entropy-decode real Rice-coded frames (and pass their CRCs) to
    produce any row at all."""
    from .flac import synth_flac

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(int(d)), "audio", synth_flac(int(d)), "audio/flac")
                for d in pdf["doc_id"].values
            ]
            yield pd.DataFrame(out, columns=["media_id", "modality", "payload", "mime"])

    return _spread(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    ).mapInPandas(
        run, MEDIA
    )


def synth_ppm(seed: int) -> bytes:
    """Deterministic little P6 image: width/height from the seed,
    gradient + seed-hash pixels."""
    w, h = 8 + (seed % 9), 6 + (seed % 5)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (w, h) + px.tobytes()


def synth_wav(seed: int, rate: int = 8000, n: int = 1600) -> bytes:
    """Deterministic PCM16 WAV: one sine period count from the seed."""
    t = np.arange(n, dtype=np.float64)
    freq = 100.0 + (seed % 50) * 10.0
    samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data
