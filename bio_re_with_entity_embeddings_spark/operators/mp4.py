"""MP4 / ISO-BMFF (ISO 14496-12) container metadata on stdlib only.

The container walk is REAL and general: size/type box framing
(including 64-bit largesize and size-0 to-EOF boxes), recursion into
the moov/trak/mdia/minf/stbl hierarchy with unknown boxes skipped by
their declared size, mvhd (v0/v1) timescale+duration, tkhd (v0/v1)
track ids and 16.16 fixed-point width/height, hdlr handler types
(vide/soun), and stts sample counts (frame counts for video tracks).

What stays stubbed is the SAMPLE PAYLOAD decode (H.264/AAC bitstreams
need entropy+transform codecs that are out of scope for this env) —
``multimodal.decode_image`` keeps rejecting raw mdat payloads by
magic, while ``frame_sample_plan`` models the frame expansion that a
real sample decode would feed. This module makes the metadata half of
the video path real: dims, duration and frame counts come from actual
box structures, not payload-size heuristics.
"""

from __future__ import annotations

import struct


def _boxes(raw: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) over a box sequence,
    honoring 64-bit largesize (size == 1) and to-end boxes (size == 0)."""
    i = start
    while i + 8 <= end:
        size, typ = struct.unpack_from(">I4s", raw, i)
        body = i + 8
        if size == 1:
            size = struct.unpack_from(">Q", raw, i + 8)[0]
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            raise ValueError("MP4 box size out of bounds")
        yield typ, body, i + size
        i += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def mp4_metadata(raw: bytes) -> dict:
    """{'brand', 'duration_s', 'tracks': [{'track_id', 'kind',
    'width', 'height', 'n_samples'}, ...]} from a real box walk."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 container")
    meta: dict = {"brand": raw[8:12].decode("ascii", "replace"),
                  "duration_s": None, "tracks": []}
    track = None

    def walk(start: int, end: int) -> None:
        nonlocal track
        for typ, body, nxt in _boxes(raw, start, end):
            if typ == b"mvhd":
                ver = raw[body]
                if ver == 1:
                    ts = struct.unpack_from(">I", raw, body + 20)[0]
                    dur = struct.unpack_from(">Q", raw, body + 24)[0]
                else:
                    ts = struct.unpack_from(">I", raw, body + 12)[0]
                    dur = struct.unpack_from(">I", raw, body + 16)[0]
                meta["duration_s"] = dur / ts if ts else None
            elif typ == b"trak":
                track = {"track_id": None, "kind": None,
                         "width": None, "height": None, "n_samples": 0}
                meta["tracks"].append(track)
                walk(body, nxt)
                track = None
            elif typ == b"tkhd" and track is not None:
                ver = raw[body]
                off = body + (20 if ver == 1 else 12)
                track["track_id"] = struct.unpack_from(">I", raw, off)[0]
                woff = body + (88 if ver == 1 else 76)
                w, h = struct.unpack_from(">II", raw, woff)
                track["width"], track["height"] = w >> 16, h >> 16
            elif typ == b"hdlr" and track is not None:
                track["kind"] = raw[body + 8 : body + 12].decode(
                    "ascii", "replace"
                )
            elif typ == b"stts" and track is not None:
                n = struct.unpack_from(">I", raw, body + 4)[0]
                track["n_samples"] = sum(
                    struct.unpack_from(">I", raw, body + 8 + 8 * k)[0]
                    for k in range(n)
                )
            elif typ in _CONTAINERS:
                walk(body, nxt)

    walk(0, len(raw))
    return meta


def _box(typ: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I4sQ", 1, typ, len(payload) + 16) + payload
    return struct.pack(">I4s", len(payload) + 8, typ) + payload


def synth_mp4(seed: int) -> bytes:
    """Deterministic minimal-but-valid MP4: one video track whose
    tkhd dims follow the shared synthesis formula, stts split over two
    entries, timescale 600; even seeds wrap mdat in a 64-bit largesize
    box and odd seeds use tkhd/mvhd version 1, so the parser's framing
    variants are all exercised by the oracle fixture."""
    w, h = 8 + (seed % 9), 6 + (seed % 5)
    n_frames = 24 + (seed % 7) * 12
    dur = n_frames * 25  # timescale 600 -> 24 fps
    v1 = bool(seed % 2)
    if v1:
        mvhd = (
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">IQ", 600, dur)
            + b"\x00" * 80
        )
        tkhd = (
            b"\x01\x00\x00\x07" + b"\x00" * 16
            + struct.pack(">II", 1, 0) + struct.pack(">Q", dur)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16)
        )
    else:
        mvhd = (
            b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", 600, dur)
            + b"\x00" * 80
        )
        tkhd = (
            b"\x00\x00\x00\x07" + b"\x00" * 8
            + struct.pack(">II", 1, 0) + struct.pack(">I", dur)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16)
        )
    hdlr = b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"synth\x00"
    stts = b"\x00\x00\x00\x00" + struct.pack(
        ">IIIII", 2, n_frames - 10, 25, 10, 25
    )
    stbl = _box(b"stbl", _box(b"stts", stts))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _box(b"hdlr", hdlr) + minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    free = _box(b"free", b"\x00" * (seed % 5))  # unknown-ish skip box
    mdat = _box(b"mdat", bytes(16), large=(seed % 2 == 0))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + free + moov + mdat
