"""Pure-stdlib MP4/ISO-BMFF container parser — the video third of the
multimodal REAL-decode story (image: `imagecodec`, audio: `audiocodec`).
Frame DECODING needs a codec library the target container doesn't ship
(`multimodal.frame_sample_plan` stays the planning stub for that, per
the multimodal contract), but the CONTAINER is a plain length-prefixed
box tree: walking it yields the metadata a curation pipeline filters on
— brand, timescale, duration, track count — with byte-level parsing an
external SQL oracle can verify arithmetically (q143).

Supported: top-level box walk + moov/mvhd (version 0 and 1) + trak
count. 64-bit box sizes handled; truncated/malformed streams raise.
"""

from __future__ import annotations

import struct
import typing as _ty

__all__ = ["encode_mp4_meta", "parse_mp4_meta"]


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_meta(
    major_brand: bytes,
    timescale: int,
    duration: int,
    n_tracks: int,
) -> bytes:
    """Minimal valid MP4 skeleton: ftyp + moov(mvhd v0 + n_tracks empty
    trak boxes). Enough structure for any ISO-BMFF box walker (ours or
    an external tool) to read back the metadata; used for synthesis in
    tests/oracles the way `encode_png`/`encode_wav` are."""
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + major_brand)
    mvhd_body = b"".join(
        [
            b"\x00\x00\x00\x00",          # version 0 + flags
            struct.pack(">II", 0, 0),      # ctime, mtime
            struct.pack(">I", timescale),
            struct.pack(">I", duration),
            struct.pack(">I", 0x00010000),  # rate 1.0
            struct.pack(">H", 0x0100),      # volume 1.0
            b"\x00" * 10,                   # reserved
            struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                        0x40000000),        # unity matrix
            b"\x00" * 24,                   # pre_defined
            struct.pack(">I", n_tracks + 1),  # next_track_ID
        ]
    )
    traks = b"".join(_box(b"trak", b"") for _ in range(n_tracks))
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + traks)
    return ftyp + moov


def _walk(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos: pos + 4])
        btype = data[pos + 4: pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8: pos + 16])
            hdr = 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def parse_mp4_meta(data: bytes) -> _ty.Dict[str, _ty.Any]:
    """Box-walk an ISO-BMFF stream -> {major_brand, timescale, duration,
    duration_ms, n_tracks}. duration_ms is exact integer math
    (duration * 1000 DIV timescale)."""
    major = None
    timescale = duration = None
    n_tracks = 0
    for btype, b0, b1 in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            major = data[b0: b0 + 4].decode("latin-1")
        elif btype == b"moov":
            for ctype, c0, c1 in _walk(data, b0, b1):
                if ctype == b"mvhd":
                    version = data[c0]
                    if version == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", data[c0 + 20: c0 + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", data[c0 + 12: c0 + 20]
                        )
                elif ctype == b"trak":
                    n_tracks += 1
    if major is None or timescale is None:
        raise ValueError("not an MP4 (missing ftyp/moov/mvhd)")
    return {
        "major_brand": major,
        "timescale": int(timescale),
        "duration": int(duration),
        "duration_ms": int(duration) * 1000 // int(timescale) if timescale else None,
        "n_tracks": n_tracks,
    }
