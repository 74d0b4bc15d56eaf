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

r6 closes the FRAME half (the last multimodal planning stub): a real
sample-table writer/reader pair per ISO/IEC 14496-12 — trak/mdia/minf/
stbl with stts, stsc, stsz, stco (+co64) — so frames stored as
stdlib-decodable image samples (PNG/BMP/PPM via `imagecodec`, the way
q142's WAV carries PCM) round-trip bit-exactly: `encode_mp4_video`
packs frames into mdat and writes the sample tables;
`parse_mp4_samples` walks them back to absolute (offset, size) per
sample, honoring multi-run stsc chunk maps and fixed-size stsz. What
is NOT here, by contract: entropy codecs (H.264/VP9) — those need
codec libraries the container doesn't ship; a track whose samples are
not self-describing images simply yields undecodable sample bytes.
"""

from __future__ import annotations

import struct
import typing as _ty

__all__ = ["encode_mp4_meta", "parse_mp4_meta", "encode_mp4_video", "parse_mp4_samples"]


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


def _fullbox(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + body)


def encode_mp4_video(
    frames: _ty.Sequence[bytes],
    timescale: int = 600,
    frame_duration: int = 20,
    major_brand: bytes = b"isom",
) -> bytes:
    """Minimal valid single-track MP4 whose mdat carries ``frames`` as
    the track's samples, with REAL sample tables (stts/stsc/stsz/stco)
    describing them — one chunk holding every sample, the layout a
    progressive-download writer produces. Any ISO-BMFF reader (ours or
    an external muxer) can recover each frame's exact bytes. Frames
    are opaque here; store stdlib-decodable images (encode_ppm /
    encode_bmp / encode_png) for a fully library-free decode path."""
    n = len(frames)
    duration = n * frame_duration
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + major_brand)
    mvhd_body = b"".join(
        [
            b"\x00\x00\x00\x00",
            struct.pack(">II", 0, 0),
            struct.pack(">I", timescale),
            struct.pack(">I", duration),
            struct.pack(">I", 0x00010000),
            struct.pack(">H", 0x0100),
            b"\x00" * 10,
            struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                        0x40000000),
            b"\x00" * 24,
            struct.pack(">I", 2),
        ]
    )

    def moov_for(chunk_offset: int) -> bytes:
        stsd = _fullbox(
            b"stsd",
            struct.pack(">I", 1) + _box(b"png ", b"\x00" * 6 + struct.pack(">H", 1)),
        )
        stts = _fullbox(b"stts", struct.pack(">III", 1, n, frame_duration))
        stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
        stsz = _fullbox(
            b"stsz",
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        stco = _fullbox(b"stco", struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdhd = _fullbox(
            b"mdhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _fullbox(
            b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", mdia)
        # mvhd_body already leads with its version+flags bytes
        return _box(b"moov", _box(b"mvhd", mvhd_body) + trak)

    # stco needs the mdat payload's absolute offset, which depends on
    # moov's size — the offset field is fixed-width, so sizing with a
    # placeholder then rebuilding with the real value converges in one
    # pass (the standard faststart-writer trick)
    moov_len = len(moov_for(0))
    payload_off = len(ftyp) + moov_len + 8
    moov = moov_for(payload_off)
    assert len(moov) == moov_len
    mdat = _box(b"mdat", b"".join(bytes(f) for f in frames))
    return ftyp + moov + mdat


def _find_boxes(data: bytes, start: int, end: int) -> _ty.Dict[bytes, _ty.Tuple[int, int]]:
    return {t: (a, b) for t, a, b in _walk(data, start, end)}


def parse_mp4_samples(data: bytes) -> _ty.List[_ty.Dict[str, _ty.Any]]:
    """Walk every trak's sample tables -> one dict per track:
    ``{handler, timescale, duration, samples: [(abs_offset, size),
    ...]}``. Honors multi-run stsc sample-to-chunk maps, fixed-size
    stsz, and 64-bit co64 chunk offsets; malformed tables raise."""
    tracks: _ty.List[_ty.Dict[str, _ty.Any]] = []
    top = _find_boxes(data, 0, len(data))
    if b"moov" not in top:
        raise ValueError("not an MP4 (missing moov)")
    for btype, b0, b1 in _walk(data, *top[b"moov"]):
        if btype != b"trak":
            continue
        mdia = _find_boxes(data, b0, b1).get(b"mdia")
        if mdia is None:
            continue
        mboxes = _find_boxes(data, *mdia)
        handler = timescale = duration = None
        if b"mdhd" in mboxes:
            c0 = mboxes[b"mdhd"][0]
            if data[c0] == 1:
                timescale, duration = struct.unpack(">IQ", data[c0 + 20: c0 + 32])
            else:
                timescale, duration = struct.unpack(">II", data[c0 + 12: c0 + 20])
        if b"hdlr" in mboxes:
            c0 = mboxes[b"hdlr"][0]
            handler = data[c0 + 8: c0 + 12].decode("latin-1")
        if b"minf" not in mboxes:
            continue
        stbl = _find_boxes(data, *mboxes[b"minf"]).get(b"stbl")
        if stbl is None:
            continue
        sboxes = _find_boxes(data, *stbl)
        if b"stsz" not in sboxes or b"stsc" not in sboxes or (
            b"stco" not in sboxes and b"co64" not in sboxes
        ):
            continue
        c0 = sboxes[b"stsz"][0]
        fixed, count = struct.unpack(">II", data[c0 + 4: c0 + 12])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(
                struct.unpack(f">{count}I", data[c0 + 12: c0 + 12 + 4 * count])
            )
        if b"stco" in sboxes:
            c0 = sboxes[b"stco"][0]
            (nch,) = struct.unpack(">I", data[c0 + 4: c0 + 8])
            offsets = list(struct.unpack(f">{nch}I", data[c0 + 8: c0 + 8 + 4 * nch]))
        else:
            c0 = sboxes[b"co64"][0]
            (nch,) = struct.unpack(">I", data[c0 + 4: c0 + 8])
            offsets = list(struct.unpack(f">{nch}Q", data[c0 + 8: c0 + 8 + 8 * nch]))
        c0 = sboxes[b"stsc"][0]
        (nrun,) = struct.unpack(">I", data[c0 + 4: c0 + 8])
        runs = [
            struct.unpack(">III", data[c0 + 8 + 12 * i: c0 + 20 + 12 * i])
            for i in range(nrun)
        ]
        # expand sample-to-chunk runs: run i covers chunks
        # [first_chunk_i, first_chunk_{i+1}) with samples_per_chunk each
        samples: _ty.List[_ty.Tuple[int, int]] = []
        si = 0
        for ri, (first, per, _desc) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < nrun else len(offsets)
            for ch in range(first, last + 1):
                if ch - 1 >= len(offsets) or si >= count:
                    break
                off = offsets[ch - 1]
                for _ in range(per):
                    if si >= count:
                        break
                    samples.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        if si != count:
            raise ValueError(
                f"stsc/stco cover {si} samples but stsz declares {count}"
            )
        for off, sz in samples:
            if off + sz > len(data):
                raise ValueError("sample extends past EOF")
        tracks.append(
            {
                "handler": handler,
                "timescale": int(timescale) if timescale is not None else None,
                "duration": int(duration) if duration is not None else None,
                "samples": samples,
            }
        )
    return tracks
