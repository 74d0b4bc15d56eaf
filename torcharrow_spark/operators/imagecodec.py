"""Pure-stdlib image codecs for the multimodal operators.

Real decode paths for three public formats — PNG (RFC 2083 / W3C spec:
zlib-compressed scanlines with per-row filters 0-4), BMP
(BITMAPINFOHEADER, uncompressed 24/32-bit), and PPM (netpbm P6/P3) —
implemented against the published specifications with only ``zlib``,
``struct`` and numpy. No imaging library is required, so the
``fake=False`` paths in :mod:`multimodal` are genuinely executable in
this container.

Reference parity note: the reference engine ships NO media kernels at
all; these codecs exist because the brief's training-data pipeline
treats multimodal columns as first-class. The kernels are
correctness-grade (bit-exact against the specs, golden-tested); a
production deployment would swap a SIMD decoder (PIL/torchvision/ffmpeg)
into the same mapInPandas slots — the Spark-side plumbing is identical.

All decoders return ``(width, height, pixels)`` with ``pixels`` an
``np.uint8`` array of shape (height, width, channels).
"""

from __future__ import annotations

import struct
import typing as _ty
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> _ty.Tuple[int, int, np.ndarray]:
    """Decode an 8-bit non-interlaced PNG (color types 0/2/4/6) per the
    public spec: chunk walk -> zlib inflate -> per-scanline unfilter
    (None/Sub/Up/Average/Paeth)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _COLOR_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return w, h, out.reshape(h, w, channels)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal spec-correct PNG encoder (8-bit gray/rgb/rgba, one IDAT,
    a single filter type for every row — selectable so tests can force
    each unfilter branch)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = arr.reshape(h, w * channels).astype(np.int16)
    lines = bytearray()
    prev = np.zeros(w * channels, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(channels, np.int16), row[:-channels]])
            enc = (row - left) % 256
        elif filter_type == 2:
            enc = (row - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(channels, np.int16), row[:-channels]])
            enc = (row - ((left + prev) >> 1)) % 256
        elif filter_type == 4:
            left = np.concatenate([np.zeros(channels, np.int16), row[:-channels]])
            ul = np.concatenate([np.zeros(channels, np.int16), prev[:-channels]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, ul)],
                dtype=np.int16,
            )
            enc = (row - pred) % 256
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = row
    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP

def decode_bmp(data: bytes) -> _ty.Tuple[int, int, np.ndarray]:
    """Decode an uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER BMP:
    bottom-up rows (top-down when height < 0), 4-byte row padding, BGR(A)
    byte order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hsize,) = struct.unpack("<I", data[14:18])
    if hsize < 40:
        raise ValueError(f"unsupported BMP header size {hsize}")
    w, h_signed = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h_signed < 0
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for row in range(h):
        src = offset + row * stride
        y = row if top_down else h - 1 - row
        line = np.frombuffer(data[src : src + w * nch], dtype=np.uint8).reshape(
            w, nch
        )
        px[y] = line[:, 2::-1]  # BGR(A) -> RGB
    return w, h, px


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB encoder (bottom-up, padded rows)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body.extend(row)
        body.extend(b"\x00" * (stride - len(row)))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


# ---------------------------------------------------------------------------
# PPM (netpbm)

def decode_ppm(data: bytes) -> _ty.Tuple[int, int, np.ndarray]:
    """Decode P6 (binary) or P3 (ascii) PPM, maxval 255."""
    magic = data[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError("not a PPM")
    # header tokens: magic, width, height, maxval (with # comments)
    tokens: _ty.List[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(data[start:pos])
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    if magic == b"P6":
        pos += 1  # exactly one whitespace after maxval
        px = np.frombuffer(data[pos : pos + w * h * 3], dtype=np.uint8)
    else:
        px = np.array(data[pos:].split(), dtype=np.int64).astype(np.uint8)
    return w, h, px.reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 encoder — the re-encode format for :func:`multimodal.resize_media`."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# dispatch

def sniff_format(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P6", b"P3"):
        return "ppm"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image(data: bytes) -> _ty.Tuple[int, int, np.ndarray]:
    """Sniff + decode. Raises ValueError for unsupported formats."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "jpeg":
        # r9: pure-stdlib baseline-sequential decoder (jpegcodec);
        # progressive/arithmetic streams raise with the feature named
        from .jpegcodec import decode_jpeg

        return decode_jpeg(data)
    raise ValueError(
        "unsupported image format (supported: png, bmp, ppm, jpeg)"
    )


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (vectorized index gather)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]
