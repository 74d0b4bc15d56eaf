"""Pure-stdlib WAV (RIFF/PCM) codec — the audio half of the multimodal
family's REAL-decode story (the image half is `imagecodec`'s PNG/BMP/PPM
decoders). No external audio library exists in the target container, but
PCM WAV is a trivially parseable container: a RIFF chunk walk + a
little-endian sample array — so the decode path the Spark plumbing
exercises is a real byte-level decoder, not a stub, and an external SQL
oracle can reproduce its outputs arithmetically (q142).

Supported: PCM (format 1) 16-bit and 8-bit, any channel count / sample
rate. Compressed formats raise — production swaps in a codec library
behind the same (bytes) -> (rate, channels, samples) signature.
"""

from __future__ import annotations

import struct
import typing as _ty

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(
    samples: "np.ndarray", sample_rate: int, channels: int = 1
) -> bytes:
    """PCM16 little-endian WAV. ``samples`` is int16, frame-major
    (interleaved when channels > 1, total length = frames * channels)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        s = s.reshape(-1)
    if len(s) % channels:
        raise ValueError("sample count not divisible by channel count")
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack(
                "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
                channels * 2, 16,
            ),
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    return hdr + data


def decode_wav(data: bytes) -> _ty.Tuple[int, int, "np.ndarray"]:
    """Parse a RIFF/WAVE byte string -> (sample_rate, channels, samples)
    with samples as int16 (8-bit PCM is widened, offset-binary -> signed).
    Walks chunks properly (extra chunks like LIST/fact are skipped), so
    real-world files with metadata decode too."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos: pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4: pos + 8])
        if pos + 8 + size > len(data):
            # a declared chunk extending past the stream is a truncated
            # file — raise rather than silently decode fewer samples
            # (wrong n_samples/duration/checksum); same contract as the
            # MP4 walker
            raise ValueError(f"truncated {cid!r} chunk")
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1:
        raise ValueError(f"compressed WAV (format {audio_format}) unsupported")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2")
    elif bits == 8:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    return int(sample_rate), int(channels), samples
