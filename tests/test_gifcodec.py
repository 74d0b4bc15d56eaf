"""GIF codec (operators/imagecodec): LZW exactness through code-width
growth, table reset, and the KwKwK case; interlace positional fidelity;
palette handling; container error discipline; dispatch integration."""

from __future__ import annotations

import numpy as np
import pytest

from torcharrow_spark.operators.imagecodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_image,
    encode_gif,
    sniff_format,
)


def _gray(w, h, seed=0):
    i = np.arange(w * h, dtype=np.int64)
    return ((seed * 7 + i * 13) % 256).astype(np.uint8).reshape(h, w)


def test_gray_roundtrip_exact():
    px = _gray(31, 17, seed=5)
    w, h, out = decode_gif(encode_gif(px))
    assert (w, h) == (31, 17)
    assert out.ndim == 2 and np.array_equal(out, px)


def test_color_palette_roundtrip():
    pal = [(k, (k * 3) % 256, (k * 7) % 256) for k in range(256)]
    idx = _gray(20, 15, seed=9)
    w, h, out = decode_gif(encode_gif(idx, palette=pal))
    assert out.shape == (15, 20, 3)
    expect = np.array(pal, dtype=np.uint8)[idx]
    assert np.array_equal(out, expect)


def test_interlace_positional_fidelity():
    # checksums are permutation-invariant; this is the POSITIONAL check
    # that de-interlacing puts every row back where it belongs
    px = _gray(13, 29, seed=3)  # height hits all four pass groups
    _, _, out = decode_gif(encode_gif(px, interlace=True))
    assert np.array_equal(out, px)
    # and an interlaced encode differs on the wire from a sequential one
    assert encode_gif(px, interlace=True) != encode_gif(px)


def test_lzw_width_growth_and_table_reset():
    # pseudorandom bytes generate mostly-new table entries: ~20k input
    # drives next_code past 4096, forcing the mid-stream clear + the
    # 9->10->11->12 bit width ladder on both sides
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    comp = _lzw_encode(8, data)
    assert bytes(_lzw_decode(8, comp, len(data))) == data


def test_lzw_kwkwk_case():
    # runs of one symbol make the encoder emit codes it just created;
    # the decoder must synthesize prev + prev[0]
    data = b"\x07" * 500
    comp = _lzw_encode(8, data)
    assert bytes(_lzw_decode(8, comp, len(data))) == data


def test_lzw_truncation_raises():
    comp = _lzw_encode(8, b"hello world hello world")
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(8, comp[: len(comp) // 2], 1000)


def test_container_errors_named():
    px = _gray(8, 8)
    blob = encode_gif(px)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + blob[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(blob[:20])
    # trailer immediately after the color table: no image data
    with pytest.raises(ValueError, match="trailer"):
        decode_gif(blob[:13] + blob[13 : 13 + 768] + b"\x3b")


def test_extensions_skipped():
    px = _gray(9, 7, seed=1)
    blob = bytearray(encode_gif(px))
    # splice a Graphic Control Extension before the image descriptor
    gce = bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))
    at = blob.index(0x2C, 13 + 768)
    spliced = bytes(blob[:at]) + gce + bytes(blob[at:])
    _, _, out = decode_gif(spliced)
    assert np.array_equal(out, px)


def test_dispatch_and_sniff():
    px = _gray(10, 6, seed=2)
    blob = encode_gif(px)
    assert sniff_format(blob) == "gif"
    w, h, out = decode_image(blob)
    assert (w, h) == (10, 6) and np.array_equal(out, px)


def test_index_beyond_small_palette_raises():
    # hostile stream: a 2-entry color table with pixel indices past it
    # must be a named ValueError, not a numpy IndexError
    px = (_gray(8, 8) % 7).astype("uint8")  # indices 0..6
    blob = bytearray(encode_gif(px))
    blob[10] = (blob[10] & 0xF8) | 0x00  # GCT size bits -> 2 entries
    # drop the GCT down to 2 entries (6 bytes)
    trimmed = bytes(blob[:13]) + bytes(blob[13:19]) + bytes(blob[13 + 768:])
    with pytest.raises(ValueError, match="color table"):
        decode_gif(trimmed)


def test_short_pixel_data_raises():
    px = _gray(8, 8)
    blob = bytearray(encode_gif(px))
    # lie about the height: decoder must notice the LZW stream is short
    blob[8:10] = (16).to_bytes(2, "little")   # screen height
    at = 13 + 768 + 1 + 4 + 2                 # image descriptor height field
    blob[at : at + 2] = (16).to_bytes(2, "little")
    with pytest.raises(ValueError, match="short|truncated"):
        decode_gif(bytes(blob))


def test_multi_frame_gif_refused():
    # animated GIFs must raise, not silently return frame 1 as if it
    # were the whole image (r9 advisor finding)
    import numpy as np
    import pytest

    from torcharrow_spark.operators.imagecodec import decode_gif, encode_gif

    f1 = np.arange(12, dtype=np.uint8).reshape(3, 4)
    f2 = (f1 + 7).astype(np.uint8)
    g1, g2 = encode_gif(f1), encode_gif(f2)
    head_len = 6 + 7 + 768  # signature+screen descriptor + 256-entry GCT
    frame2 = g2[head_len:-1]  # 0x2C descriptor .. sub-block terminator
    animated = g1[:-1] + frame2 + b"\x3b"
    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(animated)
    # a graphic-control extension between the frames doesn't hide them
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(g1[:-1] + gce + frame2 + b"\x3b")
    # single frame with a trailing comment extension still decodes
    comment = b"\x21\xfe\x02hi\x00"
    w, h, px = decode_gif(g1[:-1] + comment + b"\x3b")
    assert (px == f1).all()


# ---------------------------------------------------------------------------
# animated frames (r11): decode_gif_frames compositing semantics


def _ref_composite(sw, sh, frames, palette):
    """Reference compositor: literal GIF89a rendering rules, written
    independently of the decoder (numpy indexing instead of the
    decoder's region views) so a shared bug can't self-confirm."""
    pal = np.array(
        list(palette) + [(0, 0, 0)] * (256 - len(palette)), dtype=np.uint8
    )
    canvas = np.zeros((sh, sw, 3), np.uint8)
    canvas[:, :] = pal[0]
    out = []
    for fr in frames:
        idx = np.asarray(fr["idx"], np.uint8)
        fh, fw = idx.shape
        left, top = fr.get("left", 0), fr.get("top", 0)
        p = fr.get("palette")
        lpal = pal if p is None else np.array(
            list(p) + [(0, 0, 0)] * (256 - len(p)), np.uint8
        )
        before = canvas.copy()
        rgb = lpal[idx]
        region = canvas[top : top + fh, left : left + fw]
        tr = fr.get("transparent")
        if tr is not None:
            m = idx != tr
            region[m] = rgb[m]
        else:
            region[:, :] = rgb
        out.append(canvas.copy())
        d = fr.get("disposal", 0)
        if d == 2:
            canvas[top : top + fh, left : left + fw] = pal[0]
        elif d == 3:
            canvas = before
    return np.stack(out)


def test_animation_composites_all_disposal_and_transparency_paths():
    from torcharrow_spark.operators.imagecodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.RandomState(7)
    sw, sh = 19, 14
    pal = [(k, (k * 3) % 256, (k * 7) % 256) for k in range(256)]
    frames = [
        {"idx": rng.randint(0, 256, (sh, sw), dtype=np.uint8)},
        # sub-rect + binding transparency, leave-in-place disposal
        {"idx": rng.randint(0, 256, (sh - 4, sw - 5), dtype=np.uint8),
         "left": 3, "top": 2, "disposal": 1, "transparent": 17},
        # restore-to-background disposal
        {"idx": rng.randint(0, 256, (6, 7), dtype=np.uint8),
         "left": 10, "top": 5, "disposal": 2},
        # restore-previous disposal + interlaced sub-frame
        {"idx": rng.randint(0, 256, (5, 5), dtype=np.uint8),
         "disposal": 3, "interlace": True},
        # per-frame local color table overriding the global one
        {"idx": rng.randint(0, 256, (sh, sw), dtype=np.uint8),
         "palette": [(k, k, k) for k in range(256)]},
    ]
    data = encode_gif_animated(sw, sh, frames, palette=pal)
    w, h, got = decode_gif_frames(data)
    assert (w, h) == (sw, sh)
    assert got.shape == (5, sh, sw, 3)
    assert np.array_equal(got, _ref_composite(sw, sh, frames, pal))


def test_animation_grayscale_collapses_to_2d():
    from torcharrow_spark.operators.imagecodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.RandomState(3)
    frames = [
        {"idx": rng.randint(0, 256, (6, 8), dtype=np.uint8)}
        for _ in range(3)
    ]
    w, h, got = decode_gif_frames(encode_gif_animated(8, 6, frames))
    assert got.shape == (3, 6, 8)
    assert np.array_equal(got[0], frames[0]["idx"])
    assert np.array_equal(got[2], frames[2]["idx"])


def test_animation_single_frame_matches_decode_gif():
    from torcharrow_spark.operators.imagecodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    idx = np.arange(72, dtype=np.uint8).reshape(8, 9)
    data = encode_gif(idx)
    w1, h1, single = decode_gif(data)
    w2, h2, frames = decode_gif_frames(data)
    assert (w1, h1) == (w2, h2) and frames.shape[0] == 1
    assert np.array_equal(frames[0], single)


def test_animation_errors_named():
    import pytest

    from torcharrow_spark.operators.imagecodec import (
        decode_gif_frames,
        encode_gif_animated,
    )

    idx = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="outside the logical screen"):
        encode_gif_animated(5, 5, [{"idx": idx, "left": 2, "top": 2}])
    data = encode_gif_animated(6, 6, [{"idx": idx}])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif_frames(data[:-10])
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif_frames(b"NOTAGIF" + data)


# ---------------------------------------------------------------------------
# r13 pins: the integer-keyed LZW encoder and cached-base-table decoder
# must be BYTE-IDENTICAL to the r12 byte-string reference forms, which are
# kept here verbatim as the oracle.


def _lzw_encode_reference(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = c
    if w:
        emit(table[w])
    emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_reference(min_code_size: int, data: bytes, max_out: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    acc = nacc = pos = 0
    n = len(data)
    while True:
        while nacc < width:
            if pos >= n:
                raise ValueError("gif: LZW stream truncated (no end code)")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code beyond string table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == 1 << width and width < 12:
                width += 1
        out += entry
        if len(out) > max_out:
            raise ValueError("gif: LZW output exceeds image size")
        prev = entry


def test_lzw_int_table_matches_reference_implementation():
    """Every stream shape: empty, single byte, all-one-symbol (KwKwK),
    tiny alphabet repeats (deep strings), pseudorandom 20k (forces the
    width ladder AND the 4096 table reset, twice), and sub-8-bit code
    sizes. Encoder output and decoder output must be byte-identical to
    the r12 reference forms."""
    rng = np.random.default_rng(7)
    streams = [
        (8, b""),
        (8, b"\x00"),
        (8, b"\x07" * 500),
        (8, bytes((rng.integers(0, 3, size=4000, dtype=np.uint8)).tobytes())),
        (8, rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()),
        (8, rng.integers(0, 256, size=45000, dtype=np.uint8).tobytes()),
        (4, rng.integers(0, 16, size=3000, dtype=np.uint8).tobytes()),
        (2, rng.integers(0, 4, size=2000, dtype=np.uint8).tobytes()),
    ]
    for mcs, data in streams:
        ref = _lzw_encode_reference(mcs, data)
        new = _lzw_encode(mcs, data)
        assert new == ref, f"encode diverged (mcs={mcs}, n={len(data)})"
        assert bytes(_lzw_decode(mcs, ref, len(data) + 1)) == bytes(
            _lzw_decode_reference(mcs, ref, len(data) + 1)
        )
        assert bytes(_lzw_decode(mcs, ref, len(data) + 1)) == data


def test_lzw_decode_error_contract_unchanged():
    comp = _lzw_encode(8, b"abcabcabc")
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(8, comp[:2], 100)
    with pytest.raises(ValueError, match="exceeds image size"):
        _lzw_decode(8, comp, 3)
