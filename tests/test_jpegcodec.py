"""Baseline JPEG decode (r9, VERDICT r8 ask #6): exactness against the
decoder-independent integer formula for the oracle family, a full-
coefficient IDCT cross-check against the brute-force T.81 definition,
and the truncated/progressive error discipline the verdict named."""

from __future__ import annotations

import numpy as np
import pytest

from torcharrow_spark.operators.jpegcodec import (
    K3_AC_LUMA,
    SIGN4,
    ZIGZAG,
    _BitWriter,
    _huff_codes,
    _write_coef,
    decode_jpeg,
    encode_jpeg_blocks,
    expected_blocks,
)

RNG = np.random.RandomState(7)


def test_gray_dc_ac_exact():
    dc = RNG.randint(-58, 58, size=(3, 5))
    ac = RNG.randint(-24, 25, size=(3, 5))
    w, h, px = decode_jpeg(encode_jpeg_blocks(dc, ac, quant=8))
    assert (w, h) == (40, 24) and px.shape == (24, 40)
    assert np.array_equal(px, expected_blocks(dc, ac, 8))
    # 16-multiple quant stays exact too (d*quant/8 integer)
    w, h, px = decode_jpeg(encode_jpeg_blocks(dc // 2, ac // 2, quant=16))
    assert np.array_equal(px, expected_blocks(dc // 2, ac // 2, 16))


def _rgb_expected(y: np.ndarray, cb: int, cr: int) -> np.ndarray:
    """The shared floor(x+0.5) rounding contract, chroma constant —
    the same arithmetic the q152 SQL oracle replays."""
    y = y.astype(np.float64)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(np.floor(c + 0.5), 0, 255) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def test_color_444_exact():
    dc = RNG.randint(-50, 50, size=(2, 4))
    ac = RNG.randint(-20, 21, size=(2, 4))
    w, h, px = decode_jpeg(encode_jpeg_blocks(dc, ac, color=(108, 148)))
    assert px.shape == (16, 32, 3)
    assert np.array_equal(px, _rgb_expected(expected_blocks(dc, ac, 8), 108, 148))


def test_color_420_subsampled_exact():
    """2x2-sampled luma (4 Y blocks per MCU) with constant chroma —
    replication upsampling of a constant is exact, so the whole
    subsampling path is checksum-verifiable."""
    dc = RNG.randint(-50, 50, size=(4, 6))
    ac = RNG.randint(-20, 21, size=(4, 6))
    w, h, px = decode_jpeg(
        encode_jpeg_blocks(dc, ac, color=(120, 136), subsample=True)
    )
    assert px.shape == (32, 48, 3)
    assert np.array_equal(px, _rgb_expected(expected_blocks(dc, ac, 8), 120, 136))


def test_restart_markers_exact():
    dc = RNG.randint(-58, 58, size=(4, 4))
    ac = RNG.randint(-24, 25, size=(4, 4))
    for ri in (1, 2, 5):
        w, h, px = decode_jpeg(
            encode_jpeg_blocks(dc, ac, restart_interval=ri)
        )
        assert np.array_equal(px, expected_blocks(dc, ac, 8))
    # color + restarts together (chroma DC predictors reset too)
    w, h, px = decode_jpeg(
        encode_jpeg_blocks(dc, ac, color=(112, 144), restart_interval=3)
    )
    assert np.array_equal(px, _rgb_expected(expected_blocks(dc, ac, 8), 112, 144))


def _encode_full_gray(coefs: np.ndarray, quant: int = 8) -> bytes:
    """Test-side GENERAL encoder: arbitrary quantized coefficients for
    every zigzag position (exercises the decoder's run-lengths, ZRL,
    every magnitude size) — built by splicing a full entropy segment
    into encode_jpeg_blocks' headers."""
    by, bx = coefs.shape[:2]
    shell = encode_jpeg_blocks(np.zeros((by, bx), dtype=np.int64), quant=quant)
    sos_at = shell.find(b"\xff\xda")
    sos_len = int.from_bytes(shell[sos_at + 2 : sos_at + 4], "big")
    head = shell[: sos_at + 2 + sos_len]
    from torcharrow_spark.operators.jpegcodec import K3_DC_LUMA

    dc_codes = _huff_codes(*K3_DC_LUMA)
    ac_codes = _huff_codes(*K3_AC_LUMA)
    wtr = _BitWriter()
    pred = 0
    for i in range(by):
        for j in range(bx):
            zz = coefs[i, j]
            _write_coef(wtr, dc_codes, 0, int(zz[0]) - pred)
            pred = int(zz[0])
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    _write_coef(wtr, ac_codes, 15, 0)  # ZRL
                    run -= 16
                _write_coef(wtr, ac_codes, run, int(zz[k]))
                run = 0
            if last_nz < 63:
                _write_coef(wtr, ac_codes, 0, 0)  # EOB
    wtr.align()
    return bytes(head) + bytes(wtr.out) + b"\xff\xd9"


def test_full_coefficient_idct_matches_spec_definition():
    """Arbitrary coefficients in every zigzag slot, decoded through the
    real Huffman path, against the brute-force T.81 A.3.3 IDCT double
    sum — validates dezigzag, run-length/ZRL decode, and the matrix
    IDCT in one shot."""
    by, bx, quant = 2, 3, 8
    coefs = RNG.randint(-20, 21, size=(by, bx, 64))
    coefs[..., 0] = RNG.randint(-80, 81, size=(by, bx))
    w, h, px = decode_jpeg(_encode_full_gray(coefs, quant))
    assert (h, w) == (by * 8, bx * 8)

    def c(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    exp = np.zeros((h, w))
    for i in range(by):
        for j in range(bx):
            F = np.zeros((8, 8))
            for k, (vv, uu) in enumerate(ZIGZAG):
                F[vv, uu] = coefs[i, j, k] * quant
            for y in range(8):
                for x in range(8):
                    s = sum(
                        c(u) * c(v) / 4.0 * F[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                        for u in range(8)
                        for v in range(8)
                    )
                    exp[i * 8 + y, j * 8 + x] = s + 128.0
    got_float = px.astype(np.float64)
    sampled = np.clip(np.floor(exp + 0.5), 0, 255)
    # summation-order float drift must stay far below the 0.5 sampling
    # granularity; then the sampled pixels agree exactly
    assert np.abs(sampled - got_float).max() == 0


def test_sign4_is_the_u4_basis():
    """The oracle's +-1 pattern IS cos((2x+1)4pi/16)*sqrt(2)."""
    basis = np.cos((2 * np.arange(8) + 1) * 4 * np.pi / 16) * np.sqrt(2)
    assert np.allclose(basis, np.array(SIGN4), atol=1e-12)


def test_q152_offset_identity_exhaustive():
    """The q152 oracle replaces per-pixel floor(y + k + 0.5) with
    y + floor(k + 0.5) (integer offsets) — exact for integer y, but
    the decoder's y carries ~1e-13 of IDCT float dust, so frac(k+0.5)
    must sit safely away from 0/1 for every chroma constant the query
    can generate. Exhaustive scan of the full (cb, cr, y) domain."""
    cbs = [108 + m * 10 for m in range(3)]
    crs = [118 + m * 5 for m in range(5)]
    ys = np.arange(46, 210, dtype=np.float64)  # the generated y range
    for cb in cbs:
        for cr in crs:
            for k in (
                1.402 * (cr - 128.0),
                -0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                1.772 * (cb - 128.0),
            ):
                frac = (k + 0.5) % 1.0
                assert min(frac, 1.0 - frac) > 1e-9, (cb, cr, k)
                off = np.floor(k + 0.5)
                for eps in (-1e-12, 0.0, 1e-12):  # IDCT dust envelope
                    got = np.floor(ys + eps + k + 0.5)
                    assert np.array_equal(got, ys + off), (cb, cr, k, eps)


def test_progressive_equals_sequential():
    """r9: SOF2 decode — the four-scan successive-approximation script
    codes the SAME coefficients, so progressive pixels must equal the
    sequential ones EXACTLY, across gray/color, the newly-nonzero
    (|ac|==1) vs correction-bit (|ac|>=2) refinement paths, and
    restart markers inside every scan type."""
    dc = RNG.randint(-58, 58, size=(3, 4))
    ac = RNG.randint(-24, 25, size=(3, 4))
    ac[0, 0], ac[0, 1], ac[0, 2], ac[0, 3] = 0, 1, -1, 2  # force all paths
    exp = expected_blocks(dc, ac, 8)
    w, h, px = decode_jpeg(encode_jpeg_blocks(dc, ac, progressive=True))
    assert np.array_equal(px, exp)
    seq = decode_jpeg(encode_jpeg_blocks(dc, ac, color=(108, 148)))[2]
    prog = decode_jpeg(
        encode_jpeg_blocks(dc, ac, color=(108, 148), progressive=True)
    )[2]
    assert np.array_equal(prog, seq)
    for ri in (1, 3):
        p = decode_jpeg(
            encode_jpeg_blocks(
                dc, ac, color=(112, 144), progressive=True,
                restart_interval=ri,
            )
        )[2]
        s = decode_jpeg(encode_jpeg_blocks(dc, ac, color=(112, 144)))[2]
        assert np.array_equal(p, s), ri
    # progressive 4:2:0 — the real-world default shape: interleaved DC
    # scans carry four 2x2-ordered luma blocks per MCU while AC scans
    # run non-interleaved over each component's OWN (halved for
    # chroma) grid; decoder paths unreachable from 4:4:4 streams
    dc4 = RNG.randint(-50, 50, size=(4, 6))
    ac4 = RNG.randint(-20, 21, size=(4, 6))
    ac4[0, 0], ac4[0, 1], ac4[0, 2] = 1, -1, 0
    s420 = decode_jpeg(
        encode_jpeg_blocks(dc4, ac4, color=(120, 136), subsample=True)
    )[2]
    for ri in (0, 1, 3):
        p420 = decode_jpeg(
            encode_jpeg_blocks(
                dc4, ac4, color=(120, 136), subsample=True,
                progressive=True, restart_interval=ri,
            )
        )[2]
        assert np.array_equal(p420, s420), ri

    # truncation inside a progressive scan still raises, never a hang
    blob = encode_jpeg_blocks(dc, ac, progressive=True)
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(blob[: len(blob) - 6])


def test_error_discipline():
    dc = np.array([[1, 2], [3, 4]])
    good = encode_jpeg_blocks(dc, quant=8)

    # r9: SOF2 itself now decodes; a sequential-shaped scan header
    # under an SOF2 frame is still malformed (a progressive DC scan
    # must have Se == 0) and raises rather than mis-decoding
    with pytest.raises(ValueError, match="Se == 0"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9", 1))  # arithmetic
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    # truncation at EVERY boundary inside the entropy segment raises —
    # never wrong pixels, never a hang
    sos_at = good.find(b"\xff\xda")
    for cut in (sos_at + 8, len(good) - 4, len(good) - 3):
        with pytest.raises(ValueError, match="truncated|marker"):
            decode_jpeg(good[:cut])
    # 12-bit precision named
    twelve = bytearray(good)
    sof = good.find(b"\xff\xc0")
    twelve[sof + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(twelve))


def test_dispatch_and_stats_integration(spark):
    """sniff + decode_image route JPEG, and decode_image_stats carries
    it through the Spark plumbing like every other format."""
    from pyspark.sql import types as T

    from torcharrow_spark.operators import decode_image_stats
    from torcharrow_spark.operators.imagecodec import decode_image, sniff_format

    dc = np.array([[10, -20, 30]])
    ac = np.array([[5, -5, 0]])
    blob = encode_jpeg_blocks(dc, ac)
    assert sniff_format(blob) == "jpeg"
    w, h, px = decode_image(blob)
    exp = expected_blocks(dc, ac, 8)
    assert np.array_equal(px, exp)

    df = spark.createDataFrame(
        [(1, bytearray(blob))],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("img", T.BinaryType(), True),
            ]
        ),
    )
    row = decode_image_stats(df, "img", "doc_id").collect()[0]
    assert row["fmt"] == "jpeg"
    assert (row["width"], row["height"]) == (24, 8)
    assert row["px_sum"] == int(exp.sum())

    # JPEG input flows through resize_media unchanged (decode_image
    # dispatch): nearest-neighbor downsample of the exactly-known
    # pixels, re-encoded as PPM
    from torcharrow_spark.operators import resize_media
    from torcharrow_spark.operators.imagecodec import (
        decode_ppm,
        resize_nearest,
    )

    out = resize_media(df, "img", "doc_id", target_w=12, target_h=4).collect()[0]
    w2, h2, px2 = decode_ppm(bytes(out["resized"]))
    # compare against the decoder's own resize of the decoded pixels
    # (gray JPEG re-encodes via 3-channel PPM)
    _, _, dec = decode_image(blob)
    expected = resize_nearest(dec, 12, 4)
    if expected.ndim == 2:
        expected = np.stack([expected] * 3, axis=-1)
    assert (w2, h2) == (12, 4)
    assert np.array_equal(px2, expected)
