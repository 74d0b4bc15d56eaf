"""Unicode hygiene (operators/textnorm): mojibake repair exactness and
safety, control stripping, normalization forms, Spark operator schema."""

from __future__ import annotations

import unicodedata

import pytest

from torcharrow_spark.operators.textnorm import (
    badness,
    clean_text,
    normalize_text,
    repair_mojibake,
)


def _corrupt(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def test_repair_undoes_one_latin1_layer():
    orig = "café — naïve ünïcode"
    bad = _corrupt(orig)
    assert bad != orig and badness(bad) > 0
    fixed, flag = repair_mojibake(bad)
    assert fixed == orig and flag is True


def test_repair_never_touches_clean_text():
    for s in ["plain ascii", "café déjà vu", "日本語のテキスト", "emoji ☕"]:
        fixed, flag = repair_mojibake(s)
        assert fixed == s and flag is False


def test_repair_requires_strict_improvement():
    # a legitimate sentence containing a suspect char whose 'repair'
    # would NOT reduce badness (not valid UTF-8 bytes) stays untouched
    s = "the letter Ã alone"
    fixed, flag = repair_mojibake(s)
    assert fixed == s and flag is False


def test_clean_strips_controls_keeps_whitespace():
    t, moji, ctrl = clean_text("a\x07b\tc\nd\x9fe")
    assert t == "ab\tc\nde" and ctrl is True and moji is False
    t2, _, ctrl2 = clean_text("no controls")
    assert t2 == "no controls" and ctrl2 is False


def test_nfc_normalization():
    decomposed = "café"  # e + combining acute
    t, _, _ = clean_text(decomposed)
    assert t == "café" and unicodedata.is_normalized("NFC", t)


def test_nfkc_compatibility_fold():
    t, _, _ = clean_text("ﬁle ①", form="NFKC")
    assert t == "file 1"


def test_repair_then_normalize_then_strip_order():
    # corruption of text that ALSO carries a control char: repair first
    # (else the latin-1 bytes are mangled), strip last
    orig = "ok é\x07 done"
    t, moji, ctrl = clean_text(_corrupt(orig))
    assert t == "ok é done" and moji is True and ctrl is True


def test_repair_undoes_cp1252_layer():
    # the browser-default misread: UTF-8 bytes decoded as Windows-1252
    # land in 0x80-0x9F PRINTABLES (euro, curly quotes) that Latin-1
    # cannot re-encode — the repair must go back through cp1252
    # (avoid ” — its UTF-8 tail byte 0x9D is undefined in cp1252, so a
    # strict cp1252 misread of it can't occur in the first place)
    orig = "it’s café — a “quote"
    bad = orig.encode("utf-8").decode("cp1252")
    assert "â€™" in bad
    fixed, flag = repair_mojibake(bad)
    assert fixed == orig and flag is True


def test_mislabeled_charset_never_crashes():
    from torcharrow_spark.operators.textnorm import decode_payload, detect_encoding

    # page DECLARES utf-8 but carries invalid utf-8 bytes: the label
    # must fall through to content sniffing (latin-1 total fallback)
    liar = b'<meta charset="utf-8">caf\xe9 raw \x80 bytes'
    assert detect_encoding(liar) == "latin-1"
    text, enc = decode_payload(liar)
    assert enc == "latin-1" and "café" in text
    # BOM prefix with a payload the BOM codec cannot decode: same rule
    fake_bom = b"\xff\xfe" + b"\x00"  # odd length: not valid UTF-16
    text2, enc2 = decode_payload(fake_bom)
    assert enc2 == "latin-1" and len(text2) == 3


def test_detect_encoding_precedence():
    from torcharrow_spark.operators.textnorm import decode_payload, detect_encoding

    s = "héllo wörld — ☕"
    # BOMs win over everything
    assert detect_encoding(b"\xef\xbb\xbf" + s.encode("utf-8")) == "utf-8-sig"
    assert detect_encoding(s.encode("utf-16")) == "utf-16"
    assert detect_encoding(s.encode("utf-32")) == "utf-32"
    # meta charset inside the 1024-byte prescan window
    page = ('<html><head><meta charset="iso-8859-1"></head><body>'
            "caf\xe9</body></html>").encode("latin-1")
    assert detect_encoding(page) == "iso-8859-1"
    assert "café" in decode_payload(page)[0]
    # http-equiv form with trailing quote/semicolon noise
    page2 = (b'<meta http-equiv="Content-Type" '
             b'content="text/html; charset=UTF-8">' + s.encode("utf-8"))
    assert detect_encoding(page2) == "utf-8"
    # unknown charset label falls through to content sniffing
    junk = b'<meta charset="not-a-codec">plain ascii'
    assert detect_encoding(junk) == "utf-8"
    # no declaration: valid UTF-8 detected, else Latin-1 total fallback
    assert detect_encoding(s.encode("utf-8")) == "utf-8"
    assert detect_encoding(b"caf\xe9 nai\xefve") == "latin-1"
    # every path round-trips losslessly
    for raw, want in [
        (b"\xef\xbb\xbf" + s.encode("utf-8"), s),
        (s.encode("utf-16"), s),
        (b"caf\xe9", "café"),
    ]:
        assert decode_payload(raw)[0] == want


def test_decode_payloads_spark(spark):
    from torcharrow_spark.operators.textnorm import decode_payloads

    s = "héllo — wörld"
    rows = [
        (0, bytearray(s.encode("utf-8"))),
        (1, bytearray(s.encode("utf-16"))),
        (2, bytearray(b"caf\xe9")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_payloads(df).collect()}
    assert out[0].text == s and out[0].encoding == "utf-8"
    assert out[1].text == s and out[1].encoding == "utf-16"
    assert out[2].text == "café" and out[2].encoding == "latin-1"
    assert out[3].text is None


def test_normalize_text_spark(spark):
    rows = [(0, _corrupt("naïve é")), (1, "clean\x07text"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[0].text == "naïve é" and out[0].was_mojibake is True
    assert out[1].text == "cleantext" and out[1].had_controls is True
    assert out[1].was_mojibake is False
    assert out[2].text is None and out[2].n_chars is None
    assert out[0].n_chars == len("naïve é")


def test_normalize_text_rejects_bad_form(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_charset_prescan_anchored_to_meta_tags():
    # the r9 advisor's hijack: 'charset=' in a URL query param or in
    # visible text must NOT be honored — only a <meta ...> declaration
    from torcharrow_spark.operators.textnorm import detect_encoding

    utf8_body = "café — ☃".encode("utf-8")
    hijack = b'<a href="/x?charset=iso-8859-1">link</a>' + utf8_body
    assert detect_encoding(hijack) == "utf-8"
    visible = b"set charset=latin-1 in your editor " + utf8_body
    assert detect_encoding(visible) == "utf-8"
    # a real meta declaration still wins (non-UTF-8 bytes)
    real = b'<meta charset="iso-8859-1">caf\xe9'
    assert detect_encoding(real) == "iso-8859-1"
    # charset= in a LATER meta tag is still found
    two = b'<meta name="viewport" content="width=1"><meta charset="iso-8859-1">caf\xe9'
    assert detect_encoding(two) == "iso-8859-1"


def test_latin_label_yields_to_strict_utf8():
    # a latin-family label decodes ANY bytes, so it is unfalsifiable;
    # bytes that strictly validate as non-ASCII UTF-8 outrank the lie
    from torcharrow_spark.operators.textnorm import decode_payload, detect_encoding

    s = "naïve café ☃"
    lying = b'<meta charset="iso-8859-1">' + s.encode("utf-8")
    assert detect_encoding(lying) == "utf-8"
    assert s in decode_payload(lying)[0]
    # pure-ASCII payload: the label is harmless, keep it
    ascii_page = b'<meta charset="iso-8859-1">plain ascii only'
    assert detect_encoding(ascii_page) == "iso-8859-1"
    # genuinely latin-1 bytes (invalid UTF-8): the label stands
    true_latin = b'<meta charset="iso-8859-1">caf\xe9 nai\xefve'
    assert detect_encoding(true_latin) == "iso-8859-1"
