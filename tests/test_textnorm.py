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
