"""Unicode hygiene for raw web text: normalization, control-character
stripping, and mojibake (encoding-corruption) repair.

Web-scale corpora arrive with a measurable fraction of text that was
UTF-8-encoded but decoded as Latin-1/CP1252 somewhere upstream ("Ã©"
where "é" was meant). The classic repair (the core of the public
``ftfy`` approach) is to re-encode with the wrong codec and re-decode
as UTF-8, applied ONLY when it round-trips cleanly and strictly reduces
a badness score — so clean text is never harmed by the attempt.

Everything here is per-row, zero-shuffle, Arrow-batched — the same
ingest-primitive contract as webextract: the operator is deterministic
and exactly replayable, normalization policy beyond it belongs to
downstream textstats ops.
"""

from __future__ import annotations

import typing as _ty
import unicodedata

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Characters that signal a UTF-8-as-Latin1 double decode: the Latin-1
# lead bytes of 2/3-byte UTF-8 sequences plus the CP1252 artifacts that
# ride along with them. Individually each is legitimate text; scoring
# counts them so repair only fires when it strictly helps.
_SUSPECTS = frozenset("ÃÂâ€šžŸ�")


def badness(s: str) -> int:
    """Count of mojibake-suspect characters + replacement chars. The
    repair fires only when this STRICTLY decreases, so genuine uses
    (a French sentence with 'à' is fine — 'à' is not a suspect) are
    untouched."""
    return sum(1 for ch in s if ch in _SUSPECTS)


def repair_mojibake(s: str) -> _ty.Tuple[str, bool]:
    """Undo one layer of UTF-8-read-as-Latin-1/CP1252 corruption.
    Returns ``(text, was_repaired)``. CP1252 is tried first (the
    browser-default misread: its 0x80-0x9F block carries printable
    characters like the euro sign and curly quotes, so 'â€™'-style
    corruption is only reversible through it), then Latin-1 (total
    over the C1 range CP1252 leaves undefined). A candidate is
    accepted only if the reverse round-trip decodes as UTF-8 AND
    strictly reduces the badness score — any failure leaves the input
    unchanged."""
    before = badness(s)
    if before == 0:
        return s, False
    for codec in ("cp1252", "latin-1"):
        try:
            candidate = s.encode(codec).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if badness(candidate) < before:
            return candidate, True
    return s, False


# C0/C1 controls minus the whitespace the corpus needs (tab, LF, CR).
_CTRL = {c: None for c in range(0x20) if chr(c) not in "\t\n\r"}
_CTRL.update({c: None for c in range(0x7F, 0xA0)})


def clean_text(s: str, form: str = "NFC") -> _ty.Tuple[str, bool, bool]:
    """Full hygiene pass: mojibake repair -> unicode normalization ->
    control-character strip. Returns ``(text, was_mojibake,
    had_controls)``."""
    s, was_mojibake = repair_mojibake(s)
    s = unicodedata.normalize(form, s)
    stripped = s.translate(_CTRL)
    return stripped, was_mojibake, len(stripped) != len(s)


def normalize_text(
    df: SDF,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    passthrough: _ty.Sequence[str] = (),
) -> SDF:
    """Unicode hygiene on Spark: ``(id, text, was_mojibake,
    had_controls, n_chars, *passthrough)``.

    Arrow-batched ``mapInPandas`` (unicodedata + codec round-trips are
    genuinely Python); zero shuffle; output is the cleaned text plus
    the two per-document audit flags a curation run reports upstream
    ("0.4% of this crawl was double-encoded"). ``n_chars`` is the
    cleaned length — the arithmetic handle for external verification.
    ``passthrough`` columns ride through the batch untouched, so a
    chain (e.g. html_extract -> normalize_text) never needs a join to
    keep its metadata."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(id_col, fields[id_col].dataType, False),
            T.StructField("text", T.StringType(), True),
            T.StructField("was_mojibake", T.BooleanType(), True),
            T.StructField("had_controls", T.BooleanType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
        + [T.StructField(c, fields[c].dataType, True) for c in passthrough]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    src = spread_narrow_source(df.select(id_col, text_col, *passthrough))
    cols = [f.name for f in out_schema.fields]
    extras = list(passthrough)

    def clean_iter(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            series = [pdf[id_col], pdf[text_col]] + [pdf[c] for c in extras]
            for i, s, *tail in zip(*series):
                tail = tuple(tail)
                if s is None:
                    rows.append((i, None, None, None, None) + tail)
                    continue
                t, moji, ctrl = clean_text(s, form=form)
                rows.append((i, t, moji, ctrl, len(t)) + tail)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(clean_iter, out_schema)


#: single-byte labels that decode EVERY byte string (or nearly so) —
#: a declaration in this family can never be falsified by the data,
#: so strict UTF-8 validation outranks it when both decode
_LATIN_FAMILY = frozenset(
    {
        "latin-1", "latin1", "latin_1", "iso-8859-1", "iso8859-1",
        "iso_8859_1", "l1", "8859", "cp819", "windows-1252", "cp1252",
        "ascii", "us-ascii",
    }
)


def detect_encoding(data: bytes) -> str:
    """Charset of a raw web payload, by the standard precedence a
    crawler uses: byte-order mark first (UTF-8/UTF-16/UTF-32 BOMs),
    then an HTML ``<meta charset=...>`` / HTTP-equiv declaration in
    the first 1024 bytes (the WHATWG prescan window), then strict
    UTF-8 validation, else Latin-1 (the total fallback — every byte
    string decodes). Every stage is validated against the DATA, not
    just the label: a page whose declared charset (or even whose BOM)
    fails to decode its own bytes falls through to the next stage, so
    the returned codec ALWAYS decodes the payload — web pages lie
    about their charset routinely, and one liar must not kill a job.
    The declaration scan is anchored to ``<meta`` tags (charset= in a
    URL or visible text cannot hijack decoding), and a latin-family
    label on bytes that strictly validate as non-ASCII UTF-8 yields
    to ``utf-8`` — the latin family decodes anything, so only the
    UTF-8 validation is evidence. Returns a codec name
    ``bytes.decode`` accepts."""

    def _decodes(name: str) -> bool:
        try:
            data.decode(name)
            return True
        except (LookupError, UnicodeDecodeError):
            return False

    if data[:3] == b"\xef\xbb\xbf" and _decodes("utf-8-sig"):
        return "utf-8-sig"
    if data[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff") and _decodes(
        "utf-32"
    ):
        return "utf-32"
    if data[:2] in (b"\xff\xfe", b"\xfe\xff") and _decodes("utf-16"):
        return "utf-16"
    head = data[:1024].lower()
    # anchored prescan: charset= is honored only INSIDE a <meta ...>
    # tag — matching any charset= substring would let a URL query
    # param or visible text ('?charset=iso-8859-1') hijack decoding,
    # and since latin-1 decodes every byte string, _decodes() could
    # never reject the hijacked label
    name = ""
    scan = 0
    while not name:
        m = head.find(b"<meta", scan)
        if m < 0:
            break
        tag_end = head.find(b">", m)
        tag = head[m : tag_end if tag_end >= 0 else len(head)]
        at = tag.find(b"charset=")
        if at >= 0:
            val = tag[at + 8 : at + 40].strip(b"'\" ")
            end = min(
                (i for i in (val.find(b'"'), val.find(b"'"), val.find(b">"),
                             val.find(b" "), val.find(b"/")) if i >= 0),
                default=len(val),
            )
            name = val[:end].decode("ascii", "ignore").strip()
        scan = m + 5
    # mislabeled/unknown charsets fall through to content sniffing;
    # a latin-family label (which decodes ANY bytes, so the label
    # itself is unfalsifiable) on a payload that strictly validates as
    # UTF-8 with real non-ASCII content is almost always a lie — the
    # data-validated codec wins over the unvalidatable one
    if name and _decodes(name):
        if (
            name in _LATIN_FAMILY
            and not data.isascii()
            and _decodes("utf-8")
        ):
            return "utf-8"
        return name
    if _decodes("utf-8"):
        return "utf-8"
    return "latin-1"


def decode_payload(data: bytes) -> _ty.Tuple[str, str]:
    """(text, encoding) for a raw payload via `detect_encoding`."""
    enc = detect_encoding(data)
    return data.decode(enc), enc


def decode_payloads(
    df: SDF,
    bytes_col: str = "payload",
    id_col: str = "doc_id",
    passthrough: _ty.Sequence[str] = (),
) -> SDF:
    """Charset-sniffing bytes -> text on Spark: ``(id, text,
    encoding[, *passthrough])``. The step between a WARC record's body
    and html_extract — real crawl payloads declare their charset in a
    BOM, a meta tag, or not at all, and decoding everything as UTF-8
    mangles the Latin-1/UTF-16 tail of the web. ``passthrough``
    columns (e.g. the WARC target URI) ride through the batch UDF so
    no metadata join is ever needed. Zero shuffle, Arrow-batched."""
    fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(id_col, fields[id_col].dataType, False),
            T.StructField("text", T.StringType(), True),
            T.StructField("encoding", T.StringType(), True),
        ]
        + [T.StructField(c, fields[c].dataType, True) for c in passthrough]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    extras = list(passthrough)
    src = spread_narrow_source(df.select(id_col, bytes_col, *extras))
    cols = [id_col, "text", "encoding"] + extras

    def decode_iter(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            series = [pdf[id_col], pdf[bytes_col]] + [pdf[c] for c in extras]
            for i, b, *tail in zip(*series):
                tail = tuple(tail)
                if b is None:
                    rows.append((i, None, None) + tail)
                    continue
                text, enc = decode_payload(bytes(b))
                rows.append((i, text, enc) + tail)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(decode_iter, out_schema)


def corrupt_as_latin1(col: F.Column) -> F.Column:
    """Synthesize one layer of UTF-8-read-as-Latin-1 mojibake JVM-side
    (encode the string's UTF-8 bytes, reinterpret each byte as its
    Latin-1 codepoint = decode('latin-1')). Spark's decode('ISO-8859-1')
    does exactly that byte->codepoint lift, so test corruption never
    leaves Catalyst."""
    return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")
