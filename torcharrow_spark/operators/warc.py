"""WARC (Web ARChive, ISO 28500) container parsing — the format web
corpora actually arrive in (Common Crawl ships WARC files of gzipped
records). Pure stdlib, same contract as the other codecs: exact fields
or a ValueError naming the defect.

A WARC file is a sequence of records: a ``WARC/1.x`` version line,
CRLF-separated named headers (``WARC-Type``, ``WARC-Target-URI``,
``Content-Length``, ...), a blank line, ``Content-Length`` bytes of
block, then CRLF CRLF. For ``response`` records the block is an HTTP
message; the payload a pipeline wants is the HTTP BODY, so the parser
splits status line + headers off and reports the status code alongside.

Common Crawl's layout gzips each record as its OWN gzip member and
concatenates the members — which is what makes the format splittable
at scale (a reader can resync on member boundaries). ``parse_warc``
accepts both plain and per-record-gzip streams (sniffed by magic).

Scale notes: `warc_records` is per-row map work over a binary column
(zero shuffle) — the same plumbing as the image/audio/video codecs. At
100 TB the unit of parallelism is the WARC FILE (Common Crawl ships
~1 GB files, tens of thousands per crawl), so one task per file via a
binary-source read is the natural layout; per-record gzip members mean
a finer-grained splitter can be added without touching this parser.
"""

from __future__ import annotations

import gzip
import io
import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


class WarcRecord(_ty.NamedTuple):
    warc_type: str
    target_uri: _ty.Optional[str]
    http_status: _ty.Optional[int]
    http_content_type: _ty.Optional[str]
    payload: bytes  # HTTP body for response records, raw block otherwise


def build_warc(
    records: _ty.Sequence[dict], gzip_members: bool = False
) -> bytes:
    """Synthesize a spec-valid WARC stream (the test/oracle half).
    Each record dict: ``type`` ('warcinfo'/'response'/...), optional
    ``uri``, ``payload`` (bytes), and for responses optional
    ``status`` (default 200) + ``content_type``. ``gzip_members=True``
    writes each record as its own gzip member — Common Crawl's
    on-disk layout."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        if rec["type"] == "response":
            status = rec.get("status", 200)
            ctype = rec.get("content_type", "text/html")
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("ascii") + payload
        else:
            http = payload
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["type"].encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:rec-%d>" % i,
            b"WARC-Date: 2026-01-01T00:00:00Z",
        ]
        if rec.get("uri"):
            headers.append(b"WARC-Target-URI: " + rec["uri"].encode("ascii"))
        if rec["type"] == "response":
            headers.append(
                b"Content-Type: application/http; msgtype=response"
            )
        headers.append(b"Content-Length: %d" % len(http))
        block = _CRLF.join(headers) + _CRLF * 2 + http + _CRLF * 2
        if gzip_members:
            buf = io.BytesIO()
            # fixed mtime: synthesized streams are byte-deterministic
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(block)
            out += buf.getvalue()
        else:
            out += block
    return bytes(out)


def _split_http(block: bytes) -> _ty.Tuple[_ty.Optional[int], _ty.Optional[str], bytes]:
    """HTTP response message -> (status, content-type, body)."""
    sep = block.find(_CRLF * 2)
    if sep < 0 or not block.startswith(b"HTTP/"):
        raise ValueError("warc: response block is not an HTTP message")
    head = block[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError("warc: malformed HTTP status line")
    status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        if ln.lower().startswith("content-type:"):
            ctype = ln.split(":", 1)[1].strip()
    return status, ctype, block[sep + 4:]


def parse_warc(data: bytes) -> _ty.List[WarcRecord]:
    """Parse a WARC stream (plain or per-record-gzip) into records.
    Truncated blocks, missing Content-Length, and non-WARC input raise
    with the defect named."""
    if data[:2] == b"\x1f\x8b":  # concatenated gzip members
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError) as e:
            raise ValueError(f"warc: bad gzip member: {e}") from None
    out: _ty.List[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise ValueError("warc: missing WARC/ version line")
        hdr_end = data.find(_CRLF * 2, pos)
        if hdr_end < 0:
            raise ValueError("warc: header block not terminated")
        headers: _ty.Dict[str, str] = {}
        for line in data[eol + 2 : hdr_end].split(_CRLF):
            if b":" not in line:
                raise ValueError("warc: malformed header line")
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        if "content-length" not in headers:
            raise ValueError("warc: record missing Content-Length")
        length = int(headers["content-length"])
        block_start = hdr_end + 4
        if block_start + length > n:
            raise ValueError("warc: record block truncated")
        block = data[block_start : block_start + length]
        wtype = headers.get("warc-type", "")
        status = ctype = None
        payload = block
        if wtype == "response":
            status, ctype, payload = _split_http(block)
        out.append(
            WarcRecord(
                wtype,
                headers.get("warc-target-uri"),
                status,
                ctype,
                payload,
            )
        )
        pos = block_start + length
    return out


def warc_records(
    df: SDF, bytes_col: str = "warc", id_col: str = "doc_id",
    types: _ty.Optional[_ty.Sequence[str]] = ("response",),
) -> SDF:
    """Explode WARC streams into one row per record: ``(id, rec_no,
    warc_type, target_uri, http_status, content_type, payload)`` with
    the payload as binary (an HTML payload feeds `webextract.
    html_extract` via ``decode(payload, 'UTF-8')``). ``types`` filters
    record types parser-side (default: responses only — warcinfo /
    request / metadata records never leave the worker); pass None to
    keep everything. Zero shuffle."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, False),
            T.StructField("rec_no", T.IntegerType(), True),
            T.StructField("warc_type", T.StringType(), True),
            T.StructField("target_uri", T.StringType(), True),
            T.StructField("http_status", T.IntegerType(), True),
            T.StructField("content_type", T.StringType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    src = spread_narrow_source(df.select(id_col, bytes_col))
    keep = None if types is None else set(types)

    def rec_iter(batches):
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                for k, r in enumerate(parse_warc(bytes(blob))):
                    if keep is not None and r.warc_type not in keep:
                        continue
                    rows.append(
                        (i, k, r.warc_type, r.target_uri, r.http_status,
                         r.http_content_type, bytearray(r.payload))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(rec_iter, out_schema)
