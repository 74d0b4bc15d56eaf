"""WARC container (operators/warc): record framing, HTTP payload split,
per-record gzip members (the Common Crawl layout), error discipline,
and the Spark explode + html_extract composition."""

from __future__ import annotations

import pytest

from torcharrow_spark.operators.warc import build_warc, parse_warc


def _sample(gz=False):
    return build_warc(
        [
            {"type": "warcinfo", "payload": b"software: synth\r\n"},
            {
                "type": "response",
                "uri": "https://a.com/page",
                "payload": b"<html><body><p>hello</p></body></html>",
                "content_type": "text/html; charset=utf-8",
            },
            {"type": "request", "uri": "https://a.com/page",
             "payload": b"GET /page HTTP/1.1\r\n"},
            {
                "type": "response",
                "uri": "https://b.org/x",
                "payload": b"not found",
                "status": 404,
                "content_type": "text/plain",
            },
        ],
        gzip_members=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_parse_roundtrip(gz):
    recs = parse_warc(_sample(gz))
    assert [r.warc_type for r in recs] == [
        "warcinfo", "response", "request", "response",
    ]
    resp = recs[1]
    assert resp.target_uri == "https://a.com/page"
    assert resp.http_status == 200
    assert resp.http_content_type == "text/html; charset=utf-8"
    assert resp.payload == b"<html><body><p>hello</p></body></html>"
    assert recs[3].http_status == 404 and recs[3].payload == b"not found"
    # warcinfo/request blocks pass through raw
    assert recs[0].payload == b"software: synth\r\n"
    assert recs[0].http_status is None


def test_gzip_members_are_deterministic_and_sniffed():
    a, b = _sample(True), _sample(True)
    assert a == b and a[:2] == b"\x1f\x8b"
    assert parse_warc(a) == parse_warc(_sample(False))


def test_error_discipline():
    good = _sample()
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOTWARC/1.0\r\n" + good)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[: len(good) - 30])
    # strip Content-Length from the first record's headers
    broken = good.replace(b"Content-Length:", b"X-Length:", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(broken)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b" + b"garbage")
    # response whose block is not an HTTP message
    bad_http = build_warc(
        [{"type": "warcinfo", "payload": b"x"}]
    ).replace(b"WARC-Type: warcinfo", b"WARC-Type: response")
    with pytest.raises(ValueError, match="HTTP"):
        parse_warc(bad_http)


def test_warc_records_spark_and_extract(spark):
    from pyspark.sql import functions as F

    from torcharrow_spark.operators import html_extract, warc_records

    blob = _sample(gz=True)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, None)], "doc_id long, warc binary"
    )
    recs = warc_records(df)  # default: responses only
    rows = recs.orderBy("doc_id", "rec_no").collect()
    assert [(r.doc_id, r.warc_type, r.http_status) for r in rows] == [
        (0, "response", 200), (0, "response", 404),
    ]
    # WARC -> html_extract composition: the real ingest front door
    pages = recs.where(F.col("content_type").startswith("text/html")).select(
        "doc_id", F.decode(F.col("payload"), "UTF-8").alias("html")
    )
    out = html_extract(pages).collect()
    assert len(out) == 1 and out[0].text == "hello"
    # types=None keeps every record
    assert warc_records(df, types=None).count() == 4
