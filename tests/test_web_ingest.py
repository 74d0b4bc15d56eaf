"""web_ingest stream/batch twins (streaming.web_ingest_*): stateless
chain, exactly-once sink, stream == batch bit-exactness; plus the
normalize_text passthrough plumbing the chain relies on."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pages(spark, sf_dir, n=120):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(n)
    )
    page = F.concat(
        F.lit("<body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</h1><nav><a href="/">Home</a></nav><p>'),
        F.col("text"),
        F.lit(" café</p></body>"),
    )
    # corrupt half the pages with one latin-1 layer
    from torcharrow_spark.operators.textnorm import corrupt_as_latin1

    synth = F.when(F.col("doc_id") % 2 == 0, corrupt_as_latin1(page)).otherwise(page)
    return docs.select("doc_id", synth.alias("html"))


def test_normalize_text_passthrough(spark):
    from torcharrow_spark.operators.textnorm import normalize_text

    df = spark.createDataFrame(
        [(0, "x\x07y", "t0", 7), (1, None, "t1", 9)],
        "doc_id long, text string, title string, extra int",
    )
    out = {
        r.doc_id: r
        for r in normalize_text(df, passthrough=("title", "extra")).collect()
    }
    assert out[0].text == "xy" and out[0].title == "t0" and out[0].extra == 7
    assert out[1].text is None and out[1].title == "t1" and out[1].extra == 9


def test_web_ingest_batch_shape(spark, sf_dir):
    from torcharrow_spark.streaming import web_ingest_batch

    out = web_ingest_batch(_pages(spark, sf_dir))
    rows = out.collect()
    assert rows, "quality gate dropped everything"
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "title", "was_mojibake", "n_chars", "text_md5",
        "quality", "pred_lang",
    ]
    by_id = {r.doc_id: r for r in rows}
    for i, r in by_id.items():
        assert r.title == ""  # the test page has no <title> element
        assert r.was_mojibake == (i % 2 == 0)  # repair fired on corrupted half
        assert r.quality >= 0.3


def test_web_ingest_stream_matches_batch(spark, sf_dir, tmp_path):
    """Single-batch stream must be bit-identical to web_ingest_batch
    (the chain is stateless), and the overwrite-by-batch_id sink must
    be exactly-once under batch replay."""
    from torcharrow_spark.streaming import web_ingest_batch, web_ingest_stream

    pages = _pages(spark, sf_dir)
    want = {
        r.doc_id: (r.title, r.was_mojibake, r.n_chars, r.text_md5,
                   r.quality, r.pred_lang)
        for r in web_ingest_batch(pages).collect()
    }
    assert len(want) > 50

    src = str(tmp_path / "pages")
    pages.repartition(4).write.mode("overwrite").parquet(src)
    dest = str(tmp_path / "curated")
    schema = spark.read.parquet(src).schema
    q = web_ingest_stream(
        spark, src, schema, dest, str(tmp_path / "ckpt"),
        query_name="t_web_ingest",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    landed = spark.read.parquet(dest)
    got = {
        r.doc_id: (r.title, r.was_mojibake, r.n_chars, r.text_md5,
                   r.quality, r.pred_lang)
        for r in landed.collect()
    }
    assert got == want
    assert landed.select("batch_id").distinct().count() == 1

    # exactly-once: fresh checkpoint replays batch 0 into the same dest
    q2 = web_ingest_stream(
        spark, src, schema, dest, str(tmp_path / "ckpt2"),
        query_name="t_web_ingest2",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(dest).count() == len(want)


def test_web_ingest_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """Stateless chain: ANY micro-batch split of the source lands the
    same global result as one batch pass."""
    from torcharrow_spark.streaming import web_ingest_batch, web_ingest_stream

    pages = _pages(spark, sf_dir, n=80)
    want = {r.doc_id: r.text_md5 for r in web_ingest_batch(pages).collect()}

    src = str(tmp_path / "pages_mb")
    pages.repartition(6).write.mode("overwrite").parquet(src)
    dest = str(tmp_path / "curated_mb")
    schema = spark.read.parquet(src).schema
    q = web_ingest_stream(
        spark, src, schema, dest, str(tmp_path / "ckpt_mb"),
        query_name="t_web_ingest_mb", max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    landed = spark.read.parquet(dest)
    assert landed.select("batch_id").distinct().count() >= 2
    got = {r.doc_id: r.text_md5 for r in landed.collect()}
    assert got == want
