"""Structured Streaming wrappers: the streaming plan must agree with the
batch plan on the same data (availableNow + memory sink)."""

from torcharrow_spark.sources import read_parquet_ns
from torcharrow_spark.streaming import (
    sessionize,
    windowed_counts_batch,
    windowed_counts_stream,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = read_parquet_ns(f"{sf_dir}/events.parquet", spark).to_spark()
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_counts_batch(ev, "1 hour").collect()
    }

    # re-land with microsecond timestamps: streaming reads the raw files,
    # and Spark's parquet reader rejects the source's nanos encoding
    stream_dir = str(tmp_path / "events_us")
    ev.write.mode("overwrite").parquet(stream_dir)

    q = windowed_counts_stream(
        spark, stream_dir, ev.schema, window="1 hour", query_name="t_stream"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_stream").collect()
    }
    assert stream == batch


def test_sessionize_gap(spark):
    import datetime as dtm

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dtm.timedelta(minutes=10), 2.0),
        (1, base + dtm.timedelta(minutes=60), 3.0),  # gap > 30min -> new session
        (2, base, 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    out = sessionize(ev, 30).orderBy("user_id", "session_seq").collect()
    assert [(r["user_id"], r["n_events"]) for r in out] == [(1, 2), (1, 1), (2, 1)]


def test_stateful_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization == batch window sessionization
    on in-order data (state carries sessions across micro-batches)."""
    from torcharrow_spark.streaming import sessionize_stream, with_session_ids

    ev = read_parquet_ns(f"{sf_dir}/events.parquet", spark).to_spark()
    ev = ev.select("user_id", "ts", "value")
    batch = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in with_session_ids(ev, 30).collect()
    }

    stream_dir = str(tmp_path / "events_us2")
    ev.write.mode("overwrite").parquet(stream_dir)
    q = sessionize_stream(spark, stream_dir, ev.schema, 30, query_name="t_sess")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["ts"].replace(tzinfo=None)): r["session_seq"]
        for r in spark.sql("SELECT * FROM t_sess").collect()
    }
    assert len(got) == len(batch)
    mismatches = {k: (v, batch.get(k)) for k, v in got.items() if batch.get(k) != v}
    assert not mismatches, list(mismatches.items())[:5]
