"""Streaming ↔ batch duality tests (SURVEY §2.2 B06/B07): the streaming
result must equal the batch expression of the same window logic."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadou_spark.catalog import load_table
from amadou_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_table,
    session_windows_batch,
    sliding_counts,
    stream_dedup_by_key,
    tumbling_counts,
)


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_table(
        tumbling_counts(read_events_stream(spark, sf_dir)), mode="complete"
    )
    batch_out = tumbling_counts(load_table(spark, sf_dir, "events"))
    assert _sorted_rows(stream_out, "wstart", "event_type") == _sorted_rows(
        batch_out, "wstart", "event_type"
    )


def test_sliding_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_table(
        sliding_counts(read_events_stream(spark, sf_dir)), mode="complete"
    )
    batch_out = sliding_counts(load_table(spark, sf_dir, "events"))
    assert _sorted_rows(stream_out, "wstart", "event_type") == _sorted_rows(
        batch_out, "wstart", "event_type"
    )


def test_session_windows_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_table(
        session_windows_batch(read_events_stream(spark, sf_dir)), mode="complete"
    )
    batch_out = session_windows_batch(load_table(spark, sf_dir, "events"))
    key = ("user_id", "session_start")
    assert _sorted_rows(stream_out, *key) == _sorted_rows(batch_out, *key)


def test_stream_dedup_drops_in_watermark_duplicates(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    doubled = stream.union(stream)
    deduped = stream_dedup_by_key(doubled, "event_id")
    counts = run_stream_to_table(
        deduped.groupBy("event_type").agg(F.count("*").alias("n")), mode="complete"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    assert _sorted_rows(counts, "event_type") == _sorted_rows(batch, "event_type")
