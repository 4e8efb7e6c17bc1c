"""Structured Streaming surface (SURVEY §2.2 B06/B07).

The reference is batch-only (Kafka is monitoring-only); this module is
the engine's stream-shaped extension for the `events` table: tumbling /
sliding / session windows with watermarks, and stateful dedup —
Spark built-ins only, no custom state store.
"""

from amadou_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_table,
    session_windows_batch,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_table",
    "tumbling_counts",
    "sliding_counts",
    "session_windows_batch",
]
