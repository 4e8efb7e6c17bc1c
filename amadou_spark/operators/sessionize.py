"""Batch sessionization: gap-based session assignment via lag + cumsum.

Complements `F.session_window` (streaming/windows.py): this variant
keeps EVERY event row and attaches a session id — the shape you want
when downstream work is per-event (attribution, feature extraction) —
where session_window collapses to one row per session.

Plan shape: one shuffle on the key, one within-partition sort, two
window passes — identical cost to the session_window aggregation, and
the classic formulation every warehouse uses, so it is oracle-checkable
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Attach `session_id` (1-based per key, in time order) to every
    event. A new session starts when the gap from the previous event
    reaches ``gap_seconds`` (>=, matching session_window's half-open
    [start, last+gap) windows)."""
    w = W.partitionBy(key).orderBy(ts)
    secs = F.col(ts).cast("timestamp").cast("long")
    prev = F.lag(F.col(ts)).over(w).cast("timestamp").cast("long")
    is_new = F.when(
        prev.isNull() | ((secs - prev) >= gap_seconds), 1
    ).otherwise(0)
    return (
        events.withColumn("_new", is_new)
        .withColumn(
            "session_id",
            F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
        )
        .drop("_new")
    )


def session_bounds(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Collapse sessionized events to per-session bounds — equivalent to
    F.session_window aggregation (tests assert exact equality)."""
    gap = F.expr(f"INTERVAL {gap_seconds} SECONDS")
    return (
        sessionize(events, key, ts, gap_seconds)
        .groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            (F.max(ts) + gap).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
