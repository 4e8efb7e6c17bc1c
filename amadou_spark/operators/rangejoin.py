"""Range (point-in-interval) join via time bucketing.

Spark has no native interval join; the naive formulation
``points JOIN intervals ON ts >= start AND ts < end`` is a pure theta
join, which Catalyst can only execute as BroadcastNestedLoopJoin (small
interval side) or a cartesian product — quadratic, a scale-killer.

The scale path bins time into fixed-width buckets:

- each point lands in exactly ONE bucket: ``floor(epoch(ts) / w)``;
- each interval is exploded to the bucket range it covers
  (``sequence(floor(epoch(start)/w), floor(epoch(end)/w))`` — ≤
  ``ceil(len/w) + 1`` rows per interval);
- the two sides hash-equi-join on the bucket id (shuffle or broadcast,
  Catalyst's choice), and the exact predicate is applied as a residual
  filter.

Because a point occupies a single bucket, every qualifying
(point, interval) pair meets in exactly one bucket — no dedup step.
Cost is linear in points + exploded intervals + true matches; the
bucket id is uniformly distributed over the time range, so the shuffle
has no inherent skew (a hot bucket means a genuinely hot time window —
AQE skew-join splits it).

Pick ``bucket_seconds`` ≈ the typical interval length: wider buckets
cut interval duplication but pull in more non-matching points per
bucket; narrower buckets do the reverse. Flink's interval join and
range-bucketing range joins in Trino/DuckDB use the same scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "_rj_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= ts < end`` (half-open, like DateInterval).

    Returns all point columns plus all interval columns; the two
    DataFrames must not share column names. Timestamps are compared at
    full (microsecond) precision — bucketing is conservative-only.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    pts = points.withColumn(
        _B, F.floor(F.col(ts_col).cast("double") / w).cast("long")
    )
    ivs = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / w).cast("long"),
                F.floor(F.col(end_col).cast("double") / w).cast("long"),
            )
        ),
    )
    joined = pts.join(ivs, on=_B, how="inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop(_B)
