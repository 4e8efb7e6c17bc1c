"""Sketch-backed analytics queries: mergeable count-min frequency
estimation (hash-exact oracle — the grid construction is deterministic)
and HLL incremental distinct counts (approximate, tolerance-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
    hll_daily,
    hll_rolling_estimate,
)
from amadou_spark.queries import query


def _cms_oracle(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    ds = ", ".join(f"({i})" for i in range(depth))
    return f"""
        WITH ds(d) AS (VALUES {ds}),
        counters AS (
            SELECT d,
                   CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':'
                            || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % {width} AS bucket,
                   count(*) AS n
            FROM events CROSS JOIN ds
            GROUP BY 1, 2
        ),
        cand AS (SELECT DISTINCT user_id FROM events WHERE user_id < 40),
        probes AS (
            SELECT user_id, d,
                   CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':'
                            || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % {width} AS bucket
            FROM cand CROSS JOIN ds
        )
        SELECT user_id, MIN(n) AS est_count
        FROM probes JOIN counters USING (d, bucket)
        GROUP BY user_id
        ORDER BY user_id
    """


@query(
    "q60_cms_frequency",
    oracle=_cms_oracle(),
    description="count-min sketch frequency estimation, built as plain "
    "DataFrame ops: events stream -> (depth x width) counter grid (ONE "
    "shuffle of <= 4096 counter rows, map-side combined), then point "
    "estimates for a candidate key set as min-over-depths with the "
    "counter grid broadcast. Deterministic portable-md5 bucketing makes "
    "the whole sketch hash-exact against the DuckDB oracle; sketches "
    "from different days/partitions merge by bucket-wise sum "
    "(operators.sketch.cms_merge), so 100 TB pipelines keep per-day "
    "sketches and never rescan raw history",
)
def q60_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    counters = cms_counters(t["events"], "user_id")
    cand = t["events"].filter(F.col("user_id") < 40)
    return cms_estimate(counters, cand, "user_id").orderBy("user_id")


@query(
    "q61_hll_mergeable",
    oracle="""
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_tol
        FROM events GROUP BY 1
        UNION ALL
        SELECT NULL, COUNT(DISTINCT user_id), TRUE FROM events
        ORDER BY day NULLS LAST
    """,
    description="incremental distinct users via mergeable HLL sketches "
    "(Apache DataSketches builtins): per-day hll_sketch_agg(user_id) "
    "then hll_union_agg across days for the all-time figure — the "
    "per-day sketches are a few KB each and union associatively, so a "
    "date-range distinct count at 100 TB reads sketches, not events. "
    "Output: one row per day plus a NULL-day total row. Hash-checkable "
    "(r4): returns the EXACT distinct count plus a Spark-side boolean "
    "asserting the HLL estimate sits within 5% of it, so the driver's "
    "hash gate covers sketch quality (was rows-only)",
)
def q61_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    est = hll_rolling_estimate(hll_daily(t["events"]))
    per_day = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    total = t["events"].agg(
        F.count_distinct("user_id").alias("exact_users")
    ).select(F.lit(None).cast("date").alias("day"), "exact_users")
    exact = per_day.unionByName(total)
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= F.lit(0.05)
    return (
        est.join(exact, est["day"].eqNullSafe(exact["day"]))
        .select(est["day"], "exact_users", within.alias("within_tol"))
        .orderBy(F.col("day").asc_nulls_last())
    )
