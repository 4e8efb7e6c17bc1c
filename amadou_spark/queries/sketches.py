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
    oracle=None,  # estimates are approximate; tolerance pinned by pytest
    description="incremental distinct users via mergeable HLL sketches "
    "(Apache DataSketches builtins): per-day hll_sketch_agg(user_id) "
    "then hll_union_agg across days for the all-time figure — the "
    "per-day sketches are a few KB each and union associatively, so a "
    "date-range distinct count at 100 TB reads sketches, not events. "
    "Output: one row per day plus a NULL-day total row. Tolerance vs "
    "exact COUNT(DISTINCT) is pinned in tests/test_operators.py",
)
def q61_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return hll_rolling_estimate(hll_daily(t["events"])).orderBy(
        F.col("day").asc_nulls_last()
    )
