"""Extension queries beyond the reference surface: as-of join,
pivot/unpivot — operators a production analytics engine needs that
Spark either lacks natively (as-of) or that deserve explicit coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.asof import asof_join
from amadou_spark.queries import query


@query(
    "q31_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, o.o_orderdate AS matched_o_orderdate
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    description="as-of join (Spark has no native one): latest order at or "
    "before each event per user, via tag-union + last(ignorenulls) window — "
    "ONE key shuffle, no range explosion; oracle = DuckDB native ASOF JOIN. "
    "Output exposes only the matched timestamp, which is deterministic under "
    "ties (engines may pick different rows among equal timestamps)",
)
def q31_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        t["orders"],
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=[],
    )
    return joined.select("event_id", "user_id", "matched_o_orderdate").orderBy("event_id")


_PIVOT_STATUSES = ["O", "F", "P"]


@query(
    "q32_pivot",
    oracle="""
        SELECT prio AS o_orderpriority,
               ROUND("O", 2) AS total_O, ROUND("F", 2) AS total_F, ROUND("P", 2) AS total_P
        FROM (
            SELECT o_orderpriority AS prio, o_orderstatus AS s, o_totalprice AS v FROM orders
        ) PIVOT (SUM(v) FOR s IN ('O', 'F', 'P'))
        ORDER BY o_orderpriority
    """,
    description="pivot: order totals by priority × status (explicit value "
    "list — at scale an implicit pivot triggers a distinct-scan first)",
)
def q32_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    pivoted = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.round(F.col(s), 2).alias(f"total_{s}") for s in _PIVOT_STATUSES],
    ).orderBy("o_orderpriority")


@query(
    "q32_unpivot",
    oracle="""
        SELECT n_nationkey, 'nationkey' AS attr, CAST(n_nationkey AS BIGINT) AS val FROM nation
        UNION ALL
        SELECT n_nationkey, 'regionkey' AS attr, CAST(n_regionkey AS BIGINT) AS val FROM nation
        ORDER BY n_nationkey, attr
    """,
    description="unpivot/melt: wide→long reshaping (Spark unpivot; oracle "
    "spelled as UNION ALL for engine portability)",
)
def q32_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    wide = t["nation"].select(
        "n_nationkey",
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        F.col("n_regionkey").cast("bigint").alias("regionkey"),
    )
    return (
        wide.unpivot("n_nationkey", ["nationkey", "regionkey"], "attr", "val")
        .orderBy("n_nationkey", "attr")
    )
