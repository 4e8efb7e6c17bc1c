"""Data profiling: per-column quality statistics in ONE pass.

The shape that matters at 100 TB: every column's null count, distinct
estimate, and min/max collected in a single scan (one aggregate row),
then unpivoted to a tidy (column, metric) table driver-side — never N
scans for N columns, and nothing but the final tiny row leaves the
executors."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_rate, approx_distinct) per column;
    single-pass aggregate + explode of a literal struct array."""
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").cast("bigint").alias("n_nulls"),
                F.round(F.col(f"_nulls_{c}") / F.col("_n"), 6).alias("null_rate"),
                F.col(f"_dist_{c}").cast("bigint").alias("approx_distinct"),
            )
            for c in columns
        ]
    )
    return one.select(F.explode(entries).alias("p")).select("p.*")
