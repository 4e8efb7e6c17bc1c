"""Data-layout queries: z-order (Morton) cell assignment, the
clustering key behind multi-column file pruning (see
operators/layout.py). The bit interleave is plain integer arithmetic,
so the full mapping is hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.layout import grid_cell, zvalue
from amadou_spark.queries import query

_Z_BITS = 8


def _zorder_oracle(bits: int = _Z_BITS) -> str:
    def interleave(col: str, d: int) -> str:
        return " | ".join(
            f"((({col} >> {b}) & 1) << {b * 2 + d})" for b in range(bits)
        )

    cells = (1 << bits) - 1
    return f"""
        WITH bounds AS (
            SELECT min(l_partkey) AS mn_p, max(l_partkey) AS mx_p,
                   min(l_suppkey) AS mn_s, max(l_suppkey) AS mx_s
            FROM lineitem
        ), cellsd AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(FLOOR((l_partkey - mn_p) * {cells} / (mx_p - mn_p)) AS BIGINT) AS px,
                   CAST(FLOOR((l_suppkey - mn_s) * {cells} / (mx_s - mn_s)) AS BIGINT) AS sx
            FROM lineitem CROSS JOIN bounds
        )
        SELECT l_orderkey, l_linenumber,
               ({interleave('px', 0)}) | ({interleave('sx', 1)}) AS zcell
        FROM cellsd
        ORDER BY l_orderkey, l_linenumber
    """


@query(
    "q62_zorder_cells",
    oracle=_zorder_oracle(),
    description="z-order (Morton) cell assignment over "
    "(l_partkey, l_suppkey): min-max scale each key onto an 8-bit grid "
    "and interleave the bits — the clustering key that keeps BOTH "
    "columns' per-file min-max ranges narrow when used with "
    "repartitionByRange + sortWithinPartitions (operators/layout.py "
    "write_zordered; effectiveness pinned by tests). Bounds come from "
    "one broadcast min/max aggregate; the z-value itself is a pure "
    "whole-stage-codegen projection",
)
def q62_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    li = t["lineitem"]
    bounds = li.agg(
        F.min("l_partkey").alias("mn_p"),
        F.max("l_partkey").alias("mx_p"),
        F.min("l_suppkey").alias("mn_s"),
        F.max("l_suppkey").alias("mx_s"),
    )
    cells = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).crossJoin(F.broadcast(bounds))
    px = grid_cell(F.col("l_partkey"), F.col("mn_p"), F.col("mx_p"), _Z_BITS)
    sx = grid_cell(F.col("l_suppkey"), F.col("mn_s"), F.col("mx_s"), _Z_BITS)
    return cells.select(
        "l_orderkey",
        "l_linenumber",
        zvalue([px, sx], _Z_BITS).alias("zcell"),
    ).orderBy("l_orderkey", "l_linenumber")
