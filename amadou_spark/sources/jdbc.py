"""JDBC source (the read side the reference lacks —
DatabaseUtils.scala:27-35 only executes DDL/DML scripts).

Scale posture: a naive `spark.read.jdbc(table)` is a SINGLE-task read —
one connection pulls the whole table through the driver-side executor.
`read_jdbc_partitioned` is the right shape at scale: N parallel
connections, each reading a range slice of a numeric partition column,
with predicate pushdown still applying per slice."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Single-partition JDBC read — small dimension tables only."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    return reader.load()


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Range-partitioned parallel JDBC read: ``num_partitions``
    concurrent connections each scanning one slice of
    ``partition_column`` ∈ [lower_bound, upper_bound]."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    return reader.load()
