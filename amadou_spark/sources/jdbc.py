"""JDBC source + script runner (reference: DatabaseUtils.scala:22-36
executes DDL/DML scripts; the read side is ours).

Scale posture: a naive `spark.read.jdbc(table)` is a SINGLE-task read —
one connection pulls the whole table through the driver-side executor.
`read_jdbc_partitioned` is the right shape at scale: N parallel
connections, each reading a range slice of a numeric partition column,
with predicate pushdown still applying per slice."""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from amadou_spark.managed import Managed

logger = logging.getLogger(__name__)

#: url-prefix → DB-API connection factory. sqlite ships with CPython, so
#: it is registered out of the box (and is what the tests exercise);
#: other drivers register via `register_driver` — the analog of putting
#: a JDBC driver jar on the classpath.
_DRIVERS: dict[str, Callable[[str, dict[str, str]], Any]] = {}


def register_driver(
    prefix: str, connect: Callable[[str, dict[str, str]], Any]
) -> None:
    """Register a DB-API connection factory for URLs starting with
    ``prefix``. ``connect(url, properties)`` must return a DB-API
    connection."""
    _DRIVERS[prefix] = connect


def _sqlite_connect(url: str, properties: dict[str, str]) -> Any:
    import sqlite3

    path = url.split("sqlite:", 1)[1]
    return sqlite3.connect(path)


register_driver("jdbc:sqlite:", _sqlite_connect)
register_driver("sqlite:", _sqlite_connect)


def run_scripts(
    url: str,
    properties: dict[str, str] | None,
    *scripts: str,
    spark: SparkSession | None = None,
) -> None:
    """Run a sequence of database DDL/DML scripts against ``url``
    (DatabaseUtils.scala:27-35: for { connection <- ManagedIO(...);
    statement <- ManagedIO(...); sql <- scripts } executeUpdate(sql)).

    Two execution paths:

    - a registered Python DB-API driver matching the URL prefix
      (sqlite out of the box) — no JVM needed;
    - otherwise, with ``spark`` given, the ACTUAL java.sql.DriverManager
      through py4j — any JDBC driver on Spark's classpath works (Derby
      ships with Spark and is what the tests round-trip).

    Connection and statement are bracketed so both close even when a
    script fails mid-sequence; the DB-API path commits once after the
    batch (DB-API autocommit is off by default, unlike JDBC)."""
    props = properties or {}
    driver = next((fn for p, fn in _DRIVERS.items() if url.startswith(p)), None)
    if driver is not None:
        def body(cursor: Any) -> None:
            for sql in scripts:
                logger.info("Executing SQL script in %s: %s", url, sql)
                cursor.execute(sql)

        conn = driver(url, props)
        try:
            Managed.of(lambda: conn.cursor()).use(body)
            conn.commit()
        finally:
            conn.close()
        return
    if spark is None:
        raise ValueError(
            f"no DB-API driver registered for {url!r}; use register_driver() "
            "or pass spark= to execute through the JVM's DriverManager"
        )
    jvm = spark.sparkContext._jvm
    jprops = jvm.java.util.Properties()
    for key, value in props.items():
        jprops.setProperty(key, value)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        try:
            for sql in scripts:
                logger.info("Executing SQL script in %s: %s", url, sql)
                stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


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
