"""Kafka STREAMING DATA source.

In the reference Kafka is monitoring-only (KafkaMessagingSystem.scala —
events out, never data in); the new engine's streaming surface
(streaming/windows.py) accepts any streaming DataFrame, so this wrapper
closes the loop: a Kafka topic becomes a `(key, value, ts, ...)` stream
that the same tumbling/sliding/session/stateful operators consume.

Needs the spark-sql-kafka package on the classpath at deploy time; the
plan construction itself has no hard import dependency."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: The wire schema Spark's kafka source emits (the subset we consume).
#: A file/memory stream with this schema is decode-compatible, which is
#: how the read path is CI-tested without a broker (test_streaming.py).
KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, timestamp TIMESTAMP, "
    "topic STRING, partition INT, offset LONG"
)


def decode_kafka_frame(
    stream: DataFrame, value_schema_ddl: str | None = None
) -> DataFrame:
    """Decode a kafka-wire-schema frame into the engine's
    ``(key, value, ts, topic, partition, offset [, parsed])`` stream
    contract: key/value bytes as UTF-8 strings, and — when a DDL schema
    is given — ``parsed`` as `from_json(value)`.

    Split out of :func:`read_kafka_stream` so the decode + downstream
    windowing path is executable in CI against a FileStreamSource
    carrying :data:`KAFKA_WIRE_SCHEMA` (no broker in the test image);
    only the `.format("kafka").load()` line itself needs the real
    connector."""
    decoded = stream.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
        "topic",
        "partition",
        "offset",
    )
    if value_schema_ddl is not None:
        decoded = decoded.withColumn("parsed", F.from_json("value", value_schema_ddl))
    return decoded


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    value_schema_ddl: str | None = None,
) -> DataFrame:
    """Subscribe to a topic; value bytes decoded as UTF-8 JSON when a
    schema is given (`from_json`), else passed through as string."""
    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_frame(stream, value_schema_ddl)
