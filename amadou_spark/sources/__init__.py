"""External source/sink seams beyond the filesystem formats in io.py.

The reference's connector surface is BigQuery (warehouse.py carries
those semantics) plus JDBC script execution (DatabaseUtils.scala:27-35,
write-only — the new engine adds the READ side) and a monitoring-only
Kafka. These wrappers are config-gated: they build the right DataFrame
plans but need the corresponding driver jar / broker on the classpath
at deploy time (not present in the test container)."""

from amadou_spark.sources.jdbc import read_jdbc, read_jdbc_partitioned
from amadou_spark.sources.kafka import read_kafka_stream

__all__ = ["read_jdbc", "read_jdbc_partitioned", "read_kafka_stream"]
