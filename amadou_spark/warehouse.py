"""Warehouse seam (reference: the BigQuery pathway, SURVEY §3.3).

The reference ships data to/from BigQuery: SQL pushed into the
warehouse, loads staged through GCS, extracts read back as CSV. The
new engine inverts this: Catalyst IS the warehouse, so the default
implementation is a local "parquet warehouse" (`spark.sql` for query,
plain reads/writes for load/extract) behind the same interface. A real
external warehouse (BigQuery/Snowflake/JDBC) plugs in behind
`Warehouse` without touching job code.

Semantics carried over from the reference:
- `query(sql, dest)` — run SQL, persist result to a destination table
  (BigQueryClient.scala:98-111; priority flags become no-ops here);
- `load(df, table, mode)` — append/overwrite disposition mapping
  (package.scala:152-181 — minus the lossy Decimal→INTEGER cast, which
  we deliberately do NOT reproduce);
- `extract(table, path)` — table → files (BigQueryClient.scala:116-129);
- `has_data_for_date` — freshness probe (BigQueryClient.scala:142-169).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.dates import DateInterval
from amadou_spark.io import write_date_partition
from amadou_spark.urls import DataUrl


@dataclass(frozen=True)
class WarehouseTable:
    """(project, dataset, table) descriptor (reference: BigQueryTable).
    For the parquet warehouse, project maps to a root dir."""

    project: str
    dataset: str
    table: str

    @property
    def qualified(self) -> str:
        return f"{self.project}.{self.dataset}.{self.table}"


class Warehouse(Protocol):
    def query(self, sql: str, dest: WarehouseTable, mode: str = "overwrite") -> DataFrame: ...
    def load(self, df: DataFrame, table: WarehouseTable, mode: str = "append") -> None: ...
    def extract(self, table: WarehouseTable, path: DataUrl | str) -> None: ...
    def read(self, table: WarehouseTable) -> DataFrame: ...
    def has_data_for_date(self, table: WarehouseTable, date: DateInterval) -> bool: ...


class ParquetWarehouse:
    """Lake-native warehouse: tables are parquet dirs under
    `<root>/<dataset>/<table>`, day-partitioned by `date`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self, table: WarehouseTable) -> str:
        return f"{self.root}/{table.dataset}/{table.table}"

    def read(self, table: WarehouseTable) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def query(self, sql: str, dest: WarehouseTable | None = None, mode: str = "overwrite") -> DataFrame:
        """SQL entry point: where the reference ships the string to
        BigQuery and polls a job, we hand it to Catalyst — parse,
        optimize and execute locally — and optionally persist."""
        result = self.spark.sql(sql)
        if dest is not None:
            result.write.mode(mode).parquet(self._path(dest))
        return result

    def load(self, df: DataFrame, table: WarehouseTable, mode: str = "append") -> None:
        df.write.mode(mode).parquet(self._path(table))

    def load_partition(self, df: DataFrame, table: WarehouseTable, date: DateInterval) -> None:
        write_date_partition(df, self._path(table), date)

    def extract(self, table: WarehouseTable, path: DataUrl | str, fmt: str = "csv") -> None:
        writer = self.read(table).write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", True).csv(str(path))
        else:
            writer.format(fmt).save(str(path))

    def has_data_for_date(
        self, table: WarehouseTable, date: DateInterval, ts_col: str | None = None
    ) -> bool:
        url = DataUrl(self._path(table)) / f"date={date.partition_value()}"
        if not url.exists(self.spark):
            return False
        if ts_col is None:
            return True
        # reference variant: freshness by max(lastModifiedColumn) >= date
        row = (
            self.spark.read.parquet(str(url))
            .agg(F.max(ts_col).alias("mx"))
            .collect()[0]
        )
        return row.mx is not None and row.mx >= date.as_datetime().replace(tzinfo=None)
