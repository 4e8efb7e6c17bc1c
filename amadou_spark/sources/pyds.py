"""A custom connector via Spark 4's Python DataSource API.

The reference ships JVM connectors (CSV/JSON/parquet/BigQuery…); Spark 4
adds a pure-Python extension point for everything else — no JVM code,
no classpath surgery. This module implements `synthetic`, a
deterministic generator source used three ways:

- as the EXAMPLE of the connector seam (how a reference user would wrap
  an in-house feed: define schema, cut partitions, yield rows/batches);
- as a scale harness: rows are generated per-partition on executors,
  so `spark.read.format("synthetic").option("rows", 10**9)` drives
  shuffle/agg benchmarks with zero input I/O;
- with filter pushdown (`pushFilters`): partition-level pruning happens
  SOURCE-side, the Python analog of parquet min-max skipping.

Registration is per-session: `spark.dataSource.register(SyntheticSource)`
then `spark.read.format("synthetic")`.

Partitioning contract: `partitions()` returns one InputPartition per
parallel generator; `read(partition)` runs ON EXECUTORS and must be
pure (seeded by partition id — same output wherever it is scheduled,
which is what makes task retries safe)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


@dataclass
class _Part(InputPartition):
    part_id: int
    start: int
    end: int  # exclusive


class SyntheticReader(DataSourceReader):
    """Deterministic event generator: xorshift-mixed ids → stable
    (user_id, kind, value) per global row index, independent of
    partitioning."""

    _KINDS = ("view", "click", "purchase")

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.min_id: int | None = None  # set by pushFilters when prunable

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Note `id >= literal` bounds for partition pruning, but return
        EVERY filter as unhandled: this source prunes at partition
        granularity only (a surviving partition still contains rows
        below the bound), so Spark must re-apply the exact predicate
        after the scan. Consuming the filter here would silently return
        the extra rows — pruning must stay an optimization."""
        from pyspark.sql.datasource import GreaterThanOrEqual

        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("id",):
                self.min_id = max(self.min_id or 0, int(f.value))
        return iter(filters)

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_parts))
        parts = []
        for i in range(self.n_parts):
            lo, hi = i * per, min((i + 1) * per, self.n_rows)
            if lo >= hi:
                continue
            # source-side pruning: a partition whose whole range fails
            # the pushed id-bound is never scheduled at all
            if self.min_id is not None and hi <= self.min_id:
                continue
            parts.append(_Part(i, lo, hi))
        return parts

    @staticmethod
    def _mix(x: int) -> int:
        x = (x ^ (x >> 33)) * 0xFF51AFD7ED558CCD % (1 << 64)
        return (x ^ (x >> 33)) % (1 << 64)

    def read(self, partition: _Part):
        for i in range(partition.start, partition.end):
            h = self._mix(i + 1)
            yield (
                i,
                h % 1000,
                self._KINDS[(h >> 10) % 3],
                round((h >> 16) % 10_000 / 100.0, 2),
            )


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """The STREAMING face of the same generator: offsets are row
    indices; each micro-batch serves up to ``batch_rows`` rows and
    advances the offset, exhausting at ``rows``. `readBetweenOffsets`
    replays any committed range deterministically — that replayability
    is the whole recovery contract (a checkpoint restart re-reads the
    uncommitted range and gets identical rows).

    The Simple reader API prefetches on the DRIVER (no partition
    planning) — right for low-throughput control/config feeds; a
    high-volume stream implements DataSourceStreamReader with
    executor-side partitions instead."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _gen(self, lo: int, hi: int):
        # a LIST iterator, not a generator: the prefetch cache both
        # pickles the iterator (generators can't be) and calls next()
        # on it to validate emptiness (bare lists can't be)
        rows = [
            (
                i,
                h % 1000,
                SyntheticReader._KINDS[(h >> 10) % 3],
                round((h >> 16) % 10_000 / 100.0, 2),
            )
            for i in range(lo, hi)
            for h in (SyntheticReader._mix(i + 1),)
        ]
        return iter(rows)

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.batch_rows, self.n_rows)
        return self._gen(lo, hi), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._gen(start["index"], end["index"])


class SyntheticSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic"

    def schema(self) -> str:
        # a DDL string, not StructType.fromDDL: schema() may run in a
        # worker process with no active SparkSession to parse DDL
        return "id BIGINT, user_id BIGINT, kind STRING, value DOUBLE"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SyntheticStreamReader(self.options)


def register(spark) -> None:
    # runtime conf; Python-source filter pushdown ships disabled
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticSource)
