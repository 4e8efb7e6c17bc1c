"""Small-file compaction — the table-maintenance operator every
long-running ingestion pipeline needs: streaming sinks and per-date
backfills accrete thousands of KB-sized parquet files, and at 100 TB
the resulting footer/open overhead dominates scan time (a 128 MB target
file costs one open; the same bytes as 1,000 files cost 1,000).

Inventory → plan → rewrite, all through public Spark surfaces:

- inventory via the built-in ``binaryFile`` source (path + length only —
  its ``content`` column is pruned, so no file bytes move), which works
  on any Hadoop filesystem, not just local disk;
- the plan is pure arithmetic: ceil(total_bytes / target_bytes) output
  files;
- the rewrite uses ``coalesce`` (narrow, no shuffle) when shrinking the
  file count — records are concatenated, never re-hashed. Pass
  ``shuffle=True`` to get ``repartition`` instead when output balance
  matters more than avoiding the exchange (e.g. the input files are
  themselves skewed).

The rewrite targets a NEW directory and never deletes the source —
swap-on-success is the caller's transaction (same contract as the
reference's date-partition overwrite, ``io.write_date_partition``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    avg_bytes: float
    target_files: int

    @property
    def worthwhile(self) -> bool:
        """Compacting 3 files into 2 churns data for nothing; require
        at least a 2x reduction before recommending a rewrite."""
        return self.n_files >= 2 * self.target_files


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    glob: str = "*.parquet",
) -> CompactionPlan:
    """Inventory ``path`` and size the compacted layout.

    The listing runs through the ``binaryFile`` source so it scales to
    object stores; only (path, length) columns are read — binaryFile
    prunes ``content`` unless selected, so no data bytes are fetched.
    """
    stats = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("length"), F.lit(0)).alias("total"),
        )
        .first()
    )
    n, total = int(stats["n"]), int(stats["total"])
    target = max(1, math.ceil(total / target_bytes))
    return CompactionPlan(n, total, total / n if n else 0.0, target)


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> CompactionPlan:
    """Rewrite the parquet files under ``src`` into ``dest`` at
    ~``target_bytes`` per file; returns the plan that was applied.

    ``coalesce`` keeps the rewrite shuffle-free (each output task
    concatenates whole input splits); ``shuffle=True`` switches to
    ``repartition`` for balanced outputs at the cost of an exchange.
    """
    plan = plan_compaction(spark, src, target_bytes)
    df = spark.read.parquet(src)
    sized = df.repartition(plan.target_files) if shuffle else df.coalesce(
        plan.target_files
    )
    sized.write.mode("overwrite").parquet(dest)
    return plan
