"""Streaming sinks beyond the built-ins: foreachBatch bridges a stream
to any BATCH writer — here, an idempotent keyed upsert into a parquet
"table" directory, the pattern for maintaining a serving table from a
CDC/event stream without a lakehouse format on the classpath.

Why foreachBatch: Structured Streaming's file sink is append-only;
upserts need a read-modify-write per micro-batch. foreachBatch hands
each micro-batch to arbitrary DataFrame code with an epoch id, and the
engine guarantees at-least-once invocation — so the batch function
must be IDEMPOTENT per epoch. The upsert below is: applying the same
(key, value) batch twice converges to the same table.

Scale notes: the rewrite cost is O(current table) per batch — correct
for dimension/serving tables (what upserts are for), wrong for fact
streams (use append + compaction instead). With Delta/Iceberg on the
classpath the same function body becomes MERGE INTO and the rewrite
goes away; the seam is deliberately the batch function, nothing else.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_batch(spark: SparkSession, path: str, keys: list[str]) -> Callable:
    """Return a foreachBatch function that merges each micro-batch into
    the parquet dir at ``path``: last-writer-wins per key, with the
    batch deduplicated on the keys first (one micro-batch can carry
    several versions of a key; the max-ts row wins, ties by max over
    the remaining columns for determinism)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        # per-batch dedup: keep one row per key (latest by all non-key
        # columns' struct order — deterministic regardless of partition
        # layout)
        others = [c for c in batch.columns if c not in keys]
        latest = (
            batch.groupBy(*keys)
            .agg(F.max(F.struct(*others)).alias("_v"))
            .select(*keys, "_v.*")
        )
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            current = spark.read.parquet(path)
            kept = current.join(latest.select(*keys), keys, "left_anti")
            merged = kept.unionByName(latest)
        else:
            merged = latest
        # write to a staging dir then swap: the source dir is being read
        # in this very job, so an in-place overwrite would race the scan
        staging = f"{path}.__staging__"
        merged.write.mode("overwrite").parquet(staging)
        final = spark.read.parquet(staging)
        final.write.mode("overwrite").parquet(path)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    return apply


def run_stream_upsert(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
) -> None:
    """Drive a (finite) stream through the upsert sink to completion —
    availableNow processes all pending input in micro-batches, then
    stops; restarting later resumes from the checkpoint (exactly the
    incremental-refresh deployment shape)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.foreachBatch(upsert_batch(spark, path, keys))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
