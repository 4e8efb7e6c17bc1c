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


def upsert_batch(
    spark: SparkSession,
    path: str,
    keys: list[str],
    version_cols: list[str] | None = None,
) -> Callable:
    """Return a foreachBatch function that merges each micro-batch into
    the parquet dir at ``path``.

    ``version_cols=None`` (default): last-writer-wins per key — a key
    in a later micro-batch replaces the stored row, with the batch
    deduplicated on the keys first (max over the non-key struct for
    determinism). Correct when the stream is in event order.

    ``version_cols=[...]``: versioned upsert — the stored row only
    loses to an incoming row with a HIGHER version (lexicographic over
    the version columns). The final table is then the global latest
    row per key REGARDLESS of how the source was split into
    micro-batches or whether batches arrive out of order — the safe
    semantics for real CDC feeds, and deterministic enough to
    oracle-check (see b07_stream_upsert)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        # per-batch dedup: keep one row per key (latest by version
        # columns first, then the remaining non-key columns' struct
        # order — deterministic regardless of partition layout)
        others = [c for c in batch.columns if c not in keys]
        vcols = list(version_cols or [])
        rest = [c for c in others if c not in vcols]

        def latest_of(df: DataFrame) -> DataFrame:
            return (
                df.groupBy(*keys)
                .agg(F.max(F.struct(*vcols, *rest)).alias("_v"))
                .select(*keys, "_v.*")
            )

        latest = latest_of(batch)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            current = spark.read.parquet(path)
            if version_cols:
                # versioned merge: existing and incoming compete on the
                # version struct — one key-only shuffle over the union
                merged = latest_of(
                    current.select(latest.columns).unionByName(latest)
                )
            else:
                kept = current.join(latest.select(*keys), keys, "left_anti")
                merged = kept.unionByName(latest)
        else:
            merged = latest
        # write to a staging dir then swap: the source dir is being read
        # in this very job, so an in-place overwrite would race the scan.
        # r10: the swap is a DIRECTORY RENAME, not a second Spark
        # write — the old read-staging-and-rewrite swap recomputed and
        # rewrote the whole table a second time per micro-batch
        # (2x the O(table) rewrite cost this sink already pays). By the
        # time merged.write returns, the scan of `current` has fully
        # materialized, so dropping `path` and renaming staging over it
        # has the same (non-atomic-window) semantics the overwrite had.
        staging = f"{path}.__staging__"
        merged.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.replace(staging, path)

    return apply


def run_stream_upsert(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    version_cols: list[str] | None = None,
) -> None:
    """Drive a (finite) stream through the upsert sink to completion —
    availableNow processes all pending input in micro-batches, then
    stops; restarting later resumes from the checkpoint (exactly the
    incremental-refresh deployment shape)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.foreachBatch(
            upsert_batch(spark, path, keys, version_cols)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
