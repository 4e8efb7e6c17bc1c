"""SCD2 (slowly-changing-dimension type 2) merge, emulated without a
table format (no Delta/Iceberg in the image — and the emulation is the
portable shape anyway):

    merged = unchanged current rows
           ∪ closed-out rows (current versions of changed keys,
             valid_to stamped)
           ∪ new versions (incoming rows, valid_from stamped, open)

Every branch is an equi-join/anti-join on the business key — one
shuffle key throughout, no row-by-row merge. With Delta/Iceberg on the
classpath the same logic becomes a single MERGE INTO; the seam is this
function's signature."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply `updates` (one row per key) to an SCD2 `current` table with
    columns [key, *tracked_cols, valid_from, valid_to, is_current]."""
    upd = updates.select(key, *tracked_cols)

    open_rows = current.filter(F.col("is_current"))
    closed_rows = current.filter(~F.col("is_current"))

    # explicit marker distinguishes "no update row" from "update with
    # NULLs" — a NULL-vs-value comparison must not count as a change
    # when the key simply received no update
    upd_marked = upd.withColumn("_has_upd", F.lit(True))
    change_cond = F.lit(False)
    for c in tracked_cols:
        change_cond = change_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    change_cond = F.coalesce(F.col("upd._has_upd"), F.lit(False)) & change_cond

    joined = open_rows.alias("cur").join(upd_marked.alias("upd"), key, "left")
    unchanged = joined.filter(~change_cond).select("cur.*")
    changed_keys = joined.filter(change_cond).select(F.col(key).alias("_k")).distinct()

    closed_out = (
        open_rows.join(changed_keys, open_rows[key] == F.col("_k"), "left_semi")
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    brand_new = upd.join(open_rows, key, "left_anti")
    new_versions = (
        upd.join(changed_keys, upd[key] == F.col("_k"), "left_semi")
        .unionByName(brand_new)
        .withColumn("valid_from", F.lit(effective_date).cast("date"))
        .withColumn("valid_to", F.lit(OPEN_END).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    return closed_rows.unionByName(unchanged).unionByName(closed_out).unionByName(
        new_versions
    )
