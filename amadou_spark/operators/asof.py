"""As-of join: for each left row, the most recent right row with
right_ts <= left_ts (backward direction), per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). Two implementations:

1. :func:`asof_join` — pure DataFrame composition (the scale path):
   tag + union both sides, one window `last(right_payload, ignorenulls)`
   over (key, ts) ordering, filter back to left rows. ONE shuffle on
   the key — same cost shape as a co-partitioned join; no range
   explosion, no per-row subqueries. This is the plan a 100 TB as-of
   join wants: both sides hash-partitioned by key once, sorted within
   partition, single pass.

2. :func:`asof_join_pandas` — `pd.merge_asof` per key group via
   applyInPandas (Arrow). Simpler semantics carrier, Python-speed;
   kept as the reference implementation and for API parity with
   pandas-first users. Tests assert both produce identical results.

Tie semantics: right rows sort BEFORE left rows at equal ts, so a
right row with right_ts == left_ts matches (inclusive, like DuckDB
ASOF `>=` and pandas merge_asof default).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns + matched right
    payload columns (null where no right row precedes)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (right_on, right_ts)
    ]
    payload = F.struct(*[F.col(c) for c in [right_ts, *payload_cols]])

    left_cols = left.columns
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType.simpleString()
        ).alias("_r"),
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in left_cols])).schema[0].dataType.simpleString())
        .alias("_l"),
        payload.alias("_r"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = (
        l.unionByName(r)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out = merged.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        F.col(f"_m.{right_ts}").alias(f"matched_{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"matched_{c}") for c in payload_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """pd.merge_asof per key group (applyInPandas reference impl)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (right_on, right_ts)
    ]
    left_cols = left.columns
    out_fields = [f"{c} {left.schema[c].dataType.simpleString()}" for c in left_cols]
    out_fields.append(f"matched_{right_ts} {right.schema[right_ts].dataType.simpleString()}")
    out_fields += [
        f"matched_{c} {right.schema[c].dataType.simpleString()}" for c in payload_cols
    ]
    out_schema = ", ".join(out_fields)

    l_tagged = left.select(F.col(left_on).alias("_k"), "*")
    r_tagged = right.select(F.col(right_on).alias("_k"), "*")

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        rpdf = (
            rpdf[[right_ts, *payload_cols]]
            .rename(columns={right_ts: f"matched_{right_ts}", **{c: f"matched_{c}" for c in payload_cols}})
            .sort_values(f"matched_{right_ts}")
        )
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[*left_cols, f"matched_{right_ts}", *[f"matched_{c}" for c in payload_cols]])
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=f"matched_{right_ts}",
            direction="backward",
        )
        return merged[[*left_cols, f"matched_{right_ts}", *[f"matched_{c}" for c in payload_cols]]]

    return l_tagged.groupBy("_k").cogroup(r_tagged.groupBy("_k")).applyInPandas(
        merge, out_schema
    )
