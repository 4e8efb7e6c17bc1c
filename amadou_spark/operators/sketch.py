"""Mergeable frequency/cardinality sketches as DataFrame ops.

Two sketches a 100 TB pipeline leans on daily:

- **Count-min** (`cms_counters` / `cms_estimate` / `cms_merge`): a
  (depth × width) counter grid; every key increments one bucket per
  depth row, an estimate is the MIN over its depth buckets (always an
  overestimate, error ≤ N/width with prob 1-2^-depth). Built here as a
  plain groupBy — the sketch is just a tiny DataFrame, so it shuffles
  O(depth·width) counters instead of O(distinct keys) rows, and two
  sketches MERGE by summing bucket-wise (`cms_merge`), which is what
  makes per-partition / per-day sketches composable without rescanning
  raw data. Hashing is the repo's portable md5 construction, so the
  identical grid is computable in any engine (DuckDB-oracle-checked).

- **HLL** (`hll_daily`, `hll_rolling_estimate`): Spark's built-in
  Apache DataSketches HLL aggregates (`hll_sketch_agg` /
  `hll_union_agg` / `hll_sketch_estimate`). The sketch column is a
  binary value per group; unions are associative, so daily sketches
  roll up to weekly/monthly distinct counts without touching the raw
  events again — the textbook incremental-distinct design. Estimates
  are approximate, hence tolerance-tested (no hash oracle).

Reference parity note: the reference has no sketch surface of its own
(SURVEY §2.3 negative space); these extend the engine for the
training-data-pipeline tier alongside the LLM ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(key: Column, d: Column | int, width: int) -> Column:
    """Portable bucket hash: first 8 md5 hex chars of ``"d:key"`` as a
    32-bit integer, mod width. Identical in Spark and DuckDB:
    ``CAST(('0x' || substring(md5(d || ':' || key), 1, 8)) AS BIGINT)``.
    """
    d_col = F.lit(d) if isinstance(d, int) else d
    payload = F.concat_ws(":", d_col.cast("string"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("bigint") % width
    )


def cms_counters(
    df: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one pass, one shuffle of ≤ depth·width counter
    rows (map-side combine collapses each partition's contribution
    first). Returns (d, bucket, n)."""
    depths = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    return (
        df.select(F.col(key).alias("_k"))
        .select("_k", depths)
        .select("d", _cms_bucket(F.col("_k"), F.col("d"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): bucket-wise
    sum. This is why per-day / per-partition sketches compose."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its depth buckets.
    The sketch side is ≤ depth·width rows — always broadcast."""
    probes = (
        keys.select(F.col(key))
        .distinct()
        .select(key, F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"))
        .select(key, "d", _cms_bucket(F.col(key), F.col("d"), width).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(key)
        .agg(F.min("n").alias("est_count"))
    )


def hll_daily(events: DataFrame, ts_col: str = "ts", key: str = "user_id") -> DataFrame:
    """Per-day HLL sketch of distinct ``key``: (day, sketch binary).
    The 100 TB pattern: persist THESE (bytes per day, not rows), and
    answer any date-range distinct query by unioning them."""
    return (
        events.select(F.to_date(F.col(ts_col)).alias("day"), F.col(key))
        .groupBy("day")
        .agg(F.hll_sketch_agg(key).alias("sketch"))
    )


def hll_rolling_estimate(daily: DataFrame) -> DataFrame:
    """Daily estimates plus the all-days union — both from the sketches
    alone (the raw events are never rescanned)."""
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sketch").alias("approx_users")
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    ).select(F.lit(None).cast("date").alias("day"), "approx_users")
    return per_day.unionByName(total)


def misra_gries_candidates(
    items: DataFrame, col: str, n_counters: int = 200
) -> DataFrame:
    """Per-partition Misra-Gries frequent-item summaries (Misra &
    Gries 1982), merged by union: returns a small candidate table
    guaranteed to CONTAIN every item with global frequency > n/(k+1)
    for k = ``n_counters`` (if an item's count exceeded n_p/(k+1) in
    no partition, summing over partitions bounds its global count by
    n/(k+1)). The summary runs inside ``mapInPandas`` — one pass, k
    counters of state per partition, Arrow-batched — and emits at most
    k rows per partition, so the union is tiny no matter how large the
    input. Pair with an exact recount of the candidates for EXACT
    heavy hitters in two passes; the result is then independent of
    partitioning even though the candidate set is not.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < n_counters:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    schema = items.select(col).schema
    return items.select(col).mapInPandas(summarize, schema).distinct()


def exact_heavy_hitters(
    items: DataFrame, col: str, threshold_frac: float = 0.01,
    n_counters: int = 200,
) -> DataFrame:
    """EXACT heavy hitters (items with frequency > threshold_frac * n)
    in two distributed passes: (1) Misra-Gries candidate generation —
    a superset of the answer whenever threshold_frac >= 1/(k+1) — and
    (2) an exact recount restricted to the candidate set (a broadcast
    semi-join, since candidates number <= k * n_partitions), filtered
    against the exact global total. Never shuffles full per-item
    counts: the only wide exchange carries candidate rows. This is the
    100 TB shape for "frequent tokens/URLs/users" — the naive
    groupBy-all-then-filter shuffles every distinct item; this
    shuffles a few thousand.
    """
    if threshold_frac < 1.0 / (n_counters + 1):
        raise ValueError(
            f"threshold_frac {threshold_frac} below the Misra-Gries "
            f"guarantee 1/(k+1) = {1.0 / (n_counters + 1):.5f}; "
            "raise n_counters"
        )
    cand = misra_gries_candidates(items, col, n_counters)
    total = items.select(F.count("*").alias("n_total"))
    counts = (
        items.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_total") * threshold_frac)
        .select(col, "cnt", "n_total")
    )
