"""Sketch-backed analytics queries: mergeable count-min frequency
estimation (hash-exact oracle — the grid construction is deterministic)
and HLL incremental distinct counts (approximate, tolerance-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
    hll_daily,
    hll_rolling_estimate,
)
from amadou_spark.queries import query


def _cms_oracle(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    ds = ", ".join(f"({i})" for i in range(depth))
    return f"""
        WITH ds(d) AS (VALUES {ds}),
        counters AS (
            SELECT d,
                   CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':'
                            || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % {width} AS bucket,
                   count(*) AS n
            FROM events CROSS JOIN ds
            GROUP BY 1, 2
        ),
        cand AS (SELECT DISTINCT user_id FROM events WHERE user_id < 40),
        probes AS (
            SELECT user_id, d,
                   CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':'
                            || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % {width} AS bucket
            FROM cand CROSS JOIN ds
        )
        SELECT user_id, MIN(n) AS est_count
        FROM probes JOIN counters USING (d, bucket)
        GROUP BY user_id
        ORDER BY user_id
    """


@query(
    "q60_cms_frequency",
    oracle=_cms_oracle(),
    description="count-min sketch frequency estimation, built as plain "
    "DataFrame ops: events stream -> (depth x width) counter grid (ONE "
    "shuffle of <= 4096 counter rows, map-side combined), then point "
    "estimates for a candidate key set as min-over-depths with the "
    "counter grid broadcast. Deterministic portable-md5 bucketing makes "
    "the whole sketch hash-exact against the DuckDB oracle; sketches "
    "from different days/partitions merge by bucket-wise sum "
    "(operators.sketch.cms_merge), so 100 TB pipelines keep per-day "
    "sketches and never rescan raw history",
)
def q60_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    counters = cms_counters(t["events"], "user_id")
    cand = t["events"].filter(F.col("user_id") < 40)
    return cms_estimate(counters, cand, "user_id").orderBy("user_id")


@query(
    "q61_hll_mergeable",
    oracle="""
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS within_tol
        FROM events GROUP BY 1
        UNION ALL
        SELECT NULL, COUNT(DISTINCT user_id), TRUE FROM events
        ORDER BY day NULLS LAST
    """,
    description="incremental distinct users via mergeable HLL sketches "
    "(Apache DataSketches builtins): per-day hll_sketch_agg(user_id) "
    "then hll_union_agg across days for the all-time figure — the "
    "per-day sketches are a few KB each and union associatively, so a "
    "date-range distinct count at 100 TB reads sketches, not events. "
    "Output: one row per day plus a NULL-day total row. Hash-checkable "
    "(r4): returns the EXACT distinct count plus a Spark-side boolean "
    "asserting the HLL estimate sits within 5% of it, so the driver's "
    "hash gate covers sketch quality (was rows-only)",
)
def q61_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    est = hll_rolling_estimate(hll_daily(t["events"]))
    per_day = (
        t["events"]
        .select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    total = t["events"].agg(
        F.count_distinct("user_id").alias("exact_users")
    ).select(F.lit(None).cast("date").alias("day"), "exact_users")
    exact = per_day.unionByName(total)
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= F.lit(0.05)
    return (
        est.join(exact, est["day"].eqNullSafe(exact["day"]))
        .select(est["day"], "exact_users", within.alias("within_tol"))
        .orderBy(F.col("day").asc_nulls_last())
    )


@query(
    "q101_kmv_distinct",
    oracle="""
        WITH h AS (
            SELECT DISTINCT l_returnflag AS flag,
                   CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS hv
            FROM lineitem
        ), r AS (
            SELECT flag, hv,
                   row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn
            FROM h
        ), kth AS (
            SELECT flag, hv AS hk FROM r WHERE rn = 64
        ), mr AS (
            SELECT hv, row_number() OVER (ORDER BY hv) AS rn
            FROM (SELECT DISTINCT hv FROM h)
        ), mk AS (
            SELECT hv AS hk FROM mr WHERE rn = 64
        ), exact AS (
            SELECT l_returnflag AS flag,
                   COUNT(DISTINCT l_partkey) AS exact_nd
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT exact.flag, exact.exact_nd,
               CAST(ROUND(63 / (kth.hk / POWER(16.0, 15)), 0) AS BIGINT)
                   AS kmv_estimate,
               CAST(ROUND(63 / ((SELECT hk FROM mk) / POWER(16.0, 15)), 0)
                    AS BIGINT) AS merged_estimate
        FROM exact JOIN kth USING (flag)
        ORDER BY flag
    """,
    description="KMV (k-minimum-values) distinct sketch, k=64 "
    "(Bar-Yossef et al. 2002): per-group estimate = (k-1)/u_(k) over "
    "the k smallest md5-derived hash fractions, plus the MERGED "
    "estimate — the union of the per-group sketches re-screened to its "
    "k minima — demonstrating the mergeability that makes KMV "
    "partition-parallel at 100 TB (each partition keeps k hashes; "
    "merge = k-smallest of the union; never a global distinct). The "
    "hash is md5-derived so both engines build the SAME sketch and the "
    "estimate is hash-checkable bitwise, unlike engine-specific HLL "
    "registers (q61's tolerance gate). Exact counts ride along for "
    "error inspection",
    tags=("sketch", "approx"),
)
def q101_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    li = t["lineitem"]
    k = 64
    hv = F.conv(
        F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    from amadou_spark.scale import materialize_shared

    h = (
        li.select(F.col("l_returnflag").alias("flag"), hv.alias("hv"))
        .distinct()
    )
    scale = F.lit(16.0) ** 15
    # per-flag k-minima = the SKETCHES themselves (<= |flags| x k rows,
    # checkpointed — two consumers). h now has exactly ONE consumer, so
    # the fact-grain distinct executes once (r7: the old code
    # re-distincted lineitem a second time to build the merged sketch,
    # contradicting the mergeability story this query demonstrates).
    sketches = materialize_shared(
        h.select(
            "flag",
            "hv",
            F.row_number().over(W.partitionBy("flag").orderBy("hv")).alias("rn"),
        ).filter(F.col("rn") <= k)
    )
    kth = sketches.filter(F.col("rn") == k)
    # merged sketch: KMV mergeability — the k smallest of the UNION of
    # the per-flag sketches equals the k smallest of the full distinct
    # union (any hash among the global k minima is within its own
    # flag's k minima), so the merge reads <= |flags| x k rows, never
    # the fact table; its max is u_(k)
    merged_kth = (
        sketches.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("mhv"))
    )
    exact = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.countDistinct("l_partkey").alias("exact_nd")
    )
    return (
        exact.join(kth, "flag")
        .crossJoin(F.broadcast(merged_kth))
        .select(
            "flag",
            "exact_nd",
            F.round((k - 1) / (F.col("hv") / scale), 0)
            .cast("bigint")
            .alias("kmv_estimate"),
            F.round((k - 1) / (F.col("mhv") / scale), 0)
            .cast("bigint")
            .alias("merged_estimate"),
        )
        .orderBy("flag")
    )


@query(
    "q115_heavy_hitters",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ), tk AS (SELECT t FROM tok WHERE t <> ''),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tk)
        SELECT t, CAST(count(*) AS BIGINT) AS cnt,
               (SELECT n_total FROM n) AS n_total
        FROM tk
        GROUP BY t
        HAVING count(*) > (SELECT n_total FROM n) * 0.01
        ORDER BY t
    """,
    description="EXACT heavy hitters (tokens above 1% corpus "
    "frequency) via two-pass Misra-Gries (operators/sketch.py): "
    "pass 1 runs a k=200-counter MG summary per partition inside "
    "mapInPandas (Arrow-batched, k rows out per partition — a "
    "guaranteed superset of the answer since 1% > 1/(k+1)), pass 2 "
    "recounts ONLY the candidates behind a broadcast semi-join and "
    "filters against the exact total. The result is exact and "
    "partitioning-independent even though the candidate set is not. "
    "The naive groupBy shuffles every distinct token; this shuffles "
    "a few thousand candidate rows — the 100 TB frequent-items shape",
    tags=("sketch", "text"),
)
def q115_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.catalog import register_tables
    from amadou_spark.operators.sketch import exact_heavy_hitters

    t = register_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    return exact_heavy_hitters(toks, "t", threshold_frac=0.01).orderBy("t")
