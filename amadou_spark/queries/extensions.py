"""Extension queries beyond the reference surface: as-of join,
pivot/unpivot — operators a production analytics engine needs that
Spark either lacks natively (as-of) or that deserve explicit coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.asof import asof_join
from amadou_spark.queries import query


@query(
    "q31_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, o.o_orderdate AS matched_o_orderdate
        FROM events e ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    description="as-of join (Spark has no native one): latest order at or "
    "before each event per user, via tag-union + last(ignorenulls) window — "
    "ONE key shuffle, no range explosion; oracle = DuckDB native ASOF JOIN. "
    "Output exposes only the matched timestamp, which is deterministic under "
    "ties (engines may pick different rows among equal timestamps)",
)
def q31_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    joined = asof_join(
        t["events"].select("event_id", "user_id", "ts"),
        t["orders"],
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=[],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("matched_o_orderdate").cast("timestamp").alias("matched_o_orderdate"),
    ).orderBy("event_id")


_PIVOT_STATUSES = ["O", "F", "P"]


@query(
    "q32_pivot",
    oracle="""
        SELECT prio AS o_orderpriority,
               ROUND("O", 2) AS total_O, ROUND("F", 2) AS total_F, ROUND("P", 2) AS total_P
        FROM (
            SELECT o_orderpriority AS prio, o_orderstatus AS s, o_totalprice AS v FROM orders
        ) PIVOT (SUM(v) FOR s IN ('O', 'F', 'P'))
        ORDER BY o_orderpriority
    """,
    description="pivot: order totals by priority × status (explicit value "
    "list — at scale an implicit pivot triggers a distinct-scan first)",
)
def q32_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    pivoted = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.round(F.col(s), 2).alias(f"total_{s}") for s in _PIVOT_STATUSES],
    ).orderBy("o_orderpriority")


@query(
    "q32_unpivot",
    oracle="""
        SELECT n_nationkey, 'nationkey' AS attr, CAST(n_nationkey AS BIGINT) AS val FROM nation
        UNION ALL
        SELECT n_nationkey, 'regionkey' AS attr, CAST(n_regionkey AS BIGINT) AS val FROM nation
        ORDER BY n_nationkey, attr
    """,
    description="unpivot/melt: wide→long reshaping (Spark unpivot; oracle "
    "spelled as UNION ALL for engine portability)",
)
def q32_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    wide = t["nation"].select(
        "n_nationkey",
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        F.col("n_regionkey").cast("bigint").alias("regionkey"),
    )
    return (
        wide.unpivot("n_nationkey", ["nationkey", "regionkey"], "attr", "val")
        .orderBy("n_nationkey", "attr")
    )


# ---------------------------------------------------------------- windows II

@query(
    "q33_range_frame",
    oracle="""
        SELECT o_orderkey,
               count(*) OVER (PARTITION BY o_custkey
                              ORDER BY CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
                              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
                 AS n_trailing_30d
        FROM orders ORDER BY o_orderkey
    """,
    description="RANGE window frame: trailing-30-day order count per customer "
    "(frame over epoch seconds — value-based, not row-based)",
)
def q33_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, 0)
    )
    return (
        t["orders"]
        .select("o_orderkey", F.count("*").over(w).alias("n_trailing_30d"))
        .orderBy("o_orderkey")
    )


@query(
    "q33_distribution_windows",
    oracle="""
        SELECT o_orderkey,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cdist,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey
    """,
    description="distribution window functions: percent_rank / cume_dist / "
    "ntile over a total per-customer ordering",
)
def q33_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q34_stat_aggregates",
    oracle="""
        SELECT l_returnflag,
               ROUND(stddev_samp(l_extendedprice), 2) AS std_price,
               ROUND(var_samp(l_extendedprice), 2) AS var_price,
               ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
               ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="statistical aggregates: stddev/variance/corr/covar (sample "
    "forms; both engines use numerically-stable single-pass formulations)",
)
def q34_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_pq"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- functions II

@query(
    "q24b_string_functions2",
    oracle="""
        SELECT p_partkey,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
               rpad(p_brand, 12, '.') AS brand_pad,
               reverse(p_name) AS rev_name,
               repeat(p_brand, 2) AS brand2,
               split_part(p_name, ' ', 2) AS second_word,
               CAST(instr(p_name, 'a') AS INT) AS a_pos,
               translate(p_type, 'AEO', 'aeo') AS translated,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS re_word2,
               starts_with(p_type, 'ECO') AS is_eco,
               contains(p_name, 'ring') AS has_ring
        FROM part ORDER BY p_partkey
    """,
    description="string functions II: pad/reverse/repeat/split_part/instr/"
    "translate/regexp group extraction/prefix/contains",
)
def q24b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["part"]
        .select(
            "p_partkey",
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
            F.rpad("p_brand", 12, ".").alias("brand_pad"),
            F.reverse("p_name").alias("rev_name"),
            F.repeat("p_brand", 2).alias("brand2"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
            F.instr("p_name", "a").cast("int").alias("a_pos"),
            F.translate("p_type", "AEO", "aeo").alias("translated"),
            F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("re_word2"),
            F.startswith("p_type", F.lit("ECO")).alias("is_eco"),
            F.contains("p_name", F.lit("ring")).alias("has_ring"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q26b_date_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
                 AS days_to_y2k,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        FROM orders ORDER BY o_orderkey
    """,
    description="date arithmetic: date_add/add_months/last_day/datediff/"
    "dayofweek [R: DuckDB dow is 0-based Sunday, Spark 1-based — normalized]",
)
def q26b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    odate = F.col("o_orderdate").cast("date")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.date_add(odate, 30).alias("plus_30d"),
            F.add_months(odate, 3).alias("plus_3m"),
            F.last_day(odate).alias("month_end"),
            F.datediff(F.lit("2000-01-01").cast("date"), odate).cast("int").alias(
                "days_to_y2k"
            ),
            F.dayofweek(odate).cast("int").alias("dow"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q34b_median_value_windows",
    oracle="""
        SELECT o_orderstatus,
               ROUND(median(o_totalprice), 2) AS med_price,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    description="exact median aggregate (interpolated) + min/max",
)
def q34b_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.median("o_totalprice"), 2).alias("med_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q33b_value_windows",
    oracle="""
        SELECT o_orderkey,
               ROUND(first_value(o_totalprice) OVER w, 2) AS cheapest,
               ROUND(last_value(o_totalprice) OVER w, 2) AS priciest,
               ROUND(nth_value(o_totalprice, 2) OVER w, 2) AS second_cheapest
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey
    """,
    description="value window functions: first/last/nth over an unbounded frame",
)
def q33b_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
            F.round(F.last("o_totalprice").over(w), 2).alias("priciest"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_cheapest"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q19b_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20
    """,
    description="pagination: LIMIT + OFFSET over a total order (rows 21-30 "
    "by price) — OFFSET still requires ordering the first offset+limit rows, "
    "so deep pagination at scale should become keyset pagination (WHERE "
    "price < last_seen)",
)
def q19b_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(20)
        .limit(10)
    )


@query(
    "q33c_bounded_rows_frame",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(AVG(l_quantity) OVER w, 4) AS mov_avg,
               ROUND(SUM(l_quantity) OVER w, 2) AS mov_sum,
               count(*) OVER w AS frame_n
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey,
                     l_linenumber, l_quantity, l_extendedprice
                     ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)
        ORDER BY l_orderkey, l_linenumber
    """,
    description="bounded ROWS frame (3 preceding .. 1 following): moving "
    "sum/average with explicit frame edges. Aggregates an INTEGRAL-valued "
    "double (l_quantity) — frame sums are then exact, so the result is "
    "independent of the engines' differing frame-aggregation association "
    "(Spark per-row recompute vs DuckDB segment tree). The window order "
    "tie-breaks through the aggregated VALUES too: sf0.1 contains duplicate "
    "(orderkey, linenumber) rows, and rows that remain tied after value "
    "tie-breaks are interchangeable without changing any frame sum",
)
def q33c_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .rowsBetween(-3, 1)
    )
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.avg("l_quantity").over(w), 4).alias("mov_avg"),
            F.round(F.sum("l_quantity").over(w), 2).alias("mov_sum"),
            F.count("*").over(w).alias("frame_n"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q35_exists_filtered",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_quantity > 45
              AND l_returnflag = 'R'
        )
        ORDER BY o_orderkey
    """,
    description="correlated EXISTS with extra predicates: Catalyst pushes the "
    "filters below the left-semi join, so only qualifying lineitems shuffle",
)
def q35_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_quantity > 45
              AND l_returnflag = 'R'
        )
        ORDER BY o_orderkey
        """
    )


@query(
    "q36_profile_nulls",
    oracle="""
        SELECT 'text' AS "column", count(*) AS n_rows,
               CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               ROUND(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS null_rate
        FROM documents
        UNION ALL
        SELECT 'lang', count(*),
               CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               ROUND(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
        FROM documents
        UNION ALL
        SELECT 'source', count(*),
               CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               ROUND(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
        FROM documents
        ORDER BY "column"
    """,
    description="data profiling: per-column null statistics in ONE scan "
    "(single aggregate row exploded to tidy form — never N scans for N "
    "columns); the full operator (operators/profile.py) adds approx-distinct",
)
def q36_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.operators.profile import profile_columns

    t = register_tables(spark, sf_dir)
    return (
        profile_columns(t["documents"], ["text", "lang", "source"])
        .select("column", "n_rows", "n_nulls", "null_rate")
        .orderBy("column")
    )


@query(
    "q37_tpch_q6",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: pure scan-filter-aggregate (no join, no "
    "group) — all four predicates push into the parquet scan, the aggregate "
    "reduces map-side to a single row per partition",
)
def q37_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q38_not_in_subquery",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    description="NOT IN subquery: plans as null-aware anti join (distinct from "
    "NOT EXISTS — a NULL in the subquery would empty the result; o_custkey is "
    "non-null here so both engines agree)",
)
def q38_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey
        """
    )


@query(
    "q39b_incremental_rollup",
    oracle="""
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
               event_type,
               count(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(SUM(value) / count(*), 6) AS avg_value
        FROM events
        GROUP BY date_trunc('month', ts), event_type
        ORDER BY month, event_type
    """,
    description="incremental rollup (continuous-aggregate maintenance): "
    "monthly figures are computed by MERGING daily partial aggregates — "
    "sum-of-sums and sum-of-counts, with avg recomposed as sum/count at read "
    "time (avg itself is not mergeable; its decomposition is). At 100 TB "
    "this is the pattern that never re-scans raw data: each day appends one "
    "partial row per group, and any coarser window is an aggregate of "
    "partials, ~1e4× smaller than the fact. The oracle aggregates the raw "
    "table directly, proving the two-level merge is exact.",
)
def q39b_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(
            F.date_trunc("day", "ts").alias("_day"),
            "event_type",
        )
        .agg(F.count("*").alias("_n"), F.sum("value").alias("_sum"))
    )
    return (
        daily.groupBy(
            F.date_trunc("month", "_day").cast("date").alias("month"),
            "event_type",
        )
        .agg(F.sum("_n").alias("n_events"), F.sum("_sum").alias("_total"))
        .select(
            "month",
            "event_type",
            "n_events",
            F.round("_total", 2).alias("sum_value"),
            F.round(F.col("_total") / F.col("n_events"), 6).alias("avg_value"),
        )
        .orderBy("month", "event_type")
    )


@query(
    "q15b_cube",
    oracle="""
        SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               l_returnflag, l_linestatus,
               count(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    description="CUBE grouping sets (all four combinations incl. both "
    "marginals — completes the ROLLUP coverage of q15): Spark expands the "
    "cube map-side into one Expand node feeding a single hash aggregate, so "
    "the 4x row inflation never hits the shuffle un-aggregated",
)
def q15b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            "g_flag", "g_status", "l_returnflag", "l_linestatus", "n_rows", "sum_qty"
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "q15c_grouping_sets",
    oracle="""
        SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               l_returnflag, l_linestatus,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    description="explicit GROUPING SETS (an arbitrary subset of the cube "
    "lattice — the general form ROLLUP/CUBE are sugar for), via spark.sql "
    "over the registered views; same single-Expand physical plan as q15b",
)
def q15c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               l_returnflag, l_linestatus,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
        """
    )


@query(
    "q57_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, MIN(ts) AS c_ts
            FROM events e JOIN v USING (user_id)
            WHERE event_type = 'click'
              AND ts > v_ts AND ts <= v_ts + INTERVAL 24 HOUR
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, MIN(ts) AS p_ts
            FROM events e JOIN c USING (user_id)
            WHERE event_type = 'purchase'
              AND ts > c_ts AND ts <= c_ts + INTERVAL 24 HOUR
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase
    """,
    description="conversion funnel (view → click-within-24h → "
    "purchase-within-24h): each stage is a user-keyed MIN aggregate joined "
    "to the previous stage — every shuffle is on user_id so all three "
    "stages co-partition after the first exchange; the stage tables shrink "
    "monotonically, and the final counts are single-row aggregates",
)
def q57_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.scale import materialize_shared

    t = register_tables(spark, sf_dir)
    ev = t["events"]
    day = F.expr("INTERVAL 24 HOURS")
    # checkpoint each funnel stage that feeds BOTH the next stage's
    # join and its own census count: column pruning specializes the
    # copies, so exchange reuse can't dedup them and raw events were
    # re-aggregated per consumer (11 events scans in the r7 dup audit
    # — the stage chain compounds: re-running c re-runs v again)
    v = materialize_shared(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = materialize_shared(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("c_ts")) & (F.col("ts") <= F.col("c_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )


@query(
    "q58_cohort_retention",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
            FROM events
        )
        SELECT cohort_week, active_week, count(*) AS n_users
        FROM activity JOIN first_seen USING (user_id)
        GROUP BY cohort_week, active_week
        ORDER BY cohort_week, active_week
    """,
    description="cohort retention matrix (cohort = ISO week of first event; "
    "one row per cohort-week × active-week with surviving-user counts): "
    "first-seen and distinct-activity are both user-keyed aggregates that "
    "share one exchange; the retention join is user-keyed (co-partitioned) "
    "and the matrix aggregate is tiny by construction",
)
def q58_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    ev = t["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "active_week")
    )


@query(
    "q59_resample_gapfill",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   ROUND(SUM(value), 2) AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), bounds AS (
            SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
            FROM hourly GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ), joined AS (
            SELECT g.user_id, g.hour, h.v,
                   (h.v IS NOT NULL) AS is_observed
            FROM grid g LEFT JOIN hourly h
              ON g.user_id = h.user_id AND g.hour = h.hour
        ), filled AS (
            SELECT user_id, hour, is_observed,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
            FROM joined
        )
        SELECT user_id, hour, v_filled, is_observed
        FROM filled
        WHERE hour >= TIMESTAMP '2024-01-10 00:00:00'
          AND hour <  TIMESTAMP '2024-01-17 00:00:00'
        ORDER BY user_id, hour
    """,
    description="time-series resampling with gap fill: per-user hourly grid "
    "(sequence + explode, map-side fan-out) left-joined to observed hourly "
    "sums, gaps forward-filled with last(ignorenulls) — the grid join and "
    "the fill window share ONE user_id exchange; the fill is computed over "
    "each user's full history, then a fixed week is emitted so output "
    "volume stays bounded at any SF",
)
def q59_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = register_tables(spark, sf_dir)
    hourly = (
        t["events"]
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id", "hour", "v", F.col("v").isNotNull().alias("is_observed")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .filter(
            (F.col("hour") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("hour") < F.lit("2024-01-17 00:00:00").cast("timestamp"))
        )
        .select("user_id", "hour", "v_filled", "is_observed")
        .orderBy("user_id", "hour")
    )


@query(
    "q63_kl_drift",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ), day_tot AS (
            SELECT day, sum(n) AS dn FROM daily GROUP BY day
        ), gfreq AS (
            SELECT event_type, count(*) AS gn FROM events GROUP BY event_type
        ), gtot AS (SELECT sum(gn) AS g FROM gfreq)
        SELECT day,
               ROUND(SUM((n / dn) * LN((n / dn) / (gn / g))), 6) AS kl
        FROM daily JOIN day_tot USING (day)
                   JOIN gfreq USING (event_type)
                   CROSS JOIN gtot
        GROUP BY day
        ORDER BY day
    """,
    description="distribution-drift monitor: KL(P_day || P_global) of the "
    "event-type mix per day — the data-quality alarm a production feed "
    "runs continuously. Two tiny aggregates (day x type, type) off one "
    "scan lineage; the global distribution broadcasts into the per-day "
    "sum. Zero-count day/type cells drop out of the sum (0*ln0 = 0 by "
    "convention, and absent pairs simply produce no row)",
)
def q63_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.scale import materialize_shared

    t = register_tables(spark, sf_dir)
    ev = t["events"].select(F.col("ts").cast("date").alias("day"), "event_type")
    # checkpoint the (day, type) rollup — its THREE consumers (day
    # totals, the per-day join, and the global distribution, which is
    # an exact regroup of it: SUM(n) per type == count over raw events)
    # would otherwise each re-aggregate raw events, since column
    # pruning forks the copies and exchange reuse can't dedup them
    # (8 events scans in the r7 dup audit). ONE raw scan total.
    daily = materialize_shared(
        ev.groupBy("day", "event_type").agg(F.count("*").alias("n"))
    )
    day_tot = daily.groupBy("day").agg(F.sum("n").alias("dn"))
    glob = daily.groupBy("event_type").agg(F.sum("n").alias("gn"))
    gtot = glob.agg(F.sum("gn").alias("g"))
    p = F.col("n") / F.col("dn")
    q = F.col("gn") / F.col("g")
    return (
        daily.join(day_tot, "day")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(gtot))
        .groupBy("day")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl"))
        .orderBy("day")
    )


@query(
    "q64_histogram",
    oracle="""
        WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                   FROM orders)
        SELECT LEAST(19, CAST(FLOOR((o_totalprice - lo) * 20 / (hi - lo)) AS INT))
                   AS bin,
               count(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS bin_min,
               ROUND(MAX(o_totalprice), 2) AS bin_max
        FROM orders CROSS JOIN b
        GROUP BY 1 ORDER BY bin
    """,
    description="equal-width histogram (20 bins over [min, max]) of order "
    "totals: bounds from one broadcast min/max aggregate, bin assignment "
    "as a pure projection, ONE 20-group aggregate — the profiling "
    "primitive behind range-partition planning and skew diagnosis",
)
def q64_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    o = t["orders"]
    b = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    binned = o.select("o_totalprice").crossJoin(F.broadcast(b)).select(
        "o_totalprice",
        F.least(
            F.lit(19),
            F.floor(
                (F.col("o_totalprice") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo"))
            ).cast("int"),
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )
