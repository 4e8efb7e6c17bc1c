"""SQL-surface extensions: multiset set ops, union-by-name, null-safe
joins, ordered-set aggregates (listagg / mode / percentile_cont),
try_* error-safe arithmetic, stack(), regexp_extract_all, map
higher-order functions, DISTINCT ON, inline VALUES, width_bucket
histograms, date-spine densification, FILTER-clause aggregates, and
boolean/bitwise aggregates.

Every query here is a thin declarative plan — single scan where
possible, aggregated outputs so the oracle compare stays small — and
each has a DuckDB oracle. At 100 TB these all reduce to one
shuffle-by-group-key (or zero, for the scan-shaped ones); none carry
wide rows through a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.queries import query


@query(
    "q74_intersect_all",
    oracle="""
        SELECT l_suppkey, COUNT(*) AS n
        FROM (
            SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
            INTERSECT ALL
            SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        ) t
        GROUP BY l_suppkey
        ORDER BY l_suppkey
    """,
    description="multiset INTERSECT ALL (preserves multiplicity = min of "
    "the two sides' counts) via DataFrame intersectAll; Spark plans it as "
    "a single hash aggregate per side + join on (value, count), no "
    "row-level materialization of the multiset",
)
def q74_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    li = t["lineitem"]
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return (
        a.intersectAll(r)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_suppkey")
    )


@query(
    "q74b_except_all",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT ALL
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ) t
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    description="multiset EXCEPT ALL (count subtraction, floor 0) via "
    "DataFrame exceptAll",
)
def q74b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    o = t["orders"]
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        open_.exceptAll(filled)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_custkey")
    )


@query(
    "q75_union_by_name",
    oracle="""
        SELECT kind, party_key, nation, ROUND(SUM(balance), 2) AS total_balance
        FROM (
            SELECT 'customer' AS kind, c_custkey AS party_key,
                   c_nationkey AS nation, c_acctbal AS balance
            FROM customer
            UNION ALL BY NAME
            SELECT s_nationkey AS nation, 'supplier' AS kind,
                   s_suppkey AS party_key, NULL AS balance
            FROM supplier
        ) t
        GROUP BY kind, party_key, nation
        ORDER BY kind, party_key
    """,
    description="unionByName(allowMissingColumns=True): schema alignment "
    "by column NAME not position — the supplier side lists columns in a "
    "different order and has no balance column; oracle = DuckDB "
    "UNION ALL BY NAME",
)
def q75_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    cust = t["customer"].select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("party_key"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").alias("balance"),
    )
    supp = t["supplier"].select(
        F.col("s_nationkey").alias("nation"),
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("party_key"),
    )
    return (
        cust.unionByName(supp, allowMissingColumns=True)
        .groupBy("kind", "party_key", "nation")
        .agg(F.round(F.sum("balance"), 2).alias("total_balance"))
        .orderBy("kind", "party_key")
    )


@query(
    "q76_null_safe_join",
    oracle="""
        SELECT c.k AS join_key, COUNT(*) AS n_pairs
        FROM (SELECT NULLIF(c_nationkey % 8, 0) AS k FROM customer) c
        JOIN (SELECT NULLIF(s_nationkey % 8, 0) AS k FROM supplier) s
          ON c.k IS NOT DISTINCT FROM s.k
        GROUP BY c.k
        ORDER BY c.k NULLS FIRST
    """,
    description="null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys MATCH each other instead of dropping out — Spark still plans "
    "this as a hash join on the null-safe key (no nested loop); the NULL "
    "bucket is the classic skew cell a plain equi-join never produces",
)
def q76_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    c = t["customer"].select(
        F.nullif(F.col("c_nationkey") % 8, F.lit(0)).alias("ck")
    )
    s = t["supplier"].select(
        F.nullif(F.col("s_nationkey") % 8, F.lit(0)).alias("sk")
    )
    return (
        c.join(s, c["ck"].eqNullSafe(s["sk"]))
        .groupBy(c["ck"].alias("join_key"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("join_key").asc_nulls_first())
    )


@query(
    "q77_listagg",
    oracle="""
        SELECT r.r_regionkey,
               STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_regionkey
        ORDER BY r.r_regionkey
    """,
    description="listagg(...) WITHIN GROUP (ORDER BY ...) — ordered string "
    "aggregation (Spark 4.0 listagg = ANSI SQL:2023); deterministic "
    "because the within-group order is total",
)
def q77_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_regionkey,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_regionkey
        ORDER BY r.r_regionkey
        """
    )


@query(
    "q78_ordered_set_aggs",
    oracle="""
        SELECT l_returnflag,
               mode(l_linestatus) AS mode_status,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 2)
                   AS median_qty,
               ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity), 2)
                   AS q1_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="ordered-set aggregates: mode() (the testdata's per-flag "
    "status counts have a unique argmax, so mode is deterministic), "
    "percentile_cont (interpolating) and percentile_disc (exact member). "
    "All three are single-pass hash aggregates — no window, no sort of "
    "the full table",
)
def q78_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               mode(l_linestatus) AS mode_status,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 2)
                   AS median_qty,
               ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity), 2)
                   AS q1_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q79_try_arithmetic",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_div_null,
               ROUND(SUM(CASE WHEN l_quantity = 25 THEN NULL
                              ELSE l_extendedprice / (l_quantity - 25) END), 2)
                   AS sum_price_per_excess
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="error-safe arithmetic: try_divide returns NULL on "
    "division-by-zero instead of failing the job (ANSI-mode-safe "
    "pipelines) — oracle models it with an explicit CASE",
)
def q79_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    li = t["lineitem"]
    per_excess = F.try_divide(
        F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("l_quantity") == 25, 1).otherwise(0)
            ).alias("n_div_null"),
            F.round(F.sum(per_excess), 2).alias("sum_price_per_excess"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q80_stack_metrics",
    oracle="""
        SELECT metric, ROUND(SUM(v), 2) AS total, COUNT(*) AS n
        FROM (
            SELECT 'retail' AS metric, p_retailprice AS v FROM part
            UNION ALL
            SELECT 'size' AS metric, CAST(p_size AS DOUBLE) AS v FROM part
        ) t
        GROUP BY metric
        ORDER BY metric
    """,
    description="stack(n, ...) row-generator (columns→rows without a "
    "join): one scan of part emits both metric rows per input row, then "
    "aggregates — Spark plans stack as Expand (same operator as CUBE), "
    "one pass, no shuffle until the final 2-group agg",
)
def q80_stack_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT metric, ROUND(SUM(v), 2) AS total, COUNT(*) AS n
        FROM (
            SELECT stack(2, 'retail', p_retailprice,
                            'size', CAST(p_size AS DOUBLE)) AS (metric, v)
            FROM part
        ) t
        GROUP BY metric
        ORDER BY metric
        """
    )


@query(
    "q81_regexp_extract_all",
    oracle="""
        SELECT tok AS token, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM (
            SELECT doc_id, UNNEST(regexp_extract_all(text, '[a-z]{6,}')) AS tok
            FROM documents
        ) t
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 25
    """,
    description="regexp_extract_all + explode: pull every ≥6-letter token "
    "out of each document and rank corpus-wide occurrence counts — the "
    "regex runs JVM-side inside codegen; top-k is TakeOrdered, not a "
    "full sort",
)
def q81_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    docs = t["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]{6,}"), F.lit(0))
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(25)
    )


@query(
    "q82_map_higher_order",
    oracle="""
        SELECT o_orderstatus, o_orderpriority AS priority,
               COUNT(*) * 2 AS doubled_count
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        HAVING COUNT(*) > 100
        ORDER BY o_orderstatus, priority
    """,
    description="map higher-order functions: build a priority→count map "
    "per status (map_from_entries ∘ collect_list), map_filter to keep "
    "counts > 100, transform_values to double them, then explode back to "
    "rows — the map pipeline is all JVM expression-tree, zero extra "
    "shuffles beyond the one groupBy; oracle = the equivalent flat "
    "GROUP BY + HAVING",
)
def q82_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    per_pair = (
        t["orders"]
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    as_map = per_pair.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderpriority", "cnt"))
        ).alias("m")
    )
    transformed = as_map.select(
        "o_orderstatus",
        F.transform_values(
            F.map_filter("m", lambda k, v: v > 100), lambda k, v: v * 2
        ).alias("m"),
    )
    return (
        transformed.select(
            "o_orderstatus", F.explode("m").alias("priority", "doubled_count")
        )
        .orderBy("o_orderstatus", "priority")
    )


@query(
    "q83_distinct_on",
    oracle="""
        SELECT DISTINCT ON (c_nationkey)
               c_nationkey, c_custkey AS top_custkey,
               ROUND(c_acctbal, 2) AS top_acctbal
        FROM customer
        ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    description="DISTINCT ON emulation (Spark has no DISTINCT ON): "
    "row_number over (partition by key order by total order) = 1 — "
    "Catalyst plans the rank filter as a running-window with early stop; "
    "ties broken by c_custkey so both engines pick the identical row",
)
def q83_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        t["customer"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_custkey").alias("top_custkey"),
            F.round("c_acctbal", 2).alias("top_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q84_values_inline",
    oracle="""
        SELECT CASE WHEN w.weight >= 2 THEN 'high'
                    WHEN w.weight >= 1.5 THEN 'mid'
                    ELSE 'base' END AS tier,
               COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal * w.weight), 2) AS weighted_balance
        FROM customer c
        JOIN (VALUES ('BUILDING', 2.0), ('AUTOMOBILE', 1.5), ('MACHINERY', 1.0))
             w(segment, weight)
          ON c.c_mktsegment = w.segment
        GROUP BY 1
        ORDER BY tier
    """,
    description="inline VALUES table as a join dimension: a literal "
    "3-row weights table broadcast-joined against customer — the "
    "canonical small-dim pattern (LocalRelation → BroadcastExchange, "
    "fact table never shuffles)",
)
def q84_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN w.weight >= 2 THEN 'high'
                    WHEN w.weight >= 1.5 THEN 'mid'
                    ELSE 'base' END AS tier,
               COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal * w.weight), 2) AS weighted_balance
        FROM customer c
        JOIN (VALUES ('BUILDING', 2.0), ('AUTOMOBILE', 1.5), ('MACHINERY', 1.0))
             AS w(segment, weight)
          ON c.c_mktsegment = w.segment
        GROUP BY 1
        ORDER BY tier
        """
    )


@query(
    "q85_width_bucket",
    oracle="""
        SELECT CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 600000 THEN 13
                    ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1
               END AS bucket,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1
        ORDER BY bucket
    """,
    description="width_bucket equal-width histogram of order totals "
    "(12 buckets over [0, 600000), underflow→0 / overflow→13) — one "
    "scan, one shuffle of 14 tiny groups; oracle models the bucket "
    "arithmetic explicitly (DuckDB lacks width_bucket)",
)
def q85_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "q86_date_spine",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                   CAST(MAX(o_orderdate) AS DATE) AS hi
            FROM orders
        ),
        spine AS (
            SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
            FROM bounds
        ),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1
        )
        SELECT s.d AS day, COALESCE(n.n, 0) AS n_orders,
               COALESCE(n.total, 0.0) AS total
        FROM spine s LEFT JOIN daily n ON s.d = n.d
        ORDER BY s.d
    """,
    description="date-spine densification: sequence(min, max) generates "
    "the complete calendar (no raw rescan), left join fills gap days "
    "with zero — the spine side is a single-row agg exploded on the "
    "driver plan (LocalRelation-sized), the daily agg is the only "
    "shuffle; the standard shape for time-series feature tables",
)
def q86_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    orders = t["orders"]
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    spine = (
        orders.agg(
            F.min(F.to_date("o_orderdate")).alias("lo"),
            F.max(F.to_date("o_orderdate")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        spine.join(daily, spine["day"] == daily["d"], "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("day")
    )


@query(
    "q87_filtered_agg",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                   AS filled_total,
               ROUND(AVG(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
                   AS avg_large
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    description="FILTER (WHERE ...) aggregate clause (SQL:2003): several "
    "differently-filtered aggregates in ONE pass over the fact — the "
    "declarative alternative to N self-joins; identical text runs on "
    "both engines",
)
def q87_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
                   AS filled_total,
               ROUND(AVG(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
                   AS avg_large
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q88_bool_bit_aggs",
    oracle="""
        SELECT c_mktsegment,
               bool_and(c_acctbal > -1000) AS all_above_floor,
               bool_or(c_acctbal > 9000) AS any_wealthy,
               bit_and(c_nationkey) AS nation_bit_and,
               bit_or(c_nationkey) AS nation_bit_or,
               bit_xor(c_nationkey) AS nation_bit_xor
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="boolean (bool_and/bool_or = ANSI EVERY/ANY) and bitwise "
    "(bit_and/or/xor) aggregates — all map-side-combinable single-pass "
    "aggregates; bit_xor is the parity check used in checksum-style "
    "table compares",
)
def q88_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    c = t["customer"]
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_wealthy"),
            F.bit_and("c_nationkey").alias("nation_bit_and"),
            F.bit_or("c_nationkey").alias("nation_bit_or"),
            F.bit_xor("c_nationkey").alias("nation_bit_xor"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q100_trend_fit",
    oracle="""
        WITH monthly AS (
            SELECT o_orderpriority,
                   CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                        + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT)
                       AS x,
                   CAST(count(*) AS BIGINT) AS y
            FROM orders
            GROUP BY 1, 2
        ), s AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM monthly GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, n AS n_months,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS r2
        FROM s ORDER BY o_orderpriority
    """,
    description="distributed per-group OLS trend fit: monthly order "
    "counts per priority regressed on the month index. Two stacked "
    "hash aggregations (month rollup, then per-group moment sums) — "
    "every moment is an exact BIGINT (sums of bounded integer products "
    "never overflow int64 here; the numerator is cast to DOUBLE before "
    "squaring, which WOULD overflow at large scale), so the result is "
    "hash-stable by construction regardless of partitioning or "
    "summation order (no float accumulation anywhere). "
    "The pattern generalizes: any per-key regression at 100 TB is two "
    "map-side-combinable aggs, never a per-key collect",
)
def q100_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    monthly = (
        t["orders"]
        .groupBy(
            "o_orderpriority",
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    s = monthly.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den
    return s.select(
        "o_orderpriority",
        F.col("n").alias("n_months"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            num.cast("double") * num.cast("double")
            / (
                den.cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    ).orderBy("o_orderpriority")


@query(
    "q17b_ntile_windows",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ntile(4) OVER w AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cum_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    description="distribution window functions (completes the Q17 "
    "ranking family): ntile(4) quartile assignment, percent_rank and "
    "cume_dist per customer over a fully deterministic (totalprice "
    "DESC, orderkey) order — tie-broken so both engines agree bitwise. "
    "One shuffle on o_custkey; per-partition sort only",
    tags=("sql", "window"),
)
def q17b_ntile_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q103_feature_pack",
    oracle="""
        WITH w AS (
            SELECT event_id, user_id, value,
                   lag(value, 1) OVER uw AS lag1,
                   lag(value, 2) OVER uw AS l2,
                   lag(value, 3) OVER uw AS l3,
                   CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(lag(ts, 1) OVER uw)) AS BIGINT)
                       AS delta_ts,
                   ROUND(AVG(value) OVER
                       (uw ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
                       AS roll_mean4,
                   ROUND(COALESCE(STDDEV_SAMP(value) OVER
                       (uw ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 0.0), 4)
                       AS roll_std4
            FROM events
            WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ROUND(value, 4) AS value,
               ROUND(lag1, 4) AS lag1, delta_ts, roll_mean4, roll_std4,
               ROUND(
                 (value + COALESCE(0.8 * lag1, 0)
                        + COALESCE(0.64 * l2, 0)
                        + COALESCE(0.512 * l3, 0))
                 / (1 + CASE WHEN lag1 IS NULL THEN 0 ELSE 0.8 END
                      + CASE WHEN l2 IS NULL THEN 0 ELSE 0.64 END
                      + CASE WHEN l3 IS NULL THEN 0 ELSE 0.512 END),
                 4) AS ewma4
        FROM w ORDER BY event_id
    """,
    description="time-series feature-engineering pack over the events "
    "stream: lag-1 value, inter-event seconds, rolling mean/std "
    "(4-row frame), and a truncated 4-tap EWMA (alpha=0.8, weights "
    "renormalized over the taps that exist so early rows are unbiased) "
    "— the per-entity features a training pipeline materializes before "
    "sequence modeling. ALL columns ride ONE window spec (partition "
    "user_id, order ts+event_id): one shuffle, one sort, seven "
    "features; the EWMA truncation is what keeps it expressible as a "
    "frame instead of a recursive scan",
    tags=("windows", "features", "events"),
)
def q103_feature_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    fr = uw.rowsBetween(-3, 0)
    lag1 = F.lag("value", 1).over(uw)
    l2 = F.lag("value", 2).over(uw)
    l3 = F.lag("value", 3).over(uw)
    num = (
        F.col("value")
        + F.coalesce(0.8 * lag1, F.lit(0.0))
        + F.coalesce(0.64 * l2, F.lit(0.0))
        + F.coalesce(0.512 * l3, F.lit(0.0))
    )
    den = (
        F.lit(1.0)
        + F.when(lag1.isNull(), 0.0).otherwise(0.8)
        + F.when(l2.isNull(), 0.0).otherwise(0.64)
        + F.when(l3.isNull(), 0.0).otherwise(0.512)
    )
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            F.round(lag1, 4).alias("lag1"),
            (
                F.col("ts").cast("long")
                - F.lag(F.col("ts"), 1).over(uw).cast("long")
            ).alias("delta_ts"),
            F.round(F.avg("value").over(fr), 4).alias("roll_mean4"),
            F.round(
                F.coalesce(F.stddev_samp("value").over(fr), F.lit(0.0)), 4
            ).alias("roll_std4"),
            F.round(num / den, 4).alias("ewma4"),
        )
        .orderBy("event_id")
    )
