"""Tier A declared queries (SURVEY.md §2.2, Q01-Q30) — DuckDB-oracle checked.

Each query is implemented with the PySpark DataFrame API (or spark.sql
where a subquery shape is the clearest logical-plan statement) so that
Catalyst owns optimization: predicate pushdown into the parquet scan,
column pruning, join strategy selection (AQE), partial aggregation.

Scale notes are attached per query: at 100 TB `lineitem`/`orders` are
the fact tables (shuffled on join/group keys, AQE-coalesced), while
`region`/`nation`/`supplier`/`part` are dimensions that must broadcast.
We mark dimension sides with ``F.broadcast`` explicitly rather than
relying on size estimation, because at real scale statistics for a
freshly-read parquet dim table can exceed the 10 MB auto-broadcast
threshold while still being far cheaper to broadcast than to shuffle
the fact table.

Cross-engine type alignment (Spark vs DuckDB) is normalized explicitly:
CEIL/FLOOR → BIGINT, SUM(int) → BIGINT, EXTRACT → BIGINT, ROW_NUMBER →
BIGINT, GROUPING → INT, float aggregates ROUND(…, 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.functions import is_defined, nullify
from amadou_spark.queries import query


# ---------------------------------------------------------------- Q01-Q04

@query(
    "q01_scan_projection",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    description="scan + projection; column pruning must reach the parquet scan",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return t["region"].select("r_regionkey", "r_name").orderBy("r_regionkey")


@query(
    "q02_filter_in_between",
    oracle="""
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A', 'R')
        ORDER BY l_orderkey, l_linenumber
    """,
    description="comparison + AND + IN + BETWEEN predicates, pushed to parquet",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_quantity").between(10, 20) & F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q03_is_defined",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE c_name IS NOT NULL AND c_name <> '' AND c_name <> 'null'
        ORDER BY c_custkey
    """,
    description="reference op Column.isDefined (core/.../package.scala:67-68)",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return t["customer"].filter(is_defined(F.col("c_name"))).select("c_custkey").orderBy("c_custkey")


@query(
    "q04_nullify",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'null' THEN NULL ELSE c_mktsegment END AS seg
        FROM customer ORDER BY c_custkey
    """,
    description="reference op Column.nullify (core/.../package.scala:78-79)",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["customer"]
        .select("c_custkey", nullify(F.col("c_mktsegment")).alias("seg"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------- joins

@query(
    "q05_inner_join",
    oracle="""
        SELECT o_orderkey, c_custkey, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
    """,
    description="2-way inner equi-join; customer is the broadcast side",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    # orders is the fact side: stream it, broadcast the (smaller) customer dim.
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name")
        .orderBy("o_orderkey")
    )


@query(
    "q06_join_chain_agg",
    oracle="""
        SELECT n_name, count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    description="4-way join chain + aggregate; dims broadcast, fact never re-shuffled",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    # lineitem ⋈ orders is the only fact-fact shuffle; customer and nation
    # broadcast so the join chain adds no further exchanges.
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_items"))
        .orderBy("n_name")
    )


@query(
    "q07_left_join_coalesce",
    oracle="""
        SELECT c_custkey,
               ROUND(SUM(COALESCE(o_totalprice, 0)), 2) AS total_spent,
               count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    description="left outer join + COALESCE null handling + per-key aggregate",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias("total_spent"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q08_right_join",
    oracle="""
        SELECT n_nationkey, n_name, s_suppkey
        FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_nationkey, s_suppkey
    """,
    description="right outer join preserving all nations",
)
def q08_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .select("n_nationkey", "n_name", "s_suppkey")
        .orderBy("n_nationkey", "s_suppkey")
    )


@query(
    "q08_full_join",
    oracle="""
        SELECT n_nationkey, s_suppkey
        FROM supplier FULL JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_nationkey, s_suppkey
    """,
    description="full outer join variant",
)
def q08_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "full")
        .select("n_nationkey", "s_suppkey")
        .orderBy("n_nationkey", "s_suppkey")
    )


@query(
    "q09_semi_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    description="EXISTS → left-semi join (no row multiplication, no payload shuffle)",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q10_anti_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    description="NOT EXISTS → left-anti join",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q11_cross_join",
    oracle="SELECT count(*) AS n_pairs FROM region CROSS JOIN nation",
    description="bounded cartesian product (dims only — never a fact table)",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).agg(F.count("*").alias("n_pairs"))


@query(
    "q12_theta_join",
    oracle="""
        SELECT p1.p_brand AS brand,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(SUM(p1.p_partkey) AS BIGINT) AS sum_k1,
               CAST(SUM(p2.p_partkey) AS BIGINT) AS sum_k2
        FROM part p1 JOIN part p2
          ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        GROUP BY 1
        ORDER BY 1
    """,
    description=(
        "non-equi (range) theta join bounded by an equi key — the join is "
        "exactly SURVEY Q12's part self-join (brand equality + p_size < "
        "p_size): Catalyst plans the brand equality as the join key and "
        "evaluates the inequality as a residual filter, avoiding the O(n²) "
        "cartesian. r10: the RESULT is folded to the brand grain (pair "
        "count + exact BIGINT key checksums over both pair legs, so any "
        "lost/duplicated/mismatched pair still flips the hash) instead of "
        "emitting pair-level rows — theta-join output is inherently "
        "quadratic in |part| (10x parts per brand => ~100x pairs), and "
        "shipping the pair set off the cluster is never the 100 TB shape; "
        "the 10x probe slice's driver-side collect proved it (>1 GiB)"
    ),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    p1 = t["part"].alias("p1")
    p2 = t["part"].alias("p2")
    return (
        p1.join(
            p2,
            (F.col("p1.p_brand") == F.col("p2.p_brand"))
            & (F.col("p1.p_size") < F.col("p2.p_size")),
        )
        .groupBy(F.col("p1.p_brand").alias("brand"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("p1.p_partkey").cast("bigint").alias("sum_k1"),
            F.sum("p2.p_partkey").cast("bigint").alias("sum_k2"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------- aggregates

@query(
    "q13_tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               MIN(l_shipdate) AS min_ship,
               MAX(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: multi-key hash aggregate with 7 aggregates; "
    "partial (map-side) aggregation makes the shuffle carry only 6 groups",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            # cast NTZ → session-tz timestamp: values are identical under
            # the UTC session, but the column type then matches the
            # oracle's plain TIMESTAMP for strict schema comparison
            F.min("l_shipdate").cast("timestamp").alias("min_ship"),
            F.max("l_shipdate").cast("timestamp").alias("max_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q14_count_distinct",
    oracle="SELECT count(DISTINCT o_custkey) AS n_custs FROM orders",
    description="count distinct (expands to a two-stage partial/final plan)",
)
def q14_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return t["orders"].agg(F.countDistinct("o_custkey").alias("n_custs"))


@query(
    "q14_distinct",
    oracle="SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    description="DISTINCT as group-by; map-side combine keeps the shuffle tiny",
)
def q14_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return t["orders"].select("o_orderpriority").distinct().orderBy("o_orderpriority")


@query(
    "q15_rollup",
    oracle="""
        SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               l_returnflag, l_linestatus,
               count(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    description="ROLLUP grouping sets with GROUPING() disambiguation [R: GROUPING "
    "return type differs — normalized to INT on both engines]",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("g_flag", "g_status", "l_returnflag", "l_linestatus", "n_rows", "sum_qty")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "q16_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) > 5
        ORDER BY o_custkey
    """,
    description="post-aggregation HAVING filter",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 5)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------- windows

@query(
    "q17_ranking_windows",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderpriority) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderpriority) AS BIGINT) AS drnk
        FROM orders
        ORDER BY o_orderkey
    """,
    description="ROW_NUMBER / RANK / DENSE_RANK; one shuffle on o_custkey serves "
    "both window specs [R: rank return widths normalized to BIGINT]",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w_price = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_prio = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            F.row_number().over(w_price).cast("bigint").alias("rn"),
            F.rank().over(w_prio).cast("bigint").alias("rnk"),
            F.dense_rank().over(w_prio).cast("bigint").alias("drnk"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q18_analytic_windows",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS prev_order,
               LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS next_order
        FROM orders
        ORDER BY o_orderkey
    """,
    description="running SUM with an explicit ROWS frame + LAG/LEAD",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
            ).alias("running_total"),
            F.lag("o_orderkey", 1).over(w).alias("prev_order"),
            F.lead("o_orderkey", 1).over(w).alias("next_order"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q19_top_k",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    description="top-k: Spark plans TakeOrderedAndProject — per-partition heap, "
    "no global sort; the total ORDER BY makes the k rows deterministic",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q20_sort_nulls",
    oracle="""
        SELECT c_custkey, seg,
               CAST(ROW_NUMBER() OVER (ORDER BY seg NULLS FIRST, c_custkey) AS BIGINT) AS pos
        FROM (
            SELECT c_custkey,
                   CASE WHEN c_mktsegment = 'null' THEN NULL ELSE c_mktsegment END AS seg
            FROM customer
        )
        ORDER BY pos
    """,
    description="explicit NULLS FIRST ordering materialized as a position column "
    "[R: default null order differs Spark(asc=NULLS FIRST) vs DuckDB(NULLS LAST)]. "
    "The position is a two-phase range-partitioned global rank "
    "(scale.global_rank) — an unpartitioned row_number window would "
    "execute as an Exchange SinglePartition one-task sort of the "
    "whole table (r5 VERDICT #4); Spark's default ascending order is "
    "NULLS FIRST in both repartitionByRange and window sorts, so the "
    "rank realizes exactly the declared null placement",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.scale import global_rank

    t = register_tables(spark, sf_dir)
    base = t["customer"].select(
        "c_custkey", nullify(F.col("c_mktsegment")).alias("seg")
    )
    return (
        global_rank(
            base, ["seg", "c_custkey"], "pos", deterministic_input=True
        )
        .select("c_custkey", "seg", "pos")
        # already globally pos-ordered: global_rank leaves the frame
        # range-partitioned + sorted by (seg, c_custkey), the exact
        # order pos was stamped in, and the offsets join is narrow —
        # sortWithinPartitions re-asserts the order for the collector
        # without the range re-sample + full shuffle an orderBy plans
        .sortWithinPartitions("pos")
    )


# ---------------------------------------------------------------- set ops

_SET_LHS = "SELECT n_nationkey AS k FROM nation"
_SET_RHS = "SELECT s_nationkey AS k FROM supplier"


@query(
    "q21_union_all",
    oracle=f"SELECT k FROM ({_SET_LHS} UNION ALL {_SET_RHS}) ORDER BY k",
    description="UNION ALL — no shuffle, pure concatenation of partitions",
)
def q21_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lhs = t["nation"].select(F.col("n_nationkey").alias("k"))
    rhs = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return lhs.unionAll(rhs).orderBy("k")


@query(
    "q21_union",
    oracle=f"SELECT k FROM ({_SET_LHS} UNION {_SET_RHS}) ORDER BY k",
    description="UNION = union-all + distinct (one shuffle on the full row)",
)
def q21_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lhs = t["nation"].select(F.col("n_nationkey").alias("k"))
    rhs = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return lhs.union(rhs).distinct().orderBy("k")


@query(
    "q21_intersect",
    oracle=f"SELECT k FROM ({_SET_LHS} INTERSECT {_SET_RHS}) ORDER BY k",
    description="INTERSECT (distinct semantics) — plans as left-semi join",
)
def q21_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lhs = t["nation"].select(F.col("n_nationkey").alias("k"))
    rhs = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return lhs.intersect(rhs).orderBy("k")


@query(
    "q21_except",
    oracle=f"SELECT k FROM ({_SET_LHS} EXCEPT {_SET_RHS}) ORDER BY k",
    description="EXCEPT (distinct semantics) — plans as left-anti join",
)
def q21_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lhs = t["nation"].select(F.col("n_nationkey").alias("k"))
    rhs = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return lhs.exceptAll(rhs.distinct()).distinct().orderBy("k")


# ---------------------------------------------------------------- subqueries

@query(
    "q22_scalar_subquery",
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
    """,
    description="uncorrelated scalar subquery — Spark evaluates it as a "
    "broadcast-ed single-row subplan, no per-row re-execution",
)
def q22_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "q22_in_subquery",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        ORDER BY o_orderkey
    """,
    description="IN subquery — decorrelated to a left-semi join by Catalyst",
)
def q22_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        ORDER BY o_orderkey
        """
    )


@query(
    "q23_correlated_subquery",
    oracle="""
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer ORDER BY c_custkey
    """,
    description="correlated scalar COUNT subquery — Catalyst decorrelates to an "
    "aggregate + left outer join (no per-row subplan execution at scale)",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------- scalar functions

@query(
    "q24_string_functions",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS up_name,
               LOWER(p_type) AS low_type,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               SUBSTR(p_name, 1, 5) AS name5,
               TRIM(p_name) AS trimmed,
               REPLACE(p_type, 'E', '_') AS repl,
               CONCAT(p_brand, '#', p_name) AS tagged,
               (p_type LIKE 'ECO%') AS is_eco
        FROM part ORDER BY p_partkey
    """,
    description="string function matrix [R: LENGTH widths normalized to INT]",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["part"]
        .select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.lower("p_type").alias("low_type"),
            F.length("p_name").cast("int").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.trim(F.col("p_name")).alias("trimmed"),
            F.replace(F.col("p_type"), F.lit("E"), F.lit("_")).alias("repl"),
            F.concat_ws("#", "p_brand", "p_name").alias("tagged"),
            F.col("p_type").like("ECO%").alias("is_eco"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q25_math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(ABS(l_extendedprice - l_quantity), 2) AS abs_diff,
               ROUND(l_extendedprice, 2) AS price2,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(MOD(l_linenumber, 3) AS INT) AS line_mod,
               ROUND(POWER(l_discount, 2), 6) AS disc_sq,
               ROUND(SQRT(l_quantity), 4) AS qty_sqrt
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    description="math function matrix [R: FLOOR/CEIL return types normalized to "
    "BIGINT — DuckDB returns DOUBLE/DECIMAL, Spark returns BIGINT]",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity")), 2).alias("abs_diff"),
            F.round("l_extendedprice", 2).alias("price2"),
            F.floor("l_quantity").cast("bigint").alias("qty_floor"),
            F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
            (F.col("l_linenumber") % 3).cast("int").alias("line_mod"),
            F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
            F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q26_datetime_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS odate,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
               CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS o_day,
               (o_orderdate >= DATE '1998-06-01') AS after_cutoff,
               CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS omonth
        FROM orders ORDER BY o_orderkey
    """,
    description="date/time extraction + DATE-literal comparison + month bucketing "
    "(the reference's Month DateInterval semantics) [R: EXTRACT widths → BIGINT, "
    "DATE_TRUNC return type → DATE on both]",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
            (F.col("o_orderdate") >= F.lit("1998-06-01").cast("date")).alias("after_cutoff"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("omonth"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q27_conditional",
    oracle="""
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt,
               ROUND(SUM(COALESCE(NULLIF(o_totalprice, 0), 0)), 2) AS total
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    description="TPC-H Q12-style conditional sums + COALESCE/NULLIF "
    "[R: SUM(int) → BIGINT (DuckDB returns HUGEINT)]",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_cnt"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_cnt"),
            F.round(
                F.sum(F.coalesce(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(0.0))), 2
            ).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q28_cast_matrix",
    oracle="""
        SELECT c_custkey,
               CAST(c_custkey AS DOUBLE) AS key_as_double,
               CAST(c_custkey AS VARCHAR) AS key_as_str,
               TRY_CAST(c_name AS DOUBLE) AS name_as_double,
               TRY_CAST(SUBSTR(CAST(c_custkey AS VARCHAR), 1, 2) AS BIGINT) AS str_as_int,
               CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor_int,
               CAST('2024-06-01' AS DATE) AS lit_date,
               CAST(CAST('2024-06-01 12:30:00' AS TIMESTAMP) AS DATE) AS ts_as_date
        FROM customer ORDER BY c_custkey
    """,
    description="cast matrix incl. TRY_CAST null-on-failure [R: double→int cast "
    "ROUNDS in DuckDB but TRUNCATES in Spark — routed through FLOOR on both]",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.col("c_custkey").cast("double").alias("key_as_double"),
            F.col("c_custkey").cast("string").alias("key_as_str"),
            F.expr("TRY_CAST(c_name AS DOUBLE)").alias("name_as_double"),
            F.expr(
                "TRY_CAST(SUBSTRING(CAST(c_custkey AS STRING), 1, 2) AS BIGINT)"
            ).alias("str_as_int"),
            F.floor("c_acctbal").cast("bigint").alias("bal_floor_int"),
            F.lit("2024-06-01").cast("date").alias("lit_date"),
            F.lit("2024-06-01 12:30:00").cast("timestamp").cast("date").alias("ts_as_date"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------- TPC-H shapes

@query(
    "q29_tpch_q3",
    oracle="""
        SELECT o_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE) AS odate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    description="TPC-H Q3 shape: selective dim filter broadcast into a 3-way "
    "join, aggregate, top-k by revenue",
)
def q29_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("odate"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q29_tpch_q5",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    description="TPC-H Q5 shape: 6-way join (fact-fact shuffle on orderkey, all "
    "dims broadcast), region-filtered, grouped revenue",
)
def q29_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1999-01-01 00:00:00").cast("timestamp")
    nations_in_asia = (
        t["nation"].join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["customer"]),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations_in_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------- events (stream-shaped batch)

@query(
    "q30_events_daily",
    oracle="""
        SELECT user_id, event_type, CAST(ts AS DATE) AS day,
               count(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY user_id, event_type, CAST(ts AS DATE)
        ORDER BY user_id, event_type, day
    """,
    description="per-(user, type, day) event aggregates — the batch shape of a "
    "tumbling daily window",
)
def q30_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", "event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("user_id", "event_type", "day")
    )


@query(
    "q30_events_gaps",
    oracle="""
        SELECT event_id, user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(LAG(ts, 1) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id))) AS BIGINT)
                 AS gap_s
        FROM events
        ORDER BY user_id, event_id
    """,
    description="LAG(ts) inter-event gap per user in whole seconds [R: epoch "
    "extraction — Spark CAST(ts AS LONG) vs DuckDB FLOOR(epoch(ts)); both floor]",
)
def q30_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    prev_secs = F.lag(F.col("ts"), 1).over(w).cast("long")
    return (
        t["events"]
        .select("event_id", "user_id", (secs - prev_secs).alias("gap_s"))
        .orderBy("user_id", "event_id")
    )
