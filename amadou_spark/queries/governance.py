"""Data-governance operators as declared queries: SCD2 history
maintenance (`operators/scd.py`) and one-pass data-quality
expectations (`operators/expectations.py`).

Built ahead in round 3 (registry frozen while the driver-check backlog
drained — VERDICT r2 #1); registered here with full DuckDB oracles so
the driver's hash gate covers them. The reference gates its pipelines
on schema contracts (core/.../Schema.scala); row-level expectations
and dimension-history folds are the warehouse-side complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.operators.expectations import (
    check_expectations,
    rule_between,
    rule_in_set,
    rule_not_null,
    rule_predicate,
)
from amadou_spark.operators.scd import scd2_apply
from amadou_spark.queries import query


@query(
    "q89_scd2_apply",
    oracle="""
        WITH hist AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 3 <> 0
        ), snap AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 5 <> 0
        )
        -- unchanged keys: open row survives untouched
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               TIMESTAMP '2020-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM hist WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
        UNION ALL
        -- changed keys close their old version; keys missing from the
        -- full snapshot close too (close_missing=True deletion semantics)
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               TIMESTAMP '2020-01-01' AS valid_from,
               TIMESTAMP '2024-01-01' AS valid_to
        FROM hist WHERE (o_orderkey % 5 <> 0 AND o_orderkey % 7 = 0)
                     OR o_orderkey % 5 = 0
        UNION ALL
        -- changed keys open a new version with snapshot values;
        -- brand-new keys open their first version
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               TIMESTAMP '2024-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM snap WHERE o_orderkey % 3 = 0 OR o_orderkey % 7 = 0
        ORDER BY o_orderkey, valid_from
    """,
    description="SCD2 full-snapshot fold (operators/scd.py scd2_apply): "
    "a history seeded from 2/3 of orders is folded with a snapshot "
    "covering 4/5 of orders in which every 7th key changed status — "
    "exercising all four branches (unchanged pass-through, change = "
    "close+reopen, brand-new key, close_missing deletion). One "
    "full-outer equi-join on the business key with map-side sha2 "
    "change hashes; the oracle derives the same history from the "
    "membership predicates independently of the join logic",
)
def q89_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    history = (
        base.filter(F.col("o_orderkey") % 3 != 0)
        .withColumn("valid_from", F.lit("2020-01-01").cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    snapshot = base.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return scd2_apply(
        history,
        snapshot,
        keys=["o_orderkey"],
        tracked=["o_orderstatus", "o_totalprice"],
        snapshot_ts="2024-01-01",
        close_missing=True,
    ).orderBy("o_orderkey", "valid_from")


@query(
    "q91_scd2_merge",
    oracle="""
        WITH cur AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 3 <> 0
        ), upd AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 5 <> 0
        )
        -- untouched open rows: no update row for the key, or unchanged
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               DATE '2020-01-01' AS valid_from,
               DATE '9999-12-31' AS valid_to, TRUE AS is_current
        FROM cur WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 <> 0
        UNION ALL
        -- changed keys close their old version at the effective date
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               DATE '2020-01-01', DATE '2024-01-01', FALSE
        FROM cur WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 = 0
        UNION ALL
        -- changed + brand-new keys open a new current version
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               DATE '2024-01-01', DATE '9999-12-31', TRUE
        FROM upd WHERE o_orderkey % 3 = 0 OR o_orderkey % 7 = 0
        ORDER BY o_orderkey, valid_from
    """,
    description="SCD2 delta-feed merge (operators/scd.py scd2_merge): an "
    "updates batch is applied to a current table with the 9999-12-31 "
    "open sentinel — keys ABSENT from the batch stay untouched (the "
    "delta-feed contrast to q89's full-snapshot close_missing "
    "semantics). Null-safe per-column change detection so a NULL-vs-"
    "value diff counts while a no-update key never does; every branch "
    "an equi/anti-join on the business key. Oracle derives the merged "
    "table from the membership predicates independently",
)
def q91_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.operators.scd import OPEN_END, scd2_merge

    t = register_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    current = (
        base.filter(F.col("o_orderkey") % 3 != 0)
        .withColumn("valid_from", F.lit("2020-01-01").cast("date"))
        .withColumn("valid_to", F.lit(OPEN_END).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    updates = base.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return scd2_merge(
        current,
        updates,
        key="o_orderkey",
        tracked_cols=["o_orderstatus", "o_totalprice"],
        effective_date="2024-01-01",
    ).orderBy("o_orderkey", "valid_from")


@query(
    "q92_cdc_compaction",
    oracle="""
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
        ORDER BY user_id
    """,
    description="CDC log compaction: latest record per key via max_by "
    "over a (ts, event_id) struct — ONE hash aggregation with map-side "
    "partial combine (each partition reduces to one candidate per key "
    "before the shuffle), strictly cheaper at 100 TB than the "
    "row_number-window formulation which must shuffle and SORT every "
    "version of every key. Deterministic: ties on ts broken by "
    "event_id. Oracle = the window formulation",
)
def q92_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    latest = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("s")
        )
    )
    return latest.select(
        "user_id",
        F.col("s.event_id").alias("event_id"),
        F.col("s.ts").alias("ts"),
        F.col("s.event_type").alias("event_type"),
        F.col("s.value").alias("value"),
    ).orderBy("user_id")


@query(
    "q90_expectations",
    oracle="""
        WITH agg AS (
            SELECT COUNT(*) AS total,
                   CAST(SUM(CASE WHEN l_orderkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
                   CAST(SUM(CASE WHEN l_discount IS NOT NULL
                                  AND (l_discount < 0.0 OR l_discount > 0.1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS v_bt,
                   CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                                  AND l_returnflag NOT IN ('A', 'N', 'R')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS v_in,
                   CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS v_pp
            FROM lineitem
        ), uq AS (
            SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS dups
            FROM (SELECT COUNT(*) AS n FROM lineitem
                  GROUP BY l_orderkey, l_linenumber)
            WHERE n > 1
        )
        SELECT * FROM (
            SELECT 'not_null(l_orderkey)' AS rule, v_nn AS violations,
                   total, v_nn = 0 AS pass FROM agg
            UNION ALL
            SELECT 'between(l_discount,0.0,0.1)', v_bt, total, v_bt = 0 FROM agg
            UNION ALL
            SELECT 'in_set(l_returnflag)', v_in, total, v_in = 0 FROM agg
            UNION ALL
            SELECT 'positive_price', v_pp, total, v_pp = 0 FROM agg
            UNION ALL
            SELECT 'unique(l_orderkey,l_linenumber)', dups, total,
                   dups = 0 FROM agg, uq
        )
        ORDER BY rule
    """,
    description="one-pass data-quality expectations "
    "(operators/expectations.py): four row-level rules (not-null, "
    "range, set membership, custom predicate) compile to ONE scan of "
    "conditional aggregates; the uniqueness rule adds one key-only "
    "shuffle over (l_orderkey, l_linenumber) — which the synthetic "
    "lineitem genuinely violates, so the report is non-degenerate. "
    "Oracle = the same conditional counts as one DuckDB SELECT",
)
def q90_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    rules = [
        rule_not_null("l_orderkey"),
        rule_between("l_discount", 0.0, 0.1),
        rule_in_set("l_returnflag", ["A", "N", "R"]),
        rule_predicate("positive_price", F.col("l_extendedprice") > 0),
    ]
    return check_expectations(
        t["lineitem"], rules, unique_keys=[["l_orderkey", "l_linenumber"]]
    ).orderBy("rule")
