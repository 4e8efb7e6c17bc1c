"""Scale-helper tests: salted join/aggregate equivalence with the plain
versions, bucketed-write shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amadou_spark.catalog import load_table
from amadou_spark.scale import salted_aggregate, salted_join, write_bucketed


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS o_custkey", "c_name"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, on="o_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            [
                ("l_quantity", F.count, F.sum, "n"),
                ("l_quantity", F.sum, F.sum, "s"),
            ],
        ).collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # warehouse dir is static config — tables land in ./spark-warehouse
    # and are dropped in the finally block
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", 8)
    write_bucketed(customer, "b_customer", "c_custkey", 8)
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_name")
    )
    # disable broadcast so the join strategy is key-based, then check the
    # bucketed tables co-locate with NO Exchange in the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == load_table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
