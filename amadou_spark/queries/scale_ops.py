"""Scale-posture operators as declared queries: salting (hot-key
joins/aggregations) and bucketed-table shuffle elimination
(`amadou_spark/scale.py`).

These were pytest-only (tests/test_scale.py pins result-equality and
the no-Exchange plan property); registering them puts the driver's
hash gate on the CORRECTNESS side of the story: salting and bucketing
must be pure physical-plan transformations — bit-identical results to
the plain formulations the oracles express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadou_spark.catalog import register_tables
from amadou_spark.queries import query
from amadou_spark.scale import salted_aggregate, salted_join, write_bucketed


@query(
    "q93_salted_join",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="salted equi-join (scale.py salted_join): the skewed "
    "side's key gets a random salt and the other side replicates "
    "across all salt values, spreading one hot key over n_salts "
    "shuffle partitions instead of one straggler task — the manual "
    "answer where AQE's skew-join can't act (it only splits "
    "sort-merge partitions). Salting must be invisible in the result: "
    "the oracle is the PLAIN join",
)
def q93_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    skewed = t["orders"].select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    other = t["customer"].select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(skewed, other, on="custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q94_bucketed_join",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT o_custkey) AS n_customers,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    description="bucketed-table join (scale.py write_bucketed): both "
    "sides persisted hash-bucketed on the join key, so the equi-join "
    "needs NO shuffle of either table — the 100 TB answer for "
    "fact-fact joins that run daily (pay the shuffle once at write "
    "time; tests/test_scale.py pins the no-Exchange plan). The query "
    "writes the bucketed tables, joins them bucket-to-bucket, and "
    "aggregates; oracle = the plain join over the raw tables",
)
def q94_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    write_bucketed(
        t["orders"].select("o_custkey", "o_totalprice"),
        "q94_b_orders",
        "o_custkey",
        16,
    )
    write_bucketed(
        t["customer"].select("c_custkey"), "q94_b_customer", "c_custkey", 16
    )
    bo = spark.table("q94_b_orders")
    bc = spark.table("q94_b_customer")
    return bo.join(bc, bo["o_custkey"] == bc["c_custkey"]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "q95_salted_aggregate",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                              AS BIGINT)) / 100.0, 2) AS total
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="two-phase salted aggregation (scale.py "
    "salted_aggregate): group on (key, salt) first so a hot group key "
    "spreads across partitions, then re-aggregate the partials — only "
    "valid for decomposable aggregates (sum-of-sums, sum-of-counts), "
    "which the helper's signature enforces. Must equal the plain "
    "one-phase aggregate the oracle expresses. Engine stability (r9 — "
    "the first sf1-slice oracle run caught the raw double sum "
    "diverging from DuckDB at the cent under 10x data): prices are "
    "pre-mapped to exact integer CENTS (q133 floor-half-up pin), so "
    "the salted two-stage sum is exact-integer arithmetic and "
    "association order cannot matter — which is the point the "
    "operator demonstrates",
)
def q95_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "_cents",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"),
    )
    out = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs=[
            ("l_linenumber", F.count, F.sum, "n"),
            ("_cents", F.sum, F.sum, "total_cents"),
        ],
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("total_cents") / 100.0, 2).alias("total"),
    ).orderBy("l_returnflag")


@query(
    "q110_bloom_pruned_join",
    oracle="""
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal > 8000
        GROUP BY n_name ORDER BY n_name
    """,
    description="Bloom-filter runtime pruning (scale.py bloom_prune): "
    "a portable md5-hashed bloom bitmap (3 hashes, sized from the "
    "actual dim-key count at ~12 bits/key so it never saturates, "
    "capped at 8 MiB) is built over the selective supplier key set "
    "and broadcast; "
    "lineitem probes it with pure-JVM word/bit arithmetic BEFORE the "
    "join, so rows that would die in the join are dropped before the "
    "exchange. Bloom false positives are removed by the exact join "
    "that follows — results bit-identical to the plain join the "
    "oracle expresses; only the shuffle volume changes. This is the "
    "explicit form of Spark's own injected runtime filters, usable "
    "on any join at 100 TB where the dim side is selective",
)
def q110_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amadou_spark.scale import bloom_prune

    t = register_tables(spark, sf_dir)
    dim = t["supplier"].filter(F.col("s_acctbal") > 8000)
    pruned = bloom_prune(
        t["lineitem"], dim.select("s_suppkey"), "l_suppkey", "s_suppkey"
    )
    return (
        pruned.join(
            F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
        .orderBy("n_name")
    )
