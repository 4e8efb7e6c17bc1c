"""One-pass data-quality expectations over the testdata tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amadou_spark.catalog import load_table
from amadou_spark.operators.expectations import (
    assert_expectations,
    check_expectations,
    combined_violation_filter,
    rule_between,
    rule_in_set,
    rule_matches,
    rule_not_null,
    rule_predicate,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a@x.io", 10.0, "gold"),
        (2, None, -5.0, "gold"),        # null email, negative amount
        (3, "bad-email", 20.0, "blue"), # bad format, bad tier
        (3, "c@x.io", 30.0, "silver"),  # duplicate id
        (4, "d@x.io", None, "gold"),    # null amount passes between()
    ]
    return spark.createDataFrame(
        rows, "id long, email string, amount double, tier string"
    )


def _rules():
    # built lazily: Column construction needs an active SparkSession
    return [
        rule_not_null("email"),
        rule_between("amount", 0.0, 100.0),
        rule_in_set("tier", ["gold", "silver", "bronze"]),
        rule_matches("email", r"^[^@]+@[^@]+$"),
        rule_predicate("amount_gt_id", F.col("amount") > F.col("id")),
    ]


def test_report_counts_each_rule(messy):
    rep = {
        r.rule: (r.violations, r.total, r["pass"])
        for r in check_expectations(messy, _rules(), unique_keys=[["id"]]).collect()
    }
    assert rep["not_null(email)"] == (1, 5, False)
    assert rep["between(amount,0.0,100.0)"] == (1, 5, False)
    assert rep["in_set(tier)"] == (1, 5, False)
    assert rep["matches(email)"] == (1, 5, False)
    # NULL amount and amount<=id are both violations of the predicate
    assert rep["amount_gt_id"][0] == 2
    assert rep["unique(id)"] == (1, 5, False)


def test_clean_table_passes_and_assert_returns_input(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    rules = [
        rule_not_null("n_nationkey"),
        rule_between("n_regionkey", 0, 10),
    ]
    out = assert_expectations(nation, rules, unique_keys=[["n_nationkey"]])
    assert out is nation  # passes through unchanged, stage-composable


def test_assert_raises_with_all_violations_listed(messy):
    with pytest.raises(ValueError) as exc:
        assert_expectations(messy, _rules(), unique_keys=[["id"]])
    msg = str(exc.value)
    assert "not_null(email): 1/5" in msg and "unique(id): 1/5" in msg


def test_quarantine_split_partitions_rows(messy):
    bad_filter = combined_violation_filter(_rules())
    bad = messy.filter(bad_filter)
    good = messy.filter(~bad_filter)
    assert bad.count() + good.count() == messy.count()
    # rows 1 and the second id-3 row pass every ROW-LEVEL rule
    # (uniqueness is key-level, not part of the quarantine filter)
    assert sorted(r.email for r in good.collect()) == ["a@x.io", "c@x.io"]


def test_referential_integrity(spark, sf_dir):
    from amadou_spark.operators.expectations import check_referential

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    ok = check_referential(nation, "n_regionkey", region, "r_regionkey").collect()[0]
    assert ok["pass"] and ok.violations == 0
    # drop a region → its nations become orphans
    partial = region.filter(F.col("r_regionkey") != 0)
    bad = check_referential(nation, "n_regionkey", partial, "r_regionkey").collect()[0]
    assert not bad["pass"] and bad.violations > 0


def test_single_scan_for_row_rules(messy):
    """All row-level rules compile into one aggregate over one scan —
    the report query's plan contains exactly one table scan."""
    from amadou_spark.operators.expectations import Expectation  # noqa: F401

    agg = messy.agg(
        F.count(F.lit(1)).alias("t"),
        *[F.sum(r.violated.cast("long")).alias(f"v{i}") for i, r in enumerate(_rules())],
    )
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") + plan.count("Relation") == 1
