"""Declarative data-quality expectations, evaluated in ONE pass.

The reference's pipelines gate stages on schema contracts
(``core/.../Schema.scala`` asserts StructType equality in tests); the
row-level complement is an expectations check: not-null rates, value
ranges, set membership, uniqueness, row-level predicates. This module
evaluates a whole rule list as conditional aggregates in a single scan
— no per-rule jobs, no shuffle except uniqueness (which needs one
by definition, over the checked key only).

Scale design: N non-uniqueness rules compile to one ``agg`` over one
scan (map-side partial aggregation, a 1-row result); each uniqueness
rule adds one hash-shuffle over its key columns ONLY (fixed-width,
payload never moves). Results come back as a tidy (rule, violations,
total, pass) table so callers can warn, fail, or write an audit row.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name`` for reporting, ``violated`` a boolean Column
    that is true on BAD rows. Build via the rule_* helpers or supply
    any row-level predicate."""

    name: str
    violated: Column


def rule_not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNull())


def rule_between(col: str, lo, hi) -> Expectation:
    """Closed-range check; NULL passes (combine with rule_not_null)."""
    c = F.col(col)
    return Expectation(
        f"between({col},{lo},{hi})", c.isNotNull() & ~c.between(lo, hi)
    )


def rule_in_set(col: str, allowed) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"in_set({col})", c.isNotNull() & ~c.isin(list(allowed))
    )


def rule_matches(col: str, regex: str) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"matches({col})", c.isNotNull() & ~c.rlike(regex)
    )


def rule_predicate(name: str, good: Column) -> Expectation:
    """Custom row-level rule from a GOOD-row predicate; NULL counts as
    a violation (ANSI three-valued logic made explicit)."""
    return Expectation(name, ~F.coalesce(good, F.lit(False)))


def check_expectations(
    df: DataFrame,
    rules: list[Expectation],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Evaluate all rules; returns (rule, violations, total, pass).

    Row-level rules cost ONE scan total. Each entry of ``unique_keys``
    (a list of column lists) adds a uniqueness check costing one
    shuffle over those columns: violations = rows beyond the first per
    duplicate key (the number of rows a dedup would drop).
    """
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(r.violated.cast("long")).alias(f"_v{i}")
        for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs).collect()[0]
    total = row["_total"]
    results = [
        (r.name, int(row[f"_v{i}"] or 0), total) for i, r in enumerate(rules)
    ]
    for cols in unique_keys or []:
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("_dups")
            )
            .collect()[0]["_dups"]
        )
        results.append((f"unique({','.join(cols)})", int(dup), total))
    out = spark.createDataFrame(
        [(n, v, t, v == 0) for n, v, t in results],
        "rule string, violations long, total long, pass boolean",
    )
    return out


def assert_expectations(
    df: DataFrame,
    rules: list[Expectation],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Fail-fast variant: raises with every violated rule listed, else
    returns ``df`` unchanged (stage-compose like the reference's sinks
    pass their input through)."""
    report = check_expectations(df, rules, unique_keys).collect()
    bad = [r for r in report if not r["pass"]]
    if bad:
        lines = ", ".join(
            f"{r['rule']}: {r['violations']}/{r['total']}" for r in bad
        )
        raise ValueError(f"expectations violated — {lines}")
    return df


def check_referential(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """Foreign-key expectation: rows of ``df`` whose ``col`` has no
    match in ``dim.dim_col`` (NULLs pass — compose with rule_not_null).
    One left-anti join on the key columns only (fixed-width shuffle;
    AQE broadcasts the dim side when it fits). Returns the same
    (rule, violations, total, pass) shape as check_expectations."""
    spark = df.sparkSession
    total = df.count()
    orphans = (
        df.select(F.col(col)).filter(F.col(col).isNotNull())
        .join(
            dim.select(F.col(dim_col).alias(col)).distinct(),
            on=col,
            how="left_anti",
        )
        .count()
    )
    return spark.createDataFrame(
        [(f"references({col}->{dim_col})", orphans, total, orphans == 0)],
        "rule string, violations long, total long, pass boolean",
    )


def combined_violation_filter(rules: list[Expectation]) -> Column:
    """Row-level OR of every rule — quarantine-split helper:
    ``bad = df.filter(combined); good = df.filter(~combined)``."""
    return reduce(Column.__or__, (r.violated for r in rules))
