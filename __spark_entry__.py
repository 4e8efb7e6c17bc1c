"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``     — flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``        — every declared query/operator from SURVEY.md §2,
                         registered in ``amadou_spark.queries``.
- ``oracle_sql()``     — DuckDB-equivalent SQL for each SQL-expressible
                         query (same column aliases as the Spark side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amadou_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from amadou_spark.queries import REGISTRY, _load

    _load()
    return REGISTRY["q13_tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver records a weaker rows-only check for those)."""
    return all_oracles()
