"""The t2 correctness gate, locally: every registered query with an
oracle must match DuckDB exactly (row count, columns, value multiset)
at sf0.001. The driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from amadou_spark.oracle import check_all, duckdb_connection, check_query
from amadou_spark.queries import REGISTRY, _load

_load()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    result = check_query(spark, con, name, sf_dir)
    assert result.ok, f"{name}: {result.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
