from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession (the reference's SparkJobSuiteBase
    pattern: one session per suite, SparkJobSuiteBase.scala:29-49)."""
    from amadou_spark.session import get_spark

    spark = get_spark("amadou-tests", conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
