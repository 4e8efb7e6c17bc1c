"""Column helper behavior tests — the reference's ImplicitsSpec fixture
(core/src/test/scala/com.mediative.amadou/ImplicitsSpec.scala:22-84):
6 canonical externalId values; is_defined keeps exactly the real ones,
nullify maps only the literal 'null' string to NULL and preserves ''."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadou_spark.functions import is_defined, nullify

ACCOUNTS = [
    (1, "a", ""),
    (2, "b", "00000000001"),
    (3, "c", "null"),
    (4, "d", "Not null"),
    (5, "e", None),
    (6, "f", "00000000002"),
]


def _df(spark):
    return spark.createDataFrame(ACCOUNTS, "id INT, name STRING, externalId STRING")


def test_is_defined_filters_empty_null_string_and_null(spark):
    kept = (
        _df(spark)
        .filter(is_defined(F.col("externalId")))
        .select("id")
        .orderBy("id")
        .collect()
    )
    assert [r.id for r in kept] == [2, 4, 6]


def test_nullify_maps_only_literal_null_preserving_empty(spark):
    rows = (
        _df(spark)
        .select("id", nullify(F.col("externalId")).alias("ext"))
        .orderBy("id")
        .collect()
    )
    assert [r.ext for r in rows] == ["", "00000000001", None, "Not null", None, "00000000002"]
