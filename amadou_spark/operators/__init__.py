"""Custom relational operators Spark lacks natively (SURVEY §4.3.2):
as-of joins, pivot/unpivot helpers. Implemented per the preference
order: (a) composition of built-in DataFrame ops; (b) Pandas-UDF-backed
applyInPandas where composition can't express the semantics."""

from amadou_spark.operators.asof import asof_join, asof_join_pandas

__all__ = ["asof_join", "asof_join_pandas"]
