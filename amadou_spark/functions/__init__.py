"""Column-level helper functions.

The only scalar operators the reference defines itself (SURVEY §2.1):
``Column.isDefined`` and ``Column.nullify``
(core/.../package.scala:67-79, behavior specs ImplicitsSpec.scala:28-84).
Everything else is `pyspark.sql.functions` — JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_defined(c: Column) -> Column:
    """True when the column is not NULL, not '', and not the literal
    string 'null'. Reference: core/.../package.scala:67-68."""
    return c.isNotNull() & (c != "") & (c != "null")


def nullify(c: Column) -> Column:
    """Map the literal string 'null' to NULL; preserve '' and all other
    values. Reference: core/.../package.scala:78-79."""
    return F.when(c == "null", F.lit(None)).otherwise(c)
