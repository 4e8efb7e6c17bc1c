"""Spark-vs-DuckDB OUTPUT TYPE parity for registered oracles.

The local oracle gate (:mod:`amadou_spark.oracle`) compares Python
values from ``.collect()``/``.fetchall()``, which erases type tags:
DuckDB HUGEINT (int128 from SUM/arithmetic over integers), DECIMAL and
unsigned types all arrive as plain Python ints/Decimals and compare
equal to Spark's BIGINT/DOUBLE. The driver's hash, however, is computed
over the serialized values WITH their types — exactly how
``q69_skew_profile`` passed locally but failed the round-2 driver row,
and how ``q131_kaplan_meier``/``q151_hazard_rate`` stayed red through
rounds 5–6 (DuckDB promotes ``BIGINT - SUM(BIGINT) OVER`` to HUGEINT =
``decimal128(38,0)`` at the Arrow layer, vs Spark's ``bigint``).

This module compares the ARROW-level schema of both results. Any pair
outside the known-equivalent set is a latent driver hash mismatch: fix
it with explicit CASTs on BOTH sides (the repo convention).

``tools/typeaudit.py`` is the CLI; ``tests/test_typeaudit.py`` runs the
same check registry-wide so the class is structurally impossible to
reintroduce (VERDICT r6 'Next round' #2).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import SparkSession

from amadou_spark.queries import REGISTRY, _load

# (spark simpleString, duckdb/arrow type str) pairs that hash the same
# on the driver (same arrow logical type after its normalization).
OK_PAIRS = {
    ("bigint", "int64"),
    ("int", "int32"),
    # int32-vs-int64 width differences hash equal on the driver —
    # empirical: llm_embedding_quantize and q64_histogram both carry
    # one and both have green hash_match rows in CORRECTNESS_r02.json.
    # The dangerous divergences are the ones that change the PYTHON
    # value class (HUGEINT/DECIMAL -> Decimal/float), not the width.
    ("int", "int64"),
    ("double", "double"),
    ("float", "float"),
    ("string", "large_string"),
    ("string", "string"),
    ("boolean", "bool"),
    ("date", "date32[day]"),
    ("timestamp", "timestamp[us]"),
    ("timestamp_ntz", "timestamp[us]"),
}


def spark_arrow_types(sdf) -> dict[str, str]:
    """Column -> Spark simpleString. Driver-side analysis only (lazy)."""
    return {f.name: f.dataType.simpleString() for f in sdf.schema.fields}


def duck_arrow_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> dict[str, str]:
    """Column -> Arrow type string, as the driver's hasher sees it."""
    tbl = con.execute(sql).arrow()
    return {f.name: str(f.type) for f in tbl.schema}


def column_flags(st: dict[str, str], dt: dict[str, str]) -> list[str]:
    """Human-readable flag per column whose (spark, duckdb-arrow) type
    pair is outside :data:`OK_PAIRS`."""
    flags = []
    for col in sorted(set(st) | set(dt)):
        s, d = st.get(col, "<missing>"), dt.get(col, "<missing>")
        base_ok = (s, d) in OK_PAIRS
        # arrays: compare element types through the same table
        if s.startswith("array<") and d.startswith(("list<", "large_list<")):
            se = s[6:-1]
            de = d.split("<", 1)[1][:-1].replace("item: ", "")
            base_ok = (se, de) in OK_PAIRS
        if not base_ok:
            flags.append(f"{col}: spark={s} duckdb={d}")
    return flags


def audit_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
) -> list[str]:
    """Flags for one registered query; empty list = type-parity green.

    Queries without an oracle have no driver hash to diverge from and
    return no flags.
    """
    _load()
    q = REGISTRY[name]
    if q.oracle is None:
        return []
    st = spark_arrow_types(q.fn(spark, sf_dir))
    dt = duck_arrow_types(con, q.oracle)
    return column_flags(st, dt)
