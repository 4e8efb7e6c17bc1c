"""Audit Spark-vs-DuckDB OUTPUT TYPE parity for registered oracles.

The local oracle gate (amadou_spark/oracle.py) compares Python values
from `.collect()`/`.fetchall()`, which erases type tags: DuckDB HUGEINT
(int128 from SUM over integers), DECIMAL, and unsigned types all arrive
as plain Python ints/Decimals and compare equal to Spark's BIGINT/
DOUBLE. The driver's hash, however, is computed over the serialized
values WITH their types — this is exactly how q69_skew_profile passed
locally but failed the round-2 driver row.

This tool runs each query's Spark side and oracle side and compares the
ARROW-level schema of both results after sorting columns by name. Any
pair outside the known-equivalent set is a latent driver hash mismatch:
fix it with explicit CASTs on BOTH sides (the repo convention).

Usage: python tools/typeaudit.py [sf_dir] [query ...]   (default: all
with oracles, sf0.001 — types don't depend on scale)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from amadou_spark.oracle import duckdb_connection  # noqa: E402
from amadou_spark.queries import REGISTRY, _load  # noqa: E402
from amadou_spark.session import get_spark  # noqa: E402

# (spark simpleString, duckdb/arrow type str) pairs that hash the same
# on the driver (same arrow logical type after its normalization).
_OK = {
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


def _spark_arrow_types(sdf) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in sdf.schema.fields}


def _duck_arrow_types(con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, str]:
    tbl = con.execute(sql).arrow()
    return {f.name: str(f.type) for f in tbl.schema}


def audit(names: list[str], sf_dir: str) -> int:
    spark = get_spark("type-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    n_flag = 0
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        try:
            st = _spark_arrow_types(q.fn(spark, sf_dir))
            dt = _duck_arrow_types(con, q.oracle)
        except Exception as exc:  # surface, keep auditing
            print(f"[ERR ] {name}: {exc}")
            n_flag += 1
            continue
        flags = []
        for col in sorted(set(st) | set(dt)):
            s, d = st.get(col, "<missing>"), dt.get(col, "<missing>")
            base_ok = (s, d) in _OK
            # arrays: compare element types through the same table
            if s.startswith("array<") and d.startswith(("list<", "large_list<")):
                se = s[6:-1]
                de = d.split("<", 1)[1][:-1].replace("item: ", "")
                base_ok = (se, de) in _OK
            if not base_ok:
                flags.append(f"{col}: spark={s} duckdb={d}")
        if flags:
            n_flag += 1
            print(f"[FLAG] {name}")
            for f in flags:
                print(f"       {f}")
    print(f"\n{n_flag} queries flagged of {len(names)} audited")
    return 0 if n_flag == 0 else 1


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    _load()
    names = [a for a in args if "/" not in a] or sorted(REGISTRY)
    return audit(names, sf_dir)


if __name__ == "__main__":
    raise SystemExit(main())
