"""CLI: audit Spark-vs-DuckDB OUTPUT TYPE parity for registered oracles.

Core logic lives in :mod:`amadou_spark.typeparity` (also enforced
registry-wide by ``tests/test_typeaudit.py``); this is the thin CLI the
verify recipe references.

Usage: python tools/typeaudit.py [sf_dir] [query ...]   (default: all
with oracles, sf0.001 — types don't depend on scale)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from amadou_spark.oracle import duckdb_connection  # noqa: E402
from amadou_spark.queries import REGISTRY, _load  # noqa: E402
from amadou_spark.session import get_spark  # noqa: E402
from amadou_spark.typeparity import audit_query  # noqa: E402


def audit(names: list[str], sf_dir: str) -> int:
    spark = get_spark("type-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    n_flag = 0
    for name in names:
        try:
            flags = audit_query(spark, con, name, sf_dir)
        except Exception as exc:  # surface, keep auditing
            print(f"[ERR ] {name}: {exc}")
            n_flag += 1
            continue
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
