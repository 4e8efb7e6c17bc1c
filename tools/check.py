"""CLI: run the local oracle-correctness gate.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from amadou_spark.oracle import check_all
from amadou_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or None
    spark = get_spark("oracle-check")
    results = check_all(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"[{mark}] {r.name}  (spark={r.spark_rows} oracle={r.oracle_rows})")
        if not r.ok:
            print(f"       {r.detail}")
    print(f"\n{n_ok}/{len(results)} green")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
