"""Partition-order determinism audit (driver-hash flakiness hunter).

The oracle gate proves Spark == DuckDB for ONE execution. But the
driver's value hash is also sensitive to Spark vs Spark variation: a
float aggregate whose merge order depends on the partition layout can
straddle a rounding boundary under a different
``spark.sql.shuffle.partitions`` / AQE plan and flip a rounded cell —
a query that passes locally and fails (or flakes) on the driver.

This tool executes every audited query under two deliberately
different layouts in the same session —

- layout A: the engine defaults (shuffle.partitions=32, AQE on), and
- layout B: shuffle.partitions=7 with AQE coalescing disabled (odd
  partition count => different partial-agg merge trees and different
  window/exchange boundaries)

— and compares the SIGN-SENSITIVE canonical value multisets (the same
canonicalization as the oracle gate, keeping -0.0 distinct the way the
driver's hash does). A mismatch is a latent flaky driver row: fix by
tightening the engine-stability armor (floor-half-up at a coarser
precision, exact-integer sums, pre-rounding before comparisons).

Usage: python tools/determinism.py [sf_dir] [query ...]
       (default: every registered query at sf0.01)

Writes DETERMINISM.json {query: {"ok": bool, "detail": str}} and exits
nonzero on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amadou_spark.oracle import _canon  # noqa: E402
from amadou_spark.queries import REGISTRY, _load  # noqa: E402
from amadou_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (conf key, layout A value, layout B value) — B forces a different
#: shuffle fan-in and disables runtime coalescing so partial-aggregate
#: merge trees genuinely differ.
_PERTURB = [
    ("spark.sql.shuffle.partitions", "32", "7"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true", "false"),
]


def _multiset(df) -> list:
    cols = df.columns
    ix = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i], signed=True) for i in ix) for r in df.collect()),
        key=repr,
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or None

    spark = get_spark("determinism-audit")
    _load()
    results: dict[str, dict] = {}
    n_bad = 0
    for name in names or sorted(REGISTRY):
        fn = REGISTRY[name].fn
        try:
            for key, a, _ in _PERTURB:
                spark.conf.set(key, a)
            ma = _multiset(fn(spark, sf_dir))
            for key, _, b in _PERTURB:
                spark.conf.set(key, b)
            mb = _multiset(fn(spark, sf_dir))
        except Exception as exc:
            results[name] = {"ok": False, "detail": f"EXCEPTION: {exc}"[:300]}
            n_bad += 1
            print(f"[ERR ] {name}: {exc}", flush=True)
            continue
        finally:
            for key, a, _ in _PERTURB:
                spark.conf.set(key, a)
        if ma == mb:
            results[name] = {"ok": True, "detail": ""}
            print(f"[ OK ] {name}", flush=True)
        else:
            first = next(
                (i for i, (x, y) in enumerate(zip(ma, mb)) if x != y), -1
            )
            detail = (
                f"layout-dependent output: {sum(1 for x, y in zip(ma, mb) if x != y)}"
                f"/{len(ma)} rows differ (lenA={len(ma)} lenB={len(mb)}); "
                f"first diff @{first}: A={ma[first] if first >= 0 else None} "
                f"B={mb[first] if first >= 0 else None}"
            )
            results[name] = {"ok": False, "detail": detail[:500]}
            n_bad += 1
            print(f"[FAIL] {name}: {detail[:200]}", flush=True)

    # a subset run refreshes its rows INSIDE the full artifact rather
    # than clobbering the registry-wide audit record
    merged = results
    artifact = os.path.join(REPO, "DETERMINISM.json")
    if names and os.path.exists(artifact):
        with open(artifact) as f:
            prior = json.load(f).get("queries", {})
        prior.update(results)
        merged = prior
    out = {
        "audit": "same-session double execution under perturbed "
        "shuffle layout (partitions 32+AQE-coalesce vs 7, no coalesce); "
        "sign-sensitive canonical multiset compare",
        "sf_dir": sf_dir,
        "n_ok": sum(1 for v in merged.values() if v.get("ok")),
        "n_audited": len(merged),
        "queries": merged,
    }
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{len(results) - n_bad}/{len(results)} deterministic")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
