"""Benchmark harness: run the declared-query suite and print ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores → local[*]).

Output: {"metric": "suite_wall_clock", "value": <total-sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>, "conf": {...}}

Each query is forced with a count() action (materializes the full plan
without driver-side row transfer). A warmup query amortizes session/JIT
startup out of the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amadou_spark.queries import REGISTRY, _load  # noqa: E402
from amadou_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("amadou-bench")
    _load()

    # warmup: JVM + parquet footer caches
    REGISTRY["q01_scan_projection"].fn(spark, sf_dir).count()

    def cleanup() -> None:
        """Release leftovers so one query's debris (streaming memory-sink
        tables, cached relations) can't degrade the next measurement."""
        for table in spark.catalog.listTables():
            if table.name.startswith("amadou_stream_"):
                spark.catalog.dropTempView(table.name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        started = time.perf_counter()
        fn(spark, sf_dir).count()
        elapsed = time.perf_counter() - started
        timings[name] = round(elapsed, 3)
        cleanup()

    # headline metric = the declared benchmark set (BASELINE.md): SURVEY
    # §2.2 Tier A (Q01-Q30). Tier B / LLM / extension timings are still
    # reported per-query and summed in value_all.
    tier_a = {k: v for k, v in timings.items() if k.startswith("q") and k[1:3].isdigit() and int(k[1:3]) <= 30}
    total = sum(tier_a.values())
    total_all = sum(timings.values())

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    conf = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.master",
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.driver.memory",
        )
    }
    print(
        json.dumps(
            {
                "metric": "tier_a_suite_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "conf": conf,
                "value_all": round(total_all, 3),
                "n_queries": len(timings),
                "n_tier_a": len(tier_a),
            }
        )
    )


if __name__ == "__main__":
    main()
