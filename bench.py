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

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        started = time.perf_counter()
        fn(spark, sf_dir).count()
        elapsed = time.perf_counter() - started
        timings[name] = round(elapsed, 3)
        total += elapsed

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
                "metric": "suite_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "conf": conf,
            }
        )
    )


if __name__ == "__main__":
    main()
