"""Focused subset bench for optimization A/B probes.

Mirrors bench.py's methodology exactly — same session factory, same
warmups, same cleanup, count() action, min-of-N over full rounds — but
only for the query names given on the command line, so a before/after
probe of one operator family doesn't pay a full-registry sweep.

Usage: python tools/bench_subset.py [--runs N] [--sf DIR] name [name...]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.

Prints one JSON line {"queries": {name: min_sec}, "samples": {...}}.
This is a measurement tool only; the driver contract lives in bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from amadou_spark.queries import REGISTRY, _load  # noqa: E402
from amadou_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("amadou-bench-subset")
    _load()
    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    REGISTRY["q01_scan_projection"].fn(spark, args.sf).count()

    @pandas_udf("double")
    def _warm(a: pd.Series) -> pd.Series:
        return a.astype(float)

    spark.range(1024).repartition(32).select(_warm(F.col("id"))).count()

    def cleanup() -> None:
        for table in spark.catalog.listTables():
            if table.name.startswith("amadou_stream_"):
                spark.catalog.dropTempView(table.name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.runs):
        for name in args.names:
            fn = REGISTRY[name].fn
            spark.sparkContext.setJobDescription(f"subset:{name}")
            started = time.perf_counter()
            fn(spark, args.sf).count()
            samples[name].append(round(time.perf_counter() - started, 3))
            spark.sparkContext.setJobDescription(None)
            cleanup()
    out = {
        "queries": {n: min(v) for n, v in samples.items()},
        "samples": samples,
        "sum_min": round(sum(min(v) for v in samples.values()), 3),
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
