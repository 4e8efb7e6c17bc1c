"""Execution metrics (reference: SparkRunner.scala:165-216 — Prometheus
counters fed by a SparkListener accumulating bytes/records per task).

PySpark has no first-class listener API, so the collector reads the
same numbers one layer down: the JVM's AppStatusListener already
accumulates every ``onTaskEnd``'s taskMetrics into AppStatusStore, and
:meth:`MetricsCollector.io_totals` sums the per-stage input/output/
shuffle bytes and records from that store over py4j — the same values
the reference's listener increments its Prometheus counters with
(SparkRunner.scala:207-216), without a cross-language callback server.
Job/stage counts come from ``sc.statusTracker()``; wall-clock durations
are stamped by the Stage context. `prometheus_client` is optional
(import-gated) — when present, gauges mirror every snapshot; when
absent, snapshots still flow to the monitoring topic.
"""

from __future__ import annotations

import logging
from typing import Any

from amadou_spark.monitoring.events import MetricsEvent

logger = logging.getLogger(__name__)

try:  # optional dependency — not in the test image
    from prometheus_client import Gauge  # type: ignore[import-not-found]

    _HAVE_PROM = True
except ImportError:
    _HAVE_PROM = False


class MetricsCollector:
    def __init__(self, spark: Any):
        self.spark = spark
        self._gauges: dict[str, Any] = {}

    def snapshot(self) -> dict[str, float]:
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(None) or []
        n_active = len(tracker.getActiveJobsIds() or [])
        n_stages = len(tracker.getActiveStageIds() or [])
        metrics: dict[str, float] = {
            "jobs_total": float(len(job_ids)),
            "jobs_active": float(n_active),
            "stages_active": float(n_stages),
            "default_parallelism": float(sc.defaultParallelism),
        }
        metrics.update(self.io_totals())
        return metrics

    def io_totals(self) -> dict[str, float]:
        """Bytes/records read+written, accumulated per task by the JVM's
        AppStatusListener (onTaskEnd → taskMetrics) and summed across
        all stages of this application — parity with the reference's
        spark_bytes_read / spark_records_read / spark_records_written
        counters (SparkRunner.scala:202-216)."""
        sc = self.spark.sparkContext
        try:
            jvm, gw = sc._jvm, sc._gateway
            store = sc._jsc.sc().statusStore()
            stages = store.stageList(
                jvm.java.util.ArrayList(),  # all statuses
                False,  # details
                False,  # withSummaries
                gw.new_array(jvm.double, 0),  # unsortedQuantiles
                jvm.java.util.ArrayList(),  # all task statuses
            )
            fields = {
                "bytes_read": "inputBytes",
                "records_read": "inputRecords",
                "bytes_written": "outputBytes",
                "records_written": "outputRecords",
                "shuffle_bytes_read": "shuffleReadBytes",
                "shuffle_bytes_written": "shuffleWriteBytes",
            }
            totals = dict.fromkeys(fields, 0.0)
            for i in range(stages.size()):
                stage = stages.apply(i)
                for out_key, getter in fields.items():
                    totals[out_key] += float(getattr(stage, getter)())
            return totals
        except Exception:  # internal JVM surface — degrade, don't fail jobs
            logger.warning("AppStatusStore metrics unavailable", exc_info=True)
            return {}

    def publish_snapshot(self, ctx: Any, stage: str = "") -> dict[str, float]:
        metrics = self.snapshot()
        if _HAVE_PROM:  # pragma: no cover
            for key, value in metrics.items():
                gauge = self._gauges.get(key)
                if gauge is None:
                    gauge = Gauge(f"amadou_{key}", f"amadou_spark {key}")
                    self._gauges[key] = gauge
                gauge.set(value)
        ctx.messaging.publish(MetricsEvent.snapshot(ctx, stage, metrics))
        return metrics


def observed(df: Any, name: str, **metrics: Any) -> tuple[Any, Any]:
    """Attach inline row-level counters to a DataFrame via Spark's
    Observation API — the idiomatic replacement for the reference's
    per-job record counters when you want PER-QUERY numbers rather
    than application totals (io_totals): the metrics are computed by
    the running query itself, cost no extra pass, and arrive on the
    driver when the first action completes.

    >>> from pyspark.sql import functions as F  # doctest: +SKIP
    >>> df2, obs = observed(df, "etl", n=F.count(F.lit(1)),
    ...                     nulls=F.count_if(F.col("x").isNull()))
    >>> df2.write.parquet(path); obs.get  # doctest: +SKIP
    {'n': 1000, 'nulls': 3}

    Returns (instrumented_df, Observation); read ``obs.get`` AFTER an
    action has run."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *(v.alias(k) for k, v in metrics.items())), obs
