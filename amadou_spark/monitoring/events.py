"""Lifecycle event records (reference: core/.../monitoring/Events.scala:27-55).

Event states: Starting / Complete / Retrying / Failed, published per
run ("jobs" topic), per stage ("stages"), and per metrics snapshot
("metrics")."""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass, field
from typing import Any


def _now_ms() -> int:
    return int(time.time() * 1000)


@dataclass(frozen=True)
class Event:
    job_name: str
    process_id: str
    date: str
    state: str
    timestamp_ms: int
    detail: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass(frozen=True)
class RunEvent(Event):
    topic: str = "jobs"

    @classmethod
    def _make(cls, ctx: Any, state: str, **detail: Any) -> "RunEvent":
        return cls(ctx.job_name, ctx.process_id, str(ctx.date), state, _now_ms(), detail)

    @classmethod
    def starting(cls, ctx: Any) -> "RunEvent":
        return cls._make(ctx, "starting")

    @classmethod
    def complete(cls, ctx: Any, duration_s: float) -> "RunEvent":
        return cls._make(ctx, "complete", duration_s=round(duration_s, 3))

    @classmethod
    def failed(cls, ctx: Any, exc: Exception) -> "RunEvent":
        return cls._make(ctx, "failed", error=repr(exc))


@dataclass(frozen=True)
class StageEvent(Event):
    stage: str = ""
    topic: str = "stages"

    @classmethod
    def _make(cls, ctx: Any, stage: str, state: str, **detail: Any) -> "StageEvent":
        return cls(
            ctx.job_name, ctx.process_id, str(ctx.date), state, _now_ms(), detail, stage
        )

    @classmethod
    def starting(cls, ctx: Any, stage: str) -> "StageEvent":
        return cls._make(ctx, stage, "starting")

    @classmethod
    def complete(cls, ctx: Any, stage: str, duration_s: float) -> "StageEvent":
        return cls._make(ctx, stage, "complete", duration_s=round(duration_s, 3))

    @classmethod
    def retrying(cls, ctx: Any, stage: str, attempt: int, exc: Exception) -> "StageEvent":
        return cls._make(ctx, stage, "retrying", attempt=attempt, error=repr(exc))

    @classmethod
    def failed(cls, ctx: Any, stage: str, exc: Exception) -> "StageEvent":
        return cls._make(ctx, stage, "failed", error=repr(exc))


@dataclass(frozen=True)
class MetricsEvent(Event):
    stage: str = ""
    metrics: dict[str, float] = field(default_factory=dict)
    topic: str = "metrics"

    @classmethod
    def snapshot(cls, ctx: Any, stage: str, metrics: dict[str, float]) -> "MetricsEvent":
        return cls(
            ctx.job_name,
            ctx.process_id,
            str(ctx.date),
            "metrics",
            _now_ms(),
            {},
            stage,
            metrics,
        )
