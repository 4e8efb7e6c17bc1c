"""Stage pipeline algebra (SURVEY §2.1, M2).

Re-derivation of the reference's ``Stage[I, T]`` combinators
(core/.../Stage.scala:22-138): a named, retryable, monitored unit of
work composed monadically. Spark laziness lives *inside* a stage —
stage composition itself is eager and sequential, matching the
reference (no stage-level DAG parallelism; at 100 TB the parallelism
comes from within-stage Spark execution, not stage fan-out).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field, replace
from typing import Any, Generic, TypeVar

from amadou_spark.dates import DateInterval
from amadou_spark.monitoring.events import StageEvent
from amadou_spark.monitoring.messaging import MessagingSystem, PrintMessagingSystem

I = TypeVar("I")
T = TypeVar("T")
U = TypeVar("U")


class SequenceAllError(Exception):
    """Aggregated failures from Stage.sequence_all
    (reference: SequenceAllException, Stage.scala:99-107)."""

    def __init__(self, failures: list[tuple[str, Exception]]):
        self.failures = failures
        detail = "\n".join(f"  - {name}: {exc!r}" for name, exc in failures)
        super().__init__(f"{len(failures)} stage(s) failed:\n{detail}")


@dataclass
class RetryPolicy:
    """Fixed-delay retry (reference defaults: retry.max=3, retry.delay=20min,
    core/src/main/resources/reference.conf:5-13; tests pin max=1)."""

    max_attempts: int = 3
    delay_seconds: float = 0.0


@dataclass
class Context(Generic[I]):
    """Carries (spark, date, value) through the pipeline
    (reference: Stage.Context, Stage.scala:45-48)."""

    spark: Any
    date: DateInterval
    value: I = None  # type: ignore[assignment]
    job_name: str = "job"
    process_id: str = ""
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    messaging: MessagingSystem = field(default_factory=PrintMessagingSystem)
    _clock: Callable[[], float] = time.time
    _sleep: Callable[[float], None] = time.sleep

    def with_value(self, value: U) -> "Context[U]":
        return replace(self, value=value)  # type: ignore[return-value]

    def run(self, stage: "Stage[I, T]", thunk: Callable[["Context[I]"], T]) -> T:
        """Per-stage instrumentation + retry (SparkRunner.scala:129-158):
        publish starting → evaluate → complete(duration) | retry → failed."""
        attempts = 0
        started = self._clock()
        self.messaging.publish_stage(StageEvent.starting(self, stage.name))
        while True:
            attempts += 1
            try:
                result = thunk(self)
            except Exception as exc:
                if attempts < self.retry.max_attempts:
                    self.messaging.publish_stage(
                        StageEvent.retrying(self, stage.name, attempts, exc)
                    )
                    if self.retry.delay_seconds:
                        self._sleep(self.retry.delay_seconds)
                    continue
                self.messaging.publish_stage(StageEvent.failed(self, stage.name, exc))
                raise
            duration = self._clock() - started
            self.messaging.publish_stage(StageEvent.complete(self, stage.name, duration))
            return result


@dataclass(frozen=True)
class Stage(Generic[I, T]):
    """A named function Context[I] → T with monadic composition."""

    name: str
    body: Callable[[Context[I]], T]
    instrumented: bool = True

    def __call__(self, ctx: Context[I]) -> T:
        if self.instrumented:
            return ctx.run(self, self.body)
        return self.body(ctx)

    run = __call__

    # -- combinators (Stage.scala:25-37) -------------------------------

    def map(self, fn: Callable[[T], U]) -> "Stage[I, U]":
        """Post-transform output; no new stage name / retry scope."""
        return Stage(self.name, lambda ctx: fn(self(ctx)), instrumented=False)

    def flat_map(self, fn: Callable[[T], "Stage[T, U]"]) -> "Stage[I, U]":
        def body(ctx: Context[I]) -> U:
            value = self(ctx)
            nxt = fn(value)
            return nxt(ctx.with_value(value))

        return Stage(self.name, body, instrumented=False)

    def and_then(self, nxt: "Stage[T, U]") -> "Stage[I, U]":
        return self.flat_map(lambda _: nxt)

    def __rshift__(self, nxt: "Stage[T, U]") -> "Stage[I, U]":
        """`a >> b` — the reference's `~>` (Stage.scala:36-37)."""
        return self.and_then(nxt)

    # -- constructors (Stage.scala:60-97, 113-138) ----------------------

    @staticmethod
    def of(name: str, fn: Callable[[Context[I]], T]) -> "Stage[I, T]":
        return Stage(name, fn)

    @staticmethod
    def identity() -> "Stage[T, T]":
        return Stage("identity", lambda ctx: ctx.value, instrumented=False)

    @staticmethod
    def sequence(stages: Sequence["Stage[I, T]"]) -> "Stage[I, list[T]]":
        """Run all in order, fail-fast on first failure (Stage.scala:81-97)."""

        def body(ctx: Context[I]) -> list[T]:
            return [stage(ctx) for stage in stages]

        return Stage("sequence", body, instrumented=False)

    @staticmethod
    def sequence_all(stages: Sequence["Stage[I, T]"]) -> "Stage[I, list[T]]":
        """Run ALL even after failures; aggregate into SequenceAllError
        (Stage.scala:113-126)."""

        def body(ctx: Context[I]) -> list[T]:
            results: list[T] = []
            failures: list[tuple[str, Exception]] = []
            for stage in stages:
                try:
                    results.append(stage(ctx))
                except Exception as exc:
                    failures.append((stage.name, exc))
            if failures:
                raise SequenceAllError(failures)
            return results

        return Stage("sequence_all", body, instrumented=False)


# -- typed constructors (Stage.scala:70-79) -----------------------------

def source(name: str) -> Callable[[Callable[[Context[Any]], T]], Stage[Any, T]]:
    """Entry stage: SparkSession → DataFrame. Usage:
    ``@source("ReadRaw")`` on a fn(ctx) -> DataFrame."""

    def deco(fn: Callable[[Context[Any]], T]) -> Stage[Any, T]:
        return Stage(name, fn)

    return deco


def transform(name: str) -> Callable[[Callable[[Context[T]], U]], Stage[T, U]]:
    """DataFrame → DataFrame stage; the input flows in as ctx.value."""

    def deco(fn: Callable[[Context[T]], U]) -> Stage[T, U]:
        return Stage(name, fn)

    return deco


def sink(name: str) -> Callable[[Callable[[Context[T]], Any]], Stage[T, T]]:
    """Terminal write; passes its input value onward unchanged
    (Stage.scala:78-79)."""

    def deco(fn: Callable[[Context[T]], Any]) -> Stage[T, T]:
        def body(ctx: Context[T]) -> T:
            fn(ctx)
            return ctx.value

        return Stage(name, body)

    return deco
