"""Stage algebra tests — port of the reference's StageSpec semantics
(core/src/test/scala/com.mediative.amadou/StageSpec.scala:27-295):
execution order, map/flatMap laws, fail-fast sequence vs fail-all
sequence_all, identity, retry behavior, event publication order."""

from __future__ import annotations

from datetime import date

import pytest

from amadou_spark.dates import DateInterval
from amadou_spark.monitoring.messaging import RecordingMessagingSystem
from amadou_spark.stage import Context, RetryPolicy, SequenceAllError, Stage, sink, source, transform


def make_ctx(value=None, retry_max=1, delay=0.0):
    return Context(
        spark=None,
        date=DateInterval.day(date(2017, 2, 21)),
        value=value,
        retry=RetryPolicy(max_attempts=retry_max, delay_seconds=delay),
        messaging=RecordingMessagingSystem(),
        _sleep=lambda _: None,
    )


class TestComposition:
    def test_stage_runs_body_with_context(self):
        st = Stage.of("Double", lambda ctx: ctx.value * 2)
        assert st(make_ctx(21)) == 42

    def test_map_transforms_output_without_new_stage_scope(self):
        ctx = make_ctx(21)
        st = Stage.of("Double", lambda c: c.value * 2).map(lambda x: x + 1)
        assert st(ctx) == 43
        # map adds no stage events of its own
        assert ctx.messaging.states() == [("Double", "starting"), ("Double", "complete")]

    def test_flat_map_threads_value(self):
        first = Stage.of("First", lambda c: c.value + 1)
        st = first.flat_map(lambda v: Stage.of("Second", lambda c: (v, c.value * 10)))
        # second stage sees first's output as ctx.value
        assert st(make_ctx(1)) == (2, 20)

    def test_rshift_sequences_ignoring_binding(self):
        ctx = make_ctx(1)
        a = Stage.of("A", lambda c: c.value + 1)
        b = Stage.of("B", lambda c: c.value * 10)
        assert (a >> b)(ctx) == 20  # B sees A's output via ctx.value
        assert [s for s, _ in ctx.messaging.states()] == ["A", "A", "B", "B"]

    def test_identity_passes_value(self):
        assert Stage.identity()(make_ctx("x")) == "x"


class TestSequence:
    def test_sequence_runs_in_order(self):
        order = []

        def mk(name):
            def body(ctx):
                order.append(name)
                return name

            return Stage.of(name, body)

        result = Stage.sequence([mk("a"), mk("b"), mk("c")])(make_ctx())
        assert result == ["a", "b", "c"]
        assert order == ["a", "b", "c"]

    def test_sequence_fail_fast(self):
        order = []

        def ok(name):
            def body(ctx):
                order.append(name)
                return name

            return Stage.of(name, body)

        boom = Stage.of("boom", lambda ctx: 1 / 0)
        with pytest.raises(ZeroDivisionError):
            Stage.sequence([ok("a"), boom, ok("c")])(make_ctx())
        assert order == ["a"]  # c never ran

    def test_sequence_all_runs_everything_and_aggregates(self):
        order = []

        def ok(name):
            def body(ctx):
                order.append(name)
                return name

            return Stage.of(name, body)

        boom1 = Stage.of("boom1", lambda ctx: 1 / 0)
        boom2 = Stage.of("boom2", lambda ctx: [][1])
        with pytest.raises(SequenceAllError) as err:
            Stage.sequence_all([ok("a"), boom1, ok("b"), boom2])(make_ctx())
        assert order == ["a", "b"]  # all non-failing stages ran
        assert [name for name, _ in err.value.failures] == ["boom1", "boom2"]


class TestRetry:
    def test_retries_then_succeeds(self):
        attempts = []

        def flaky(ctx):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("transient")
            return "ok"

        ctx = make_ctx(retry_max=3)
        assert Stage.of("Flaky", flaky)(ctx) == "ok"
        states = [s for _, s in ctx.messaging.states()]
        assert states == ["starting", "retrying", "retrying", "complete"]

    def test_exhausts_retries_and_publishes_failed(self):
        ctx = make_ctx(retry_max=2)
        with pytest.raises(RuntimeError):
            Stage.of("Fail", lambda c: (_ for _ in ()).throw(RuntimeError("x")))(ctx)
        states = [s for _, s in ctx.messaging.states()]
        assert states == ["starting", "retrying", "failed"]

    def test_retry_max_one_means_no_retry(self):
        # tests pin AMADOU_RETRY_MAX=1 in the reference
        ctx = make_ctx(retry_max=1)
        with pytest.raises(RuntimeError):
            Stage.of("Fail", lambda c: (_ for _ in ()).throw(RuntimeError("x")))(ctx)
        assert [s for _, s in ctx.messaging.states()] == ["starting", "failed"]


class TestTypedConstructors:
    def test_source_transform_sink_pipeline(self):
        @source("Read")
        def read(ctx):
            return [1, 2, 3]

        @transform("Clean")
        def clean(ctx):
            return [x * 10 for x in ctx.value]

        written = []

        @sink("Write")
        def write(ctx):
            written.append(ctx.value)

        result = (read >> clean >> write)(make_ctx())
        assert written == [[10, 20, 30]]
        assert result == [10, 20, 30]  # sink passes value onward
