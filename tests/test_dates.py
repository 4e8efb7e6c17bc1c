"""DateInterval/Schedule calculus tests.

Ports the semantics pinned by the reference's DateIntervalSpec
(core/src/test/scala/com.mediative.amadou/DateIntervalSpec.scala:21-197)
and the DateInterval doctests: half-open intervals, ISO-week year
boundaries, quarter truncation, leap years.
"""

from __future__ import annotations

from datetime import date, datetime, timezone

import pytest

from amadou_spark.dates import (
    MAX_SCHEDULED_DATES,
    DateInterval,
    Schedule,
    Unit,
    backfill_dates,
)


class TestDay:
    def test_roundtrip(self):
        d = DateInterval.day(date(2016, 8, 4))
        assert str(d) == "2016-08-04"
        assert DateInterval.parse("2016-08-04") == d

    def test_half_open(self):
        d = DateInterval.day(date(2016, 8, 4))
        assert d.start == date(2016, 8, 4)
        assert d.end == date(2016, 8, 5)
        assert date(2016, 8, 4) in d
        assert date(2016, 8, 5) not in d

    def test_prev_next_arithmetic(self):
        d = DateInterval.day(date(2016, 3, 1))
        assert d.prev().start == date(2016, 2, 29)  # leap year
        assert d.next().start == date(2016, 3, 2)
        assert (d + 31).start == date(2016, 4, 1)
        assert (d - 1) == d.prev()


class TestWeek:
    def test_iso_week_year_boundary(self):
        # The reference's doctest case: 2008-12-29 belongs to ISO 2009-W01
        # (DateInterval.scala:296-312).
        w = DateInterval.week(date(2008, 12, 29))
        assert str(w) == "2009-W01"
        assert w.start == date(2008, 12, 29)  # Monday
        assert w.end == date(2009, 1, 5)

    def test_truncates_to_monday(self):
        w = DateInterval.week(date(2016, 8, 4))  # Thursday
        assert w.start == date(2016, 8, 1)  # Monday
        assert str(w) == "2016-W31"

    def test_parse(self):
        assert DateInterval.parse("2009-W01").start == date(2008, 12, 29)

    def test_53_week_year(self):
        w = DateInterval.parse("2015-W53")
        assert w.start == date(2015, 12, 28)
        assert str(w) == "2015-W53"


class TestMonth:
    def test_half_open_month(self):
        # "May 2014 = [2014-05-01, 2014-06-01)" (DateInterval.scala:28-29)
        m = DateInterval.month(date(2014, 5, 17))
        assert str(m) == "2014-05"
        assert m.start == date(2014, 5, 1)
        assert m.end == date(2014, 6, 1)
        assert date(2014, 5, 31) in m
        assert date(2014, 6, 1) not in m

    def test_year_rollover(self):
        m = DateInterval.month(date(2016, 12, 15))
        assert m.next().start == date(2017, 1, 1)
        assert DateInterval.month(date(2016, 1, 15)).prev().start == date(2015, 12, 1)


class TestQuarter:
    @pytest.mark.parametrize(
        "d,expected_start,formatted",
        [
            (date(2014, 2, 14), date(2014, 1, 1), "2014-Q1"),
            (date(2014, 5, 1), date(2014, 4, 1), "2014-Q2"),
            (date(2014, 9, 30), date(2014, 7, 1), "2014-Q3"),
            (date(2014, 12, 31), date(2014, 10, 1), "2014-Q4"),
        ],
    )
    def test_truncation(self, d, expected_start, formatted):
        q = DateInterval.quarter(d)
        assert q.start == expected_start
        assert str(q) == formatted

    def test_parse_and_next(self):
        q = DateInterval.parse("2014-Q4")
        assert q.next().start == date(2015, 1, 1)
        assert str(q.next()) == "2015-Q1"


class TestYear:
    def test_roundtrip(self):
        y = DateInterval.year(date(2016, 8, 4))
        assert str(y) == "2016"
        assert y.start == date(2016, 1, 1)
        assert y.end == date(2017, 1, 1)
        assert DateInterval.parse("2016") == y


class TestIntervalOps:
    def test_to_chronological(self):
        a = DateInterval.day(date(2016, 8, 1))
        b = DateInterval.day(date(2016, 8, 4))
        assert [str(x) for x in a.to(b)] == [
            "2016-08-01",
            "2016-08-02",
            "2016-08-03",
            "2016-08-04",
        ]

    def test_by_subdivision(self):
        m = DateInterval.month(date(2016, 2, 10))
        days = list(m.by(Unit.DAY))
        assert len(days) == 29  # leap February
        weeks = list(m.by(Unit.WEEK))
        assert weeks[0].start == date(2016, 2, 1)

    def test_contains_interval(self):
        m = DateInterval.month(date(2016, 2, 10))
        assert m.contains(DateInterval.day(date(2016, 2, 29)))
        assert not m.contains(DateInterval.day(date(2016, 3, 1)))

    def test_contains_datetime(self):
        d = DateInterval.day(date(2016, 8, 4))
        assert d.contains(datetime(2016, 8, 4, 23, 59, tzinfo=timezone.utc))

    def test_format_path(self):
        d = DateInterval.day(date(2017, 2, 21))
        assert d.format("year=%Y/month=%m") == "year=2017/month=02"
        assert d.partition_value() == "2017-02-21"


class TestSchedule:
    def test_daily_monotonic_decreasing(self):
        s = Schedule.daily(until=date(2016, 8, 4))
        got = s.take(3)
        assert [str(d) for d in got] == ["2016-08-04", "2016-08-03", "2016-08-02"]

    def test_where(self):
        s = Schedule.daily(until=date(2016, 8, 7)).where(lambda d: d.start.weekday() == 0)
        assert [str(d) for d in s.take(2)] == ["2016-08-01", "2016-07-25"]

    def test_and_merges_decreasing_dedup(self):
        a = Schedule.daily(until=date(2016, 8, 4))
        b = Schedule.daily(until=date(2016, 8, 5))
        merged = (a & b).take(4)
        assert [str(d) for d in merged] == [
            "2016-08-05",
            "2016-08-04",
            "2016-08-03",
            "2016-08-02",
        ]

    def test_backfill_takewhile_and_reverse(self):
        # SparkRunner.scala:96-101: stop at first already-done date,
        # then run oldest-first.
        s = Schedule.daily(until=date(2016, 8, 10))
        done = {date(2016, 8, 7)}
        plan = backfill_dates(s, should_run=lambda d: d.start not in done)
        assert [str(d) for d in plan] == ["2016-08-08", "2016-08-09", "2016-08-10"]

    def test_backfill_cap(self):
        plan = backfill_dates(Schedule.daily(until=date(2016, 8, 10)))
        assert len(plan) == MAX_SCHEDULED_DATES

    def test_start_is_takewhile_predicate(self):
        # SparkRunner.scala:91-95: singleDate => date.<= — backfill every
        # scheduled date from START_DATE up to the newest, not one date.
        plan = backfill_dates(
            Schedule.daily(until=date(2016, 8, 10)), start="2016-08-08"
        )
        assert [str(d) for d in plan] == ["2016-08-08", "2016-08-09", "2016-08-10"]

    def test_start_overrides_should_run(self):
        plan = backfill_dates(
            Schedule.daily(until=date(2016, 8, 10)),
            should_run=lambda d: False,  # everything "already done"
            start="2016-08-09",
        )
        assert [str(d) for d in plan] == ["2016-08-09", "2016-08-10"]
