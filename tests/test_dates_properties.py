"""Property-based tests for the DateInterval calculus (hypothesis) —
a superset of the reference's example-based DateIntervalSpec: the
algebraic laws hold for EVERY date, not just the curated edge cases."""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from amadou_spark.dates import DateInterval, Unit

DATES = st.dates(min_value=date(1900, 1, 2), max_value=date(2199, 12, 30))
UNITS = st.sampled_from(list(Unit))
STEPS = st.integers(min_value=-500, max_value=500)


@given(DATES, UNITS)
@settings(max_examples=200)
def test_parse_str_roundtrip(d, unit):
    interval = DateInterval.of(d, unit)
    assert DateInterval.parse(str(interval)) == interval


@given(DATES, UNITS)
@settings(max_examples=200)
def test_half_open_invariants(d, unit):
    interval = DateInterval.of(d, unit)
    assert interval.start <= d < interval.end  # truncation keeps the date inside
    assert interval.start < interval.end
    assert interval.end == interval.next().start  # half-open adjacency
    assert d in interval and interval.end not in interval


@given(DATES, UNITS, STEPS)
@settings(max_examples=200)
def test_shift_inverse(d, unit, n):
    interval = DateInterval.of(d, unit)
    assert (interval + n) - n == interval
    assert (interval + n).unit is unit


@given(DATES, UNITS)
@settings(max_examples=200)
def test_prev_next_adjacent_and_ordered(d, unit):
    interval = DateInterval.of(d, unit)
    assert interval.prev() < interval < interval.next()
    assert interval.prev().end == interval.start


@given(DATES, UNITS)
@settings(max_examples=100)
def test_truncation_idempotent(d, unit):
    interval = DateInterval.of(d, unit)
    assert DateInterval.of(interval.start, unit) == interval


@given(DATES)
@settings(max_examples=200)
def test_week_is_iso(d):
    w = DateInterval.week(d)
    assert w.start.weekday() == 0  # Monday
    assert (w.end - w.start) == timedelta(days=7)
    iso_year, iso_week, _ = d.isocalendar()
    assert str(w) == f"{iso_year}-W{iso_week:02d}"


@given(DATES)
@settings(max_examples=100)
def test_month_subdivides_into_days(d):
    m = DateInterval.month(d)
    days = list(m.by(Unit.DAY))
    assert len(days) == (m.end - m.start).days
    assert days[0].start == m.start and days[-1].end == m.end
