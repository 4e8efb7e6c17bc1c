"""Date/schedule calculus for incremental backfill (SURVEY §2.1, M1).

Re-derivation of the reference's ``DateInterval`` and ``Schedule``
(core/.../DateInterval.scala, core/.../Schedule.scala) as pure Python:

- a :class:`DateInterval` is a **half-open** UTC range ``[start, end)``
  with a calendar granularity (Day/Week/Month/Quarter/Year); e.g. "May
  2014" is ``[2014-05-01, 2014-06-01)`` (DateInterval.scala:28-29);
- weeks are **ISO-8601** (Monday-start; 2008-12-29 belongs to ISO week
  2009-W01 — DateInterval.scala:296-312);
- quarters truncate to Jan/Apr/Jul/Oct (DateInterval.scala:336-356);
- a :class:`Schedule` is a lazy monotonically-decreasing stream of
  intervals driving the backfill loop (Schedule.scala:61-91).

These feed Spark as partition values (``date=2017-02-21`` Hive-style
directories), which is what makes incremental recomputes prune-able at
100 TB: the engine recomputes one date partition, not the table.
"""

from __future__ import annotations

import itertools
import re
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from enum import Enum
from typing import Union


class Unit(Enum):
    DAY = "day"
    WEEK = "week"
    MONTH = "month"
    QUARTER = "quarter"
    YEAR = "year"


def _month_add(d: date, months: int) -> date:
    """Shift the 1st-of-month date by n months."""
    total = d.year * 12 + (d.month - 1) + months
    return date(total // 12, total % 12 + 1, 1)


def _truncate(d: date, unit: Unit) -> date:
    if unit is Unit.DAY:
        return d
    if unit is Unit.WEEK:
        return d - timedelta(days=d.weekday())  # ISO Monday
    if unit is Unit.MONTH:
        return d.replace(day=1)
    if unit is Unit.QUARTER:
        return date(d.year, ((d.month - 1) // 3) * 3 + 1, 1)
    if unit is Unit.YEAR:
        return date(d.year, 1, 1)
    raise ValueError(unit)


def _advance(start: date, unit: Unit, n: int) -> date:
    """Shift a unit-aligned start date by n units."""
    if unit is Unit.DAY:
        return start + timedelta(days=n)
    if unit is Unit.WEEK:
        return start + timedelta(weeks=n)
    if unit is Unit.MONTH:
        return _month_add(start, n)
    if unit is Unit.QUARTER:
        return _month_add(start, 3 * n)
    if unit is Unit.YEAR:
        return _month_add(start, 12 * n)
    raise ValueError(unit)


_PARSE_PATTERNS: list[tuple[re.Pattern[str], Unit]] = [
    (re.compile(r"^(\d{4})-(\d{2})-(\d{2})$"), Unit.DAY),
    (re.compile(r"^(\d{4})-W(\d{2})$"), Unit.WEEK),
    (re.compile(r"^(\d{4})-(\d{2})$"), Unit.MONTH),
    (re.compile(r"^(\d{4})-Q([1-4])$"), Unit.QUARTER),
    (re.compile(r"^(\d{4})$"), Unit.YEAR),
]


@dataclass(frozen=True)
class DateInterval:
    """Half-open calendar interval ``[start, end)`` of one granularity unit."""

    start: date
    unit: Unit

    # -- constructors -------------------------------------------------

    @classmethod
    def day(cls, d: date) -> "DateInterval":
        return cls(_truncate(d, Unit.DAY), Unit.DAY)

    @classmethod
    def week(cls, d: date) -> "DateInterval":
        return cls(_truncate(d, Unit.WEEK), Unit.WEEK)

    @classmethod
    def month(cls, d: date) -> "DateInterval":
        return cls(_truncate(d, Unit.MONTH), Unit.MONTH)

    @classmethod
    def quarter(cls, d: date) -> "DateInterval":
        return cls(_truncate(d, Unit.QUARTER), Unit.QUARTER)

    @classmethod
    def year(cls, d: date) -> "DateInterval":
        return cls(_truncate(d, Unit.YEAR), Unit.YEAR)

    @classmethod
    def of(cls, d: date, unit: Unit) -> "DateInterval":
        return cls(_truncate(d, unit), unit)

    @classmethod
    def parse(cls, text: str) -> "DateInterval":
        """Inverse of str(): '2016-08-04' → Day, '2009-W01' → ISO Week,
        '2014-05' → Month, '2014-Q2' → Quarter, '2014' → Year.

        The reference pins these semantics with executable doctests
        (sbt-doctest on DateInterval.scala); same layer here:

        >>> str(DateInterval.parse("2014-05"))
        '2014-05'
        >>> DateInterval.parse("2014-05").start.isoformat()
        '2014-05-01'
        >>> DateInterval.parse("2014-05").end.isoformat()  # half-open
        '2014-06-01'
        >>> DateInterval.parse("2009-W01").start.isoformat()  # ISO week
        '2008-12-29'
        >>> str(DateInterval.parse("2014-Q4").next())
        '2015-Q1'
        >>> str(DateInterval.parse("2016-08-04") - 1)
        '2016-08-03'
        """
        for pattern, unit in _PARSE_PATTERNS:
            m = pattern.match(text)
            if not m:
                continue
            if unit is Unit.DAY:
                return cls.day(date(int(m[1]), int(m[2]), int(m[3])))
            if unit is Unit.WEEK:
                return cls(date.fromisocalendar(int(m[1]), int(m[2]), 1), Unit.WEEK)
            if unit is Unit.MONTH:
                return cls.month(date(int(m[1]), int(m[2]), 1))
            if unit is Unit.QUARTER:
                return cls(date(int(m[1]), (int(m[2]) - 1) * 3 + 1, 1), Unit.QUARTER)
            return cls.year(date(int(m[1]), 1, 1))
        raise ValueError(f"unparseable DateInterval: {text!r}")

    # -- calculus ------------------------------------------------------

    @property
    def end(self) -> date:
        """Exclusive end: the start of the next interval."""
        return _advance(self.start, self.unit, 1)

    def next(self) -> "DateInterval":
        return self + 1

    def prev(self) -> "DateInterval":
        return self - 1

    def __add__(self, n: int) -> "DateInterval":
        return DateInterval(_advance(self.start, self.unit, n), self.unit)

    def __sub__(self, n: int) -> "DateInterval":
        return self + (-n)

    def __lt__(self, other: "DateInterval") -> bool:
        return (self.start, self.end) < (other.start, other.end)

    def __le__(self, other: "DateInterval") -> bool:
        return self == other or self < other

    def contains(self, item: Union[date, datetime, "DateInterval"]) -> bool:
        if isinstance(item, DateInterval):
            return self.start <= item.start and item.end <= self.end
        if isinstance(item, datetime):
            item = item.date()
        return self.start <= item < self.end

    __contains__ = contains

    def to(self, other: "DateInterval") -> Iterator["DateInterval"]:
        """Chronological inclusive range self..other (same unit)."""
        if other.unit is not self.unit:
            raise ValueError(f"unit mismatch: {self.unit} vs {other.unit}")
        cur = self
        while cur.start <= other.start:
            yield cur
            cur = cur.next()

    def by(self, unit: Unit) -> Iterator["DateInterval"]:
        """Subdivide into finer-grained intervals, e.g. Month → Days."""
        cur = DateInterval.of(self.start, unit)
        while cur.start < self.end:
            yield cur
            cur = cur.next()

    # -- formatting ----------------------------------------------------

    def __str__(self) -> str:
        if self.unit is Unit.DAY:
            return self.start.isoformat()
        if self.unit is Unit.WEEK:
            iso = self.start.isocalendar()
            return f"{iso[0]}-W{iso[1]:02d}"  # ISO year, not calendar year
        if self.unit is Unit.MONTH:
            return f"{self.start.year}-{self.start.month:02d}"
        if self.unit is Unit.QUARTER:
            return f"{self.start.year}-Q{(self.start.month - 1) // 3 + 1}"
        return str(self.start.year)

    def format(self, pattern: str) -> str:
        """strftime-based path formatting, e.g. 'year=%Y/month=%m'."""
        return self.start.strftime(pattern)

    def as_datetime(self) -> datetime:
        return datetime(self.start.year, self.start.month, self.start.day, tzinfo=timezone.utc)

    def partition_value(self) -> str:
        """Hive-style partition value for `date=` directories."""
        return self.start.isoformat()


def today(unit: Unit = Unit.DAY) -> DateInterval:
    return DateInterval.of(datetime.now(timezone.utc).date(), unit)


# ---------------------------------------------------------------- Schedule

#: Reference cap: SparkJob.MaxScheduledDates (SparkJob.scala:26).
MAX_SCHEDULED_DATES = 60


@dataclass(frozen=True)
class Schedule:
    """Lazy, monotonically-decreasing stream of DateIntervals.

    ``make`` must yield intervals newest-first; combinators preserve the
    decreasing invariant (Schedule.scala:61-91).
    """

    make: Callable[[], Iterator[DateInterval]]

    @classmethod
    def iterate(cls, first: DateInterval) -> "Schedule":
        def gen() -> Iterator[DateInterval]:
            cur = first
            while True:
                yield cur
                cur = cur.prev()

        return cls(gen)

    @classmethod
    def daily(cls, until: date | None = None) -> "Schedule":
        return cls.iterate(DateInterval.day(until or today().start))

    @classmethod
    def weekly(cls, until: date | None = None) -> "Schedule":
        return cls.iterate(DateInterval.week(until or today().start))

    @classmethod
    def monthly(cls, until: date | None = None) -> "Schedule":
        return cls.iterate(DateInterval.month(until or today().start))

    @classmethod
    def quarterly(cls, until: date | None = None) -> "Schedule":
        return cls.iterate(DateInterval.quarter(until or today().start))

    @classmethod
    def yearly(cls, until: date | None = None) -> "Schedule":
        return cls.iterate(DateInterval.year(until or today().start))

    def __iter__(self) -> Iterator[DateInterval]:
        return self.make()

    def take(self, n: int) -> list[DateInterval]:
        return list(itertools.islice(self, n))

    def where(self, pred: Callable[[DateInterval], bool]) -> "Schedule":
        return Schedule(lambda: (d for d in self if pred(d)))

    def and_(self, other: "Schedule") -> "Schedule":
        """Merge two decreasing streams into one decreasing deduped stream."""

        def gen() -> Iterator[DateInterval]:
            a, b = iter(self), iter(other)
            xa, xb = next(a, None), next(b, None)
            last: DateInterval | None = None
            while xa is not None or xb is not None:
                if xb is None or (xa is not None and (xa.start, xa.end) >= (xb.start, xb.end)):
                    nxt, xa = xa, next(a, None)
                else:
                    nxt, xb = xb, next(b, None)
                if nxt is not None and nxt != last:
                    yield nxt
                    last = nxt

        return Schedule(gen)

    __and__ = and_


def backfill_dates(
    schedule: Schedule | Iterable[DateInterval],
    should_run: Callable[[DateInterval], bool] = lambda _: True,
    start: str | None = None,
    max_dates: int = MAX_SCHEDULED_DATES,
) -> list[DateInterval]:
    """The reference's date-planning step (SparkRunner.scala:91-101):
    take ≤max_dates newest-first, stop at the first already-done date,
    reverse to chronological order.

    ``start`` (the reference's START_DATE / singleDate) becomes the
    takeWhile predicate — ``start <= d``, i.e. backfill every scheduled
    date from ``start`` up to the newest, exactly like
    ``singleDate match { case Some(date) => date.<= }``. It REPLACES
    ``should_run``: a pinned start forces reruns even of already-done
    dates."""
    if start is not None:
        pinned = DateInterval.parse(start)
        should_run = lambda d: pinned <= d  # noqa: E731
    dates = itertools.islice(schedule, max_dates)
    return list(itertools.takewhile(should_run, dates))[::-1]
