"""Doctest layer (reference parity: sbt-doctest runs Scaladoc examples
as tests, build.sbt:12-13). Docstring examples in the pure-Python
modules are executable specs."""

from __future__ import annotations

import doctest

import amadou_spark.dates
import amadou_spark.config


def test_dates_doctests():
    result = doctest.testmod(
        amadou_spark.dates,
        extraglobs={"DateInterval": amadou_spark.dates.DateInterval},
        verbose=False,
    )
    assert result.failed == 0 and result.attempted > 0
