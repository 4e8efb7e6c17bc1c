"""Declared-query registry (SURVEY.md §2.2).

Every capability the engine claims is registered here as a
:class:`Query`: a PySpark implementation (DataFrame API or spark.sql —
whichever expresses the logical plan most directly) plus, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
string. The driver executes both at sf=0.01 and compares row-count,
schema and an order-insensitive value hash.

Determinism rules (SURVEY §2.2): total ORDER BY where row identity
matters (top-k), ROUND(x, 2) on float aggregates, explicit casts where
the two engines' return types diverge (CEIL/FLOOR, SUM(int), EXTRACT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` marks an op whose
    semantics are not expressible in portable SQL (driver then records
    a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


# Driver-sweep priority (VERDICT r4 'Next round' #1): with all 193
# registry entries driver-checked cumulatively, the 50-slot per-round
# budget flips from "drain never-checked" to "rotate stalest". The
# round-last-checked table is scanned AT RUNTIME from the
# CORRECTNESS_r*.json artifacts at the repo root, so it can never go
# stale the way the hand-maintained _DRIVER_CHECKED set did in r3/r4.
def _driver_history() -> dict[str, tuple[int, bool]]:
    """name -> (latest driver round with a row, was that row green).

    Green = hash_match and no err (the driver's own pass criterion).
    Unreadable/absent artifacts degrade gracefully: names without a row
    rank as never-checked.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    hist: dict[str, tuple[int, bool]] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) and not row.get("err")
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, green)
    return hist


def _backlog_rank(name: str) -> tuple[int, str]:
    """Drain order among never-driver-checked names (rank 0 of the
    rotation): the SURVEY §2.2 normative core first, then TPC-H shapes,
    then everything else in registration order."""
    import re

    m = re.match(r"^q(\d+)", name)
    num = int(m.group(1)) if m else -1
    if 17 <= num <= 30:
        return (0, name)
    if name.startswith("b0"):
        return (1, name)
    if 39 <= num <= 56 and name != "q39b_incremental_rollup":
        return (2, name)
    return (3, "")  # stable: sorted() keeps registration order within tier


def _priority_names() -> list[str]:
    """Sweep order for the driver's capped per-round artifact:

    1. never driver-checked (new operators), backlog order;
    2. latest driver row NON-green (a fix needs re-proving), stalest
       round first;
    3. green rows, stalest round first — a row from round 1 is a
       3-round-old proof of code that may have been refactored since.
    """
    hist = _driver_history()
    never = [n for n in REGISTRY if n not in hist]
    never.sort(key=_backlog_rank)

    def _checked_rank(name: str) -> tuple[int, int, str]:
        rnd, green = hist[name]
        return (1 if green else 0, rnd, name)

    checked = sorted((n for n in REGISTRY if n in hist), key=_checked_rank)
    return never + checked


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: REGISTRY[name].fn for name in _priority_names()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: REGISTRY[name].oracle
        for name in _priority_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import query modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from amadou_spark.queries import (  # noqa: F401
        analytics,
        curation,
        extensions,
        frontier,
        governance,
        layout,
        lines,
        llm_ops,
        scale_ops,
        sketches,
        surface,
        tier_a,
        tier_b,
        tpch_more,
    )

    _LOADED = True
