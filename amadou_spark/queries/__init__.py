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


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import query modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from amadou_spark.queries import extensions, llm_ops, tier_a, tier_b  # noqa: F401

    _LOADED = True
