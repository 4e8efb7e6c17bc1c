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


# Names that already have a green row in the driver's CORRECTNESS_r01.json.
# The round-1 driver artifact capped at 50 entries, so `all_queries()` yields
# never-driver-checked entries FIRST (in registration order) and these last:
# with a capped sweep this maximizes cumulative driver coverage per round.
_DRIVER_CHECKED = frozenset({
    "llm_dedup_embedding_cosine", "llm_dedup_exact", "llm_dedup_minhash",
    "llm_dedup_ngram_jaccard", "llm_dedup_simhash", "llm_dedup_simhash_pairs",
    "llm_multimodal_features", "llm_multimodal_frames", "llm_multimodal_meta",
    "llm_pipeline_training_data", "llm_similarity_ivf", "llm_similarity_lsh",
    "llm_similarity_topk", "llm_text_fingerprint", "llm_text_langid",
    "llm_text_stats", "q01_scan_projection", "q02_filter_in_between",
    "q03_is_defined", "q04_nullify", "q05_inner_join", "q06_join_chain_agg",
    "q07_left_join_coalesce", "q08_full_join", "q08_right_join",
    "q09_semi_join", "q10_anti_join", "q11_cross_join", "q12_theta_join",
    "q13_tpch_q1", "q14_count_distinct", "q14_distinct", "q15_rollup",
    "q16_having", "q19b_limit_offset", "q24b_string_functions2",
    "q26b_date_arithmetic", "q31_asof_join", "q32_pivot", "q32_unpivot",
    "q33_distribution_windows", "q33_range_frame", "q33b_value_windows",
    "q33c_bounded_rows_frame", "q34_stat_aggregates",
    "q34b_median_value_windows", "q35_exists_filtered", "q36_profile_nulls",
    "q37_tpch_q6", "q38_not_in_subquery",
})


def _priority_names() -> list[str]:
    unchecked = [n for n in REGISTRY if n not in _DRIVER_CHECKED]
    checked = [n for n in REGISTRY if n in _DRIVER_CHECKED]
    return unchecked + checked


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
        curation,
        extensions,
        frontier,
        layout,
        lines,
        llm_ops,
        sketches,
        surface,
        tier_a,
        tier_b,
        tpch_more,
    )

    _LOADED = True
