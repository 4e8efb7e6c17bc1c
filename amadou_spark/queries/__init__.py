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


# Names that already have a green row in the driver's CORRECTNESS_r01..r03
# artifacts.  The per-round driver artifact caps at 50 entries, so
# `all_queries()` yields never-driver-checked entries FIRST and these last:
# with a capped sweep this maximizes cumulative driver coverage.
_DRIVER_CHECKED = frozenset({
    # round 1
    "llm_dedup_embedding_cosine", "llm_dedup_exact", "llm_dedup_minhash",
    "llm_dedup_ngram_jaccard", "llm_dedup_simhash", "llm_dedup_simhash_pairs",
    "llm_multimodal_frames", "llm_multimodal_meta",
    # (llm_multimodal_features removed r4: converted rows-only → full
    # oracle, needs a fresh driver row)
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
    # round 2 (q69_skew_profile deliberately excluded: its driver row was
    # hash_match=false, so it must re-run after the oracle-cast fix)
    "llm_bpe_pair_counts", "llm_chunk_documents", "llm_decontaminate",
    "llm_dedup_clusters", "llm_dedup_incremental", "llm_dedup_keep_best",
    "llm_dedup_levenshtein", "llm_dedup_lines", "llm_embedding_centroids",
    "llm_embedding_quantize", "llm_line_frequency", "llm_pack_sequences",
    "llm_pii_redact", "llm_quality_c4_gates", "llm_quality_repetition",
    "llm_quality_unigram_logprob", "llm_sample_stratified",
    "llm_sample_temperature", "llm_sample_weighted", "llm_sessionize_events",
    "llm_similarity_pq", "llm_split_train_val_test", "llm_text_tfidf",
    "llm_text_top_ngrams", "q15b_cube", "q15c_grouping_sets",
    "q39b_incremental_rollup", "q57_funnel", "q58_cohort_retention",
    "q59_resample_gapfill", "q60_cms_frequency",
    # (q61_hll_mergeable removed r4: converted rows-only → full oracle)
    "q62_zorder_cells", "q63_kl_drift", "q63_recursive_cte", "q64_histogram",
    "q64_xml_roundtrip", "q65_python_udtf", "q66_lateral_topk",
    "q67_interval_join", "q68_event_transitions", "q70_pagerank",
    "q71_winsorized_mean", "q72_group_by_all", "q73_snapshot_diff",
    "q74_intersect_all", "q74b_except_all", "q75_union_by_name",
    "q76_null_safe_join",
    # round 3 (b04_grouped_zscore deliberately excluded: hash_match=false,
    # must re-run after the -0.0 oracle fix; b05_* excluded: converted from
    # rows-only to full hash-checkable oracles in r4, need a fresh row)
    "q17_ranking_windows", "q18_analytic_windows", "q19_top_k",
    "q20_sort_nulls", "q21_except", "q21_intersect", "q21_union",
    "q21_union_all", "q22_in_subquery", "q22_scalar_subquery",
    "q23_correlated_subquery", "q24_string_functions", "q25_math_functions",
    "q26_datetime_functions", "q27_conditional", "q28_cast_matrix",
    "q29_tpch_q3", "q29_tpch_q5", "q30_events_daily", "q30_events_gaps",
    "b01_array_higher_order", "b01_array_ops", "b01_collect_list_sorted",
    "b01_explode_tokens", "b02_map_ops", "b03_from_json_agg",
    "b03_json_extract", "b03_variant", "b04_pandas_udaf",
    "b04_pandas_udf_scalar", "b04_python_udf", "b06_sliding_batch",
    "b06_tumbling_stream", "b07_session_windows", "b07_stateful_counts",
    "b07_stream_dedup", "b08_stream_static_join", "b09_stream_stream_join",
    "q69_skew_profile", "q39_tpch_q4", "q40_tpch_q7", "q41_tpch_q8",
    "q42_tpch_q9", "q43_tpch_q10", "q44_tpch_q11", "q45_tpch_q14",
    "q46_tpch_q15",
})


# Round-4: the r3 built-ahead operators are now registered with full
# oracles — q89_scd2_apply / q90_expectations (queries/governance.py)
# and llm_split_leakage_safe (queries/llm_ops.py).
def _backlog_rank(name: str) -> tuple[int, str]:
    """Explicit drain order for the driver-unchecked backlog
    (VERDICT r2 'Next round' #1): the SURVEY §2.2 normative core first.

    1. Tier A Q17–Q30 (tier_a.py) — waiting since round 1,
    2. Tier B B01–B09 (tier_b.py),
    3. TPC-H shapes q39–q56 (tpch_more.py),
    4. the q77–q88 surface batch,
    5. anything else (e.g. queries added after round 2), registration order.
    """
    import re

    m = re.match(r"^q(\d+)", name)
    num = int(m.group(1)) if m else -1
    if 17 <= num <= 30:
        return (0, name)
    if name.startswith("b0"):
        return (1, name)
    if name == "q69_skew_profile":  # re-check after the r2 oracle-cast fix
        return (2, "")
    if 39 <= num <= 56 and name != "q39b_incremental_rollup":
        return (2, name)
    if 77 <= num <= 88:
        return (3, name)
    return (4, "")  # stable: sorted() keeps registration order within tier


def _priority_names() -> list[str]:
    unchecked = [n for n in REGISTRY if n not in _DRIVER_CHECKED]
    unchecked.sort(key=_backlog_rank)
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
