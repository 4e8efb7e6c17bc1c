"""Session-conf hygiene over the streaming family (r9, VERDICT r8 #2).

The r8 bench regression class: an operator that mutates shared session
conf as a side effect (running_totals_stream used to flip the
state-store provider permanently) silently changes the environment
every LATER query runs under. This test executes every streaming-family
registry entry end-to-end and asserts the session's SQL conf is
byte-identical before and after — any new leak in this family turns
into a red test naming the key, not a bench-drift mystery two rounds
later.
"""

from __future__ import annotations

import pytest

from amadou_spark.queries import REGISTRY, _load

STREAMING = [
    "b06_sliding_batch",
    "b06_stream_daily_rollup",
    "b06_tumbling_stream",
    "b07_session_windows",
    "b07_stateful_counts",
    "b07_stream_dedup",
    "b07_stream_upsert",
    "b07_tws_running_totals",
    "b08_stream_static_join",
    "b09_stream_stream_join",
    "b09_stream_stream_left_outer",
    "b09_stream_stream_full_outer",
    "b09_chained_join_window",
]


def _sql_conf_snapshot(spark) -> dict:
    # r10 (ADVICE): full-conf snapshot, not a six-key allowlist — SET
    # lists every explicitly-set SQL conf key, so a leak on ANY key a
    # query touches and fails to restore diffs red. The only excluded
    # key is spark.sql.legacy.parquet.nanosAsLong:
    # catalog.load_table / read_events_stream set it ONE-WAY as a
    # documented engine-level reader conf (it only widens what parquet
    # footers the session can read), so it is not a leak. The same
    # snapshot now also wraps EVERY query in the tools/check.py sweep
    # (amadou_spark.oracle.check_all), registry-wide.
    from amadou_spark.oracle import conf_snapshot

    return conf_snapshot(spark)


def test_check_all_flags_and_restores_a_conf_leak(spark, sf_dir):
    """r10 (review): the registry-wide conf gate must (a) fail the
    leaking row naming the key AND (b) restore the pre-query conf, so
    one leaky query can't silently change the environment every later
    row in the sweep runs (and is measured) under."""
    from amadou_spark.oracle import check_all
    from amadou_spark.queries import REGISTRY, Query

    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key, None)

    def leaky(s, d):
        s.conf.set(key, "12345b")
        return s.range(3)

    name = "zz_test_leaky_conf"
    REGISTRY[name] = Query(name, leaky, None, "test-only leak probe", ())
    try:
        results = check_all(spark, sf_dir, [name])
    finally:
        REGISTRY.pop(name, None)
    assert len(results) == 1 and not results[0].ok
    assert "session conf leak" in results[0].detail
    assert key in results[0].detail
    assert spark.conf.get(key, None) == before  # blast radius contained


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_query_leaves_session_conf_untouched(spark, sf_dir, name):
    _load()
    if name == "b07_tws_running_totals":
        from amadou_spark.streaming.stateful import protobuf_available

        if not protobuf_available():  # pragma: no cover - other images
            pytest.skip("transformWithState needs google.protobuf")
    before = _sql_conf_snapshot(spark)
    REGISTRY[name].fn(spark, sf_dir).count()
    after = _sql_conf_snapshot(spark)
    diff = {k: (before[k], after[k]) for k in before if before[k] != after[k]}
    assert not diff, f"{name} leaked session conf: {diff}"
