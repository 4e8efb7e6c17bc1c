"""Custom operator tests: the two as-of join implementations (window
composition vs pandas merge_asof) must agree exactly."""

from __future__ import annotations

from amadou_spark.catalog import load_table
from amadou_spark.operators.asof import asof_join, asof_join_pandas


def _rows(df, keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_asof_join_window_equals_pandas(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    kwargs = dict(
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=[],
    )
    a = asof_join(events, orders, **kwargs)
    b = asof_join_pandas(events, orders, **kwargs)
    cols = ["event_id", "user_id", "matched_o_orderdate"]
    assert _rows(a, cols) == _rows(b, cols)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 10)], "k INT, ts INT"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "k AS lid")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (3, 1, "z")], "k INT, ts INT, tag STRING"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS rts", "tag")
    out = asof_join(
        left, right, left_on="k", right_on="k", left_ts="ts", right_ts="rts",
        payload_cols=["tag"],
    )
    got = {
        (r.k, r.ts.timestamp()): r.matched_tag for r in out.collect()
    }
    assert got[(1, 10.0)] == "a"   # equal ts matches (inclusive)
    assert got[(1, 20.0)] == "b"   # latest preceding
    assert got[(1, 5.0)] is None   # nothing precedes
    assert got[(2, 10.0)] is None  # key with no right rows


def test_sessionize_bounds_equal_session_window(spark, sf_dir):
    from amadou_spark.operators.sessionize import session_bounds
    from amadou_spark.streaming.windows import session_windows_batch

    events = load_table(spark, sf_dir, "events")
    via_lag = session_bounds(events, gap_seconds=1800).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    via_window = session_windows_batch(events, gap="30 minutes")
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(via_lag) == key(via_window)


def test_sessionize_ids_are_dense_and_ordered(spark, sf_dir):
    from amadou_spark.operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events").filter("user_id = 7")
    rows = sessionize(events, gap_seconds=1800).orderBy("ts").collect()
    ids = [r.session_id for r in rows]
    assert ids[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))  # dense, monotone
