"""SCD Type-2 snapshot merge: per-key versioning invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amadou_spark.operators.scd import scd2_apply, scd2_as_of, scd2_current

KEYS = ["id"]
TRACKED = ["city", "tier"]


@pytest.fixture()
def day1(spark):
    """History after the first snapshot: three open rows."""
    snap = spark.createDataFrame(
        [(1, "paris", "gold"), (2, "lyon", "silver"), (3, "nice", "bronze")],
        "id long, city string, tier string",
    )
    empty = spark.createDataFrame(
        [], "id long, city string, tier string, "
        "valid_from timestamp, valid_to timestamp"
    )
    return scd2_apply(empty, snap, KEYS, TRACKED, "2024-01-01 00:00:00")


def test_first_snapshot_opens_every_key(spark, day1):
    rows = day1.collect()
    assert len(rows) == 3
    assert all(r.valid_to is None for r in rows)
    assert {str(r.valid_from) for r in rows} == {"2024-01-01 00:00:00"}


def test_second_snapshot_versions_changed_keys(spark, day1):
    snap2 = spark.createDataFrame(
        # id 1 changed city, id 2 unchanged, id 3 absent, id 4 new
        [(1, "berlin", "gold"), (2, "lyon", "silver"), (4, "oslo", "gold")],
        "id long, city string, tier string",
    )
    h2 = scd2_apply(day1, snap2, KEYS, TRACKED, "2024-01-02 00:00:00")
    by_key = {}
    for r in h2.collect():
        by_key.setdefault(r.id, []).append(r)

    # changed key: closed old version + open new version
    v1, = [r for r in by_key[1] if r.valid_to is not None]
    v2, = [r for r in by_key[1] if r.valid_to is None]
    assert v1.city == "paris" and str(v1.valid_to) == "2024-01-02 00:00:00"
    assert v2.city == "berlin" and str(v2.valid_from) == "2024-01-02 00:00:00"
    # unchanged key: single open row, original valid_from preserved
    (u,) = by_key[2]
    assert u.valid_to is None and str(u.valid_from) == "2024-01-01 00:00:00"
    # absent key with close_missing=False: stays open
    (a,) = by_key[3]
    assert a.valid_to is None
    # new key: open row at snapshot ts
    (n,) = by_key[4]
    assert n.valid_to is None and str(n.valid_from) == "2024-01-02 00:00:00"

    # exactly one open row per key — the SCD2 core invariant
    open_counts = (
        scd2_current(h2).groupBy("id").agg(F.count("*").alias("n")).collect()
    )
    assert all(r.n == 1 for r in open_counts)


def test_close_missing_full_snapshot_semantics(spark, day1):
    snap2 = spark.createDataFrame(
        [(1, "paris", "gold")], "id long, city string, tier string"
    )
    h2 = scd2_apply(
        day1, snap2, KEYS, TRACKED, "2024-01-02 00:00:00", close_missing=True
    )
    open_ids = {r.id for r in scd2_current(h2).collect()}
    assert open_ids == {1}
    closed = {r.id for r in h2.filter(F.col("valid_to").isNotNull()).collect()}
    assert closed == {2, 3}


def test_idempotent_reapply(spark, day1):
    snap = spark.createDataFrame(
        [(1, "paris", "gold"), (2, "lyon", "silver"), (3, "nice", "bronze")],
        "id long, city string, tier string",
    )
    h2 = scd2_apply(day1, snap, KEYS, TRACKED, "2024-01-02 00:00:00")
    a = sorted(map(tuple, day1.collect()))
    b = sorted(map(tuple, h2.collect()))
    assert a == b


def test_null_transitions_are_detected(spark):
    """NULL → '' and '' → NULL must count as changes (sentinel in the
    change hash), and NULL keys join null-safely."""
    empty = spark.createDataFrame(
        [], "id long, city string, tier string, "
        "valid_from timestamp, valid_to timestamp"
    )
    s1 = spark.createDataFrame(
        [(1, None, "gold"), (None, "x", "t")],
        "id long, city string, tier string",
    )
    h1 = scd2_apply(empty, s1, KEYS, TRACKED, "2024-01-01 00:00:00")
    s2 = spark.createDataFrame(
        [(1, "", "gold"), (None, "x", "t")],
        "id long, city string, tier string",
    )
    h2 = scd2_apply(h1, s2, KEYS, TRACKED, "2024-01-02 00:00:00")
    one = [r for r in h2.collect() if r.id == 1]
    assert len(one) == 2  # closed NULL-city version + open ''-city version
    nulls = [r for r in h2.collect() if r.id is None]
    assert len(nulls) == 1 and nulls[0].valid_to is None  # unchanged


def test_duplicate_snapshot_keys_rejected(spark, day1):
    """A duplicate business key would fan out the full-outer join and
    break the one-open-row invariant — the guard must refuse loudly."""
    snap = spark.createDataFrame(
        [(1, "paris", "gold"), (1, "berlin", "gold")],
        "id long, city string, tier string",
    )
    with pytest.raises(ValueError, match="duplicate business keys"):
        scd2_apply(day1, snap, KEYS, TRACKED, "2024-01-02 00:00:00")
    # and the escape hatch still works for callers who guarantee it
    scd2_apply(
        day1,
        snap.dropDuplicates(["id"]),
        KEYS,
        TRACKED,
        "2024-01-02 00:00:00",
        check_unique=True,
    ).collect()


def test_change_hash_no_separator_ambiguity(spark, day1):
    """Values containing the old separator byte must not alias across
    column boundaries: ('a\\x01b', 'c') -> ('a', 'b\\x01c') is a REAL
    change and must produce a new version."""
    s1 = spark.createDataFrame(
        [(9, "a\x01b", "c")], "id long, city string, tier string"
    )
    empty = spark.createDataFrame(
        [], "id long, city string, tier string, "
        "valid_from timestamp, valid_to timestamp"
    )
    h1 = scd2_apply(empty, s1, KEYS, TRACKED, "2024-01-01 00:00:00")
    s2 = spark.createDataFrame(
        [(9, "a", "b\x01c")], "id long, city string, tier string"
    )
    h2 = scd2_apply(h1, s2, KEYS, TRACKED, "2024-01-02 00:00:00")
    rows = h2.collect()
    assert len(rows) == 2  # closed old + open new, not "unchanged"
    (open_row,) = [r for r in rows if r.valid_to is None]
    assert open_row.city == "a" and open_row.tier == "b\x01c"


def test_as_of_point_in_time(spark, day1):
    snap2 = spark.createDataFrame(
        [(1, "berlin", "gold"), (2, "lyon", "silver"), (3, "nice", "bronze")],
        "id long, city string, tier string",
    )
    h2 = scd2_apply(day1, snap2, KEYS, TRACKED, "2024-01-02 00:00:00")
    before = {r.id: r.city for r in scd2_as_of(h2, "2024-01-01 12:00:00").collect()}
    after = {r.id: r.city for r in scd2_as_of(h2, "2024-01-02 12:00:00").collect()}
    assert before[1] == "paris" and after[1] == "berlin"
    assert before[2] == after[2] == "lyon"
