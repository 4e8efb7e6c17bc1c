"""Edge-case tests for the r9 registrations: the bucketized range join
(q168) and the bitmap distinct rollup (q169).

The oracle gate already hash-verifies both on the real tables; these
tests pin the CONSTRUCTIONS on adversarial inputs the generated data
may never hit: pairs straddling bucket boundaries, gaps exactly at the
window edge, identical timestamps (tie-break), and user ids exactly at
the 32768-bit bitmap bucket boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _bucketized_pairs(spark, rows, width_us):
    """The exact q168 construction over an in-memory events table,
    returning the raw ordered-pair set (not the rollup)."""
    e = spark.createDataFrame(
        rows, "event_id long, event_type string, t long"
    )
    bkt = F.floor(F.col("t") / F.lit(width_us))
    later = e.select(
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("type_b"),
        F.col("t").alias("t_b"),
        bkt.alias("bkt"),
    ).repartition(F.col("bkt"))
    earlier = e.select(
        F.col("event_id").alias("id_a"),
        F.col("event_type").alias("type_a"),
        F.col("t").alias("t_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    return (
        earlier.join(later, "bkt")
        .filter(
            (F.col("t_b") - F.col("t_a") <= width_us)
            & (
                (F.col("t_b") > F.col("t_a"))
                | (
                    (F.col("t_b") == F.col("t_a"))
                    & (F.col("id_b") > F.col("id_a"))
                )
            )
        )
        .select("id_a", "id_b")
    )


def test_bucketized_range_join_matches_brute_force(spark):
    """Exactly-once generation: every qualifying ordered pair appears
    once (the later event's bucket is matched by exactly one of the
    earlier event's two exploded buckets) — verified against the naive
    theta join on inputs dense in boundary cases."""
    width = 100
    # timestamps packed around bucket edges (0/100/200...), window-edge
    # gaps (exactly +100), and duplicate timestamps for the tie-break
    ts = [0, 1, 99, 100, 100, 101, 150, 199, 200, 201, 250, 299, 300, 300, 399, 400, 500, 1000]
    rows = [(i, f"t{i % 3}", t) for i, t in enumerate(ts)]
    got = sorted(
        map(tuple, _bucketized_pairs(spark, rows, width).collect())
    )
    e = spark.createDataFrame(rows, "event_id long, event_type string, t long")
    a = e.select(F.col("event_id").alias("id_a"), F.col("t").alias("t_a"))
    b = e.select(F.col("event_id").alias("id_b"), F.col("t").alias("t_b"))
    brute = sorted(
        map(
            tuple,
            a.crossJoin(b)
            .filter(
                (F.col("t_b") - F.col("t_a") <= width)
                & (
                    (F.col("t_b") > F.col("t_a"))
                    | (
                        (F.col("t_b") == F.col("t_a"))
                        & (F.col("id_b") > F.col("id_a"))
                    )
                )
            )
            .select("id_a", "id_b")
            .collect(),
        )
    )
    assert got == brute
    assert len(got) == len(set(got))  # no pair generated twice


def test_bitmap_distinct_handles_bucket_boundaries(spark):
    """bitmap_bucket_number/bit_position round-trip: ids at 0, the
    32768-bit bucket edge, and far buckets count exactly like
    COUNT(DISTINCT) — the construction q169 rolls up."""
    ids = [0, 1, 2, 32767, 32768, 32769, 65535, 65536, 1, 0, 32768]
    df = spark.createDataFrame([(i,) for i in ids], "u long")
    got = (
        df.groupBy(F.expr("bitmap_bucket_number(u)").alias("b"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(u))").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").cast("long").alias("nd"))
        .first()["nd"]
    )
    assert got == len(set(ids))


def test_bitmap_or_merge_equals_direct_distinct(spark):
    """OR-merging per-day bitmaps gives the same distinct count as
    aggregating the union directly — the re-aggregation property the
    rollup relies on (users returning across days count once)."""
    rows = [(d, u) for d in range(5) for u in range(d, d + 40, 3)]
    df = spark.createDataFrame(rows, "day int, u long")
    daily = df.groupBy(
        "day", F.expr("bitmap_bucket_number(u)").alias("b")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(u))").alias("bm"))
    merged = (
        daily.groupBy("b")
        .agg(F.expr("bitmap_or_agg(bm)").alias("obm"))
        .agg(F.expr("sum(bitmap_count(obm))").cast("long").alias("nd"))
        .first()["nd"]
    )
    expected = df.select("u").distinct().count()
    assert merged == expected
