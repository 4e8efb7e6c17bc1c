"""Python DataSource API (Spark 4) connector tests: schema, partitioned
parallel read, determinism under re-partitioning, and source-side
partition pruning via pushed filters."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from amadou_spark.sources.pyds import SyntheticReader, register


@pytest.fixture(scope="module")
def synth(spark):
    register(spark)
    return spark.read.format("synthetic").option("rows", 5000).option(
        "partitions", 8
    ).load()


def test_schema_and_count(synth):
    assert synth.schema.simpleString() == (
        "struct<id:bigint,user_id:bigint,kind:string,value:double>"
    )
    assert synth.count() == 5000
    assert synth.rdd.getNumPartitions() == 8


def test_rows_deterministic_across_partitionings(spark):
    a = spark.read.format("synthetic").option("rows", 2000).option("partitions", 2).load()
    b = spark.read.format("synthetic").option("rows", 2000).option("partitions", 7).load()
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(a) == rows(b)


def test_filter_pushdown_prunes_partitions(spark, synth):
    filtered = synth.filter(F.col("id") >= 4000)
    # partitions 0-5 cover id < 3750: pruned source-side
    assert filtered.rdd.getNumPartitions() == 2
    assert filtered.count() == 1000
    # spark still applies the residual filter on the surviving partitions
    assert filtered.agg(F.min("id")).first()[0] == 4000


def test_unhandled_filters_still_correct(synth):
    out = synth.filter((F.col("kind") == "click") & (F.col("id") >= 4900))
    exact = [r for r in synth.collect() if r.kind == "click" and r.id >= 4900]
    assert out.count() == len(exact) > 0


def test_reader_partition_math():
    r = SyntheticReader({"rows": "10", "partitions": "3"})
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(0, 4), (4, 8), (8, 10)]
    assert sum(e - s for _, s, e in ((p.part_id, p.start, p.end) for p in parts)) == 10


def test_stream_reader_serves_all_rows_in_batches(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("synthetic")
        .option("rows", 450)
        .option("batchRows", 200)
        .load()
    )
    # availableNow snapshots only the FIRST prefetched range for simple
    # stream readers; processAllAvailable drains until read() stops
    # advancing the offset
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("synth_stream")
    assert got.count() == 450
    # identical rows to the batch read of the same generator
    batch = spark.read.format("synthetic").option("rows", 450).load()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    spark.catalog.dropTempView("synth_stream")
