"""I/O surface, DataUrl algebra, config layering, warehouse seam tests."""

from __future__ import annotations

import json
import os
import tempfile
from datetime import date

import pytest

from amadou_spark.config import load_config
from amadou_spark.dates import DateInterval
from amadou_spark.io import (
    has_data_for_date,
    read_json,
    read_parquet,
    read_text,
    write_date_partition,
    write_json,
    write_parquet,
)
from amadou_spark.urls import DataUrl
from amadou_spark.warehouse import ParquetWarehouse, WarehouseTable


@pytest.fixture()
def workdir():
    import shutil

    d = tempfile.mkdtemp(prefix="amadou_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestDataUrl:
    def test_slash_composition(self):
        u = DataUrl("/data/raw") / "sub" / "leaf"
        assert str(u) == "/data/raw/sub/leaf"

    def test_date_formatted_path(self):
        # reference: HdfsUrl date paths (HdfsUrl.scala:39-42), formats
        # `raw` = yyyy/MM/dd and `clean` = 'date='yyyy-MM-dd
        d = DateInterval.day(date(2017, 2, 21))
        raw = DataUrl("/data/raw", "%Y/%m/%d") / d
        clean = DataUrl("/data/clean", "date=%Y-%m-%d") / d
        assert str(raw) == "/data/raw/2017/02/21"
        assert str(clean) == "/data/clean/date=2017-02-21"

    def test_default_partition_value(self):
        d = DateInterval.day(date(2017, 2, 21))
        assert str(DataUrl("/x") / d) == "/x/2017-02-21"

    def test_exists(self, spark, workdir):
        assert DataUrl(workdir).exists(spark)
        assert not (DataUrl(workdir) / "nope").exists(spark)


class TestRoundTrips:
    def test_parquet_json_roundtrip(self, spark, workdir):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, s STRING")
        write_parquet(df, f"{workdir}/p")
        write_json(df, f"{workdir}/j")
        assert sorted(
            (r.id, r.s) for r in read_parquet(spark, f"{workdir}/p").collect()
        ) == [(1, "a"), (2, "b")]
        assert read_json(spark, f"{workdir}/j", schema=df.schema).count() == 2

    def test_text_read(self, spark, workdir):
        with open(f"{workdir}/lines.txt", "w") as fh:
            fh.write("første linje\nanden linje\n")
        rows = read_text(spark, f"{workdir}/lines.txt").collect()
        assert [r.value for r in rows] == ["første linje", "anden linje"]

    def test_partitioned_write_and_probe(self, spark, workdir):
        df = spark.createDataFrame([(1,)], "id LONG")
        d = DateInterval.day(date(2024, 5, 1))
        write_date_partition(df, f"{workdir}/t", d)
        assert has_data_for_date(spark, f"{workdir}/t", d)
        assert not has_data_for_date(spark, f"{workdir}/t", d.next())


class TestConfig:
    def test_layering_and_spark_conf(self, workdir):
        base = os.path.join(workdir, "app.json")
        with open(base, "w") as fh:
            json.dump({"retry": {"max": 5}, "spark": {"driver": {"memory": "2g"}}}, fh)
        cfg = load_config(base, overrides={"retry.delay_seconds": 0})
        assert cfg["retry.max"] == 5
        assert cfg["retry.delay_seconds"] == 0
        assert cfg.spark_conf()["spark.driver.memory"] == "2g"

    def test_env_layer_wins(self, workdir):
        base = os.path.join(workdir, "app.json")
        with open(base, "w") as fh:
            json.dump({"retry": {"max": 5}}, fh)
        with open(os.path.join(workdir, "app.prod.json"), "w") as fh:
            json.dump({"retry": {"max": 9}}, fh)
        os.environ["DEPLOY_ENVIRONMENT"] = "prod"
        try:
            assert load_config(base)["retry.max"] == 9
        finally:
            del os.environ["DEPLOY_ENVIRONMENT"]


class TestWarehouse:
    def test_query_load_extract_roundtrip(self, spark, workdir):
        wh = ParquetWarehouse(spark, workdir)
        t = WarehouseTable("local", "analytics", "nums")
        df = spark.createDataFrame([(i,) for i in range(10)], "n LONG")
        wh.load(df, t, mode="overwrite")
        assert wh.read(t).count() == 10

        dest = WarehouseTable("local", "analytics", "sums")
        wh.read(t).createOrReplaceTempView("nums")
        out = wh.query("SELECT SUM(n) AS total FROM nums", dest)
        assert out.collect()[0].total == 45
        assert wh.read(dest).collect()[0].total == 45

        wh.extract(t, f"{workdir}/extract_csv")
        assert spark.read.csv(f"{workdir}/extract_csv", header=True).count() == 10

    def test_partition_freshness(self, spark, workdir):
        wh = ParquetWarehouse(spark, workdir)
        t = WarehouseTable("local", "analytics", "daily")
        d = DateInterval.day(date(2024, 5, 1))
        wh.load_partition(spark.createDataFrame([(1,)], "id LONG"), t, d)
        assert wh.has_data_for_date(t, d)
        assert not wh.has_data_for_date(t, d.next())


def test_orc_and_generic_save_roundtrip(spark, workdir):
    from amadou_spark.io import load, read_orc, save, write_orc

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, s STRING")
    write_orc(df, f"{workdir}/o")
    assert read_orc(spark, f"{workdir}/o").count() == 2
    save(df, f"{workdir}/g", fmt="json")
    assert load(spark, f"{workdir}/g", fmt="json").count() == 2
