"""JDBC script runner + source round-trips (DatabaseUtils.scala:22-36).

Two real databases, no mocks: sqlite through the Python DB-API path,
and embedded Derby through the py4j java.sql.DriverManager path — the
latter is then read back through Spark's actual JDBC source.
"""

from __future__ import annotations

import sqlite3

import pytest

from amadou_spark.sources.jdbc import read_jdbc, register_driver, run_scripts


class TestRunScriptsSqlite:
    def test_scripts_create_and_populate(self, tmp_path):
        url = f"jdbc:sqlite:{tmp_path}/t.db"
        run_scripts(
            url,
            None,
            "CREATE TABLE kv (k TEXT, v INTEGER)",
            "INSERT INTO kv VALUES ('a', 1)",
            "INSERT INTO kv VALUES ('b', 2)",
        )
        with sqlite3.connect(f"{tmp_path}/t.db") as conn:
            rows = conn.execute("SELECT k, v FROM kv ORDER BY k").fetchall()
        assert rows == [("a", 1), ("b", 2)]

    def test_failing_script_closes_connection_and_rolls_back_dml(self, tmp_path):
        url = f"sqlite:{tmp_path}/t2.db"
        with pytest.raises(sqlite3.OperationalError):
            run_scripts(
                url,
                None,
                "CREATE TABLE kv (k TEXT)",  # DDL: sqlite3 commits implicitly
                "INSERT INTO kv VALUES ('a')",  # uncommitted DML
                "INSERT INTO nonexistent VALUES (1)",  # boom — no batch commit
            )
        # connection closed without commit: the DML must not survive
        with sqlite3.connect(f"{tmp_path}/t2.db") as conn:
            assert conn.execute("SELECT count(*) FROM kv").fetchone() == (0,)

    def test_unknown_url_requires_registration_or_spark(self):
        with pytest.raises(ValueError, match="register_driver"):
            run_scripts("jdbc:nosuchdb://x", None, "SELECT 1")

    def test_register_driver_custom_prefix(self, tmp_path):
        register_driver(
            "jdbc:mydb:", lambda url, props: sqlite3.connect(f"{tmp_path}/my.db")
        )
        run_scripts("jdbc:mydb:whatever", None, "CREATE TABLE t (x INTEGER)")
        with sqlite3.connect(f"{tmp_path}/my.db") as conn:
            assert conn.execute("SELECT count(*) FROM t").fetchone() == (0,)


class TestDerbyRoundTrip:
    def test_jvm_scripts_then_spark_read_jdbc(self, spark, tmp_path):
        """The full reference shape: DDL/DML over java.sql.DriverManager
        (Derby embedded, same JVM as Spark), then Spark's JDBC source
        reads the table back."""
        url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
        run_scripts(
            url,
            None,
            "CREATE TABLE metrics (name VARCHAR(32), value INT)",
            "INSERT INTO metrics VALUES ('rows_read', 42)",
            "INSERT INTO metrics VALUES ('rows_written', 7)",
            spark=spark,
        )
        df = read_jdbc(spark, f"jdbc:derby:{tmp_path}/derbydb", "metrics")
        rows = sorted((r["NAME"], r["VALUE"]) for r in df.collect())
        assert rows == [("rows_read", 42), ("rows_written", 7)]
