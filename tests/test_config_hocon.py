"""HOCON-subset + .properties config parity (ConfigLoader.scala:26-47,
ConfigLoaderSpec.scala:30-68, reference.conf, application.conf).
"""

from __future__ import annotations

import os

import pytest

from amadou_spark.config import (
    Config,
    load_config,
    load_properties,
    parse_hocon,
    parse_properties,
    properties_from_config,
    read_config_file,
)


class TestParseHocon:
    def test_reference_application_conf_shape(self):
        # mirrors the reference's own test application.conf
        values = parse_hocon(
            """
            hdfs {
              root = target/hdfs-root

              raw {
                url = ${hdfs.root}/data
                dateFormat = "yyyy/MM/dd"
              }
            }

            retry.max = 1
            """
        )
        assert values["hdfs.root"] == "target/hdfs-root"
        assert values["hdfs.raw.url"] == "target/hdfs-root/data"
        assert values["hdfs.raw.dateFormat"] == "yyyy/MM/dd"
        assert values["retry.max"] == 1

    def test_last_assignment_wins_and_optional_env(self, monkeypatch):
        text = """
            retry.max = 3
            retry.max = ${?AMADOU_RETRY_MAX_TESTKEY}
        """
        monkeypatch.delenv("AMADOU_RETRY_MAX_TESTKEY", raising=False)
        assert parse_hocon(text)["retry.max"] == 3
        monkeypatch.setenv("AMADOU_RETRY_MAX_TESTKEY", "7")
        assert parse_hocon(text)["retry.max"] == 7

    def test_string_interpolation(self):
        values = parse_hocon(
            """
            deploy.environment = dev
            kafka {
              topic.prefix = spark-etl-${deploy.environment}
            }
            """
        )
        assert values["kafka.topic.prefix"] == "spark-etl-dev"

    def test_required_substitution_missing_raises(self):
        with pytest.raises(KeyError, match="no.such.path"):
            parse_hocon("a = ${no.such.path}")

    def test_comments_types_and_unbalanced(self):
        values = parse_hocon(
            """
            # hash comment
            // slash comment
            flag = true            # trailing comment
            ratio = 0.5
            name = "local[*]"      // trailing too
            unquoted = 20 minutes
            """
        )
        assert values == {
            "flag": True,
            "ratio": 0.5,
            "name": "local[*]",
            "unquoted": "20 minutes",
        }
        with pytest.raises(ValueError, match="unbalanced"):
            parse_hocon("a {\n b = 1\n")


class TestPropertiesReader:
    def test_parse_properties_formats(self):
        props = parse_properties(
            """
            # comment
            ! also comment
            user=john
            pass: secret
            url jdbc:postgresql:testdb
            """
        )
        assert props == {
            "user": "john",
            "pass": "secret",
            "url": "jdbc:postgresql:testdb",
        }

    # --- the three ConfigLoaderSpec cases (ConfigLoaderSpec.scala:30-68)

    def test_load_from_given_path(self, tmp_path):
        f = tmp_path / "config-reader-spec.properties"
        f.write_text("user=john\npass=secret\n")
        config = Config(
            {"database.url": "jdbc:postgresql:testdb", "database.properties": str(f)}
        )
        props = properties_from_config(config, "database.properties")
        assert len(props) == 2
        assert props["user"] == "john"
        assert props["pass"] == "secret"

    def test_empty_when_no_path_given(self):
        config = Config({"database.url": "jdbc:postgresql:testdb"})
        assert properties_from_config(config, "database.properties") == {}

    def test_fail_when_path_does_not_exist(self):
        config = Config({"database.properties": "does-not-exist.properties"})
        with pytest.raises(FileNotFoundError):
            properties_from_config(config, "database.properties")


class TestLayeredFiles:
    def test_conf_file_via_load_config_with_env_layer(self, tmp_path, monkeypatch):
        (tmp_path / "app.conf").write_text("retry.max = 9\nspark.master = local[2]\n")
        (tmp_path / "app.prod.conf").write_text("retry.max = 12\n")
        monkeypatch.setenv("DEPLOY_ENVIRONMENT", "prod")
        config = load_config(tmp_path / "app.conf")
        assert config["retry.max"] == 12  # env layer wins
        assert config["spark.master"] == "local[2]"  # base survives
        assert config.spark_conf()["spark.master"] == "local[2]"

    def test_read_config_file_dispatch(self, tmp_path):
        (tmp_path / "a.json").write_text('{"x": {"y": 1}}')
        (tmp_path / "b.properties").write_text("k=v\n")
        (tmp_path / "c.conf").write_text("k {\n  z = true\n}\n")
        assert read_config_file(tmp_path / "a.json") == {"x.y": 1}
        assert read_config_file(tmp_path / "b.properties") == {"k": "v"}
        assert read_config_file(tmp_path / "c.conf") == {"k.z": True}
        with pytest.raises(FileNotFoundError):
            load_properties(tmp_path / "missing.properties")
