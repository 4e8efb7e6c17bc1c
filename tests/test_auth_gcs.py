"""GCS connector conf + auth-plugin seam
(bigquery/.../package.scala:75-118, GoogleAuthentication.scala:33-74).
All assertions are against the live Hadoop conf / provider protocol —
no cloud needed, same as the reference's own unit coverage.
"""

from __future__ import annotations

import pytest

from amadou_spark.auth import (
    DBM_SCOPE,
    AuthProvider,
    StaticTokenAuth,
    WithTimeouts,
    register_auth,
    resolve_auth,
)
from amadou_spark.session import configure_gcs, inject_s3_credentials


class TestGcsConf:
    def _hconf(self, spark):
        return spark.sparkContext._jsc.hadoopConfiguration()

    def test_registers_fs_impl_and_project(self, spark):
        conf = self._hconf(spark)
        for key in ("fs.gs.impl", "fs.gs.project.id", "mapred.bq.project.id"):
            conf.unset(key)
        configure_gcs(spark, project_id="my-project")
        assert conf.get("fs.gs.impl") == (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
        )
        assert conf.get("fs.gs.project.id") == "my-project"
        assert conf.get("mapred.bq.project.id") == "my-project"

    def test_fs_impl_is_set_if_missing(self, spark):
        conf = self._hconf(spark)
        conf.set("fs.gs.impl", "custom.Impl")
        conf.set("fs.gs.project.id", "existing")
        configure_gcs(spark, project_id="other")
        assert conf.get("fs.gs.impl") == "custom.Impl"  # not clobbered
        assert conf.get("fs.gs.project.id") == "existing"  # not clobbered
        assert conf.get("mapred.bq.project.id") == "other"  # always forwarded
        conf.unset("fs.gs.impl")
        conf.unset("fs.gs.project.id")

    def test_json_and_pk12_keyfiles(self, spark):
        conf = self._hconf(spark)
        configure_gcs(spark, json_keyfile="/keys/svc.json", pk12_keyfile="/keys/svc.p12")
        assert conf.get("fs.gs.auth.service.account.json.keyfile") == "/keys/svc.json"
        assert conf.get("mapred.bq.auth.service.account.json.keyfile") == "/keys/svc.json"
        assert conf.get("google.cloud.auth.service.account.keyfile") == "/keys/svc.p12"
        assert conf.get("mapred.bq.auth.service.account.keyfile") == "/keys/svc.p12"
        assert conf.get("fs.gs.auth.service.account.keyfile") == "/keys/svc.p12"

    def test_s3_credentials_stay_out_of_spark_conf(self, spark):
        inject_s3_credentials(spark, "AKIA_TEST", "SECRET_TEST")
        conf = self._hconf(spark)
        assert conf.get("fs.s3a.access.key") == "AKIA_TEST"
        # never in the (logged) SparkConf
        assert "SECRET_TEST" not in dict(spark.sparkContext.getConf().getAll()).values()


class TestAuthSeam:
    def test_static_token_satisfies_protocol_and_initializes(self):
        provider = StaticTokenAuth(token="tok-1", scopes=(DBM_SCOPE,))
        assert isinstance(provider, AuthProvider)
        request: dict[str, object] = {}
        provider.initialize(request)
        assert request["authorization"] == "Bearer tok-1"

    def test_with_timeouts_wraps_like_custom_initializer(self):
        provider = WithTimeouts(StaticTokenAuth(token="t", scopes=(DBM_SCOPE,)))
        request: dict[str, object] = {}
        provider.initialize(request)
        assert request["authorization"] == "Bearer t"
        assert request["connect_timeout_s"] == 600
        assert request["read_timeout_s"] == 600
        assert provider.scopes == (DBM_SCOPE,)

    def test_registry_resolves_against_session(self, spark):
        register_auth("static-test", lambda s: StaticTokenAuth(token=s.sparkContext.appName))
        provider = resolve_auth("static-test", spark)
        request: dict[str, object] = {}
        provider.initialize(request)
        assert str(request["authorization"]).startswith("Bearer ")

    def test_unknown_scheme_raises(self, spark):
        with pytest.raises(ValueError, match="no auth provider"):
            resolve_auth("nope", spark)

    def test_dbm_requires_client_file_conf(self, spark):
        spark.conf.unset("spark.google.cloud.auth.client.file")
        with pytest.raises(ValueError, match="not configured"):
            resolve_auth("dbm", spark)

    def test_dbm_validates_file_exists_then_stops_at_flow(self, spark, tmp_path):
        secrets = tmp_path / "client.json"
        secrets.write_text("{}")
        spark.conf.set("spark.google.cloud.auth.client.file", str(secrets))
        with pytest.raises(NotImplementedError, match="OAuth"):
            resolve_auth("dbm", spark)
        spark.conf.unset("spark.google.cloud.auth.client.file")
