"""Target-table create/validate contracts for the catalog sink (A29),
mirroring the reference's otlp_serve validation errors
(reference: src/otlp_server.cpp:455-526, test/sql/otlp_serve.test):
leading-prefix (name + type, in order) validation with trailing extra
columns allowed, create_tables=false fail-fast, and NULL-filling of
extra columns the seal does not populate.
"""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_otlp_spark.catalog import SnapshotCatalog
from duckdb_otlp_spark.schemas import LOGS_SCHEMA
from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
from tests.fixtures import LOGS_SIMPLE


def _serve(spark, tmp_path, **kw):
    return otlp_serve(spark, "otlp://127.0.0.1:0", work_dir=str(tmp_path / "work"),
                      export_root=str(tmp_path / "cat"), disable_auth=True,
                      seal_max_age_ms=500, sink="catalog", warm_start=False, **kw)


def _post_log(url, env):
    req = urllib.request.Request(
        url + "/v1/logs", data=json.dumps(env).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status


def test_create_tables_false_fails_fast(spark, tmp_path):
    with pytest.raises(ValueError, match="otlp_logs is not available"):
        _serve(spark, tmp_path, create_tables=False)


def test_create_tables_registers_schemas(spark, tmp_path):
    info = _serve(spark, tmp_path).collect()[0]
    try:
        cat = SnapshotCatalog(tmp_path / "cat")
        schema = cat.table_schema("otlp_logs")
        assert schema is not None
        assert [f.name for f in schema.fields] == \
            [f.name for f in LOGS_SCHEMA.fields]
        assert cat.table_schema("otlp_metrics_exp_histogram") is not None
    finally:
        otlp_stop(spark, info["uri"], drain=False)


def test_wrong_leading_column_name_rejected(spark, tmp_path):
    bad = T.StructType([T.StructField("not_time", T.TimestampNTZType())]
                       + list(LOGS_SCHEMA.fields[1:]))
    SnapshotCatalog(tmp_path / "cat").commit(schemas={"otlp_logs": bad.json()})
    with pytest.raises(ValueError, match="column 0 is not_time, expected time_unix_nano"):
        _serve(spark, tmp_path)


def test_wrong_column_type_rejected(spark, tmp_path):
    fields = list(LOGS_SCHEMA.fields)
    fields[2] = T.StructField("trace_id", T.LongType())  # should be string
    SnapshotCatalog(tmp_path / "cat").commit(
        schemas={"otlp_logs": T.StructType(fields).json()})
    with pytest.raises(ValueError, match="trace_id has type bigint, expected string"):
        _serve(spark, tmp_path)


def test_too_few_columns_rejected(spark, tmp_path):
    narrow = T.StructType(list(LOGS_SCHEMA.fields[:5]))
    SnapshotCatalog(tmp_path / "cat").commit(schemas={"otlp_logs": narrow.json()})
    with pytest.raises(ValueError, match="has 5 columns, expected at least 18"):
        _serve(spark, tmp_path)


def test_wider_table_validates_and_seal_null_fills(spark, tmp_path):
    """A pre-promoted (wider) table validates as a leading prefix, and a
    seal that does not populate the extra column NULL-fills it — the
    reference's column-targeting write path."""
    wide = T.StructType(list(LOGS_SCHEMA.fields)
                        + [T.StructField("resource_attr_host_name", T.StringType())])
    SnapshotCatalog(tmp_path / "cat").commit(schemas={"otlp_logs": wide.json()})
    info = _serve(spark, tmp_path).collect()[0]  # no promotion configured
    try:
        from duckdb_otlp_spark.streaming.server import _get
        srv = _get(info["uri"])
        assert _post_log(srv.uri.url, LOGS_SIMPLE[0]) == 202
        srv.flush()
        df = srv.read_table("otlp_logs")
        assert "resource_attr_host_name" in df.columns
        rows = df.select("body", "resource_attr_host_name").collect()
        assert len(rows) == 1
        assert rows[0]["resource_attr_host_name"] is None
        # stored schema stays the wider one after the narrow seal
        assert SnapshotCatalog(tmp_path / "cat").table_schema(
            "otlp_logs").fieldNames()[-1] == "resource_attr_host_name"
    finally:
        otlp_stop(spark, info["uri"], drain=False)


def test_promotion_columns_created_in_schema(spark, tmp_path):
    info = _serve(spark, tmp_path,
                  promote_resource=["service.name"]).collect()[0]
    try:
        schema = SnapshotCatalog(tmp_path / "cat").table_schema("otlp_logs")
        assert schema.fieldNames()[-1] == "resource_attr_service_name"
        # restart-style validation against the already-promoted catalog
        from duckdb_otlp_spark.streaming.server import OtlpSparkServer
        again = OtlpSparkServer(spark, "otlp://127.0.0.1:0",
                                work_dir=str(tmp_path / "work2"),
                                export_root=str(tmp_path / "cat"),
                                disable_auth=True, sink="catalog",
                                promote_resource=["service.name"])
        again._ensure_target_tables()  # must not raise
    finally:
        otlp_stop(spark, info["uri"], drain=False)
