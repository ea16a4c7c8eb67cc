"""read_iceberg round-trip: the from-scratch Avro/metadata walk in
``iceberg_scan`` must (a) decode byte-identically to the independent
Apache Avro *Java* implementation, (b) hand Spark exactly the committed
rows, and (c) time-travel across export versions/snapshots — the full
external-engine contract the exporter promises
(reference: site/reference/serve.md:199-213)."""

from __future__ import annotations

import json

import pytest

from duckdb_otlp_spark.catalog import SnapshotCatalog
from duckdb_otlp_spark.iceberg_export import IcebergExporter
from duckdb_otlp_spark.iceberg_scan import (iceberg_data_files,
                                            load_table_metadata,
                                            read_avro_ocf, read_iceberg)
from tests.test_iceberg_export import _commit_batch, read_avro_jvm


@pytest.fixture()
def two_version_table(spark, tmp_path):
    from datetime import datetime
    cat = SnapshotCatalog(tmp_path / "cat")
    rows1 = [(datetime(2024, 1, 1, 0, 0, i), f"svc-{i % 3}", f"line {i}")
             for i in range(20)]
    _commit_batch(spark, cat, "otlp_logs", rows1)
    exp = IcebergExporter(cat)
    meta_dir = exp.export_table("otlp_logs")
    rows2 = [(datetime(2024, 1, 2, 0, 0, i), f"svc-{i % 3}", f"late {i}")
             for i in range(15)]
    _commit_batch(spark, cat, "otlp_logs", rows2)
    exp.export_table("otlp_logs")
    return meta_dir, rows1, rows2


def test_avro_decoder_matches_java_implementation(spark, two_version_table):
    """Every Avro file the exporter wrote decodes to the same records
    through the from-scratch Python decoder and the Apache Avro Java
    decoder — field by field, via the Java objects' JSON rendering."""
    meta_dir, _, _ = two_version_table
    avro_files = sorted(meta_dir.glob("*.avro"))
    assert avro_files, "exporter wrote no avro files?"
    for path in avro_files:
        _, py_records = read_avro_ocf(path)
        jvm_records = [json.loads(r.toString())
                       for r in read_avro_jvm(spark, path)]
        assert py_records == jvm_records, path.name


def test_read_iceberg_round_trips_committed_rows(spark, two_version_table):
    meta_dir, rows1, rows2 = two_version_table
    got = sorted((r["time_unix_nano"], r["service_name"], r["body"])
                 for r in read_iceberg(spark, meta_dir).collect())
    assert got == sorted(rows1 + rows2)


def test_read_iceberg_time_travel(spark, two_version_table):
    """version= addresses an export generation; snapshot_id= addresses
    the snapshot inside it — both must reproduce the first commit
    exactly, after the table has moved on."""
    meta_dir, rows1, rows2 = two_version_table
    v1 = sorted((r["time_unix_nano"], r["service_name"], r["body"])
                for r in read_iceberg(spark, meta_dir, version=1).collect())
    assert v1 == sorted(rows1)

    sid = load_table_metadata(meta_dir, version=1)["current-snapshot-id"]
    by_snap = sorted(
        (r["time_unix_nano"], r["service_name"], r["body"])
        for r in read_iceberg(spark, meta_dir, snapshot_id=sid).collect())
    assert by_snap == v1

    # the walk itself: v2 references strictly more live files than v1
    f1 = iceberg_data_files(meta_dir, version=1)
    f2 = iceberg_data_files(meta_dir)
    assert {f["file_path"] for f in f1} < {f["file_path"] for f in f2}
    assert sum(f["record_count"] for f in f2) == len(rows1) + len(rows2)


def test_unknown_snapshot_and_version_raise(spark, two_version_table):
    meta_dir, _, _ = two_version_table
    with pytest.raises(LookupError):
        iceberg_data_files(meta_dir, snapshot_id=999_999)
    with pytest.raises(FileNotFoundError):
        load_table_metadata(meta_dir, version=99)
