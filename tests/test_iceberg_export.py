"""Iceberg v1 metadata export: spec compliance checked with the bundled
*independent* Apache Avro Java decoder (avro-1.12.1.jar via py4j), data
parity checked by reading the manifest-listed parquet through DuckDB.

``iceberg_scan`` itself cannot run here (the DuckDB extension needs a
network download — environment boundary documented in
``iceberg_export.py``); the walk below performs exactly the reads an
Iceberg engine performs: version-hint -> metadata.json -> manifest list
(Avro) -> manifests (Avro) -> data files.
Reference contract: serve.md:199-213 (catalog sink any engine can read).
"""

from __future__ import annotations

import json
from pathlib import Path

import duckdb
import pytest

from duckdb_otlp_spark.catalog import SnapshotCatalog
from duckdb_otlp_spark.iceberg_export import (
    IcebergExporter,
    spark_to_iceberg_schema,
    write_avro_ocf,
)


def read_avro_jvm(spark, path: Path) -> list:
    """Decode an Avro OCF with the Apache Avro *Java* implementation."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(path)),
        jvm.org.apache.avro.generic.GenericDatumReader())
    out = []
    while reader.hasNext():
        out.append(reader.next())
    reader.close()
    return out


def _commit_batch(spark, cat: SnapshotCatalog, table: str, rows):
    df = spark.createDataFrame(
        rows, "time_unix_nano timestamp_ntz, service_name string, body string")
    entries = cat.stage_dataframe(df.coalesce(2), table)
    cat.commit(add={table: entries}, schemas={table: df.schema.json()})
    return df


@pytest.fixture()
def exported(spark, tmp_path):
    from datetime import datetime
    cat = SnapshotCatalog(tmp_path / "cat")
    rows = [(datetime(2024, 1, 1, 0, 0, i), f"svc-{i % 3}", f"line {i}")
            for i in range(20)]
    _commit_batch(spark, cat, "otlp_logs", rows)
    meta_dir = IcebergExporter(cat).export_table("otlp_logs")
    return cat, meta_dir, rows


def _walk(spark, meta_dir: Path):
    """version-hint -> metadata.json -> manifest list -> manifests."""
    version = int((meta_dir / "version-hint.text").read_text())
    meta = json.loads((meta_dir / f"v{version}.metadata.json").read_text())
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    manifest_list = read_avro_jvm(spark, Path(snap["manifest-list"]))
    data_files = []
    for mf in manifest_list:
        mpath = Path(str(mf.get("manifest_path")))
        assert mpath.stat().st_size == mf.get("manifest_length")
        for entry in read_avro_jvm(spark, mpath):
            assert entry.get("status") == 1
            data_files.append(entry.get("data_file"))
    return meta, data_files


def test_metadata_json_is_v1_complete(spark, exported):
    _, meta_dir, _ = exported
    meta, _ = _walk(spark, meta_dir)
    for key in ("format-version", "table-uuid", "location",
                "last-updated-ms", "last-column-id", "schema", "schemas",
                "current-schema-id", "partition-specs", "default-spec-id",
                "sort-orders", "default-sort-order-id",
                "current-snapshot-id", "snapshots", "snapshot-log"):
        assert key in meta, key
    assert meta["format-version"] == 1
    ids = [f["id"] for f in meta["schema"]["fields"]]
    assert ids == sorted(set(ids))  # unique, ascending field-ids
    assert meta["last-column-id"] >= max(ids)
    names = [f["name"] for f in meta["schema"]["fields"]]
    assert names == ["time_unix_nano", "service_name", "body"]
    assert meta["schema"]["fields"][0]["type"] == "timestamp"


def test_manifest_walk_matches_catalog(spark, exported):
    cat, meta_dir, _ = exported
    _, data_files = _walk(spark, meta_dir)
    listed = {str(df.get("file_path")) for df in data_files}
    expected = {str(cat.root / e.path) for e in cat.table_files("otlp_logs")}
    assert listed == expected
    rows_by_path = {str(df.get("file_path")): df.get("record_count")
                    for df in data_files}
    for e in cat.table_files("otlp_logs"):
        assert rows_by_path[str(cat.root / e.path)] == e.rows
    for df in data_files:
        assert str(df.get("file_format")) == "PARQUET"
        assert df.get("file_size_in_bytes") == \
            Path(str(df.get("file_path"))).stat().st_size


def test_duckdb_reads_manifested_data(spark, exported):
    cat, meta_dir, _ = exported
    _, data_files = _walk(spark, meta_dir)
    paths = sorted(str(df.get("file_path")) for df in data_files)
    con = duckdb.connect()
    got = sorted(con.execute(
        "SELECT service_name, body FROM read_parquet($1)",
        [paths]).fetchall())
    want = sorted(
        (r["service_name"], r["body"])
        for r in cat.read_table(spark, "otlp_logs").collect())
    assert got == want


def test_export_is_incremental(spark, tmp_path):
    from datetime import datetime
    cat = SnapshotCatalog(tmp_path / "cat")
    rows1 = [(datetime(2024, 1, 1), "a", "x")]
    _commit_batch(spark, cat, "otlp_logs", rows1)
    exp = IcebergExporter(cat)
    meta_dir = exp.export_table("otlp_logs")
    first_avros = {p.name: p.read_bytes() for p in meta_dir.glob("m-*.avro")}
    assert first_avros

    rows2 = [(datetime(2024, 1, 2), "b", "y")]
    _commit_batch(spark, cat, "otlp_logs", rows2)
    exp.export_table("otlp_logs")
    # the first manifest's avro twin is byte-identical (immutable, reused)
    for name, blob in first_avros.items():
        assert (meta_dir / name).read_bytes() == blob
    assert len(list(meta_dir.glob("m-*.avro"))) == len(first_avros) + 1
    assert int((meta_dir / "version-hint.text").read_text()) == 2
    # the new snapshot's walk covers both commits
    _, data_files = _walk(spark, meta_dir)
    assert sum(df.get("record_count") for df in data_files) == 2


def test_avro_writer_roundtrips_via_java(spark, tmp_path):
    """Unit-level: every Avro shape the manifests use, decoded by Java."""
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "empty", "type": {
                "type": "record", "name": "e", "fields": []}},
        ]}
    records = [
        {"s": "héllo", "n": -(2**62), "i": 7, "opt": None,
         "arr": ["a", "b"], "empty": {}},
        {"s": "", "n": 2**62, "i": -1, "opt": 42, "arr": [], "empty": {}},
    ]
    path = tmp_path / "t.avro"
    write_avro_ocf(path, schema, records, metadata={"k": "v"})
    got = read_avro_jvm(spark, path)
    assert len(got) == 2
    assert str(got[0].get("s")) == "héllo"
    assert got[0].get("n") == -(2**62)
    assert got[0].get("opt") is None
    assert [str(x) for x in got[0].get("arr")] == ["a", "b"]
    assert got[1].get("opt") == 42
    assert got[1].get("i") == -1


def test_server_catalog_sink_exports_iceberg(spark, tmp_path):
    """End-to-end: a sealed catalog-sink listener publishes Iceberg
    metadata an engine can walk."""
    import gzip
    import json as _json
    import urllib.request

    from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
    from duckdb_otlp_spark.streaming.server import _get

    env = {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": "1700000000000000000",
         "body": {"stringValue": "iceberg e2e"}}]}]}]}
    info = otlp_serve(spark, "otlp://127.0.0.1:0",
                      work_dir=str(tmp_path / "work"),
                      disable_auth=True, sink="catalog",
                      warm_start=False).collect()[0]
    try:
        body = gzip.compress(_json.dumps(env).encode())
        req = urllib.request.Request(
            f"{info['url']}/v1/logs", data=body,
            headers={"Content-Type": "application/json",
                     "Content-Encoding": "gzip"})
        assert urllib.request.urlopen(req).status == 202
        server = _get(info["uri"])
        server.flush()
        meta_dir = server.export_root / "otlp_logs" / "metadata"
        assert (meta_dir / "version-hint.text").exists()
        _, data_files = _walk(spark, meta_dir)
        assert sum(df.get("record_count") for df in data_files) == 1
        con = duckdb.connect()
        got = con.execute(
            "SELECT body FROM read_parquet($1)",
            [[str(df.get("file_path")) for df in data_files]]).fetchall()
        assert got == [("iceberg e2e",)]
    finally:
        otlp_stop(spark, info["uri"], drain=False)
