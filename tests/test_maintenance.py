"""Compaction / layout-maintenance tests (reference two-tier model:
bounded merge + sort-cluster/bloom rewrite + retention —
otlp_server.cpp:1273-1387, otlp-compaction-probe/README.md:16-91).
"""

from __future__ import annotations

from datetime import date


import pytest
from pyspark.sql import functions as F

from duckdb_otlp_spark.streaming.maintenance import (
    compact_table,
    expire_partitions,
    rewrite_clustered,
)


@pytest.fixture()
def export_tree(spark, tmp_path):
    """A partitioned logs export with many small files per partition."""
    root = tmp_path / "export"
    for day, n_appends in (("01", 4), ("02", 3)):
        for i in range(n_appends):
            df = spark.range(5).select(
                (F.col("id") + i * 10).alias("row_id"),
                F.lit(f"svc-{i % 2}").alias("service_name"),
                (F.col("id") * 1000 + i).alias("time_unix_nano"),
                F.md5(F.col("id").cast("string")).alias("trace_id"))
            (df.coalesce(1).write.mode("append")
             .parquet(str(root / "otlp_logs" / "year=2024" / "month=01" / f"day={day}")))
    return root


def _files(root, table="otlp_logs"):
    return sorted((root / table).glob("year=*/month=*/day=*/*.parquet"))


def test_compact_merges_small_files(spark, export_tree):
    before = _files(export_tree)
    assert len(before) == 7
    total_before = spark.read.parquet(str(export_tree / "otlp_logs")).count()

    res = compact_table(spark, export_tree, "otlp_logs")
    assert res.partitions_examined == 2
    assert res.partitions_compacted == 2
    after = _files(export_tree)
    assert len(after) == 2  # one merged file per partition
    df = spark.read.parquet(str(export_tree / "otlp_logs"))
    assert df.count() == total_before
    # partition columns survive the rewrite
    assert df.filter("day = 1").count() == 20


def test_compact_skips_at_target_partitions(spark, export_tree):
    compact_table(spark, export_tree, "otlp_logs")
    res2 = compact_table(spark, export_tree, "otlp_logs")
    # steady state: nothing to merge, O(new) per cycle
    assert res2.partitions_compacted == 0


def test_rewrite_clustered_sorts_and_writes_blooms(spark, export_tree):
    total = spark.read.parquet(str(export_tree / "otlp_logs")).count()
    res = rewrite_clustered(spark, export_tree, "otlp_logs")
    assert res.partitions_compacted == 2
    files = _files(export_tree)
    assert len(files) == 2
    assert spark.read.parquet(str(export_tree / "otlp_logs")).count() == total

    # rows inside each file are clustered by (service_name, time_unix_nano)
    pdf = spark.read.parquet(str(files[0])).toPandas()
    ordered = pdf.sort_values(["service_name", "time_unix_nano"]).reset_index(drop=True)
    assert pdf.reset_index(drop=True).equals(ordered)


def test_rewrite_writes_bloom_on_high_cardinality(spark, tmp_path):
    """parquet-mr materializes a bloom filter only when the column falls
    back from dictionary encoding — exactly the high-cardinality
    trace_id case the reference's probe targeted. Presence is asserted
    via footprint (local duckdb predates the bloom metadata columns)."""
    root = tmp_path / "export"
    df = spark.range(60_000).select(
        F.lit("svc").alias("service_name"),
        F.col("id").alias("time_unix_nano"),
        F.md5(F.col("id").cast("string")).alias("trace_id"))
    (df.coalesce(1).write.mode("append")
     .parquet(str(root / "otlp_logs" / "year=2024" / "month=01" / "day=01")))

    rewrite_clustered(spark, root, "otlp_logs")
    with_bloom = sum(f.stat().st_size for f in _files(root))
    rewrite_clustered(spark, root, "otlp_logs", bloom_cols=())
    without_bloom = sum(f.stat().st_size for f in _files(root))
    assert with_bloom > without_bloom


def test_expire_partitions(spark, export_tree):
    res = expire_partitions(export_tree, "otlp_logs", older_than_days=30,
                            today=date(2024, 2, 1))
    # cutoff = 2024-01-02: day=01 expires, day=02 is exactly at cutoff and stays
    assert res.partitions_expired == 1
    remaining = _files(export_tree)
    assert all("day=02" in str(f) for f in remaining)
    assert spark.read.parquet(str(export_tree / "otlp_logs")).count() == 15


def test_compact_table_mixed_schema_falls_back_to_spark(spark, tmp_path):
    """A leaf partition mixing files with different schemas (promoted
    column added between seals) must still compact — the pyarrow fast
    path cannot concat unequal schemas, so the cycle falls back to the
    schema-merging Spark merge instead of crashing."""
    from duckdb_otlp_spark.streaming.maintenance import compact_table

    leaf = tmp_path / "otlp_logs" / "year=2024" / "month=01" / "day=01"
    leaf.mkdir(parents=True)
    a = spark.createDataFrame([(1, "x")], "id long, body string")
    b = spark.createDataFrame([(2, "y", "svc")],
                              "id long, body string, service_name string")
    for i, df in enumerate((a, b)):
        stage = tmp_path / f"_s{i}"
        df.coalesce(1).write.parquet(str(stage))
        for f in stage.glob("*.parquet"):
            f.rename(leaf / f"seal_{i}.parquet")
    res = compact_table(spark, tmp_path, "otlp_logs")
    assert res.partitions_compacted == 1
    out = spark.read.parquet(str(leaf))
    assert out.count() == 2
    assert "service_name" in out.columns


def test_compact_graduated_files_never_remerge(spark, tmp_path):
    """An output in (target/2, target] must graduate — re-selecting it
    re-merges the partition's whole accumulated data every cycle
    (O(table) instead of O(new)), which on the live server starves
    seals and backs admission up to 503s minutes into a sustained run
    (r7 root cause). Sub-half-target files still merge."""
    root = tmp_path / "export"
    part = root / "otlp_logs" / "year=2024" / "month=01" / "day=01"
    for i in range(4):
        df = spark.range(200 if i == 0 else 5).select(
            (F.col("id") + i * 1000).alias("row_id"),
            F.lit("svc").alias("service_name"),
            (F.col("id") * 1000 + i).alias("time_unix_nano"),
            F.md5(F.col("id").cast("string")).alias("trace_id"))
        df.coalesce(1).write.mode("append").parquet(str(part))
    files = sorted(part.glob("*.parquet"), key=lambda f: -f.stat().st_size)
    big, smalls = files[0], files[1:]
    # pick target so big is in (target/2, target] and smalls are under
    target = big.stat().st_size * 2 - 1
    assert all(f.stat().st_size < target // 2 for f in smalls)
    total = spark.read.parquet(str(root / "otlp_logs")).count()

    res = compact_table(spark, root, "otlp_logs", target_file_bytes=target)
    assert res.partitions_compacted == 1
    assert big.exists()                       # graduated file untouched
    remaining = set(part.glob("*.parquet"))
    assert big in remaining and len(remaining) == 2  # big + merged smalls
    assert spark.read.parquet(str(root / "otlp_logs")).count() == total

    res2 = compact_table(spark, root, "otlp_logs", target_file_bytes=target)
    assert res2.partitions_compacted == 0     # steady state: O(new)=0
