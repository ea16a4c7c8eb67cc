"""Snapshot-catalog contracts: atomic multi-table commit, snapshot
isolation / time travel, manifest-stats file pruning, optimistic
concurrency, compaction, retention, vacuum — the catalog-sink semantics
of the reference's SealCatalog path (reference: src/otlp_server.cpp:
1109-1271) re-expressed as a manifest log over parquet.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from duckdb_otlp_spark.catalog import CommitConflict, SnapshotCatalog


def _df(spark, lo: int, n: int, service="svc-a"):
    return (spark.range(lo, lo + n)
            .select(F.timestamp_micros((1700000000_000000 + F.col("id") * 1_000_000)
                                       .cast("long")).cast("timestamp_ntz")
                    .alias("time_unix_nano"),
                    F.lit(service).alias("service_name"),
                    F.col("id").alias("v")))


@pytest.fixture()
def cat(tmp_path):
    return SnapshotCatalog(tmp_path / "cat")


def test_empty_catalog_reads_empty(spark, cat):
    assert cat.current_snapshot_id() == 0
    assert cat.table_files("otlp_logs") == []
    assert cat.read_table(spark, "otlp_logs").count() == 0


def test_stage_then_commit_is_atomic_and_multi_table(spark, cat):
    logs = _df(spark, 0, 10).coalesce(1)
    gauge = _df(spark, 100, 5).coalesce(1)
    e_logs = cat.stage_dataframe(logs, "otlp_logs")
    # staged but uncommitted: invisible
    assert cat.read_table(spark, "otlp_logs").count() == 0
    e_gauge = cat.stage_dataframe(gauge, "otlp_metrics_gauge")
    seq = cat.commit(add={"otlp_logs": e_logs, "otlp_metrics_gauge": e_gauge},
                     schemas={"otlp_logs": logs.schema.json(),
                              "otlp_metrics_gauge": gauge.schema.json()})
    assert seq == 1
    # one commit made BOTH tables visible (metrics-fan-out contract)
    assert cat.read_table(spark, "otlp_logs").count() == 10
    assert cat.read_table(spark, "otlp_metrics_gauge").count() == 5
    assert sum(e.rows for e in e_logs) == 10


def test_snapshot_isolation_and_time_travel(spark, cat):
    e1 = cat.stage_dataframe(_df(spark, 0, 4).coalesce(1), "otlp_logs")
    s1 = cat.commit(add={"otlp_logs": e1},
                    schemas={"otlp_logs": _df(spark, 0, 1).schema.json()})
    e2 = cat.stage_dataframe(_df(spark, 4, 6).coalesce(1), "otlp_logs")
    s2 = cat.commit(add={"otlp_logs": e2})
    assert (s1, s2) == (1, 2)
    assert cat.read_table(spark, "otlp_logs", snapshot_id=s1).count() == 4
    assert cat.read_table(spark, "otlp_logs", snapshot_id=s2).count() == 10
    assert cat.read_table(spark, "otlp_logs").count() == 10


def test_manifest_stats_prune_files(spark, cat):
    # two files with disjoint hour-long time ranges
    for lo in (0, 36000):
        e = cat.stage_dataframe(_df(spark, lo, 10).coalesce(1), "otlp_logs")
        cat.commit(add={"otlp_logs": e},
                   schemas={"otlp_logs": _df(spark, 0, 1).schema.json()})
    assert len(cat.table_files("otlp_logs")) == 2
    lo_us = 1700000000_000000
    pruned = cat.read_table(spark, "otlp_logs",
                            time_range=(lo_us, lo_us + 9_000_000))
    assert len(pruned.inputFiles()) == 1          # planning-time prune
    assert pruned.count() == 10
    # datetime bounds work too
    pruned2 = cat.read_table(
        spark, "otlp_logs",
        time_range=(datetime(2023, 11, 14), datetime(2023, 11, 16)))
    assert len(pruned2.inputFiles()) == 2
    # service equality prune: different service lands in its own file
    e = cat.stage_dataframe(_df(spark, 0, 3, service="svc-z").coalesce(1),
                            "otlp_logs")
    cat.commit(add={"otlp_logs": e})
    only_z = cat.read_table(spark, "otlp_logs", equals={"service_name": "svc-z"})
    assert len(only_z.inputFiles()) == 1
    assert only_z.count() == 3


def test_schema_evolution_promotion(spark, cat):
    base = _df(spark, 0, 3).coalesce(1)
    cat.commit(add={"otlp_logs": cat.stage_dataframe(base, "otlp_logs")},
               schemas={"otlp_logs": base.schema.json()})
    wide = base.withColumn("resource_attr_env", F.lit("prod"))
    cat.commit(add={"otlp_logs": cat.stage_dataframe(wide, "otlp_logs")},
               schemas={"otlp_logs": wide.schema.json()})
    got = cat.read_table(spark, "otlp_logs")
    assert "resource_attr_env" in got.columns
    # old files surface NULL for the promoted column, new files the value
    vals = sorted((r["resource_attr_env"] or "-") for r in got.collect())
    assert vals == ["-", "-", "-", "prod", "prod", "prod"]


def test_optimistic_concurrency_parallel_commits(spark, cat):
    staged = [cat.stage_dataframe(_df(spark, i * 10, 10).coalesce(1), "otlp_logs")
              for i in range(6)]
    errs: list[Exception] = []

    def worker(entries):
        try:
            cat.commit(add={"otlp_logs": entries})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in staged]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert cat.current_snapshot_id() == 6
    schema_json = _df(spark, 0, 1).schema.json()
    cat.commit(schemas={"otlp_logs": schema_json})
    assert cat.read_table(spark, "otlp_logs").count() == 60


def test_compaction_swaps_atomically_and_vacuum_reclaims(spark, cat):
    schema_json = _df(spark, 0, 1).schema.json()
    for i in range(5):
        e = cat.stage_dataframe(_df(spark, i * 10, 10).coalesce(1), "otlp_logs")
        cat.commit(add={"otlp_logs": e}, schemas={"otlp_logs": schema_json})
    before = cat.table_files("otlp_logs")
    assert len(before) == 5
    res = cat.compact(spark, "otlp_logs")
    assert res["files_in"] == 5 and res["files_out"] == 1
    after = cat.table_files("otlp_logs")
    assert len(after) == 1
    assert cat.read_table(spark, "otlp_logs").count() == 50
    # pre-compaction snapshot still readable (old files still on disk)
    assert cat.read_table(spark, "otlp_logs",
                          snapshot_id=res["snapshot"] - 1).count() == 50
    # expire history, then vacuum unreferenced files immediately (grace 0)
    cat.expire_snapshots(keep_last=1)
    gone = cat.vacuum(grace_seconds=0)
    assert gone["data_files_removed"] == 5
    assert cat.read_table(spark, "otlp_logs").count() == 50


def test_remove_conflict_raises(spark, cat):
    e = cat.stage_dataframe(_df(spark, 0, 10).coalesce(1), "otlp_logs")
    cat.commit(add={"otlp_logs": e},
               schemas={"otlp_logs": _df(spark, 0, 1).schema.json()})
    cat.commit(remove={"otlp_logs": [e[0].path]}, operation="expire")
    with pytest.raises(CommitConflict):
        cat.commit(remove={"otlp_logs": [e[0].path]}, operation="expire")


def test_expire_files_by_time(spark, cat):
    schema_json = _df(spark, 0, 1).schema.json()
    for lo in (0, 86400):  # day 1, day 2
        e = cat.stage_dataframe(_df(spark, lo, 10).coalesce(1), "otlp_logs")
        cat.commit(add={"otlp_logs": e}, schemas={"otlp_logs": schema_json})
    cutoff = 1700000000_000000 + 86400 * 1_000_000
    res = cat.expire_files("otlp_logs", cutoff)
    assert res["files_expired"] == 1
    assert cat.read_table(spark, "otlp_logs").count() == 10


def test_aborted_stage_leaves_no_trace_and_is_vacuumable(spark, cat):
    e = cat.stage_dataframe(_df(spark, 0, 10).coalesce(1), "otlp_logs")
    assert len(e) == 1  # staged file exists on disk...
    assert cat.read_table(spark, "otlp_logs").count() == 0  # ...but invisible
    gone = cat.vacuum(grace_seconds=0)
    assert gone["data_files_removed"] == 1


def test_manifest_log_is_o_new_per_append(spark, cat):
    """Append commits must not rewrite prior manifests (O(new) commits)."""
    schema_json = _df(spark, 0, 1).schema.json()
    for i in range(3):
        e = cat.stage_dataframe(_df(spark, i * 10, 10).coalesce(1), "otlp_logs")
        cat.commit(add={"otlp_logs": e}, schemas={"otlp_logs": schema_json})
    snaps = cat.snapshots()
    m1 = snaps[0]["tables"]["otlp_logs"]["manifests"]
    m3 = snaps[2]["tables"]["otlp_logs"]["manifests"]
    assert len(m1) == 1 and len(m3) == 3
    assert m3[:1] == m1  # parent manifests reused by name, not rewritten
    # stats present in manifest entries
    doc = json.loads((cat.meta_dir / m1[0]).read_text())
    st = doc["entries"][0]["stats"]
    assert "time_unix_nano" in st and "service_name" in st
