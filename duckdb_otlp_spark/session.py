"""SparkSession factory tuned for this engine.

Local tests run on ``local[N]``; the configs below are the ones that
also matter on a real cluster (AQE, skew-join handling, partition
sizing, Arrow transfer). UTC + NTZ timestamps keep results comparable
with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "duckdb-otlp-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Spark has no ns-precision timestamp; surface parquet NANOS as raw
        # long ns (the same compromise the reference documents, schemas.md:182)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ~128 MiB scan partitions: matches the reference's own seal/file sizing
        # and keeps task counts sane at 100 TB (reference: otlp_ingest_limits.hpp).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv6Addresses=false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
