from duckdb_otlp_spark.sources.otlp_json import READERS  # noqa: F401
