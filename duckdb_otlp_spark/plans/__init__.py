from duckdb_otlp_spark.plans.audit import (  # noqa: F401
    PlanReport,
    audit,
)
