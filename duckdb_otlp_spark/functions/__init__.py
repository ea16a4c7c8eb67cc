from duckdb_otlp_spark.functions.uri import (  # noqa: F401
    OtlpUri,
    otlp_uri_parser,
    parse_otlp_uri,
)
