from duckdb_otlp_spark.streaming.operators import (  # noqa: F401
    BandProbe,
    build_band_probe,
    contamination_screen_stream,
    dedup_stream,
    near_dedup_screen_stream,
    pii_scrub_stream,
    sessionize_stateful,
    sessionize_windowed,
    windowed_counts,
)
from duckdb_otlp_spark.streaming.server import (  # noqa: F401
    OtlpSparkServer,
    otlp_flush,
    otlp_maintenance,
    otlp_seal_list,
    otlp_serve,
    otlp_server_list,
    otlp_server_log,
    otlp_stop,
)
