"""duckdb_otlp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the duckdb-otlp reference extension, plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Architecture: declarative DataFrame/SQL plans end-to-end; Catalyst supplies
the relational algebra (the reference delegates the same to DuckDB), and the
custom surface is sources (OTLP/OTAP), the streaming ingest analog, and the
pipeline operators.
"""

from duckdb_otlp_spark.schemas import (  # noqa: F401
    LOGS_SCHEMA,
    METRICS_EXP_HISTOGRAM_SCHEMA,
    METRICS_GAUGE_SCHEMA,
    METRICS_HISTOGRAM_SCHEMA,
    METRICS_SUM_SCHEMA,
    SIGNAL_SCHEMAS,
    TARGET_TABLES,
    TRACES_SCHEMA,
)
from duckdb_otlp_spark.session import get_spark  # noqa: F401
from duckdb_otlp_spark.sources.otap import (  # noqa: F401
    read_otap_logs,
    read_otap_metrics_exp_histogram,
    read_otap_metrics_gauge,
    read_otap_metrics_histogram,
    read_otap_metrics_sum,
    read_otap_traces,
)
from duckdb_otlp_spark.sources.otlp_json import (  # noqa: F401
    read_otlp_logs,
    read_otlp_metrics,
    read_otlp_metrics_exp_histogram,
    read_otlp_metrics_gauge,
    read_otlp_metrics_histogram,
    read_otlp_metrics_sum,
    read_otlp_metrics_summary,
    read_otlp_traces,
)

from duckdb_otlp_spark.operators import (  # noqa: F401
    clean_corpus,
    contamination_screen,
    cosine_topk,
    cosine_topk_batched,
    minhash_dedup,
    minhash_lsh_pairs,
)
from duckdb_otlp_spark.streaming import (  # noqa: F401
    otlp_flush,
    otlp_maintenance,
    otlp_seal_list,
    otlp_serve,
    otlp_server_list,
    otlp_stop,
    sessionize_stateful,
    sessionize_windowed,
    windowed_counts,
)
from duckdb_otlp_spark.streaming.maintenance import (  # noqa: F401
    compact_table,
    expire_partitions,
    rewrite_clustered,
)

__version__ = "0.1.0"
