from duckdb_otlp_spark.operators.dedup import (  # noqa: F401
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    simhash_bits,
    simhash_hamming,
    simhash_pairs,
)
from duckdb_otlp_spark.operators.joins import (  # noqa: F401
    asof_join,
    range_join,
)
from duckdb_otlp_spark.operators.pipeline import (  # noqa: F401
    annotate_quality,
    clean_corpus,
    contamination_screen,
)
from duckdb_otlp_spark.operators.similarity import (  # noqa: F401
    build_ivf_index,
    cosine,
    cosine_topk,
    cosine_topk_batched,
    ivf_search,
)
from duckdb_otlp_spark.operators.text import (  # noqa: F401
    lang_id,
    profile_documents,
    quality_score,
    token_count,
)
