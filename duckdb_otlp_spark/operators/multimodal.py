"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

The Spark-side design is real and tested — schema, partition-preserving
batch iteration, UDF signatures, deterministic fake feature extraction —
while the actual media decode is stubbed: the image/audio libraries are
not in this container, so ``decode=`` defaults to a deterministic fake
and ``strict_decode=True`` raises NotImplementedError exactly where a
real decoder (PIL/ffmpeg) would plug in.

Scale notes: payloads stay in the executor as Arrow binary buffers;
mapInPandas streams record batches so one task never materializes more
than spark.sql.execution.arrow.maxRecordsPerBatch rows; metadata-only
queries never touch the binary column (parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("format", T.StringType()),      # png/jpeg/wav/mp4/...
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feature array<double>"
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: bytes -> fixed-dim
    vector from a rolling checksum. Replace with a real encoder."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 1_000_003
    return [a / 1_000_003.0 for a in acc]


def extract_features(df: DataFrame, dim: int = 8,
                     strict_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``strict_decode=True`` marks the seam where a real media decoder
    belongs; without libraries it raises NotImplementedError.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            if strict_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this "
                    "container — use the deterministic fake features")
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len),
                "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "feature": payloads.map(lambda b: _fake_feature(b, dim)),
            })

    from duckdb_otlp_spark.session import ensure_package_on_workers
    ensure_package_on_workers(df.sparkSession)
    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    computed from metadata only — the payload column is untouched, so
    Catalyst prunes it from the scan. The decode of each planned frame is
    the stubbed seam above."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return (df.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize *plan*: aspect-preserving output dimensions for every
    image whose longest side exceeds ``max_side``, computed JVM-side
    from metadata only (payload pruned from the scan). The byte
    transform itself is the stubbed decode seam (extract_features'
    strict_decode marks it); at scale the plan/filter step is what
    decides which payloads a decode stage must touch at all."""
    w, h = F.col("meta.width"), F.col("meta.height")
    longest = F.greatest(w, h)
    scale = max_side / longest
    need = longest > max_side
    return (df.filter((F.col("kind") == "image")
                      & w.isNotNull() & h.isNotNull())
            .select("media_id", w.alias("width"), h.alias("height"),
                    F.when(need, F.greatest(F.round(w * scale).cast("int"),
                                            F.lit(1)))
                    .otherwise(w).alias("out_width"),
                    F.when(need, F.greatest(F.round(h * scale).cast("int"),
                                            F.lit(1)))
                    .otherwise(h).alias("out_height"),
                    need.alias("needs_resize")))


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per (media_id, chunk) with time
    offsets and the per-chunk sample count from the metadata sample
    rate — again metadata-only, payload untouched. Feeds a decode stage
    the exact byte ranges to cut."""
    dur = F.col("meta.duration_ms")
    n_chunks = F.greatest(F.ceil(dur / chunk_ms).cast("int"), F.lit(1))
    start = F.col("chunk_idx") * chunk_ms
    length = F.least(F.lit(chunk_ms).cast("long"),
                     F.col("duration_ms") - start)
    return (df.filter((F.col("kind") == "audio") & dur.isNotNull())
            .select("media_id", dur.alias("duration_ms"),
                    F.col("meta.sample_rate").alias("sample_rate"),
                    F.explode(F.sequence(F.lit(0), n_chunks - 1))
                    .alias("chunk_idx"))
            .withColumns({
                "chunk_start_ms": start,
                "chunk_len_ms": length,
                "n_samples": (length * F.col("sample_rate") / 1000)
                .cast("long"),
            }))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id, metadata consistent with `kind`."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
                     (F.col("id") % 3 + 1).cast("int")).alias("format"),
        F.encode(F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))),
                 "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("id") % 3 == 0, (F.col("id") % 16 + 1) * 64)
            .otherwise(F.lit(None)).cast("int").alias("width"),
            F.when(F.col("id") % 3 == 0, (F.col("id") % 9 + 1) * 64)
            .otherwise(F.lit(None)).cast("int").alias("height"),
            F.when(F.col("id") % 3 != 0, (F.col("id") % 10 + 1) * 1000)
            .otherwise(F.lit(None)).cast("long").alias("duration_ms"),
            F.when(F.col("id") % 3 == 1, F.lit(16000))
            .otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return df
