"""Streaming-operator semantics: watermarked windowed rollups converge
to the batch answer, late data beyond the watermark is dropped, and the
applyInPandasWithState sessionizer closes gap sessions on event-time
timeouts with the same rollup as the batch `sessionize` query.

Harness: a parquet landing directory read with ``readStream``
(maxFilesPerTrigger=1 so each file is one micro-batch — the watermark
advances between files exactly like between live triggers), results
collected through a memory sink with ``processAllAvailable``.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_otlp_spark.streaming import sessionize_stateful, windowed_counts

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mins(m: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def _write_slice(spark, path, rows, i):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.parquet(f"{path}/slice={i}", mode="overwrite")


def _stream(spark, path):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{path}/slice=*"))


def _run(stream_df, output_mode):
    name = "m" + uuid.uuid4().hex[:12]
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    return q, name


def test_windowed_counts_matches_batch(spark, tmp_path):
    path = str(tmp_path / "landing")
    rows1 = [(1, _mins(0.5), "click", 1.0), (1, _mins(1.5), "click", 2.0),
             (2, _mins(3.0), "view", 3.0), (2, _mins(6.0), "click", 4.0)]
    rows2 = [(1, _mins(7.0), "view", 5.0), (3, _mins(11.0), "click", 6.0)]
    _write_slice(spark, path, rows1, 0)

    q, name = _run(windowed_counts(_stream(spark, path),
                                   window="5 minutes",
                                   watermark="10 minutes"), "update")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, rows2, 1)
        q.processAllAvailable()
        got = (spark.table(name)
               .groupBy("window_start", "window_end", "event_type")
               .agg(F.last("n_events").alias("n_events"),
                    F.last("sum_value").alias("sum_value")))
        batch = windowed_counts(
            spark.read.schema(SCHEMA).parquet(f"{path}/slice=*"),
            window="5 minutes")
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, batch.collect()))
    finally:
        q.stop()


def test_windowed_counts_drops_late_rows(spark, tmp_path):
    """A row arriving behind the watermark must NOT update its window —
    bounded state requires Spark to refuse arbitrarily-late data."""
    path = str(tmp_path / "landing")
    _write_slice(spark, path, [(1, _mins(0.5), "click", 1.0)], 0)
    # advances the watermark to 100m - 10m = 90m
    _write_slice(spark, path, [(2, _mins(100.0), "view", 1.0)], 1)

    q, name = _run(windowed_counts(_stream(spark, path),
                                   window="5 minutes",
                                   watermark="10 minutes"), "update")
    try:
        q.processAllAvailable()
        # a very-late second click in the (closed) first window
        _write_slice(spark, path, [(1, _mins(1.0), "click", 1.0)], 2)
        q.processAllAvailable()
        first_win = (spark.table(name)
                     .filter(F.col("window_start") == _mins(0.0))
                     .select("n_events").collect())
        assert [r.n_events for r in first_win] == [1]
    finally:
        q.stop()


def test_sessionize_stateful_closes_on_gap(spark, tmp_path):
    """Two activity bursts separated by > gap close as two sessions with
    exact (start, end, count, sum) rollups; a user who never goes
    quiet for the full gap emits nothing."""
    path = str(tmp_path / "landing")
    # user 1: burst A (0-2m, 3 events), burst B (60-61m, 2 events)
    # user 2: one chain with gaps < 30m spanning both slices (0, 20, 40m)
    rows1 = [(1, _mins(0), "click", 1.0), (1, _mins(1), "click", 2.0),
             (1, _mins(2), "view", 3.0), (2, _mins(0), "view", 10.0),
             (2, _mins(20), "view", 20.0)]
    rows2 = [(1, _mins(60), "click", 4.0), (1, _mins(61), "view", 5.0),
             (2, _mins(40), "view", 30.0)]
    # pushes the watermark far enough to time out everything above
    rows3 = [(9, _mins(300), "view", 0.0)]
    _write_slice(spark, path, rows1, 0)

    q, name = _run(sessionize_stateful(_stream(spark, path),
                                       gap_minutes=30,
                                       watermark="5 minutes"), "append")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, rows2, 1)
        q.processAllAvailable()
        _write_slice(spark, path, rows3, 2)
        q.processAllAvailable()
        # one more batch so timeouts fire against the advanced watermark
        _write_slice(spark, path, [(9, _mins(301), "view", 0.0)], 3)
        q.processAllAvailable()

        got = {(r.user_id, r.session_start, r.session_end,
                r.n_events, r.sum_value)
               for r in spark.table(name).collect()}
        assert (1, _mins(0), _mins(2), 3, 6.0) in got
        assert (1, _mins(60), _mins(61), 2, 9.0) in got
        # user 2's 0-20-40m chain (every gap < 30m) closes as ONE
        # session once the watermark passes 40m + gap
        assert (2, _mins(0), _mins(40), 3, 60.0) in got
        assert len([g for g in got if g[0] == 2]) == 1
    finally:
        q.stop()


def test_sessionize_stateful_batch_parity(spark, tmp_path):
    """Sessions the stateful operator closes must carry the same rollup
    the batch sessionize computes for those bursts (6h gap in the batch
    query vs explicit gap here — so compare against a direct batch
    recomputation with the same 30m gap)."""
    path = str(tmp_path / "landing")
    rows = [(u, _mins(m), "click", float(u + m))
            for u in (1, 2, 3) for m in (0, 1, 2, 90, 91)]
    _write_slice(spark, path, rows, 0)
    _write_slice(spark, path, [(9, _mins(500), "view", 0.0)], 1)

    q, name = _run(sessionize_stateful(_stream(spark, path),
                                       gap_minutes=30,
                                       watermark="1 minutes"), "append")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, [(9, _mins(501), "view", 0.0)], 2)
        q.processAllAvailable()
        got = {(r.user_id, r.session_start, r.session_end, r.n_events,
                r.sum_value) for r in spark.table(name).collect()}
        for u in (1, 2, 3):
            assert (u, _mins(0), _mins(2), 3, float(3 * u + 3)) in got
            assert (u, _mins(90), _mins(91), 2, float(2 * u + 181)) in got
    finally:
        q.stop()


def test_sessionize_stateful_unordered_chunks(spark, tmp_path):
    """A micro-batch split across several Arrow chunks (tiny
    maxRecordsPerBatch) with rows in arbitrary order must sessionize
    identically to sorted input, and a cross-batch row older than the
    open session's start (within gap) must merge backward."""
    path = str(tmp_path / "landing")
    # unsorted within the slice: 60m row first, then the 0-2m burst
    rows1 = [(1, _mins(60), "click", 4.0), (1, _mins(1), "click", 2.0),
             (1, _mins(2), "view", 3.0), (1, _mins(0), "click", 1.0),
             (1, _mins(61), "view", 5.0)]
    # 58m is older than the open session's start (60m) but within gap
    rows2 = [(1, _mins(58), "click", 7.0)]
    rows3 = [(9, _mins(300), "view", 0.0)]
    _write_slice(spark, path, rows1, 0)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        q, name = _run(sessionize_stateful(_stream(spark, path),
                                           gap_minutes=30,
                                           watermark="5 minutes"), "append")
        try:
            q.processAllAvailable()
            _write_slice(spark, path, rows2, 1)
            q.processAllAvailable()
            _write_slice(spark, path, rows3, 2)
            q.processAllAvailable()
            _write_slice(spark, path, [(9, _mins(301), "view", 0.0)], 3)
            q.processAllAvailable()
            got = {(r.user_id, r.session_start, r.session_end,
                    r.n_events, r.sum_value)
                   for r in spark.table(name).collect()}
            assert (1, _mins(0), _mins(2), 3, 6.0) in got
            assert (1, _mins(58), _mins(61), 3, 16.0) in got
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sessionize_windowed_matches_stateful_and_batch(spark, tmp_path):
    """The built-in session_window path must produce the same closed
    sessions as the stateful operator on in-order data, and its batch
    run over the same rows must agree (session_window end = last event
    + gap, so compare on (user, start, n, sum))."""
    from duckdb_otlp_spark.streaming import sessionize_windowed

    path = str(tmp_path / "landing")
    rows1 = [(1, _mins(0), "click", 1.0), (1, _mins(1), "click", 2.0),
             (1, _mins(2), "view", 3.0), (2, _mins(5), "view", 10.0)]
    rows2 = [(9, _mins(300), "view", 0.0)]
    _write_slice(spark, path, rows1, 0)

    q, name = _run(sessionize_windowed(_stream(spark, path),
                                       gap="30 minutes",
                                       watermark="5 minutes"), "append")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, rows2, 1)
        q.processAllAvailable()
        _write_slice(spark, path, [(9, _mins(301), "view", 0.0)], 2)
        q.processAllAvailable()
        got = {(r.user_id, r.session_start, r.n_events, r.sum_value)
               for r in spark.table(name).collect()}
        assert (1, _mins(0), 3, 6.0) in got
        assert (2, _mins(5), 1, 10.0) in got
        batch = sessionize_windowed(
            spark.read.schema(SCHEMA).parquet(f"{path}/slice=0"),
            gap="30 minutes")
        bat = {(r.user_id, r.session_start, r.n_events, r.sum_value)
               for r in batch.collect()}
        assert {(1, _mins(0), 3, 6.0), (2, _mins(5), 1, 10.0)} <= bat
    finally:
        q.stop()


def test_windowed_counts_hopping(spark, tmp_path):
    """slide=window/2: every event lands in exactly two windows, so the
    summed n_events doubles the row count."""
    path = str(tmp_path / "landing")
    rows = [(1, _mins(m), "click", 1.0) for m in (1, 4, 7, 12)]
    _write_slice(spark, path, rows, 0)
    batch = windowed_counts(
        spark.read.schema(SCHEMA).parquet(f"{path}/slice=*"),
        window="10 minutes", slide="5 minutes")
    out = batch.collect()
    assert sum(r.n_events for r in out) == 2 * len(rows)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Exact streaming dedup by text digest: a duplicate arriving in a
    LATER micro-batch (within the watermark horizon) is dropped by the
    state store; distinct texts all survive; and the batch call over
    the same rows converges to the same digest set."""
    from duckdb_otlp_spark.streaming import dedup_stream

    path = str(tmp_path / "landing")
    rows1 = [(1, _mins(0.0), "the quick brown fox", 1.0),
             (2, _mins(1.0), "lorem ipsum dolor", 1.0)]
    rows2 = [(3, _mins(2.0), "The Quick Brown Fox  ", 1.0),  # dup of 1
             (4, _mins(3.0), "entirely new text", 1.0)]
    _write_slice(spark, path, rows1, 0)

    q, name = _run(dedup_stream(_stream(spark, path), text_col="event_type",
                                watermark="10 minutes"), "append")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, rows2, 1)
        q.processAllAvailable()
        got = spark.table(name).collect()
        assert sorted(r.user_id for r in got) == [1, 2, 4]
        # batch convergence: same digest set from the same rows
        batch = dedup_stream(
            spark.read.schema(SCHEMA).parquet(f"{path}/slice=*"),
            text_col="event_type")
        assert {r.digest for r in got} \
            == {r.digest for r in batch.collect()}
    finally:
        q.stop()


def test_dedup_stream_horizon_expiry(spark, tmp_path):
    """A duplicate arriving AFTER the watermark horizon has passed its
    key is NOT collapsed — the documented bounded-state residue that
    the batch dedup over sealed tables removes."""
    from duckdb_otlp_spark.streaming import dedup_stream

    path = str(tmp_path / "landing")
    _write_slice(spark, path, [(1, _mins(0.0), "same text", 1.0)], 0)

    q, name = _run(dedup_stream(_stream(spark, path), text_col="event_type",
                                watermark="5 minutes"), "append")
    try:
        q.processAllAvailable()
        # advances the watermark far past the first key's horizon
        _write_slice(spark, path, [(2, _mins(100.0), "other", 1.0)], 1)
        q.processAllAvailable()
        _write_slice(spark, path, [(3, _mins(101.0), "same text", 1.0)], 2)
        q.processAllAvailable()
        got = sorted(r.user_id for r in spark.table(name).collect())
        assert got == [1, 2, 3]      # the late twin survives by design
    finally:
        q.stop()


def test_contamination_screen_stream_matches_batch(spark, tmp_path):
    """The streaming contamination screen must keep exactly the docs the
    batch JVM-join screen keeps (same grams, same distinct/overlap
    semantics), on both a batch input and a live stream."""
    from duckdb_otlp_spark.operators.pipeline import contamination_screen
    from duckdb_otlp_spark.streaming import contamination_screen_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ])
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    docs = [
        (1, _mins(0), "the quick brown fox jumps over the lazy dog today"),
        (2, _mins(1), "completely unrelated words forming their own five gram run"),
        (3, _mins(2), "short doc"),                       # below gram_n
        (4, _mins(3), "the quick brown fox jumps but then diverges wildly away here"),
    ]
    batch_docs = spark.createDataFrame(docs, doc_schema)
    want = sorted(r.doc_id for r in contamination_screen(
        batch_docs, eval_df, max_overlap=0.5).collect())

    # batch input through the streaming op
    got_batch = sorted(r.doc_id for r in contamination_screen_stream(
        batch_docs, eval_df.select(
            F.explode(F.array_distinct(F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.split(F.trim("text"), r"\s+")) - 5),
                    lambda i: F.concat_ws(
                        " ", *[F.split(F.trim("text"), r"\s+")[i + j]
                               for j in range(5)])),
                lambda g: g != ""))).alias("g")),
        max_overlap=0.5).collect())
    assert got_batch == want

    # live stream through the same op
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs[:2], doc_schema).coalesce(1) \
        .write.parquet(f"{path}/slice=0", mode="overwrite")
    stream = (spark.readStream.schema(doc_schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{path}/slice=*"))
    q, name = _run(contamination_screen_stream(
        stream, {" ".join(
            "the quick brown fox jumps over the lazy dog today".split()[i:i+5])
            for i in range(6)}, max_overlap=0.5), "append")
    try:
        q.processAllAvailable()
        spark.createDataFrame(docs[2:], doc_schema).coalesce(1) \
            .write.parquet(f"{path}/slice=1", mode="overwrite")
        q.processAllAvailable()
        got_stream = sorted(r.doc_id for r in spark.table(name).collect())
        assert got_stream == want
    finally:
        q.stop()


def test_contamination_screen_stream_is_jvm_side(spark):
    """The default screen path must plan as pure Catalyst expressions —
    no Python worker (BatchEvalPython/ArrowEvalPython/MapInPandas) at
    ingest rates — and the mapInPandas fallback must keep exactly the
    same rows (r6 verdict item: JVM-ify the per-doc check)."""
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.streaming import contamination_screen_stream

    eval_text = "the quick brown fox jumps over the lazy dog today"
    grams = {" ".join(eval_text.split()[i:i + 5]) for i in range(6)}
    docs = spark.createDataFrame(
        [(1, eval_text),
         (2, "completely unrelated words forming their own five gram run"),
         (3, "short doc"),
         (4, "the quick brown fox jumps but then diverges wildly away here"),
         (5, None),
         (6, "   "),
         (7, "the quick brown fox jumps over the lazy dog today again ok")],
        "doc_id long, text string")

    jvm = contamination_screen_stream(docs, grams, max_overlap=0.5)
    assert not audit(jvm).has_python_eval
    got_jvm = sorted(r.doc_id for r in jvm.collect())
    got_pd = sorted(r.doc_id for r in contamination_screen_stream(
        docs, grams, max_overlap=0.5, use_pandas=True).collect())
    assert got_jvm == got_pd
    assert 1 not in got_jvm and 2 in got_jvm and 3 in got_jvm
    # empty eval set: everything survives on both paths
    assert sorted(r.doc_id for r in contamination_screen_stream(
        docs, set(), max_overlap=0.5).collect()) == [1, 2, 3, 4, 5, 6, 7]


def test_contamination_screen_auto_scales_past_literal_threshold(spark):
    """Above literal_max_grams the screen must route itself to the
    Arrow/broadcast path (the in-plan array literal is the one scale
    cliff: it is serialized into every task plan), below it stay pure
    JVM — and both regimes keep IDENTICAL rows at the crossover."""
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.streaming import contamination_screen_stream

    eval_text = "the quick brown fox jumps over the lazy dog today"
    grams = {" ".join(eval_text.split()[i:i + 5]) for i in range(6)}
    docs = spark.createDataFrame(
        [(1, eval_text),
         (2, "completely unrelated words forming their own five gram run"),
         (3, "short doc"),
         (4, "the quick brown fox jumps but then diverges wildly away here")],
        "doc_id long, text string")

    at_limit = contamination_screen_stream(
        docs, grams, max_overlap=0.5, literal_max_grams=len(grams))
    over_limit = contamination_screen_stream(
        docs, grams, max_overlap=0.5, literal_max_grams=len(grams) - 1)
    # exactly at the threshold: still the JVM literal; one past: Arrow
    assert not audit(at_limit).has_python_eval
    assert audit(over_limit).has_python_eval
    assert (sorted(r.doc_id for r in at_limit.collect())
            == sorted(r.doc_id for r in over_limit.collect())
            == [2, 3, 4])


def test_pii_scrub_stream_matches_batch_and_is_stateless(spark, tmp_path):
    """At-ingest PII scrub: a live stream redacts exactly like the
    batch scrub_documents pass (same rows, same audit counts), stays
    JVM-side, and needs no state store (stateless map — append mode
    with no watermark is legal)."""
    from duckdb_otlp_spark.operators.text import scrub_documents
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.streaming import pii_scrub_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    docs = [
        (1, "mail alice@example.com or call +1 555-123-4567"),
        (2, "ssn 123-45-6789 at host 10.0.0.7"),
        (3, "clean text, nothing to redact"),
    ]
    batch = spark.createDataFrame(docs, doc_schema)
    want = sorted(tuple(r) for r in scrub_documents(batch).collect())

    # batch input through the streaming op: identical rows, no Python
    got_batch = pii_scrub_stream(batch)
    assert sorted(tuple(r) for r in got_batch.collect()) == want
    assert not audit(got_batch).has_python_eval

    path = str(tmp_path / "docs")
    spark.createDataFrame(docs[:2], doc_schema).coalesce(1) \
        .write.parquet(f"{path}/slice=0", mode="overwrite")
    stream = (spark.readStream.schema(doc_schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{path}/slice=*"))
    q, name = _run(pii_scrub_stream(stream), "append")
    try:
        q.processAllAvailable()
        spark.createDataFrame(docs[2:], doc_schema).coalesce(1) \
            .write.parquet(f"{path}/slice=1", mode="overwrite")
        q.processAllAvailable()
        got_stream = sorted(tuple(r) for r in spark.table(name).collect())
        assert got_stream == want
        # stateless: no state-store rows ever materialize
        for op in (q.lastProgress or {}).get("stateOperators", []):
            assert op.get("numRowsTotal", 0) == 0, op
    finally:
        q.stop()


def test_contamination_screen_gram_store_regime(spark, tmp_path):
    """The third contamination rung: the eval gram set lives in a
    parquet GRAM STORE each Arrow worker loads directly — the driver
    never materializes a gram. Parity vs the literal regime on the same
    docs (batch and live stream), automatic spill for a DataFrame above
    the broadcast ceiling, and a descriptive error when the spill has
    nowhere to go."""
    import pytest

    from duckdb_otlp_spark.streaming import contamination_screen_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    contaminated = "the quick brown fox jumps over the lazy dog today"
    docs = [
        (1, contaminated),
        (2, "completely unrelated words forming their own five gram run"),
        (3, "tiny"),
        (4, "the quick brown fox jumps but then diverges wildly away here"),
    ]
    batch = spark.createDataFrame(docs, doc_schema)
    grams = {" ".join(contaminated.split()[i:i + 5]) for i in range(6)}
    want = sorted(r.doc_id for r in contamination_screen_stream(
        batch, grams, max_overlap=0.5).collect())

    store = str(tmp_path / "gram_store")
    spark.createDataFrame([(g,) for g in sorted(grams)], "gram string") \
        .write.parquet(store)

    # regime 3 by path
    got_store = sorted(r.doc_id for r in contamination_screen_stream(
        batch, store, max_overlap=0.5).collect())
    assert got_store == want

    # DataFrame above the broadcast ceiling: auto-spill to the store
    eval_df = spark.createDataFrame([(g,) for g in sorted(grams)],
                                    "gram string")
    spill = str(tmp_path / "spill_store")
    got_spill = sorted(r.doc_id for r in contamination_screen_stream(
        batch, eval_df, max_overlap=0.5, broadcast_max_grams=2,
        gram_store_path=spill).collect())
    assert got_spill == want
    assert spark.read.parquet(spill).count() == len(grams)

    # ...and a descriptive error when no spill path is given
    with pytest.raises(ValueError, match="gram_store_path"):
        contamination_screen_stream(batch, eval_df, broadcast_max_grams=2)

    # refresh-in-place: rebuilding the screen against a REWRITTEN store
    # (same file name) must reload, not serve the reused worker's cached
    # set — the fingerprint includes size/mtime (r9 review finding)
    import pyarrow as pa
    import pyarrow.parquet as pq

    store2 = tmp_path / "gram_store2"
    store2.mkdir()
    f2 = store2 / "grams.parquet"
    pq.write_table(pa.table({"gram": sorted(grams)}), f2)
    assert sorted(r.doc_id for r in contamination_screen_stream(
        batch, str(store2), max_overlap=0.5).collect()) == want
    pq.write_table(pa.table({"gram": ["no such gram here at all"]}), f2)
    refreshed = sorted(r.doc_id for r in contamination_screen_stream(
        batch, str(store2), max_overlap=0.5).collect())
    assert refreshed == sorted(d[0] for d in docs)   # nothing contaminated

    # live stream through the gram store
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs[:2], doc_schema).coalesce(1) \
        .write.parquet(f"{path}/slice=0", mode="overwrite")
    stream = (spark.readStream.schema(doc_schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{path}/slice=*"))
    q, name = _run(contamination_screen_stream(
        stream, store, max_overlap=0.5), "append")
    try:
        q.processAllAvailable()
        spark.createDataFrame(docs[2:], doc_schema).coalesce(1) \
            .write.parquet(f"{path}/slice=1", mode="overwrite")
        q.processAllAvailable()
        got_stream = sorted(r.doc_id for r in spark.table(name).collect())
        assert got_stream == want
    finally:
        q.stop()


def test_near_dedup_screen_stream_vs_index(spark, tmp_path):
    """At-ingest near-dup screen vs a persisted band index: an exact
    duplicate of an indexed doc MUST flag (identical signatures share
    every band), unrelated docs must not, the live stream returns
    exactly the batch answer, and the plan is stateless (no state
    store, no Python)."""
    from duckdb_otlp_spark.operators.dedup import (load_band_index,
                                                   save_band_index)
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.queries import (_base_hashes, _incr_bands_from_sig,
                                           _minhash_cols)
    from duckdb_otlp_spark.streaming import near_dedup_screen_stream

    corpus_text = ("the quick brown fox jumps over the lazy dog and then "
                   "naps in the warm afternoon sun by the old barn door")
    corpus = spark.createDataFrame(
        [(100, corpus_text),
         (101, "completely different indexed document about glaciers and "
               "volcanic rock formations across the northern ranges"),
         (102, "hi")],   # sub-shingle corpus doc: must not enter the index
        "doc_id long, text string")
    sig = (corpus.select(
        "doc_id", _base_hashes(text="text").alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", *_minhash_cols("hs")))
    bands = _incr_bands_from_sig(sig).select(
        "band_idx", "key", F.col("doc_id").alias("corpus_doc"))
    # the empty-shingle guard: null minhashes render the SAME '' key
    # for every sub-shingle doc, so an unfiltered index would make all
    # short docs mutual candidates (r8 review finding)
    assert bands.filter(F.col("key") == "").count() == 0
    spark.sql("DROP TABLE IF EXISTS test_near_dedup_idx")
    save_band_index(bands, str(tmp_path / "idx"), "test_near_dedup_idx",
                    num_buckets=4)
    idx = load_band_index(spark, "test_near_dedup_idx")

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    docs = [
        (1, corpus_text),                         # exact dup -> must flag
        (2, "unrelated words forming their very own tiny document here "
            "with zero overlap against anything indexed before now"),
        (3, "short"),                             # sub-shingle, no grams
    ]
    batch = spark.createDataFrame(docs, doc_schema)

    screened = near_dedup_screen_stream(batch, idx)
    got_batch = {r["doc_id"]: r["near_dup_candidate"]
                 for r in screened.collect()}
    assert got_batch[1] is True
    assert got_batch[2] is False
    assert set(screened.columns) == {"doc_id", "text", "near_dup_candidate"}
    assert not audit(screened).has_python_eval

    path = str(tmp_path / "docs")
    spark.createDataFrame(docs[:2], doc_schema).coalesce(1) \
        .write.parquet(f"{path}/slice=0", mode="overwrite")
    stream = (spark.readStream.schema(doc_schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{path}/slice=*"))
    q, name = _run(near_dedup_screen_stream(stream, idx), "append")
    try:
        q.processAllAvailable()
        spark.createDataFrame(docs[2:], doc_schema).coalesce(1) \
            .write.parquet(f"{path}/slice=1", mode="overwrite")
        q.processAllAvailable()
        got_stream = {r["doc_id"]: r["near_dup_candidate"]
                      for r in spark.table(name).collect()}
        assert got_stream == got_batch
        for op in (q.lastProgress or {}).get("stateOperators", []):
            assert op.get("numRowsTotal", 0) == 0, op
    finally:
        q.stop()
        spark.sql("DROP TABLE IF EXISTS test_near_dedup_idx")


def test_near_dedup_screen_cache_lifecycle(spark):
    """Rebuild-the-screen-twice pin (r8 ADVICE/VERDICT): each build
    persists three per-band index sides; the returned DataFrame's
    ScreenCacheHandle must release exactly those caches so a stream
    restart against a refreshed index leaves no stranded persisted RDDs
    from the previous build."""
    from duckdb_otlp_spark.streaming import near_dedup_screen_stream
    from duckdb_otlp_spark.streaming.operators import ScreenCacheHandle

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def mk_index(tag):
        return spark.createDataFrame(
            [(b, f"{tag}:k{b}") for b in range(3)], "band_idx int, key string")

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")

    spark.catalog.clearCache()
    base = n_persistent()

    s1 = near_dedup_screen_stream(docs, mk_index("v1"))
    assert isinstance(s1.screen_cache, ScreenCacheHandle)
    assert s1.screen_cache.active == 3
    s1.collect()  # materialize the band-side caches
    assert n_persistent() >= base + 3

    # restart: rebuild against a refreshed index, releasing the old build
    s1.screen_cache.unpersist(blocking=True)
    assert s1.screen_cache.active == 0
    s1.screen_cache.unpersist(blocking=True)  # idempotent
    assert n_persistent() == base

    s2 = near_dedup_screen_stream(docs, mk_index("v2"))
    s2.collect()
    assert n_persistent() >= base + 3
    s2.screen_cache.unpersist(blocking=True)
    assert n_persistent() == base


def test_near_dedup_screen_cache_registry_survives_transforms(spark):
    """The screen_cache ATTRIBUTE is lost on any DataFrame
    transformation (a new DataFrame object is returned) — the r9
    VERDICT fragility — so cache_registry= must deliver the handle
    durably: transform the screened frame, release via the registry,
    and assert zero stranded persisted RDDs."""
    from duckdb_otlp_spark.streaming import near_dedup_screen_stream
    from duckdb_otlp_spark.streaming.operators import ScreenCacheHandle

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    idx = spark.createDataFrame(
        [(b, f"k{b}") for b in range(3)], "band_idx int, key string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")

    spark.catalog.clearCache()
    base = n_persistent()

    registry: list = []
    screened = near_dedup_screen_stream(docs, idx, cache_registry=registry)
    # downstream plumbing a stream owner would do: the attribute dies here
    shaped = screened.withColumn("flag_i",
                                 F.col("near_dup_candidate").cast("int")) \
                     .select("doc_id", "flag_i")
    assert not hasattr(shaped, "screen_cache")
    shaped.collect()  # materialize the band-side caches
    assert n_persistent() >= base + 3

    assert len(registry) == 1 and isinstance(registry[0], ScreenCacheHandle)
    registry[0].unpersist(blocking=True)
    assert registry[0].active == 0
    assert n_persistent() == base


def test_gram_store_worker_cache_lru(tmp_path, monkeypatch):
    """Worker gram-store cache policy (r9 ADVICE): LRU with re-insert
    on hit (a hit refreshes recency, so an actively-used store is never
    the eviction victim), stale fingerprints of a refreshed path are
    evicted first, and GRAM_STORE_CACHE_MAX is the documented knob for
    3+ concurrent screens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_otlp_spark.streaming import operators as sops

    loads = []
    real_dataset = __import__("pyarrow.dataset", fromlist=["dataset"]).dataset

    def counting_dataset(path, **kw):
        loads.append(path)
        return real_dataset(path, **kw)

    import pyarrow.dataset as pads
    monkeypatch.setattr(pads, "dataset", counting_dataset)
    monkeypatch.setattr(sops, "_GRAM_STORE_CACHE", {})

    def mk_store(name, grams):
        d = tmp_path / name
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table({"gram": list(grams)}), d / "part0.parquet")
        return str(d)

    a = mk_store("a", ["a gram one", "a gram two"])
    b = mk_store("b", ["b gram"])
    c = mk_store("c", ["c gram"])

    def load(path, fp):
        before = len(loads)
        ev = sops._load_gram_store(path, fp)
        return ev, len(loads) - before

    # fill to cap (2): A, B
    ev_a, n = load(a, "fp_a")
    assert n == 1 and ev_a == frozenset(["a gram one", "a gram two"])
    _, n = load(b, "fp_b")
    assert n == 1
    # hit A -> refreshes recency (no reload)
    _, n = load(a, "fp_a")
    assert n == 0
    # load C -> evicts B (least recently USED), not A
    _, n = load(c, "fp_c")
    assert n == 1
    _, n = load(a, "fp_a")
    assert n == 0, "LRU victim must be B, not the just-hit A"
    _, n = load(b, "fp_b")
    assert n == 1, "B was evicted and must reload"

    # refresh-in-place: same path, new fingerprint -> stale entry of
    # that path is dropped first (it can never be hit again)
    _, n = load(b, "fp_b2")
    assert n == 1
    assert ("b", "fp_b") not in {(k[0].rsplit("/", 1)[-1], k[1])
                                 for k in sops._GRAM_STORE_CACHE}
    keys = {(k[0].rsplit("/", 1)[-1], k[1]) for k in sops._GRAM_STORE_CACHE}
    assert ("b", "fp_b2") in keys and ("a", "fp_a") in keys

    # the documented knob: cap 3 keeps three live stores resident
    monkeypatch.setattr(sops, "GRAM_STORE_CACHE_MAX", 3)
    load(c, "fp_c")
    loads.clear()
    for path, fp in ((a, "fp_a"), (b, "fp_b2"), (c, "fp_c")):
        _, n = load(path, fp)
        assert n == 0, (path, "should be cached at cap 3")
    assert not loads


def test_band_probe_regimes_parity_and_plan(spark):
    """BandProbe's two regimes return identical rows on the same docs,
    and the literal regime's stamp is a ZERO-join ZERO-exchange map-only
    projection (the property that keeps the seal single-job), while the
    join regime plans exactly one broadcast join per band."""
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.queries import (INCR_BANDS, _base_hashes,
                                           _incr_bands_from_sig,
                                           _minhash_cols)
    from duckdb_otlp_spark.streaming.operators import BandProbe, build_band_probe

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog and then naps "
               "in the warm afternoon sun by the old barn door"),
         (101, "completely different indexed document about glaciers and "
               "volcanic rock formations across the northern ranges")],
        "doc_id long, text string")
    sig = (corpus.select(
        "doc_id", _base_hashes(text="text").alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", *_minhash_cols("hs")))
    index = _incr_bands_from_sig(sig).select("band_idx", "key")

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and then naps "
             "in the warm afternoon sun by the old barn door"),
         (2, "unrelated words forming their very own tiny document here "
             "with zero overlap against anything indexed before now"),
         (3, "short")],
        "doc_id long, text string")

    lit_probe = build_band_probe(index)
    assert lit_probe.regime == "literal"
    join_probe = build_band_probe(index, literal_max_keys=0)
    assert join_probe.regime == "join"
    try:
        lit_rows = {r["doc_id"]: r["near_dup_candidate"]
                    for r in lit_probe.stamp(docs).collect()}
        join_rows = {r["doc_id"]: r["near_dup_candidate"]
                     for r in join_probe.stamp(docs).collect()}
        assert lit_rows == join_rows == {1: True, 2: False, 3: False}

        rep = audit(lit_probe.stamp(docs))
        assert rep.broadcast_joins == rep.sort_merge_joins == 0
        assert rep.shuffled_hash_joins == rep.nested_loop_joins == 0
        assert rep.exchanges == 0
        assert not rep.has_python_eval
        rep_j = audit(join_probe.stamp(docs))
        assert rep_j.broadcast_joins >= INCR_BANDS
        assert rep_j.sort_merge_joins == rep_j.shuffled_hash_joins == 0

        # threshold crossing: an index bigger than literal_max_keys must
        # fall back to the join regime instead of truncating the key set
        small = build_band_probe(index, literal_max_keys=2)
        assert small.regime == "join"
        assert {r["doc_id"]: r["near_dup_candidate"]
                for r in small.stamp(docs).collect()} == lit_rows
        small.unpersist(blocking=True)

        # empty index: every doc passes, both regimes
        empty = spark.createDataFrame([], "band_idx int, key string")
        p_empty = build_band_probe(empty)
        assert p_empty.regime == "literal"
        assert all(not r["near_dup_candidate"]
                   for r in p_empty.stamp(docs).collect())
        assert isinstance(p_empty, BandProbe)
    finally:
        join_probe.unpersist(blocking=True)


def test_dedup_stream_unbounded_and_key_mode(spark, tmp_path):
    """bounded=False (exact-forever state) collapses a duplicate that
    arrives AFTER the watermark horizon — the pair bounded=True keeps —
    and key_cols mode dedups on explicit columns without a digest."""
    from duckdb_otlp_spark.streaming import dedup_stream

    path = str(tmp_path / "landing")
    _write_slice(spark, path, [(1, _mins(0.0), "same text", 1.0)], 0)

    q, name = _run(dedup_stream(_stream(spark, path), text_col="event_type",
                                watermark="5 minutes", bounded=False),
                   "append")
    try:
        q.processAllAvailable()
        _write_slice(spark, path, [(2, _mins(100.0), "other", 1.0)], 1)
        q.processAllAvailable()
        _write_slice(spark, path, [(3, _mins(101.0), "same text", 1.0)], 2)
        q.processAllAvailable()
        got = sorted(r.user_id for r in spark.table(name).collect())
        assert got == [1, 2]        # horizon twin collapsed (vs bounded)
    finally:
        q.stop()

    # key_cols mode on a batch input: explicit identity, no digest column
    df = spark.createDataFrame(
        [(1, _mins(0), "a", 1.0), (1, _mins(1), "a", 2.0),
         (2, _mins(2), "b", 3.0)], SCHEMA)
    out = dedup_stream(df, key_cols=("user_id", "event_type"))
    assert "digest" not in out.columns
    assert sorted((r.user_id, r.event_type) for r in out.collect()) \
        == [(1, "a"), (2, "b")]
