"""Protobuf reader tests: pb fixtures are encoded from the SAME envelope
dicts as the JSON fixtures, and the parity oracle is the reference's own
bidirectional EXCEPT pattern — pb-read and JSON-read DataFrames must be
identical row sets (reference: test/sql/read_otap.test:44-79, applied to
the protobuf path of read_otlp_* per test/sql/read_otlp_protobuf.test).
"""

from __future__ import annotations

import pytest

from duckdb_otlp_spark.sources.otlp_json import (
    read_otlp_logs,
    read_otlp_metrics_exp_histogram,
    read_otlp_metrics_gauge,
    read_otlp_metrics_histogram,
    read_otlp_metrics_sum,
    read_otlp_traces,
)
from tests.fixtures import (
    LOGS_SIMPLE,
    METRICS_ALL_TYPES,
    METRICS_SIMPLE,
    METRICS_TEMPORALITY_STRINGS,
    TRACES_SIMPLE,
    encode_envelope_pb,
    write_fixtures,
)


@pytest.fixture(scope="module")
def pb_dir(tmp_path_factory):
    """One .pb file per envelope (a pb file is a single message) plus the
    matching .jsonl fixtures for parity reads."""
    root = tmp_path_factory.mktemp("pb_fixtures")
    write_fixtures(root)
    for name, envs in (("logs_simple", LOGS_SIMPLE),
                       ("traces_simple", TRACES_SIMPLE),
                       ("metrics_simple", METRICS_SIMPLE),
                       ("metrics_all_types", METRICS_ALL_TYPES),
                       ("metrics_temporality_strings", METRICS_TEMPORALITY_STRINGS)):
        for i, env in enumerate(envs):
            (root / f"{name}_{i}.pb").write_bytes(encode_envelope_pb(env))
    return root


def _assert_parity(pb_df, json_df):
    assert pb_df.schema == json_df.schema
    assert pb_df.count() == json_df.count()
    assert pb_df.exceptAll(json_df).count() == 0
    assert json_df.exceptAll(pb_df).count() == 0


@pytest.mark.parametrize("reader,stem", [
    (read_otlp_logs, "logs_simple"),
    (read_otlp_traces, "traces_simple"),
    (read_otlp_metrics_gauge, "metrics_simple"),
    (read_otlp_metrics_sum, "metrics_simple"),
    (read_otlp_metrics_histogram, "metrics_simple"),
    (read_otlp_metrics_histogram, "metrics_all_types"),
    (read_otlp_metrics_exp_histogram, "metrics_all_types"),
    (read_otlp_metrics_sum, "metrics_temporality_strings"),
])
def test_pb_json_parity(spark, pb_dir, reader, stem):
    pb = reader(spark, str(pb_dir / f"{stem}_*.pb"))
    js = reader(spark, str(pb_dir / f"{stem}.jsonl"))
    _assert_parity(pb, js)


def test_explicit_protobuf_mode(spark, pb_dir):
    df = read_otlp_logs(spark, str(pb_dir / "logs_simple_0.pb"), mode="protobuf")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["body"] == "Application started"
    assert r["trace_id"] == "5b8efff798038103d269b633813fc60c"  # lowercase hex
    assert r["service_name"] == "test-service"


def test_mixed_glob_auto_detects_per_file(spark, pb_dir, tmp_path):
    """One pb file + one jsonl file under one glob: FORMAT AUTO detects
    per file (reference: read_otlp.cpp FORMAT AUTO)."""
    (tmp_path / "a.pb").write_bytes(encode_envelope_pb(LOGS_SIMPLE[0]))
    import json
    (tmp_path / "b.jsonl").write_text(json.dumps(LOGS_SIMPLE[1]) + "\n")
    df = read_otlp_logs(spark, str(tmp_path / "*"))
    assert df.count() == 2
    assert {r["severity_text"] for r in df.collect()} == {"INFO", "WARN"}


def test_garbage_protobuf_errors(spark, tmp_path):
    (tmp_path / "junk.pb").write_bytes(b"\xff\xfe\xfd this is not protobuf")
    with pytest.raises(Exception, match="OTLP parse error"):
        read_otlp_logs(spark, str(tmp_path / "junk.pb")).collect()


def test_pb_decoder_output_is_schema_exact():
    """r11: the wire decoders emit schema-exact leaf types (ints that
    the signal schema types as STRING are stringified at decode), so
    the typed read path converts envelopes to Arrow directly — any
    decoder/schema drift fails this conversion loudly."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from duckdb_otlp_spark.sources.otlp_json import _ENVELOPES
    from duckdb_otlp_spark.sources.otlp_proto import DECODERS

    for signal, fixtures in (("logs", LOGS_SIMPLE),
                             ("traces", TRACES_SIMPLE),
                             ("metrics", METRICS_ALL_TYPES)):
        env_type = to_arrow_type(_ENVELOPES[signal][1])
        for env in fixtures:
            decoded = DECODERS[signal](encode_envelope_pb(env))
            arr = pa.array([decoded], type=env_type)   # raises on drift
            assert arr.null_count == 0


def test_pb_read_plan_has_no_json_parse(spark, pb_dir):
    """r11: a pb-only read emits typed structs from the decoder — the
    plan must carry no from_json; the jsonl twin must still parse
    JVM-side (Jackson beats Python for text)."""
    from duckdb_otlp_spark.plans import audit
    pb = read_otlp_logs(spark, str(pb_dir / "logs_simple_0.pb"),
                        mode="protobuf")
    assert "from_json" not in audit(pb).text
    js = read_otlp_logs(spark, str(pb_dir / "logs_simple.jsonl"))
    assert "from_json" in audit(js).text


def test_kv_cache_bounded_and_correct():
    """The attribute memo returns value-identical decodes and clears at
    its cap instead of growing unboundedly."""
    from duckdb_otlp_spark.sources import otlp_proto as op
    from duckdb_otlp_spark.sources.otlp_proto_encode import (
        _KEY_VALUE, _enc_msg)

    op._KV_CACHE.clear()
    kv = {"key": "http.method", "value": {"stringValue": "GET"}}
    raw = _enc_msg(kv, _KEY_VALUE)
    first = op._key_value_cached(raw)
    assert first == op._key_value(raw) == kv
    assert op._key_value_cached(raw) is first          # cache hit
    # fill past the cap with distinct encodings: the cache must clear,
    # never exceed the cap, and still decode correctly afterwards
    for i in range(70000):
        op._key_value_cached(_enc_msg(
            {"key": f"k{i}", "value": {"intValue": str(i)}}, _KEY_VALUE))
        if len(op._KV_CACHE) > 65536:
            raise AssertionError("cache exceeded its cap")
    assert op._key_value_cached(raw) == kv
    op._KV_CACHE.clear()


def test_body_fastpath_oversized_length_varint_raises_fast():
    """r14 (ADVICE): the body fast path's length-varint loop must bail at
    the same shift bound as every other varint loop. A malformed body of
    0x0A followed by ~1MB of continuation bytes previously grew a
    multi-megabit bigint with O(size) work per byte (quadratic blowup);
    it must instead fall through to the generic walk's prompt ValueError."""
    from duckdb_otlp_spark.sources.otlp_proto import _log_record

    # LogRecord { body (field 5, wire type 2) = 0x0A + endless varint }
    body = b"\x0a" + b"\x80" * 1_000_000
    rec = b"\x2a" + _pb_varint(len(body)) + body
    with pytest.raises(ValueError, match="varint too long|truncated"):
        _log_record(rec)


def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# --- envelope slicing (r12: giant single-envelope files OOM'd a 16 GB
#     JVM at the 4M-record probe tier; decode slices them into bounded
#     envelope rows with provably identical flattened output) ---

def _multi_group_logs_env(n_groups=3, recs_per_group=7):
    return {"resourceLogs": [
        {"resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": f"svc-{g}"}}]},
         "scopeLogs": [
             {"scope": {"name": f"scope-{g}-{s}", "version": "1"},
              "logRecords": [
                  {"timeUnixNano": str(1700000000000000000 + g*1000 + s*100 + i),
                   "severityNumber": 9,
                   "body": {"stringValue": f"m-{g}-{s}-{i}"}}
                  for i in range(recs_per_group)]}
             for s in range(2)]}
        for g in range(n_groups)]}


@pytest.mark.parametrize("max_records", [1, 3, 5, 8, 1000])
def test_slice_envelope_logs_parity(max_records):
    from duckdb_otlp_spark import reader_gate
    from duckdb_otlp_spark.sources.otlp_json import slice_envelope

    env = _multi_group_logs_env()
    slices = list(slice_envelope(env, "logs", max_records=max_records))
    for s in slices:
        n = sum(len(sl["logRecords"]) for rl in s["resourceLogs"]
                for sl in rl["scopeLogs"])
        assert 0 < n <= max_records
    assert reader_gate.expected_logs(envelopes=slices) \
        == reader_gate.expected_logs(envelopes=[env])
    if max_records >= 42:  # 3 groups x 2 scopes x 7 records
        assert slices == [env]  # under the cap -> untouched, zero copies


def test_slice_envelope_drops_empty_groups_only():
    from duckdb_otlp_spark import reader_gate
    from duckdb_otlp_spark.sources.otlp_json import slice_envelope

    env = _multi_group_logs_env(n_groups=2, recs_per_group=3)
    env["resourceLogs"].insert(1, {"resource": {}, "scopeLogs": [
        {"scope": {"name": "empty"}, "logRecords": []}]})
    slices = list(slice_envelope(env, "logs", max_records=2))
    # empty groups flatten to zero rows either way
    assert reader_gate.expected_logs(envelopes=slices) \
        == reader_gate.expected_logs(envelopes=[env])


def test_slice_envelope_metrics_keeps_datapoints_together():
    from duckdb_otlp_spark import reader_gate
    from duckdb_otlp_spark.sources.otlp_json import slice_envelope

    env = {"resourceMetrics": [{"resource": {"attributes": []},
        "scopeMetrics": [{"scope": {"name": "s"},
            "metrics": [
                {"name": f"m{i}", "unit": "1",
                 "gauge": {"dataPoints": [
                     {"timeUnixNano": str(1700000000000000000 + i*10 + j),
                      "asInt": str(j)} for j in range(4)]}}
                for i in range(6)]}]}]}
    slices = list(slice_envelope(env, "metrics", max_records=2))
    assert len(slices) == 3
    for s in slices:
        ms = [m for rl in s["resourceMetrics"]
              for sl in rl["scopeMetrics"] for m in sl["metrics"]]
        assert len(ms) == 2
        assert all(len(m["gauge"]["dataPoints"]) == 4 for m in ms)
    assert reader_gate.expected_gauge(envelopes=slices) \
        == reader_gate.expected_gauge(envelopes=[env])


def test_oversized_pb_envelope_reads_sliced_and_identical(spark, tmp_path):
    """A pb file over MAX_ENVELOPE_SLICE_RECORDS records reads through
    the sliced path with output identical to its JSONL twin (which the
    JVM parses as one document and never slices)."""
    import json as _json

    from duckdb_otlp_spark.sources.otlp_json import (
        MAX_ENVELOPE_SLICE_RECORDS, read_otlp_logs)

    n = MAX_ENVELOPE_SLICE_RECORDS + 100
    env = {"resourceLogs": [{"resource": {"attributes": [
        {"key": "service.name", "value": {"stringValue": "big"}}]},
        "scopeLogs": [{"scope": {"name": "s", "version": "1"},
                       "logRecords": [
            {"timeUnixNano": str(1700000000000000000 + i),
             "severityNumber": 9 + (i % 3),
             "body": {"stringValue": f"rec-{i}"}} for i in range(n)]}]}]}
    (tmp_path / "big.pb").write_bytes(encode_envelope_pb(env))
    (tmp_path / "big.jsonl").write_text(_json.dumps(env) + "\n")
    pb = read_otlp_logs(spark, str(tmp_path / "big.pb"))
    js = read_otlp_logs(spark, str(tmp_path / "big.jsonl"))
    assert pb.count() == js.count() == n
    assert pb.exceptAll(js).count() == 0
    assert js.exceptAll(pb).count() == 0
