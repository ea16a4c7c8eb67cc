"""Flat pb decode parity gate (r14).

The protobuf fast path (sources/flat_decode) flattens executor-side and
must be BYTE-IDENTICAL to the generic envelope route + JVM flatten —
including JSON string escaping, double rendering, int32 coercion
windows, enum defaults, the AnyValue depth cutoff, and the timestamp
overflow error contract. The control side of every comparison here is
the UNCHANGED envelope plan (``_load_envelopes(mode='protobuf')`` +
``flatten_*``), so any drift in the twin fails loudly.
"""

from __future__ import annotations

import pytest

from duckdb_otlp_spark.sources import flat_decode
from duckdb_otlp_spark.sources.otlp_json import (
    _load_envelopes,
    flatten_logs,
    flatten_traces,
    read_otlp_logs,
    read_otlp_traces,
)
from tests.fixtures import encode_envelope_pb

_NS = 1713000000000000000


def _kv(key, value):
    return {"key": key, "value": value}


# Adversarial attribute values: every leaf renderer and both sort/depth
# rules get exercised. Doubles stay inside the PROVEN-EXACT rendering
# zone (integral < 9e15, or normal non-integral — see flat_decode's
# documented caveat for |x| >= 9e15 / subnormals).
_HOSTILE_ATTRS = [
    _kv("z.quote", {"stringValue": 'say "hi" \\ there'}),
    _kv("a.ctrl", {"stringValue": "tab\there\nnl\x01etx\x1funit"}),
    _kv("m.unicode", {"stringValue": "héllo wörld — ünïcode ✓"}),
    _kv("b.bool", {"boolValue": True}),
    _kv("c.bool", {"boolValue": False}),
    _kv("d.int", {"intValue": "-9223372036854775808"}),
    _kv("e.int", {"intValue": "9223372036854775807"}),
    _kv("f.dbl.integral", {"doubleValue": -12345.0}),
    _kv("g.dbl.frac", {"doubleValue": 0.30000000000000004}),
    _kv("h.dbl.small", {"doubleValue": 2.5e-5}),
    _kv("i.dbl.neg", {"doubleValue": -1e-3}),
    _kv("j.dbl.zero", {"doubleValue": 0.0}),
    _kv("k.bytes", {"bytesValue": "aGVsbG8="}),
    _kv("l.array", {"arrayValue": {"values": [
        {"intValue": "7"}, {"stringValue": "x\"y"}, {"doubleValue": 1.5}]}}),
    _kv("n.kvlist", {"kvlistValue": {"values": [
        {"key": "inner", "value": {"stringValue": "v"}},
        {"key": "deep", "value": {"kvlistValue": {"values": [
            {"key": "d2", "value": {"arrayValue": {"values": [
                # depth 3 -> nested values at depth 0 degrade to null
                {"kvlistValue": {"values": [
                    {"key": "d4", "value": {"stringValue": "invisible"}}]}},
                {"intValue": "5"}]}}}]}}}]}}),
    # duplicate keys: canonical sort is stable, wire order preserved
    _kv("dup", {"stringValue": "first"}),
    _kv("dup", {"stringValue": "second"}),
]


def _hostile_logs_env():
    return {"resourceLogs": [
        {"resource": {"attributes": [
            _kv("service.name", {"stringValue": "svc\"quoted"}),
            _kv("host", {"intValue": "3"})]},
         "scopeLogs": [
             {"scope": {"name": "s1", "version": "0.1",
                        "attributes": [_kv("lib", {"stringValue": "x\ty"})]},
              "logRecords": [
                  {"timeUnixNano": str(_NS),
                   "observedTimeUnixNano": str(_NS + 999),
                   "severityNumber": 9, "severityText": "INFO",
                   "body": {"stringValue": "plain"},
                   "attributes": _HOSTILE_ATTRS,
                   "traceId": "5B8EFFF798038103D269B633813FC60C",
                   "spanId": "EEE19B7EC3C1B174",
                   "flags": 1, "droppedAttributesCount": 2},
                  # int32-overflow severity/flags/dropped -> JVM defaults
                  {"timeUnixNano": str(_NS + 1),
                   "severityNumber": 3000000000,
                   "flags": 4000000000,
                   "droppedAttributesCount": 2147483648,
                   "body": {"intValue": "503"}},
                  # severity 0 -> NULL; empty ids -> NULL; no body
                  {"timeUnixNano": str(_NS + 2), "severityNumber": 0,
                   "traceId": "", "spanId": ""},
                  # non-string bodies of every kind
                  {"timeUnixNano": str(_NS + 3),
                   "body": {"boolValue": True}},
                  {"timeUnixNano": str(_NS + 4),
                   "body": {"doubleValue": 2.75}},
                  {"timeUnixNano": str(_NS + 5),
                   "body": {"arrayValue": {"values": [
                       {"stringValue": "a"}, {"intValue": "1"}]}}},
                  {"timeUnixNano": str(_NS + 6),
                   "body": {"kvlistValue": {"values": [
                       {"key": "k", "value": {"doubleValue": -0.0}}]}}},
                  # i64::MAX boundary timestamp (valid, no overflow)
                  {"timeUnixNano": "9223372036854775807",
                   "severityNumber": 21},
              ]},
             # scope with no attributes / records without attrs
             {"scope": {"name": "s2"},
              "logRecords": [{"timeUnixNano": str(_NS + 7),
                              "eventName": "ev\"x"}]},
         ]},
        # resource without service.name
        {"resource": {"attributes": [_kv("only", {"boolValue": False})]},
         "scopeLogs": [{"logRecords": [{"timeUnixNano": str(_NS + 8)}]}]},
    ]}


def _hostile_traces_env():
    return {"resourceSpans": [
        {"resource": {"attributes": [
            _kv("service.name", {"stringValue": "api"}),
            _kv("weird", {"doubleValue": 123.456})]},
         "scopeSpans": [
             {"scope": {"name": "tr", "version": "1"},
              "spans": [
                  {"traceId": "5B8EFFF798038103D269B633813FC60C",
                   "spanId": "EEE19B7EC3C1B174",
                   "parentSpanId": "EEE19B7EC3C1B173",
                   "traceState": 'vendor="1"',
                   "name": "GET /x", "kind": 2,
                   "startTimeUnixNano": str(_NS),
                   "endTimeUnixNano": str(_NS + 12345),
                   "attributes": _HOSTILE_ATTRS,
                   "status": {"code": 2, "message": 'bo"om'},
                   "events": [{"timeUnixNano": str(_NS + 5),
                               "name": "retry\n2",
                               "attributes": [
                                   _kv("attempt", {"intValue": "2"})],
                               "droppedAttributesCount": 1}],
                   "links": [{"traceId": "5B8EFFF798038103D269B633813FC60D",
                              "spanId": "EEE19B7EC3C1B180",
                              "traceState": "x=y",
                              "attributes": [
                                  _kv("l", {"stringValue": "v\\w"})]}],
                   "droppedEventsCount": 4000000000,
                   "droppedLinksCount": 3,
                   "droppedAttributesCount": 1,
                   "flags": 1},
                  # missing times -> duration from coalesce(,0); enum
                  # overflow kind -> default 0; empty status
                  {"traceId": "5B8EFFF798038103D269B633813FC60C",
                   "spanId": "EEE19B7EC3C1B175",
                   "name": "tick", "kind": 3000000000,
                   "status": {}},
                  # end before start -> negative duration
                  {"traceId": "5B8EFFF798038103D269B633813FC60C",
                   "spanId": "EEE19B7EC3C1B176",
                   "name": "neg",
                   "startTimeUnixNano": str(_NS + 100),
                   "endTimeUnixNano": str(_NS)},
              ]}]},
    ]}


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


@pytest.mark.parametrize("signal", ["logs", "traces"])
def test_flat_path_byte_identical_to_envelope_path(spark, tmp_path, signal):
    env = _hostile_logs_env() if signal == "logs" else _hostile_traces_env()
    p = tmp_path / f"hostile_{signal}.pb"
    p.write_bytes(encode_envelope_pb(env))

    flat = flat_decode.read_pb_flat(spark, str(p), signal)
    flatten = flatten_logs if signal == "logs" else flatten_traces
    control = flatten(_load_envelopes(spark, str(p), signal, "protobuf"))

    assert [f.name for f in flat.schema.fields] == \
        [f.name for f in control.schema.fields]
    assert [f.dataType for f in flat.schema.fields] == \
        [f.dataType for f in control.schema.fields]
    got, want = _rows(flat), _rows(control)
    assert got == want, (
        "\n".join(a + " != " + b for a, b in zip(got, want) if a != b))


@pytest.mark.parametrize("signal", ["logs", "traces"])
def test_reader_auto_mode_takes_flat_path(spark, tmp_path, signal):
    env = _hostile_logs_env() if signal == "logs" else _hostile_traces_env()
    p = tmp_path / f"auto_{signal}.pb"
    p.write_bytes(encode_envelope_pb(env))
    reader = read_otlp_logs if signal == "logs" else read_otlp_traces
    df = reader(spark, str(p))            # auto: driver sniff -> flat
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "MapInArrow" in plan
    assert "Generate" not in plan          # no JVM explode
    assert "from_json" not in plan
    # and the rows match the explicit-protobuf control plan
    control = (flatten_logs if signal == "logs" else flatten_traces)(
        _load_envelopes(spark, str(p), signal, "protobuf"))
    assert _rows(df) == _rows(control)


def test_flat_path_timestamp_overflow_raises_same_contract(spark, tmp_path):
    env = {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": "9223372036854775808"}]}]}]}   # i64::MAX + 1
    p = tmp_path / "overflow.pb"
    p.write_bytes(encode_envelope_pb(env))
    with pytest.raises(Exception, match="timestamp overflows int64 range"):
        read_otlp_logs(spark, str(p)).collect()
    # traces twin via start time
    envt = {"resourceSpans": [{"scopeSpans": [{"spans": [
        {"name": "x", "startTimeUnixNano": "18446744073709551615"}]}]}]}
    pt = tmp_path / "overflow_t.pb"
    pt.write_bytes(encode_envelope_pb(envt))
    with pytest.raises(Exception, match="timestamp overflows int64 range"):
        read_otlp_traces(spark, str(pt)).collect()


def test_mixed_glob_keeps_generic_plan(spark, tmp_path):
    """The driver sniff must refuse the fast path when any file under
    the glob is JSON — per-file FORMAT AUTO stays correct."""
    import json as _json

    env = _hostile_logs_env()
    (tmp_path / "a.pb").write_bytes(encode_envelope_pb(env))
    (tmp_path / "b.jsonl").write_text(_json.dumps(
        {"resourceLogs": [{"scopeLogs": [{"logRecords": [
            {"timeUnixNano": str(_NS), "severityNumber": 9}]}]}]}) + "\n")
    assert not flat_decode.all_protobuf(spark, str(tmp_path / "*"))
    df = read_otlp_logs(spark, str(tmp_path / "*"))
    n_pb = len(flatten_logs(
        _load_envelopes(spark, str(tmp_path / "a.pb"), "logs",
                        "protobuf")).collect())
    assert df.count() == n_pb + 1


def test_sniff_accepts_pb_dir_and_rejects_oversized(spark, tmp_path):
    env = _hostile_logs_env()
    for i in range(3):
        (tmp_path / f"f{i}.pb").write_bytes(encode_envelope_pb(env))
    assert flat_decode.all_protobuf(spark, str(tmp_path / "*.pb"))
    assert flat_decode.all_protobuf(spark, str(tmp_path))  # directory
    old = flat_decode.SNIFF_MAX_FILES
    try:
        flat_decode.SNIFF_MAX_FILES = 2
        assert not flat_decode.all_protobuf(spark, str(tmp_path / "*.pb"))
    finally:
        flat_decode.SNIFF_MAX_FILES = old


def test_java_double_twin_exact_zone(spark):
    """The Python double renderer matches Spark's cast-to-string for the
    zones flat_decode renders (integral < 9e15 handled by the 'N.0'
    branch; normal-range non-integrals by the Java-format shortest
    repr). Out-of-zone (|x| >= 9e15, subnormal) carries the documented
    digit-tail caveat and is NOT asserted here."""
    import random
    import struct

    from pyspark.sql import functions as F

    random.seed(20260818)
    vals = []
    while len(vals) < 4000:
        e = random.randint(1, 1023 + 53)     # normals below ~9e15
        b = (e << 52) | random.getrandbits(52)
        if random.random() < 0.5:
            b |= 1 << 63
        v = struct.unpack("<d", struct.pack("<Q", b))[0]
        if abs(v) < 9.0e15 and v == int(v):
            continue                          # integral branch, not cast
        vals.append(v)
    vals += [0.1, -0.1, 2.5e-5, 0.30000000000000004, 1e-3, 9.99e-4,
             123456.789, -999999.25]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    rows = df.select("i", F.col("v").cast("string").alias("s")).collect()
    for r in rows:
        v = vals[r["i"]]
        assert flat_decode._java_double_str(v) == r["s"], (v, r["s"])


def test_jackson_escape_twin(spark):
    """_jstr matches Spark's to_json rendering for every escape class
    the fast-path regex routes to the escaping branch."""
    from pyspark.sql import functions as F

    strs = ['say "hi"', "back\\slash", "tab\tnl\ncr\rff\fbs\b",
            "\x00\x01\x1f", "mixed \"q\" and \x02", "héllo ✓ \U0001F600",
            "del\x7fchar", "plain ascii"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)],
                               "i long, s string")
    j = F.to_json(F.struct(F.col("s").alias("v")))
    rendered = F.substring(j, 6, 2_000_000)
    rows = df.select("i", rendered.alias("r")).collect()
    for r in rows:
        s = strs[r["i"]]
        want = r["r"][:-1]        # strip the trailing '}'
        assert flat_decode._jstr(s) == want, (s, want, flat_decode._jstr(s))
