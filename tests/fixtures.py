"""Deterministic OTLP/JSON test fixtures.

Regenerated from the envelope-shape + golden-expectation spec in
/root/repo/FIXTURES.md (derived from the reference's test corpus at
test/data/ and test/sql/*.test — content is equivalent, not copied).
"""

from __future__ import annotations

import json
from pathlib import Path


def _kv(key: str, value):
    if isinstance(value, bool):
        return {"key": key, "value": {"boolValue": value}}
    if isinstance(value, int):
        return {"key": key, "value": {"intValue": str(value)}}
    if isinstance(value, float):
        return {"key": key, "value": {"doubleValue": value}}
    return {"key": key, "value": {"stringValue": str(value)}}


_RESOURCE = {"attributes": [_kv("service.name", "test-service"), _kv("host.name", "test-host")]}


def _log_env(records):
    return {"resourceLogs": [{"resource": _RESOURCE,
                              "scopeLogs": [{"scope": {"name": "test-logger"},
                                             "logRecords": records}]}]}


def _span_env(spans, resource=_RESOURCE, scope={"name": "test-tracer"}):
    rs = {"scopeSpans": [{"spans": spans}]}
    if resource is not None:
        rs["resource"] = resource
    if scope is not None:
        rs["scopeSpans"][0]["scope"] = scope
    return {"resourceSpans": [rs]}


def _metric_env(metrics):
    return {"resourceMetrics": [{"resource": _RESOURCE,
                                 "scopeMetrics": [{"scope": {"name": "test-meter"},
                                                   "metrics": metrics}]}]}


BASE_NS = 1640000000000000000

LOGS_SIMPLE = [
    _log_env([{"timeUnixNano": str(BASE_NS), "severityNumber": 9, "severityText": "INFO",
               "body": {"stringValue": "Application started"},
               "attributes": [_kv("event.name", "startup")],
               "traceId": "5B8EFFF798038103D269B633813FC60C", "spanId": "EEE19B7EC3C1B174"}]),
    _log_env([{"timeUnixNano": str(BASE_NS + 10_000_000_000), "severityNumber": 13,
               "severityText": "WARN", "body": {"stringValue": "High memory usage"},
               "attributes": [_kv("memory.pct", 87)],
               "traceId": "5B8EFFF798038103D269B633813FC60C", "spanId": "EEE19B7EC3C1B175"}]),
    _log_env([{"timeUnixNano": str(BASE_NS + 20_000_000_000), "severityNumber": 17,
               "severityText": "ERROR", "body": {"stringValue": "Connection refused"},
               "attributes": [_kv("error.type", "network")],
               "traceId": "5B8EFFF798038103D269B633813FC60D", "spanId": "EEE19B7EC3C1B176"}]),
]

LOGS_NULLS = [
    {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": str(BASE_NS), "severityNumber": 9, "severityText": "INFO",
         "body": {"stringValue": "minimal log"}}]}]}]},
    {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": str(BASE_NS), "severityNumber": 0,
         "body": {"stringValue": "no trace context"}, "traceId": "", "spanId": ""}]}]}]},
    {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": str(BASE_NS), "severityNumber": 9, "body": {}}]}]}]},
]

LOGS_DOCUMENT = {"resourceLogs": [{"resource": {"attributes": [_kv("service.name", "my.service")]},
                                   "scopeLogs": [{"scope": {"name": "doc-logger"},
                                                  "logRecords": [
    {"timeUnixNano": str(BASE_NS), "severityNumber": 9, "severityText": "INFO",
     "body": {"stringValue": "Example log record"}}]}]}]}

TRACES_SIMPLE = [
    _span_env([{"traceId": "5B8EFFF798038103D269B633813FC60C", "spanId": "EEE19B7EC3C1B174",
                "parentSpanId": "EEE19B7EC3C1B173", "name": "GET /users", "kind": 2,
                "startTimeUnixNano": str(BASE_NS), "endTimeUnixNano": str(BASE_NS + 100_000_000),
                "attributes": [_kv("http.method", "GET"), _kv("http.status_code", 200)],
                "status": {"code": 0}}]),
    _span_env([{"traceId": "5B8EFFF798038103D269B633813FC60C", "spanId": "EEE19B7EC3C1B175",
                "parentSpanId": "EEE19B7EC3C1B174", "name": "SELECT * FROM users", "kind": 3,
                "startTimeUnixNano": str(BASE_NS + 10_000_000),
                "endTimeUnixNano": str(BASE_NS + 50_000_000),
                "attributes": [_kv("db.system", "postgresql")], "status": {"code": 0}}]),
    _span_env([{"traceId": "5B8EFFF798038103D269B633813FC60C", "spanId": "EEE19B7EC3C1B176",
                "parentSpanId": "EEE19B7EC3C1B174", "name": "cache lookup", "kind": 1,
                "startTimeUnixNano": str(BASE_NS + 5_000_000),
                "endTimeUnixNano": str(BASE_NS + 8_000_000),
                "attributes": [], "status": {"code": 0},
                "events": [{"timeUnixNano": str(BASE_NS + 6_000_000), "name": "cache.miss",
                            "attributes": [_kv("cache.key", "users:42")]}],
                "links": [{"traceId": "5B8EFFF798038103D269B633813FC60D",
                           "spanId": "EEE19B7EC3C1B180"}]}]),
]

TRACES_NULLS = [
    _span_env([{"traceId": "00000000000000000000000000000001", "spanId": "0000000000000001",
                "name": "minimal_span"}], resource=None, scope=None),
    {"resourceSpans": [{"resource": {}, "scopeSpans": [{"scope": {}, "spans": [
        {"traceId": "00000000000000000000000000000002", "spanId": "0000000000000002",
         "name": "empty_metadata", "kind": 0, "startTimeUnixNano": "0", "endTimeUnixNano": "0",
         "attributes": [], "events": [], "links": []}]}]}]},
    _span_env([{"traceId": "00000000000000000000000000000003", "spanId": "0000000000000003",
                "name": "no_parent", "parentSpanId": ""}], resource=None, scope=None),
]

SINGLE_TRACE = [
    _span_env([{"traceId": "00000000000000000000000000000001", "spanId": "00000000000000AA",
                "name": "single_span", "kind": 1,
                "startTimeUnixNano": str(BASE_NS), "endTimeUnixNano": str(BASE_NS + 1_000_000)}]),
]

METRICS_SIMPLE = [
    _metric_env([
        {"name": "http.server.requests", "description": "Request count", "unit": "1",
         "sum": {"dataPoints": [{"startTimeUnixNano": str(BASE_NS),
                                 "timeUnixNano": str(BASE_NS + 60_000_000_000),
                                 "asInt": "42", "attributes": [_kv("http.method", "GET")]}],
                 "aggregationTemporality": 2, "isMonotonic": True}},
        {"name": "system.memory.usage", "description": "Memory in use", "unit": "By",
         "gauge": {"dataPoints": [{"timeUnixNano": str(BASE_NS + 60_000_000_000),
                                   "asDouble": 524288000.0}]}},
        {"name": "http.server.duration", "description": "Request latency", "unit": "ms",
         "histogram": {"dataPoints": [{"startTimeUnixNano": str(BASE_NS),
                                       "timeUnixNano": str(BASE_NS + 60_000_000_000),
                                       "count": "100", "sum": 5000.0,
                                       "bucketCounts": ["10", "50", "30", "10"],
                                       "explicitBounds": [10.0, 50.0, 100.0]}],
                       "aggregationTemporality": 2}},
    ]),
]

METRICS_ALL_TYPES = [
    _metric_env([
        {"name": "latency.hist", "description": "Latency histogram", "unit": "ms",
         "histogram": {"dataPoints": [{"startTimeUnixNano": str(BASE_NS),
                                       "timeUnixNano": str(BASE_NS + 60_000_000_000),
                                       "count": "50", "sum": 250.0,
                                       "bucketCounts": ["5", "10", "15", "12", "8"],
                                       "explicitBounds": [5.0, 10.0, 20.0, 50.0],
                                       "attributes": [_kv("endpoint", "/health")]}],
                       "aggregationTemporality": 2}},
        {"name": "latency.exp", "description": "Exp latency histogram", "unit": "ms",
         "exponentialHistogram": {"dataPoints": [{
             "startTimeUnixNano": str(BASE_NS), "timeUnixNano": str(BASE_NS + 60_000_000_000),
             "count": "12", "sum": 45.5, "scale": 3, "zeroCount": "1",
             "min": 1.0, "max": 9.5,
             "positive": {"offset": 2, "bucketCounts": ["3", "4", "2"]},
             "negative": {"offset": -1, "bucketCounts": ["1", "1"]}}],
             "aggregationTemporality": 2}},
    ]),
]

METRICS_SUMMARY_ONLY = [
    _metric_env([
        {"name": "rpc.duration.summary", "unit": "ms",
         "summary": {"dataPoints": [{"timeUnixNano": str(BASE_NS),
                                     "count": "10", "sum": 100.0}]}},
    ]),
]

METRICS_TEMPORALITY_STRINGS = [
    _metric_env([
        {"name": "string.temporality.sum", "unit": "1",
         "sum": {"dataPoints": [{"timeUnixNano": str(BASE_NS), "asInt": "7"}],
                 "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                 "isMonotonic": False}},
    ]),
]

TS_BOUNDARY_LOGS = [
    _log_env([{"timeUnixNano": "9223372036854775000", "severityNumber": 9,
               "severityText": "INFO", "body": {"stringValue": "near the edge"}}]),
]

TS_OVERFLOW_LOGS = [
    _log_env([{"timeUnixNano": "18446744073709551000", "severityNumber": 9,
               "severityText": "INFO", "body": {"stringValue": "too big"}}]),
]

MULTIFILE_VALID_TRACES = [
    _span_env([{"traceId": "00000000000000000000000000000010", "spanId": "0000000000000010",
                "name": "valid_multifile_span", "startTimeUnixNano": str(BASE_NS),
                "endTimeUnixNano": str(BASE_NS + 1000)}]),
]


def write_fixtures(root: Path) -> dict[str, Path]:
    """Write every fixture file under ``root``; returns name -> path."""
    root.mkdir(parents=True, exist_ok=True)
    out: dict[str, Path] = {}

    def jsonl(name: str, envs):
        p = root / name
        p.write_text("".join(json.dumps(e) + "\n" for e in envs))
        out[name] = p

    jsonl("logs_simple.jsonl", LOGS_SIMPLE)
    jsonl("logs_nulls.jsonl", LOGS_NULLS)
    jsonl("traces_simple.jsonl", TRACES_SIMPLE)
    jsonl("traces_nulls.jsonl", TRACES_NULLS)
    jsonl("single_trace.jsonl", SINGLE_TRACE)
    jsonl("metrics_simple.jsonl", METRICS_SIMPLE)
    jsonl("metrics_all_types.jsonl", METRICS_ALL_TYPES)
    jsonl("metrics_summary_only.jsonl", METRICS_SUMMARY_ONLY)
    jsonl("metrics_temporality_strings.jsonl", METRICS_TEMPORALITY_STRINGS)
    jsonl("ts_boundary_logs.jsonl", TS_BOUNDARY_LOGS)
    jsonl("ts_overflow_logs.jsonl", TS_OVERFLOW_LOGS)
    jsonl("multifile_valid_traces.jsonl", MULTIFILE_VALID_TRACES)

    (root / "logs_document.json").write_text(json.dumps(LOGS_DOCUMENT, indent=2))
    out["logs_document.json"] = root / "logs_document.json"
    (root / "empty.jsonl").write_text("")
    out["empty.jsonl"] = root / "empty.jsonl"
    (root / "whitespace.jsonl").write_text("   \n  \n")
    out["whitespace.jsonl"] = root / "whitespace.jsonl"
    (root / "malformed.jsonl").write_text('{"resourceLogs": [ this is not json\n')
    out["malformed.jsonl"] = root / "malformed.jsonl"
    (root / "multifile_malformed_traces.jsonl").write_text('{"resourceSpans": [ oops\n')
    out["multifile_malformed_traces.jsonl"] = root / "multifile_malformed_traces.jsonl"
    return out


# ---------------------------------------------------------------------------
# proto3 encoder (tests only): envelope dicts -> OTLP protobuf bytes, the
# inverse of duckdb_otlp_spark.sources.otlp_proto. Spec-driven against the
# public opentelemetry-proto v1 field numbers so pb fixtures stay derived
# from the same JSON fixtures above (round-trip parity tests).
# ---------------------------------------------------------------------------

import base64 as _b64
import struct as _struct

_AT_ENUM = {"AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
            "AGGREGATION_TEMPORALITY_DELTA": 1,
            "AGGREGATION_TEMPORALITY_CUMULATIVE": 2}


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_tag(f: int, wt: int) -> bytes:
    return _enc_varint((f << 3) | wt)


def _enc_ld(f: int, payload: bytes) -> bytes:
    return _enc_tag(f, 2) + _enc_varint(len(payload)) + payload


def _enc_field(f: int, kind, val) -> bytes:
    if isinstance(kind, tuple):
        k, spec = kind
        if k == "m":
            return _enc_ld(f, _enc_msg(val, spec))
        if k == "rm":
            return b"".join(_enc_ld(f, _enc_msg(v, spec)) for v in val)
        raise ValueError(k)
    if kind == "s":
        return _enc_ld(f, str(val).encode())
    if kind == "u":
        return _enc_tag(f, 0) + _enc_varint(int(val))
    if kind == "at":  # temporality enum: int or name string
        n = val if isinstance(val, int) else _AT_ENUM[val]
        return _enc_tag(f, 0) + _enc_varint(n)
    if kind == "iv":  # int64 varint, two's complement
        n = int(val)
        return _enc_tag(f, 0) + _enc_varint(n + (1 << 64) if n < 0 else n)
    if kind == "z":  # sint32/64 zigzag varint
        n = int(val)
        return _enc_tag(f, 0) + _enc_varint((n << 1) ^ (n >> 63))
    if kind == "b":
        return _enc_tag(f, 0) + _enc_varint(1 if val else 0)
    if kind == "t":  # u64 fixed64 (timestamps, counts)
        return _enc_tag(f, 1) + _struct.pack("<Q", int(val))
    if kind == "i8":  # sfixed64 (asInt)
        return _enc_tag(f, 1) + _struct.pack("<q", int(val))
    if kind == "d":
        return _enc_tag(f, 1) + _struct.pack("<d", float(val))
    if kind == "f4":  # fixed32 (flags)
        return _enc_tag(f, 5) + _struct.pack("<I", int(val))
    if kind == "hex":
        return _enc_ld(f, bytes.fromhex(str(val)))
    if kind == "b64":
        return _enc_ld(f, _b64.b64decode(val))
    if kind == "pt":  # packed fixed64 u64 list
        return _enc_ld(f, b"".join(_struct.pack("<Q", int(x)) for x in val))
    if kind == "pd":  # packed doubles
        return _enc_ld(f, b"".join(_struct.pack("<d", float(x)) for x in val))
    if kind == "pv":  # packed varints
        return _enc_ld(f, b"".join(_enc_varint(int(x)) for x in val))
    raise ValueError(kind)


def _enc_msg(d: dict, spec: dict) -> bytes:
    out = b""
    for key, (f, kind) in spec.items():
        if key in d and d[key] is not None:
            out += _enc_field(f, kind, d[key])
    return out


_ANY_VALUE: dict = {}
_KEY_VALUE = {"key": (1, "s"), "value": (2, ("m", _ANY_VALUE))}
_ANY_VALUE.update({
    "stringValue": (1, "s"), "boolValue": (2, "b"), "intValue": (3, "iv"),
    "doubleValue": (4, "d"),
    "arrayValue": (5, ("m", {"values": (1, ("rm", _ANY_VALUE))})),
    "kvlistValue": (6, ("m", {"values": (1, ("rm", _KEY_VALUE))})),
    "bytesValue": (7, "b64"),
})
_RESOURCE_SPEC = {"attributes": (1, ("rm", _KEY_VALUE)),
                  "droppedAttributesCount": (2, "u")}
_SCOPE_SPEC = {"name": (1, "s"), "version": (2, "s"),
               "attributes": (3, ("rm", _KEY_VALUE)),
               "droppedAttributesCount": (4, "u")}
_LOG_RECORD = {
    "timeUnixNano": (1, "t"), "severityNumber": (2, "u"), "severityText": (3, "s"),
    "body": (5, ("m", _ANY_VALUE)), "attributes": (6, ("rm", _KEY_VALUE)),
    "droppedAttributesCount": (7, "u"), "flags": (8, "f4"),
    "traceId": (9, "hex"), "spanId": (10, "hex"),
    "observedTimeUnixNano": (11, "t"), "eventName": (12, "s"),
}
_SPAN_EVENT = {"timeUnixNano": (1, "t"), "name": (2, "s"),
               "attributes": (3, ("rm", _KEY_VALUE)), "droppedAttributesCount": (4, "u")}
_SPAN_LINK = {"traceId": (1, "hex"), "spanId": (2, "hex"), "traceState": (3, "s"),
              "attributes": (4, ("rm", _KEY_VALUE)), "droppedAttributesCount": (5, "u"),
              "flags": (6, "f4")}
_STATUS = {"message": (2, "s"), "code": (3, "u")}
_SPAN = {
    "traceId": (1, "hex"), "spanId": (2, "hex"), "traceState": (3, "s"),
    "parentSpanId": (4, "hex"), "name": (5, "s"), "kind": (6, "u"),
    "startTimeUnixNano": (7, "t"), "endTimeUnixNano": (8, "t"),
    "attributes": (9, ("rm", _KEY_VALUE)), "droppedAttributesCount": (10, "u"),
    "events": (11, ("rm", _SPAN_EVENT)), "droppedEventsCount": (12, "u"),
    "links": (13, ("rm", _SPAN_LINK)), "droppedLinksCount": (14, "u"),
    "status": (15, ("m", _STATUS)), "flags": (16, "f4"),
}
_EXEMPLAR = {"timeUnixNano": (2, "t"), "asDouble": (3, "d"), "spanId": (4, "hex"),
             "traceId": (5, "hex"), "asInt": (6, "i8"),
             "filteredAttributes": (7, ("rm", _KEY_VALUE))}
_NUMBER_DP = {"startTimeUnixNano": (2, "t"), "timeUnixNano": (3, "t"),
              "asDouble": (4, "d"), "exemplars": (5, ("rm", _EXEMPLAR)),
              "asInt": (6, "i8"), "attributes": (7, ("rm", _KEY_VALUE)),
              "flags": (8, "u")}
_HIST_DP = {"startTimeUnixNano": (2, "t"), "timeUnixNano": (3, "t"),
            "count": (4, "t"), "sum": (5, "d"), "bucketCounts": (6, "pt"),
            "explicitBounds": (7, "pd"), "exemplars": (8, ("rm", _EXEMPLAR)),
            "attributes": (9, ("rm", _KEY_VALUE)), "flags": (10, "u"),
            "min": (11, "d"), "max": (12, "d")}
_EXP_BUCKETS = {"offset": (1, "z"), "bucketCounts": (2, "pv")}
_EXP_HIST_DP = {
    "attributes": (1, ("rm", _KEY_VALUE)), "startTimeUnixNano": (2, "t"),
    "timeUnixNano": (3, "t"), "count": (4, "t"), "sum": (5, "d"),
    "scale": (6, "z"), "zeroCount": (7, "t"),
    "positive": (8, ("m", _EXP_BUCKETS)), "negative": (9, ("m", _EXP_BUCKETS)),
    "flags": (10, "u"), "exemplars": (11, ("rm", _EXEMPLAR)),
    "min": (12, "d"), "max": (13, "d"), "zeroThreshold": (14, "d"),
}
_SUMMARY_DP = {"startTimeUnixNano": (2, "t"), "timeUnixNano": (3, "t"),
               "count": (4, "t"), "sum": (5, "d")}
_METRIC = {
    "name": (1, "s"), "description": (2, "s"), "unit": (3, "s"),
    "gauge": (5, ("m", {"dataPoints": (1, ("rm", _NUMBER_DP))})),
    "sum": (7, ("m", {"dataPoints": (1, ("rm", _NUMBER_DP)),
                      "aggregationTemporality": (2, "at"), "isMonotonic": (3, "b")})),
    "histogram": (9, ("m", {"dataPoints": (1, ("rm", _HIST_DP)),
                            "aggregationTemporality": (2, "at")})),
    "exponentialHistogram": (10, ("m", {"dataPoints": (1, ("rm", _EXP_HIST_DP)),
                                        "aggregationTemporality": (2, "at")})),
    "summary": (11, ("m", {"dataPoints": (1, ("rm", _SUMMARY_DP))})),
}
_LOGS_DATA = {"resourceLogs": (1, ("rm", {
    "resource": (1, ("m", _RESOURCE_SPEC)),
    "scopeLogs": (2, ("rm", {"scope": (1, ("m", _SCOPE_SPEC)),
                             "logRecords": (2, ("rm", _LOG_RECORD))}))}))}
_TRACES_DATA = {"resourceSpans": (1, ("rm", {
    "resource": (1, ("m", _RESOURCE_SPEC)),
    "scopeSpans": (2, ("rm", {"scope": (1, ("m", _SCOPE_SPEC)),
                              "spans": (2, ("rm", _SPAN))}))}))}
_METRICS_DATA = {"resourceMetrics": (1, ("rm", {
    "resource": (1, ("m", _RESOURCE_SPEC)),
    "scopeMetrics": (2, ("rm", {"scope": (1, ("m", _SCOPE_SPEC)),
                                "metrics": (2, ("rm", _METRIC))}))}))}


def encode_envelope_pb(env: dict) -> bytes:
    """Envelope dict (proto3-JSON shape) -> OTLP protobuf bytes."""
    if "resourceLogs" in env:
        return _enc_msg(env, _LOGS_DATA)
    if "resourceSpans" in env:
        return _enc_msg(env, _TRACES_DATA)
    if "resourceMetrics" in env:
        return _enc_msg(env, _METRICS_DATA)
    raise ValueError("unknown envelope")
