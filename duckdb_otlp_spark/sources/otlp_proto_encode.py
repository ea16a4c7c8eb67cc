"""proto3 encoder: OTLP envelope dicts (proto3-JSON shape) -> protobuf
bytes — the inverse of :mod:`duckdb_otlp_spark.sources.otlp_proto`.

Spec-driven against the public opentelemetry-proto v1 field numbers.
Used by the reader-gate fixture generation (the protobuf read path is
differentially checked against hand-flattened expected rows) and by the
test suite's round-trip parity fixtures. Moved here from tests/ so the
package can generate pb fixtures without importing test code.
"""

from __future__ import annotations




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
