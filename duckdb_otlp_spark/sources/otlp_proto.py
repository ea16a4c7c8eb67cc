"""OTLP protobuf decoding without a protobuf library.

Implements the proto3 wire format (varint / fixed64 / length-delimited /
fixed32 — public encoding spec) against the public opentelemetry-proto
v1 field numbers, producing the same proto3-JSON-shaped envelope dicts
the JSON readers parse — so protobuf files flow through the identical
Spark flatten plan (reference equivalent: the Rust otlp2records parse
behind src/function/read_otlp.cpp:261-344).

Executor-side usage: the decoder runs inside ``mapInPandas`` over
``binaryFile`` rows — one file per task, the reference's own parallelism
unit (reference: read_otlp.cpp:62-77).
"""

from __future__ import annotations

import json
import struct
from typing import Any

# ---------------------------------------------------------------------------
# proto3 wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes) -> list:
    """(field_number, wire_type, value) triples over a message buffer.

    This IS the decode hot loop — every varint of every nested message
    passes through here — so it returns a list (no generator resumption
    cost) with the varint reads inlined and a single-byte fast path
    (in OTLP payloads almost every key and most scalar values fit one
    byte). Measured ~2.5x over the generator+helper formulation; the
    out-of-bounds read on a truncated buffer surfaces as IndexError and
    is mapped to the same ValueError the old code raised."""
    out = []
    append = out.append
    pos = 0
    n = len(buf)
    try:
        while pos < n:
            key = buf[pos]
            pos += 1
            if key >= 0x80:
                key &= 0x7F
                shift = 7
                while True:
                    b = buf[pos]
                    pos += 1
                    key |= (b & 0x7F) << shift
                    if b < 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("varint too long")
            wt = key & 7
            if wt == 2:
                ln = buf[pos]
                pos += 1
                if ln >= 0x80:
                    ln &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        ln |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
                end = pos + ln
                if end > n:
                    raise ValueError("truncated length-delimited field")
                val = buf[pos:end]
                pos = end
            elif wt == 0:
                val = buf[pos]
                pos += 1
                if val >= 0x80:
                    val &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        val |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
            elif wt == 1:
                val = buf[pos:pos + 8]
                if len(val) != 8:
                    raise ValueError("truncated fixed64")
                pos += 8
            elif wt == 5:
                val = buf[pos:pos + 4]
                if len(val) != 4:
                    raise ValueError("truncated fixed32")
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            append((key >> 3, wt, val))
    except IndexError:
        raise ValueError("truncated varint") from None
    return out


# Precompiled unpack + small-int str table for the fused hot walks:
# _u64(v) pays a Python call + format dispatch per timestamp (~220 ns);
# _U64(v)[0] is ~150 ns, and _STR256[v] beats str(v) ~2x for the small
# non-negative varints (severity, flags, dropped counts) that dominate
# OTLP scalar fields. Outputs are byte-identical.
_U64 = struct.Struct("<Q").unpack
_U32 = struct.Struct("<I").unpack
_STR256 = tuple(map(str, range(256)))


def _u64(b: bytes) -> int:
    return struct.unpack("<Q", b)[0]


def _i64(b: bytes) -> int:
    return struct.unpack("<q", b)[0]


def _f64(b: bytes) -> float:
    return struct.unpack("<d", b)[0]


def _u32(b: bytes) -> int:
    return struct.unpack("<I", b)[0]


def _packed(buf: bytes, wt: int, reader) -> list:
    """Decode a packed repeated numeric payload."""
    out = []
    pos = 0
    while pos < len(buf):
        if reader is _read_varint:
            v, pos = _read_varint(buf, pos)
            out.append(v)
        else:
            width, fn = reader
            out.append(fn(buf[pos:pos + width]))
            pos += width
    return out


# ---------------------------------------------------------------------------
# opentelemetry-proto v1 message decoders (field numbers from the public
# .proto definitions at github.com/open-telemetry/opentelemetry-proto)
# ---------------------------------------------------------------------------


def _any_value(buf: bytes) -> dict[str, Any]:
    # Fused wire walk (same shape as _fields, see there): AnyValue runs
    # once per log body plus once per attribute value, so the triple
    # list _fields returns is pure allocation overhead here. The walk
    # below decodes each field and dispatches on it immediately —
    # measured with _log_record's twin fusion at 1.14x on the 100k-record
    # pb corpus (min-of-7, interleaved A/B). Dispatch logic is identical
    # to the pre-fusion loop; any-wire-type leniency preserved.
    out: dict[str, Any] = {}
    pos = 0
    n = len(buf)
    try:
        while pos < n:
            key = buf[pos]
            pos += 1
            if key >= 0x80:
                key &= 0x7F
                shift = 7
                while True:
                    b = buf[pos]
                    pos += 1
                    key |= (b & 0x7F) << shift
                    if b < 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("varint too long")
            wt = key & 7
            if wt == 2:
                ln = buf[pos]
                pos += 1
                if ln >= 0x80:
                    ln &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        ln |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
                end = pos + ln
                if end > n:
                    raise ValueError("truncated length-delimited field")
                v = buf[pos:end]
                pos = end
            elif wt == 0:
                v = buf[pos]
                pos += 1
                if v >= 0x80:
                    v &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
            elif wt == 1:
                v = buf[pos:pos + 8]
                if len(v) != 8:
                    raise ValueError("truncated fixed64")
                pos += 8
            elif wt == 5:
                v = buf[pos:pos + 4]
                if len(v) != 4:
                    raise ValueError("truncated fixed32")
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            f = key >> 3
            if f == 1:
                out["stringValue"] = v.decode("utf-8", "replace")
            elif f == 2:
                out["boolValue"] = bool(v)
            elif f == 3:
                sv = v - (1 << 64) if v >= (1 << 63) else v  # int64 from varint
                out["intValue"] = str(sv)
            elif f == 4:
                out["doubleValue"] = _f64(v)
            elif f == 5:
                out["arrayValue"] = {"values": [_any_value(x) for _, _, x in _fields(v)]}
            elif f == 6:
                out["kvlistValue"] = {"values": [_key_value(x) for _, _, x in _fields(v)]}
            elif f == 7:
                import base64
                out["bytesValue"] = base64.b64encode(v).decode()
    except IndexError:
        raise ValueError("truncated varint") from None
    return out


def _key_value(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["key"] = v.decode("utf-8", "replace")
        elif f == 2:
            out["value"] = _any_value(v)
    return out


# Attribute memo: telemetry attributes repeat massively (the same
# key=value pair encodes to the same bytes across millions of records),
# so attribute decode is a bytes-keyed cache hit on realistic data —
# measured ~2x on the 20k-record log bench. The decoded dicts are
# shared by reference and never mutated downstream (envelopes are only
# serialized/converted); the cache clears at 64k distinct encodings so
# adversarial high-cardinality attrs stay bounded.
_KV_CACHE: dict[bytes, dict] = {}


def _key_value_cached(buf: bytes) -> dict[str, Any]:
    got = _KV_CACHE.get(buf)
    if got is None:
        if len(_KV_CACHE) >= 65536:
            _KV_CACHE.clear()
        got = _KV_CACHE[buf] = _key_value(buf)
    return got


def _resource(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {"attributes": []}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["attributes"].append(_key_value_cached(v))
        elif f == 2:
            out["droppedAttributesCount"] = str(v)
    return out


def _scope(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["name"] = v.decode("utf-8", "replace")
        elif f == 2:
            out["version"] = v.decode("utf-8", "replace")
        elif f == 3:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 4:
            out["droppedAttributesCount"] = str(v)
    return out


def _log_record(buf: bytes) -> dict[str, Any]:
    # Fused wire walk — one of these runs per log record, the single
    # hottest decoder in the module (see _any_value for the measured
    # fusion rationale). Dispatch is byte-for-byte the pre-fusion loop.
    out: dict[str, Any] = {}
    pos = 0
    n = len(buf)
    try:
        while pos < n:
            key = buf[pos]
            pos += 1
            if key >= 0x80:
                key &= 0x7F
                shift = 7
                while True:
                    b = buf[pos]
                    pos += 1
                    key |= (b & 0x7F) << shift
                    if b < 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("varint too long")
            wt = key & 7
            if wt == 2:
                ln = buf[pos]
                pos += 1
                if ln >= 0x80:
                    ln &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        ln |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
                end = pos + ln
                if end > n:
                    raise ValueError("truncated length-delimited field")
                v = buf[pos:end]
                pos = end
            elif wt == 0:
                v = buf[pos]
                pos += 1
                if v >= 0x80:
                    v &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
            elif wt == 1:
                v = buf[pos:pos + 8]
                if len(v) != 8:
                    raise ValueError("truncated fixed64")
                pos += 8
            elif wt == 5:
                v = buf[pos:pos + 4]
                if len(v) != 4:
                    raise ValueError("truncated fixed32")
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            f = key >> 3
            if f == 1:
                out["timeUnixNano"] = str(_U64(v)[0])
            elif f == 2:
                # wt==0 guarantees an int (lenient decode may hand other
                # wire types here as bytes; str(v) reproduces old output)
                out["severityNumber"] = (
                    _STR256[v] if wt == 0 and v < 256 else str(v))
            elif f == 3:
                out["severityText"] = v.decode("utf-8", "replace")
            elif f == 5:
                # Fast path: telemetry bodies are overwhelmingly ONE
                # stringValue, wire shape 0x0A <len-varint> <utf8>
                # spanning the whole submessage — decoded inline, with
                # anything else (other AnyValue kinds, trailing fields,
                # truncated varints) falling back to the generic walk,
                # which reproduces the old behavior exactly.
                nb = len(v)
                if nb >= 2 and v[0] == 0x0A:
                    ln2 = v[1]
                    p = 2
                    if ln2 >= 0x80:
                        ln2 &= 0x7F
                        shift2 = 7
                        while p < nb:
                            b2 = v[p]
                            p += 1
                            ln2 |= (b2 & 0x7F) << shift2
                            if b2 < 0x80:
                                break
                            shift2 += 7
                            if shift2 > 70:
                                ln2 = -1  # oversized -> generic walk raises
                                break
                        else:
                            ln2 = -1  # truncated -> generic walk raises
                    if p + ln2 == nb:
                        out["body"] = {
                            "stringValue": v[p:].decode("utf-8", "replace")}
                    else:
                        out["body"] = _any_value(v)
                else:
                    out["body"] = _any_value(v)
            elif f == 6:
                # inline cache hit (saves a call per attribute; the
                # miss path still goes through _key_value_cached), and
                # .get instead of setdefault — setdefault allocates a
                # fresh empty-list default on EVERY attribute
                kv = _KV_CACHE.get(v)
                if kv is None:
                    kv = _key_value_cached(v)
                a = out.get("attributes")
                if a is None:
                    a = out["attributes"] = []
                a.append(kv)
            elif f == 7:
                out["droppedAttributesCount"] = (
                    _STR256[v] if wt == 0 and v < 256 else str(v))
            elif f == 8:
                out["flags"] = (str(_U32(v)[0]) if wt == 5
                                else _STR256[v] if wt == 0 and v < 256
                                else str(v))
            elif f == 9:
                out["traceId"] = v.hex()
            elif f == 10:
                out["spanId"] = v.hex()
            elif f == 11:
                out["observedTimeUnixNano"] = str(_U64(v)[0])
            elif f == 12:
                out["eventName"] = v.decode("utf-8", "replace")
    except IndexError:
        raise ValueError("truncated varint") from None
    return out


def decode_logs(data: bytes) -> dict[str, Any]:
    """ExportLogsServiceRequest / LogsData -> proto3-JSON envelope dict."""
    resource_logs = []
    for f, wt, v in _fields(data):
        if f != 1:
            continue
        rl: dict[str, Any] = {}
        for f2, _, v2 in _fields(v):
            if f2 == 1:
                rl["resource"] = _resource(v2)
            elif f2 == 2:
                sl: dict[str, Any] = {}
                lr_append = None  # bound once; setdefault per record is
                for f3, _, v3 in _fields(v2):  # pure overhead in the hot loop
                    if f3 == 1:
                        sl["scope"] = _scope(v3)
                    elif f3 == 2:
                        if lr_append is None:
                            lr_append = sl.setdefault("logRecords", []).append
                        lr_append(_log_record(v3))
                rl.setdefault("scopeLogs", []).append(sl)
        resource_logs.append(rl)
    return {"resourceLogs": resource_logs}


def _span_event(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["timeUnixNano"] = str(_u64(v))
        elif f == 2:
            out["name"] = v.decode("utf-8", "replace")
        elif f == 3:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 4:
            out["droppedAttributesCount"] = str(v)
    return out


def _span_link(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["traceId"] = v.hex()
        elif f == 2:
            out["spanId"] = v.hex()
        elif f == 3:
            out["traceState"] = v.decode("utf-8", "replace")
        elif f == 4:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 5:
            out["droppedAttributesCount"] = str(v)
        elif f == 6:
            out["flags"] = str(_u32(v) if wt == 5 else v)
    return out


def _span(buf: bytes) -> dict[str, Any]:
    # Fused wire walk — one per span, the traces twin of _log_record
    # (see _any_value for the measured fusion rationale). Dispatch is
    # byte-for-byte the pre-fusion loop.
    out: dict[str, Any] = {}
    pos = 0
    n = len(buf)
    try:
        while pos < n:
            key = buf[pos]
            pos += 1
            if key >= 0x80:
                key &= 0x7F
                shift = 7
                while True:
                    b = buf[pos]
                    pos += 1
                    key |= (b & 0x7F) << shift
                    if b < 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("varint too long")
            wt = key & 7
            if wt == 2:
                ln = buf[pos]
                pos += 1
                if ln >= 0x80:
                    ln &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        ln |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
                end = pos + ln
                if end > n:
                    raise ValueError("truncated length-delimited field")
                v = buf[pos:end]
                pos = end
            elif wt == 0:
                v = buf[pos]
                pos += 1
                if v >= 0x80:
                    v &= 0x7F
                    shift = 7
                    while True:
                        b = buf[pos]
                        pos += 1
                        v |= (b & 0x7F) << shift
                        if b < 0x80:
                            break
                        shift += 7
                        if shift > 70:
                            raise ValueError("varint too long")
            elif wt == 1:
                v = buf[pos:pos + 8]
                if len(v) != 8:
                    raise ValueError("truncated fixed64")
                pos += 8
            elif wt == 5:
                v = buf[pos:pos + 4]
                if len(v) != 4:
                    raise ValueError("truncated fixed32")
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            f = key >> 3
            if f == 1:
                out["traceId"] = v.hex()
            elif f == 2:
                out["spanId"] = v.hex()
            elif f == 3:
                out["traceState"] = v.decode("utf-8", "replace")
            elif f == 4:
                out["parentSpanId"] = v.hex()
            elif f == 5:
                out["name"] = v.decode("utf-8", "replace")
            elif f == 6:
                out["kind"] = _STR256[v] if wt == 0 and v < 256 else str(v)
            elif f == 7:
                out["startTimeUnixNano"] = str(_U64(v)[0])
            elif f == 8:
                out["endTimeUnixNano"] = str(_U64(v)[0])
            elif f == 9:
                kv = _KV_CACHE.get(v)
                if kv is None:
                    kv = _key_value_cached(v)
                a = out.get("attributes")
                if a is None:
                    a = out["attributes"] = []
                a.append(kv)
            elif f == 10:
                out["droppedAttributesCount"] = (
                    _STR256[v] if wt == 0 and v < 256 else str(v))
            elif f == 11:
                out.setdefault("events", []).append(_span_event(v))
            elif f == 12:
                out["droppedEventsCount"] = str(v)
            elif f == 13:
                out.setdefault("links", []).append(_span_link(v))
            elif f == 14:
                out["droppedLinksCount"] = str(v)
            elif f == 15:
                status: dict[str, Any] = {}
                for f2, _, v2 in _fields(v):
                    if f2 == 2:
                        status["message"] = v2.decode("utf-8", "replace")
                    elif f2 == 3:
                        status["code"] = str(v2)
                out["status"] = status
            elif f == 16:
                out["flags"] = str(_u32(v) if wt == 5 else v)
    except IndexError:
        raise ValueError("truncated varint") from None
    return out


def decode_traces(data: bytes) -> dict[str, Any]:
    """ExportTraceServiceRequest / TracesData -> envelope dict."""
    resource_spans = []
    for f, wt, v in _fields(data):
        if f != 1:
            continue
        rs: dict[str, Any] = {}
        for f2, _, v2 in _fields(v):
            if f2 == 1:
                rs["resource"] = _resource(v2)
            elif f2 == 2:
                ss: dict[str, Any] = {}
                sp_append = None
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        ss["scope"] = _scope(v3)
                    elif f3 == 2:
                        if sp_append is None:
                            sp_append = ss.setdefault("spans", []).append
                        sp_append(_span(v3))
                rs.setdefault("scopeSpans", []).append(ss)
        resource_spans.append(rs)
    return {"resourceSpans": resource_spans}


def _exemplar(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 2:
            out["timeUnixNano"] = str(_u64(v))
        elif f == 3:
            out["asDouble"] = _f64(v)
        elif f == 4:
            out["spanId"] = v.hex()
        elif f == 5:
            out["traceId"] = v.hex()
        elif f == 6:
            out["asInt"] = str(_i64(v))
        elif f == 7:
            out.setdefault("filteredAttributes", []).append(_key_value_cached(v))
    return out


def _number_dp(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 2:
            out["startTimeUnixNano"] = str(_u64(v))
        elif f == 3:
            out["timeUnixNano"] = str(_u64(v))
        elif f == 4:
            out["asDouble"] = _f64(v)
        elif f == 5:
            out.setdefault("exemplars", []).append(_exemplar(v))
        elif f == 6:
            out["asInt"] = str(_i64(v))
        elif f == 7:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 8:
            out["flags"] = str(v)
    return out


def _hist_dp(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 2:
            out["startTimeUnixNano"] = str(_u64(v))
        elif f == 3:
            out["timeUnixNano"] = str(_u64(v))
        elif f == 4:
            out["count"] = str(_u64(v))
        elif f == 5:
            out["sum"] = _f64(v)
        elif f == 6:
            if wt == 2:
                out.setdefault("bucketCounts", []).extend(
                    str(x) for x in _packed(v, wt, (8, _u64)))
            else:
                out.setdefault("bucketCounts", []).append(str(_u64(v)))
        elif f == 7:
            if wt == 2:
                out.setdefault("explicitBounds", []).extend(_packed(v, wt, (8, _f64)))
            else:
                out.setdefault("explicitBounds", []).append(_f64(v))
        elif f == 8:
            out.setdefault("exemplars", []).append(_exemplar(v))
        elif f == 9:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 10:
            out["flags"] = str(v)
        elif f == 11:
            out["min"] = _f64(v)
        elif f == 12:
            out["max"] = _f64(v)
    return out


def _exp_buckets(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["offset"] = str(_zigzag(v))
        elif f == 2:
            if wt == 2:
                out.setdefault("bucketCounts", []).extend(
                    str(x) for x in _packed(v, wt, _read_varint))
            else:
                out.setdefault("bucketCounts", []).append(str(v))
    return out


def _exp_hist_dp(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out.setdefault("attributes", []).append(_key_value_cached(v))
        elif f == 2:
            out["startTimeUnixNano"] = str(_u64(v))
        elif f == 3:
            out["timeUnixNano"] = str(_u64(v))
        elif f == 4:
            out["count"] = str(_u64(v))
        elif f == 5:
            out["sum"] = _f64(v)
        elif f == 6:
            out["scale"] = str(_zigzag(v))
        elif f == 7:
            out["zeroCount"] = str(_u64(v))
        elif f == 8:
            out["positive"] = _exp_buckets(v)
        elif f == 9:
            out["negative"] = _exp_buckets(v)
        elif f == 10:
            out["flags"] = str(v)
        elif f == 11:
            out.setdefault("exemplars", []).append(_exemplar(v))
        elif f == 12:
            out["min"] = _f64(v)
        elif f == 13:
            out["max"] = _f64(v)
        elif f == 14:
            out["zeroThreshold"] = _f64(v)
    return out


def _metric(buf: bytes) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for f, wt, v in _fields(buf):
        if f == 1:
            out["name"] = v.decode("utf-8", "replace")
        elif f == 2:
            out["description"] = v.decode("utf-8", "replace")
        elif f == 3:
            out["unit"] = v.decode("utf-8", "replace")
        elif f == 5:
            out["gauge"] = {"dataPoints": [
                _number_dp(x) for f2, _, x in _fields(v) if f2 == 1]}
        elif f == 7:
            sum_out: dict[str, Any] = {"dataPoints": []}
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    sum_out["dataPoints"].append(_number_dp(v2))
                elif f2 == 2:
                    sum_out["aggregationTemporality"] = str(v2)
                elif f2 == 3:
                    sum_out["isMonotonic"] = bool(v2)
            out["sum"] = sum_out
        elif f == 9:
            h: dict[str, Any] = {"dataPoints": []}
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    h["dataPoints"].append(_hist_dp(v2))
                elif f2 == 2:
                    h["aggregationTemporality"] = str(v2)
            out["histogram"] = h
        elif f == 10:
            e: dict[str, Any] = {"dataPoints": []}
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    e["dataPoints"].append(_exp_hist_dp(v2))
                elif f2 == 2:
                    e["aggregationTemporality"] = str(v2)
            out["exponentialHistogram"] = e
        elif f == 11:
            out["summary"] = {"dataPoints": [
                {} for f2, _, _x in _fields(v) if f2 == 1]}
    return out


def decode_metrics(data: bytes) -> dict[str, Any]:
    """ExportMetricsServiceRequest / MetricsData -> envelope dict."""
    resource_metrics = []
    for f, wt, v in _fields(data):
        if f != 1:
            continue
        rm: dict[str, Any] = {}
        for f2, _, v2 in _fields(v):
            if f2 == 1:
                rm["resource"] = _resource(v2)
            elif f2 == 2:
                sm: dict[str, Any] = {}
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        sm["scope"] = _scope(v3)
                    elif f3 == 2:
                        sm.setdefault("metrics", []).append(_metric(v3))
                rm.setdefault("scopeMetrics", []).append(sm)
        resource_metrics.append(rm)
    return {"resourceMetrics": resource_metrics}


DECODERS = {
    "logs": decode_logs,
    "traces": decode_traces,
    "metrics": decode_metrics,
}


def pb_to_json_line(data: bytes, signal: str) -> str:
    """Decode a protobuf payload to one compact JSON envelope line."""
    return json.dumps(DECODERS[signal](data), separators=(",", ":"))


def looks_like_json(data: bytes) -> bool:
    """Format auto-detection: OTLP/JSON starts with '{' after optional
    BOM/whitespace; anything else is treated as protobuf
    (reference: FORMAT AUTO in read_otlp.cpp)."""
    head = data[:16].lstrip(b"\xef\xbb\xbf \t\r\n")
    return head.startswith(b"{")
