"""Protobuf fast path: decode + flatten executor-side, emit FLAT rows.

The generic pb route emits one deeply nested Arrow envelope struct per
row and leaves the flatten to the JVM: three explodes, an interpreted
``transform`` validation pass, and the attrs-JSON renderers (array_sort
+ HOF transforms, all CodegenFallback) run per record. Measured on the
1M-record/32-file pb bench corpus at local[32] (r14): the envelope rows
themselves cost 1.3 s (scan + wire decode + Arrow build + transfer),
but the JVM flatten lifts the full 18-column read to 5.0–5.6 s and even
the 2-column aggregate shape to 3.1 s. Flattening in Python right after
the wire decode (this module) and handing Spark the FINAL flat columns
runs the same reads in 1.5–1.75 s — the per-record work drops from
~50–130 JVM-µs to ~10 Python-µs because the flatten is plain dict walks
and string joins instead of interpreted Catalyst HOFs over nested
UnsafeRows (guide §4.2: hand whole batches to native/vectorizable code;
the flat string/int columns also convert Arrow->JVM for free, no nested
copy).

Semantics: every coercion below is an exact twin of the JVM flatten
(otlp_json.flatten_logs / flatten_traces) over the WIRE DECODER's value
domain — severity/flags int32 windows (try_cast long -> try_cast int ->
default), ns->µs floor division with the same int64-overflow error text,
lowercase hex ids with ''->NULL, canonical sorted-key attrs JSON with
Jackson-twin string escaping, Java-twin double rendering, the AnyValue
depth-3 cutoff, and the stringValue-first body CASE order. Byte parity
with the JVM flatten is pinned by tests/test_flat_decode.py over the
reader-gate fixtures AND an adversarial corpus (control characters,
int32/int64 overflows, deep nesting, duplicate keys, non-integral
doubles).

Documented divergence (out of the proven-exact zone): non-"N.0" doubles
— |x| >= 9e15 rendered via Double.toString, and subnormals — may differ
from JDK 17's FloatingDecimal in the LAST DIGITS of the rendered JSON
number for ~0.5% of such values (this module emits the shortest
round-trip digits in Java's format; pre-Ryū FloatingDecimal sometimes
emits extra digits). Both forms parse back to the identical double.
Telemetry fixtures and the driver's certified rows contain no such
values (the parity suite proves the covered zone byte-exact), and the
generic envelope path is unchanged for callers that need it
(mode="json"/"lines", mixed-format globs).
"""

from __future__ import annotations

import math
import re
from typing import Any

_I64_MAX = 9223372036854775807
_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1
_I64_MIN = -(1 << 63)

# same class as otlp_json._json_quote's fast-path rlike
_NEEDS_ESCAPE = re.compile(r'["\\\x00-\x1f]')

# otlp_json._ANY_VALUE_DEPTH twin
_DEPTH = 3


# ---------------------------------------------------------------------------
# JVM-exact leaf renderers
# ---------------------------------------------------------------------------

# Jackson's default escaping: the short escapes plus \u00XX with
# UPPERCASE hex for remaining control characters; non-ASCII kept raw.
_ESCAPE_TABLE = {
    ord('"'): '\\"', ord("\\"): "\\\\", 0x08: "\\b", 0x09: "\\t",
    0x0A: "\\n", 0x0C: "\\f", 0x0D: "\\r",
    **{c: "\\u%04X" % c for c in range(0x20)
       if c not in (0x08, 0x09, 0x0A, 0x0C, 0x0D)},
}


def _jstr(s) -> str:
    """_json_quote twin: NULL -> 'null'; plain strings concat-quoted;
    strings needing escapes take the Jackson-twin table (pinned against
    to_json by the parity suite)."""
    if s is None:
        return "null"
    if _NEEDS_ESCAPE.search(s):
        return '"' + s.translate(_ESCAPE_TABLE) + '"'
    return '"' + s + '"'


def _jdouble(x) -> str:
    """_json_double twin: null/NaN -> 'null'; integral |x| < 9e15 ->
    'N.0'; else Double.toString (Java formatting over the shortest
    round-trip digits — see the module docstring for the digit-tail
    caveat outside the proven zone)."""
    if x is None or x != x:
        return "null"
    if abs(x) < 9.0e15 and x == int(x):
        return str(int(x)) + ".0"
    return _java_double_str(x)


def _java_double_str(x: float) -> str:
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    r = repr(abs(x))
    if "e" in r:
        m, _, e = r.partition("e")
        e10 = int(e)
    else:
        m, e10 = r, 0
    ip, _, fp = m.partition(".")
    if ip != "0":
        exp10 = len(ip) - 1 + e10
    else:
        lead = len(fp) - len(fp.lstrip("0"))
        exp10 = -lead - 1 + e10
    digits = (ip + fp).lstrip("0").rstrip("0") or "0"
    if digits == "0":
        exp10 = 0
    sign = "-" if (x < 0 or (x == 0 and math.copysign(1, x) < 0)) else ""
    if -3 <= exp10 < 7:
        if exp10 >= 0:
            ipart = digits[: exp10 + 1].ljust(exp10 + 1, "0")
            fpart = digits[exp10 + 1:] or "0"
            return f"{sign}{ipart}.{fpart}"
        return f"{sign}0.{'0' * (-exp10 - 1)}{digits}"
    return f"{sign}{digits[0]}.{digits[1:] or '0'}E{exp10}"


def _jint_text(s) -> str:
    """intValue render twin: coalesce(try_cast(long) as string, quoted).
    Canonical decoder strings are bare int64 text; anything else (or
    out-of-long range) renders quoted like the JVM's fallback."""
    try:
        v = int(s)
        if _I64_MIN <= v <= _I64_MAX:
            return str(v)
    except (TypeError, ValueError):
        pass
    return _jstr(s)


def _jany(v, depth: int = _DEPTH) -> str:
    """_any_value_json twin — same CASE order, same depth cutoff."""
    if v is None:
        return "null"
    s = v.get("stringValue")
    if s is not None:
        return _jstr(s)
    b = v.get("boolValue")
    if b is not None:
        return "true" if b else "false"
    i = v.get("intValue")
    if i is not None:
        return _jint_text(i)
    d = v.get("doubleValue")
    if d is not None:
        return _jdouble(d)
    by = v.get("bytesValue")
    if by is not None:
        return _jstr(by)
    if depth > 0:
        av = v.get("arrayValue")
        if av is not None:
            vals = av.get("values") or []
            return "[" + ",".join(_jany(x, depth - 1) for x in vals) + "]"
        kv = v.get("kvlistValue")
        if kv is not None:
            vals = kv.get("values") or []
            return "{" + ",".join(
                _jstr(e.get("key")) + ":" + _jany(e.get("value"), depth - 1)
                for e in vals) + "}"
    return "null"


def _attrs_json(attrs) -> str:
    """attrs_to_json twin: canonical sorted-key JSON object; NULL list
    -> '{}'. Key sort matches the JVM comparator (code-point order ==
    UTF8 byte order); missing keys sort first and render 'null' (the
    degenerate-wire shape, see module docstring)."""
    if attrs is None:
        return "{}"
    ordered = sorted(attrs, key=lambda a: a.get("key") or "")
    return "{" + ",".join(
        _jstr(a.get("key")) + ":" + _jany(a.get("value")) for a in ordered
    ) + "}"


def _body_text(v):
    """_body_text twin: strings pass through, other AnyValue kinds
    render as JSON, all-null renders to SQL NULL."""
    if v is None:
        return None
    s = v.get("stringValue")
    if s is not None:
        return s
    r = _jany(v)
    return None if r == "null" else r


# ---------------------------------------------------------------------------
# JVM-exact scalar coercions
# ---------------------------------------------------------------------------

def _ns_us(s, what: str):
    """_ns_ts twin over the decoder domain (canonical u64 decimal
    strings): ns -> µs floor; > i64::MAX raises the _validated error
    text the JVM flatten raises for the same file."""
    if s is None:
        return None
    v = int(s)
    if v > _I64_MAX:
        raise ValueError(
            "OTLP parse error: timestamp overflows int64 range: " + s)
    return v // 1000


def _ns_long_checked(s, what: str):
    """_ns_long twin (traces duration): raises the same overflow text."""
    if s is None:
        return None
    v = int(s)
    if v > _I64_MAX:
        raise ValueError(
            "OTLP parse error: timestamp overflows int64 range: " + s)
    return v


def _i32(s, default):
    """_uint32/_enum_int numeric twin: try_cast(long) -> try_cast(int)
    -> default on either overflow or a non-numeric string."""
    if s is None:
        return default
    try:
        v = int(s)
    except (TypeError, ValueError):
        return default
    if not (_I64_MIN <= v <= _I64_MAX):
        return default
    if not (_I32_MIN <= v <= _I32_MAX):
        return default
    return v


def _severity(s):
    """_severity_number twin: numeric -> int32 window, 0 -> NULL;
    decoder output is always numeric text, so the enum-name branch
    reduces to NULL for non-numeric strings."""
    v = _i32(s, None)
    return None if v == 0 else v


def _hex_id(s):
    if not s:
        return None
    return s.lower()


def _long_text_or(s, default: str) -> str:
    """events/links JSON: coalesce(try_cast(long) as string, default)."""
    try:
        v = int(s)
        if _I64_MIN <= v <= _I64_MAX:
            return str(v)
    except (TypeError, ValueError):
        pass
    return default


def _attr(resource, key):
    for a in (resource or {}).get("attributes") or []:
        if a.get("key") == key:
            return (a.get("value") or {}).get("stringValue")
    return None


# ---------------------------------------------------------------------------
# Flatten twins (walk order == JVM explode order; NO sorting)
# ---------------------------------------------------------------------------

def flatten_logs_columns(env: dict) -> list[tuple]:
    """One tuple per log record, 18 fields in LOGS_SCHEMA order."""
    out = []
    ap = out.append
    for rl in env.get("resourceLogs") or []:
        resource = rl.get("resource")
        svc = _attr(resource, "service.name")
        svc_ns = _attr(resource, "service.namespace")
        svc_id = _attr(resource, "service.instance.id")
        res_attrs = _attrs_json((resource or {}).get("attributes"))
        for sl in rl.get("scopeLogs") or []:
            scope = sl.get("scope") or {}
            scope_name = scope.get("name")
            scope_version = scope.get("version")
            scope_attrs = _attrs_json(scope.get("attributes"))
            for r in sl.get("logRecords") or []:
                get = r.get
                ap((
                    _ns_us(get("timeUnixNano"), "timeUnixNano"),
                    _ns_us(get("observedTimeUnixNano"),
                           "observedTimeUnixNano"),
                    _hex_id(get("traceId")),
                    _hex_id(get("spanId")),
                    svc, svc_ns, svc_id,
                    _severity(get("severityNumber")),
                    get("severityText"),
                    get("eventName"),
                    _body_text(get("body")),
                    res_attrs, scope_name, scope_version, scope_attrs,
                    _attrs_json(get("attributes")),
                    _i32(get("droppedAttributesCount"), 0),
                    _i32(get("flags"), 0),
                ))
    return out


def _events_json(events) -> str:
    if events is None:
        return "[]"
    return "[" + ",".join(
        '{"time_unix_nano":%s,"name":%s,"attributes":%s,'
        '"dropped_attributes_count":%s}'
        % (_long_text_or(e.get("timeUnixNano"), "null"),
           _jstr(e.get("name")),
           _attrs_json(e.get("attributes")),
           _long_text_or(e.get("droppedAttributesCount"), "0"))
        for e in events) + "]"


def _links_json(links) -> str:
    if links is None:
        return "[]"
    return "[" + ",".join(
        '{"trace_id":%s,"span_id":%s,"trace_state":%s,"attributes":%s,'
        '"dropped_attributes_count":%s}'
        % (_jstr(_hex_id(li.get("traceId"))),
           _jstr(_hex_id(li.get("spanId"))),
           _jstr(li.get("traceState")),
           _attrs_json(li.get("attributes")),
           _long_text_or(li.get("droppedAttributesCount"), "0"))
        for li in links) + "]"


def flatten_traces_columns(env: dict) -> list[tuple]:
    """One tuple per span, 24 fields in TRACES_SCHEMA order."""
    out = []
    ap = out.append
    for rs in env.get("resourceSpans") or []:
        resource = rs.get("resource")
        svc = _attr(resource, "service.name")
        svc_ns = _attr(resource, "service.namespace")
        svc_id = _attr(resource, "service.instance.id")
        res_attrs = _attrs_json((resource or {}).get("attributes"))
        for ss in rs.get("scopeSpans") or []:
            scope = ss.get("scope") or {}
            scope_name = scope.get("name")
            scope_version = scope.get("version")
            scope_attrs = _attrs_json(scope.get("attributes"))
            for s in ss.get("spans") or []:
                get = s.get
                start = _ns_long_checked(get("startTimeUnixNano"),
                                         "startTimeUnixNano")
                end = _ns_long_checked(get("endTimeUnixNano"),
                                       "endTimeUnixNano")
                status = get("status") or {}
                ap((
                    None if start is None else start // 1000,
                    (end or 0) - (start or 0),
                    _hex_id(get("traceId")),
                    _hex_id(get("spanId")),
                    _hex_id(get("parentSpanId")),
                    get("traceState"),
                    svc, svc_ns, svc_id,
                    get("name"),
                    _i32(get("kind"), 0),
                    _i32(status.get("code"), 0),
                    status.get("message"),
                    res_attrs, scope_name, scope_version, scope_attrs,
                    _attrs_json(get("attributes")),
                    _events_json(get("events")),
                    _links_json(get("links")),
                    _i32(get("droppedAttributesCount"), 0),
                    _i32(get("droppedEventsCount"), 0),
                    _i32(get("droppedLinksCount"), 0),
                    _i32(get("flags"), 0),
                ))
    return out


_FLATTENERS = {
    "logs": flatten_logs_columns,
    "traces": flatten_traces_columns,
}

# Fields the flatten NEVER leaves null (rendered JSON always a string,
# counts always defaulted, duration always computed) — matching the JVM
# flatten's output nullability exactly, which the schema gate compares.
_NON_NULLABLE = {
    "logs": {"resource_attributes", "scope_attributes", "log_attributes",
             "dropped_attributes_count", "flags"},
    "traces": {"duration_time_unix_nano", "kind", "status_code",
               "resource_attributes", "scope_attributes", "span_attributes",
               "events_json", "links_json", "dropped_attributes_count",
               "dropped_events_count", "dropped_links_count", "flags"},
}


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

# driver-side format sniff budget for mode="auto": above this many
# files the generic envelope plan is used (the sniff is one 16-byte
# read per file — O(files) driver I/O stays bounded; pass
# mode="protobuf" to force the fast path on huge pb corpora)
SNIFF_MAX_FILES = 1024


def all_protobuf(spark, path) -> bool:
    """Driver-side FORMAT AUTO pre-check: True iff the input resolves
    to a bounded set of regular files whose heads all say protobuf
    (the same looks_like_json test the executor decode applies per
    file). Any JSON head, directory, empty listing, oversized listing,
    or I/O trouble answers False — the generic plan stays correct for
    every one of those."""
    from duckdb_otlp_spark.sources import otlp_proto

    paths = path if isinstance(path, list) else [path]
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        files = []
        for p in paths:
            hp = jvm.org.apache.hadoop.fs.Path(p)
            fs = hp.getFileSystem(conf)
            statuses = fs.globStatus(hp)
            if statuses is None:
                return False
            for st in statuses:
                if st.isDirectory():
                    for sub in fs.listStatus(st.getPath()):
                        if sub.isFile():
                            files.append((fs, sub.getPath()))
                        else:
                            return False
                        if len(files) > SNIFF_MAX_FILES:
                            return False
                else:
                    files.append((fs, st.getPath()))
                if len(files) > SNIFF_MAX_FILES:
                    return False
        if not files:
            return False
        for fs, fp in files:
            stream = fs.open(fp)
            try:
                head = bytes(stream.readNBytes(16))
            finally:
                stream.close()
            if head and otlp_proto.looks_like_json(head):
                return False
        return True
    except Exception:
        return False


def read_pb_flat(spark, path, signal: str):
    """Protobuf file(s) -> FINAL flat signal table, decoded and
    flattened executor-side (one file per task, the generic path's
    parallelism unit). Raises the same error contracts as the envelope
    route: per-file 100 MB cap, whitespace-only files, invalid
    protobuf payloads, int64 timestamp overflow."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from duckdb_otlp_spark import schemas as _schemas
    from duckdb_otlp_spark.session import ensure_package_on_workers
    from duckdb_otlp_spark.sources.otlp_json import (
        MAX_ENVELOPE_SLICE_RECORDS, MAX_READ_FILE_BYTES, slice_envelope)

    from pyspark.sql import types as T
    nn = _NON_NULLABLE[signal]
    out_schema = T.StructType([
        T.StructField(f.name, f.dataType, nullable=f.name not in nn)
        for f in _schemas.SIGNAL_SCHEMAS[signal].fields])
    arrow_fields = [to_arrow_type(f.dataType) for f in out_schema.fields]
    names = [f.name for f in out_schema.fields]
    paths = path if isinstance(path, list) else [path]
    max_slice = MAX_ENVELOPE_SLICE_RECORDS

    def decode(batches):
        from duckdb_otlp_spark.sources import otlp_proto

        flatten = _FLATTENERS[signal]
        for batch in batches:
            for fpath, length, content in zip(batch.column(0).to_pylist(),
                                              batch.column(1).to_pylist(),
                                              batch.column(2).to_pylist()):
                if length > MAX_READ_FILE_BYTES:
                    raise ValueError(
                        f"OTLP read error: file exceeds {MAX_READ_FILE_BYTES} "
                        f"byte limit: {fpath}")
                b = bytes(content)
                if not b:
                    continue  # empty file -> 0 rows (reference parity)
                if not b.lstrip(b"\xef\xbb\xbf").strip():
                    raise ValueError(
                        f"OTLP parse error: whitespace-only file: {fpath}")
                try:
                    decoded = otlp_proto.DECODERS[signal](b)
                except ValueError as e:
                    raise ValueError(
                        f"OTLP parse error: invalid protobuf payload "
                        f"({e}): {fpath}") from e
                # slice: bounds each emitted Arrow batch the same way
                # the envelope route bounds its struct rows
                for part in slice_envelope(decoded, signal,
                                           max_records=max_slice):
                    tuples = flatten(part)
                    if not tuples:
                        continue
                    cols = list(zip(*tuples))
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(c, type=t)
                         for c, t in zip(cols, arrow_fields)], names)

    files = (spark.read.format("binaryFile").load(paths)
             .select("path", "length", "content"))
    ensure_package_on_workers(files.sparkSession)
    return files.mapInArrow(decode, out_schema)
