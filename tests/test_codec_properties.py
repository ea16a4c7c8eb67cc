"""Property-based codec tests (hypothesis): the proto3 wire codec and
the CBOR decoder hold up under generated inputs, not just fixtures.

Envelopes are generated in *normalized* form (lowercase hex ids,
non-empty attribute lists, enums/counts in the decoder's schema-exact
decimal-STRING form — r11) so encode->decode is exact — the known
lossy normalizations (hex case, empty lists, enum names) are covered
by the fixture-based tests instead.
"""

from __future__ import annotations

import json
import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_otlp_spark.sources.otap import _cbor_decode
from duckdb_otlp_spark.sources.otlp_proto import DECODERS, _read_varint
from tests.fixtures import _enc_varint, encode_envelope_pb

# ---------------------------------------------------------------------------
# varint
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_varint_roundtrip(n):
    buf = _enc_varint(n)
    out, pos = _read_varint(buf, 0)
    assert out == n and pos == len(buf)


# ---------------------------------------------------------------------------
# OTLP envelope round-trip
# ---------------------------------------------------------------------------

_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=40)
_hex16 = st.text(alphabet="0123456789abcdef", min_size=16, max_size=16)
_hex32 = st.text(alphabet="0123456789abcdef", min_size=32, max_size=32)
_u63 = st.integers(min_value=0, max_value=(1 << 63) - 1)
_finite_double = st.floats(allow_nan=False, allow_infinity=False, width=64)


def _any_value():
    base = st.one_of(
        st.builds(lambda s: {"stringValue": s}, _text),
        st.builds(lambda b: {"boolValue": b}, st.booleans()),
        st.builds(lambda i: {"intValue": str(i)},
                  st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)),
        st.builds(lambda d: {"doubleValue": d}, _finite_double),
    )
    return st.recursive(
        base,
        lambda inner: st.one_of(
            st.builds(lambda vs: {"arrayValue": {"values": vs}},
                      st.lists(inner, min_size=1, max_size=3)),
            st.builds(
                lambda kvs: {"kvlistValue": {"values": kvs}},
                st.lists(st.builds(lambda k, v: {"key": k, "value": v}, _text, inner),
                         min_size=1, max_size=3)),
        ),
        max_leaves=6)


_attrs = st.lists(
    st.builds(lambda k, v: {"key": k, "value": v}, _text, _any_value()),
    min_size=1, max_size=4)


_log_record = st.builds(
    lambda t, sev, sevt, body, attrs, tid, sid: {
        "timeUnixNano": str(t), "severityNumber": str(sev),
        "severityText": sevt,
        "body": body, "attributes": attrs, "traceId": tid, "spanId": sid},
    _u63, st.integers(min_value=0, max_value=24), _text, _any_value(),
    _attrs, _hex32, _hex16)


_envelope = st.builds(
    lambda rattrs, recs: {"resourceLogs": [{
        "resource": {"attributes": rattrs},
        "scopeLogs": [{"scope": {"name": "prop-scope"}, "logRecords": recs}]}]},
    _attrs, st.lists(_log_record, min_size=1, max_size=3))


@settings(max_examples=60, deadline=None)
@given(_envelope)
def test_logs_envelope_pb_roundtrip(env):
    decoded = DECODERS["logs"](encode_envelope_pb(env))
    assert json.dumps(decoded, sort_keys=True) == json.dumps(env, sort_keys=True)


# ---------------------------------------------------------------------------
# CBOR decode vs a minimal canonical encoder
# ---------------------------------------------------------------------------


def _cbor_encode(v) -> bytes:
    def head(mt, n):
        if n < 24:
            return bytes([(mt << 5) | n])
        for ai, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
            if n < (1 << (8 * size)):
                return bytes([(mt << 5) | ai]) + n.to_bytes(size, "big")
        raise ValueError(n)

    if v is None:
        return b"\xf6"
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if isinstance(v, int):
        return head(0, v) if v >= 0 else head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return head(2, len(v)) + v
    if isinstance(v, str):
        b = v.encode()
        return head(3, len(b)) + b
    if isinstance(v, list):
        return head(4, len(v)) + b"".join(_cbor_encode(x) for x in v)
    if isinstance(v, dict):
        return head(5, len(v)) + b"".join(
            _cbor_encode(k) + _cbor_encode(x) for k, x in v.items())
    raise TypeError(type(v))


_cbor_value = st.recursive(
    st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
        _finite_double, _text, st.binary(max_size=24)),
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_text, inner, max_size=4)),
    max_leaves=8)


@settings(max_examples=120, deadline=None)
@given(_cbor_value)
def test_cbor_roundtrip(v):
    out, pos = _cbor_decode(_cbor_encode(v))
    buf = _cbor_encode(v)
    assert pos == len(buf)
    if isinstance(v, float):
        assert (math.isnan(out) and math.isnan(v)) or out == v
    else:
        assert out == v
