"""OTAP reader tests against the reference's own fixture pairs
(read-only at /root/reference/test/data/otap/): each .bar file has a
semantically-equivalent .otlp protobuf twin, and the oracle is the
reference's own bidirectional EXCEPT pattern — read_otap_* and
read_otlp_* must produce identical row sets
(reference: test/sql/read_otap.test:44-103).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from duckdb_otlp_spark.sources.otap import OTAP_READERS, bar_to_envelope
from duckdb_otlp_spark.sources.otlp_json import READERS

OTAP_DIR = Path("/root/reference/test/data/otap")

pytestmark = pytest.mark.skipif(not OTAP_DIR.exists(),
                                reason="reference OTAP fixtures not present")


def _parity(spark, signal_reader: str, bar: str, otlp: str):
    otap_df = OTAP_READERS[signal_reader](spark, str(OTAP_DIR / bar))
    otlp_df = READERS[signal_reader](spark, str(OTAP_DIR / otlp))
    assert otap_df.schema == otlp_df.schema
    assert otap_df.count() == otlp_df.count()
    assert otap_df.exceptAll(otlp_df).count() == 0
    assert otlp_df.exceptAll(otap_df).count() == 0


@pytest.mark.parametrize("reader,bar,otlp", [
    ("logs", "logs-initial.bar", "logs-initial.otlp"),
    ("traces", "traces-initial.bar", "traces-initial.otlp"),
    ("metrics_gauge", "metrics-initial.bar", "metrics-initial.otlp"),
    ("metrics_sum", "metrics-initial.bar", "metrics-initial.otlp"),
    ("metrics_histogram", "metrics-initial.bar", "metrics-initial.otlp"),
    ("metrics_exp_histogram", "metrics-initial.bar", "metrics-initial.otlp"),
])
def test_otap_otlp_parity(spark, reader, bar, otlp):
    _parity(spark, reader, bar, otlp)


@pytest.mark.parametrize("reader,bar,signal", [
    ("logs", "logs-initial.bar", "logs"),
    ("traces", "traces-initial.bar", "traces"),
    ("metrics_gauge", "metrics-initial.bar", "metrics"),
    ("metrics_sum", "metrics-initial.bar", "metrics"),
    ("metrics_histogram", "metrics-initial.bar", "metrics"),
    ("metrics_exp_histogram", "metrics-initial.bar", "metrics"),
])
def test_typed_path_matches_json_twin(spark, reader, bar, signal):
    """r11: the default read path emits typed Arrow structs straight
    from the decoder (mapInArrow, single parse). The retired JSON-text
    render + from_json variant survives as the differential twin —
    identical rows through an independent serialization — and the typed
    plan must carry NO JsonToStructs (that's the whole point)."""
    from duckdb_otlp_spark.sources.otap import _otap_envelopes_json
    from duckdb_otlp_spark.sources import otlp_json as oj
    flatten = {"logs": oj.flatten_logs, "traces": oj.flatten_traces,
               "metrics_gauge": oj.flatten_metrics_gauge,
               "metrics_sum": oj.flatten_metrics_sum,
               "metrics_histogram": oj.flatten_metrics_histogram,
               "metrics_exp_histogram": oj.flatten_metrics_exp_histogram,
               }[reader]
    typed = OTAP_READERS[reader](spark, str(OTAP_DIR / bar))
    js = flatten(_otap_envelopes_json(spark, str(OTAP_DIR / bar), signal))
    assert typed.schema == js.schema
    assert typed.count() == js.count()
    assert typed.exceptAll(js).count() == 0
    assert js.exceptAll(typed).count() == 0
    from duckdb_otlp_spark.plans import audit
    assert "from_json" not in audit(typed).text
    assert "from_json" in audit(js).text


def test_otap_zstd(spark):
    """Arrow-IPC zstd compression decodes transparently and matches the
    uncompressed twin (reference: api.md compression contract)."""
    a = OTAP_READERS["logs"](spark, str(OTAP_DIR / "logs-zstd.bar"))
    b = OTAP_READERS["logs"](spark, str(OTAP_DIR / "logs-initial.bar"))
    assert a.count() == 3
    assert a.exceptAll(b).count() == 0


def test_otap_row_counts(spark):
    assert OTAP_READERS["logs"](spark, str(OTAP_DIR / "logs-initial.bar")).count() == 3
    assert OTAP_READERS["traces"](spark, str(OTAP_DIR / "traces-initial.bar")).count() == 1
    for shape in ("metrics_gauge", "metrics_sum", "metrics_histogram",
                  "metrics_exp_histogram"):
        n = 2 if shape == "metrics_gauge" else 1
        df = OTAP_READERS[shape](spark, str(OTAP_DIR / "metrics-initial.bar"))
        # gauge table holds the gauge metric's points; fixture has 1 gauge
        # dp + 1 sum dp in the number-dp table split by metric type
        assert df.count() == 1, shape


def test_reuse_message_is_hard_error(spark):
    """A schema-less continuation ("reuse") message cannot be decoded by
    a fresh per-file decoder (reference: read_otap.test:135-141)."""
    with pytest.raises(Exception, match="OTAP decode error"):
        OTAP_READERS["logs"](spark, str(OTAP_DIR / "logs-reuse.bar")).collect()


def test_otlp_payload_is_hard_error(spark):
    with pytest.raises(Exception, match="OTAP decode error"):
        OTAP_READERS["logs"](spark, str(OTAP_DIR / "logs-initial.otlp")).collect()


def test_wrong_signal_is_hard_error(spark):
    with pytest.raises(Exception, match="OTAP decode error"):
        OTAP_READERS["logs"](spark, str(OTAP_DIR / "metrics-initial.bar")).collect()
    with pytest.raises(Exception, match="OTAP decode error"):
        OTAP_READERS["metrics_gauge"](spark, str(OTAP_DIR / "logs-initial.bar")).collect()


def test_envelope_reconstruction_driverside():
    """Pure-python check: .bar -> envelope equals the pb decode of the
    .otlp twin under canonical attribute order (summary dp content is
    excluded — every reader skips summary points)."""
    import json

    from duckdb_otlp_spark.sources.otlp_proto import DECODERS

    def canon(env):
        def walk(o):
            if isinstance(o, dict):
                out = {}
                for k, v in o.items():
                    if k == "summary":
                        v = {"dataPoints": [{} for _ in v.get("dataPoints", [])]}
                    if k in ("attributes", "filteredAttributes") and isinstance(v, list):
                        v = sorted(v, key=lambda kv: kv.get("key", ""))
                    out[k] = walk(v)
                return out
            if isinstance(o, list):
                return [walk(x) for x in o]
            return o
        return json.dumps(walk(env), sort_keys=True)

    for sig, name in (("logs", "logs-initial"), ("traces", "traces-initial"),
                      ("metrics", "metrics-initial")):
        bar = (OTAP_DIR / f"{name}.bar").read_bytes()
        otlp = (OTAP_DIR / f"{name}.otlp").read_bytes()
        assert canon(bar_to_envelope(bar, sig)) == canon(DECODERS[sig](otlp)), sig


# --- r13: oversized-envelope slicing on the typed OTAP path (one
#     self-contained message per file is the reference contract,
#     test/sql/read_otap.test — a near-cap message used to become ONE
#     JVM struct row, the heap-cliff shape fixed for pb in r12) ---

def _encode_bar_logs(n_records: int) -> bytes:
    """Independent test-side OTAP encoder: a minimal canonical
    BatchArrowRecords file whose LOGS payload (type 30) carries
    ``n_records`` rows in one (resource, scope) group. Built from the
    protobuf wire format + Arrow IPC directly — shares no code with
    the production decoder."""
    import io

    import pyarrow as pa
    import pyarrow.ipc as ipc

    def varint(n: int) -> bytes:
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def ld(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def vi(field: int, val: int) -> bytes:
        return varint((field << 3) | 0) + varint(val)

    n = n_records
    tbl = pa.table({
        "id": pa.array([None] * n, pa.uint16()),
        "resource": pa.array([{"id": 0}] * n,
                             pa.struct([("id", pa.uint16())])),
        "scope": pa.array([{"id": 0}] * n,
                          pa.struct([("id", pa.uint16())])),
        "schema_url": pa.array([None] * n, pa.string()),
        "time_unix_nano": pa.array(
            [1700000000000000000 + i for i in range(n)], pa.timestamp("ns")),
        "observed_time_unix_nano": pa.array([0] * n, pa.timestamp("ns")),
        "trace_id": pa.array([None] * n, pa.binary(16)),
        "span_id": pa.array([None] * n, pa.binary(8)),
        "severity_number": pa.array([9 + (i % 3) for i in range(n)],
                                    pa.int32()),
        "severity_text": pa.array([None] * n, pa.string()),
        "body": pa.array([{"type": 1, "str": f"rec-{i}"} for i in range(n)],
                         pa.struct([("type", pa.uint8()),
                                    ("str", pa.string())])),
        "dropped_attributes_count": pa.array([0] * n, pa.uint32()),
        "flags": pa.array([None] * n, pa.uint32()),
        "event_name": pa.array([None] * n, pa.string()),
    })
    sink = io.BytesIO()
    with ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return ld(2, vi(2, 30) + ld(3, sink.getvalue()))


def test_oversized_otap_envelope_reads_sliced_and_identical(spark, tmp_path):
    """A .bar file over MAX_ENVELOPE_SLICE_RECORDS records reads through
    the sliced typed path with output identical to the JSON-text twin
    (which renders the whole envelope as one document and never
    slices) — and the typed path demonstrably emits >1 bounded
    envelope row where the twin emits one."""
    from duckdb_otlp_spark.sources import otlp_json as oj
    from duckdb_otlp_spark.sources.otap import (
        _otap_envelopes,
        _otap_envelopes_json,
        read_otap_logs,
    )
    from duckdb_otlp_spark.sources.otlp_json import MAX_ENVELOPE_SLICE_RECORDS

    n = MAX_ENVELOPE_SLICE_RECORDS + 100
    p = tmp_path / "big.bar"
    p.write_bytes(_encode_bar_logs(n))

    typed = read_otap_logs(spark, str(p))
    js = oj.flatten_logs(_otap_envelopes_json(spark, str(p), "logs"))
    assert typed.count() == js.count() == n
    assert typed.exceptAll(js).count() == 0
    assert js.exceptAll(typed).count() == 0
    # slicing engaged: 2 bounded envelope rows vs the twin's single row
    assert _otap_envelopes(spark, str(p), "logs").count() == 2
    assert _otap_envelopes_json(spark, str(p), "logs").count() == 1


def test_undersized_otap_envelope_not_sliced(spark, tmp_path):
    """Under the cap the envelope passes through untouched — one typed
    row per file, rows identical to the JSON twin."""
    from duckdb_otlp_spark.sources import otlp_json as oj
    from duckdb_otlp_spark.sources.otap import (
        _otap_envelopes,
        _otap_envelopes_json,
        read_otap_logs,
    )

    p = tmp_path / "small.bar"
    p.write_bytes(_encode_bar_logs(37))
    typed = read_otap_logs(spark, str(p))
    js = oj.flatten_logs(_otap_envelopes_json(spark, str(p), "logs"))
    assert typed.count() == js.count() == 37
    assert typed.exceptAll(js).count() == 0
    assert _otap_envelopes(spark, str(p), "logs").count() == 1
