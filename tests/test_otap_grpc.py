"""OTAP/Arrow bidirectional streaming over gRPC (the reference's
otap_serve: stream BatchArrowRecords -> stream BatchStatus,
serve.md:319, src/otlp_server_grpc.cpp:95-133), with per-stream Arrow
IPC dictionary/schema reuse: the reference's *-reuse.bar fixtures are
schema-less continuations that are UNDECODABLE standalone and must
decode against the stream state left by the initial message.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from duckdb_otlp_spark.sources.otap import (
    OtapDecodeError,
    OtapStreamDecoder,
    bar_to_envelope,
)
from duckdb_otlp_spark.sources.otlp_proto import _fields

BAR_DIR = Path("/root/reference/test/data/otap")
pytestmark = pytest.mark.skipif(not BAR_DIR.exists(),
                                reason="reference OTAP fixtures not present")

TOKEN = "test-token-0123456789abcdef"
LOGS_PATH = ("/opentelemetry.proto.experimental.arrow.v1."
             "ArrowLogsService/ArrowLogs")
TRACES_PATH = ("/opentelemetry.proto.experimental.arrow.v1."
               "ArrowTracesService/ArrowTraces")


def _batch_status(msg: bytes) -> dict:
    out = {"batch_id": 0, "status_code": 0, "status_message": ""}
    for f, _, v in _fields(msg):
        if f == 1:
            out["batch_id"] = v
        elif f == 2:
            out["status_code"] = v
        elif f == 3:
            out["status_message"] = v.decode()
    return out


def test_stream_decoder_reuse_messages():
    dec = OtapStreamDecoder("logs")
    _, env1 = dec.decode((BAR_DIR / "logs-initial.bar").read_bytes())
    bid2, env2 = dec.decode((BAR_DIR / "logs-reuse.bar").read_bytes())
    assert bid2 == 1

    def n_records(env):
        return sum(len(sl["logRecords"]) for rl in env["resourceLogs"]
                   for sl in rl["scopeLogs"])

    assert n_records(env1) == 3
    assert n_records(env2) == 3          # only the NEW rows of the message
    # the initial message alone matches the standalone decoder exactly
    assert env1 == bar_to_envelope((BAR_DIR / "logs-initial.bar").read_bytes(),
                                   "logs")
    # reuse rows decoded real attribute values through the replayed
    # dictionary state
    attrs = [r for rl in env2["resourceLogs"]
             for sl in rl["scopeLogs"] for r in sl["logRecords"]
             if r.get("attributes")]
    assert attrs, "no reuse record decoded attributes"
    bodies = [r.get("body") for rl in env2["resourceLogs"]
              for sl in rl["scopeLogs"] for r in sl["logRecords"]]
    assert any(b and "kvlistValue" in b for b in bodies)


def test_reuse_first_poisons_stream():
    dec = OtapStreamDecoder("logs")
    with pytest.raises(OtapDecodeError, match="OTAP decode error"):
        dec.decode((BAR_DIR / "logs-reuse.bar").read_bytes())


def test_otap_grpc_end_to_end(spark, tmp_path):
    from duckdb_otlp_spark.sources.otap import OTAP_READERS
    from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
    from duckdb_otlp_spark.streaming.h2c import GrpcClient
    from duckdb_otlp_spark.streaming.server import _get

    info = otlp_serve(spark, "otap://127.0.0.1:0", work_dir=str(tmp_path / "w"),
                      auth_token=TOKEN, seal_max_age_ms=500,
                      transport="grpc", warm_start=False).collect()[0]
    assert info["transport"] == "otap/grpc"
    srv = _get(info["uri"])
    try:
        client = GrpcClient("127.0.0.1", srv.receiver.port)
        headers, msgs = client.call(
            LOGS_PATH,
            [(BAR_DIR / "logs-initial.bar").read_bytes(),
             (BAR_DIR / "logs-reuse.bar").read_bytes()],
            [("authorization", f"Bearer {TOKEN}")])
        client.close()
        assert headers["grpc-status"] == "0", headers
        acks = [_batch_status(m) for m in msgs]
        assert [a["status_code"] for a in acks] == [0, 0]
        assert [a["batch_id"] for a in acks] == [0, 1]

        srv.flush()
        logs = spark.read.parquet(str(srv.export_root / "otlp_logs"))
        assert logs.count() == 6        # 3 initial + 3 reuse rows
        # the initial rows hold the OTAP<->OTLP differential parity
        ref = OTAP_READERS["logs"](spark, str(BAR_DIR / "logs-initial.bar"))
        sealed = logs.drop("year", "month", "day")
        assert ref.exceptAll(sealed).count() == 0
    finally:
        otlp_stop(spark, info["uri"], drain=False)


def test_otap_grpc_wrong_signal_poisons_stream(spark, tmp_path):
    from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
    from duckdb_otlp_spark.streaming.h2c import GrpcClient
    from duckdb_otlp_spark.streaming.server import _get

    info = otlp_serve(spark, "otap://127.0.0.1:0", work_dir=str(tmp_path / "w"),
                      disable_auth=True, seal_max_age_ms=60_000,
                      transport="grpc", warm_start=False).collect()[0]
    srv = _get(info["uri"])
    try:
        client = GrpcClient("127.0.0.1", srv.receiver.port)
        headers, _ = client.call(
            TRACES_PATH, [(BAR_DIR / "logs-initial.bar").read_bytes()])
        client.close()
        assert headers["grpc-status"] == "3"
        assert "OTAP decode error" in headers.get("grpc-message", "")

        # auth rejection on a fresh stream
        client = GrpcClient("127.0.0.1", srv.receiver.port)
        srv.receiver.disable_auth  # (listener built with disable_auth=True)
    finally:
        otlp_stop(spark, info["uri"], drain=False)


def test_otap_grpc_auth(tmp_path):
    from duckdb_otlp_spark.streaming.h2c import GrpcClient
    from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           auth_token=TOKEN, formats="otap",
                           transport="grpc", accept_workers=1)
    rcv.start()
    try:
        client = GrpcClient("127.0.0.1", rcv.port)
        headers, _ = client.call(
            LOGS_PATH, [(BAR_DIR / "logs-initial.bar").read_bytes()])
        client.close()
        assert headers["grpc-status"] == "16"
        assert rcv.stats.rejected_auth == 1
    finally:
        rcv.stop()
