"""Rolling-spool-segment contracts (no Spark needed): visibility only
after rotation, rotation by size and by age, janitor-driven rotation of
idle segments, and final rotation on receiver stop.
"""

from __future__ import annotations

import time

from duckdb_otlp_spark.streaming.receiver import (
    OtlpHttpReceiver,
    _SpoolSegmentWriter,
)


def _visible(d):
    return sorted(p.name for p in d.iterdir() if not p.name.startswith("."))


def _hidden(d):
    return sorted(p.name for p in d.iterdir() if p.name.startswith("."))


def test_open_segment_is_hidden_until_rotated(tmp_path):
    w = _SpoolSegmentWriter(tmp_path, rotate_bytes=1 << 30, rotate_ms=1 << 30)
    w.append(['{"a":1}', '{"b":2}'])
    assert _visible(tmp_path) == []          # Spark sources skip dotfiles
    assert len(_hidden(tmp_path)) == 1
    w.rotate()
    (seg,) = _visible(tmp_path)
    assert seg.startswith("seg_") and seg.endswith(".jsonl")
    assert (tmp_path / seg).read_text() == '{"a":1}\n{"b":2}\n'


def test_size_rotation_and_multiple_segments(tmp_path):
    w = _SpoolSegmentWriter(tmp_path, rotate_bytes=64, rotate_ms=1 << 30)
    line = '{"k":"' + "x" * 80 + '"}'
    for _ in range(3):
        w.append([line])                      # each append crosses 64 bytes
    assert len(_visible(tmp_path)) == 3
    assert _hidden(tmp_path) == []
    # all appended lines land in exactly one visible segment, in order
    text = "".join((tmp_path / s).read_text() for s in _visible(tmp_path))
    assert text.count(line) == 3


def test_age_rotation_on_next_append(tmp_path):
    w = _SpoolSegmentWriter(tmp_path, rotate_bytes=1 << 30, rotate_ms=50)
    w.append(['{"a":1}'])
    time.sleep(0.08)
    w.append(['{"b":2}'])                     # append notices staleness
    assert len(_visible(tmp_path)) == 1


def test_rotate_if_stale_respects_age(tmp_path):
    w = _SpoolSegmentWriter(tmp_path, rotate_bytes=1 << 30, rotate_ms=50)
    w.append(['{"a":1}'])
    w.rotate_if_stale()                       # too fresh: stays open
    assert _visible(tmp_path) == []
    time.sleep(0.08)
    w.rotate_if_stale()
    assert len(_visible(tmp_path)) == 1
    w.rotate()                                # idempotent on closed segment
    assert len(_visible(tmp_path)) == 1


def _post(port, path, body: bytes):
    import json
    import urllib.request
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def test_receiver_janitor_rotates_idle_segment(tmp_path):
    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           disable_auth=True, accept_workers=1)
    rcv.start()
    try:
        code, _ = _post(rcv.port, "/v1/logs", b'{"resourceLogs":[]}')
        assert code == 202
        deadline = time.monotonic() + 5
        logs_dir = tmp_path / "spool" / "logs"
        while time.monotonic() < deadline and not _visible(logs_dir):
            time.sleep(0.02)
        assert len(_visible(logs_dir)) == 1   # janitor rotated without traffic
    finally:
        rcv.stop()


def test_receiver_stop_rotates_partial_segment(tmp_path):
    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           disable_auth=True, accept_workers=2)
    rcv.start()
    code, _ = _post(rcv.port, "/v1/traces", b'{"resourceSpans":[]}')
    assert code == 202
    assert rcv.stats.per_signal_requests["traces"] == 1   # cross-process counters
    rcv.stop()
    traces_dir = tmp_path / "spool" / "traces"
    assert len(_visible(traces_dir)) >= 1
    assert _hidden(traces_dir) == []
