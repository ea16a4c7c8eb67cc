"""Receiver telemetry contracts under the sharded process model
(no Spark needed): exact counters under concurrent load across every
SO_REUSEPORT worker, per-request metric skip reports, and the shared
admission budget.

The reference keeps its ingest stats as native atomics
(reference: src/otlp_server.cpp ingest counters); here they are
increments under a cross-process lock, so N concurrent clients hitting
M worker processes must never drop a count.
"""

from __future__ import annotations

import json
import math
import threading
import urllib.error
import urllib.request

from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

LOG_ENV = json.dumps(
    {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": "1700000000000000000",
         "body": {"stringValue": "x"}}]}]}]}).encode()


def _post(port, path, body, ctype="application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_counters_exact_under_concurrency(tmp_path):
    """40 threads x 25 requests across 3 worker processes: every counter
    must be exact — the single-process receiver's unlocked += could drop
    increments under the GIL's preemption."""
    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           disable_auth=True, accept_workers=3)
    rcv.start()
    n_threads, per_thread = 40, 25
    errs: list = []

    def worker():
        try:
            for _ in range(per_thread):
                code, _ = _post(rcv.port, "/v1/logs", LOG_ENV)
                assert code == 202
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[:3]
        st = rcv.stats
        total = n_threads * per_thread
        assert st.requests_total == total
        assert st.accepted_requests == total
        assert st.per_signal_requests["logs"] == total
        # every accepted body reserved exactly its spooled bytes
        line_bytes = len(LOG_ENV.strip()) + 1
        assert st.admitted_bytes_total == total * line_bytes
        assert st.per_signal_admitted_bytes["logs"] == total * line_bytes
        assert rcv.buffered_bytes == total * line_bytes
        assert rcv.buffered_bytes_by_signal()["logs"] == total * line_bytes
        # spool holds every line exactly once (segments across workers)
        rcv.rotate_all()
        lines = sum(p.read_text().count('"resourceLogs"')
                    for p in (tmp_path / "spool" / "logs").iterdir()
                    if not p.name.startswith("."))
        assert lines == total
    finally:
        rcv.stop()


def test_metric_skip_counters_in_202_and_stats(tmp_path):
    """Summary data points (unsupported shape) and non-finite number
    points are counted per request and server-wide
    (reference: otlp_server.cpp:699-702, otlp_server_http.cpp:171-179)."""
    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           disable_auth=True, accept_workers=1)
    rcv.start()
    try:
        env = {"resourceMetrics": [{"scopeMetrics": [{"metrics": [
            {"name": "q", "summary": {"dataPoints": [
                {"timeUnixNano": "1", "sum": 1.0},
                {"timeUnixNano": "2", "sum": 2.0}]}},
            {"name": "g", "gauge": {"dataPoints": [
                {"timeUnixNano": "1", "asDouble": math.inf},
                {"timeUnixNano": "2", "asDouble": 1.5}]}},
            {"name": "s", "sum": {"dataPoints": [
                {"timeUnixNano": "1", "asDouble": math.nan}]}},
        ]}]}]}
        body = json.dumps(env).encode()
        code, resp = _post(rcv.port, "/v1/metrics", body)
        assert code == 202
        assert resp["skipped_summary_points"] == 2
        assert resp["skipped_nan_points"] == 2
        # a clean logs request reports no skip keys
        code, resp = _post(rcv.port, "/v1/logs", LOG_ENV)
        assert code == 202 and "skipped_summary_points" not in resp
        st = rcv.stats
        assert st.skipped_summary_points == 2
        assert st.skipped_nan_points == 2
    finally:
        rcv.stop()


def test_admission_budget_shared_across_workers(tmp_path):
    """The 512 MiB admission budget is one shared gauge: once the cap is
    hit, every worker rejects with 503 until a seal releases bytes
    (reference: otlp_server.cpp:425-453)."""
    rcv = OtlpHttpReceiver("127.0.0.1", 0, tmp_path / "spool",
                           disable_auth=True, accept_workers=2,
                           max_buffered_bytes=len(LOG_ENV.strip()) + 1)
    rcv.start()
    try:
        assert _post(rcv.port, "/v1/logs", LOG_ENV)[0] == 202
        # budget exhausted -> 503 from any worker
        for _ in range(4):
            assert _post(rcv.port, "/v1/logs", LOG_ENV)[0] == 503
        assert rcv.stats.rejected_503 == 4
        rcv.release_sealed(rcv.buffered_bytes, "logs")
        assert _post(rcv.port, "/v1/logs", LOG_ENV)[0] == 202
    finally:
        rcv.stop()


def test_rotate_all_skips_wedged_worker():
    """A wedged accept worker (pipe never answers) must not hang
    otlp_flush: rotate_all only recv()s after poll() confirms a reply."""
    import time

    from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

    class WedgedPipe:
        def send(self, msg):
            pass

        def poll(self, timeout):
            return False            # never answers

        def recv(self):
            raise AssertionError("recv() called on a pipe that never polled ready")

    rcv = object.__new__(OtlpHttpReceiver)
    rcv._pipes = [WedgedPipe()]
    t0 = time.monotonic()
    rcv.rotate_all()                # must return, not block forever
    assert time.monotonic() - t0 < 5


def test_worker_kill9_bounded_loss_and_live_listener(tmp_path):
    """Process-death chaos (the gRPC GOAWAY tests cover protocol errors;
    this covers kill -9): SIGKILL one SO_REUSEPORT accept worker
    mid-load, then assert (a) the listener keeps accepting on the other
    shards, (b) rotate_all/stop do not hang on the dead worker's pipe,
    and (c) the loss window is EXACTLY the documented at-most-once
    window — accepted lines that sat in the dead worker's un-rotated
    dot-prefixed temp segment, still present on disk and accounted for:
    visible + orphaned-tmp == all 202-accepted lines
    (reference contract: serve.md:363-369)."""
    import json
    import os
    import signal
    import time
    import urllib.request
    import urllib.error

    from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

    spool = tmp_path / "spool"
    rcv = OtlpHttpReceiver("127.0.0.1", 0, spool, disable_auth=True,
                           accept_workers=3)
    rcv.start()
    env = {"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": "1", "body": {"stringValue": "chaos"}}]}]}]}
    body = json.dumps(env).encode()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{rcv.port}/v1/logs", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status

    accepted = 0
    for _ in range(40):
        assert post() == 202
        accepted += 1

    victim = rcv._procs[1]
    os.kill(victim.pid, signal.SIGKILL)
    victim.join(timeout=10)
    assert not victim.is_alive()

    # listener keeps serving: SO_REUSEPORT stops routing to the dead
    # shard once its socket closes; a request racing the close may fail
    # once and is retried (that's inside the documented window)
    ok = 0
    for _ in range(40):
        try:
            if post() == 202:
                ok += 1
        except (urllib.error.URLError, ConnectionError, OSError):
            continue
    assert ok >= 35, f"listener degraded after worker death: {ok}/40"
    accepted += ok

    # rotate_all must return despite the dead worker's pipe (poll guard)
    t0 = time.monotonic()
    rcv.rotate_all()
    assert time.monotonic() - t0 < 15

    def count_lines(paths):
        return sum(len(p.read_bytes().decode().splitlines()) for p in paths)

    visible = count_lines((spool / "logs").glob("seg_*.jsonl"))
    orphaned = count_lines((spool / "logs").glob(".seg_*.jsonl.tmp"))
    # at-most-once accounting: appends flush to the page cache, so the
    # victim's accepts survive SIGKILL in its orphaned .tmp segment —
    # the loss window is at most one torn final line.  Everything
    # accepted by the surviving shards, before or after the kill, must
    # be durable once rotate_all returns.
    loss = accepted - (visible + orphaned)
    assert 0 <= loss <= 1, (visible, orphaned, accepted)
    assert visible >= ok, "a post-kill accept was lost"
    assert visible > 0

    # a restarted receiver over the same spool recovers the orphan
    rcv2 = OtlpHttpReceiver("127.0.0.1", 0, spool, disable_auth=True,
                            accept_workers=1)
    rcv2._recover_orphan_segments()
    assert not list((spool / "logs").glob(".seg_*.jsonl.tmp"))
    recovered = count_lines((spool / "logs").glob("seg_*.jsonl"))
    assert recovered == visible + orphaned

    # shared accept counters survived the worker death
    assert rcv.stats.accepted_requests == accepted

    t0 = time.monotonic()
    rcv.stop()
    assert time.monotonic() - t0 < 30


def test_rotate_all_discards_stale_acks():
    """An ack left in the pipe by an earlier timed-out rotate must not
    satisfy the next rotate's wait: rotate_all drains until it sees its
    own sequence-tagged ack, so when it returns the worker has
    completed THIS rotation (the flush-visibility-lag fix)."""
    from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

    class StalePipe:
        def __init__(self):
            self.sent = []
            self.queue = ["ok"]     # stale untagged ack from an old rotate

        def send(self, msg):
            self.sent.append(msg)
            self.queue.append(("ok", msg[1]))   # worker acks the new seq

        def poll(self, timeout):
            return bool(self.queue)

        def recv(self):
            return self.queue.pop(0)

    rcv = object.__new__(OtlpHttpReceiver)
    pipe = StalePipe()
    rcv._pipes = [pipe]
    rcv.rotate_all()
    assert pipe.sent == [("rotate", 1)]
    assert pipe.queue == []         # drained past the stale ack to its own
    rcv.rotate_all()                # seq advances per call
    assert pipe.sent[-1] == ("rotate", 2)
