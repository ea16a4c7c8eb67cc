"""bench._paced_producer fault handling: a dropped keep-alive must be
retried on a fresh connection (not silently kill the thread, losing its
accumulated ok count), exhausted retries must count as producer errors —
never as server rejections — and non-202 responses must land in the
status taxonomy."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from bench import _paced_producer


def _serve(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.fixture()
def flaky_server():
    """Accepts POSTs with 202, but hard-drops every 3rd connection
    request without writing a response (RemoteDisconnected on the
    client). Counts its deliberate drops in ``srv.drops[0]`` so the
    test can hold the producer's retry accounting to an independently
    measured bound."""
    lock = threading.Lock()
    count = [0]
    drops = [0]

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with lock:
                count[0] += 1
                drop = count[0] % 3 == 0
                if drop:
                    drops[0] += 1
            if drop:
                self.close_connection = True
                self.connection.close()
                return
            self.send_response(202)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = _serve(Handler)
    srv.drops = drops
    yield srv
    srv.shutdown()


@pytest.fixture()
def rejecting_server():
    """202s and 503s alternating — exercises the status taxonomy."""
    lock = threading.Lock()
    count = [0]

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with lock:
                count[0] += 1
                status = 503 if count[0] % 2 == 0 else 202
            self.send_response(status)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = _serve(Handler)
    yield srv
    srv.shutdown()


def test_dropped_connections_are_retried_not_fatal(flaky_server):
    host, port = flaky_server.server_address
    n = 30
    ok, sent, wall, faults, statuses, retried = _paced_producer(
        (host, port, [b"x"], 0.0, n))
    # conservation: every slot is accepted, rejected, or faulted —
    # dropped connections never vanish (the old code lost the whole
    # thread's ok count on the first drop)
    assert sent == n
    assert ok + faults == n
    assert statuses == {}           # drops are NOT server rejections
    # retries recover most drops (a retry can itself hit the every-3rd
    # drop, so a few faults remain; without retry ok would be ~2n/3 = 20,
    # well under the 23 floor). The bound is deliberately loose: the drop
    # pattern is positional over a 4-thread interleaving, so under a
    # loaded host (full-suite run) retries land on drop positions more
    # often than the ~1/3 a quiet box shows.
    assert faults <= n // 4, (ok, faults)
    assert ok >= n - n // 4
    # retry-accounting conservation against the SERVER's own drop count
    # (r9 ADVICE: the previous `retried + faults >= 1` was near-vacuous —
    # a regression that stopped counting retries entirely still passed).
    # Every deliberate server drop surfaces as exactly one client-side
    # send exception: a retried slot consumed 1 drop (first send), a
    # faulted slot consumed 2 (first send + retry), so
    # retried + 2*faults >= server drops. Spurious client-side faults
    # (host load, not server drops) can only INCREASE the left side, so
    # the bound cannot flake that way; a retried-counting regression
    # breaks it on the first recovered drop.
    server_drops = flaky_server.drops[0]
    assert server_drops >= 1
    assert retried + 2 * faults >= server_drops, \
        (retried, faults, server_drops)
    assert retried + faults <= n


def test_unreachable_server_counts_producer_errors():
    # bind-then-close: guaranteed-refused port
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    n = 5
    ok, sent, wall, faults, statuses, retried = _paced_producer(
        ("127.0.0.1", port, [b"x"], 0.0, n))
    assert ok == 0
    assert faults == n          # retry exhausted per slot
    assert retried == 0         # retry never got a response
    assert statuses == {}       # not server rejections


def test_non_202_statuses_enter_taxonomy(rejecting_server):
    host, port = rejecting_server.server_address
    n = 20
    ok, sent, wall, faults, statuses, retried = _paced_producer(
        (host, port, [b"x"], 0.0, n))
    assert faults == 0
    assert retried == 0
    assert ok + statuses.get(503, 0) == n
    assert statuses.get(503, 0) == n // 2
