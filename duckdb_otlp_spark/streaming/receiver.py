"""OTLP/HTTP ingest edge: auth, content negotiation, admission control,
spooling — the receiver half of the reference's ``otlp_serve``
(reference: src/otlp_server_http.cpp, src/otlp_server.cpp:380-557).

The receiver is deliberately outside Spark (SURVEY.md §3.2): it accepts
OTLP/JSON POSTs, applies the reference's edge contracts, and appends
accepted bodies as NDJSON into a per-signal spool directory that the
Structured Streaming seal job tails. Durability contract preserved:
202 means buffered-in-spool, not committed — the same at-most-once
window the reference documents (reference: serve.md:363-369).

Contracts matched:
- Bearer/x-api-key constant-time auth; tokens >= 16 chars; CSPRNG
  32-hex default (reference: otlp_server.cpp:380-423, 83-92).
- Content-Type -> {json, ndjson, protobuf}; protobuf decodes edge-side
  to a JSON envelope line; unknown -> 415. gzip/deflate/identity
  encodings; else 415 (reference: otlp_server.cpp:200-237).
- Body cap 16 MiB -> 413; admission cap 512 MiB of un-sealed spool
  bytes -> 503 (reference: otlp_ingest_limits.hpp).
- /healthz always 200; /readyz degrades when sealing stalls
  (reference: otlp_server_http.cpp:131-144).
"""

from __future__ import annotations

import gzip
import hmac
import json
import secrets
import threading
import time
import uuid
import zlib
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

# reference: src/include/otlp_ingest_limits.hpp
DEFAULT_MAX_BODY_BYTES = 16 * 1024 * 1024
DEFAULT_MAX_BUFFERED_BYTES = 512 * 1024 * 1024

_SIGNAL_PATHS = {
    "/v1/logs": "logs",
    "/v1/traces": "traces",
    "/v1/metrics": "metrics",
}

# OTAP BatchArrowRecords over HTTP POST (the reference's otap_serve is
# Arrow gRPC — reference: src/otlp_server_grpc.cpp:95-133; no grpc
# runtime ships in this environment, so the same messages are accepted
# as HTTP bodies with identical decode semantics)
_OTAP_CTYPES = ("application/vnd.otel.arrow", "application/x-otap")

# Rolling spool segments: many tiny request-sized files would make the
# seal's scan one-task-per-file (task-launch overhead dwarfs the parse)
# and at production rates would mean thousands of files/second of
# listing load. Segments target the same order of magnitude as the
# reference's seal_target_bytes admission batching
# (reference: otlp_ingest_limits.hpp DEFAULT_SEAL_TARGET_BYTES).
DEFAULT_SEGMENT_ROTATE_BYTES = 8 * 1024 * 1024
DEFAULT_SEGMENT_ROTATE_MS = 500


class _SpoolSegmentWriter:
    """Appends accepted envelope lines to a per-signal rolling segment.

    A segment is written as a dot-prefixed temp file (hidden from Spark
    file sources) and renamed visible on rotation, so the streaming
    seal never observes a partially-written segment — the same
    atomic-visibility contract the old one-file-per-request spool had,
    at ~1/100th the file count."""

    def __init__(self, directory: Path,
                 rotate_bytes: int = DEFAULT_SEGMENT_ROTATE_BYTES,
                 rotate_ms: int = DEFAULT_SEGMENT_ROTATE_MS):
        self.directory = directory
        self.rotate_bytes = rotate_bytes
        self.rotate_ms = rotate_ms
        self._lock = threading.Lock()
        self._fh = None
        self._tmp_path: Path | None = None
        self._bytes = 0
        self._opened = 0.0

    def append(self, lines: list[str]) -> None:
        data = ("\n".join(lines) + "\n").encode()
        with self._lock:
            if self._fh is None:
                name = f".seg_{uuid.uuid4().hex}.jsonl.tmp"
                self._tmp_path = self.directory / name
                self._fh = self._tmp_path.open("wb")
                self._bytes = 0
                self._opened = time.monotonic()
            self._fh.write(data)
            self._bytes += len(data)
            if (self._bytes >= self.rotate_bytes
                    or (time.monotonic() - self._opened) * 1000 >= self.rotate_ms):
                self._rotate_locked()

    def _rotate_locked(self) -> None:
        fh, tmp = self._fh, self._tmp_path
        self._fh = self._tmp_path = None
        if fh is None:
            return
        fh.close()
        # strip the ".tmp" suffix AND the hidden dot prefix in one rename
        tmp.rename(tmp.parent / tmp.name[1:-len(".tmp")])

    def rotate(self) -> None:
        """Make everything appended so far visible to the seal."""
        with self._lock:
            self._rotate_locked()

    def rotate_if_stale(self) -> None:
        with self._lock:
            if (self._fh is not None
                    and (time.monotonic() - self._opened) * 1000 >= self.rotate_ms):
                self._rotate_locked()


@dataclass
class ReceiverStats:
    requests_total: int = 0
    accepted_requests: int = 0
    admitted_bytes_total: int = 0
    rejected_auth: int = 0
    rejected_413: int = 0
    rejected_415: int = 0
    rejected_503: int = 0
    per_signal_requests: dict[str, int] = field(
        default_factory=lambda: {"logs": 0, "traces": 0, "metrics": 0})


class OtlpHttpReceiver:
    """Threaded HTTP listener spooling accepted OTLP/JSON bodies."""

    def __init__(self, host: str, port: int, spool_dir: str | Path,
                 auth_token: str | None = None, disable_auth: bool = False,
                 max_body_bytes: int = DEFAULT_MAX_BODY_BYTES,
                 max_buffered_bytes: int = DEFAULT_MAX_BUFFERED_BYTES,
                 formats: str = "otlp"):
        if formats not in ("otlp", "otap"):
            raise ValueError(f"unknown formats {formats!r}; use 'otlp' or 'otap'")
        if not disable_auth:
            if auth_token is None:
                auth_token = secrets.token_hex(16)  # 32 hex chars
            if len(auth_token) < 16:
                # reference: otlp_server.cpp token length rule
                raise ValueError("auth token must be at least 16 characters")
        self.host, self.port = host, port
        self.formats = formats
        self.spool_dir = Path(spool_dir)
        self.auth_token = auth_token
        self.disable_auth = disable_auth
        self.max_body_bytes = max_body_bytes
        self.max_buffered_bytes = max_buffered_bytes
        self.stats = ReceiverStats()
        self._buffered_bytes = 0          # un-sealed spool bytes (admission)
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.started_unix_ms = int(time.time() * 1000)
        self.ready_probe = lambda: True   # server wires seal-stall detection
        self._writers: dict[str, _SpoolSegmentWriter] = {}
        for sig in ("logs", "traces", "metrics"):
            d = self.spool_dir / sig
            d.mkdir(parents=True, exist_ok=True)
            self._writers[sig] = _SpoolSegmentWriter(d)
        self._janitor_stop = threading.Event()
        self._janitor: threading.Thread | None = None

    # -- admission (reference: otlp_server.cpp:425-453) --
    def try_reserve(self, n: int) -> bool:
        with self._lock:
            if self._buffered_bytes + n > self.max_buffered_bytes:
                return False
            self._buffered_bytes += n
            return True

    def release_sealed(self, n: int) -> None:
        with self._lock:
            self._buffered_bytes = max(0, self._buffered_bytes - n)

    @property
    def buffered_bytes(self) -> int:
        with self._lock:
            return self._buffered_bytes

    def _check_auth(self, headers) -> bool:
        if self.disable_auth:
            return True
        supplied = ""
        auth = headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            supplied = auth[len("Bearer "):]
        elif headers.get("x-api-key"):
            supplied = headers.get("x-api-key")
        # constant-time compare (reference: otlp_server.cpp:83-92)
        return hmac.compare_digest(supplied.encode(), (self.auth_token or "").encode())

    def _spool(self, signal: str, body: bytes) -> int:
        """Append the envelope(s) as compact NDJSON lines into the
        signal's rolling segment; returns rows hint (envelope count)."""
        text = body.decode("utf-8")
        lines: list[str] = []
        stripped = text.strip()
        # json.loads validates (invalid body -> 400, like the reference's
        # parse-at-ingest); the ORIGINAL line is spooled as-is — a
        # re-dump would double the JSON cost on the GIL-bound accept path
        for line in (stripped.split("\n") if "\n" in stripped else (stripped,)):
            line = line.strip()
            if line:
                json.loads(line)
                lines.append(line)
        self._writers[signal].append(lines)
        return len(lines)

    def rotate_all(self) -> None:
        """Flush every open segment to visibility (called before a
        synchronous seal, the otlp_flush path)."""
        for w in self._writers.values():
            w.rotate()

    def _janitor_loop(self) -> None:
        """Rotate idle segments so spooled rows become sealable within
        rotate_ms even when traffic pauses mid-segment."""
        while not self._janitor_stop.wait(
                min(w.rotate_ms for w in self._writers.values()) / 1000):
            for w in self._writers.values():
                w.rotate_if_stale()

    def start(self) -> None:
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            # TCP_NODELAY: without it every keep-alive request/response
            # pair risks a ~40 ms Nagle/delayed-ACK stall — measured 67k
            # -> 142k logs/s accepted on the 4-producer bench shape
            disable_nagle_algorithm = True
            # buffer the response so status+headers+body leave as one
            # packet instead of four syscalls/segments
            wbufsize = 64 * 1024

            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    return self._reply(200, {"status": "ok"})
                if self.path == "/readyz":
                    ok = receiver.ready_probe()
                    return self._reply(200 if ok else 503,
                                       {"status": "ok" if ok else "degraded"})
                return self._reply(404, {"error": "not found"})

            def _drain(self):
                """Discard the unread request body in chunks so the client
                is never blocked mid-send when we reject before reading."""
                left = int(self.headers.get("Content-Length") or 0)
                while left > 0:
                    chunk = self.rfile.read(min(left, 1 << 16))
                    if not chunk:
                        break
                    left -= len(chunk)

            def do_POST(self):
                st = receiver.stats
                st.requests_total += 1
                signal = _SIGNAL_PATHS.get(self.path)
                if signal is None:
                    self._drain()
                    return self._reply(404, {"error": "unknown path"})
                if not receiver._check_auth(self.headers):
                    st.rejected_auth += 1
                    self._drain()
                    return self._reply(401, {"error": "unauthorized"})

                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                is_pb = ctype in ("application/x-protobuf", "application/protobuf")
                is_otap = ctype in _OTAP_CTYPES
                # an otap: listener accepts ONLY Arrow payloads, an otlp:
                # listener only OTLP ones — scheme selects the protocol,
                # like the reference's otlp_serve/otap_serve split
                allowed = (is_otap if receiver.formats == "otap"
                           else (is_pb or ctype in ("application/json",
                                                    "application/x-ndjson")))
                if not allowed:
                    st.rejected_415 += 1
                    self._drain()
                    return self._reply(415, {"error": f"unsupported content type {ctype}"})

                enc = (self.headers.get("Content-Encoding") or "identity").strip()
                if enc not in ("identity", "gzip", "deflate"):
                    st.rejected_415 += 1
                    self._drain()
                    return self._reply(415, {"error": f"unsupported encoding {enc}"})

                n = int(self.headers.get("Content-Length") or 0)
                if n > receiver.max_body_bytes:
                    st.rejected_413 += 1
                    self.close_connection = True
                    self._drain()
                    return self._reply(413, {"error": "body too large"})
                body = self.rfile.read(n)
                if enc == "gzip":
                    body = gzip.decompress(body)
                elif enc == "deflate":
                    body = zlib.decompress(body)
                if is_pb:
                    # decode edge-side to a JSON envelope line so the spool
                    # stays one format (reference decodes pb at ingest too:
                    # otlp_server.cpp:528-557 content-type -> format)
                    from duckdb_otlp_spark.sources.otlp_proto import pb_to_json_line
                    try:
                        body = pb_to_json_line(body, signal).encode()
                    except ValueError as e:
                        return self._reply(400, {"error": f"invalid protobuf body: {e}"})
                elif is_otap:
                    # OTAP BatchArrowRecords decode edge-side to the same
                    # JSON envelope line; a decode failure rejects just
                    # this request (the gRPC contract poisons the stream —
                    # HTTP has no stream to poison)
                    from duckdb_otlp_spark.sources.otap import (
                        OtapDecodeError,
                        bar_to_envelope,
                    )
                    try:
                        env = bar_to_envelope(body, signal)
                        body = json.dumps(env, separators=(",", ":")).encode()
                    except OtapDecodeError as e:
                        return self._reply(400, {"error": f"OTAP decode error: {e}"})

                if not receiver.try_reserve(len(body)):
                    st.rejected_503 += 1
                    return self._reply(503, {"error": "buffer full, retry later"})
                try:
                    batches = receiver._spool(signal, body)
                except Exception as e:  # malformed JSON: reject, release
                    receiver.release_sealed(len(body))
                    return self._reply(400, {"error": f"invalid JSON body: {e}"})
                st.accepted_requests += 1
                st.admitted_bytes_total += len(body)
                st.per_signal_requests[signal] += 1
                # 202 = spooled, not yet sealed (reference: serve.md:363)
                return self._reply(202, {"batches": batches})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        if self.port == 0:
            self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="otlp-receiver", daemon=True)
        self._thread.start()
        self._janitor = threading.Thread(target=self._janitor_loop,
                                         name="otlp-spool-janitor", daemon=True)
        self._janitor.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self._janitor_stop.set()
        if self._janitor:
            self._janitor.join(timeout=5)
            self._janitor = None
        self.rotate_all()  # last partial segment stays sealable
