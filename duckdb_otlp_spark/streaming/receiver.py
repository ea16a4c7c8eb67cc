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
        for sig in ("logs", "traces", "metrics"):
            (self.spool_dir / sig).mkdir(parents=True, exist_ok=True)

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
        """Append the envelope(s) as compact NDJSON lines; returns rows
        hint (envelope count)."""
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
        fname = self.spool_dir / signal / f"req_{uuid.uuid4().hex}.jsonl"
        tmp = fname.with_suffix(".tmp")
        tmp.write_text("\n".join(lines) + "\n")
        tmp.rename(fname)  # atomic: the streaming source never sees partials
        return len(lines)

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

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
