"""S4: HTTP log collector — the ingestion edge in front of the ODS
layer (reference GmallLoggerApplication.java:6-13 +
LoggerController.java:7-13, a Spring Boot service meant to receive app
logs and forward them to Kafka; the reference ships only the ``/test``
stub and declares the spring-kafka dep, gmall-logger/pom.xml:114-117).

Spark-first shape: instead of HTTP → Kafka topic, the collector spools
received lines into an atomically-published JSONL file-drop directory —
the same ODS contract ``sources.streams.read_jsonl_stream`` already
consumes (and the Kafka writer in ``streaming/sinks.py`` remains the
drop-in alternative where a broker exists). Stdlib-only
(ThreadingHTTPServer), no new dependencies.

Endpoints:
- ``GET /test``    → 200 ``success`` (the reference's exact stub)
- ``POST /applog`` → body appended verbatim, one line per request; no
  validation — malformed payloads flow to the DWD dirty side-channel
  exactly like a bad Kafka record (T2, parse_with_dirty)

Atomic publish: Structured Streaming's file source lists complete
files, so lines buffer in memory and each roll writes a temp file then
``os.rename``s it into the spool — a reader can never observe a
half-written file. Rolls happen every ``roll_every`` lines, on
``flush()``, and on ``stop()``.

At scale this edge is horizontally trivial (stateless receivers, one
spool prefix per instance — ``part-<pid>-<n>-<uuid>``); the streaming
job's parallelism is decoupled from receiver count by the file listing.
"""

from __future__ import annotations

import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class LogCollector:
    """Embedded HTTP log collector spooling to a file-drop directory."""

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        roll_every: int = 500,
    ) -> None:
        self.spool_dir = spool_dir
        self.roll_every = roll_every
        self._host = host
        self._port = port
        self._buf: list[bytes] = []
        self._lock = threading.Lock()
        self._n_rolls = 0
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        os.makedirs(spool_dir, exist_ok=True)

    # -- spool ----------------------------------------------------------
    def _append(self, line: bytes) -> None:
        with self._lock:
            self._buf.append(line)
            if len(self._buf) >= self.roll_every:
                self._roll_locked()

    def _roll_locked(self) -> None:
        if not self._buf:
            return
        name = f"part-{os.getpid()}-{self._n_rolls:06d}-{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(b"\n".join(self._buf) + b"\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))
        self._buf = []
        self._n_rolls += 1

    def flush(self) -> None:
        """Publish any buffered lines as a complete spool file."""
        with self._lock:
            self._roll_locked()

    # -- http -----------------------------------------------------------
    def start(self) -> tuple[str, int]:
        collector = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # silence per-request noise
                pass

            def do_GET(self) -> None:
                if self.path == "/test":
                    body = b"success"  # reference LoggerController.java:9-12
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self) -> None:
                if self.path != "/applog":
                    self.send_response(404)
                    self.end_headers()
                    return
                # An ack means the line is spooled — never 200 a body we
                # could not read. Chunked encoding has no Content-Length
                # (411), and a malformed length must be a clean 400, not
                # an exception in the handler thread (round-5 review:
                # both cases previously acked-and-dropped or reset).
                raw = self.headers.get("Content-Length")
                if raw is None:
                    self.send_response(411)  # Length Required
                    self.end_headers()
                    return
                try:
                    n = int(raw)
                    if n < 0:
                        raise ValueError(raw)
                except ValueError:
                    self.send_response(400)
                    self.end_headers()
                    return
                body = self.rfile.read(n)
                if len(body) != n:
                    # client aborted mid-body: spooling the truncated
                    # prefix would ack-and-corrupt (round-5 review)
                    self.send_response(400)
                    self.end_headers()
                    return
                line = body.replace(b"\n", b" ").strip()
                if line:
                    collector._append(line)
                self.send_response(200)
                self.end_headers()

        self._server = ThreadingHTTPServer((self._host, self._port), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self._server.server_address[0], self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        self.flush()
