"""REST server: POST a JSON job, stream the log back as a chunked response.

Rebuild of the reference's gin server (reference: internal/rest/serve.go):
GET / and /index.html serve the web UI, GET /api/v1/ping health-checks,
POST /api/v1/job decodes a polymorphic OpSequence and streams the run log as
the plain-text chunked response body, GET /api/v1/files/* serves the working
directory. CORS headers match serve.go:64-78.

Implemented on the stdlib ThreadingHTTPServer -- the job protocol is tiny and
the streaming-log contract is the whole API.
"""

from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from nightlight_tpu.ops.stats import LSEstimatorMode

_st_memory = 0  # like rest.stMemory (serve.go:33)

# One job at a time: each request handler runs on its own thread, but jobs
# issue device work and mutate working-directory files; concurrent device
# access is also rejected outright by some backends. The reference leaves
# this racy (serve.go:33 "Not thread safe"); we serialize instead. Waiting
# requests stream nothing until the lock is theirs.
_job_lock = threading.Lock()


class _ChunkedLogWriter(io.TextIOBase):
    """File-like writer that streams each write as an HTTP chunk, making the
    log the response body (serve.go:108-134)."""

    def __init__(self, wfile):
        self._wfile = wfile
        self._lock = threading.Lock()

    def write(self, s: str) -> int:
        data = s.encode("utf-8", "replace")
        if not data:
            return 0
        with self._lock:
            self._wfile.write(b"%x\r\n" % len(data))
            self._wfile.write(data)
            self._wfile.write(b"\r\n")
            self._wfile.flush()
        return len(s)

    def close_chunks(self) -> None:
        with self._lock:
            self._wfile.write(b"0\r\n\r\n")
            self._wfile.flush()


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def _cors(self) -> None:
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Credentials", "true")
        self.send_header(
            "Access-Control-Allow-Headers",
            "Content-Type, Content-Length, Accept-Encoding, X-CSRF-Token, Authorization, "
            "accept, origin, Cache-Control, X-Requested-With")
        self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS, GET, PUT")

    def do_OPTIONS(self):  # noqa: N802
        self.send_response(204)
        self._cors()
        self.end_headers()

    def do_GET(self):  # noqa: N802
        path = self.path.split("?", 1)[0]
        if path in ("/", "/index.html"):
            self._serve_static("index.html", "text/html")
        elif path == "/api/v1/schema":
            from nightlight_tpu.serve.schema import operator_schema

            body = json.dumps(operator_schema()).encode()
            self.send_response(200)
            self._cors()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif path == "/api/v1/ping":
            body = json.dumps({"message": "pong"}).encode()
            self.send_response(200)
            self._cors()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif path.startswith("/api/v1/files/"):
            rel = path[len("/api/v1/files/"):]
            self._serve_file(rel)
        elif path.startswith("/js/"):
            self._serve_static(path.lstrip("/"), None)
        else:
            self.send_error(404)

    def _serve_static(self, rel: str, content_type):
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "web")
        full = os.path.realpath(os.path.join(base, rel))
        # Containment check: reject traversal out of the web asset dir
        # (mirrors the path sandboxing contract of operator.go:258-266).
        if os.path.commonpath([full, os.path.realpath(base)]) != os.path.realpath(base):
            self.send_error(403)
            return
        self._send_file(full, content_type)

    def _serve_file(self, rel: str):
        if os.path.isabs(rel) or ".." in rel:
            self.send_error(403)
            return
        self._send_file(os.path.join(os.getcwd(), rel), None)

    def _send_file(self, full: str, content_type):
        if not os.path.isfile(full):
            self.send_error(404)
            return
        if content_type is None:
            import mimetypes

            content_type = mimetypes.guess_type(full)[0] or "application/octet-stream"
        with open(full, "rb") as f:
            body = f.read()
        self.send_response(200)
        self._cors()
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        if self.path.split("?", 1)[0] != "/api/v1/job":
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", "0"))
        raw = self.rfile.read(length)
        try:
            spec = json.loads(raw)
        except json.JSONDecodeError as e:
            body = json.dumps({"error": str(e)}).encode()
            self.send_response(400)
            self._cors()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return

        self.send_response(200)
        self._cors()
        self.send_header("Content-Type", "text/plain")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        log = _ChunkedLogWriter(self.wfile)
        from nightlight_tpu.pipeline import materialize_all, op_from_dict
        from nightlight_tpu.pipeline.context import new_context

        try:
            op = op_from_dict(spec)
        except Exception as e:  # noqa: BLE001
            log.write(f"Error making promises: {e}\n")
            log.close_chunks()
            return
        log.write("Arguments:\n" + op.to_json() + "\n")
        c = new_context(log=log, st_memory=_st_memory, ls_mode=LSEstimatorMode.SCMedianQn)
        # Queue, don't reject: a live-stacking client POSTing the next
        # frame's job during a long stack should wait its turn, not retry.
        # The wait is announced on the stream immediately so the client is
        # not left staring at a silent connection (the reference streams
        # with no guard at all, serve.go:95-139 — concurrent jobs race).
        if not _job_lock.acquire(blocking=False):
            log.write("Queued: another job is running; waiting for the device...\n")
            _job_lock.acquire()
        try:
            promises = op.make_promises([], c)
            _, err = materialize_all(promises, c.max_threads, True)
            c.finalize()
            if err is not None:
                log.write(f"Error materializing promises: {err}\n")
        except Exception as e:  # noqa: BLE001
            log.write(f"Error making promises: {e}\n")
        finally:
            _job_lock.release()
        log.close_chunks()

    def log_message(self, fmt, *args):  # quiet default request logging
        pass


def _warm_backend() -> None:
    """Initialize the jax backend on the calling (main) thread: lazy backend
    init inside a request handler daemon thread can deadlock device
    transfers."""
    try:
        import jax.numpy as jnp

        jnp.zeros(1).block_until_ready()
    except Exception:  # noqa: BLE001 - serving static content still works
        pass


def serve(port: int, st_memory: int) -> None:
    """Start the REST server (serve.go:36-62)."""
    global _st_memory
    _st_memory = st_memory
    _warm_backend()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"Serving on :{port}")
    httpd.serve_forever()


def make_server(port: int, st_memory: int) -> ThreadingHTTPServer:
    """Create (but don't run) a server; used by tests."""
    global _st_memory
    _st_memory = st_memory
    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
