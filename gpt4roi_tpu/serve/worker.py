"""Model worker: streaming token HTTP server with controller registration.

Re-implements the reference's model worker (reference:
llava/serve/model_worker.py:42-384): registers with the controller at
startup, heartbeats on a background thread (re-registering if the controller
forgot it), serves ``/worker_generate_stream`` as a newline-delimited JSON
stream, and bounds concurrency with a semaphore
(model_worker.py:168-173).

The generation callable is injected so the worker is testable without a
model; production wiring passes ``ChatSession``-style generate closures over
the jitted Engine.
"""

from __future__ import annotations

import base64
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

HEART_BEAT_INTERVAL = 30.0


class ModelWorker:
    def __init__(
        self,
        controller_url: str,
        worker_url: str,
        model_name: str,
        generate_stream_fn: Callable[[dict], Iterator[str]],
        limit_concurrency: int = 4,
        heart_beat: bool = True,
        speed: float = 1.0,
    ):
        self.controller_url = controller_url.rstrip("/")
        self.worker_url = worker_url
        self.model_name = model_name
        self.generate_stream_fn = generate_stream_fn
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.active = 0
        self.lock = threading.Lock()
        self.speed = speed
        self.worker_id = str(uuid.uuid4())[:8]
        self._stop = threading.Event()
        if heart_beat:
            self.register()
            self._hb_thread = threading.Thread(target=self._heartbeat_loop, daemon=True)
            self._hb_thread.start()

    def status(self) -> dict:
        with self.lock:
            q = self.active
        return {"model_names": [self.model_name], "speed": self.speed, "queue_length": q}

    def register(self) -> None:
        import requests

        requests.post(
            self.controller_url + "/register_worker",
            json={
                "worker_name": self.worker_url,
                "check_heart_beat": True,
                "worker_status": self.status(),
            },
            timeout=5,
        )

    def _heartbeat_loop(self) -> None:
        import requests

        while not self._stop.is_set():
            self._stop.wait(HEART_BEAT_INTERVAL)
            if self._stop.is_set():
                break
            try:
                r = requests.post(
                    self.controller_url + "/receive_heart_beat",
                    json={"worker_name": self.worker_url, "queue_length": self.status()["queue_length"]},
                    timeout=5,
                )
                if not r.json().get("exist", False):
                    self.register()  # controller restarted / expired us
            except Exception:
                try:
                    self.register()
                except Exception:
                    pass

    def generate_stream(self, params: dict) -> Iterator[str]:
        with self.lock:
            self.active += 1
        acquired = self.semaphore.acquire(timeout=60)
        try:
            if not acquired:
                yield json.dumps({"error_code": 1, "text": "server overloaded"}) + "\n"
                return
            for chunk in self.generate_stream_fn(params):
                yield json.dumps({"error_code": 0, "text": chunk}) + "\n"
        finally:
            if acquired:
                self.semaphore.release()
            with self.lock:
                self.active -= 1

    def shutdown(self) -> None:
        self._stop.set()


def decode_image_b64(data: str) -> np.ndarray:
    """base64 png/jpeg -> RGB uint8 array (model_worker.py image handling)."""
    import io

    from PIL import Image

    raw = base64.b64decode(data)
    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/worker_get_status":
                self._json(200, worker.status())
            elif self.path == "/worker_generate_stream":
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                for line in worker.generate_stream(req):
                    data = line.encode()
                    self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
                    self.wfile.flush()
                self.wfile.write(b"0\r\n\r\n")
            else:
                self._json(404, {"error": "unknown path"})

    return Handler


def serve_worker(worker: ModelWorker, host: str = "0.0.0.0", port: int = 21002):
    httpd = ThreadingHTTPServer((host, port), make_handler(worker))
    return httpd
