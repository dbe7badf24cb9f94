"""Serving controller: worker registry + heartbeat expiry + dispatch.

Re-implements the reference's multi-worker fleet controller (reference:
llava/serve/controller.py:57-300) on the stdlib HTTP server (no
fastapi/uvicorn in the TPU image): workers register and heartbeat; stale
workers are expired by a background thread; request dispatch supports the
same two policies — speed-weighted ``lottery`` and ``shortest_queue``
(controller.py:121-171).

HTTP API (JSON bodies):
  POST /register_worker   {worker_name, check_heart_beat, worker_status}
  POST /receive_heart_beat {worker_name, queue_length} -> {exist}
  POST /refresh_all_workers
  POST /list_models -> {models}
  POST /get_worker_address {model} -> {address}
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

HEART_BEAT_EXPIRATION = 90.0  # seconds (reference: llava/constants.py)


@dataclasses.dataclass
class WorkerInfo:
    model_names: List[str]
    speed: float
    queue_length: int
    check_heart_beat: bool
    last_heart_beat: float


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        assert dispatch_method in ("lottery", "shortest_queue")
        self.dispatch_method = dispatch_method
        self.workers: Dict[str, WorkerInfo] = {}
        self.lock = threading.Lock()
        self._stop = threading.Event()
        self._expire_thread = threading.Thread(target=self._expire_loop, daemon=True)
        self._expire_thread.start()

    # -- registry ----------------------------------------------------------
    def register_worker(self, name: str, check_heart_beat: bool, status: Optional[dict]) -> bool:
        if status is None:
            return False
        with self.lock:
            self.workers[name] = WorkerInfo(
                model_names=list(status.get("model_names", [])),
                speed=float(status.get("speed", 1.0)),
                queue_length=int(status.get("queue_length", 0)),
                check_heart_beat=check_heart_beat,
                last_heart_beat=time.time(),
            )
        return True

    def receive_heart_beat(self, name: str, queue_length: int) -> bool:
        with self.lock:
            w = self.workers.get(name)
            if w is None:
                return False
            w.queue_length = int(queue_length)
            w.last_heart_beat = time.time()
            return True

    def remove_stale_workers(self, expiration: float = HEART_BEAT_EXPIRATION) -> None:
        now = time.time()
        with self.lock:
            stale = [
                n
                for n, w in self.workers.items()
                if w.check_heart_beat and now - w.last_heart_beat > expiration
            ]
            for n in stale:
                del self.workers[n]

    def _expire_loop(self) -> None:
        while not self._stop.is_set():
            self._stop.wait(HEART_BEAT_EXPIRATION / 3)
            self.remove_stale_workers()

    def list_models(self) -> List[str]:
        with self.lock:
            models = set()
            for w in self.workers.values():
                models.update(w.model_names)
            return sorted(models)

    # -- dispatch (controller.py:121-171) ---------------------------------
    def get_worker_address(self, model: str, rng: Optional[np.random.Generator] = None) -> str:
        rng = rng or np.random.default_rng()
        with self.lock:
            candidates = [
                (n, w) for n, w in self.workers.items() if model in w.model_names
            ]
            if not candidates:
                return ""
            if self.dispatch_method == "lottery":
                speeds = np.array([w.speed for _, w in candidates], np.float64)
                if speeds.sum() <= 0:
                    return ""
                pt = rng.random() * speeds.sum()
                idx = int(np.searchsorted(np.cumsum(speeds), pt))
                idx = min(idx, len(candidates) - 1)
                return candidates[idx][0]
            # shortest_queue, normalised by speed
            norm = [w.queue_length / max(w.speed, 1e-6) for _, w in candidates]
            idx = int(np.argmin(norm))
            name, w = candidates[idx]
            w.queue_length += 1
            return name

    def shutdown(self) -> None:
        self._stop.set()


def make_handler(controller: Controller):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
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
            if self.path == "/register_worker":
                ok = controller.register_worker(
                    req["worker_name"], req.get("check_heart_beat", True), req.get("worker_status")
                )
                self._json(200 if ok else 400, {"ok": ok})
            elif self.path == "/receive_heart_beat":
                exist = controller.receive_heart_beat(req["worker_name"], req.get("queue_length", 0))
                self._json(200, {"exist": exist})
            elif self.path == "/list_models":
                self._json(200, {"models": controller.list_models()})
            elif self.path == "/get_worker_address":
                self._json(200, {"address": controller.get_worker_address(req["model"])})
            elif self.path == "/refresh_all_workers":
                controller.remove_stale_workers(expiration=0.0)
                self._json(200, {"ok": True})
            else:
                self._json(404, {"error": "unknown path"})

    return Handler


def serve(host: str = "0.0.0.0", port: int = 21001, dispatch_method: str = "shortest_queue"):
    controller = Controller(dispatch_method)
    httpd = ThreadingHTTPServer((host, port), make_handler(controller))
    return controller, httpd


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21001)
    p.add_argument("--dispatch-method", default="shortest_queue", choices=["lottery", "shortest_queue"])
    a = p.parse_args()
    _, httpd = serve(a.host, a.port, a.dispatch_method)
    print(f"controller on {a.host}:{a.port}")
    httpd.serve_forever()
