"""Controller/worker fleet: registration, heartbeat expiry, both dispatch
policies, and streaming generation over real HTTP on localhost."""

import json
import threading
import time

import numpy as np
import pytest
import requests

from gpt4roi_tpu.serve.controller import Controller, serve
from gpt4roi_tpu.serve.worker import ModelWorker, serve_worker


def test_dispatch_policies():
    c = Controller("shortest_queue")
    c.register_worker("w1", True, {"model_names": ["m"], "speed": 1.0, "queue_length": 5})
    c.register_worker("w2", True, {"model_names": ["m"], "speed": 1.0, "queue_length": 0})
    c.register_worker("w3", True, {"model_names": ["other"], "speed": 1.0, "queue_length": 0})
    assert c.get_worker_address("m") == "w2"
    # queue incremented -> next pick balances
    assert c.workers["w2"].queue_length == 1
    assert c.get_worker_address("missing") == ""

    lot = Controller("lottery")
    lot.register_worker("a", True, {"model_names": ["m"], "speed": 9.0, "queue_length": 0})
    lot.register_worker("b", True, {"model_names": ["m"], "speed": 1.0, "queue_length": 0})
    rng = np.random.default_rng(0)
    picks = [lot.get_worker_address("m", rng) for _ in range(200)]
    assert picks.count("a") > 150  # speed-weighted
    c.shutdown()
    lot.shutdown()


def test_heartbeat_expiry():
    c = Controller()
    c.register_worker("w1", True, {"model_names": ["m"], "speed": 1, "queue_length": 0})
    c.register_worker("w2", False, {"model_names": ["m"], "speed": 1, "queue_length": 0})
    time.sleep(0.05)
    c.remove_stale_workers(expiration=0.01)
    # only heartbeat-checked workers expire
    assert "w1" not in c.workers and "w2" in c.workers
    c.shutdown()


def test_http_fleet_end_to_end():
    controller, chttpd = serve(host="127.0.0.1", port=0)
    cport = chttpd.server_address[1]
    t1 = threading.Thread(target=chttpd.serve_forever, daemon=True)
    t1.start()
    curl = f"http://127.0.0.1:{cport}"

    def gen(params):
        text = ""
        for w in ["a", "b", "c"]:
            text += w
            yield text

    worker = ModelWorker(curl, "http://127.0.0.1:0", "gpt4roi-tpu", gen, heart_beat=False)
    whttpd = serve_worker(worker, host="127.0.0.1", port=0)
    wport = whttpd.server_address[1]
    worker.worker_url = f"http://127.0.0.1:{wport}"
    worker.register()
    t2 = threading.Thread(target=whttpd.serve_forever, daemon=True)
    t2.start()

    try:
        r = requests.post(curl + "/list_models", json={}, timeout=5)
        assert r.json()["models"] == ["gpt4roi-tpu"]
        r = requests.post(curl + "/get_worker_address", json={"model": "gpt4roi-tpu"}, timeout=5)
        addr = r.json()["address"]
        assert addr == worker.worker_url

        r = requests.post(addr + "/worker_generate_stream", json={"prompt": "hi"}, stream=True, timeout=5)
        chunks = [json.loads(l) for l in r.iter_lines() if l]
        assert [c["text"] for c in chunks] == ["a", "ab", "abc"]
        assert all(c["error_code"] == 0 for c in chunks)

        r = requests.post(addr + "/worker_get_status", json={}, timeout=5)
        assert r.json()["model_names"] == ["gpt4roi-tpu"]

        # heartbeat round trip
        r = requests.post(
            curl + "/receive_heart_beat",
            json={"worker_name": worker.worker_url, "queue_length": 2},
            timeout=5,
        )
        assert r.json()["exist"]

        # fleet client: controller-resolved streaming
        from gpt4roi_tpu.serve.client import generate_stream, get_worker

        resolved = get_worker(curl, "gpt4roi-tpu")
        assert resolved == worker.worker_url
        texts = list(generate_stream(resolved, "hi"))
        assert texts == ["a", "ab", "abc"]
    finally:
        worker.shutdown()
        controller.shutdown()
        chttpd.shutdown()
        whttpd.shutdown()
