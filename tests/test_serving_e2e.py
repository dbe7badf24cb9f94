"""Full-stack serving: tiny GPT4RoI model behind the worker HTTP endpoint
via launch_worker's generate_stream (image + boxes in the request)."""

import base64
import io
import json
import threading

import numpy as np
import pytest
import requests

import jax

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from gpt4roi_tpu.serve.chat import ChatSession
from gpt4roi_tpu.serve.engine import Engine, EngineConfig
from gpt4roi_tpu.serve.launch_worker import build_generate_stream
from gpt4roi_tpu.serve.worker import ModelWorker, serve_worker
from tests.toy_tokenizer import ToyTokenizer


def test_worker_serves_tiny_model(rng):
    from PIL import Image

    cfg = Gpt4RoiConfig.tiny(vocab_size=512)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=768, prefill_bucket=64))
    tok = ToyTokenizer(model_max_length=768)
    for name, tid in [
        ("<im_patch>", cfg.im_patch_token_id),
        ("<bbox>", cfg.bbox_token_id),
        ("<point>", cfg.point_token_id),
        ("<im_start>", cfg.im_start_token_id),
        ("<im_end>", cfg.im_end_token_id),
    ]:
        tok.vocab[name] = tid
    session = ChatSession(eng, tok, temperature=0.0, max_new_tokens=4)

    worker = ModelWorker(
        "http://127.0.0.1:1", "http://127.0.0.1:0", "tiny",
        build_generate_stream(session), heart_beat=False,
    )
    httpd = serve_worker(worker, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = {
            "prompt": "what is <region1> ?",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "boxes": [[0.1, 0.1, 0.5, 0.6]],
            "max_new_tokens": 4,
            "temperature": 0.0,
        }
        r = requests.post(
            f"http://127.0.0.1:{port}/worker_generate_stream", json=req, stream=True, timeout=300
        )
        chunks = [json.loads(l) for l in r.iter_lines() if l]
        assert chunks, "no stream chunks"
        assert all(c["error_code"] == 0 for c in chunks)
        # chunks are growing prefixes of the final text
        texts = [c["text"] for c in chunks]
        for a, b in zip(texts, texts[1:]):
            assert b.startswith(a) or a == b
    finally:
        worker.shutdown()
        httpd.shutdown()


def test_worker_continuous_batching_concurrent_requests(rng):
    """Two concurrent HTTP requests share ONE continuous decode batch
    (VERDICT r2 item 3 worker integration): both stream correct growing
    text, both are in flight simultaneously, and the second request —
    fired while the first decodes — starts producing without waiting for
    the first to finish."""
    import time

    from PIL import Image

    from gpt4roi_tpu.serve.continuous import ContinuousEngine, make_continuous_stream_fn

    cfg = Gpt4RoiConfig.tiny(vocab_size=512)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=768, prefill_bucket=64))
    tok = ToyTokenizer(model_max_length=768)
    for name, tid in [
        ("<im_patch>", cfg.im_patch_token_id),
        ("<bbox>", cfg.bbox_token_id),
        ("<point>", cfg.point_token_id),
        ("<im_start>", cfg.im_start_token_id),
        ("<im_end>", cfg.im_end_token_id),
    ]:
        tok.vocab[name] = tid

    ce = ContinuousEngine(eng, n_slots=4, chunk_size=2)
    stream_fn = make_continuous_stream_fn(ce, tok, temperature=0.0, max_new_tokens=24)
    worker = ModelWorker(
        "http://127.0.0.1:1", "http://127.0.0.1:0", "tiny-cont",
        stream_fn, heart_beat=False,
    )
    httpd = serve_worker(worker, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        def fire(prompt, out, delay=0.0):
            time.sleep(delay)
            r = requests.post(
                f"http://127.0.0.1:{port}/worker_generate_stream",
                json={
                    "prompt": prompt,
                    "image_b64": b64,
                    "boxes": [[0.1, 0.1, 0.5, 0.6]],
                    "max_new_tokens": 24,
                    "temperature": 0.0,
                },
                stream=True, timeout=300,
            )
            for line in r.iter_lines():
                if line:
                    out.append((time.monotonic(), json.loads(line)))

        out1, out2 = [], []
        t1 = threading.Thread(target=fire, args=("what is <region1> ?", out1))
        t2 = threading.Thread(target=fire, args=("describe <region1>", out2, 0.2))
        t1.start()
        t2.start()
        t1.join(300)
        t2.join(300)
        assert out1 and out2
        assert all(c["error_code"] == 0 for _, c in out1 + out2)
        # request 2 streamed its first chunk BEFORE request 1 finished —
        # they shared the decode batch rather than serializing
        assert out2[0][0] < out1[-1][0], "request 2 waited for request 1"
        for outs in (out1, out2):
            texts = [c["text"] for _, c in outs]
            for a, b in zip(texts, texts[1:]):
                assert b.startswith(a) or a == b
    finally:
        ce.stop()
        worker.shutdown()
        httpd.shutdown()
