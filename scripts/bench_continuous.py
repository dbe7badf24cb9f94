"""Continuous-batching serving benchmark at 7B scale (VERDICT r2 item 3).

Staggered arrivals: 8 requests are live at t=0, 8 more are injected
between decode chunks while earlier requests are mid-flight. Each request
runs the FULL production path (vision encode + batch-1 prefill admitted at
a chunk boundary + shared batched decode). Done-criterion: end-to-end
tokens/s within ~20% of the static-batch Engine.generate_ragged number
(474 tok/s e2e, scripts/bench_engine_serving.py) — the reference worker
serves one request per generate call and cannot overlap any of this
(llava/serve/model_worker.py:168-260).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig
from gpt4roi_tpu.models.llama import LlamaConfig
from bench_engine_serving import build_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--max_new", type=int, default=128)
    p.add_argument("--prefill_bucket", type=int, default=512)
    p.add_argument("--chunk", type=int, default=64)
    args = p.parse_args()

    from gpt4roi_tpu.serve.continuous import ContinuousEngine
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers),
    )
    cfg = dataclasses.replace(cfg, spi=dataclasses.replace(cfg.spi, fuse_int8=True))
    params = build_params(cfg, dtype)
    eng = Engine(
        params, cfg,
        EngineConfig(
            max_seq_len=args.prefill_bucket + args.max_new,
            prefill_bucket=args.prefill_bucket,
            compute_dtype=dtype,
        ),
    )
    ce = ContinuousEngine(eng, n_slots=args.slots, chunk_size=args.chunk)

    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens

    def make_req(i):
        ids = [1] + list(rng.integers(5, 31000, 8 + (i % 8)))
        ids += [cfg.im_start_token_id] + [cfg.im_patch_token_id] * n_img + [cfg.im_end_token_id]
        ids += list(rng.integers(5, 31000, 12)) + [cfg.bbox_token_id]
        images = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
        boxes = np.clip(rng.random((1, 4, 4), np.float32), 0.05, 0.6)
        boxes[..., 2:] = np.clip(boxes[..., :2] + 0.3, None, 0.95)
        return ids, images, boxes, np.ones((1, 4), bool)

    reqs = [make_req(i) for i in range(args.requests)]

    def run_pass():
        handles = []
        t0 = time.perf_counter()
        # 8 live at t=0
        for i in range(min(args.slots, len(reqs))):
            ids, img, bx, m = reqs[i]
            handles.append(ce.submit(ids, img, bx, m, max_new_tokens=args.max_new))
        nxt = len(handles)
        steps = 0
        while not all(h.done.is_set() for h in handles) or nxt < len(reqs):
            # inject the rest mid-decode, one every other chunk
            if nxt < len(reqs) and steps % 2 == 1:
                ids, img, bx, m = reqs[nxt]
                handles.append(ce.submit(ids, img, bx, m, max_new_tokens=args.max_new))
                nxt += 1
            ce.step()
            steps += 1
        dt = time.perf_counter() - t0
        ntok = sum(len(h.tokens) for h in handles)
        return dt, ntok, steps

    dt_warm, ntok, _ = run_pass()  # compiles
    print(f"warm-up: {ntok} tokens in {dt_warm:.1f}s", flush=True)
    dt, ntok, steps = run_pass()
    print(
        f"continuous serving {args.layers}L int8 slots={args.slots} "
        f"({args.requests} staggered requests x {args.max_new} tok): "
        f"{ntok} tokens in {dt:.2f}s -> {ntok/dt:.1f} tok/s end-to-end "
        f"({steps} chunks, incl. per-request vision encode + prefill)"
    )


if __name__ == "__main__":
    main()
