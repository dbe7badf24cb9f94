"""Chunked-prefill admission latency at 7B scale (VERDICT r3 item 10).

Scenario: ``--slots``-1 short-prompt requests are decoding at steady
state; ONE long prompt (~``--long`` tokens + 256 image tokens) is then
admitted. Measured, per admission policy:

  - decode stall: the longest wall-clock gap between decode chunks that
    the RUNNING requests experience during the admission window (the
    monolithic policy runs the whole long prefill inside one step);
  - TTFT: submit -> first token of the long request;
  - victim tokens: decode tokens delivered to the running requests
    during the long request's admission window.

The reference worker cannot overlap any of this: one generate() call
owns the model end-to-end (llava/serve/model_worker.py:168-260), so a
long prompt stalls every queued request for its full prefill + decode.
Methodology: each ce.step() ends in a host fetch (np.asarray on the
sampled tokens), so per-step wall times are real device times plus the
constant RPC dispatch overhead of this tunnel — identical across
policies, cancelling in the comparison.
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


def make_req(cfg, rng, extra: int):
    n_img = cfg.num_image_tokens
    ids = [1] + list(rng.integers(5, 31000, extra))
    ids += [cfg.im_start_token_id] + [cfg.im_patch_token_id] * n_img + [cfg.im_end_token_id]
    ids += list(rng.integers(5, 31000, 12)) + [cfg.bbox_token_id]
    images = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    boxes = np.clip(rng.random((1, 4, 4), np.float32), 0.05, 0.6)
    boxes[..., 2:] = np.clip(boxes[..., :2] + 0.3, None, 0.95)
    return ids, images, boxes, np.ones((1, 4), bool)


def run_policy(eng, cfg, args, prefill_chunk):
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    ce = ContinuousEngine(
        eng, n_slots=args.slots, chunk_size=args.chunk, prefill_chunk=prefill_chunk
    )
    rng = np.random.default_rng(0)
    victims = []
    for _ in range(args.slots - 1):
        ids, img, bx, m = make_req(cfg, rng, rng.integers(8, 24))
        victims.append(ce.submit(ids, img, bx, m, max_new_tokens=4096))
    # steady state + compile warm-up for every program on the measured
    # path, INCLUDING the long-prompt admission shape (first compile of a
    # 1536-token prefill is minutes; warm runs hit .jax_cache)
    for _ in range(4):
        ce.step()
    ids, img, bx, m = make_req(cfg, rng, args.long)
    warm = ce.submit(ids, img, bx, m, max_new_tokens=2)
    while not warm.done.is_set():
        ce.step()

    n_before = sum(len(h.tokens) for h in victims)
    t0 = time.perf_counter()
    ids, img, bx, m = long_req
    h = ce.submit(ids, img, bx, m, max_new_tokens=8)
    gaps, ttft = [], None
    while ttft is None:
        t1 = time.perf_counter()
        ce.step()
        gaps.append(time.perf_counter() - t1)
        if h.tokens:
            ttft = time.perf_counter() - t0
    victim_toks = sum(len(h2.tokens) for h2 in victims) - n_before
    for v in victims:
        v.cancel()
    ce.run_until_idle()
    return {
        "stall_ms": round(1e3 * max(gaps), 1),
        "ttft_ms": round(1e3 * ttft, 1),
        "victim_toks": int(victim_toks),
        "admit_steps": len(gaps),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--long", type=int, default=1024, help="extra prompt tokens")
    p.add_argument("--chunk", type=int, default=32, help="decode chunk")
    p.add_argument("--prefill_bucket", type=int, default=512)
    p.add_argument("--chunks", default="0,512,256",
                   help="comma list of prefill_chunk sizes; 0 = monolithic")
    args = p.parse_args()

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
            max_seq_len=2048 + 128,
            prefill_bucket=args.prefill_bucket,
            compute_dtype=dtype,
        ),
    )
    print(f"backend={jax.default_backend()} layers={args.layers} "
          f"long={args.long}+{cfg.num_image_tokens}img slots={args.slots}", flush=True)
    for c in [int(x) for x in args.chunks.split(",")]:
        r = run_policy(eng, cfg, args, c or None)
        label = "monolithic" if c == 0 else f"chunked({c})"
        print(f"{label:16s} stall {r['stall_ms']:8.1f} ms  ttft {r['ttft_ms']:8.1f} ms  "
              f"victim_toks {r['victim_toks']:4d}  steps {r['admit_steps']}", flush=True)


if __name__ == "__main__":
    main()
