"""Full-stack serving benchmark through the REAL Engine API at 7B scale:
CLIP ViT-L/14 encode + SPI + ragged prefill + batched int8 decode.

Unlike bench_serve_decode.py (decode kernel only), this walks the exact
production path a worker uses: Engine.generate_ragged with images, boxes
and variable-length prompts. Params are constructed DIRECTLY in the
quantized serving layout (building bf16 7B then quantizing would
transiently need ~20 GB — over one v5e's HBM).

Memory plan (16 GB): int8 decoder ~7 GB + bf16 embed 0.26 GB + CLIP/SPI
bf16 ~1.4 GB + KV cache (batch 8, 512+128 rows) ~5.4 GB + activations.

Prints tokens/s over the decode phase and end-to-end request latency.
"""

import argparse
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
from gpt4roi_tpu.ops.quant import QuantDense


def build_params(cfg: Gpt4RoiConfig, dtype=jnp.bfloat16):
    import gpt4roi_tpu.models.clip_vit as cv
    import gpt4roi_tpu.models.spi as spi_mod

    lcfg = cfg.llama
    d, m, v = lcfg.hidden_size, lcfg.intermediate_size, lcfg.vocab_size
    kvd = lcfg.kv_heads * lcfg.head_dim

    L = lcfg.num_layers

    # build DIRECTLY in the stacked serving layout: letting the Engine
    # stack a per-layer list would transiently hold two full decoder
    # copies (~13 GB at 7B) and OOM the chip
    def qstack(k, i, o):
        op = -(-o // 256) * 256
        q = jax.random.randint(k, (L, i, op), -127, 128, jnp.int8)
        scale = jnp.full((L, 1, op), (i ** -0.5) / 127.0, jnp.float32)
        return QuantDense(q, scale, o, mode="w8a8")

    def qdense(k, i, o):
        op = -(-o // 256) * 256
        q = jax.random.randint(k, (i, op), -127, 128, jnp.int8)
        scale = jnp.full((1, op), (i ** -0.5) / 127.0, jnp.float32)
        return QuantDense(q, scale, o, mode="w8a8")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    llama = {
        "embed": {"embedding": jax.random.normal(ks[0], (v, d), dtype) * 0.02},
        "layers_stacked": {
            "attn_norm": {"scale": jnp.ones((L, d), dtype)},
            "qkv": qstack(ks[4], d, d + 2 * kvd),
            "o": qstack(ks[5], d, d),
            "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
            "gate_up": qstack(ks[6], d, 2 * m),
            "down": qstack(ks[7], m, d),
        },
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": qdense(ks[1], d, v),
    }
    return {
        "clip": cv.init_clip_params(ks[2], cfg.clip, dtype),
        "mm_projector": {
            "kernel": jax.random.normal(ks[3], (cfg.clip.hidden_size, d), dtype) * 0.01,
            "bias": jnp.zeros((d,), dtype),
        },
        "spi": spi_mod.init_spi_params(ks[2], cfg.spi, dtype),
        "llama": llama,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--max_new", type=int, default=128)
    p.add_argument("--prefill_bucket", type=int, default=512)
    args = p.parse_args()

    import dataclasses

    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers),
    )
    # int8 fuse encode fast path (matches EngineConfig(quantize='int8'))
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

    b = args.batch
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    prompts = []
    for i in range(b):
        ids = [1] + list(rng.integers(5, 31000, 8 + i))
        ids += [cfg.im_start_token_id] + [cfg.im_patch_token_id] * n_img + [cfg.im_end_token_id]
        ids += list(rng.integers(5, 31000, 12)) + [cfg.bbox_token_id]
        prompts.append(ids)
    images = rng.standard_normal((b, 224, 224, 3)).astype(np.float32)
    boxes = np.clip(rng.random((b, 4, 4), np.float32), 0.05, 0.6)
    boxes[..., 2:] = np.clip(boxes[..., :2] + 0.3, None, 0.95)
    mask = np.ones((b, 4), bool)

    def one_request(seed):
        t0 = time.perf_counter()
        out = eng.generate_ragged(
            prompts, images, boxes, mask,
            max_new_tokens=args.max_new, temperature=0.0, seed=seed,
            chunk_size=64,
        )
        dt = time.perf_counter() - t0
        ntok = sum(len(o) for o in out)
        return dt, ntok

    dt_warm, _ = one_request(0)  # compiles
    dt, ntok = one_request(1)
    print(
        f"engine serving {args.layers}L int8 batch={b}: {ntok} tokens in "
        f"{dt:.2f}s -> {ntok/dt:.1f} tok/s end-to-end "
        f"(incl. vision encode + prefill; warm-up {dt_warm:.1f}s)"
    )


if __name__ == "__main__":
    main()
