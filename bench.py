"""Benchmark: regions/sec/chip for the region-encode path (frozen CLIP
ViT-L/14 encode + SPI multi-level fuse + RoIAlign + projection) — the
north-star metric from BASELINE.json.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is a fixed analytic estimate for the same workload on one A100
with the PyTorch stack. Per 8-image batch with 32 regions each: ViT-L/14
forward ~1.3 TFLOP, the SPI fuse pyramid (5 rounds of 3x3 1024-ch convs on
128^2..16^2 maps) ~16.5 TFLOP, plus RoIAlign gathers. At ~50% tensor-core
utilisation (312 TFLOP/s fp16 peak) that is ~120 ms/batch ->
256 regions / 0.12 s ~= 2100 regions/s. ``vs_baseline`` = measured / 2100.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_REGIONS_PER_SEC = 2100.0

BATCH = 8
REGIONS = 32


def main() -> None:
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, encode_vision, init_gpt4roi_params
    from gpt4roi_tpu.models.llama import LlamaConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # full-size vision/SPI stack; LLaMA params are not materialised (encode
    # path only), so use a 1-layer stub for the config object
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=LlamaConfig(num_layers=1, vocab_size=32006),
    )
    key = jax.random.PRNGKey(0)
    import gpt4roi_tpu.models.clip_vit as cv
    import gpt4roi_tpu.models.spi as spi_mod

    params = {
        "clip": cv.init_clip_params(key, cfg.clip, dtype),
        "mm_projector": {
            "kernel": jnp.zeros((cfg.clip.hidden_size, 4096), dtype),
            "bias": jnp.zeros((4096,), dtype),
        },
        "spi": spi_mod.init_spi_params(key, cfg.spi, dtype),
    }

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((BATCH, 224, 224, 3), dtype=np.float32), dtype
    )
    wh = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.5
    xy = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((BATCH, REGIONS), bool)

    @jax.jit
    def encode(params, images, boxes, box_mask, salt):
        # `salt` chains iterations into a dependency sequence so pipelined
        # timing measures real device execution, not queue depth; the
        # scaling happens INSIDE jit so the loop dispatches exactly one
        # program per iteration (eager ops are expensive on RPC backends)
        salt = (salt * 1e-30).astype(images.dtype)
        img_feats, spi_feats = encode_vision(
            params, cfg, images + salt, boxes, box_mask, dtype
        )
        return (img_feats.sum() + spi_feats.sum()).astype(jnp.float32)

    # Timing methodology: enqueue a dependency chain of n_iters steps and
    # sync via an actual host transfer of the final scalar — on remote-tunnel
    # platforms block_until_ready can return before execution finishes, so
    # per-call blocking measures RPC latency, and only a value fetch is a
    # true barrier.
    salt = jnp.zeros((), jnp.float32)
    out = encode(params, images, boxes, box_mask, salt)
    float(np.asarray(out))  # compile+warm
    n_iters = 30 if on_tpu else 2
    t0 = time.perf_counter()
    out = salt
    for _ in range(n_iters):
        out = encode(params, images, boxes, box_mask, out)
    float(np.asarray(out))  # host fetch = real barrier
    dt = (time.perf_counter() - t0) / n_iters

    regions_per_sec = BATCH * REGIONS / dt
    print(
        json.dumps(
            {
                "metric": "spi_encode_regions_per_sec_per_chip",
                "value": round(regions_per_sec, 2),
                "unit": "regions/s",
                "vs_baseline": round(regions_per_sec / A100_REFERENCE_REGIONS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
