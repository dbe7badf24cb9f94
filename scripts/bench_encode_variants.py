"""Measure SPI encode variants on the attached TPU.

Variants: bf16 fp path, int8 dynamic (per-slice absmax), int8 static
(calibrated act scales — the round-3 lever for encode >= 2,100 regions/s,
see VERDICT round 2 item 1). Production bench shape: batch 8 x 32 regions,
full CLIP ViT-L/14 + SPI pipeline (same as bench.py::measure_encode).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--regions", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="bf16,dyn,static")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, encode_vision
    from gpt4roi_tpu.models.llama import LlamaConfig
    import gpt4roi_tpu.models.clip_vit as cv
    import gpt4roi_tpu.models.spi as spi_mod

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base_cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=LlamaConfig(num_layers=1, vocab_size=32006),
    )
    key = jax.random.PRNGKey(0)
    params = {
        "clip": cv.init_clip_params(key, base_cfg.clip, dtype),
        "mm_projector": {
            "kernel": jnp.zeros((base_cfg.clip.hidden_size, 4096), dtype),
            "bias": jnp.zeros((4096,), dtype),
        },
        "spi": spi_mod.init_spi_params(key, base_cfg.spi, dtype),
    }
    rng = np.random.default_rng(0)
    B, R = args.batch, args.regions
    images = jnp.asarray(rng.standard_normal((B, 224, 224, 3), dtype=np.float32), dtype)
    wh = rng.random((B, R, 2), dtype=np.float32) * 0.5
    xy = rng.random((B, R, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((B, R), bool)

    def run(cfg, params):
        @jax.jit
        def encode(params, images, boxes, box_mask, salt):
            salt = (salt * 1e-30).astype(images.dtype)
            img_feats, spi_feats = encode_vision(params, cfg, images + salt, boxes, box_mask, dtype)
            return (img_feats.sum() + spi_feats.sum()).astype(jnp.float32)

        salt = jnp.zeros((), jnp.float32)
        out = encode(params, images, boxes, box_mask, salt)
        float(np.asarray(out))
        n = args.iters if on_tpu else 2
        t0 = time.perf_counter()
        out = salt
        for _ in range(n):
            out = encode(params, images, boxes, box_mask, out)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / n
        return B * R / dt, dt * 1e3

    variants = args.variants.split(",")
    if "nofuse" in variants:
        # ablation probe: everything except the fuse shuffle rounds
        cfg0 = dataclasses.replace(base_cfg, spi=dataclasses.replace(base_cfg.spi, num_fuse=0))
        p0 = dict(params)
        p0["spi"] = dict(params["spi"])
        p0["spi"]["fuse_convs"] = []
        rs, ms = run(cfg0, p0)
        print(f"nofuse: {rs:8.1f} regions/s  ({ms:.1f} ms/batch)", flush=True)
    if "bf16" in variants:
        rs, ms = run(base_cfg, params)
        print(f"bf16:   {rs:8.1f} regions/s  ({ms:.1f} ms/batch)", flush=True)
    cfg8 = dataclasses.replace(base_cfg, spi=dataclasses.replace(base_cfg.spi, fuse_int8=True))
    if "dyn" in variants:
        rs, ms = run(cfg8, params)
        print(f"dyn:    {rs:8.1f} regions/s  ({ms:.1f} ms/batch)", flush=True)
    if "static_nogn" in variants:
        # timing-only probe: GroupNorm replaced by identity to isolate the
        # GN stats+apply passes' share of the fuse rounds (numerics WRONG)
        orig_gn = spi_mod.group_norm
        spi_mod.group_norm = lambda x, scale, bias, g: x
        try:
            p2 = dict(params)
            p2["spi"] = dict(params["spi"])
            p2["spi"]["fuse_act_scales"] = jnp.ones(
                (base_cfg.spi.num_fuse, base_cfg.spi.num_levels), jnp.float32
            )
            rs, ms = run(cfg8, p2)
            print(f"static_nogn(PROBE): {rs:8.1f} regions/s  ({ms:.1f} ms/batch)", flush=True)
        finally:
            spi_mod.group_norm = orig_gn
    if "static" in variants:
        # calibrate on a different random batch (honest static-scale serving)
        cal_images = jnp.asarray(rng.standard_normal((B, 224, 224, 3), dtype=np.float32), dtype)

        @jax.jit
        def calibrate(params, images, boxes, box_mask):
            from gpt4roi_tpu.models.gpt4roi import select_image_and_pyramid_features
            from gpt4roi_tpu.models.clip_vit import clip_vision_forward

            _, hs = clip_vision_forward(params["clip"], images, cfg8.clip, dtype)
            _, pyramid = select_image_and_pyramid_features(
                hs, cfg8.vision_select_layer, cfg8.num_pyramid_levels
            )
            return spi_mod.calibrate_spi_act_scales(
                params["spi"], pyramid, boxes, box_mask, cfg8.spi
            )

        scales = calibrate(params, cal_images, boxes, box_mask)
        jax.tree_util.tree_map(np.asarray, scales)
        p2 = dict(params)
        p2["spi"] = dict(params["spi"])
        p2["spi"].update(scales)
        p2["spi"] = spi_mod.prequantize_spi_kernels(p2["spi"])
        rs, ms = run(cfg8, p2)
        print(f"static: {rs:8.1f} regions/s  ({ms:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
