"""Component-level timing of the SPI encode path on the attached TPU.

Times each stage as its own chained-jit loop (salt dependency + single host
fetch barrier — see bench.py for the methodology rationale).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
REGIONS = 32


def timeit(fn, args, n=20, label=""):
    out = fn(*args, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import argparse
    import dataclasses

    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig, init_clip_params, clip_vision_forward
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, encode_vision, select_image_and_pyramid_features
    from gpt4roi_tpu.models.llama import LlamaConfig
    import gpt4roi_tpu.models.spi as spi_mod
    from gpt4roi_tpu.ops.interp import interpolate_bilinear

    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="profile the static-calibrated W8A8 serving path")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=LlamaConfig(num_layers=1, vocab_size=32006),
    )
    if args.int8:
        cfg = dataclasses.replace(cfg, spi=dataclasses.replace(cfg.spi, fuse_int8=True))
    key = jax.random.PRNGKey(0)
    params = {
        "clip": init_clip_params(key, cfg.clip, dtype),
        "mm_projector": {
            "kernel": jnp.zeros((cfg.clip.hidden_size, 4096), dtype),
            "bias": jnp.zeros((4096,), dtype),
        },
        "spi": spi_mod.init_spi_params(key, cfg.spi, dtype),
    }
    scfg = cfg.spi

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3), dtype=np.float32), dtype)
    wh = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.5
    xy = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((BATCH, REGIONS), bool)

    if args.int8:
        cal_images = jnp.asarray(
            rng.standard_normal((BATCH, 224, 224, 3), dtype=np.float32), dtype
        )

        @jax.jit
        def calibrate(params, images, boxes, box_mask):
            _, hs = clip_vision_forward(params["clip"], images, cfg.clip, dtype)
            _, pyr = select_image_and_pyramid_features(
                hs, cfg.vision_select_layer, cfg.num_pyramid_levels
            )
            return spi_mod.calibrate_spi_act_scales(params["spi"], pyr, boxes, box_mask, cfg.spi)

        scales = calibrate(params, cal_images, boxes, box_mask)
        jax.tree_util.tree_map(np.asarray, scales)
        params = dict(params)
        params["spi"] = dict(params["spi"])
        params["spi"].update(scales)
        params["spi"] = spi_mod.prequantize_spi_kernels(params["spi"])

    # ---- full path
    @jax.jit
    def full(params, images, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(images.dtype)
        a, b = encode_vision(params, cfg, images + salt, boxes, box_mask, dtype)
        return (a.sum() + b.sum()).astype(jnp.float32)

    dt_full = timeit(full, (params, images, boxes, box_mask), label="full encode")

    # ---- ViT only
    @jax.jit
    def vit(params, images, salt):
        salt = (salt * 1e-30).astype(images.dtype)
        _, hs = clip_vision_forward(params["clip"], images + salt, cfg.clip, dtype)
        return (hs[-2].sum()).astype(jnp.float32)

    timeit(vit, (params, images), label="CLIP ViT (all hidden states)")

    # precompute pyramid inputs
    _, hs = clip_vision_forward(params["clip"], images, cfg.clip, dtype)
    _, pyramid = select_image_and_pyramid_features(hs, cfg.vision_select_layer, cfg.num_pyramid_levels)
    pyramid = [jnp.asarray(p) for p in pyramid]

    # ---- upsample to level sizes
    @jax.jit
    def upsample(pyramid, salt):
        salt = (salt * 1e-30).astype(pyramid[0].dtype)
        feats = [p.reshape(BATCH, scfg.base_grid, scfg.base_grid, scfg.embed_dims) + salt for p in pyramid]
        feats = [interpolate_bilinear(f, (s, s), align_corners=True) for f, s in zip(feats, scfg.level_sizes)]
        return sum(f.sum() for f in feats).astype(jnp.float32)

    timeit(upsample, (pyramid,), label="upsample 16->[128,64,32,16]")

    # ---- fuse pyramid (upsample + input conv + 5 rounds)
    @jax.jit
    def fuse(params, pyramid, salt):
        salt = (salt * 1e-30).astype(pyramid[0].dtype)
        feats = [p.reshape(BATCH, scfg.base_grid, scfg.base_grid, scfg.embed_dims) + salt for p in pyramid]
        feats = [interpolate_bilinear(f, (s, s), align_corners=True) for f, s in zip(feats, scfg.level_sizes)]
        feats = spi_mod.mlvl_fuse(params["spi"], feats, scfg)
        return sum(f.sum() for f in feats).astype(jnp.float32)

    timeit(fuse, (params, pyramid), label="upsample + input conv + 5 fuse")

    # fused feature maps for roi stages
    feats = [p.reshape(BATCH, scfg.base_grid, scfg.base_grid, scfg.embed_dims) for p in pyramid]
    feats = [interpolate_bilinear(f, (s, s), align_corners=True) for f, s in zip(feats, scfg.level_sizes)]
    feats = spi_mod.mlvl_fuse(params["spi"], feats, scfg)
    feats = [jnp.asarray(f) for f in feats]

    # ---- RoIAlign only (4 levels)
    @jax.jit
    def roi_only(feats, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(feats[0].dtype)
        scaled = boxes.astype(jnp.float32) * scfg.image_size
        tot = jnp.zeros((), jnp.float32)
        for lvl in range(scfg.num_levels):
            rf = spi_mod._roi_align(
                feats[lvl] + salt, scaled, box_mask,
                scfg.roi_output_size, 1.0 / scfg.strides[lvl], scfg.sampling_ratio,
            )
            tot = tot + rf.sum().astype(jnp.float32)
        return tot

    timeit(roi_only, (feats, boxes, box_mask), label="RoIAlign x4 levels")

    # ---- RoI heads: roi_align + pconvs + flatten + pos + updims
    @jax.jit
    def heads(params, feats, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(feats[0].dtype)
        out = spi_mod.spi_roi_heads(params["spi"], [f + salt for f in feats], boxes, box_mask, scfg) \
            if hasattr(spi_mod, "spi_roi_heads") else None
        if out is None:
            b, r = boxes.shape[0], boxes.shape[1]
            flat_boxes = boxes.reshape(b * r, 4).astype(jnp.float32)
            pos = spi_mod.box_position_embedding(params["spi"], flat_boxes)
            scaled = boxes.astype(jnp.float32) * scfg.image_size
            acc = None
            for lvl in range(scfg.num_levels):
                rf = spi_mod._roi_align(
                    feats[lvl] + salt, scaled, box_mask,
                    scfg.roi_output_size, 1.0 / scfg.strides[lvl], scfg.sampling_ratio,
                )
                rf = rf.reshape(b * r, scfg.roi_output_size, scfg.roi_output_size, scfg.embed_dims)
                rf = rf.astype(feats[lvl].dtype)
                y = spi_mod._conv(params["spi"]["pconvs"][lvl], rf)
                acc = y if acc is None else acc + y
            fused = jax.nn.relu(acc)
            fused = fused.transpose(0, 3, 1, 2).reshape(b * r, -1)
            out = spi_mod._dense(params["spi"]["flatten_linear"], fused)
            out = out + pos.astype(out.dtype)
            out = spi_mod._dense(params["spi"]["updims"], out)
        return out.sum().astype(jnp.float32)

    timeit(heads, (params, feats, boxes, box_mask), label="RoI heads (align+pconv+proj)")

    print(f"\nregions/s (full): {BATCH * REGIONS / dt_full:.1f}")


if __name__ == "__main__":
    main()
