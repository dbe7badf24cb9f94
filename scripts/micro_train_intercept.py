"""Break down the train-step INTERCEPT (the non-per-layer cost).

bench_train.py's two-depth extrapolation measures a ~310 ms intercept at
stage-2 shape (b2 s2048 r16). This times its components in isolation so
optimisation effort goes where the milliseconds are: CLIP fwd (frozen),
SPI fwd+bwd, lm_head + shifted-CE fwd+bwd, and the embed/bbox splice.
Chained-jit timing (salt + one host fetch; axon tunnel ignores
block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, R = 2, 2048, 16


def timeit(fn, args, n=10, label=""):
    out = fn(*args, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig, clip_vision_forward
    from gpt4roi_tpu.models.gpt4roi import (
        Gpt4RoiConfig,
        encode_vision,
        init_gpt4roi_params,
        shifted_cross_entropy,
    )
    from gpt4roi_tpu.models.llama import LlamaConfig

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import dataclasses

    dtype = jnp.bfloat16
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=1),
    )
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg, dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, 224, 224, 3), dtype=np.float32), dtype)
    wh = rng.random((B, R, 2), dtype=np.float32) * 0.5
    xy = rng.random((B, R, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((B, R), bool)
    labels = jnp.asarray(rng.integers(5, 31000, (B, S)).astype(np.int32))
    hidden = jnp.asarray(rng.standard_normal((B, S, 4096), dtype=np.float32), dtype)

    # ---- CLIP fwd only (frozen in every stage)
    @jax.jit
    def clip_fwd(params, images, salt):
        salt = (salt * 1e-30).astype(images.dtype)
        _, hs = clip_vision_forward(params["clip"], images + salt, cfg.clip, dtype)
        return hs[-2].sum().astype(jnp.float32)

    timeit(clip_fwd, (params, images), label="CLIP fwd (frozen)")

    # ---- SPI (+CLIP fwd) fwd+bwd — grads w.r.t. spi params like stage 2
    @jax.jit
    def vision_fwdbwd(params, images, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(images.dtype)

        def loss(spi_p):
            p = dict(params)
            p["spi"] = spi_p
            img, spi = encode_vision(p, cfg, images + salt, boxes, box_mask, dtype)
            return (img.astype(jnp.float32).sum() + spi.astype(jnp.float32).sum())

        l, g = jax.value_and_grad(loss)(params["spi"])
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    timeit(vision_fwdbwd, (params, images, boxes, box_mask), label="CLIP fwd + SPI fwd+bwd")

    # ---- SPI fuse pyramid only, fwd+bwd
    import gpt4roi_tpu.models.spi as spi_mod
    from gpt4roi_tpu.models.gpt4roi import select_image_and_pyramid_features

    scfg = cfg.spi
    _, hs = clip_vision_forward(params["clip"], images, cfg.clip, dtype)
    _, pyramid = select_image_and_pyramid_features(
        hs, cfg.vision_select_layer, cfg.num_pyramid_levels
    )
    pyramid = [jnp.asarray(p) for p in pyramid]
    from gpt4roi_tpu.ops.interp import interpolate_bilinear

    @jax.jit
    def fuse_fwdbwd(spi_p, pyramid, salt):
        salt = (salt * 1e-30).astype(pyramid[0].dtype)

        def loss(spi_p):
            feats = [
                p.reshape(B, scfg.base_grid, scfg.base_grid, scfg.embed_dims) + salt
                for p in pyramid
            ]
            feats = [
                interpolate_bilinear(f, (s, s), align_corners=True)
                for f, s in zip(feats, scfg.level_sizes)
            ]
            feats = spi_mod.mlvl_fuse(spi_p, feats, scfg)
            return sum(f.astype(jnp.float32).sum() for f in feats)

        l, g = jax.value_and_grad(loss)(spi_p)
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    timeit(fuse_fwdbwd, (params["spi"], pyramid), label="fuse pyramid fwd+bwd")

    # ---- SPI-bwd attribution (VERDICT r3 item 7): isolate the fuse
    # pyramid's backward components — fwd-only, no-GN, no-cross-level-interp
    # variants subtract out each suspect's fwd+bwd share.
    @jax.jit
    def fuse_fwd_only(spi_p, pyramid, salt):
        salt = (salt * 1e-30).astype(pyramid[0].dtype)
        feats = [
            p.reshape(B, scfg.base_grid, scfg.base_grid, scfg.embed_dims) + salt
            for p in pyramid
        ]
        feats = [
            interpolate_bilinear(f, (s, s), align_corners=True)
            for f, s in zip(feats, scfg.level_sizes)
        ]
        feats = spi_mod.mlvl_fuse(spi_p, feats, scfg)
        return sum(f.astype(jnp.float32).sum() for f in feats)

    timeit(fuse_fwd_only, (params["spi"], pyramid), label="fuse pyramid fwd ONLY")

    from gpt4roi_tpu.ops.norms import group_norm as _gn

    feats0 = [
        interpolate_bilinear(
            p.reshape(B, scfg.base_grid, scfg.base_grid, scfg.embed_dims), (s, s),
            align_corners=True,
        )
        for p, s in zip(pyramid, scfg.level_sizes)
    ]
    feats0 = [jnp.asarray(f) for f in feats0]

    def _rounds_fwdbwd(label, use_gn, use_interp):
        rc, sc_ = scfg.remain_channels, scfg.shuffle_channels
        n = scfg.num_levels

        @jax.jit
        def run(spi_p, feats, salt):
            salt = (salt * 1e-30).astype(feats[0].dtype)

            def loss(spi_p):
                levels = [f + salt for f in feats]
                for fuse_p in spi_p["fuse_convs"]:
                    kern = fuse_p["conv"]["kernel"]
                    k_rem = kern[:, :, :rc, :]
                    k_top = kern[:, :, rc : rc + sc_, :]
                    k_down = kern[:, :, rc + sc_ :, :]
                    new_levels = []
                    for lvl in range(n):
                        top = min(lvl + 1, n - 1)
                        down = max(lvl - 1, 0)
                        tar = levels[lvl]
                        hw = (tar.shape[1], tar.shape[2])
                        if use_interp:
                            ft = interpolate_bilinear(
                                levels[top][..., rc + sc_ :], hw, align_corners=True)
                            fd = interpolate_bilinear(
                                levels[down][..., rc : rc + sc_], hw, align_corners=True)
                        else:
                            # same FLOPs, no resize: reuse the target's own slices
                            ft = tar[..., rc + sc_ :]
                            fd = tar[..., rc : rc + sc_]
                        y = (
                            spi_mod._conv_kernel(k_rem, tar[..., :rc])
                            + spi_mod._conv_kernel(k_top, ft)
                            + spi_mod._conv_kernel(k_down, fd)
                        )
                        if use_gn:
                            y = _gn(y, fuse_p["gn"]["scale"], fuse_p["gn"]["bias"], scfg.gn_groups)
                        new_levels.append(jax.nn.relu(y))
                    levels = new_levels
                return sum(f.astype(jnp.float32).sum() for f in levels)

            l, g = jax.value_and_grad(loss)(spi_p)
            return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

        timeit(run, (params["spi"], feats0), label=label)

    _rounds_fwdbwd("fuse ROUNDS fwd+bwd (control)", True, True)
    _rounds_fwdbwd("fuse rounds, NO GroupNorm", False, True)
    _rounds_fwdbwd("fuse rounds, NO cross-level interp", True, False)

    # ---- RoIAlign alone fwd+bwd (no pconvs/flatten)
    @jax.jit
    def roi_only(feats, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(feats[0].dtype)

        def loss(feats):
            scaled = boxes.astype(jnp.float32) * scfg.image_size
            acc = 0.0
            for lvl in range(scfg.num_levels):
                rf = spi_mod._roi_align(
                    feats[lvl] + salt, scaled, box_mask,
                    scfg.roi_output_size, 1.0 / scfg.strides[lvl], scfg.sampling_ratio,
                )
                acc = acc + rf.astype(jnp.float32).sum()
            return acc

        l, g = jax.value_and_grad(loss)(feats)
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    timeit(roi_only, (feats0, boxes, box_mask), label="RoIAlign x4 levels fwd+bwd")

    # ---- RoI heads only (align + pconvs + flatten + updims), fwd+bwd
    @jax.jit
    def heads_fwdbwd(spi_p, feats, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(feats[0].dtype)

        def loss(spi_p):
            out = spi_mod.spi_forward_heads_only(spi_p, feats, boxes, box_mask, scfg, salt) \
                if hasattr(spi_mod, "spi_forward_heads_only") else None
            if out is None:
                flat_boxes = boxes.reshape(B * R, 4).astype(jnp.float32)
                pos = spi_mod.box_position_embedding(spi_p, flat_boxes)
                scaled = boxes.astype(jnp.float32) * scfg.image_size
                acc = None
                for lvl in range(scfg.num_levels):
                    rf = spi_mod._roi_align(
                        feats[lvl] + salt, scaled, box_mask,
                        scfg.roi_output_size, 1.0 / scfg.strides[lvl], scfg.sampling_ratio,
                    )
                    rf = rf.reshape(B * R, scfg.roi_output_size, scfg.roi_output_size, scfg.embed_dims)
                    rf = rf.astype(feats[lvl].dtype)
                    y = spi_mod._conv(spi_p["pconvs"][lvl], rf)
                    acc = y if acc is None else acc + y
                fused = jax.nn.relu(acc)
                fused = fused.transpose(0, 3, 1, 2).reshape(B * R, -1)
                out = spi_mod._dense(spi_p["flatten_linear"], fused)
                out = out + pos.astype(out.dtype)
                out = spi_mod._dense(spi_p["updims"], out)
            return out.astype(jnp.float32).sum()

        l, g = jax.value_and_grad(loss)(spi_p)
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    timeit(heads_fwdbwd, (params["spi"], feats0, boxes, box_mask), label="RoI heads fwd+bwd")

    # ---- lm_head + shifted CE fwd+bwd (grads w.r.t. head and hidden)
    @jax.jit
    def head_ce_fwdbwd(params, hidden, labels, salt):
        salt = (salt * 1e-30).astype(hidden.dtype)

        def loss(args):
            h, w = args
            logits = (h + salt) @ w
            return shifted_cross_entropy(logits, labels)

        l, g = jax.value_and_grad(loss)((hidden, params["llama"]["lm_head"]["kernel"]))
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    timeit(head_ce_fwdbwd, (params, hidden, labels), label="lm_head + shifted-CE fwd+bwd")


if __name__ == "__main__":
    main()
