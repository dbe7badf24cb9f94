"""Per-component timing breakdown of the SPI encode path on the attached TPU.

Uses the dependency-chain methodology from bench.py (block_until_ready does
not block over the axon RPC tunnel; only a host fetch is a barrier).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.models.clip_vit import ClipVisionConfig, clip_vision_forward, init_clip_params
from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, select_image_and_pyramid_features
from gpt4roi_tpu.models.llama import LlamaConfig
import gpt4roi_tpu.models.spi as spi_mod
from gpt4roi_tpu.ops.interp import interpolate_bilinear

BATCH = 8
REGIONS = 32


def chain_time(fn, args, n_iters=20):
    """fn(salt, *args) -> scalar fp32; chains salt through iterations."""
    jfn = jax.jit(fn)
    salt = jnp.zeros((), jnp.float32)
    out = jfn(salt, *args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = salt
    for _ in range(n_iters):
        out = jfn(out, *args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / n_iters


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=LlamaConfig(num_layers=1, vocab_size=32006),
    )
    scfg = cfg.spi
    key = jax.random.PRNGKey(0)
    clip_params = init_clip_params(key, cfg.clip, dtype)
    spi_params = spi_mod.init_spi_params(key, scfg, dtype)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3), np.float32), dtype)
    wh = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.5
    xy = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((BATCH, REGIONS), bool)

    # precompute pyramid token maps + upsampled/fused feature maps on device
    def make_pyramid(cp, images):
        _, hs = clip_vision_forward(cp, images, cfg.clip, dtype)
        _, pyr = select_image_and_pyramid_features(hs, cfg.vision_select_layer, cfg.num_pyramid_levels)
        return pyr

    pyramid = jax.jit(make_pyramid)(clip_params, images)
    b = BATCH
    g = scfg.base_grid
    c = scfg.embed_dims
    maps = [p.reshape(b, g, g, c) for p in pyramid]
    up = jax.jit(
        lambda ms: [
            interpolate_bilinear(f, (s, s), align_corners=True)
            for f, s in zip(ms, scfg.level_sizes)
        ]
    )(maps)
    fused = jax.jit(spi_mod.mlvl_fuse, static_argnums=(2,))(spi_params, up, scfg)
    fused = [jnp.asarray(np.asarray(f), dtype) for f in fused]

    # 1. CLIP forward
    t = chain_time(
        lambda s, cp, im: sum(
            p.sum() for p in make_pyramid(cp, im + (s * 1e-30).astype(im.dtype))
        ).astype(jnp.float32),
        (clip_params, images),
    )
    print(f"clip_fwd            {t*1e3:8.2f} ms")

    # 2. upsample pyramid
    t = chain_time(
        lambda s, ms: sum(
            u.sum()
            for u in [
                interpolate_bilinear(f + (s * 1e-30).astype(f.dtype), (sz, sz), align_corners=True)
                for f, sz in zip(ms, scfg.level_sizes)
            ]
        ).astype(jnp.float32),
        (maps,),
    )
    print(f"upsample            {t*1e3:8.2f} ms")

    # 3. fuse pyramid (input convs + 5 shuffle rounds)
    t = chain_time(
        lambda s, sp, u: sum(
            f.sum()
            for f in spi_mod.mlvl_fuse(
                sp, [x + (s * 1e-30).astype(x.dtype) for x in u], scfg
            )
        ).astype(jnp.float32),
        (spi_params, up),
    )
    print(f"mlvl_fuse (5 rnds)  {t*1e3:8.2f} ms")

    # 4. roi_align per level
    scaled = boxes * scfg.image_size
    for lvl in range(scfg.num_levels):
        t = chain_time(
            lambda s, f, bx, _lvl=lvl: spi_mod._roi_align(
                f + (s * 1e-30).astype(f.dtype), bx, box_mask,
                scfg.roi_output_size, 1.0 / scfg.strides[_lvl], scfg.sampling_ratio,
            ).sum().astype(jnp.float32),
            (fused[lvl], scaled),
        )
        print(f"roi_align lvl{lvl} ({fused[lvl].shape[1]:3d}) {t*1e3:8.2f} ms")

    # 5. head: pconvs + flatten + linears
    def head(s, sp, fs, bx):
        rf_sum = None
        for lvl in range(scfg.num_levels):
            rf = spi_mod._roi_align(
                fs[lvl] + (s * 1e-30).astype(fs[lvl].dtype), bx, box_mask,
                scfg.roi_output_size, 1.0 / scfg.strides[lvl], scfg.sampling_ratio,
            )
            rf = rf.reshape(b * REGIONS, scfg.roi_output_size, scfg.roi_output_size, c).astype(fs[lvl].dtype)
            y = spi_mod._conv(sp["pconvs"][lvl], rf)
            rf_sum = y if rf_sum is None else rf_sum + y
        fusedh = jax.nn.relu(rf_sum)
        fusedh = fusedh.transpose(0, 3, 1, 2).reshape(b * REGIONS, -1)
        out = spi_mod._dense(sp["flatten_linear"], fusedh)
        out = spi_mod._dense(sp["updims"], out)
        return out.sum().astype(jnp.float32)

    t = chain_time(head, (spi_params, fused, scaled))
    print(f"roi+pconvs+linears  {t*1e3:8.2f} ms")

    # 6. full spi_forward from upsampled maps
    t = chain_time(
        lambda s, sp, pyr, bx: spi_mod.spi_forward(
            sp, [p + (s * 1e-30).astype(p.dtype) for p in pyr], bx, box_mask, scfg
        ).sum().astype(jnp.float32),
        (spi_params, pyramid, boxes),
    )
    print(f"spi_forward total   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
