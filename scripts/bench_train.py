"""Train-step throughput measurement on the attached TPU.

Runs a stage-1-style step (frozen CLIP+LLM, SPI grads) and a stage-2-style
step (full grads) on a 7B-shaped-but-shallow model (full CLIP ViT-L/14 +
full SPI + LLaMA with --layers decoder layers; one v5e chip cannot hold
7B fp32 Adam state, so scale the per-layer cost x32/layers for the full
model). Not driver-run; invoke manually.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--regions", type=int, default=16)
    p.add_argument("--stage", default="stage1", choices=["stage1", "stage2"])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.models.llama import LlamaConfig
    from gpt4roi_tpu.train.loop import make_train_step
    from gpt4roi_tpu.train.state import TrainConfig, create_train_state, make_optimizer

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers),
    )
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tcfg = TrainConfig(stage=args.stage, learning_rate=2e-5, total_steps=100, warmup_steps=0)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx, compute_dtype=dtype), donate_argnums=(0,))

    b, s, r = args.batch, args.seq, args.regions
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    ids = rng.integers(5, 31000, (b, s)).astype(np.int32)
    ids[:, 1] = cfg.im_start_token_id
    ids[:, 2 : 2 + n_img] = cfg.im_patch_token_id
    ids[:, 2 + n_img] = cfg.im_end_token_id
    for k in range(r):
        ids[:, 4 + n_img + 2 * k] = cfg.bbox_token_id
    labels = ids.copy()
    labels[:, : 3 + n_img] = -100
    boxes = np.clip(rng.random((b, r, 4)).astype(np.float32), 0.05, 0.6)
    boxes[..., 2:] = boxes[..., :2] + 0.3
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, s), jnp.float32),
        "images": jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32), dtype),
        "boxes": jnp.asarray(boxes),
        "box_mask": jnp.ones((b, r), bool),
    }

    state, m = step(state, batch)
    float(np.asarray(m["loss"]))  # compile barrier
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"{args.stage} step (L={args.layers}, b={b}, s={s}, r={r}): "
        f"{dt*1e3:.1f} ms -> {b*s/dt:.0f} tok/s, {b*r/dt:.0f} regions/s; "
        f"loss={float(np.asarray(m['loss'])):.3f}"
    )


if __name__ == "__main__":
    main()
