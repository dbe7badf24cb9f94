"""Train-step throughput measurement on the attached TPU.

Measures the stage-1/stage-2 train step at reduced LLaMA depth (one 16 GB
v5e cannot hold 7B optimizer state) and extrapolates the full 32-layer cost
from the measured per-layer slope: t(32) = t(L) + (t(L) - t(L2)) / (L - L2)
* (32 - L). The per-layer cost is linear by construction (identical scanned
blocks); the intercept (CLIP + SPI + embed/head + collectives + dispatch)
is measured, not modelled.

Timing runs K steps inside ONE jitted lax.scan dispatch: on RPC-tunnelled
backends per-dispatch overhead is ~2 s for large arg trees, so per-step
host loops would swamp the signal; the (K, 2K) pair cancels the remaining
constant: step = (t_2K - t_K) / K.

Reference match: train_stage2.sh:38-57 (8xA100 FSDP, per-device batch 2,
seq 2048, bf16, grad checkpointing). Invoke manually or via bench.py
(--json mode).
"""

import argparse
import dataclasses
import json
import subprocess
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(args, layers: int, dtype, param_dtype):
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.models.llama import LlamaConfig, fuse_stacked_qkv, to_stacked_params
    from gpt4roi_tpu.train.loop import make_train_step
    from gpt4roi_tpu.train.state import TrainConfig, create_train_state, make_optimizer

    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=layers),
    )

    # ONE jitted program builds params AND optimizer state: eager init at
    # 7B issues hundreds of per-leaf device ops, each paying the ~2 s
    # RPC dispatch overhead on this tunnel — measured minutes per depth
    # subprocess, the dominant cost of a warm driver-bench train phase
    tcfg = TrainConfig(
        stage=args.stage, learning_rate=2e-5, total_steps=100, warmup_steps=0,
        optimizer=args.optimizer, remat=args.remat,
    )

    def _build(key):
        params = init_gpt4roi_params(key, cfg, param_dtype)
        if args.scan_layers:
            params = dict(params)
            params["llama"] = to_stacked_params(params["llama"])
            if getattr(args, "fuse_qkv", False):
                params["llama"] = fuse_stacked_qkv(params["llama"])
        return params

    params = jax.jit(_build)(jax.random.PRNGKey(0))
    tx = make_optimizer(tcfg, params)
    state = jax.jit(lambda p: create_train_state(p, tcfg), donate_argnums=(0,))(params)
    params = state.params
    step = make_train_step(cfg, tcfg, tx, compute_dtype=dtype)

    def multi(state, batch, n):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=n)

    jit_multi = jax.jit(multi, static_argnames=("n",), donate_argnums=(0,))
    return cfg, state, jit_multi


def make_batch(cfg, b, s, r):
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
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, s), jnp.float32),
        "images": jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_mask": jnp.ones((b, r), bool),
    }


def measure_depth(args, layers, dtype, param_dtype, k):
    """Time K and 2K scanned steps; return (step_s, loss).

    K and 2K are DIFFERENT compiled programs (static scan length), so both
    must be warmed before timing — subtracting only cancels the dispatch
    constant, not a compile."""
    cfg, state, jit_multi = build_step(args, layers, dtype, param_dtype)
    batch = make_batch(cfg, args.batch, args.seq, args.regions)
    state, losses = jit_multi(state, batch, k)
    float(np.asarray(losses)[-1])  # compile barrier (K program)
    state, losses = jit_multi(state, batch, 2 * k)
    float(np.asarray(losses)[-1])  # compile barrier (2K program)
    t0 = time.perf_counter()
    state, losses = jit_multi(state, batch, k)
    float(np.asarray(losses)[-1])
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, losses = jit_multi(state, batch, 2 * k)
    loss = float(np.asarray(losses)[-1])
    t_2k = time.perf_counter() - t0
    del state
    return (t_2k - t_k) / k, loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--layers2", type=int, default=4,
                   help="second depth for the per-layer slope (0 = skip)")
    p.add_argument("--depths", default=None,
                   help="comma list of depths (overrides --layers/--layers2): "
                   "least-squares line over >=3 points + max residual pct — "
                   "a MEASURED linearity check instead of the 2-point "
                   "extrapolation assumption")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--regions", type=int, default=16)
    p.add_argument("--depth_timeout", type=int, default=600,
                   help="per-depth subprocess timeout (s), --depths mode")
    p.add_argument("--stage", default="stage2", choices=["stage1", "stage2"])
    p.add_argument("--k", type=int, default=3, help="steps per timed dispatch")
    p.add_argument("--scan_layers", action="store_true")
    p.add_argument("--fuse_qkv", action="store_true",
                   help="fuse q/k/v and gate/up stacked kernels for training")
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adamw8bit"])
    p.add_argument("--remat", default="full", choices=["full", "dots", "none"])
    p.add_argument("--param_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--full_layers", type=int, default=32)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    if args.depths:
        # NOTE: no jax.default_backend()/device use in this branch — the
        # parent must NOT create a TPU client before its depth subprocesses
        # run (two clients contending for the RPC tunnel — CLAUDE.md)
        depths = sorted({int(d) for d in args.depths.split(",")}, reverse=True)
        assert len(depths) >= 2
        ts, kept = [], []
        for L in depths:
            # each depth runs in its OWN subprocess: a depth that OOMs (or
            # otherwise kills the device client) must not poison the
            # remaining depths — measured failure mode on the axon tunnel:
            # after an in-process L=5 fuse_qkv OOM, L=4 and L=2 ALSO raised
            # JaxRuntimeError though each fits fine alone (round-5 triage)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--stage", args.stage, "--layers", str(L), "--layers2", "0",
                "--optimizer", args.optimizer, "--remat", args.remat,
                "--param_dtype", args.param_dtype, "--batch", str(args.batch),
                "--seq", str(args.seq), "--regions", str(args.regions),
                "--k", str(args.k), "--json",
            ]
            if args.scan_layers:
                cmd.append("--scan_layers")
            if args.fuse_qkv:
                cmd.append("--fuse_qkv")
            try:
                proc = subprocess.run(
                    cmd, timeout=args.depth_timeout,
                    stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
                )
                data = None
                for line in reversed(proc.stdout.strip().splitlines()):
                    try:
                        data = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
                assert data is not None and data.get("step_ms", 0) > 0, (
                    f"rc={proc.returncode}"
                )
                t = data["step_ms"] / 1e3
            except Exception as e:  # depth doesn't fit this chip (HBM OOM)
                print(f"depth {L} failed ({type(e).__name__}): "
                      f"{str(e)[:300]}; dropping", file=sys.stderr)
                continue
            ts.append(t)
            kept.append(L)
        depths = kept
        assert len(depths) >= 2, "need >= 2 depths that fit"
        xs = np.asarray(depths, np.float64)
        ys = np.asarray(ts, np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        resid = np.abs(slope * xs + intercept - ys) / ys
        t_full = slope * args.full_layers + intercept
        out = {
            "stage": args.stage,
            "remat": args.remat,
            "batch": args.batch,
            "seq": args.seq,
            "regions": args.regions,
            "depths": depths,
            "step_ms_each": [round(t * 1e3, 1) for t in ts],
            "per_layer_ms": round(slope * 1e3, 2),
            "intercept_ms": round(intercept * 1e3, 1),
            "linear_fit_max_resid_pct": round(float(resid.max()) * 100, 2),
            "step_ms_full": round(t_full * 1e3, 1),
            "tokens_per_sec_full": round(args.batch * args.seq / t_full, 1),
            "img_regions_per_sec_full": round(args.batch * args.regions / t_full, 2),
        }
        print(json.dumps(out) if args.json else out)
        return

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    param_dtype = jnp.bfloat16 if args.param_dtype == "bfloat16" else jnp.float32

    t1, loss1 = measure_depth(args, args.layers, dtype, param_dtype, args.k)
    out = {
        "stage": args.stage,
        "remat": args.remat,
        "batch": args.batch,
        "seq": args.seq,
        "regions": args.regions,
        "layers": args.layers,
        "step_ms": round(t1 * 1e3, 1),
        "loss": round(loss1, 3),
    }
    if args.layers2:
        t2, _ = measure_depth(args, args.layers2, dtype, param_dtype, args.k)
        slope = (t1 - t2) / (args.layers - args.layers2)
        t_full = t1 + slope * (args.full_layers - args.layers)
        out.update(
            {
                "layers2": args.layers2,
                "step_ms_l2": round(t2 * 1e3, 1),
                "per_layer_ms": round(slope * 1e3, 2),
                "step_ms_full": round(t_full * 1e3, 1),
                "tokens_per_sec_full": round(args.batch * args.seq / t_full, 1),
                "img_regions_per_sec_full": round(args.batch * args.regions / t_full, 2),
            }
        )
    if args.json:
        print(json.dumps(out))
    else:
        print(out)


if __name__ == "__main__":
    main()
