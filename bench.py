"""Driver benchmark: composite speedup vs the A100 PyTorch reference on
BOTH north-star metrics from BASELINE.json — "Regions/sec/chip
(encode+RoIAlign) + gen tokens/sec for 7B RoI prompts".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``value``/``vs_baseline`` = geometric mean of three measured/anchored
ratios (each documented in BASELINE.md "Measured anchoring"):

  1. encode_ratio  — SPI region-encode regions/s on one v5e vs 2,100
     regions/s anchored A100 estimate (measured eta-transfer + op-level
     roofline bracket, BASELINE.md).
  2. decode_ratio  — single-stream int8-W8A8 7B decode tok/s vs 67 tok/s,
     a deliberately GENEROUS A100 anchor for the reference's HF fp16
     generate serving path (A100-80GB roofline 6.8 ms/tok + generate-loop
     overhead measured in-image and scaled; public HF-4.28 measurements
     are ~2x slower — see BASELINE.md).
  3. serving_ratio — batched ragged-serving tok/s/chip (batch 8) vs the
     same 67 tok/s: the reference worker serves strictly one request per
     generate call (llava/serve/model_worker.py:182-260), so its chip
     throughput IS its single-stream rate; batched RoI-prompted
     generation is the explicit north-star target in BASELINE.json.

Decode measurements run in bounded subprocesses (persistent compile
cache in .jax_cache keeps warm runs fast); on any failure the composite
falls back to the ratios that did measure, so the driver contract never
breaks.
"""

import json
import math
import os
import subprocess
import sys
import time

A100_ENCODE_REGIONS_PER_SEC = 2100.0  # anchored, BASELINE.md
A100_DECODE_TOKS_PER_SEC = 67.0  # generous anchor, BASELINE.md
A100_TRAIN_TOKS_PER_SEC = 2400.0  # stage-2 anchor, BASELINE.md round 3
A100_TRAIN_STAGE1_TOKS_PER_SEC = 3300.0  # stage-1 anchor, BASELINE.md round 4

BATCH = 8
REGIONS = 32


def _enable_compile_cache() -> None:
    import jax

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def measure_encode(fuse_int8: bool = False) -> float:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, encode_vision
    from gpt4roi_tpu.models.llama import LlamaConfig
    import gpt4roi_tpu.models.clip_vit as cv
    import gpt4roi_tpu.models.spi as spi_mod

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=LlamaConfig(num_layers=1, vocab_size=32006),
    )
    if fuse_int8:
        # inference serving fast path: W8A8 fuse convs on the MXU int8
        # pipe (models/spi.py; int8-class numerics, parity-tested)
        cfg = dataclasses.replace(cfg, spi=dataclasses.replace(cfg.spi, fuse_int8=True))
    key = jax.random.PRNGKey(0)
    params = {
        "clip": cv.init_clip_params(key, cfg.clip, dtype),
        "mm_projector": {
            "kernel": jnp.zeros((cfg.clip.hidden_size, 4096), dtype),
            "bias": jnp.zeros((4096,), dtype),
        },
        "spi": spi_mod.init_spi_params(key, cfg.spi, dtype),
    }
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3), dtype=np.float32), dtype)
    wh = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.5
    xy = rng.random((BATCH, REGIONS, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1))
    box_mask = jnp.ones((BATCH, REGIONS), bool)

    if fuse_int8:
        # static calibrated W8A8 activation scales (models/spi.py): the
        # quantize has no absmax pass and the three slice convs collapse
        # into one int8 conv — calibrated on a DIFFERENT random batch
        # (standard static-activation serving practice)
        from gpt4roi_tpu.models.clip_vit import clip_vision_forward
        from gpt4roi_tpu.models.gpt4roi import select_image_and_pyramid_features

        cal_images = jnp.asarray(
            rng.standard_normal((BATCH, 224, 224, 3), dtype=np.float32), dtype
        )

        @jax.jit
        def calibrate(params, images, boxes, box_mask):
            _, hs = clip_vision_forward(params["clip"], images, cfg.clip, dtype)
            _, pyramid = select_image_and_pyramid_features(
                hs, cfg.vision_select_layer, cfg.num_pyramid_levels
            )
            return spi_mod.calibrate_spi_act_scales(
                params["spi"], pyramid, boxes, box_mask, cfg.spi
            )

        scales = calibrate(params, cal_images, boxes, box_mask)
        jax.tree_util.tree_map(np.asarray, scales)
        params = dict(params)
        params["spi"] = dict(params["spi"])
        params["spi"].update(scales)
        params["spi"] = spi_mod.prequantize_spi_kernels(params["spi"])

    @jax.jit
    def encode(params, images, boxes, box_mask, salt):
        # `salt` chains iterations into a dependency sequence so pipelined
        # timing measures device execution, not queue depth (host fetch is
        # the only true barrier on RPC-tunnelled backends)
        salt = (salt * 1e-30).astype(images.dtype)
        img_feats, spi_feats = encode_vision(params, cfg, images + salt, boxes, box_mask, dtype)
        return (img_feats.sum() + spi_feats.sum()).astype(jnp.float32)

    salt = jnp.zeros((), jnp.float32)
    out = encode(params, images, boxes, box_mask, salt)
    float(np.asarray(out))  # compile+warm
    n_iters = 30 if on_tpu else 2
    t0 = time.perf_counter()
    out = salt
    for _ in range(n_iters):
        out = encode(params, images, boxes, box_mask, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n_iters
    return BATCH * REGIONS / dt


def measure_decode(batch: int, timeout_s: int = 560):
    """Run scripts/bench_serve_decode.py in a bounded subprocess."""
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [
        sys.executable, os.path.join(here, "scripts", "bench_serve_decode.py"),
        "--layers", "32", "--batch", str(batch), "--steps", "128", "--json",
    ]
    try:
        proc = subprocess.run(
            cmd, cwd=here, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    except Exception:
        pass
    return None


def measure_train(stage: str = "stage2", timeout_s: int = 1700):
    """Run scripts/bench_train.py in a bounded subprocess (scan-layers +
    remat + int8 AdamW; 32-layer step fit by least squares over THREE
    measured depths with the max residual reported — BASELINE.md train
    anchor section)."""
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [
        sys.executable, os.path.join(here, "scripts", "bench_train.py"),
        "--stage", stage, "--scan_layers", "--optimizer", "adamw8bit",
        # three measured depths (linearity checked, not assumed). Stage-2
        # uses L=5/4/2: with the fused qkv/gate_up training matmuls L=6 at
        # b=2 no longer fits one 16 GB chip (the fused wgrad/dgrad
        # transients are wider; L=8 was already structural — params+int8
        # moments are 9.5 GB of arguments, the stacked wgrad tree another
        # 3.3 GB, see PARITY.md known-gaps). Stage-1 at b=1 keeps 6/4/2.
        "--param_dtype", "bfloat16",
        "--depths", "6,4,2" if stage == "stage1" else "5,4,2",
        # dots remat: measured within 1.5% of the no-remat floor at L=4
        # while full remat pays ~8 ms/layer of recompute (BASELINE.md
        # train-anchor table)
        "--remat", "dots",
        # fused stacked q/k/v and gate/up training matmuls: slope
        # 50.43 -> 46.86 ms/layer measured (BASELINE.md round-4 table);
        # grad parity asserted in tests/test_train.py
        "--fuse_qkv", "--json",
    ]
    if stage == "stage1":
        # reference stage-1 recipe: per-device batch 1 (train_stage1.sh:20)
        cmd += ["--batch", "1"]
    try:
        proc = subprocess.run(
            cmd, cwd=here, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    except Exception:
        pass
    return None


def main() -> None:
    result = {}
    ratios = {}

    # decode/train subprocesses run FIRST, before this process creates its
    # own TPU client — two clients contending for the RPC tunnel makes the
    # child's device init intermittently slow enough to blow the budget
    d1 = measure_decode(batch=1) or measure_decode(batch=1)
    d8 = measure_decode(batch=8) or measure_decode(batch=8)
    tr = measure_train() or measure_train()
    tr1 = measure_train(stage="stage1")

    _enable_compile_cache()
    regions_s = measure_encode(fuse_int8=True)
    result["encode_regions_per_sec"] = round(regions_s, 1)
    ratios["encode"] = regions_s / A100_ENCODE_REGIONS_PER_SEC
    try:
        result["encode_bf16_regions_per_sec"] = round(measure_encode(fuse_int8=False), 1)
    except Exception:
        pass

    if d1 and d1.get("step_ms", 0) > 0:
        toks = 1000.0 / d1["step_ms"]
        result["decode_int8_ms_per_tok"] = d1["step_ms"]
        ratios["decode"] = toks / A100_DECODE_TOKS_PER_SEC
    if d8 and d8.get("tokens_per_sec", 0) > 0:
        result["serve_tokens_per_sec_batch8"] = d8["tokens_per_sec"]
        ratios["serving"] = d8["tokens_per_sec"] / A100_DECODE_TOKS_PER_SEC
    if tr and tr.get("tokens_per_sec_full", 0) > 0:
        result["train_step_ms_32l"] = tr["step_ms_full"]
        result["train_tokens_per_sec"] = tr["tokens_per_sec_full"]
        if "linear_fit_max_resid_pct" in tr:
            result["train_linear_fit_max_resid_pct"] = tr["linear_fit_max_resid_pct"]
        ratios["train"] = tr["tokens_per_sec_full"] / A100_TRAIN_TOKS_PER_SEC
    if tr1 and tr1.get("tokens_per_sec_full", 0) > 0:
        # stage-1 is reported, not folded into the composite: BASELINE.json
        # names the stage-2 step as the train target; stage-1 gets its own
        # anchored ratio field (VERDICT r3 item 3)
        result["train_stage1_tokens_per_sec"] = tr1["tokens_per_sec_full"]
        result["train_stage1_vs_baseline"] = round(
            tr1["tokens_per_sec_full"] / A100_TRAIN_STAGE1_TOKS_PER_SEC, 4
        )

    composite = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    inf_ratios = {k: v for k, v in ratios.items() if k != "train"}
    result.update(
        {
            "metric": "composite_speedup_vs_a100_reference (geomean of "
            + "+".join(ratios.keys()) + ")",
            "value": round(composite, 4),
            "unit": "x",
            "vs_baseline": round(composite, 4),
            **{f"{k}_vs_baseline": round(v, 4) for k, v in ratios.items()},
        }
    )
    if inf_ratios and len(inf_ratios) != len(ratios):
        # rounds 1-2 comparability: the inference-only 3-component geomean
        result["inference_composite"] = round(
            math.exp(sum(math.log(r) for r in inf_ratios.values()) / len(inf_ratios)), 4
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
