"""Padded vs packed stage-2 training throughput on the attached TPU.

The reference's HF Trainer pads every conversation row to the batch max
(gpt4roi/datasets/data_modules.py:33-55); this framework's default padded
path pads to the static ``model_max_length`` (XLA needs static shapes).
Sequence packing (data/packing.py + gpt4roi_forward_packed) instead fills
each 2048-token row with several samples under a segment mask, so the
decoder FLOPs land on real tokens.

Both paths are measured with the SAME step recipe as scripts/bench_train.py
(scan-layers, dots remat, 8-bit AdamW, bf16 params) at two depths, and the
32-layer step is extrapolated from the per-layer slope. The figure of merit
is end-to-end SAMPLES/SEC (and real-token/s): the packed step is slower per
step (CLIP+SPI run on ~3x more images per row) but carries ~3x more
samples.

Length distribution: the stage-2 data files are absent in this image, so
per-dataset token lengths are SYNTHESIZED from the mixture's structure
(gpt4roi/configs/stage2.py; each sample = 258-token image block
(<im_start> + 256 patches + <im_end>) + instruction preamble + QA rounds as
each dataset class builds them — see gpt4roi/datasets/*.py):

  dataset        weight(k)  median extra text  sigma   basis
  RefCOCOG           80            110          0.35   1-5 caption rounds (refcoco.py:243-300)
  flickr30k         150            190          0.40   whole-caption + per-region rounds (flickr30k.py:262-287)
  VGDATA            160            230          0.40   3-10 region-description rounds (vg.py:241-247)
  DetLLava          150            320          0.55   LLaVA-150k conversations, long tail (det_llava.py:394-444)
  VCRDataset        212            380          0.45   object preamble + QA + rationale rounds (vcr.py:104-144)
  SingleVCR         212            180          0.40   single QA round (vcr.py:215-318)
  MultiVCR          212            260          0.40   two-round variant (vcr.py:321-425)

Lengths are lognormal(median, sigma) + 258, clipped to [290, 2048]. The
script prints the realized mean/fill so the assumptions are transparent;
the RATIO conclusion is insensitive to ±30% on the medians (padding waste
is dominated by the 2048 static row vs ~600-token means).

Usage: python scripts/bench_packing.py --layers 4 --layers2 2 --json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (weight_k, median_extra_text_tokens, lognormal_sigma)
MIXTURE = {
    "RefCOCOG": (80, 110, 0.35),
    "flickr30k": (150, 190, 0.40),
    "VGDATA": (160, 230, 0.40),
    "DetLLava": (150, 320, 0.55),
    "VCRDataset": (212, 380, 0.45),
    "SingleVCRDataset": (212, 180, 0.40),
    "MultiVCRDataset": (212, 260, 0.40),
}
IMAGE_BLOCK = 258  # <im_start> + 256 <im_patch> + <im_end>


def sample_lengths(rng: np.random.Generator, n: int, seq_len: int) -> np.ndarray:
    names = list(MIXTURE)
    weights = np.array([MIXTURE[k][0] for k in names], np.float64)
    weights /= weights.sum()
    which = rng.choice(len(names), size=n, p=weights)
    out = np.empty(n, np.int64)
    for i, w in enumerate(which):
        _, med, sig = MIXTURE[names[w]]
        extra = rng.lognormal(np.log(med), sig)
        out[i] = int(np.clip(IMAGE_BLOCK + extra, 290, seq_len))
    return out


def make_sample(rng: np.random.Generator, cfg, length: int, n_regions: int):
    """Synthetic tokenized sample matching the collate/packing schema."""
    ids = rng.integers(5, 31000, (length,)).astype(np.int32)
    ids[1] = cfg.im_start_token_id
    ids[2 : 2 + cfg.num_image_tokens] = cfg.im_patch_token_id
    ids[2 + cfg.num_image_tokens] = cfg.im_end_token_id
    text0 = 3 + cfg.num_image_tokens
    n_regions = min(n_regions, max(1, (length - text0 - 2) // 2))
    for k in range(n_regions):
        ids[text0 + 1 + 2 * k] = cfg.bbox_token_id
    labels = ids.copy()
    labels[: text0 + 2 * n_regions + 2] = -100  # human turns masked
    boxes = np.clip(rng.random((n_regions, 4)).astype(np.float32), 0.05, 0.6)
    boxes[:, 2:] = boxes[:, :2] + 0.3
    return {
        "input_ids": ids,
        "labels": labels,
        "image": rng.standard_normal((224, 224, 3)).astype(np.float32),
        "boxes": boxes,
    }


def build_step(args, layers, dtype, param_dtype, packed, max_images):
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.models.llama import LlamaConfig, to_stacked_params
    from gpt4roi_tpu.train.loop import make_train_step
    from gpt4roi_tpu.train.state import TrainConfig, create_train_state, make_optimizer

    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=layers),
    )
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg, param_dtype)
    params = dict(params)
    params["llama"] = to_stacked_params(params["llama"])
    tcfg = TrainConfig(
        stage="stage2", learning_rate=2e-5, total_steps=100, warmup_steps=0,
        optimizer="adamw8bit", remat=args.remat,
    )
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, tx, compute_dtype=dtype, packed=packed)

    def multi(state, batch, n):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=n)

    jit_multi = jax.jit(multi, static_argnames=("n",), donate_argnums=(0,))
    return cfg, state, jit_multi


def time_multi(jit_multi, state, batch, k):
    state, losses = jit_multi(state, batch, k)
    float(np.asarray(losses)[-1])
    state, losses = jit_multi(state, batch, 2 * k)
    float(np.asarray(losses)[-1])
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


def measure(args, layers, dtype, param_dtype, packed, batch, max_images, k):
    cfg, state, jit_multi = build_step(args, layers, dtype, param_dtype, packed, max_images)
    return time_multi(jit_multi, state, batch, k)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--layers2", type=int, default=2)
    p.add_argument("--rows", type=int, default=2, help="device rows (= reference per-device batch)")
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--remat", default="dots", choices=["full", "dots", "none"])
    p.add_argument("--full_layers", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true")
    p.add_argument("--dry_run", action="store_true",
                   help="host-side only: distribution stats + batch construction")
    args = p.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    param_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(args.seed)
    # --- distribution statistics (host-only) -----------------------------
    from gpt4roi_tpu.data.packing import PackSpec, collate_packed, first_fit_pack

    pool = sample_lengths(rng, 8192, args.seq)
    bins = first_fit_pack(pool.tolist(), args.seq)
    fill = pool.sum() / (len(bins) * args.seq)
    samples_per_row = len(pool) / len(bins)
    stats = {
        "mean_len": round(float(pool.mean()), 1),
        "p50_len": int(np.percentile(pool, 50)),
        "p90_len": int(np.percentile(pool, 90)),
        "padded_fill": round(float(pool.mean()) / args.seq, 4),
        "packed_fill": round(float(fill), 4),
        "samples_per_row": round(float(samples_per_row), 2),
    }

    # --- build one representative packed batch (rows=args.rows) ----------
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.llama import LlamaConfig

    cfg0 = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(), llama=LlamaConfig(num_layers=1)
    )
    # draw samples until first-fit fills args.rows rows to >= the pool fill
    drawn, lens = [], []
    target = int(round(samples_per_row * args.rows))
    while len(drawn) < target:
        L = int(sample_lengths(rng, 1, args.seq)[0])
        if sum(lens) + L > args.rows * args.seq:
            break
        lens.append(L)
        drawn.append(make_sample(rng, cfg0, L, n_regions=int(rng.integers(1, 5))))
    max_images = len(drawn)
    pspec = PackSpec(
        seq_len=args.seq, max_regions=8, image_size=224, pad_token_id=0,
        im_patch_token_id=cfg0.im_patch_token_id, bbox_token_id=cfg0.bbox_token_id,
        num_image_tokens=cfg0.num_image_tokens, max_images=max_images, rows=args.rows,
    )
    packed_batch = collate_packed(drawn, pspec)
    packed_batch.pop("num_images")
    n_packed = len(drawn)
    real_tokens_packed = int(sum(min(l, args.seq) for l in lens))

    # --- padded batch: same stream, one sample per row --------------------
    pad_samples = drawn[: args.rows]
    pad_lens = lens[: args.rows]
    pad_ids = np.zeros((args.rows, args.seq), np.int32)
    pad_labels = np.full((args.rows, args.seq), -100, np.int32)
    attn = np.zeros((args.rows, args.seq), np.float32)
    images = np.stack([s["image"] for s in pad_samples])
    boxes = np.zeros((args.rows, 8, 4), np.float32)
    box_mask = np.zeros((args.rows, 8), bool)
    for i, s in enumerate(pad_samples):
        n = len(s["input_ids"])
        pad_ids[i, :n] = s["input_ids"]
        pad_labels[i, :n] = s["labels"]
        attn[i, :n] = 1.0
        bx = s["boxes"][:8]
        boxes[i, : len(bx)] = bx
        box_mask[i, : len(bx)] = True
    padded_batch = {
        "input_ids": pad_ids, "labels": pad_labels, "attention_mask": attn,
        "images": images, "boxes": boxes, "box_mask": box_mask,
    }

    if args.dry_run:
        out = dict(stats)
        out.update(
            {
                "samples_in_packed_batch": n_packed,
                "real_tokens_packed": real_tokens_packed,
                "packed_keys": sorted(packed_batch),
                "padded_keys": sorted(padded_batch),
            }
        )
        print(json.dumps(out) if args.json else out)
        return

    def extrapolate(measure_fn):
        t1, loss = measure_fn(args.layers)
        t2, _ = measure_fn(args.layers2)
        slope = (t1 - t2) / (args.layers - args.layers2)
        return t1 + slope * (args.full_layers - args.layers), slope, loss

    t_pad_full, slope_pad, _ = extrapolate(
        lambda L: measure(args, L, dtype, param_dtype, False, padded_batch, 0, args.k)
    )
    t_pack_full, slope_pack, _ = extrapolate(
        lambda L: measure(args, L, dtype, param_dtype, True, packed_batch, max_images, args.k)
    )

    out = dict(stats)
    out.update(
        {
            "rows": args.rows,
            "seq": args.seq,
            "samples_in_packed_batch": n_packed,
            "padded_step_ms_full": round(t_pad_full * 1e3, 1),
            "packed_step_ms_full": round(t_pack_full * 1e3, 1),
            "padded_per_layer_ms": round(slope_pad * 1e3, 2),
            "packed_per_layer_ms": round(slope_pack * 1e3, 2),
            "padded_samples_per_sec": round(args.rows / t_pad_full, 3),
            "packed_samples_per_sec": round(n_packed / t_pack_full, 3),
            "padded_real_tokens_per_sec": round(sum(pad_lens) / t_pad_full, 1),
            "packed_real_tokens_per_sec": round(real_tokens_packed / t_pack_full, 1),
            "packing_gain": round((n_packed / t_pack_full) / (args.rows / t_pad_full), 3),
        }
    )
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
