"""Padded vs packed stage-2 training throughput on the attached TPU.

The reference trainer pads every conversation to ``model_max_length``
(HF Trainer default collator — gpt4roi/datasets/data_modules.py:33-55,
train_stage2.sh:46 ``--model_max_length 2048``), so short region-QA
samples waste most of each row's decoder FLOPs. ``data/packing.py`` packs
multiple samples per row (segment-masked attention, per-segment
positions); this script measures what that is worth at the stage-2 shape.

Length distribution: the stage-2 data files are not in this image, so
sample lengths are SYNTHESIZED from the mixture's structure (documented
per dataset below, weights ~ published dataset sizes). Every sample
carries the fixed ~300-token vision preamble (256 ``<im_patch>`` + system
prompt + begin_str — data/tokenization.py), plus a conversation whose
length model is cited inline. The fill fractions are reported so the
result can be re-derived under a different length model.

Methodology matches scripts/bench_train.py: K/2K scanned steps in one
dispatch (cancels the ~2 s RPC dispatch constant), two depths for the
per-layer slope, 32-layer extrapolation, scan-layers + dots remat + int8
AdamW + bf16 params (the headline bench configuration). Both paths train
the SAME per-sample work (one image + R regions each); the delta is
decoder FLOPs spent on padding.

Effective throughput = SUPERVISED (label != -100) tokens per second: the
quantity that actually advances training. Row tok/s (B*S/t) is what
bench_train.py reports and is identical between the two paths by
construction — packing's entire win is in effective tokens.
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

SEQ = 2048
PREAMBLE = 300  # 1 bos + system/begin_str ~40 + im_start + 256 im_patch + im_end

# Conversation-length models (tokens past the preamble), stage-2 mixture
# (gpt4roi_tpu/configs/stage2.py == reference gpt4roi/configs/stage2.py).
# (mean, std, weight): weight ~ dataset size in samples (RefCOCOg ~80k,
# Flickr30k entities ~149k, VG regions subset ~160k, LLaVA-150k det, VCR
# ~212k x 3 views). Models: single-turn region captions are short
# (RefCOCOg/Flickr); VG region QA mid; DetLLava = LLaVA multi-turn
# instruct (long, heavy tail); VCR QA->R adds 4 choices + rationale;
# MultiVCR chains turns.
MIXTURE = [
    ("refcocog", 35.0, 12.0, 80.0),
    ("flickr30k", 45.0, 15.0, 149.0),
    ("vg", 120.0, 40.0, 160.0),
    ("det_llava", 400.0, 220.0, 150.0),
    ("vcr", 260.0, 80.0, 212.0),
    ("single_vcr", 130.0, 40.0, 212.0),
    ("multi_vcr", 350.0, 110.0, 212.0),
]


def synth_lengths(n: int, rng: np.random.Generator) -> np.ndarray:
    names, means, stds, ws = zip(*MIXTURE)
    w = np.asarray(ws) / sum(ws)
    which = rng.choice(len(names), size=n, p=w)
    conv = rng.normal(np.asarray(means)[which], np.asarray(stds)[which])
    return np.clip(PREAMBLE + conv, PREAMBLE + 8, SEQ).astype(np.int64)


def synth_samples(n: int, rng: np.random.Generator, cfg, regions: int):
    """Samples in the data.collate schema with the synthesized lengths.
    ~55% of conversation tokens are supervised (answers; questions and the
    preamble are IGNORE_INDEX — data/tokenization.py masking rules)."""
    lengths = synth_lengths(n, rng)
    out = []
    for l in lengths:
        ids = rng.integers(5, 31000, (l,)).astype(np.int32)
        ids[0] = 1
        ids[1] = cfg.im_start_token_id
        ids[2 : 2 + cfg.num_image_tokens] = cfg.im_patch_token_id
        ids[2 + cfg.num_image_tokens] = cfg.im_end_token_id
        for k in range(min(regions, max(1, (l - PREAMBLE) // 64))):
            ids[PREAMBLE - 40 + 2 * k] = cfg.bbox_token_id
        labels = ids.copy()
        labels[:PREAMBLE] = -100
        conv = np.arange(PREAMBLE, l)
        labels[conv[rng.random(len(conv)) > 0.55]] = -100
        boxes = np.clip(rng.random((regions, 4)).astype(np.float32), 0.05, 0.6)
        boxes[:, 2:] = boxes[:, :2] + 0.3
        out.append(
            {
                "input_ids": ids,
                "labels": labels,
                "image": np.zeros((cfg.clip.image_size,) * 2 + (3,), np.float32),
                "boxes": boxes,
            }
        )
    return out


def build_step(stage: str, layers: int, packed: bool, param_dtype, dtype):
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.models.llama import LlamaConfig, to_stacked_params
    from gpt4roi_tpu.train.loop import make_train_step
    from gpt4roi_tpu.train.state import TrainConfig, create_train_state, make_optimizer

    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig.vit_l_14(),
        llama=dataclasses.replace(LlamaConfig.llama_7b(), num_layers=layers),
    )
    tcfg = TrainConfig(
        stage=stage, learning_rate=2e-5, total_steps=100, warmup_steps=0,
        optimizer="adamw8bit", remat="dots",
    )

    # one jitted init program (params + opt state): eager 7B init pays the
    # ~2 s RPC dispatch per leaf op on this tunnel (see bench_train.py)
    def _build(key):
        params = init_gpt4roi_params(key, cfg, param_dtype)
        params = dict(params)
        params["llama"] = to_stacked_params(params["llama"])
        return create_train_state(params, tcfg)

    state = jax.jit(_build)(jax.random.PRNGKey(0))
    tx = make_optimizer(tcfg, state.params)
    step = make_train_step(cfg, tcfg, tx, compute_dtype=dtype, packed=packed)

    def multi(state, batch, n):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=n)

    return cfg, state, jax.jit(multi, static_argnames=("n",), donate_argnums=(0,))


def padded_batch(samples, cfg, b: int, regions: int):
    """Reference-style collation: one sample per row, padded to SEQ."""
    ids = np.zeros((b, SEQ), np.int32)
    labels = np.full((b, SEQ), -100, np.int32)
    mask = np.zeros((b, SEQ), np.float32)
    boxes = np.zeros((b, regions, 4), np.float32)
    for r, s in enumerate(samples[:b]):
        l = len(s["input_ids"])
        ids[r, :l] = s["input_ids"]
        labels[r, :l] = s["labels"]
        mask[r, :l] = 1.0
        boxes[r] = s["boxes"]
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.asarray(mask),
        "images": jnp.zeros((b,) + (cfg.clip.image_size,) * 2 + (3,), jnp.float32),
        "boxes": jnp.asarray(boxes),
        "box_mask": jnp.ones((b, regions), bool),
    }


def time_multi(jit_multi, state, batch, k: int):
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
    float(np.asarray(losses)[-1])
    t_2k = time.perf_counter() - t0
    del state
    return (t_2k - t_k) / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2, help="rows per step, both paths")
    p.add_argument("--regions", type=int, default=16)
    p.add_argument("--depths", default="4,2")
    p.add_argument("--full_layers", type=int, default=32)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--nsamples", type=int, default=2048, help="stream for fill stats")
    p.add_argument("--max_images", type=int, default=0, help="0 = p95 of bin occupancy")
    p.add_argument("--json", action="store_true")
    p.add_argument("--worker", default=None, choices=["padded", "packed"],
                   help="measure ONE (mode, --layers) config and print its "
                   "step_ms JSON — used by the parent, which runs every "
                   "config in its own subprocess (an OOM/crash in one "
                   "config must not poison the device client for the rest; "
                   "measured failure mode on the axon tunnel, round 5)")
    p.add_argument("--layers", type=int, default=0, help="worker mode depth")
    p.add_argument("--config_timeout", type=int, default=600)
    p.add_argument("--packed_depths", default=None,
                   help="override depths for the packed mode only (e.g. '2' "
                   "— packed L=1/L=3 deterministically fault the TPU worker "
                   "on this chip, round-5 triage; a single packed depth "
                   "borrows the padded slope, see below)")
    args = p.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from gpt4roi_tpu.data.packing import PackSpec, collate_packed, first_fit_pack
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig
    from gpt4roi_tpu.models.llama import LlamaConfig

    if args.worker:
        # only workers touch the device; the parent stays host-only
        on_tpu = jax.default_backend() == "tpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
    else:
        dtype = None
    param_dtype = jnp.bfloat16

    cfg0 = Gpt4RoiConfig(clip=ClipVisionConfig.vit_l_14(), llama=LlamaConfig.llama_7b())
    rng = np.random.default_rng(0)
    samples = synth_samples(args.nsamples, rng, cfg0, args.regions)
    lengths = np.asarray([len(s["input_ids"]) for s in samples])
    sup = np.asarray([(s["labels"] != -100).sum() for s in samples])

    # ---- distribution bookkeeping (exact, host-side) ---------------------
    bins = first_fit_pack(lengths.tolist(), SEQ)
    occupancy = np.asarray([len(b) for b in bins])
    fill_pad = lengths.mean() / SEQ
    fill_pack = lengths.sum() / (len(bins) * SEQ)
    samples_per_row = args.nsamples / len(bins)
    max_images = args.max_images or int(
        np.ceil(np.percentile(occupancy, 95)) * args.batch
    )
    sup_per_sample = float(sup.mean())

    # ---- one representative packed batch for timing ----------------------
    # rows = batch; take the fullest bins (static max_images bounds images)
    order = np.argsort(-occupancy)
    chosen = []
    for bi in order:
        if len(bins[bi]) + len(chosen) <= max_images:
            chosen.extend(bins[bi][: max_images - len(chosen)])
        if len(chosen) >= max_images - 1:
            break
    pspec = PackSpec(
        seq_len=SEQ, max_regions=args.regions, image_size=cfg0.clip.image_size,
        pad_token_id=0, im_patch_token_id=cfg0.im_patch_token_id,
        bbox_token_id=cfg0.bbox_token_id, num_image_tokens=cfg0.num_image_tokens,
        max_images=max_images, rows=args.batch,
    )
    packed_np = collate_packed([samples[i] for i in chosen], pspec)

    depths = sorted({int(d) for d in args.depths.split(",")}, reverse=True)

    if args.worker:
        # single-config measurement (subprocess child): only here does a
        # TPU client get created
        L = args.layers
        cfg, state, jit_multi = build_step(
            "stage2", L, args.worker == "packed", param_dtype, dtype
        )
        if args.worker == "packed":
            batch = {k: jnp.asarray(v) for k, v in packed_np.items()}
        else:
            batch = padded_batch(samples, cfg, args.batch, args.regions)
        t = time_multi(jit_multi, state, batch, args.k)
        print(json.dumps({"mode": args.worker, "layers": L,
                          "step_ms": round(t * 1e3, 2)}))
        return

    # parent: every (mode, depth) runs in its OWN subprocess — a config
    # that OOMs or faults the worker must not poison the others (padded
    # then packed in one process reproducibly crashed the packed run
    # after the padded configs completed, round-5 triage). The parent
    # stays host-only (no TPU client — tunnel contention, CLAUDE.md).
    import subprocess

    res = {}
    for mode in ("padded", "packed"):
        ts, kept = [], []
        mode_depths = depths
        if mode == "packed" and args.packed_depths:
            mode_depths = sorted(
                {int(d) for d in args.packed_depths.split(",")}, reverse=True
            )
        for L in mode_depths:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--worker", mode, "--layers", str(L),
                "--batch", str(args.batch), "--regions", str(args.regions),
                "--k", str(args.k), "--nsamples", str(args.nsamples),
                "--max_images", str(args.max_images), "--depths", args.depths,
            ]
            try:
                proc = subprocess.run(
                    cmd, timeout=args.config_timeout,
                    stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
                )
                data = None
                for line in reversed(proc.stdout.strip().splitlines()):
                    try:
                        data = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
                assert data and data.get("step_ms", 0) > 0, f"rc={proc.returncode}"
                ts.append(data["step_ms"] / 1e3)
                kept.append(L)
            except Exception as e:
                print(f"{mode} L={L} failed ({type(e).__name__}): {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                continue
            print(f"{mode} L={L}: step {ts[-1] * 1e3:.1f} ms", file=sys.stderr, flush=True)
        assert len(kept) >= 1, f"{mode}: no depth measured"
        if len(kept) >= 2:
            slope = (ts[0] - ts[-1]) / (kept[0] - kept[-1])
        else:
            # one surviving depth (some packed depths fault the worker on
            # this chip — round-5 triage: L=2 runs clean, L=1/L=3 crash):
            # borrow the OTHER mode's measured slope. Padded and packed
            # rows run the IDENTICAL per-layer decoder work (same rows x
            # 2048 tokens; packing differs only in the segment mask and
            # the per-step vision/splice intercept), so the per-layer cost
            # is shared by construction; the borrowed-slope flag is
            # reported so the caveat travels with the number.
            other = res.get("padded") or res.get("packed")
            assert other, f"{mode}: single depth and no donor slope"
            slope = other["per_layer_ms"] / 1e3
            res[f"{mode}_slope_borrowed"] = True
        t_full = ts[0] + slope * (args.full_layers - kept[0])
        res[mode] = {"step_ms_each": [round(t * 1e3, 1) for t in ts],
                     "per_layer_ms": round(slope * 1e3, 2),
                     "step_ms_full": round(t_full * 1e3, 1),
                     "t_full": t_full}

    # effective throughput at 32 layers
    pad_samples_s = args.batch / res["padded"]["t_full"]
    pack_samples_s = samples_per_row * args.batch / res["packed"]["t_full"]
    out = {
        "seq": SEQ, "rows": args.batch, "regions": args.regions,
        "max_images": max_images, "depths": depths,
        "mean_len": round(float(lengths.mean()), 1),
        "fill_padded": round(float(fill_pad), 3),
        "fill_packed": round(float(fill_pack), 3),
        "samples_per_row_packed": round(float(samples_per_row), 2),
        "supervised_tok_per_sample": round(sup_per_sample, 1),
        "padded": {k: v for k, v in res["padded"].items() if k != "t_full"},
        "packed": {k: v for k, v in res["packed"].items() if k != "t_full"},
        "padded_samples_per_sec": round(pad_samples_s, 3),
        "packed_samples_per_sec": round(pack_samples_s, 3),
        "padded_supervised_tok_per_sec": round(pad_samples_s * sup_per_sample, 1),
        "packed_supervised_tok_per_sec": round(pack_samples_s * sup_per_sample, 1),
        "packing_speedup": round(pack_samples_s / pad_samples_s, 2),
        **{k: v for k, v in res.items() if k.endswith("_slope_borrowed")},
    }
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
