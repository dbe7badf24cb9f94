"""Training entry points: ``python -m gpt4roi_tpu.train.cli stage1|stage2``.

Replaces ``train_stage1.sh``/``train_stage2.sh`` + torchrun + HF Trainer
(reference: gpt4roi/train/train.py:541-715). The env-var switches the
reference relies on (ONLY_SPI/PROJ/NORM_ATTN/SAVE_MEMORY) become explicit
flags; parallelism is a jax Mesh instead of process ranks (multi-host: call
``jax.distributed.initialize`` before building the mesh, controlled by
``--multihost``).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="gpt4roi_tpu trainer")
    p.add_argument("stage", choices=["stage1", "stage1_proj", "stage2", "all"])
    p.add_argument("--model_name_or_path", default=None, help="HF llama/vicuna checkpoint dir")
    p.add_argument("--vision_tower", default=None, help="HF CLIP checkpoint dir")
    p.add_argument("--pretrain_mm_mlp_adapter", default=None, help="projector .bin")
    p.add_argument("--init_params_npz", default=None, help="npz param export to warm-start from")
    p.add_argument("--stage1_checkpoint", default=None, help="weights-only init from stage-1 ckpt dir")
    p.add_argument("--dataset_config", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--per_device_batch_size", type=int, default=2)
    p.add_argument("--num_epochs", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--warmup_ratio", type=float, default=0.003)
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--max_regions", type=int, default=32)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument(
        "--remat", default="full", choices=["full", "dots", "none"],
        help="gradient-checkpointing policy: full = reference "
        "--gradient_checkpointing; dots = save matmul outputs, recompute "
        "elementwise/attention only (faster, more activation memory)")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--tiny_model", action="store_true", help="debug: tiny config")
    p.add_argument("--max_steps", type=int, default=0, help="debug: stop early")
    p.add_argument(
        "--optimizer",
        default="adamw",
        choices=["adamw", "adamw8bit"],
        help="adamw8bit stores Adam moments as blockwise int8 (~4x less "
        "optimizer memory — the reference's bitsandbytes/low-mem branch, "
        "llava_trainer.py:133-157)",
    )
    p.add_argument(
        "--version",
        default="v0",
        choices=["v0", "v1", "vicuna_v1_1", "mpt"],
        help="conversation template / preprocessing style (reference: "
        "train.py:589-607 — v0 SINGLE, v1 vicuna TWO, mpt ChatML)",
    )
    p.add_argument(
        "--decoder",
        default="llama",
        choices=["llama", "mpt"],
        help="decoder family (reference selects MPT when the model path "
        "contains 'mpt', train.py:547-551)",
    )
    p.add_argument(
        "--scan_layers",
        action="store_true",
        help="stacked-layer params + lax.scan over the decoder (7B train-"
        "step compile drops from minutes to seconds; identical numerics)",
    )
    p.add_argument(
        "--packing",
        action="store_true",
        help="pack multiple samples per row (segment-masked attention); "
        "per_device_batch_size then counts RAW samples per device",
    )
    return p.parse_args(argv)


def build_tokenizer(model_path: Optional[str], model_max_length: int):
    from transformers import AutoTokenizer

    from gpt4roi_tpu.data.constants import SPECIAL_TOKENS

    tok = AutoTokenizer.from_pretrained(
        model_path, model_max_length=model_max_length, use_fast=True
    )
    if tok.pad_token is None:
        tok.pad_token = tok.unk_token or tok.eos_token
    tok.add_tokens(SPECIAL_TOKENS, special_tokens=True)
    return tok


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp

    from gpt4roi_tpu.core.mesh import make_mesh
    from gpt4roi_tpu.data.collate import BatchSpec
    from gpt4roi_tpu.data.constants import SPECIAL_TOKENS
    from gpt4roi_tpu.data.module import BatchLoader, make_multitask_dataset
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.train import checkpoints as ckpt
    from gpt4roi_tpu.train.loop import make_sharded_train_step
    from gpt4roi_tpu.train.state import TrainConfig
    from jax.sharding import NamedSharding, PartitionSpec as P

    os.makedirs(args.output_dir, exist_ok=True)

    # conversation template selection (reference train.py:589-607: v0 keeps
    # the default; otherwise mpt/vicuna template by model family)
    from gpt4roi_tpu.data import conversation as conversation_lib

    if args.version != "v0":
        key_ = "mpt" if (args.decoder == "mpt" or args.version == "mpt") else "vicuna_v1_1"
        conversation_lib.default_conversation = conversation_lib.conv_templates[key_]

    mesh = make_mesh()
    n_dev = mesh.devices.size
    global_batch = args.per_device_batch_size * n_dev

    # --- tokenizer + model config ----------------------------------------
    if args.tiny_model or args.model_name_or_path is None:
        from tests.toy_tokenizer import ToyTokenizer  # pragma: no cover - debug path

        tokenizer = ToyTokenizer(model_max_length=args.model_max_length)
        tokenizer.convert_tokens_to_ids(SPECIAL_TOKENS)
        cfg = Gpt4RoiConfig.tiny(vocab_size=512)
        if args.decoder == "mpt":
            import dataclasses

            from gpt4roi_tpu.models.mpt import MptConfig

            cfg = dataclasses.replace(
                cfg, decoder_type="mpt", mpt=MptConfig.tiny(vocab_size=512)
            )
    else:
        tokenizer = build_tokenizer(args.model_name_or_path, args.model_max_length)
        ids = tokenizer.convert_tokens_to_ids(SPECIAL_TOKENS)
        import dataclasses

        from gpt4roi_tpu.models.llama import LlamaConfig

        cfg = Gpt4RoiConfig(
            llama=LlamaConfig.llama_7b(vocab_size=len(tokenizer)),
            im_patch_token_id=ids[0],
            bbox_token_id=ids[1],
            point_token_id=ids[2],
            im_start_token_id=ids[3],
            im_end_token_id=ids[4],
        )
        if args.decoder == "mpt":
            from gpt4roi_tpu.models.mpt import MptConfig

            cfg = dataclasses.replace(
                cfg, decoder_type="mpt",
                mpt=MptConfig.mpt_7b(vocab_size=len(tokenizer)),
            )

    # --- params -----------------------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    params = init_gpt4roi_params(key, cfg)
    if args.model_name_or_path and not args.tiny_model:
        params = load_pretrained(params, cfg, args)
    if args.init_params_npz:
        params = ckpt.load_params_npz(args.init_params_npz, params)
    if args.stage1_checkpoint:
        params = ckpt.restore_params_only(args.stage1_checkpoint, params)
    if args.scan_layers and "llama" in params:
        from gpt4roi_tpu.models.llama import to_stacked_params

        params = dict(params)
        params["llama"] = to_stacked_params(params["llama"])

    # --- data -------------------------------------------------------------
    dataset = make_multitask_dataset(
        args.dataset_config, tokenizer, seed=args.seed,
        patch_size=cfg.clip.patch_size, image_size=cfg.clip.image_size,
    )
    pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
    if args.packing:
        from gpt4roi_tpu.data.module import PackedBatchLoader
        from gpt4roi_tpu.data.packing import PackSpec

        # raw samples per batch; rows sized for a ~60% fill worst case
        rows = max(n_dev, (global_batch + 1) // 2)
        pspec = PackSpec(
            seq_len=args.model_max_length,
            max_regions=args.max_regions,
            image_size=cfg.clip.image_size,
            pad_token_id=pad_id,
            im_patch_token_id=cfg.im_patch_token_id,
            bbox_token_id=cfg.bbox_token_id,
            num_image_tokens=cfg.num_image_tokens,
            max_images=((global_batch + n_dev - 1) // n_dev) * n_dev,
            rows=((rows + n_dev - 1) // n_dev) * n_dev,
        )
        loader = PackedBatchLoader(dataset, global_batch, pspec, seed=args.seed,
            host_id=jax.process_index(), num_hosts=jax.process_count())
    else:
        spec = BatchSpec(
            seq_len=args.model_max_length,
            max_regions=args.max_regions,
            image_size=cfg.clip.image_size,
            pad_token_id=pad_id,
        )
        loader = BatchLoader(dataset, global_batch, spec, seed=args.seed,
            host_id=jax.process_index(), num_hosts=jax.process_count())
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * args.num_epochs
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)

    tcfg = TrainConfig(
        stage=args.stage,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        warmup_ratio=args.warmup_ratio,
        total_steps=total_steps,
        optimizer=args.optimizer,
        remat=args.remat,
    )
    compute_dtype = jnp.bfloat16 if args.bf16 and jax.default_backend() == "tpu" else jnp.float32
    jit_step, init_state, _ = make_sharded_train_step(
        cfg, tcfg, mesh, params, compute_dtype, packed=args.packing
    )
    state = init_state(params)
    del params

    # auto-resume (reference: train.py:708-712)
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    last = ckpt.latest_step(ckpt_dir)
    if last is not None:
        print(f"auto-resuming from step {last}")
        state = ckpt.restore_checkpoint(ckpt_dir, state)

    batch_sh = NamedSharding(mesh, P("data"))
    step = int(np.asarray(state.step))
    log_path = os.path.join(args.output_dir, "train.log")
    t_start = time.time()
    done = False
    for epoch in range(args.num_epochs):
        if done:
            break
        for batch in loader:
            if step >= total_steps:
                done = True
                break
            batch = {
                k: jax.device_put(v, batch_sh) for k, v in batch.items() if k != "num_images"
            }
            state, metrics = jit_step(state, batch)
            step += 1
            if step % args.logging_steps == 0:
                loss = float(metrics["loss"])
                line = json.dumps(
                    {"step": step, "epoch": epoch, "loss": round(loss, 5),
                     "grad_norm": round(float(metrics["grad_norm"]), 4),
                     "elapsed_s": round(time.time() - t_start, 1)}
                )
                print(line)
                with open(log_path, "a") as f:
                    f.write(line + "\n")
            if step % args.save_steps == 0:
                ckpt.save_checkpoint(ckpt_dir, state, step)
    ckpt.save_checkpoint(ckpt_dir, state, step)
    ckpt.save_params_npz(os.path.join(args.output_dir, "params_final.npz"), state.params)
    print(f"training done at step {step}")


def load_pretrained(params, cfg, args):
    """Load HF llama + CLIP + projector weights (reference:
    llava/model/llava.py:54-86, spi_llava.py:260-296)."""
    import torch

    from gpt4roi_tpu.utils.weights import convert_clip_vision, convert_llama

    if args.vision_tower:
        from transformers import CLIPVisionModel

        clip = CLIPVisionModel.from_pretrained(args.vision_tower)
        params["clip"] = convert_clip_vision(clip.state_dict(), cfg.clip.num_layers)
    from transformers import AutoModelForCausalLM

    lm = AutoModelForCausalLM.from_pretrained(args.model_name_or_path, torch_dtype=torch.float32)
    lm.resize_token_embeddings(cfg.llama.vocab_size)
    # new-token embeddings <- mean of old (spi_llava.py:260-272)
    with torch.no_grad():
        n_new = cfg.llama.vocab_size - lm.config.vocab_size if lm.config.vocab_size < cfg.llama.vocab_size else 0
        if n_new > 0:
            emb = lm.get_input_embeddings().weight
            emb[-n_new:] = emb[:-n_new].mean(0, keepdim=True)
            out = lm.get_output_embeddings().weight
            out[-n_new:] = out[:-n_new].mean(0, keepdim=True)
    params["llama"] = convert_llama(lm.state_dict(), cfg.llama.num_layers)
    if args.pretrain_mm_mlp_adapter:
        sd = torch.load(args.pretrain_mm_mlp_adapter, map_location="cpu")
        w = sd["model.mm_projector.weight"].float().numpy()
        b = sd["model.mm_projector.bias"].float().numpy()
        params["mm_projector"] = {"kernel": w.T.copy(), "bias": b}
        if "model.embed_tokens.weight" in sd:
            et = sd["model.embed_tokens.weight"].float().numpy()
            emb = params["llama"]["embed"]["embedding"]
            n = min(len(et), len(emb))
            emb[:n] = et[:n]
    return params


if __name__ == "__main__":
    main()
