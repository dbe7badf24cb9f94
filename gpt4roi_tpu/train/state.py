"""Optimizer / train-state construction with stage-selective freezing.

The reference freezes by LR-group surgery inside a custom HF Trainer: under
``ONLY_SPI`` the SPI module gets the real lr (wd 0.01) and *everything else
gets lr=0* (reference: gpt4roi/train/llava_trainer.py:69-129), plus FSDP
``use_orig_params`` monkey-patching to tolerate frozen params (train.py:
654-676). TPU-native: an ``optax.multi_transform`` whose frozen partition is
``set_to_zero`` — no optimizer state is even allocated for frozen params,
and the CLIP tower is additionally ``stop_gradient``-ed in the model.

Stages (reference: train_stage1.sh, train_stage2.sh):
  * stage1 — train SPI only (optionally + mm_projector/embeddings via
    ``PROJ``; llava_trainer.py:88-111);
  * stage2 — train everything except the vision tower.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    stage: str = "stage2"  # stage1 | stage1_proj | stage2 | all
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    spi_weight_decay: float = 0.01
    warmup_steps: int = 0
    warmup_ratio: float = 0.0
    total_steps: int = 10000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_clip: float = 1.0
    min_lr_ratio: float = 0.0
    # 'adamw' or 'adamw8bit' (blockwise int8 moments — the reference's
    # bitsandbytes Adam8bit / low-memory branch, llava_trainer.py:133-157)
    optimizer: str = "adamw"
    # gradient checkpointing policy per decoder layer (models/llama.py::
    # apply_remat): "full" = the reference's --gradient_checkpointing
    # (train_stage2.sh:53 — save layer inputs, recompute everything, ~+2PD
    # FLOPs/token); "dots" = save weight-matmul outputs, recompute only
    # elementwise + attention (near-zero extra FLOPs, ~2x activation bytes);
    # "none" = no remat. bool kept for backward compat (True == "full").
    remat: Any = "full"
    # adamw8bit only: the update emits NEW PARAMS directly (apply_updates
    # folded into the fused kernel — saves the separate read-p/read-upd/
    # write-p HBM pass, ~6 B/param/step); make_train_step merges with the
    # frozen partition by stage label. Checkpoint layout is unchanged.
    fused_apply: bool = True


def param_labels(params: Any, stage: str) -> Any:
    """Label each leaf 'train' / 'spi' / 'frozen' by its top-level subtree."""

    def label_tree(subtree: str, tree: Any) -> Any:
        if subtree == "clip":
            lab = "frozen"
        elif subtree == "spi":
            lab = "spi" if stage in ("stage1", "stage1_proj") else "train"
        elif subtree == "mm_projector":
            lab = {"stage1": "frozen", "stage1_proj": "train"}.get(stage, "train")
        else:  # llama
            lab = "frozen" if stage in ("stage1", "stage1_proj") else "train"
        return jax.tree_util.tree_map(lambda _: lab, tree)

    return {k: label_tree(k, v) for k, v in params.items()}


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    warmup = cfg.warmup_steps or int(cfg.warmup_ratio * cfg.total_steps)
    if warmup <= 0:
        return optax.cosine_decay_schedule(
            init_value=cfg.learning_rate,
            decay_steps=max(cfg.total_steps, 2),
            alpha=cfg.min_lr_ratio,
        )
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, 2),
        end_value=cfg.learning_rate * cfg.min_lr_ratio,
    )


def _decay_mask(params: Any) -> Any:
    """No weight decay on 1-D params (biases, norm scales) — the reference's
    decay/no-decay split (llava_trainer.py:113-129)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg)

    def adamw(wd: float) -> optax.GradientTransformation:
        if cfg.optimizer == "adamw8bit":
            from gpt4roi_tpu.train.optim8bit import adamw_8bit

            # grad clipping is FOLDED into the 8-bit update (a scalar
            # factor inside the fused per-layer math) instead of a
            # separate chain stage: the standalone clip materialises a
            # scaled copy of the whole grad tree (~3.2 GB bf16 at 7B/L=8)
            inner = adamw_8bit(
                schedule, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                weight_decay=wd, mask=_decay_mask if wd > 0 else None,
                clip_global_norm=cfg.grad_clip or None,
                emit_new_params=getattr(cfg, "fused_apply", False),
            )
            return inner
        else:
            inner = optax.adamw(
                schedule,
                b1=cfg.b1,
                b2=cfg.b2,
                eps=cfg.eps,
                weight_decay=wd,
                mask=_decay_mask if wd > 0 else None,
            )
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)

    labels = param_labels(params, cfg.stage)
    return optax.multi_transform(
        {
            "train": adamw(cfg.weight_decay),
            "spi": adamw(cfg.spi_weight_decay),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params: Any, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
