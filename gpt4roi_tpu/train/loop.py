"""Sharded training step.

Replaces the reference's torchrun + HF Trainer + DDP/FSDP inner loop
(reference: gpt4roi/train/train.py:698-712, train_stage2.sh:51-52): a single
jitted step over a ``Mesh`` where batches shard on the ``data`` axis and
large params shard FSDP-style on the same axis; XLA inserts the
all-gather / reduce-scatter collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt4roi_tpu.core.mesh import DATA_AXIS, tree_fsdp_shardings, tree_tp_shardings
from gpt4roi_tpu.models.gpt4roi import (
    Gpt4RoiConfig,
    gpt4roi_forward,
    gpt4roi_forward_packed,
)
from gpt4roi_tpu.train.state import TrainConfig, TrainState, make_optimizer


def freeze_for_stage(params, stage: str):
    """stop_gradient frozen subtrees so XLA never materialises their grads
    (the optimizer's set_to_zero partition would discard them anyway, but
    at 7B scale the zero cotangent tree alone is GBs)."""
    from gpt4roi_tpu.train.state import param_labels

    labels = param_labels(params, stage)

    def one(p, lab):
        return jax.lax.stop_gradient(p) if lab == "frozen" else p

    return jax.tree_util.tree_map(one, params, labels)


def loss_fn(
    params, cfg: Gpt4RoiConfig, batch: Dict[str, jax.Array], compute_dtype, remat: bool = True,
    stage: str = "all",
) -> jax.Array:
    if stage != "all":
        params = freeze_for_stage(params, stage)
    out = gpt4roi_forward(
        params,
        cfg,
        batch["input_ids"],
        batch["images"],
        batch["boxes"],
        batch["box_mask"],
        attention_mask=batch["attention_mask"],
        labels=batch["labels"],
        compute_dtype=compute_dtype,
        remat=remat,
    )
    return out["loss"]


def packed_loss_fn(
    params, cfg: Gpt4RoiConfig, batch: Dict[str, jax.Array], compute_dtype, remat: bool = True,
    stage: str = "all",
) -> jax.Array:
    if stage != "all":
        params = freeze_for_stage(params, stage)
    out = gpt4roi_forward_packed(params, cfg, batch, compute_dtype=compute_dtype, remat=remat)
    return out["loss"]


def make_train_step(
    cfg: Gpt4RoiConfig,
    tcfg: TrainConfig,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    packed: bool = False,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    loss = packed_loss_fn if packed else loss_fn
    loss = functools.partial(loss, stage=tcfg.stage, remat=getattr(tcfg, "remat", "full"))
    # adamw8bit with fused_apply: tx.update's "updates" ARE the new params
    # (apply folded into the kernel, train/optim8bit.py); merge with the
    # frozen partition (whose updates stay zero) by stage label
    emits_new = tcfg.optimizer == "adamw8bit" and getattr(tcfg, "fused_apply", False)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        loss_val, grads = jax.value_and_grad(loss)(state.params, cfg, batch, compute_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if emits_new:
            from gpt4roi_tpu.train.state import param_labels

            labels = param_labels(state.params, tcfg.stage)
            params = jax.tree_util.tree_map(
                lambda lab, p, u: p if lab == "frozen" else u,
                labels, state.params, updates,
            )
        else:
            params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss_val, "grad_norm": gnorm}
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def shard_batch_spec(batch: Dict[str, Any]) -> Dict[str, P]:
    return {k: P(DATA_AXIS) for k in batch}


def make_sharded_train_step(
    cfg: Gpt4RoiConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    params: Any,
    compute_dtype=jnp.bfloat16,
    fsdp_min_size: int = 2**16,
    packed: bool = False,
    tensor_parallel: bool = False,
):
    """Build (jitted_step, init_fn, param_shardings). ``init_fn`` places an
    existing host param tree onto the mesh with FSDP shardings and creates
    the optimizer state with matching layouts. Params smaller than
    ``fsdp_min_size`` elements stay replicated. ``packed=True`` expects
    packed batches (data.packing; image count must divide the data axis).

    ``tensor_parallel=True`` on a 2D (data, model) mesh lays decoder
    matrices out Megatron-style along ``model`` (column/row-parallel,
    core/mesh.py::tree_tp_shardings) while everything else stays FSDP along
    ``data`` — a combined FSDP x TP 2D training step (beyond-reference;
    the reference's FSDP recipe is train_stage2.sh:51-52). XLA SPMD
    inserts the all-reduce/all-gather collectives; the masked (frozen-
    param) optimizer applies unchanged."""
    tx = make_optimizer(tcfg, params)
    step = make_train_step(cfg, tcfg, tx, compute_dtype, packed=packed)

    shard_fn = tree_tp_shardings if tensor_parallel else tree_fsdp_shardings
    param_sh = shard_fn(params, mesh, fsdp_min_size)
    repl = NamedSharding(mesh, P())

    def init_state(host_params) -> TrainState:
        dev_params = jax.tree_util.tree_map(jax.device_put, host_params, param_sh)
        opt_state = jax.jit(
            tx.init,
            out_shardings=None,  # let XLA propagate from param shardings
        )(dev_params)
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), repl),
            params=dev_params,
            opt_state=opt_state,
        )

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    jit_step = jax.jit(
        step,
        in_shardings=(None, batch_sh),
        donate_argnums=(0,),
    )
    return jit_step, init_state, param_sh
