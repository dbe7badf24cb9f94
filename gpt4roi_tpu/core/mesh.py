"""Device-mesh + sharding helpers.

The reference distributes training via torchrun + DDP (stage 1) / FSDP
(stage 2) over NCCL (reference: train_stage1.sh:11, train_stage2.sh:29,51-52).
TPU-native replacement: a single ``jax.sharding.Mesh`` with a ``data`` axis
(batch sharding; DDP equivalent) and an optional ``fsdp`` factorisation where
parameters are sharded along ``data`` as well (ZeRO-3 equivalent) — XLA emits
the all-gather / reduce-scatter collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. ``model=1`` gives pure data/FSDP layout."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs (leading axis over the data axis)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(path: str, shape: Sequence[int], mesh: Mesh, min_size: int = 2**16) -> P:
    """FSDP-style spec: shard the largest divisible axis of big params along
    the data axis; small params stay replicated.

    Replaces the reference's ``--fsdp full_shard auto_wrap`` +
    use_orig_params monkey-patch for partially-frozen params (reference:
    gpt4roi/train/train.py:654-676).
    """
    ndata = mesh.shape[DATA_AXIS]
    if int(np.prod(shape)) < min_size:
        return P()
    # Prefer sharding the largest axis that divides evenly.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % ndata == 0 and shape[ax] >= ndata:
            spec = [None] * len(shape)
            spec[ax] = DATA_AXIS
            return P(*spec)
    return P()


def tree_fsdp_shardings(params, mesh: Mesh, min_size: int = 2**16):
    """Map a param pytree to NamedShardings using fsdp_param_spec."""

    def one(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return NamedSharding(mesh, fsdp_param_spec(name, leaf.shape, mesh, min_size))

    return jax.tree_util.tree_map_with_path(one, params)


# Megatron-style tensor-parallel layout for the LLaMA/MPT decoder matrices
# (the reference has NO tensor parallelism — SURVEY.md §2.5; this is a
# beyond-reference capability for serving latency / >1-chip model scale):
# column-parallel (shard output dim): q/k/v/gate/up/wqkv; row-parallel
# (shard input dim): o/down/out_proj. XLA SPMD inserts the all-reduces.
_TP_COL = ("/q/", "/k/", "/v/", "/gate/", "/up/", "/wqkv/", "/qkv/", "/gate_up/")
_TP_ROW = ("/o/", "/down/", "/out_proj/")


def tp_param_spec(name: str, shape, mesh: Mesh, min_size: int = 2**16) -> P:
    nmodel = mesh.shape.get(MODEL_AXIS, 1)
    name = "/" + name + "/"
    if nmodel > 1 and len(shape) == 2:
        if any(t in name for t in _TP_COL) and shape[1] % nmodel == 0:
            return P(None, MODEL_AXIS)
        if any(t in name for t in _TP_ROW) and shape[0] % nmodel == 0:
            return P(MODEL_AXIS, None)
    if nmodel > 1 and len(shape) == 3:
        # stacked serving layout (L, in, out); fused qkv/gate_up columns
        # shard fine — SPMD keeps logical semantics across the splits
        if any(t in name for t in _TP_COL) and shape[2] % nmodel == 0:
            return P(None, None, MODEL_AXIS)
        if any(t in name for t in _TP_ROW) and shape[1] % nmodel == 0:
            return P(None, MODEL_AXIS, None)
    return fsdp_param_spec(name, shape, mesh, min_size)


def tree_tp_shardings(params, mesh: Mesh, min_size: int = 2**16):
    """FSDP(data) x TP(model) shardings for a decoder param tree."""

    def one(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return NamedSharding(mesh, tp_param_spec(name, leaf.shape, mesh, min_size))

    return jax.tree_util.tree_map_with_path(one, params)
