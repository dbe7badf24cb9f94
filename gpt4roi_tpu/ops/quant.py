"""Int8 weight-only quantization for the LLaMA decode path.

7B bf16 decode on one v5e is weight-bandwidth-bound (~14 GB of weights per
token, ~19 ms/tok measured ≈ HBM roofline). Halving the weight bytes with
per-output-channel symmetric int8 halves the roofline; a naive XLA
dequant-in-matmul recovers only ~1.2x because XLA materialises the
dequantised tile in HBM for large weights. This Pallas kernel streams int8
weight tiles HBM->VMEM, widens them to bf16 in VMEM (int8 values are exact
in bf16), runs the MXU matmul, and applies the per-channel scale in the
epilogue — HBM traffic stays at int8 bytes.

Numerics: w ~= q * scale with q = round(w / scale), scale = max|w| / 127
per output channel, so weight error is <= scale/2 (~2^-8 relative), the
same order as bf16 weight rounding. Activations stay bf16; accumulation is
fp32 on the MXU.

Reference match: the serving decode loop this accelerates is
llava/serve/model_worker.py:182-260 (fp16 HF generate on A100); the
reference has no quantized path — this is a beyond-reference capability.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
class QuantDense:
    """Int8 weight-only linear: kernel_q (in, out_padded) int8 + per-channel
    scale (1, out_padded) fp32. ``out_dim`` (the logical output width) and
    ``mode`` (matmul path for this weight, see quant_matmul) are pytree aux
    data so they stay static under jit. Dict-style access kept for drop-in
    use next to plain param dicts."""

    def __init__(self, kernel_q, scale, out_dim: int, mode: Optional[str] = None):
        self.kernel_q = kernel_q
        self.scale = scale
        self.out_dim = out_dim
        self.mode = mode

    def __contains__(self, k):
        return k in ("kernel_q", "scale")

    def __getitem__(self, k):
        return getattr(self, k)

    def tree_flatten(self):
        return (self.kernel_q, self.scale), (self.out_dim, self.mode)

    @classmethod
    def tree_unflatten(cls, aux, children):
        out_dim, mode = aux if isinstance(aux, tuple) else (aux, None)
        return cls(children[0], children[1], out_dim, mode)

    @property
    def dense_q(self):
        return self.kernel_q


def quantize_weight(
    w: jax.Array, pad_out_to: int = 256, mode: Optional[str] = None
) -> "QuantDense":
    """Per-output-channel symmetric int8: w (in, out) -> kernel_q (in, out'),
    scale (out',) fp32, out' = out padded to a multiple of ``pad_out_to``
    (zero scale at pad columns -> exact-zero outputs, sliced by the caller).
    ``mode`` pins this weight's matmul path (else env/default applies)."""
    w = w.astype(jnp.float32)
    inner, out = w.shape
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    pad = (-out) % pad_out_to
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad)))
        scale = jnp.pad(jnp.where(amax > 0, scale, 0.0), (0, pad))
    else:
        scale = jnp.where(amax > 0, scale, 0.0)
    return QuantDense(q, scale.astype(jnp.float32).reshape(1, -1), out, mode)


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[...].astype(jnp.bfloat16)  # (IN, OB) widen in VMEM
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, OB) fp32
    o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)  # s (1, OB)


def _pick_ob(out: int, inner: int, budget: int = 12 * 2**20) -> int:
    ob = 512
    while ob > 128 and (out % ob != 0 or 2 * inner * ob > budget):
        ob //= 2
    while out % ob != 0:
        ob //= 2
    return max(ob, 1)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _qmm_pallas(x: jax.Array, q: jax.Array, scale: jax.Array, out_dtype=jnp.bfloat16):
    m, inner = x.shape
    _, out = q.shape
    ob = _pick_ob(out, inner)
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    y = pl.pallas_call(
        _qmm_kernel,
        grid=(out // ob,),
        in_specs=[
            pl.BlockSpec((mp, inner), lambda oi: (0, 0)),
            pl.BlockSpec((inner, ob), lambda oi: (0, oi)),
            # scale passed 2D: 1D f32 operands hit XLA/Mosaic layout
            # mismatches (T(1024) vs T(256)) on v5e
            pl.BlockSpec((1, ob), lambda oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec((mp, ob), lambda oi: (0, oi)),
        out_shape=jax.ShapeDtypeStruct((mp, out), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * inner * out,
            bytes_accessed=inner * out + mp * inner * 2 + mp * out * 2,
            transcendentals=0,
        ),
    )(x, q, scale)
    return y[:m]


def _w8a8_matmul(x2: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """Dynamic per-row (per-token) activation quantization + int8 x int8 dot.

    xq = round(x / sx) with sx = max|x|/127 per row; the dot runs int8 on
    the MXU (no VPU widen of the WEIGHT operand — the decode bottleneck),
    accumulates int32, and the fp32 epilogue applies sx * sw. Activation
    error is per-token absmax int8 (~2^-7 relative) on top of the weight's
    per-channel int8 — the standard W8A8 class."""
    ax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sx) * scale


_DEFAULT_MODE = None  # programmatic override; env GPT4ROI_QMM wins if set


def set_default_mode(mode: str) -> None:
    """Select the quantized-matmul path ('xla' | 'pallas' | 'w8a8') for
    callers that can't thread an argument through (serving engine)."""
    global _DEFAULT_MODE
    assert mode in ("xla", "pallas", "w8a8")
    _DEFAULT_MODE = mode


def quant_matmul(x: jax.Array, qp: "QuantDense") -> jax.Array:
    """x (..., in) bf16/fp32 @ quantized weights -> (..., out_dim).

    Backend notes (v5e, measured): int8 processing is bounded at ~275 GB/s
    by the VPU sub-32-bit unpack rate — NOT by HBM (bf16 reads stream at
    ~500-700 GB/s; raw int8 converts at only ~50-275 GB/s depending on op
    shape). XLA's fused widen-in-matmul sustains that VPU bound; a Pallas
    widen kernel measured strictly worse (100-150 GB/s: per-step widen and
    M=8 MXU ops serialise). Mode select via GPT4ROI_QMM:
      xla (default)  — XLA dequant-in-matmul, weight-only error class
      pallas         — Pallas widen kernel (future Mosaic int8 support)
      w8a8           — dynamic per-token int8 activations, int8 x int8 on
                       the MXU natively (skips the weight widen entirely)"""
    out_dim = qp.out_dim
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    mode = os.environ.get("GPT4ROI_QMM") or qp.mode or _DEFAULT_MODE or "xla"
    if mode == "w8a8":
        y = _w8a8_matmul(x2, qp.kernel_q, qp.scale).astype(x.dtype)
    elif (
        mode == "pallas"
        and jax.default_backend() == "tpu"
        and x2.shape[-1] % 128 == 0
    ):
        y = _qmm_pallas(x2, qp.kernel_q, qp.scale, out_dtype=x.dtype)
    else:
        y = (x2 @ qp.dense_q.astype(x.dtype)) * qp.scale.astype(x.dtype)
    return y[:, :out_dim].reshape(*lead, out_dim)


def quantize_llama_params(
    params: Dict, keep_embed: bool = True, fuse_proj: bool = True,
    mode: Optional[str] = None,
) -> Dict:
    """Quantize every decoder projection (q/k/v/o/gate/up/down + lm_head)
    to int8; norms and the embedding table stay in their original dtype.

    ``fuse_proj`` concatenates q|k|v and gate|up into single quantized
    weights (models/llama.py::_qkv_proj/_mlp split the outputs): decode is
    weight-bandwidth-bound, so fewer/larger weight streams and ONE
    activation quantization per group beat three/two small ones. Exact
    same numerics — per-output-channel scales are preserved through the
    concat, and the 4096-multiple split boundaries precede the padding."""
    quant_keys = {"q", "k", "v", "o", "gate", "up", "down"}
    new_layers = []
    for lp in params["layers"]:
        nl = {}
        for k, v in lp.items():
            if k not in quant_keys:
                nl[k] = v
        if fuse_proj:
            qkv = jnp.concatenate(
                [lp["q"]["kernel"], lp["k"]["kernel"], lp["v"]["kernel"]], axis=1
            )
            gate_up = jnp.concatenate(
                [lp["gate"]["kernel"], lp["up"]["kernel"]], axis=1
            )
            nl["qkv"] = quantize_weight(qkv, mode=mode)
            nl["gate_up"] = quantize_weight(gate_up, mode=mode)
            nl["o"] = quantize_weight(lp["o"]["kernel"], mode=mode)
            nl["down"] = quantize_weight(lp["down"]["kernel"], mode=mode)
        else:
            for k in quant_keys:
                nl[k] = quantize_weight(lp[k]["kernel"], mode=mode)
        new_layers.append(nl)
    out = dict(params)
    out["layers"] = new_layers
    out["lm_head"] = quantize_weight(params["lm_head"]["kernel"], mode=mode)
    return out
