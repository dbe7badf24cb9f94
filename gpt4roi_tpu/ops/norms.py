"""Normalisation primitives (functional, NHWC / channels-last).

Equivalents of the live mmcv/torch layers: GroupNorm(64) inside the fuse
convs (reference: gpt4roi/models/layers.py:140-143), LayerNorm in the box
pos-embed MLP (layers.py:260-267) and CLIP, RMSNorm in LLaMA. All reduce in
float32 and cast back — bf16-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def group_norm(
    x: jax.Array,  # (..., H, W, C)
    scale: jax.Array,  # (C,)
    bias: jax.Array,  # (C,)
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over (H, W, C//G) per group, channels-last."""
    *lead, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    xf = x.astype(jnp.float32).reshape(*lead, h, w, num_groups, c // num_groups)
    axes = (-4, -3, -1)
    # single-stats-pass form (E[x^2] - mean^2): one fewer full read of the
    # activation than the two-pass variance — fp32 accumulation keeps it
    # stable for normalised activations
    mean = xf.mean(axis=axes, keepdims=True)
    sq = jnp.mean(xf * xf, axis=axes, keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(*lead, h, w, c)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
