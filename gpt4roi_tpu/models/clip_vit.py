"""CLIP ViT vision tower (functional JAX, channels-last, hidden states out).

Capability parity with the frozen ``CLIPVisionModel`` the reference loads
(openai/clip-vit-large-patch14; reference: llava/model/llava.py:54-86), whose
intermediate hidden states feed both the 256 image tokens
(``hidden_states[-2][:, 1:]``) and the 4 SPI pyramid levels
(``hidden_states[-2::-3]`` reversed -> ViT layers {14,17,20,23}; reference:
gpt4roi/models/spi_llava.py:58-82).

TPU-first choices: the 14x14/stride-14 patch conv is a pure reshape+matmul
(stride == kernel, so it is exactly a block-diagonal projection -> one MXU
matmul instead of a conv); QuickGELU; softmax in fp32; everything static.

``hidden_states`` layout matches HF: entry 0 is the post-pre-layernorm
embedding sequence, entry i is the output of encoder layer i (25 entries for
L=24), each (B, 257, D) with the CLS token at position 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.ops.attention import mha
from gpt4roi_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # CLS

    @classmethod
    def vit_l_14(cls) -> "ClipVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ClipVisionConfig":
        """Small config for tests."""
        return cls(image_size=28, patch_size=14, hidden_size=64, intermediate_size=128, num_layers=4, num_heads=4)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


Params = Dict[str, Any]


def init_clip_params(key: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32) -> Params:
    d, m = cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(key, 4 + cfg.num_layers)

    def dense(k, i, o):
        return {
            "kernel": jax.random.normal(k, (i, o), dtype) * (i**-0.5),
            "bias": jnp.zeros((o,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(keys[4 + li], 6)
        layers.append(
            {
                "ln1": ln(),
                "q": dense(ks[0], d, d),
                "k": dense(ks[1], d, d),
                "v": dense(ks[2], d, d),
                "o": dense(ks[3], d, d),
                "ln2": ln(),
                "fc1": dense(ks[4], d, m),
                "fc2": dense(ks[5], m, d),
            }
        )
    return {
        "cls_embed": jax.random.normal(keys[0], (d,), dtype) * 0.02,
        "patch_proj": jax.random.normal(keys[1], (patch_dim, d), dtype) * (patch_dim**-0.5),
        "pos_embed": jax.random.normal(keys[2], (cfg.seq_len, d), dtype) * 0.02,
        "pre_ln": ln(),
        "layers": layers,
        "post_ln": ln(),
    }


def _dense(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, n_patches, patch*patch*3), row-major patch order.

    Feature order inside each patch matches a torch Conv2d(3, D, k, k) kernel
    flattened as (C_in, kh, kw) — see utils/weights.py converter.
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, ph, pw)
    return x.reshape(b, gh * gw, c * patch * patch)


def clip_vision_forward(
    params: Params,
    images: jax.Array,  # (B, H, W, 3) CLIP-normalised
    cfg: ClipVisionConfig,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Returns (last_hidden_state, hidden_states) — HF-parity semantics."""
    b = images.shape[0]
    d = cfg.hidden_size
    x = patchify(images.astype(compute_dtype), cfg.patch_size)
    x = x @ params["patch_proj"].astype(compute_dtype)  # (B, P, D)
    cls = jnp.broadcast_to(params["cls_embed"].astype(compute_dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(compute_dtype)
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layer_norm_eps)

    hidden_states = [x]
    nh = cfg.num_heads
    hd = d // nh
    for lp in params["layers"]:
        res = x
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
        q = _dense(lp["q"], y).reshape(b, -1, nh, hd)
        k = _dense(lp["k"], y).reshape(b, -1, nh, hd)
        v = _dense(lp["v"], y).reshape(b, -1, nh, hd)
        att = mha(q, k, v, causal=False).reshape(b, -1, d)
        x = res + _dense(lp["o"], att)
        res = x
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        y = _dense(lp["fc2"], quick_gelu(_dense(lp["fc1"], y)))
        x = res + y
        hidden_states.append(x)
    return x, hidden_states


def select_image_and_pyramid_features(
    hidden_states: List[jax.Array],
    select_layer: int = -2,
    num_pyramid_levels: int = 4,
    pyramid_stride: int = 3,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Reproduces the reference's feature taps (gpt4roi/models/spi_llava.py:68-82):
    image tokens from ``hidden_states[select_layer][:, 1:]`` and pyramid levels
    ``hidden_states[select_layer::-pyramid_stride]`` reversed, last N, CLS
    dropped — for ViT-L/14 defaults that is layers {14, 17, 20, 23}."""
    image_tokens = hidden_states[select_layer][:, 1:]
    taps = hidden_states[select_layer::-pyramid_stride]
    taps = taps[::-1][-num_pyramid_levels:]
    pyramid = [t[:, 1:] for t in taps]
    return image_tokens, pyramid
