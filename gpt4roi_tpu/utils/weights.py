"""HF / torch checkpoint -> gpt4roi_tpu param-tree converters.

Replaces the reference's ``from_pretrained`` wiring (reference:
gpt4roi/train/train.py:552-557, llava/model/llava.py:54-86) and the
delta-weight tooling (reference: scripts/apply_delta.py:16-44). Torch is used
CPU-only as a file-format reader; all arrays land as numpy/jax.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().to(torch.float32).cpu().numpy()
    return np.asarray(x)


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _dense(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_clip_vision(sd: Mapping[str, Any], num_layers: int) -> Dict[str, Any]:
    """Convert an HF ``CLIPVisionModel`` state_dict. Keys are rooted at
    ``vision_model.`` (pass the full model state_dict)."""
    p = "vision_model"
    patch = _t(sd[f"{p}.embeddings.patch_embedding.weight"])  # (D, 3, k, k)
    d = patch.shape[0]
    layers = []
    for i in range(num_layers):
        lp = f"{p}.encoder.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{lp}.layer_norm1"),
                "q": _dense(sd, f"{lp}.self_attn.q_proj"),
                "k": _dense(sd, f"{lp}.self_attn.k_proj"),
                "v": _dense(sd, f"{lp}.self_attn.v_proj"),
                "o": _dense(sd, f"{lp}.self_attn.out_proj"),
                "ln2": _ln(sd, f"{lp}.layer_norm2"),
                "fc1": _dense(sd, f"{lp}.mlp.fc1"),
                "fc2": _dense(sd, f"{lp}.mlp.fc2"),
            }
        )
    return {
        "cls_embed": _t(sd[f"{p}.embeddings.class_embedding"]),
        # (D, C, kh, kw) -> (C*kh*kw, D), matching patchify's (C, ph, pw) order
        "patch_proj": patch.reshape(d, -1).T.copy(),
        "pos_embed": _t(sd[f"{p}.embeddings.position_embedding.weight"]),
        "pre_ln": _ln(sd, f"{p}.pre_layrnorm"),  # (sic — HF key)
        "layers": layers,
        "post_ln": _ln(sd, f"{p}.post_layernorm"),
    }


def convert_llama(sd: Mapping[str, Any], num_layers: int, prefix: str = "model") -> Dict[str, Any]:
    """Convert an HF ``LlamaForCausalLM`` state_dict."""
    layers = []
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "attn_norm": {"scale": _t(sd[f"{lp}.input_layernorm.weight"])},
                "q": _dense(sd, f"{lp}.self_attn.q_proj", bias=False),
                "k": _dense(sd, f"{lp}.self_attn.k_proj", bias=False),
                "v": _dense(sd, f"{lp}.self_attn.v_proj", bias=False),
                "o": _dense(sd, f"{lp}.self_attn.o_proj", bias=False),
                "mlp_norm": {"scale": _t(sd[f"{lp}.post_attention_layernorm.weight"])},
                "gate": _dense(sd, f"{lp}.mlp.gate_proj", bias=False),
                "up": _dense(sd, f"{lp}.mlp.up_proj", bias=False),
                "down": _dense(sd, f"{lp}.mlp.down_proj", bias=False),
            }
        )
    out = {
        "embed": {"embedding": _t(sd[f"{prefix}.embed_tokens.weight"])},
        "layers": layers,
        "final_norm": {"scale": _t(sd[f"{prefix}.norm.weight"])},
    }
    if "lm_head.weight" in sd:
        out["lm_head"] = {"kernel": _t(sd["lm_head.weight"]).T.copy()}
    return out


def convert_mpt(sd: Mapping[str, Any], num_layers: int, prefix: str = "transformer") -> Dict[str, Any]:
    """Convert an HF ``MptForCausalLM`` state_dict (no-bias layout)."""
    layers = []
    for i in range(num_layers):
        lp = f"{prefix}.blocks.{i}"
        layers.append(
            {
                "norm_1": {"scale": _t(sd[f"{lp}.norm_1.weight"])},
                "wqkv": _dense(sd, f"{lp}.attn.Wqkv", bias=False),
                "out_proj": _dense(sd, f"{lp}.attn.out_proj", bias=False),
                "norm_2": {"scale": _t(sd[f"{lp}.norm_2.weight"])},
                "up": _dense(sd, f"{lp}.ffn.up_proj", bias=False),
                "down": _dense(sd, f"{lp}.ffn.down_proj", bias=False),
            }
        )
    return {
        "embed": {"embedding": _t(sd[f"{prefix}.wte.weight"])},
        "layers": layers,
        "final_norm": {"scale": _t(sd[f"{prefix}.norm_f.weight"])},
        "lm_head": {"kernel": _t(sd["lm_head.weight"]).T.copy()},
    }


def convert_spi(sd: Mapping[str, Any], num_levels: int = 4, num_fuse: int = 5, prefix: str = "model.spi_module") -> Dict[str, Any]:
    """Convert the reference's ``MLVLROIQueryModule`` weights
    (gpt4roi/models/layers.py) to our SPI param tree. Conv kernels go
    (O, I, kh, kw) -> (kh, kw, I, O) for NHWC lax conv."""

    def conv(name):
        w = _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0).copy()
        out = {"kernel": w}
        if f"{name}.bias" in sd:
            out["bias"] = _t(sd[f"{name}.bias"])
        return out

    fuse = f"{prefix}.mlvl_fuse"
    roi = f"{prefix}.roi_align"
    fuse_convs = []
    for i in range(num_fuse):
        fuse_convs.append(
            {
                "conv": conv(f"{fuse}.fuse_convs.{i}.conv"),
                "gn": {
                    "scale": _t(sd[f"{fuse}.fuse_convs.{i}.gn.weight"]),
                    "bias": _t(sd[f"{fuse}.fuse_convs.{i}.gn.bias"]),
                },
            }
        )
    return {
        "input_convs": [conv(f"{fuse}.input_conv.{i}") for i in range(num_levels)],
        "fuse_convs": fuse_convs,
        "pconvs": [conv(f"{roi}.pconvs.{i}") for i in range(num_levels)],
        "pos_embed": {
            "fc1": _dense(sd, f"{roi}.pos_embedd.0"),
            "ln1": _ln(sd, f"{roi}.pos_embedd.2"),
            "fc2": _dense(sd, f"{roi}.pos_embedd.3"),
            "ln2": _ln(sd, f"{roi}.pos_embedd.5"),
        },
        "flatten_linear": _dense(sd, f"{roi}.flatten_linear"),
        "updims": _dense(sd, f"{roi}.updims"),
    }
