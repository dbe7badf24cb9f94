"""GPT4RoI model assembly: CLIP ViT -> (image tokens + SPI region queries)
-> embedding splice -> LLaMA.

Replaces ``SPILlavaLlamaModel.forward`` (reference:
gpt4roi/models/spi_llava.py:23-205). The reference splices image tokens and
region embeddings with a per-sample python loop over dynamic box lists; here
the splice is a fully static masked scatter:

  * input_ids already contain the 256 ``<im_patch>`` ids between
    ``<im_start>``/``<im_end>`` (inserted at preprocessing time, as the
    reference does in preprocess_multimodal — gpt4roi/train/train.py:185-208);
  * for every position, ``cumsum(mask) - 1`` indexes into the per-sample
    feature bank (image tokens or SPI queries) and ``jnp.where`` selects —
    no dynamic shapes, no host loop, works under jit/pjit.

The vision tower is frozen via ``stop_gradient`` (reference freezes it with
requires_grad_(False) + torch.no_grad — llava/model/llava.py:54-86,
spi_llava.py:51). Loss is shifted cross-entropy with -100 ignore labels
(llava/model/llava.py:238-249).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.clip_vit import (
    ClipVisionConfig,
    clip_vision_forward,
    init_clip_params,
    select_image_and_pyramid_features,
)
from gpt4roi_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    init_llama_params,
    llama_decode_step,
    llama_forward,
)
from gpt4roi_tpu.models.spi import SpiConfig, init_spi_params, spi_forward

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class Gpt4RoiConfig:
    clip: ClipVisionConfig = dataclasses.field(default_factory=ClipVisionConfig.vit_l_14)
    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig.llama_7b)
    spi: SpiConfig = dataclasses.field(default_factory=SpiConfig)
    # 'llama' (primary) or 'mpt' (the reference's secondary path, selected
    # when the model name contains 'mpt' — gpt4roi/train/train.py:547-551).
    decoder_type: str = "llama"
    mpt: Optional[Any] = None  # models.mpt.MptConfig when decoder_type == 'mpt'
    num_image_tokens: int = 256
    vision_select_layer: int = -2
    num_pyramid_levels: int = 4
    # token ids — assigned when the tokenizer is extended (spi_llava.py:242-306)
    im_patch_token_id: int = 32000
    bbox_token_id: int = 32001
    point_token_id: int = 32002
    im_start_token_id: int = 32003
    im_end_token_id: int = 32004

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "Gpt4RoiConfig":
        clip = ClipVisionConfig.tiny()
        spi = dataclasses.replace(
            SpiConfig.tiny(),
            embed_dims=clip.hidden_size,
            num_levels=2,
            base_grid=clip.grid,
            image_size=float(clip.image_size),
            out_dims=64,
            pos_dim=32,
        )
        return cls(
            clip=clip,
            llama=LlamaConfig.tiny(vocab_size),
            spi=spi,
            num_image_tokens=clip.num_patches,
            num_pyramid_levels=2,
            im_patch_token_id=vocab_size - 5,
            bbox_token_id=vocab_size - 4,
            point_token_id=vocab_size - 3,
            im_start_token_id=vocab_size - 2,
            im_end_token_id=vocab_size - 1,
        )


Params = Dict[str, Any]


def init_gpt4roi_params(key: jax.Array, cfg: Gpt4RoiConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    is_mpt = cfg.decoder_type == "mpt"
    d_vis = cfg.clip.hidden_size
    d_lm = cfg.mpt.d_model if is_mpt else cfg.llama.hidden_size
    out = {
        "clip": init_clip_params(k1, cfg.clip, dtype),
        "mm_projector": {
            "kernel": jax.random.normal(k2, (d_vis, d_lm), dtype) * (d_vis**-0.5),
            "bias": jnp.zeros((d_lm,), dtype),
        },
        "spi": init_spi_params(k3, cfg.spi, dtype),
    }
    if is_mpt:
        from gpt4roi_tpu.models.mpt import init_mpt_params

        out["mpt"] = init_mpt_params(k4, cfg.mpt, dtype)
    else:
        out["llama"] = init_llama_params(k4, cfg.llama, dtype)
    return out


def masked_scatter_embeds(
    embeds: jax.Array,  # (B, S, D)
    mask: jax.Array,  # (B, S) bool — positions to overwrite
    bank: jax.Array,  # (B, K, D) — k-th True position takes bank[b, k]
) -> jax.Array:
    """Static-shape replacement for the reference's per-sample splice loop."""
    idx = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, bank.shape[1] - 1)
    gathered = jnp.take_along_axis(bank, idx[:, :, None], axis=1).astype(embeds.dtype)
    return jnp.where(mask[:, :, None], gathered, embeds)


def encode_vision(
    params: Params,
    cfg: Gpt4RoiConfig,
    images: jax.Array,  # (B, H, W, 3)
    boxes: jax.Array,  # (B, R, 4) normalised
    box_mask: jax.Array,  # (B, R)
    compute_dtype=jnp.float32,
    remat="full",
) -> Tuple[jax.Array, jax.Array]:
    """Frozen CLIP encode -> (projected image tokens (B, 256, D_lm),
    SPI region queries (B, R, D_lm)).

    ``remat`` follows apply_remat semantics (models/llama.py): "full"
    checkpoints each SPI fuse round (the reference's training memory
    profile); "dots"/"none" skip the round checkpoint — the recompute
    costs a measured ~57 ms/step at stage-2 shape (micro_fuse_bwd.py)
    against ~1.5 GB of saved round activations. Inference is unaffected
    either way (checkpoint is transparent without differentiation)."""
    _, hidden_states = clip_vision_forward(params["clip"], images, cfg.clip, compute_dtype)
    hidden_states = [jax.lax.stop_gradient(h) for h in hidden_states]
    image_tokens, pyramid = select_image_and_pyramid_features(
        hidden_states, cfg.vision_select_layer, cfg.num_pyramid_levels
    )
    proj = params["mm_projector"]
    image_feats = image_tokens @ proj["kernel"].astype(image_tokens.dtype) + proj["bias"].astype(
        image_tokens.dtype
    )
    spi_feats = spi_forward(params["spi"], pyramid, boxes, box_mask, cfg.spi, remat=remat)
    return image_feats, spi_feats


def decoder_params(params: Params, cfg: Gpt4RoiConfig) -> Params:
    return params["mpt"] if cfg.decoder_type == "mpt" else params["llama"]


def build_input_embeds(
    params: Params,
    cfg: Gpt4RoiConfig,
    input_ids: jax.Array,  # (B, S)
    images: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    compute_dtype=jnp.float32,
    remat="full",
) -> jax.Array:
    embeds = decoder_params(params, cfg)["embed"]["embedding"][input_ids].astype(compute_dtype)
    image_feats, spi_feats = encode_vision(
        params, cfg, images, boxes, box_mask, compute_dtype, remat=remat
    )
    patch_mask = input_ids == cfg.im_patch_token_id
    embeds = masked_scatter_embeds(embeds, patch_mask, image_feats)
    bbox_mask = input_ids == cfg.bbox_token_id
    embeds = masked_scatter_embeds(embeds, bbox_mask, spi_feats.astype(compute_dtype))
    return embeds


def gpt4roi_forward(
    params: Params,
    cfg: Gpt4RoiConfig,
    input_ids: jax.Array,  # (B, S)
    images: jax.Array,  # (B, H, W, 3)
    boxes: jax.Array,  # (B, R, 4)
    box_mask: jax.Array,  # (B, R)
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid
    labels: Optional[jax.Array] = None,  # (B, S), IGNORE_INDEX masked
    compute_dtype=jnp.float32,
    use_flash: Optional[bool] = None,
    return_kv: bool = False,
    remat: bool = False,
):
    """Full forward. Returns dict with logits, loss (if labels), kv (opt)."""
    embeds = build_input_embeds(
        params, cfg, input_ids, images, boxes, box_mask, compute_dtype, remat=remat
    )
    if cfg.decoder_type == "mpt":
        from gpt4roi_tpu.models.mpt import mpt_forward

        logits, hidden, kv = mpt_forward(
            params["mpt"],
            cfg.mpt,
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            return_kv=return_kv,
            remat=remat,
        )
    else:
        logits, hidden, kv = llama_forward(
            params["llama"],
            cfg.llama,
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            return_kv=return_kv,
            use_flash=use_flash,
            remat=remat,
        )
    out = {"logits": logits, "hidden": hidden, "kv": kv}
    if labels is not None:
        out["loss"] = shifted_cross_entropy(logits, labels)
    return out


def gpt4roi_forward_packed(
    params: Params,
    cfg: Gpt4RoiConfig,
    batch: Dict[str, jax.Array],
    compute_dtype=jnp.float32,
    use_flash: Optional[bool] = None,
    remat: bool = False,
):
    """Packed-sequence training forward (see data.packing): multiple samples
    per row, segment-masked attention, per-segment positions, and splice via
    host-precomputed flat bank indices. Loss never crosses segment
    boundaries. The reference has no packing — every row is one padded
    conversation — so this is a pure throughput win over its trainer."""
    ids = batch["input_ids"]
    seg = batch["segment_ids"]
    image_feats, spi_feats = encode_vision(
        params, cfg, batch["images"], batch["boxes"], batch["box_mask"], compute_dtype,
        remat=remat,
    )
    d = image_feats.shape[-1]
    flat_img = image_feats.reshape(-1, d)
    flat_spi = spi_feats.reshape(-1, d).astype(compute_dtype)
    embeds = decoder_params(params, cfg)["embed"]["embedding"][ids].astype(compute_dtype)
    patch_mask = ids == cfg.im_patch_token_id
    embeds = jnp.where(
        patch_mask[..., None], flat_img[batch["patch_bank_idx"]].astype(compute_dtype), embeds
    )
    bbox_mask = ids == cfg.bbox_token_id
    embeds = jnp.where(bbox_mask[..., None], flat_spi[batch["bbox_bank_idx"]], embeds)

    logits, hidden, _ = llama_forward(
        params["llama"],
        cfg.llama,
        inputs_embeds=embeds,
        positions=batch["positions"],
        segment_ids=seg,
        use_flash=use_flash,
        remat=remat,
    )
    labels = batch["labels"]
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    same_seg = (seg[:, 1:] == seg[:, :-1]) & (seg[:, 1:] > 0)
    valid = (shift_labels != IGNORE_INDEX) & same_seg
    safe = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    picked = jnp.take_along_axis(shift_logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - picked) * valid.astype(jnp.float32)
    loss = nll.sum() / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return {"logits": logits, "hidden": hidden, "loss": loss}


def shifted_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over next-token targets, ignoring IGNORE_INDEX
    (llava/model/llava.py:238-249 semantics)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    picked = jnp.take_along_axis(shift_logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - picked) * valid.astype(jnp.float32)
    return nll.sum() / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
