"""Build and run the REFERENCE GPT4RoI model (the actual code in
/root/reference) on CPU as the end-to-end fidelity oracle.

The reference's CUDA deps are shimmed (tests/reference_shims: mmcv
ConvModule/RoIAlign, mmdet BaseRoIExtractor — from-spec CPU
implementations with mmcv state_dict naming), everything else —
spi_llava.py's tap selection, splice/<bbox>-overwrite loop, MLVLFuse
shuffle rounds, align_corners resizes, fp32 RoIAlign islands, the HF CLIP
and LLaMA stacks — is the reference's own code (gpt4roi/models/
spi_llava.py:23-205, layers.py:96-335, llava/model/llava.py).

Model sizing: full reference widths (CLIP hidden 1024 / grid 16, SPI
embed 1024 -> out 4096, LLaMA hidden 4096), truncated depths (CLIP 12
layers — enough for the 4 taps at -2::-3 — and LLaMA ``num_llama_layers``)
so the fp32 CPU forward stays tractable. VERDICT r1 item 4 explicitly
allows depth truncation when both sides record identically.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

IM_PATCH = 32000
BBOX = 32001
POINT = 32002
IM_START = 32003
IM_END = 32004
VOCAB = 32006
NUM_PATCHES = 256


def install_shims() -> None:
    """Alias the mmcv/mmdet shims into sys.modules and put the reference
    repo on the path. Also relax transformers' Auto* registration so the
    reference's ``AutoConfig.register('llava', ...)`` doesn't collide with
    the 'llava' model type that modern transformers ships."""
    import tests.reference_shims.mmcv as mmcv_shim
    import tests.reference_shims.mmcv.cnn as mmcv_cnn
    import tests.reference_shims.mmcv.ops as mmcv_ops
    import tests.reference_shims.mmdet as mmdet_shim
    import tests.reference_shims.mmdet.models as mmdet_models

    sys.modules.setdefault("mmcv", mmcv_shim)
    sys.modules.setdefault("mmcv.cnn", mmcv_cnn)
    sys.modules.setdefault("mmcv.ops", mmcv_ops)
    sys.modules.setdefault("mmdet", mmdet_shim)
    sys.modules.setdefault("mmdet.models", mmdet_models)

    from transformers import AutoConfig, AutoModelForCausalLM

    orig_cfg_reg = AutoConfig.register
    AutoConfig.register = staticmethod(
        lambda key, cfg, exist_ok=False: orig_cfg_reg(key, cfg, exist_ok=True)
    )
    orig_m_reg = AutoModelForCausalLM.register
    AutoModelForCausalLM.register = staticmethod(
        lambda cfg, model, exist_ok=False: orig_m_reg(cfg, model, exist_ok=True)
    )

    # the reference's vendored MPT copy targets transformers-4.28 internals
    # (bloom _expand_mask etc.) that no longer exist; the LLaMA fidelity
    # path never touches it, so pre-register an empty stand-in to keep
    # ``llava.model.__init__``'s eager import from exploding
    mpt_stub = types.ModuleType("llava.model.llava_mpt")
    mpt_stub.LlavaMPTForCausalLM = object
    mpt_stub.LlavaMPTConfig = object
    sys.modules.setdefault("llava.model.llava_mpt", mpt_stub)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


class _TokStub:
    """The reference model only calls convert_tokens_to_ids(['<bbox>'])."""

    def convert_tokens_to_ids(self, toks):
        return [BBOX if t == "<bbox>" else POINT for t in toks]


def build_reference_model(seed: int = 0, num_llama_layers: int = 2):
    """Seeded reference model on CPU fp32. Returns (model, vision_tower)."""
    install_shims()
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from gpt4roi.models.spi_llava import SPILlavaMPTForCausalLM
    from llava.model.llava import LlavaConfig

    torch.manual_seed(seed)
    cfg = LlavaConfig(
        vocab_size=VOCAB,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=num_llama_layers,
        num_attention_heads=32,
        rms_norm_eps=1e-6,
        max_position_embeddings=2048,
        use_mm_proj=True,
        mm_hidden_size=1024,
        mm_vision_select_layer=-2,
        pad_token_id=0,
    )
    cfg._attn_implementation = "eager"
    model = SPILlavaMPTForCausalLM(cfg)

    vcfg = CLIPVisionConfig(
        hidden_size=1024,
        intermediate_size=4096,
        num_hidden_layers=12,  # taps -2,-5,-8,-11 all exist
        num_attention_heads=16,
        image_size=224,
        patch_size=14,
    )
    torch.manual_seed(seed + 1)
    vt = CLIPVisionModel(vcfg)
    vt.config.im_patch_token = IM_PATCH
    vt.config.im_start_token = IM_START
    vt.config.im_end_token = IM_END
    vt.config.use_im_start_end = True
    model.model.vision_tower = [vt]
    model.model.tokenizer = _TokStub()
    model.eval()
    return model.float(), vt


def make_sample(num_boxes: int = 2, question_len: int = 12, seed: int = 0):
    """Deterministic RefCOCOg-style sample: v0-layout ids with the image
    span + <bbox> per region, a normalized image tensor, normalized boxes."""
    rng = np.random.default_rng(seed)
    ids = [1]  # BOS
    ids += list(rng.integers(5, 31000, 8))  # system-ish prefix
    ids += [IM_START] + [IM_PATCH] * NUM_PATCHES + [IM_END]
    for _ in range(num_boxes):
        ids += list(rng.integers(5, 31000, question_len)) + [BBOX]
    ids += list(rng.integers(5, 31000, 6))
    input_ids = np.asarray([ids], np.int64)

    image = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    xy = rng.random((num_boxes, 2), np.float32) * 0.4 + 0.05
    wh = rng.random((num_boxes, 2), np.float32) * 0.4 + 0.1
    boxes = np.concatenate([xy, np.minimum(xy + wh, 0.95)], axis=1).astype(np.float32)
    return input_ids, image, boxes


def run_reference(model, input_ids, image, boxes, greedy_steps: int = 2):
    """fp32 prefill logits + greedy continuation (full re-forward per step,
    matching the reference's vision-rerun guard spi_llava.py:47-48)."""
    import torch

    ids = torch.from_numpy(input_ids)
    img = torch.from_numpy(image)
    bx = [torch.from_numpy(boxes)]
    with torch.inference_mode():
        out = model(input_ids=ids, images=img, bboxes=bx, use_cache=False)
        prefill_logits = out.logits[0].float().numpy()
        toks = []
        cur = ids
        for _ in range(greedy_steps):
            nxt = int(out.logits[0, -1].argmax())
            toks.append(nxt)
            cur = torch.cat([cur, torch.tensor([[nxt]])], dim=1)
            out = model(input_ids=cur, images=img, bboxes=bx, use_cache=False)
    return prefill_logits, toks
