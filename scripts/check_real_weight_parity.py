"""Full-depth real-weight parity gate (VERDICT r3 missing #2).

The converters (utils/weights.py) are parity-tested at truncated depth with
seeded weights (tests/test_clip.py, tests/test_llama.py, and the end-to-end
fidelity gate tests/test_reference_e2e.py run CLIP-12/LLaMA-2). Actual
`openai/clip-vit-large-patch14` + Vicuna/LLaMA-7B checkpoints are NOT
reachable from this image (no network egress, no local HF cache), so this
script is the documented gate a weight-holder runs once:

    python scripts/check_real_weight_parity.py \
        --clip /path/to/clip-vit-large-patch14 \
        --llama /path/to/vicuna-7b-v0  [--dtype float32|bfloat16]

It converts at FULL depth (CLIP 24 layers incl. the SPI taps {14,17,20,23}
= hidden_states[-2::-3] reversed, LLaMA 32 layers) and compares against the
HF torch forward on the same inputs. Pass criteria (SURVEY §7.3):

  * fp32: logits/hidden-state atol <= 2e-4, rtol 1e-3 (same bars the
    truncated-depth CI tests hold today);
  * bf16 params: atol <= 5e-2 on logits (bf16 accumulation drift over 32
    layers), and argmax agreement >= 99.5% over the batch.

RAM note: --dtype float32 at 7B needs ~60 GB host RAM (torch + converted
copies); bfloat16 halves it. CLIP alone needs ~3 GB.

Reference being matched: llava/model/llava.py:54-86 (CLIP fp16 frozen
load), scripts/apply_delta.py:16-44 (delta -> vicuna weights).
"""

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_clip(clip_dir: str, dtype: str) -> None:
    import torch
    from transformers import CLIPVisionModel

    import jax.numpy as jnp
    import gpt4roi_tpu.models.clip_vit as cv
    from gpt4roi_tpu.utils.weights import convert_clip_vision

    hf = CLIPVisionModel.from_pretrained(clip_dir).eval()
    n_layers = hf.config.num_hidden_layers
    assert n_layers == 24, f"expected ViT-L/14 (24 layers), got {n_layers}"
    cfg = cv.ClipVisionConfig.vit_l_14()
    params = convert_clip_vision(hf.state_dict(), cfg.num_layers)
    if dtype == "bfloat16":
        import jax

        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2), output_hidden_states=True)
    _, hs = cv.clip_vision_forward(
        params, x, cfg, jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    )
    assert len(hs) == 25, len(hs)
    # the exact taps the SPI module consumes: -2 image select + [-2::-3]
    # reversed -> ViT layers {14, 17, 20, 23} (gpt4roi/models/spi_llava.py:68-82)
    atol = 2e-4 if dtype == "float32" else 5e-2
    for tap in (14, 17, 20, 23):
        got = np.asarray(hs[tap], np.float32)
        want = out.hidden_states[tap].numpy()
        np.testing.assert_allclose(
            got, want, atol=atol, rtol=1e-2, err_msg=f"CLIP tap {tap}"
        )
    print(f"CLIP 24-layer parity ok (taps 14/17/20/23, atol {atol})")
    del hf
    gc.collect()


def check_llama(llama_dir: str, dtype: str) -> None:
    import torch
    from transformers import AutoModelForCausalLM

    import jax.numpy as jnp
    from gpt4roi_tpu.models.llama import LlamaConfig, llama_forward
    from gpt4roi_tpu.utils.weights import convert_llama

    hf = AutoModelForCausalLM.from_pretrained(
        llama_dir, torch_dtype=torch.float32
    ).eval()
    n_layers = hf.config.num_hidden_layers
    cfg = LlamaConfig.llama_7b(vocab_size=hf.config.vocab_size)
    assert n_layers == cfg.num_layers == 32, n_layers
    params = convert_llama(hf.state_dict(), cfg.num_layers)
    if dtype == "bfloat16":
        import jax

        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, min(31000, cfg.vocab_size), (2, 48))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    del hf
    gc.collect()
    logits, _, _ = llama_forward(
        params, cfg, input_ids=jnp.asarray(ids),
        compute_dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )
    got = np.asarray(logits, np.float32)
    if dtype == "float32":
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree >= 0.995, f"argmax agreement {agree:.4f} < 0.995"
    print(f"LLaMA 32-layer logits parity ok ({dtype})")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clip", default=None, help="openai/clip-vit-large-patch14 dir")
    p.add_argument("--llama", default=None, help="vicuna-7b / llama-7b HF dir")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args()
    if not (args.clip or args.llama):
        p.error("pass --clip and/or --llama checkpoint dirs")
    if args.clip:
        check_clip(args.clip, args.dtype)
    if args.llama:
        check_llama(args.llama, args.dtype)
    print("real-weight parity gate PASSED")


if __name__ == "__main__":
    main()
