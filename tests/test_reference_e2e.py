"""END-TO-END fidelity gate vs the REFERENCE implementation (VERDICT r1
item 4; BASELINE.md config 1).

The actual reference code in /root/reference (gpt4roi/models/spi_llava.py
+ layers.py + llava/model/llava.py, CUDA deps shimmed from spec — see
tests/reference_harness.py) runs on CPU fp32 with seeded weights on one
RefCOCOg-style sample; its state_dict is converted into our param tree and
the full JAX stack must reproduce the prefill logits and the greedy
continuation. Any regression in the stack's numerical quirks — tap
selection -2::-3, image-span splice, <bbox> overwrite against original
ids, align_corners resizes, 5-round channel-shuffle fuse, fp32 RoIAlign
islands, pos-embed MLP, shift-CE-free prefill — fails this test.

Full reference widths (CLIP 1024/grid 16, SPI 1024->4096, LLaMA 4096),
truncated depths (CLIP 12 layers, LLaMA 2) keep the fp32 CPU run
tractable; VERDICT r1 explicitly allows identical-depth truncation.
~6-8 min on one CPU core — the single most load-bearing test in the
suite, kept in the default run on purpose.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: run with -m '' (see README)

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def reference_run():
    from tests.reference_harness import (
        BBOX,
        IM_END,
        IM_PATCH,
        IM_START,
        POINT,
        VOCAB,
        build_reference_model,
        make_sample,
        run_reference,
    )

    model, vt = build_reference_model(num_llama_layers=2)
    ids, img, boxes = make_sample()
    logits, toks = run_reference(model, ids, img, boxes, greedy_steps=2)
    sd = {k: v for k, v in model.state_dict().items()}
    sd_vt = {k: v for k, v in vt.state_dict().items()}
    return {
        "model": model,
        "sd": sd, "sd_vt": sd_vt, "ids": ids, "img": img, "boxes": boxes,
        "logits": logits, "toks": toks,
        "tok_ids": dict(im_patch=IM_PATCH, bbox=BBOX, point=POINT,
                        im_start=IM_START, im_end=IM_END, vocab=VOCAB),
    }


def build_jax_params(ref):
    from gpt4roi_tpu.models.clip_vit import ClipVisionConfig
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig
    from gpt4roi_tpu.models.llama import LlamaConfig
    from gpt4roi_tpu.utils.weights import (
        convert_clip_vision,
        convert_llama,
        convert_spi,
    )

    t = ref["tok_ids"]
    cfg = Gpt4RoiConfig(
        clip=ClipVisionConfig(num_layers=12),
        llama=LlamaConfig(
            hidden_size=4096, intermediate_size=11008, num_layers=2,
            num_heads=32, vocab_size=t["vocab"],
        ),
        im_patch_token_id=t["im_patch"], bbox_token_id=t["bbox"],
        point_token_id=t["point"], im_start_token_id=t["im_start"],
        im_end_token_id=t["im_end"],
    )
    sd, sd_vt = ref["sd"], ref["sd_vt"]
    params = {
        "clip": convert_clip_vision(sd_vt, 12),
        "llama": convert_llama(sd, 2),
        "spi": convert_spi(sd, num_levels=4, num_fuse=5),
        "mm_projector": {
            "kernel": np.asarray(sd["model.mm_projector.weight"]).T.copy(),
            "bias": np.asarray(sd["model.mm_projector.bias"]),
        },
    }
    return cfg, jax.tree_util.tree_map(jnp.asarray, params)


def test_reference_end_to_end_fidelity(reference_run):
    from gpt4roi_tpu.models.gpt4roi import gpt4roi_forward

    cfg, params = build_jax_params(reference_run)
    ids = jnp.asarray(reference_run["ids"].astype(np.int32))
    images = jnp.asarray(
        np.transpose(reference_run["img"], (0, 2, 3, 1))  # NCHW -> NHWC
    )
    boxes = jnp.asarray(reference_run["boxes"])[None]
    box_mask = jnp.ones((1, boxes.shape[1]), bool)

    def fwd(cur_ids):
        out = gpt4roi_forward(
            params, cfg, cur_ids, images, boxes, box_mask,
            attention_mask=jnp.ones_like(cur_ids, jnp.float32),
            compute_dtype=jnp.float32,
        )
        return np.asarray(out["logits"])[0]

    got = fwd(ids)
    want = reference_run["logits"]
    assert got.shape == want.shape

    # prefill logits: fp32 XLA vs fp32 torch through the full stack
    scale = np.abs(want).max()
    rel = np.abs(got - want).max() / scale
    assert rel < 5e-3, f"prefill logits diverge: rel={rel:.2e}"
    # argmax agreement across ALL prefill positions
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.995, f"argmax agreement {agree:.3f}"

    # greedy continuation must match token-for-token
    cur = reference_run["ids"].astype(np.int32)
    for step, want_tok in enumerate(reference_run["toks"]):
        got_tok = int(fwd(jnp.asarray(cur))[-1].argmax())
        assert got_tok == want_tok, f"greedy step {step}: {got_tok} != {want_tok}"
        cur = np.concatenate([cur, [[want_tok]]], axis=1)


def test_reference_e2e_multiregion_cached_session(reference_run):
    """Second fidelity sample (VERDICT r2 item 8): 3 regions, different
    seed, TWO chat rounds. The reference side re-runs the FULL forward
    every round (its vision-rerun guard, spi_llava.py:47-48 +
    app.py:285-300); the JAX side serves through Engine + CachedSession —
    vision encoded once, incremental KV extends, scan-over-layers decode
    steps. Greedy tokens must agree token-for-token across both rounds,
    which gates the entire serving path (prefill splice, extend masks,
    stacked decode, cache bookkeeping) against the reference."""
    from tests.reference_harness import make_sample, run_reference

    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    model = reference_run["model"]
    ids, img, boxes = make_sample(num_boxes=3, question_len=10, seed=7)

    # reference round 1: full forward, 2 greedy tokens
    _, toks1 = run_reference(model, ids, img, boxes, greedy_steps=2)
    # reference round 2: append round-1 output + new user tokens, full
    # re-forward (the reference recomputes everything), 2 more tokens
    rng = np.random.default_rng(17)
    extra = rng.integers(5, 31000, 7).astype(np.int64)
    ids2 = np.concatenate([ids, np.asarray([toks1]), extra[None]], axis=1)
    _, toks2 = run_reference(model, ids2, img, boxes, greedy_steps=2)

    cfg, params = build_jax_params(reference_run)
    eng = Engine(
        params, cfg,
        EngineConfig(max_seq_len=448, prefill_bucket=64, compute_dtype=jnp.float32),
    )
    sess = eng.cached_session()
    images = np.transpose(img, (0, 2, 3, 1))
    sess.set_vision(images, boxes[None], np.ones((1, boxes.shape[0]), bool))

    got1 = sess.append_and_generate(list(ids[0]), max_new_tokens=2, temperature=0.0)
    assert got1 == toks1, f"round 1: {got1} != {toks1}"
    got2 = sess.append_and_generate(list(extra), max_new_tokens=2, temperature=0.0)
    assert got2 == toks2, f"round 2: {got2} != {toks2}"
