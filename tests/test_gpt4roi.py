"""End-to-end tiny GPT4RoI model: splice correctness, loss, and
prefill/decode generation consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.gpt4roi import (
    Gpt4RoiConfig,
    build_input_embeds,
    encode_vision,
    gpt4roi_forward,
    init_gpt4roi_params,
    masked_scatter_embeds,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, rng, b=2, s=24, r=3):
    n_img = cfg.num_image_tokens
    ids = rng.integers(5, 50, (b, s)).astype(np.int32)
    # layout: [t t <im_start> patch*n <im_end> t <bbox> t ...]
    ids[:, 2] = cfg.im_start_token_id
    ids[:, 3 : 3 + n_img] = cfg.im_patch_token_id
    ids[:, 3 + n_img] = cfg.im_end_token_id
    ids[:, 5 + n_img] = cfg.bbox_token_id
    ids[:, 8 + n_img] = cfg.bbox_token_id
    images = rng.standard_normal((b, cfg.clip.image_size, cfg.clip.image_size, 3)).astype(np.float32)
    boxes = np.tile(np.array([[0.1, 0.1, 0.7, 0.7], [0.2, 0.3, 0.9, 0.8], [0, 0, 0, 0]], np.float32), (b, 1, 1))
    mask = np.tile(np.array([True, True, False]), (b, 1))
    return ids, images, boxes, mask


def test_masked_scatter():
    embeds = jnp.zeros((1, 6, 2))
    mask = jnp.asarray([[False, True, False, True, False, False]])
    bank = jnp.asarray([[[1.0, 1.0], [2.0, 2.0], [9.0, 9.0]]])
    out = masked_scatter_embeds(embeds, mask, bank)
    np.testing.assert_array_equal(np.asarray(out[0, 1]), [1, 1])
    np.testing.assert_array_equal(np.asarray(out[0, 3]), [2, 2])
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [0, 0])


def test_splice_positions(tiny, rng):
    cfg, params = tiny
    ids, images, boxes, mask = make_batch(cfg, rng)
    embeds = build_input_embeds(params, cfg, jnp.asarray(ids), images, boxes, mask)
    img_feats, spi_feats = encode_vision(params, cfg, images, boxes, mask)
    n_img = cfg.num_image_tokens
    # patch positions carry projected image features in order
    np.testing.assert_allclose(
        np.asarray(embeds[0, 3 : 3 + n_img]), np.asarray(img_feats[0]), rtol=1e-5
    )
    # first/second <bbox> positions carry region queries 0/1
    np.testing.assert_allclose(
        np.asarray(embeds[1, 5 + n_img]), np.asarray(spi_feats[1, 0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(embeds[1, 8 + n_img]), np.asarray(spi_feats[1, 1]), rtol=1e-5
    )
    # normal positions keep token embeddings
    tok_embed = params["llama"]["embed"]["embedding"][ids[0, 0]]
    np.testing.assert_allclose(np.asarray(embeds[0, 0]), np.asarray(tok_embed), rtol=1e-5)


def test_forward_loss_and_frozen_vision_grads(tiny, rng):
    cfg, params = tiny
    ids, images, boxes, mask = make_batch(cfg, rng)
    labels = ids.astype(np.int32).copy()
    labels[:, : 3 + cfg.num_image_tokens + 1] = -100

    def loss_fn(p):
        out = gpt4roi_forward(
            p, cfg, jnp.asarray(ids), images, boxes, mask,
            attention_mask=jnp.ones_like(ids, jnp.float32), labels=jnp.asarray(labels),
        )
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # frozen vision tower: all CLIP grads exactly zero (stop_gradient)
    clip_leaves = jax.tree_util.tree_leaves(grads["clip"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in clip_leaves)
    # SPI + projector + llama receive gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree_util.tree_leaves(grads["spi"]))
    assert float(jnp.abs(grads["mm_projector"]["kernel"]).max()) > 0


def test_generate_matches_full_forward(tiny, rng):
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    cfg, params = tiny
    ids, images, boxes, mask = make_batch(cfg, rng, b=1, s=24)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=64, prefill_bucket=32, temperature=0.0))
    out = eng.generate(ids, images, boxes, mask, max_new_tokens=4, temperature=0.0)
    assert len(out[0]) == 4

    # oracle: iterative full forward + argmax (no cache)
    cur = ids.copy()
    want = []
    for _ in range(4):
        res = gpt4roi_forward(
            params, cfg, jnp.asarray(cur), images, boxes, mask,
            attention_mask=jnp.ones_like(cur, jnp.float32),
        )
        nxt = int(np.asarray(res["logits"])[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1).astype(np.int32)
    assert out[0] == want
