"""Packed-sequence training: bin packing, bank-index splice correctness, and
packed loss == mean of per-sample losses (weighted by valid tokens)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.data.packing import PackSpec, collate_packed, first_fit_pack
from gpt4roi_tpu.models.gpt4roi import (
    Gpt4RoiConfig,
    gpt4roi_forward,
    gpt4roi_forward_packed,
    init_gpt4roi_params,
)


def test_first_fit():
    bins = first_fit_pack([10, 90, 50, 40, 5], capacity=100)
    total = sorted(i for b in bins for i in b)
    assert total == [0, 1, 2, 3, 4]
    assert len(bins) == 2  # 90+10, 50+40+5
    for b in bins:
        assert sum([10, 90, 50, 40, 5][i] for i in b) <= 100


@pytest.fixture(scope="module")
def tiny():
    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_sample(cfg, rng, n_extra, n_boxes):
    n_img = cfg.num_image_tokens
    ids = [3, cfg.im_start_token_id] + [cfg.im_patch_token_id] * n_img + [cfg.im_end_token_id]
    for i in range(n_boxes):
        ids += [cfg.bbox_token_id, int(rng.integers(5, 50))]
    ids += [int(rng.integers(5, 50)) for _ in range(n_extra)]
    ids = np.asarray(ids, np.int32)
    labels = ids.copy()
    labels[: 3 + n_img] = -100
    boxes = np.clip(rng.random((n_boxes, 4)), 0.1, 0.9).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, :2] + 0.3, None, 1.0)
    return {
        "input_ids": ids,
        "labels": labels,
        "image": rng.standard_normal((cfg.clip.image_size, cfg.clip.image_size, 3)).astype(np.float32),
        "boxes": boxes,
    }


@pytest.mark.slow
def test_packed_matches_unpacked(tiny, rng):
    cfg, params = tiny
    samples = [
        make_sample(cfg, rng, n_extra=6, n_boxes=2),
        make_sample(cfg, rng, n_extra=3, n_boxes=1),
        make_sample(cfg, rng, n_extra=9, n_boxes=3),
    ]
    spec = PackSpec(
        seq_len=64,
        max_regions=4,
        image_size=cfg.clip.image_size,
        pad_token_id=0,
        im_patch_token_id=cfg.im_patch_token_id,
        bbox_token_id=cfg.bbox_token_id,
        num_image_tokens=cfg.num_image_tokens,
        max_images=4,
    )
    batch = collate_packed(samples, spec)
    assert batch["input_ids"].shape[1] == 64
    assert batch["segment_ids"].max() >= 2  # actually packed

    out = gpt4roi_forward_packed(
        params, cfg, {k: jnp.asarray(v) for k, v in batch.items() if k != "num_images"}
    )
    packed_loss = float(out["loss"])

    # oracle: per-sample forward, token-weighted mean NLL
    total_nll, total_tok = 0.0, 0
    for s in samples:
        ids = s["input_ids"][None]
        labels = s["labels"][None]
        r = len(s["boxes"])
        boxes = np.zeros((1, spec.max_regions, 4), np.float32)
        boxes[0, :r] = s["boxes"]
        mask = np.zeros((1, spec.max_regions), bool)
        mask[0, :r] = True
        res = gpt4roi_forward(
            params, cfg, jnp.asarray(ids), s["image"][None], boxes, mask,
            attention_mask=jnp.ones_like(jnp.asarray(ids), jnp.float32),
            labels=jnp.asarray(labels),
        )
        n_valid = int((labels[:, 1:] != -100).sum())
        total_nll += float(res["loss"]) * n_valid
        total_tok += n_valid
    want = total_nll / total_tok
    np.testing.assert_allclose(packed_loss, want, rtol=2e-4)


def test_sharded_packed_train_step(tiny, rng):
    """Packed train step on the 8-device mesh (images shard on data too)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpt4roi_tpu.core.mesh import make_mesh
    from gpt4roi_tpu.train.loop import make_sharded_train_step
    from gpt4roi_tpu.train.state import TrainConfig

    cfg, params = tiny
    samples = [make_sample(cfg, rng, n_extra=4 + i, n_boxes=1 + i % 2) for i in range(8)]
    spec = PackSpec(
        seq_len=48, max_regions=4, image_size=cfg.clip.image_size, pad_token_id=0,
        im_patch_token_id=cfg.im_patch_token_id, bbox_token_id=cfg.bbox_token_id,
        num_image_tokens=cfg.num_image_tokens, max_images=8, rows=8,
    )
    batch = collate_packed(samples, spec)
    batch.pop("num_images")
    mesh = make_mesh(jax.devices()[:8])
    tcfg = TrainConfig(stage="stage1", learning_rate=1e-3, total_steps=4, warmup_steps=0)
    jit_step, init_state, _ = make_sharded_train_step(
        cfg, tcfg, mesh, params, compute_dtype=jnp.float32, packed=True
    )
    state = init_state(jax.tree_util.tree_map(np.asarray, params))
    sh = NamedSharding(mesh, P("data"))
    dev_batch = {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}
    state, metrics = jit_step(state, dev_batch)
    assert np.isfinite(float(metrics["loss"]))


def test_packed_logits_per_position(tiny, rng):
    """Logits at each packed position equal the unpacked sample's logits."""
    cfg, params = tiny
    s1 = make_sample(cfg, rng, n_extra=5, n_boxes=1)
    s2 = make_sample(cfg, rng, n_extra=2, n_boxes=2)
    spec = PackSpec(
        seq_len=48, max_regions=4, image_size=cfg.clip.image_size, pad_token_id=0,
        im_patch_token_id=cfg.im_patch_token_id, bbox_token_id=cfg.bbox_token_id,
        num_image_tokens=cfg.num_image_tokens, max_images=4,
    )
    batch = collate_packed([s1, s2], spec)
    out = gpt4roi_forward_packed(
        params, cfg, {k: jnp.asarray(v) for k, v in batch.items() if k != "num_images"}
    )
    logits = np.asarray(out["logits"])

    for s in [s1, s2]:
        n = len(s["input_ids"])
        r = len(s["boxes"])
        boxes = np.zeros((1, spec.max_regions, 4), np.float32)
        boxes[0, :r] = s["boxes"]
        mask = np.zeros((1, spec.max_regions), bool)
        mask[0, :r] = True
        res = gpt4roi_forward(
            params, cfg, jnp.asarray(s["input_ids"][None]), s["image"][None], boxes, mask,
            attention_mask=jnp.ones((1, n), jnp.float32),
        )
        want = np.asarray(res["logits"])[0]
        # locate this sample's segment in the packed batch
        found = False
        for row in range(batch["input_ids"].shape[0]):
            for seg in range(1, batch["segment_ids"].max() + 1):
                sel = batch["segment_ids"][row] == seg
                if sel.sum() == n and (batch["input_ids"][row][sel] == s["input_ids"]).all():
                    np.testing.assert_allclose(
                        logits[row][sel], want, atol=2e-4, rtol=2e-3
                    )
                    found = True
        assert found
