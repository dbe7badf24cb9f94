"""Training: stage-selective freezing, loss decreases, sharded step on an
8-device CPU mesh, checkpoint save/resume + weights-only init."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.core.mesh import make_mesh
from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from gpt4roi_tpu.train.loop import make_sharded_train_step, make_train_step
from gpt4roi_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_optimizer,
    param_labels,
)
from tests.test_gpt4roi import make_batch


@pytest.fixture(scope="module")
def tiny():
    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def batch_dict(cfg, rng, b=2):
    ids, images, boxes, mask = make_batch(cfg, rng, b=b)
    labels = ids.astype(np.int32).copy()
    labels[:, : 4 + cfg.num_image_tokens] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones_like(jnp.asarray(ids), jnp.float32),
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(boxes),
        "box_mask": jnp.asarray(mask),
    }


def test_stage1_only_spi_updates(tiny, rng):
    cfg, params = tiny
    tcfg = TrainConfig(stage="stage1", learning_rate=1e-3, total_steps=10, warmup_steps=0)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, tx, compute_dtype=jnp.float32)
    batch = batch_dict(cfg, rng)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    def max_delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert max_delta(new_state.params["spi"], params["spi"]) > 0
    assert max_delta(new_state.params["llama"], params["llama"]) == 0
    assert max_delta(new_state.params["clip"], params["clip"]) == 0
    assert max_delta(new_state.params["mm_projector"], params["mm_projector"]) == 0


def test_stage2_llama_updates_clip_frozen(tiny, rng):
    cfg, params = tiny
    tcfg = TrainConfig(stage="stage2", learning_rate=1e-3, total_steps=10, warmup_steps=0)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, tx, compute_dtype=jnp.float32)
    new_state, _ = step(state, batch_dict(cfg, rng))
    d_llama = max(
        float(jnp.abs(x - y).max())
        for x, y in zip(
            jax.tree_util.tree_leaves(new_state.params["llama"]),
            jax.tree_util.tree_leaves(params["llama"]),
        )
    )
    d_clip = max(
        float(jnp.abs(x - y).max())
        for x, y in zip(
            jax.tree_util.tree_leaves(new_state.params["clip"]),
            jax.tree_util.tree_leaves(params["clip"]),
        )
    )
    assert d_llama > 0
    assert d_clip == 0


def test_remat_policies_identical_grads(tiny, rng):
    """"full"/"dots"/True remat change scheduling only — grads must be
    bitwise identical to no-remat (reference: --gradient_checkpointing,
    train_stage2.sh:53; policy plumbing models/llama.py::apply_remat)."""
    import functools

    from gpt4roi_tpu.train.loop import loss_fn

    cfg, params = tiny
    batch = batch_dict(cfg, rng)
    grads = {}
    for mode in ("none", "full", "dots", True):
        f = functools.partial(loss_fn, remat=mode, stage="stage2")
        loss, g = jax.value_and_grad(f)(params, cfg, batch, jnp.float32)
        assert np.isfinite(float(loss))
        grads[mode] = g
    for mode in ("full", "dots", True):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), grads["none"], grads[mode]
        )
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0, mode


def test_loss_decreases(tiny, rng):
    cfg, params = tiny
    tcfg = TrainConfig(stage="stage2", learning_rate=5e-3, total_steps=30, warmup_steps=0)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx, compute_dtype=jnp.float32))
    batch = batch_dict(cfg, rng)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_sharded_train_step_8dev(tiny, rng):
    cfg, params = tiny
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    tcfg = TrainConfig(stage="stage2", learning_rate=1e-3, total_steps=10, warmup_steps=0)
    jit_step, init_state, param_sh = make_sharded_train_step(
        cfg, tcfg, mesh, params, compute_dtype=jnp.float32, fsdp_min_size=1024
    )
    # pass host copies: device_put may alias the fixture's on-device arrays
    # and the donated jit_step would delete them for later tests
    state = init_state(jax.tree_util.tree_map(np.asarray, params))
    batch = batch_dict(cfg, rng, b=8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    state, metrics = jit_step(state, batch)
    state, metrics = jit_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # at least one large param is actually sharded
    shardings = [x.sharding for x in jax.tree_util.tree_leaves(state.params)]
    assert any(not s.is_fully_replicated for s in shardings)


def test_checkpoint_roundtrip(tiny, tmp_path):
    from gpt4roi_tpu.train.checkpoints import (
        latest_step,
        restore_checkpoint,
        restore_params_only,
        save_checkpoint,
    )

    cfg, params = tiny
    tcfg = TrainConfig(stage="stage1", total_steps=10)
    state = create_train_state(params, tcfg)
    ck = str(tmp_path / "ckpt")
    save_checkpoint(ck, state, step=3)
    assert latest_step(ck) == 3
    template = jax.tree_util.tree_map(np.asarray, state)
    restored = restore_checkpoint(ck, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["mm_projector"]["kernel"]),
        np.asarray(params["mm_projector"]["kernel"]),
    )
    # weights-only: stage2 init from stage1 checkpoint
    p2 = restore_params_only(ck, template.params)
    np.testing.assert_array_equal(
        np.asarray(p2["spi"]["updims"]["kernel"]), np.asarray(params["spi"]["updims"]["kernel"])
    )


def test_checkpoint_layout_autoconvert(tiny, tmp_path):
    """VERDICT r2 item 7: an unrolled checkpoint restores into a stacked
    (--scan_layers) template and vice versa, with no manual conversion."""
    from gpt4roi_tpu.models.llama import layer_params_list, to_stacked_params
    from gpt4roi_tpu.train.checkpoints import restore_params_only, save_checkpoint

    cfg, params = tiny
    tcfg = TrainConfig(stage="stage1", total_steps=10)
    state = create_train_state(params, tcfg)
    ck = str(tmp_path / "ckpt_unrolled")
    save_checkpoint(ck, state, step=1)

    # unrolled on disk -> stacked template
    stacked_template = dict(params)
    stacked_template["llama"] = to_stacked_params(
        jax.tree_util.tree_map(np.asarray, params["llama"])
    )
    got = restore_params_only(ck, stacked_template)
    assert "layers_stacked" in got["llama"] and "layers" not in got["llama"]
    want0 = params["llama"]["layers"][0]["q"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got["llama"]["layers_stacked"]["q"])[0][0]),
        np.asarray(want0),
    )

    # stacked on disk -> unrolled template
    stacked_params = dict(params)
    stacked_params["llama"] = to_stacked_params(params["llama"])
    state2 = create_train_state(stacked_params, tcfg)
    ck2 = str(tmp_path / "ckpt_stacked")
    save_checkpoint(ck2, state2, step=1)
    got2 = restore_params_only(ck2, jax.tree_util.tree_map(np.asarray, params))
    assert "layers" in got2["llama"] and "layers_stacked" not in got2["llama"]
    np.testing.assert_array_equal(
        np.asarray(got2["llama"]["layers"][-1]["o"]["kernel"]),
        np.asarray(params["llama"]["layers"][-1]["o"]["kernel"]),
    )


def test_param_labels(tiny):
    cfg, params = tiny
    labs = param_labels(params, "stage1")
    assert set(jax.tree_util.tree_leaves(labs["clip"])) == {"frozen"}
    assert set(jax.tree_util.tree_leaves(labs["spi"])) == {"spi"}
    assert set(jax.tree_util.tree_leaves(labs["llama"])) == {"frozen"}
    labs2 = param_labels(params, "stage2")
    assert set(jax.tree_util.tree_leaves(labs2["llama"])) == {"train"}
    assert set(jax.tree_util.tree_leaves(labs2["clip"])) == {"frozen"}


def test_mpt_train_step(rng):
    """MPT-decoder training path (VERDICT r1 item 5): one stage-2 step with
    decoder_type='mpt' — finite loss, mpt weights move, clip frozen."""
    import dataclasses

    from gpt4roi_tpu.models.mpt import MptConfig

    cfg = dataclasses.replace(
        Gpt4RoiConfig.tiny(), decoder_type="mpt", mpt=MptConfig.tiny(vocab_size=128)
    )
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    assert "mpt" in params and "llama" not in params
    tcfg = TrainConfig(stage="stage2", learning_rate=1e-3, total_steps=10, warmup_steps=0)
    tx = make_optimizer(tcfg, params)
    state = create_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, tx, compute_dtype=jnp.float32)
    batch = batch_dict(cfg, rng)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    def max_delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert max_delta(new_state.params["mpt"], params["mpt"]) > 0
    assert max_delta(new_state.params["clip"], params["clip"]) == 0


def test_scan_layers_training_matches_unrolled(tiny, rng):
    """Stacked-params training (scan-over-layers; 7B compile-time lever):
    loss and gradients match the unrolled layout."""
    from gpt4roi_tpu.models.llama import to_stacked_params
    from gpt4roi_tpu.train.loop import loss_fn

    cfg, params = tiny
    batch = batch_dict(cfg, rng)
    sp = dict(params)
    sp["llama"] = to_stacked_params(params["llama"])

    l_unrolled, g_unrolled = jax.value_and_grad(loss_fn)(
        params, cfg, batch, jnp.float32, stage="stage2"
    )
    l_stacked, g_stacked = jax.value_and_grad(loss_fn)(
        sp, cfg, batch, jnp.float32, stage="stage2"
    )
    np.testing.assert_allclose(float(l_stacked), float(l_unrolled), rtol=1e-5)

    # per-layer grads: stack the unrolled tree and compare leaf-wise
    from gpt4roi_tpu.models.llama import stack_decode_layers

    want = stack_decode_layers(g_unrolled["llama"]["layers"])
    got = g_stacked["llama"]["layers_stacked"]
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_scan_layers_sharded_step_8dev(tiny, rng):
    """Stacked training through the full sharded (FSDP) step on the
    8-device mesh: finite loss, params move."""
    from gpt4roi_tpu.models.llama import to_stacked_params
    from gpt4roi_tpu.train.loop import make_sharded_train_step

    cfg, params = tiny
    sp = dict(params)
    sp["llama"] = to_stacked_params(params["llama"])
    mesh = make_mesh()
    tcfg = TrainConfig(stage="stage2", learning_rate=1e-3, total_steps=4, warmup_steps=0)
    jit_step, init_state, _ = make_sharded_train_step(
        cfg, tcfg, mesh, sp, compute_dtype=jnp.float32
    )
    state = init_state(sp)
    batch = batch_dict(cfg, rng, b=8)
    state, metrics = jit_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_qkv_training_matches_unfused(tiny, rng):
    """fuse_stacked_qkv (one qkv + one gate_up matmul per layer — round-4
    train-MFU lever): loss and the fused-weight gradients match the
    unfused stacked layout (grad slices concatenate exactly)."""
    from gpt4roi_tpu.models.llama import fuse_stacked_qkv, to_stacked_params
    from gpt4roi_tpu.train.loop import loss_fn

    cfg, _ = tiny
    # fresh params: earlier sharded-step tests donate buffers aliasing the
    # module fixture's leaves (CPU device_put can alias shard 0)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    batch = batch_dict(cfg, rng)
    sp = dict(params)
    sp["llama"] = to_stacked_params(params["llama"])
    fp = dict(sp)
    fp["llama"] = fuse_stacked_qkv(sp["llama"])
    assert "qkv" in fp["llama"]["layers_stacked"]
    assert "q" not in fp["llama"]["layers_stacked"]

    l_u, g_u = jax.value_and_grad(loss_fn)(sp, cfg, batch, jnp.float32, stage="stage2")
    l_f, g_f = jax.value_and_grad(loss_fn)(fp, cfg, batch, jnp.float32, stage="stage2")
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-5)

    gu = g_u["llama"]["layers_stacked"]
    gf = g_f["llama"]["layers_stacked"]
    want_qkv = np.concatenate(
        [np.asarray(gu[k]["kernel"]) for k in ("q", "k", "v")], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(gf["qkv"]["kernel"]), want_qkv, rtol=1e-4, atol=1e-5
    )
    want_gu = np.concatenate(
        [np.asarray(gu[k]["kernel"]) for k in ("gate", "up")], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(gf["gate_up"]["kernel"]), want_gu, rtol=1e-4, atol=1e-5
    )

    # and the full train step runs on the fused tree (optimizer labels
    # follow top-level subtrees, so fused leaves train normally)
    tcfg = TrainConfig(stage="stage2", learning_rate=1e-3, total_steps=4, warmup_steps=0)
    state = create_train_state(fp, tcfg)
    step = make_train_step(cfg, tcfg, make_optimizer(tcfg, fp), compute_dtype=jnp.float32)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = np.abs(
        np.asarray(new_state.params["llama"]["layers_stacked"]["qkv"]["kernel"])
        - np.asarray(fp["llama"]["layers_stacked"]["qkv"]["kernel"])
    ).max()
    assert moved > 0
