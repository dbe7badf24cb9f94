"""Pallas fuse-conv epilogue parity vs the XLA int8-conv + scale + GN + ReLU
oracle (the math of models/spi.py::one_round_static). Runs the kernel in
interpret mode on the CPU mesh; on-chip parity is asserted by
scripts/micro_fuse_epilogue.py on the real TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.ops.fuse_conv_gn import fuse_conv_scaled_stats, fuse_round_level_pallas
from gpt4roi_tpu.ops.norms import group_norm


def _oracle(qcat, wq, scale, gamma, beta, groups, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        qcat, wq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * scale
    y = group_norm(y, gamma, beta, groups, eps=eps)
    return jax.nn.relu(y)


@pytest.mark.parametrize("shape", [(2, 16, 16, 128, 128), (1, 32, 32, 256, 256)])
def test_conv_stats_parity(rng, shape):
    b, h, w, cin, cout = shape
    x = rng.integers(-127, 128, (b, h, w, cin)).astype(np.int8)
    wq = rng.integers(-20, 21, (3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout).astype(np.float32) + 0.5) * 1e-3
    groups = 16

    xpad = jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y, gsum, gsq = fuse_conv_scaled_stats(
        xpad, jnp.asarray(wq), jnp.asarray(scale),
        h_tile=8, c_tile=cout // 2, groups=groups, interpret=True,
    )

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wq), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(np.float32) * scale
    want = np.asarray(want)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), want.astype(np.float32), rtol=8e-3, atol=1e-4
    )  # bf16 output vs f32 oracle
    wg = want.reshape(b, h * w, groups, cout // groups)
    np.testing.assert_allclose(
        np.asarray(gsum), wg.sum(axis=(1, 3)), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(gsq), (wg.astype(np.float64) ** 2).sum(axis=(1, 3)),
        rtol=1e-4, atol=1.0,
    )


def test_full_round_parity(rng):
    b, h, w, cin, cout = 1, 16, 16, 128, 128
    groups = 16
    x = rng.integers(-127, 128, (b, h, w, cin)).astype(np.int8)
    wq = rng.integers(-20, 21, (3, 3, cin, cout)).astype(np.int8)
    scale = (rng.random(cout).astype(np.float32) + 0.5) * 1e-3
    gamma = rng.standard_normal(cout).astype(np.float32) * 0.1 + 1.0
    beta = rng.standard_normal(cout).astype(np.float32) * 0.1

    got = fuse_round_level_pallas(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
        jnp.asarray(gamma), jnp.asarray(beta), out_dtype=jnp.float32,
        groups=groups, interpret=True,
    )
    want = _oracle(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
        jnp.asarray(gamma), jnp.asarray(beta), groups,
    )
    # bf16 map + stats round-trip vs all-f32 oracle
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
