"""RoI-head pconv strategies on the attached TPU.

The 4 per-level 3x3x1024x1024 pconvs over (256, 14, 14, 1024) RoI maps are
~3.8 TFLOP total but measure ~21 ms inside the encode profile — roughly
half the 325 TOP/s int8 conv rate the (larger-map) fuse convs sustain
(scripts/micro_int8_conv.py). Since the four level outputs are SUMMED
(reference: gpt4roi/models/layers.py:303-318), conv(concat_C(x_i)) with the
kernels stacked along cin equals sum_i conv_i(x_i) — one conv, one int32
materialization, one epilogue, and a 4x-larger cin for MXU tiling.

Variants:
  sep4    — current serving path: 4 separate W8A8 convs + f32 epilogue sum
  concat  — one int8 conv over the channel-concat (shared act scale)
  padval  — same, spatial pre-pad 14->16 + VALID (tile-friendlier dims?)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, H, C, COUT, LVLS = 256, 14, 1024, 1024, 4


def timeit(fn, args, n=30, label=""):
    out = fn(*args, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    tops = LVLS * N * H * H * 9 * C * COUT * 2 / dt / 1e12
    print(f"{label:10s} {dt * 1e3:7.3f} ms   {tops:6.1f} TOP/s")
    return dt


def conv_i8(x, k, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def main():
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(-127, 128, (N, H, H, C)), jnp.int8)
        for _ in range(LVLS)
    ]
    ks = [
        jnp.asarray(rng.integers(-127, 128, (3, 3, C, COUT)), jnp.int8)
        for _ in range(LVLS)
    ]
    scales = jnp.asarray(rng.random((LVLS,)) + 0.5, jnp.float32)
    sw = jnp.asarray(rng.random((COUT,)) + 0.5, jnp.float32)

    @jax.jit
    def sep4(xs, ks, salt):
        acc = None
        for lvl in range(LVLS):
            x = (xs[lvl].astype(jnp.int32) + salt.astype(jnp.int32)).astype(jnp.int8)
            yi = conv_i8(x, ks[lvl])
            y = yi.astype(jnp.float32) * (scales[lvl] * sw)
            acc = y if acc is None else acc + y
        return jax.nn.relu(acc).sum().astype(jnp.float32)

    @jax.jit
    def concat(xs, ks, salt):
        x = jnp.concatenate(
            [(x.astype(jnp.int32) + salt.astype(jnp.int32)).astype(jnp.int8) for x in xs],
            axis=-1,
        )
        k = jnp.concatenate(ks, axis=2)
        yi = conv_i8(x, k)
        y = yi.astype(jnp.float32) * (scales[0] * sw)
        return jax.nn.relu(y).sum().astype(jnp.float32)

    @jax.jit
    def padval(xs, ks, salt):
        x = jnp.concatenate(
            [(x.astype(jnp.int32) + salt.astype(jnp.int32)).astype(jnp.int8) for x in xs],
            axis=-1,
        )
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        k = jnp.concatenate(ks, axis=2)
        yi = conv_i8(x, k, padding="VALID")
        y = yi.astype(jnp.float32) * (scales[0] * sw)
        return jax.nn.relu(y).sum().astype(jnp.float32)

    timeit(sep4, (xs, ks), label="sep4")
    timeit(concat, (xs, ks), label="concat")
    timeit(padval, (xs, ks), label="padval")


if __name__ == "__main__":
    main()
