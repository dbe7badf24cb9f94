"""Ablate the MLVLFuse backward (the train-step intercept's dominant cost).

micro_train_intercept.py measures fuse fwd+bwd at 194 ms (b2) against a
~26 ms forward — the backward is ~7x the forward instead of ~2x. This
isolates the suspects: kernel-sliced convs (3 conv bwds per level-round)
vs one concat conv, the per-round jax.checkpoint recompute, GroupNorm,
and the cross-level interps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.ops.interp import interpolate_bilinear
from gpt4roi_tpu.ops.norms import group_norm

B = 2
SIZES = (128, 64, 32, 16)
C = 1024
ROUNDS = 5
GROUPS = 64
RC, SC = C - 2 * (C // 4), C // 4  # remain / shuffle channels


def timeit(fn, args, n=10, label=""):
    out = fn(*args, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:8.2f} ms")
    return dt


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_round(mode, use_gn, use_interp):
    def one_round(levels, kern, gn_scale, gn_bias):
        n = len(levels)
        new_levels = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            tar = levels[lvl]
            hw = (tar.shape[1], tar.shape[2])
            if use_interp:
                from_top = interpolate_bilinear(
                    levels[top][..., RC + SC:], hw, align_corners=True)
                from_down = interpolate_bilinear(
                    levels[down][..., RC:RC + SC], hw, align_corners=True)
            else:
                from_top = tar[..., RC + SC:]
                from_down = tar[..., RC:RC + SC]
            if mode == "sliced":
                y = (
                    conv(tar[..., :RC], kern[:, :, :RC, :])
                    + conv(from_top, kern[:, :, RC + SC:, :])
                    + conv(from_down, kern[:, :, RC:RC + SC, :])
                )
            else:
                x = jnp.concatenate([tar[..., :RC], from_down, from_top], axis=-1)
                y = conv(x, kern)
            if use_gn:
                y = group_norm(y, gn_scale, gn_bias, GROUPS)
            new_levels.append(jax.nn.relu(y))
        return new_levels

    return one_round


def build(mode, ckpt, use_gn=True, use_interp=True):
    one_round = make_round(mode, use_gn, use_interp)
    if ckpt:
        one_round = jax.checkpoint(one_round)

    @jax.jit
    def fwdbwd(levels, kerns, gn_scale, gn_bias, salt):
        salt = (salt * 1e-30).astype(levels[0].dtype)

        def loss(kerns):
            ls = [l + salt for l in levels]
            for r in range(ROUNDS):
                ls = one_round(ls, kerns[r], gn_scale, gn_bias)
            return sum(l.astype(jnp.float32).sum() for l in ls)

        l, g = jax.value_and_grad(loss)(kerns)
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(g))

    return fwdbwd


def main():
    rng = np.random.default_rng(0)
    levels = [
        jnp.asarray(rng.standard_normal((B, s, s, C)) * 0.1, jnp.bfloat16)
        for s in SIZES
    ]
    kerns = jnp.asarray(rng.standard_normal((ROUNDS, 3, 3, C, C)) * 0.01, jnp.bfloat16)
    gn_scale = jnp.ones((C,), jnp.bfloat16)
    gn_bias = jnp.zeros((C,), jnp.bfloat16)
    args = (levels, kerns, gn_scale, gn_bias)

    timeit(build("sliced", True), args, label="sliced + ckpt (current)")
    timeit(build("concat", True), args, label="concat + ckpt")
    timeit(build("sliced", False), args, label="sliced, no ckpt")
    timeit(build("concat", False), args, label="concat, no ckpt")
    timeit(build("concat", False, use_gn=False), args, label="concat, no ckpt, no GN")
    timeit(build("concat", False, use_interp=False), args, label="concat, no ckpt, no interp")


if __name__ == "__main__":
    main()
