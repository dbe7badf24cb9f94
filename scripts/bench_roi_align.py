"""RoIAlign kernel micro-bench + parity check at production scale (TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.ops.roi_align import roi_align_batched
from gpt4roi_tpu.ops.roi_align_pallas import roi_align_batched_pallas

B, R, C = 8, 32, 1024
LEVELS = [(128, 1.75), (64, 3.5), (32, 7.0), (16, 14.0)]


def main():
    rng = np.random.default_rng(0)
    wh = rng.random((B, R, 2), dtype=np.float32) * 0.5
    xy = rng.random((B, R, 2), dtype=np.float32) * 0.45
    boxes = jnp.asarray(np.concatenate([xy, np.minimum(xy + wh + 0.05, 1.0)], -1)) * 224.0
    box_mask = jnp.ones((B, R), bool)
    feats = {
        s: jnp.asarray(rng.standard_normal((B, s, s, C), dtype=np.float32), jnp.bfloat16)
        for s, _ in LEVELS
    }

    # parity vs the XLA separable implementation (fp32 oracle on bf16 inputs)
    for s, stride in LEVELS:
        got = np.asarray(
            roi_align_batched_pallas(feats[s], boxes, box_mask, 14, 1.0 / stride, 2)
        ).astype(np.float32)
        want = np.asarray(
            roi_align_batched(
                feats[s].astype(jnp.float32), boxes, box_mask, 14, 1.0 / stride, 2
            )
        )
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        print(f"level {s:4d}: rel err {err:.2e}")
        assert err < 2e-2, err

    @jax.jit
    def all_levels(feats, boxes, box_mask, salt):
        salt = (salt * 1e-30).astype(jnp.bfloat16)
        tot = jnp.zeros((), jnp.float32)
        for s, stride in LEVELS:
            rf = roi_align_batched_pallas(feats[s] + salt, boxes, box_mask, 14, 1.0 / stride, 2)
            tot = tot + rf.sum().astype(jnp.float32)
        return tot

    out = all_levels(feats, boxes, box_mask, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    n = 30
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = all_levels(feats, boxes, box_mask, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"RoIAlign x4 levels fwd: {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
