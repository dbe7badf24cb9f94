"""Does XLA lower int8 x int8 conv to the MXU's int8 path on v5e?

The SPI fuse pyramid (5 rounds of 3x3 1024-ch convs at 128^2..16^2) is
~76% of encode time at ~163-182 bf16 TF/s. v5e's MXU does int8 at 2x the
bf16 rate; if conv_general_dilated(int8, int8) -> int32 hits it, the
encode ceiling nearly doubles. Chained, host-fetch barrier.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 8, 128, 128, 1024


def run(name, dtype, make, iters=20):
    x = jax.jit(lambda k: make(k, (B, H, W, C)))(jax.random.PRNGKey(0))
    w = jax.jit(lambda k: make(k, (3, 3, C, C)))(jax.random.PRNGKey(1))
    np.asarray(jnp.sum(w[..., :1, :1]))

    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def chain(x, w):
        for _ in range(4):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32,
            )
            if dtype == jnp.int8:
                x = jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
            else:
                x = (y * 0.03).astype(dtype)
        return x

    out = chain(x, w)
    np.asarray(out[0, 0, 0, :1])
    t0 = time.perf_counter()
    out = x
    for _ in range(iters):
        out = chain(out, w)
    np.asarray(out[0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / (iters * 4)
    flops = 2 * B * H * W * 9 * C * C
    print(f"{name:16s} {dt*1e3:7.2f} ms/conv  {flops/dt/1e12:6.1f} TOP/s")


def main():
    print("backend:", jax.default_backend())
    run("bf16 conv", jnp.bfloat16, lambda k, s: jax.random.normal(k, s, jnp.bfloat16) * 0.03)
    run("int8 conv", jnp.int8, lambda k, s: jax.random.randint(k, s, -127, 128, jnp.int8))


if __name__ == "__main__":
    main()
