"""On-chip measurement: Pallas fuse-conv epilogue vs the XLA int8 conv +
scale + GroupNorm + ReLU chain, at every SPI pyramid level's production
shape (b=8 encode batch, 1024 channels, GN groups 64).

The XLA chain materialises the int32 conv output (4 B/el) and re-reads it
for scale+GN stats; the Pallas kernel emits the scaled bf16 map + (B, 64)
GN partials in one pass (ops/fuse_conv_gn.py). Also asserts on-chip
numerical parity once per level.

Methodology per CLAUDE.md: iterations chained through a data dependency,
one host fetch at the end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gpt4roi_tpu.ops.fuse_conv_gn import fuse_round_level_pallas
from gpt4roi_tpu.ops.norms import group_norm

B, C = 8, 1024
LEVELS = [128, 64, 32, 16]
GROUPS = 64


def chain_time(fn, args, n=20, label=""):
    salt = jnp.zeros((), jnp.int32)
    out = fn(*args, salt)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = salt
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    wq = jnp.asarray(rng.integers(-25, 26, (3, 3, C, C)), jnp.int8)
    scale = jnp.asarray((rng.random(C) + 0.5) * 1e-3, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    totals = {"xla": 0.0, "pallas": 0.0}
    for hw in LEVELS:
        x = jnp.asarray(rng.integers(-127, 128, (B, hw, hw, C)), jnp.int8)

        @jax.jit
        def xla_round(x, wq, scale, gamma, beta, salt):
            x = x + (salt % 1).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x, wq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            y = group_norm(y, gamma, beta, GROUPS)
            y = jax.nn.relu(y)
            return jnp.sum(y.astype(jnp.float32)).astype(jnp.int32)

        @jax.jit
        def pallas_round(x, wq, scale, gamma, beta, salt):
            x = x + (salt % 1).astype(jnp.int8)
            y = fuse_round_level_pallas(x, wq, scale, gamma, beta)
            return jnp.sum(y.astype(jnp.float32)).astype(jnp.int32)

        # on-chip parity (bf16-map class tolerance)
        got = np.asarray(
            jax.jit(lambda x: fuse_round_level_pallas(x, wq, scale, gamma, beta))(x),
            np.float32,
        )
        want = np.asarray(
            jax.jit(
                lambda x: jax.nn.relu(
                    group_norm(
                        (
                            jax.lax.conv_general_dilated(
                                x, wq, window_strides=(1, 1), padding="SAME",
                                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                preferred_element_type=jnp.int32,
                            ).astype(jnp.float32)
                            * scale
                        ).astype(jnp.bfloat16),
                        gamma, beta, GROUPS,
                    )
                )
            )(x),
            np.float32,
        )
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        print(f"level {hw:3d} parity rel-err {err:.2e}")

        totals["xla"] += chain_time(
            xla_round, (x, wq, scale, gamma, beta), label=f"XLA   conv+GN+relu {hw}x{hw}"
        )
        totals["pallas"] += chain_time(
            pallas_round, (x, wq, scale, gamma, beta), label=f"Pallas epilogue    {hw}x{hw}"
        )

    print(
        f"\nper-round totals over 4 levels: XLA {totals['xla'] * 1e3:.2f} ms, "
        f"Pallas {totals['pallas'] * 1e3:.2f} ms "
        f"({totals['xla'] / totals['pallas']:.2f}x); x5 rounds: "
        f"XLA {totals['xla'] * 5e3:.1f} ms vs Pallas {totals['pallas'] * 5e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
