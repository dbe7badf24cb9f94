"""Flash-attention fwd / fwd+bwd timing at the stage-2 training shape.

b2 s2048 h32 d128 bf16 — the per-layer attention cost inside the train
step (reference gets this from the flash-attn CUDA monkey patch,
gpt4roi/train/llama_flash_attn_monkey_patch.py:12-98). Compares the
Pallas kernel against XLA mha; chained-jit timing (salt dependency +
single host fetch — the axon tunnel ignores block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.ops.attention import flash_attention, mha

B, S, H, D = 2, 2048, 32, 128


def timeit(fn, args, n=20, label=""):
    out = fn(*args, jnp.zeros((), jnp.float32))
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = jnp.zeros((), jnp.float32)
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:22s} {dt * 1e3:7.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16) for _ in range(3)
    )

    for bq, bk in ((256, 256), (512, 512), (1024, 512), (512, 1024), (1024, 1024), (2048, 512)):

        @jax.jit
        def fwd(q, k, v, salt, bq=bq, bk=bk):
            qs = q + salt.astype(q.dtype)
            return flash_attention(
                qs, k, v, causal=True, block_q=bq, block_k=bk
            ).sum().astype(jnp.float32)

        @jax.jit
        def fwdbwd(q, k, v, salt, bq=bq, bk=bk):
            qs = q + salt.astype(q.dtype)

            def loss(q, k, v):
                return flash_attention(
                    q, k, v, causal=True, block_q=bq, block_k=bk
                ).astype(jnp.float32).sum()

            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(qs, k, v)
            return l + sum(g.astype(jnp.float32).sum() for g in grads)

        timeit(fwd, (q, k, v), label=f"flash fwd {bq}x{bk}")
        timeit(fwdbwd, (q, k, v), label=f"flash fwd+bwd {bq}x{bk}")

    @jax.jit
    def xla_fwdbwd(q, k, v, salt):
        qs = q + salt.astype(q.dtype)

        def loss(q, k, v):
            return mha(q, k, v, causal=True).astype(jnp.float32).sum()

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(qs, k, v)
        return l + sum(g.astype(jnp.float32).sum() for g in grads)

    timeit(xla_fwdbwd, (q, k, v), label="xla fwd+bwd")


if __name__ == "__main__":
    main()
