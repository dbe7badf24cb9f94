"""Microbench: can the v5e stream int8 weights straight to the MXU?

Round-1 finding: int8 -> bf16 widening (XLA fused or Pallas) is VPU-bound at
~275 GB/s, LOSING to bf16 decode (weights stream ~700 GB/s as bf16). The
question for round 2: does an int8 x int8 -> int32 dot (native MXU int8 on
v5e) stream weights at the HBM floor (~819 GB/s), skipping the widen?

Structure mirrors the real decode loop (scripts/bench_decode.py): NW
separate weight arrays (a params pytree), lax.scan over TOKENS, all NW
matmuls inside each step, output chained into the next token. Sync via host
fetch (axon RPC: block_until_ready is not a barrier).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 8, 4096, 11008
NW = 32   # "layers"
TOK = 16  # tokens per chain


def run(name, make_w, matmul, iters=4):
    keys = jax.random.split(jax.random.PRNGKey(0), NW)
    ws = [jax.jit(make_w)(k) for k in keys]
    np.asarray(sum(jnp.sum(w[:1, :1]) for w in ws))  # materialise
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((M, K)), jnp.bfloat16)

    @jax.jit
    def chain(x, ws):
        def body(x, _):
            acc = jnp.zeros((M,), jnp.float32)
            for w in ws:
                y = matmul(x, w)
                acc = acc + y[:, 0].astype(jnp.float32)
            x = x * 0.999 + acc[:, None].astype(x.dtype) * 1e-6
            return x, ()

        x, _ = jax.lax.scan(body, x, None, length=TOK)
        return x

    out = chain(x0, ws)
    np.asarray(out)  # compile + warm
    t0 = time.perf_counter()
    out = x0
    for _ in range(iters):
        out = chain(out, ws)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (iters * TOK * NW)
    wbytes = ws[0].size * ws[0].itemsize
    print(
        f"{name:24s} {dt*1e6:8.1f} us/matmul  "
        f"{wbytes/dt/1e9:7.1f} GB/s weight-stream"
    )
    return dt


def main():
    print("backend:", jax.default_backend())

    def w_bf16(key):
        return jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02

    def w_i8(key):
        return jax.random.randint(key, (K, N), -127, 128, jnp.int8)

    run("bf16 x bf16", w_bf16, lambda x, w: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    run("bf16 x widen(int8)", w_i8, lambda x, w: jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))

    def mm_i8(x, w):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 8.0), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (1.0 / 8.0)

    run("int8 x int8 (mxu)", w_i8, mm_i8)


if __name__ == "__main__":
    main()
