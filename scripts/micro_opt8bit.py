"""Isolate the adamw_8bit update cost at 7B-layer scale and compare the
log-domain v quantizer against a bitcast (IEEE-bit-pattern) variant.

The measured train slope decomposes as ~40 ms/layer grad + ~18 ms/layer
optimizer (scripts/micro_layer_bwd.py). The v-moment round-trip is
log10 + 10** per element per step; the float32 bit pattern is a
piecewise-linear approximation of log2, so quantizing the BITS linearly
gives the same uniform-relative-error class with only integer/multiply
VPU ops.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from gpt4roi_tpu.train import optim8bit as o8

N = 202 * 2**20  # ~one 7B layer's params


def chain_time(fn, args, n=10, label=""):
    salt = jnp.zeros((), jnp.float32)
    out = fn(*args, salt)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = salt
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


# bit-pattern log quantizer: clamp norm to [2^-LOG2_RANGE, 1], then quantize
# the uint32 float bit pattern linearly over [bits(min), bits(1.0)].
LOG2_RANGE = o8.LOG_DECADES * 3.321928  # same 8-decade coverage


def _quantize_bits(x, size):
    blocks = o8._blocks(x, size)
    amax = jnp.max(blocks, axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0)
    norm = blocks / scale
    lo = np.float32(2.0 ** -LOG2_RANGE)
    bl = np.uint32(np.frombuffer(np.float32(lo).tobytes(), np.uint32)[0])
    bh = np.uint32(np.frombuffer(np.float32(1.0).tobytes(), np.uint32)[0])
    b = jax.lax.bitcast_convert_type(jnp.maximum(norm, lo).astype(jnp.float32), jnp.uint32)
    q = jnp.round((b - bl).astype(jnp.float32) * (254.0 / float(bh - bl))) + 1.0
    q = jnp.where(norm > 0, jnp.clip(q, 1, 255), 0).astype(jnp.uint8)
    return o8._QMoment(q=q, scale=scale.astype(jnp.float32))


def _dequantize_bits(qm, shape, size):
    lo = np.float32(2.0 ** -LOG2_RANGE)
    bl = np.uint32(np.frombuffer(np.float32(lo).tobytes(), np.uint32)[0])
    bh = np.uint32(np.frombuffer(np.float32(1.0).tobytes(), np.uint32)[0])
    i = qm.q.astype(jnp.float32)
    bits = (jnp.round((i - 1.0) * (float(bh - bl) / 254.0)).astype(jnp.uint32) + bl)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    flat = (jnp.where(qm.q > 0, val, 0.0) * qm.scale).reshape(-1)
    return flat[:size].reshape(shape)


def roundtrip(quant, dequant, label):
    g = jax.random.uniform(jax.random.PRNGKey(0), (N,), jnp.float32) * 1e-4

    @jax.jit
    def step(g, salt):
        v = g * g + salt * 1e-30
        qm = quant(v, v.size)
        v2 = dequant(qm, v.shape, v.size)
        return jnp.sum(v2) * 1e-30

    chain_time(step, (g,), label=label)


def full_update(label, use_bits):
    if use_bits:
        o8._quantize_log, o8._dequantize_log = _quantize_bits, _dequantize_bits
    g = (jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.bfloat16) * 1e-3).reshape(-1, 4096)
    tx = o8.scale_by_adam_8bit()
    params = {"w": g.astype(jnp.float32)}
    state = tx.init(params)

    @jax.jit
    def step(g, state, salt):
        gg = {"w": g + (salt * 1e-30).astype(g.dtype)}
        steps, st = tx.update(gg, state)
        # consume BOTH new moments (q and scale): the v quantize-back is
        # the exact op the log10-vs-bits variants swap — leaving st.nu
        # unconsumed would let XLA dead-code it out of the comparison
        return (
            jnp.sum(steps["w"].astype(jnp.float32)) * 1e-30
            + jnp.sum(st.mu["w"].q.astype(jnp.float32)) * 1e-30
            + jnp.sum(st.nu["w"].q.astype(jnp.float32)) * 1e-30
            + jnp.sum(st.nu["w"].scale) * 1e-30
        )

    chain_time(step, (g, state), label=label)


def accuracy():
    rng = np.random.default_rng(0)
    v = np.abs(rng.standard_normal(1 << 16).astype(np.float32)) ** 6 * 1e-6
    for q, d, name in ((o8._quantize_log, o8._dequantize_log, "log10"),
                       (_quantize_bits, _dequantize_bits, "bits")):
        qm = q(jnp.asarray(v), v.size)
        v2 = np.asarray(d(qm, v.shape, v.size))
        nz = v > v.max() * 10.0**-o8.LOG_DECADES
        rel = np.abs(v2[nz] - v[nz]) / v[nz]
        print(f"{name}: max rel err {rel.max():.4f} mean {rel.mean():.4f}")


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    accuracy()
    roundtrip(o8._quantize_log, o8._dequantize_log, "v roundtrip log10/10** (current)")
    roundtrip(_quantize_bits, _dequantize_bits, "v roundtrip bitcast linear")
    full_update("full adam8 update 202M (log10)", False)
    full_update("full adam8 update 202M (bits)", True)


if __name__ == "__main__" and not os.environ.get("PIECES"):
    main()


def roundtrip_native(label):
    # no pad/reshape plumbing: operate on (nb, 256) natively
    nb = N // 256
    g = jax.random.uniform(jax.random.PRNGKey(0), (nb, 256), jnp.float32) * 1e-4

    @jax.jit
    def step(g, salt):
        v = g * g + salt * 1e-30
        amax = jnp.max(v, axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax, 1.0)
        norm = v / scale
        logn = jnp.log10(jnp.maximum(norm, 10.0**-8))
        idx = jnp.round((logn / 8.0 + 1.0) * 254.0) + 1.0
        q = jnp.where(norm > 0, jnp.clip(idx, 1, 255), 0).astype(jnp.uint8)
        i = q.astype(jnp.float32)
        val = 10.0 ** (((i - 1.0) / 254.0 - 1.0) * 8.0)
        v2 = jnp.where(q > 0, val, 0.0) * scale
        return jnp.sum(v2) * 1e-30

    chain_time(step, (g,), label=label)


def roundtrip_pieces():
    nb = N // 256
    g = jax.random.uniform(jax.random.PRNGKey(0), (nb, 256), jnp.float32) * 1e-4

    @jax.jit
    def amax_only(g, salt):
        v = g * g + salt * 1e-30
        return jnp.sum(jnp.max(v, axis=1)) * 1e-30

    @jax.jit
    def elemwise_only(g, salt):
        v = g * g + salt * 1e-30
        logn = jnp.log10(jnp.maximum(v, 10.0**-8))
        idx = jnp.round((logn / 8.0 + 1.0) * 254.0) + 1.0
        q = jnp.clip(idx, 1, 255).astype(jnp.uint8)
        val = 10.0 ** (((q.astype(jnp.float32) - 1.0) / 254.0 - 1.0) * 8.0)
        return jnp.sum(val) * 1e-30

    chain_time(amax_only, (g,), label="blockwise amax only")
    chain_time(elemwise_only, (g,), label="log10+10** elemwise only")


if __name__ == "__main__" and os.environ.get("PIECES"):
    print(f"backend={jax.default_backend()}", flush=True)
    roundtrip_native("v roundtrip native (nb,256), no pad")
    roundtrip_pieces()
