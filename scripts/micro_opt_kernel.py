"""Attribute the fused adamw8bit Pallas kernel's time (HBM vs VPU).

BASELINE.md round 4 measures the fused optimizer at ~11.7 ms/layer while
its in-kernel HBM traffic rooflines at ~2.5 ms (10 B/el) — the kernel
appears VPU-compute-bound on the log-domain transcendentals (exp2 dequant,
log2 requant) and the per-element divisions. This micro times, at a
one-layer-sized leaf (201M elements):

  1. floor    — same buffers in/out, trivial math (pure HBM traffic)
  2. linear_v — full adam math but v dequant/requant LINEAR (no exp2/log2)
  3. recip    — full math with block/scalar divisions as reciprocal
                multiplies (candidate optimization, same log-v storage)
  4. full     — the production kernel math (ops/opt8bit_kernel.py)

plus the XLA apply_updates pass the kernel currently leaves outside.

Timing: K vs 2K kernel steps threaded through ONE jitted lax.scan (moment
buffers as carry — in-place within the program, matching the train step's
real dataflow), host fetch once; (t_2k - t_k)/k cancels the RPC dispatch
constant (CLAUDE.md measurement rules).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gpt4roi_tpu.ops.opt8bit_kernel import (
    BLOCK, LOG_DECADES, _LOG2_10, _INV_LOG2_10, fused_adamw8bit_leaf,
)

R, C = 49152, 4096  # 201M elements ~ one 7B layer's q+k+v+o+mlp
B1, B2, EPS = 0.9, 0.999, 1e-8
K = 8


def _variant_kernel(svec_ref, g_ref, p_ref, mq_ref, ms_ref, nq_ref, ns_ref,
                    upd_ref, mqo_ref, mso_ref, nqo_ref, nso_ref,
                    *, nbc: int, mode: str):
    cscale, bc1, bc2, lr = svec_ref[0], svec_ref[1], svec_ref[2], svec_ref[3]
    tr, c = g_ref.shape
    split = lambda x: x.reshape(tr, nbc, BLOCK)

    if mode == "floor":
        upd_ref[:] = g_ref[:]
        mqo_ref[:] = mq_ref[:]
        mso_ref[:] = ms_ref[:] + 1.0
        nqo_ref[:] = nq_ref[:]
        nso_ref[:] = ns_ref[:]
        return

    g = split(g_ref[:].astype(jnp.float32)) * cscale
    m = split(mq_ref[:].astype(jnp.int32).astype(jnp.float32)) * ms_ref[:][..., None]
    iq = split(nq_ref[:].astype(jnp.int32).astype(jnp.float32))
    if mode == "linear_v":
        v = iq * ns_ref[:][..., None]
    else:
        val = jnp.exp2(((iq - 1.0) / 254.0 - 1.0) * (LOG_DECADES * _LOG2_10))
        v = jnp.where(iq > 0.0, val, 0.0) * ns_ref[:][..., None]

    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * g * g
    if mode == "recip":
        step = (m * (1.0 / bc1)) / (jnp.sqrt(v * (1.0 / bc2)) + EPS)
    else:
        step = (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
    upd_ref[:] = (-lr * step).reshape(tr, c).astype(upd_ref.dtype)

    amax = jnp.max(jnp.abs(m), axis=-1, keepdims=True)
    msc = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    mdiv = m * (1.0 / msc) if mode == "recip" else m / msc
    mqo_ref[:] = (
        jnp.clip(jnp.round(mdiv), -127, 127).astype(jnp.int32).astype(jnp.int8).reshape(tr, c)
    )
    mso_ref[:] = msc.reshape(tr, nbc)

    vmax = jnp.max(v, axis=-1, keepdims=True)
    vsc = jnp.where(vmax > 0.0, vmax, 1.0)
    norm = v * (1.0 / vsc) if mode == "recip" else v / vsc
    if mode == "linear_v":
        idx = jnp.clip(jnp.round(norm * 254.0) + 1.0, 1.0, 255.0)
    else:
        logn = jnp.log2(jnp.maximum(norm, 10.0 ** -LOG_DECADES)) * _INV_LOG2_10
        idx = jnp.round((logn / LOG_DECADES + 1.0) * 254.0) + 1.0
    nqo_ref[:] = (
        jnp.where(norm > 0.0, jnp.clip(idx, 1.0, 255.0), 0.0)
        .astype(jnp.int32).astype(jnp.uint8).reshape(tr, c)
    )
    nso_ref[:] = vsc.reshape(tr, nbc)


def variant_call(g, p, mq, ms, nq, ns, svec, mode, tr=None):
    r, c = g.shape
    nbc = c // BLOCK
    if tr is None:
        tr = max(8, min(256, ((1 << 17) // c) // 8 * 8))
    row = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((tr, nbc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_variant_kernel, nbc=nbc, mode=mode),
        grid=(pl.cdiv(r, tr),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row, row, row, srow, row, srow],
        out_specs=[row, row, srow, row, srow],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), g.dtype),
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, nbc), jnp.float32),
            jax.ShapeDtypeStruct((r, c), jnp.uint8),
            jax.ShapeDtypeStruct((r, nbc), jnp.float32),
        ],
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(svec, g, p, mq, ms, nq, ns)


@functools.partial(jax.jit, static_argnames=("k", "tr", "mode"))
def multi_tr(g, p, st, svec, k, tr, mode="full"):
    def body(st, _):
        mq, ms, nq, ns = st
        upd, mq, ms, nq, ns = variant_call(g, p, mq, ms, nq, ns, svec, mode, tr=tr)
        return (mq, ms, nq, ns), jnp.sum(upd[0, :8].astype(jnp.float32))

    st, ys = jax.lax.scan(body, st, None, length=k)
    return ys[-1] + st[1][0, 0]


@functools.partial(jax.jit, static_argnames=("mode", "k", "prod"))
def multi(g, p, st, svec, mode, k, prod=False):
    def body(st, _):
        mq, ms, nq, ns = st
        if prod:
            upd, mq, ms, nq, ns = fused_adamw8bit_leaf(
                g, p, mq, ms, nq, ns, svec, b1=B1, b2=B2, eps=EPS
            )
        else:
            upd, mq, ms, nq, ns = variant_call(g, p, mq, ms, nq, ns, svec, mode)
        return (mq, ms, nq, ns), jnp.sum(upd[0, :8].astype(jnp.float32))

    st, ys = jax.lax.scan(body, st, None, length=k)
    return ys[-1] + st[1][0, 0]


def pair_time(fn, label):
    """fn(k) -> jit output; times K and 2K programs, returns per-step s."""
    float(np.asarray(fn(K)))
    float(np.asarray(fn(2 * K)))
    t0 = time.perf_counter()
    float(np.asarray(fn(K)))
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(fn(2 * K)))
    t_2k = time.perf_counter() - t0
    dt = (t_2k - t_k) / K
    gb = R * C * 10 / 1e9
    print(f"{label:28s} {dt * 1e3:8.3f} ms  ({gb / dt:.0f} GB/s eff @10B/el)", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}  leaf=({R},{C})={R * C / 1e6:.0f}M el", flush=True)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((R, C)) * 1e-3, jnp.bfloat16)
    p = jnp.asarray(rng.standard_normal((R, C)) * 2e-2, jnp.bfloat16)
    st0 = (
        jnp.asarray(rng.integers(-127, 128, (R, C)), jnp.int8),
        jnp.asarray(rng.random((R, C // BLOCK)) * 1e-5 + 1e-9, jnp.float32),
        jnp.asarray(rng.integers(0, 256, (R, C)), jnp.uint8),
        jnp.asarray(rng.random((R, C // BLOCK)) * 1e-8 + 1e-12, jnp.float32),
    )
    svec = jnp.asarray([1.0, 0.9, 0.5, 2e-5], jnp.float32)

    res = {}
    for mode in ("floor", "linear_v", "recip", "full"):
        res[mode] = pair_time(
            lambda k, mode=mode: multi(g, p, st0, svec, mode, k), f"variant:{mode}"
        )
    res["prod"] = pair_time(
        lambda k: multi(g, p, st0, svec, "full", k, prod=True), "production kernel"
    )

    # row-tile sweep: 1536 grid steps at tr=32 may be step-overhead bound
    for tr in (64, 128, 256):
        pair_time(
            lambda k, tr=tr: multi_tr(g, p, st0, svec, k, tr), f"variant:full tr={tr}"
        )
        pair_time(
            lambda k, tr=tr: multi_tr(g, p, st0, svec, k, tr, mode="floor"),
            f"variant:floor tr={tr}",
        )

    # the XLA apply pass the kernel leaves outside (read p+upd, write p)
    upd0 = jnp.asarray(rng.standard_normal((R, C)) * 1e-9, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def apply_multi(p, upd, k):
        def body(p, _):
            return p + upd, p[0, 0].astype(jnp.float32)

        p, ys = jax.lax.scan(body, p, None, length=k)
        return ys[-1] + p[0, 1].astype(jnp.float32)

    res["apply"] = pair_time(lambda k: apply_multi(p, upd0, k), "XLA apply_updates pass")

    print(
        "\nattribution: full-floor (VPU compute) = "
        f"{(res['full'] - res['floor']) * 1e3:.2f} ms; "
        f"log-v transcendentals = {(res['full'] - res['linear_v']) * 1e3:.2f} ms; "
        f"reciprocal rewrite saves = {(res['full'] - res['recip']) * 1e3:.2f} ms; "
        f"apply pass (foldable) = {res['apply'] * 1e3:.2f} ms"
    )


if __name__ == "__main__":
    main()
