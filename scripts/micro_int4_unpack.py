"""Int4 weight-streaming feasibility measurement (VERDICT r2 item 4).

XLA's int4 dot_general RecursionErrors on this backend (documented dead
end), so the only int4 route is packed-int8 storage + in-kernel unpack.
This measures whether that can beat the W8A8 decode path:

  roofline: int4 halves weight HBM bytes (9.1 -> ~4.6 ms/tok at 7B), BUT
  every weight element must pass through the VPU to unpack (2 nibbles/
  byte -> shifts + interleave). The VPU is the known sub-32-bit wall on
  v5e (int8 processing bounded at ~275 GB/s regardless of HBM headroom —
  see ops/quant.py::quant_matmul notes), so the question is the measured
  unpack rate vs the ~725 GB/s the int8 MXU path already streams at.

Kernels measured at the 7B decode shape (M=8, 4096x4096 per-matrix):
  1. w8a8 XLA int8 x int8 dot (current production path) — control.
  2. Pallas w4a8: packed (IN, OUT/2) int8 -> unpack to (IN, OUT) int8 in
     VMEM -> int8 MXU dot.
  3. Pallas pure-unpack probe (no matmul): upper bound on unpack rate.

One decode step = ~56 such matrices (7 proj x 32 layers / grouping); the
verdict number printed at the end scales the per-matrix delta to ms/tok.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu


def _unpack_halves(w_pk: jax.Array):
    """(IN, OB2) packed int8 -> two (IN, OB2) int8 halves; byte j holds
    output column j (low nibble) and j + OUT/2 (high nibble), both stored
    offset-8 unsigned. BLOCK layout, not interleaved: Mosaic cannot lower a
    stride-2 lane interleave ((IN, OB2, 2) -> (IN, OB)) — 'unsupported
    shape cast' — but disjoint column blocks need no reshape at all."""
    w32 = w_pk.astype(jnp.int32)
    lo = (w32 & 0xF) - 8
    hi = ((jax.lax.shift_right_arithmetic(w32, jnp.int32(4))) & 0xF) - 8
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _w4a8_kernel(x_ref, q_ref, s_ref, o_ref):
    lo, hi = _unpack_halves(q_ref[...])  # 2x (IN, OB/2) int8 in VMEM
    half = q_ref.shape[1]
    dn = (((1,), (0,)), ((), ()))
    acc_lo = jax.lax.dot_general(x_ref[...], lo, dn, preferred_element_type=jnp.int32)
    acc_hi = jax.lax.dot_general(x_ref[...], hi, dn, preferred_element_type=jnp.int32)
    o_ref[:, :half] = acc_lo.astype(jnp.float32) * s_ref[:, :half]
    o_ref[:, half:] = acc_hi.astype(jnp.float32) * s_ref[:, half:]


def _unpack_only_kernel(q_ref, o_ref):
    lo, hi = _unpack_halves(q_ref[...])
    # tiny reduction so the unpack cannot be elided
    s = jnp.sum(lo.astype(jnp.int32), axis=0, keepdims=True) + jnp.sum(
        hi.astype(jnp.int32), axis=0, keepdims=True
    )
    o_ref[...] = s[:, :128]


def pack_int4(w: np.ndarray):
    """Quantize (in, out) f32 -> per-out-channel int4, packed 2 cols/byte
    in block layout: byte j = col j (low nibble) | col j+out/2 (high),
    both offset-8."""
    amax = np.abs(w).max(axis=0)
    scale = np.where(amax > 0, amax / 7.0, 1.0)
    q = np.clip(np.round(w / scale), -8, 7).astype(np.int32)
    half = q.shape[1] // 2
    lo = (q[:, :half] + 8) & 0xF
    hi = (q[:, half:] + 8) & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8).view(np.int8)
    return packed, scale.astype(np.float32)


def time_fn(fn, n=200):
    out = fn()
    np.asarray(out)  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))

    IN = OUT = 4096
    M = 8
    rng = np.random.default_rng(0)
    w = rng.standard_normal((IN, OUT), np.float32) * 0.02
    xq = jnp.asarray(rng.integers(-127, 127, (M, IN)), jnp.int8)
    packed, scale = pack_int4(w)
    packed = jnp.asarray(packed)
    scale2d = jnp.asarray(scale)[None, :]
    q8 = jnp.asarray(np.clip(np.round(w / (np.abs(w).max(0) / 127.0)), -127, 127), jnp.int8)

    # CHAIN = sequential matmuls inside one jit (pipelined decode analog);
    # weights differ per step so HBM streaming is real, not cached
    CHAIN = 28
    packs = jnp.asarray(np.stack([np.asarray(packed)] * CHAIN))
    q8s = jnp.asarray(np.stack([np.asarray(q8)] * CHAIN))

    @jax.jit
    def chain_w8a8(xq, q8s):
        def body(x, q):
            acc = jax.lax.dot_general(
                x, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            # feed forward to serialize (requantize-ish cast)
            return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8), acc[0, :8]
        x, outs = jax.lax.scan(body, xq, q8s)
        return outs

    w4a8 = pl.pallas_call(
        _w4a8_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, IN), lambda i: (0, 0)),
            pl.BlockSpec((IN, OUT // 2), lambda i: (0, 0)),
            pl.BlockSpec((1, OUT), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, OUT), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, OUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )

    @jax.jit
    def chain_w4a8(xq, packs, scale2d):
        def body(x, q):
            y = w4a8(x, q, scale2d)
            return jnp.clip(y.astype(jnp.int32) >> 8, -127, 127).astype(jnp.int8), y[0, :8]
        x, outs = jax.lax.scan(body, xq, packs)
        return outs

    unpack_only = pl.pallas_call(
        _unpack_only_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((IN, OUT // 2), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )

    @jax.jit
    def chain_unpack(packs):
        def body(c, q):
            return c + unpack_only(q).sum(), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), packs)
        return c

    # parity first (single call, interpretable shapes)
    y4 = np.asarray(w4a8(xq, packed, scale2d))
    xf = np.asarray(xq, np.float32)
    want = xf @ (np.round(np.clip(w / scale, -8, 7)) * scale)
    rel = np.abs(y4 - want).max() / (np.abs(want).max() + 1e-9)
    print(f"w4a8 parity vs int4-quantized oracle: rel={rel:.2e}")
    assert rel < 1e-4, rel

    t8 = time_fn(lambda: chain_w8a8(xq, q8s), n=50) / CHAIN
    t4 = time_fn(lambda: chain_w4a8(xq, packs, scale2d), n=50) / CHAIN
    tu = time_fn(lambda: chain_unpack(packs), n=50) / CHAIN

    bytes8 = IN * OUT
    bytes4 = IN * OUT // 2
    print(f"w8a8 XLA      : {t8*1e6:7.1f} us/matrix  ({bytes8/t8/1e9:6.1f} GB/s int8 weights)")
    print(f"w4a8 Pallas   : {t4*1e6:7.1f} us/matrix  ({bytes4/t4/1e9:6.1f} GB/s packed, "
          f"{IN*OUT/t4/1e9:6.1f} Gel/s unpacked)")
    print(f"unpack probe  : {tu*1e6:7.1f} us/matrix  ({IN*OUT/tu/1e9:6.1f} Gel/s)")
    n_mats = 7 * 32 * (IN * OUT)  # ~6.7e9 weights/tok at 7B
    print(f"7B ms/tok projection: w8a8 {t8 * n_mats / (IN*OUT) * 1e3:.1f}  "
          f"w4a8 {t4 * n_mats / (IN*OUT) * 1e3:.1f}")


if __name__ == "__main__":
    main()
