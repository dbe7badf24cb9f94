"""Int8 weight-only decode throughput at 7B scale + TPU kernel parity.

Run manually: python scripts/bench_decode_int8.py [--layers 32 --batch 1]
Compares ms/tok against the bf16 path measured by scripts/bench_decode.py
(~19 ms/tok at 7B on one v5e). Roofline: 7 GB int8 weights / 819 GB/s
= ~8.6 ms/tok.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_decode_step,
)
from gpt4roi_tpu.ops.quant import QuantDense, quant_matmul, quantize_weight


def init_llama_params_q(key, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Quantized-layout params with random int8 weights (throughput only)."""
    d, m, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kvd = cfg.kv_heads * cfg.head_dim
    keys = jax.random.split(key, 2 + cfg.num_layers)

    def qdense(k, i, o):
        op = -(-o // 256) * 256
        q = jax.random.randint(k, (i, op), -127, 128, dtype=jnp.int8)
        scale = jnp.full((op,), (i**-0.5) / 127.0, jnp.float32)
        if op != o:
            scale = scale.at[o:].set(0.0)
        return QuantDense(q, scale.reshape(1, -1), o)

    fuse = os.environ.get("GPT4ROI_QMM_FUSE", "1") == "1"
    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(keys[2 + li], 7)
        lp = {
            "attn_norm": {"scale": jnp.ones((d,), dtype)},
            "o": qdense(ks[3], d, d),
            "mlp_norm": {"scale": jnp.ones((d,), dtype)},
            "down": qdense(ks[6], m, d),
        }
        if fuse:
            lp["qkv"] = qdense(ks[0], d, d + 2 * kvd)
            lp["gate_up"] = qdense(ks[4], d, 2 * m)
        else:
            lp.update(
                q=qdense(ks[0], d, d), k=qdense(ks[1], d, kvd),
                v=qdense(ks[2], d, kvd),
                gate=qdense(ks[4], d, m), up=qdense(ks[5], d, m),
            )
        layers.append(lp)
    return {
        "embed": {"embedding": jax.random.normal(keys[0], (v, d), dtype) * 0.02},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": qdense(keys[1], d, v),
    }


def kernel_parity():
    """Pallas quant matmul vs XLA dequant on TPU at production shape."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4096, 11008), dtype=np.float32) * 0.02)
    qp = quantize_weight(w)
    x = jnp.asarray(rng.standard_normal((8, 4096), dtype=np.float32), jnp.bfloat16)
    got = np.asarray(quant_matmul(x, qp)).astype(np.float32)  # pallas on TPU
    deq = np.asarray(qp.dense_q, np.float32) * np.asarray(qp.scale)
    want = np.asarray(x, np.float32) @ deq[:, :11008]
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"kernel parity rel err: {rel:.2e}")
    # w8a8 adds per-token int8 activation error on top of the weight error
    tol = 3e-2 if os.environ.get("GPT4ROI_QMM") == "w8a8" else 1e-2
    assert rel < tol, rel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=64)
    args = p.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        kernel_parity()
    cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers)
    params = init_llama_params_q(jax.random.PRNGKey(0), cfg, dtype)
    cache = init_kv_cache(cfg, args.batch, args.seq, dtype)

    def chunk(params, cache, tok, clen, n):
        def body(carry, _):
            tok, cache, clen = carry
            emb = params["embed"]["embedding"][tok][:, None, :]
            logits, cache = llama_decode_step(params, cfg, cache, emb, clen)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, cache, clen + 1), nxt

        (tok, cache, clen), toks = jax.lax.scan(body, (tok, cache, clen), None, length=n)
        return toks, cache

    jitted = jax.jit(chunk, static_argnames=("n",), donate_argnums=(1,))
    tok = jnp.zeros((args.batch,), jnp.int32)
    clen = jnp.int32(16)
    toks, cache = jitted(params, cache, tok, clen, args.steps)
    np.asarray(toks)

    t0 = time.perf_counter()
    toks, cache = jitted(params, cache, toks[-1], clen + args.steps, args.steps)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    tps = args.batch * args.steps / dt
    print(
        f"int8 decode {args.layers}L d4096 batch={args.batch}: "
        f"{dt/args.steps*1e3:.2f} ms/tok -> {tps:.1f} tok/s"
    )


if __name__ == "__main__":
    main()
