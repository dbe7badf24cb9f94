"""Decode-throughput measurement: tokens/sec for LLaMA-7B-shaped KV-cache
decoding (the second north-star metric in BASELINE.md). Not the driver
bench — run manually: python scripts/bench_decode.py [--layers 32 --batch 1].
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=64)
    args = p.parse_args()

    import dataclasses

    from gpt4roi_tpu.models.llama import (
        LlamaConfig,
        init_kv_cache,
        init_llama_params,
        llama_decode_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype)
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
    clen = jnp.int32(16)  # batch-uniform scalar -> fast DUS cache writes
    toks, cache = jitted(params, cache, tok, clen, args.steps)
    np.asarray(toks)  # warm/compile barrier

    t0 = time.perf_counter()
    toks, cache = jitted(params, cache, toks[-1], clen + args.steps, args.steps)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    tps = args.batch * args.steps / dt
    print(
        f"decode {args.layers}L d4096 batch={args.batch}: "
        f"{dt/args.steps*1e3:.2f} ms/tok -> {tps:.1f} tok/s"
    )


if __name__ == "__main__":
    main()
