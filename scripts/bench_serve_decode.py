"""Serving decode throughput at 7B scale: int8 W8A8 fused weights,
lax.scan over layers (fast compile), batch-8 ragged-serving shape.

Emits one JSON line when --json is passed:
  {"step_ms": ..., "single_ms_per_tok": ..., "batch": B,
   "tokens_per_sec": ...}

Methodology (CLAUDE.md gotchas): one jitted chunk of --steps decode
steps chained by data dependency; host fetch as the barrier; per-dispatch
RPC overhead (~2 s on the axon tunnel) subtracted via the two-chunk-size
difference estimator: run chunks of n and 2n steps, step_ms =
(t_2n - t_n) / n — dispatch and fetch costs cancel exactly.

Decode is weight-bandwidth-bound, so step time is ~independent of batch
(measured round 1: batch 8 costs the same as batch 1). We therefore
report single-stream ms/tok = step_ms (upper bound for batch 1) and
serving throughput = batch / step_ms.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.models.llama import LlamaConfig


def build_stacked_params_q(key, cfg, dtype=jnp.bfloat16):
    """Random stacked int8 fused-layout params (throughput only)."""
    from gpt4roi_tpu.ops.quant import QuantDense

    d, m, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kvd = cfg.kv_heads * cfg.head_dim
    L = cfg.num_layers

    def qdense(k, i, o):
        op = -(-o // 256) * 256
        q = jax.random.randint(k, (L, i, op), -127, 128, jnp.int8)
        scale = jnp.full((L, 1, op), (i ** -0.5) / 127.0, jnp.float32)
        return QuantDense(q, scale, o)

    ks = jax.random.split(key, 8)
    layers_stacked = {
        "attn_norm": {"scale": jnp.ones((L, d), dtype)},
        "qkv": qdense(ks[0], d, d + 2 * kvd),
        "o": qdense(ks[1], d, d),
        "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
        "gate_up": qdense(ks[2], d, 2 * m),
        "down": qdense(ks[3], m, d),
    }

    def lm_head(k):
        op = -(-v // 256) * 256
        return QuantDense(
            jax.random.randint(k, (d, op), -127, 128, jnp.int8),
            jnp.full((1, op), (d ** -0.5) / 127.0, jnp.float32), v,
        )

    return {
        "embed": {"embedding": jax.random.normal(ks[4], (v, d), dtype) * 0.02},
        "layers_stacked": layers_stacked,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": lm_head(ks[5]),
    }


def measure_batch(params, cfg, b: int, seq: int, steps: int, dtype):
    from gpt4roi_tpu.models.llama import llama_decode_step_stacked

    L = cfg.num_layers
    shape = (L, b, seq, cfg.kv_heads, cfg.head_dim)
    ck = jnp.zeros(shape, dtype)
    cv = jnp.zeros(shape, dtype)

    def chunk(params, ck, cv, tok, clen, n):
        def body(carry, _):
            tok, ck, cv, clen = carry
            emb = params["embed"]["embedding"][tok][:, None, :]
            logits, ck, cv = llama_decode_step_stacked(params, cfg, ck, cv, emb, clen)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, ck, cv, clen + 1), ()

        (tok, ck, cv, clen), _ = jax.lax.scan(body, (tok, ck, cv, clen), None, length=n)
        return tok, ck, cv

    jitted = jax.jit(chunk, static_argnames=("n",), donate_argnums=(1, 2))
    tok = jnp.zeros((b,), jnp.int32)

    def run(n, ck, cv):
        t0 = time.perf_counter()
        tok2, ck, cv = jitted(params, ck, cv, tok, jnp.int32(16), n)
        np.asarray(tok2)  # host fetch = true barrier on the RPC tunnel
        return time.perf_counter() - t0, ck, cv

    n = steps
    _, ck, cv = run(n, ck, cv)  # compile+warm n
    _, ck, cv = run(2 * n, ck, cv)  # compile+warm 2n
    t_n, ck, cv = run(n, ck, cv)
    t_2n, ck, cv = run(2 * n, ck, cv)
    step_ms = (t_2n - t_n) / n * 1e3  # dispatch/fetch overhead cancels
    return {
        "step_ms": round(step_ms, 3),
        "single_ms_per_tok": round(step_ms, 3),
        "batch": b,
        "tokens_per_sec": round(b / step_ms * 1e3, 1),
        "raw_t_n_ms_per_tok": round(t_n / n * 1e3, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument(
        "--batches", type=str, default="",
        help="comma list; measure several batch sizes in ONE process "
        "(one TPU client + one cache load instead of one per phase); "
        "emits {'b<N>': {...}} keyed per batch",
    )
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    os.environ.setdefault("GPT4ROI_QMM", "w8a8")

    cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # one jitted build = one RPC dispatch (eager init is ~20 device ops
    # at ~2 s dispatch each on this tunnel — bench_train.py pathology)
    params = jax.jit(
        lambda k: build_stacked_params_q(k, cfg, dtype)
    )(jax.random.PRNGKey(0))

    batches = (
        [int(x) for x in args.batches.split(",") if x] if args.batches
        else [args.batch]
    )
    results = {
        f"b{b}": measure_batch(params, cfg, b, args.seq, args.steps, dtype)
        for b in batches
    }
    if args.json:
        out = results if args.batches else results[f"b{batches[0]}"]
        print(json.dumps(out))
    else:
        for key, r in results.items():
            print(
                f"int8 stacked decode {args.layers}L {key}: {r['step_ms']:.2f} "
                f"ms/step -> {r['tokens_per_sec']} tok/s (raw incl. dispatch: "
                f"{r['raw_t_n_ms_per_tok']} ms/tok)"
            )


if __name__ == "__main__":
    main()
