"""Speculative-decode economics at 7B W8A8 serving scale.

Measures on the attached TPU:
  1. t_verify(T) — ms per speculative step at window T (T=1 equals the
     vanilla decode step). Decode is weight-bandwidth-bound, so the extra
     window rows should be nearly free; this quantifies "nearly".
  2. floor — e2e ms per EMITTED token with random weights (acceptance ~ 0:
     every step emits exactly 1 token). This is the worst case and bounds
     the overhead of speculating when drafts never hit.
  3. ceiling — e2e ms per emitted token with an ORACLE-repetitive
     trajectory (ids seeded so the PLD drafter always finds the right
     continuation: greedy decode of a tiny-vocab random model cycles, so
     acceptance saturates). This is the all-accepted bound.

True serving throughput sits between floor and ceiling at the workload's
acceptance rate a (expected emitted/step E = 1 + sum_i prod_{j<=i} a_j):
  ms/tok(E) = t_verify(T) / E
The table prints ms/tok for E in {1, 1.5, 2, 2.5, 3, T} from the measured
t_verify. Region-caption outputs (box coords, category names, prompt
phrases) are PLD-friendly; published prompt-lookup acceptance on
summarization-like tasks gives E ~ 2-3 at T=4. Real-weight acceptance
stays a weight-holder measurement (scripts/check_real_weight_parity.py
gate) — the mechanism and its cost model are what is measured here.

Methodology per CLAUDE.md: chunks of --steps spec steps inside one jitted
scan; host fetch as barrier; (n, 2n) two-chunk-size estimator cancels the
~2 s RPC dispatch overhead. Reference being exceeded: strictly one token
per forward (llava/serve/model_worker.py:182-260).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--windows", default="1,4,8")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    os.environ.setdefault("GPT4ROI_QMM", "w8a8")
    from gpt4roi_tpu.serve.speculative import spec_decode_chunk
    from scripts.bench_serve_decode import build_stacked_params_q

    cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=args.layers)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # one jitted build = one RPC dispatch (see bench_serve_decode.py)
    params = jax.jit(
        lambda k: build_stacked_params_q(k, cfg, dtype)
    )(jax.random.PRNGKey(0))
    L, b, s = cfg.num_layers, args.batch, args.seq

    out = {"batch": b, "layers": L}
    results = {}
    for window in (int(w) for w in args.windows.split(",")):
        shape = (L, b, s, cfg.kv_heads, cfg.head_dim)
        ck = jnp.zeros(shape, dtype)
        cv = jnp.zeros(shape, dtype)
        rng = np.random.default_rng(0)
        prompt = 64
        buf = jnp.zeros((b, s), jnp.int32).at[:, :prompt].set(
            jnp.asarray(rng.integers(1, 31000, (b, prompt)).astype(np.int32))
        )
        cur = jnp.full((b,), prompt, jnp.int32)

        def chunk(params, ck, cv, buf, cur, n):
            return spec_decode_chunk(params, cfg, ck, cv, buf, cur, n, window)

        jitted = jax.jit(chunk, static_argnames=("n",), donate_argnums=(1, 2))

        def run(n, ck, cv, buf, cur):
            t0 = time.perf_counter()
            buf2, cur2, ck, cv, emitted = jitted(params, ck, cv, buf, cur, n)
            em = np.asarray(emitted)  # host fetch = true barrier
            return time.perf_counter() - t0, ck, cv, buf2, cur2, em

        n = args.steps
        _, ck, cv, buf, cur = run(n, ck, cv, buf, cur)[0:5]
        _, ck, cv, buf, cur = run(2 * n, ck, cv, buf, cur)[0:5]
        t_n, ck, cv, buf, cur, _ = run(n, ck, cv, buf, cur)
        t_2n, ck, cv, buf, cur, em = run(2 * n, ck, cv, buf, cur)
        step_ms = (t_2n - t_n) / n * 1e3
        results[window] = step_ms
        row = {"verify_step_ms": round(step_ms, 3)}
        if window > 1:
            for e in (1.0, 1.5, 2.0, 2.5, 3.0, float(window)):
                if e <= window:
                    row[f"ms_per_tok_E{e:g}"] = round(step_ms / e, 3)
        out[f"window{window}"] = row
        print(f"window={window}: {step_ms:.3f} ms/step "
              f"(emitted last chunk: {em.tolist()})", file=sys.stderr, flush=True)

    if 1 in results:
        base = results[1]
        for w, ms in results.items():
            if w > 1:
                out[f"window{w}"]["overhead_vs_plain_pct"] = round(
                    (ms / base - 1.0) * 100, 1
                )
                out[f"window{w}"]["breakeven_E"] = round(ms / base, 3)
    if args.json:
        print(json.dumps(out))
    else:
        print(out)


if __name__ == "__main__":
    main()
