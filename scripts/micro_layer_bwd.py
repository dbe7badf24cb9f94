"""Decompose the stage-2 per-layer train slope (63.35 ms/layer measured,
scripts/bench_train.py) into its components on the attached TPU.

Reference workload: stage-2 recipe (/root/reference/train_stage2.sh:38-57)
per-device shape b=2, s=2048, LLaMA-7B layers. The matmul floor at this
shape is ~28 ms/layer (4.98 TFLOP fwd+bwd at the 177 TF/s sustained bf16
rate) + 5.9 ms flash fwd+bwd; the measured slope is ~63 ms. This micro
times L=1 vs L=2 (slope isolates one layer, cancelling embed/head/norm
intercepts) for: grad-only vs grad+adamw8bit, dots vs none remat, flash vs
XLA attention, and a raw-matmul control.

Methodology per CLAUDE.md: iterations chained through a data dependency,
ONE host fetch at the end (block_until_ready does not block on the axon
tunnel).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gpt4roi_tpu.models.llama import (
    LlamaConfig,
    fuse_stacked_qkv,
    init_llama_params,
    llama_forward,
    to_stacked_params,
)

B, S = 2, 2048


def chain_time(fn, args, n=8, label=""):
    salt = jnp.zeros((), jnp.float32)
    out = fn(*args, salt)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = salt
    for _ in range(n):
        out = fn(*args, out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def tree_dot(tree):
    # consume every leaf so XLA cannot dead-code any of the backward; the
    # coefficient is never zero (an i%7-3 style coefficient is exactly 0
    # for every 7th leaf, letting XLA drop those contributions)
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(
        jnp.sum(l.astype(jnp.float32)) * ((i % 7) + 1)
        for i, l in enumerate(leaves)
        if hasattr(l, "astype")
    )


def make_step(cfg, remat, use_flash, with_opt, clip=False):
    import optax
    tx = None
    if with_opt:
        from gpt4roi_tpu.train.optim8bit import adamw_8bit
        # with_opt == "fused": round-4 fused-apply path (update emits the
        # new params in-kernel; no separate optax.apply_updates pass)
        tx = adamw_8bit(1e-5, emit_new_params=(with_opt == "fused"),
                        clip_global_norm=(1.0 if clip else None))

    def loss_fn(params, embeds, seg):
        _, xh, _ = llama_forward(
            params, cfg, inputs_embeds=embeds, segment_ids=seg,
            use_flash=use_flash, remat=remat, scan_layers=True,
        )
        return jnp.mean(xh.astype(jnp.float32) ** 2)

    if not with_opt:
        @jax.jit
        def step(params, embeds, seg, salt):
            embeds = embeds + (salt * 1e-30).astype(embeds.dtype)
            loss, grads = jax.value_and_grad(loss_fn)(params, embeds, seg)
            return loss + tree_dot(grads) * 1e-30

        return step, None

    @jax.jit
    def step(params, opt_state, embeds, seg, salt):
        embeds = embeds + (salt * 1e-30).astype(embeds.dtype)
        loss, grads = jax.value_and_grad(loss_fn)(params, embeds, seg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = updates if with_opt == "fused" else optax.apply_updates(params, updates)
        # consume the NEW opt_state too: the 8-bit re-quantize of both
        # moments writes only into opt_state, so without this XLA would
        # dead-code the quantize half of the round-trip and the
        # grad+adamw8bit slope would understate the optimizer cost
        return loss + tree_dot(params) * 1e-30 + tree_dot(opt_state) * 1e-30

    return step, tx


def build(cfg, fuse=False):
    key = jax.random.PRNGKey(0)
    params = init_llama_params(key, cfg, jnp.bfloat16)
    params = to_stacked_params(params)
    if fuse:
        params = fuse_stacked_qkv(params)
    # slope micro: drop embed/lm_head work from the measured region as much
    # as possible (they are intercept, identical across L — but smaller
    # trees also keep grad-consumption reductions cheap)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.02, jnp.bfloat16)
    seg = jnp.ones((B, S), jnp.int32)
    return params, embeds, seg


def slope(label, remat, use_flash, with_opt, fuse=False):
    import dataclasses
    dts = []
    for L in (1, 2):
        cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=L)
        params, embeds, seg = build(cfg, fuse=fuse)
        step, tx = make_step(cfg, remat, use_flash, with_opt)
        if with_opt:
            opt_state = tx.init(params)
            dts.append(chain_time(lambda p, o, e, s, z: step(p, o, e, s, z),
                                  (params, opt_state, embeds, seg), label=f"{label} L={L}"))
        else:
            dts.append(chain_time(step, (params, embeds, seg), label=f"{label} L={L}"))
    print(f"{label:44s} slope {1e3 * (dts[1] - dts[0]):8.2f} ms/layer", flush=True)


def slope_scan(label, with_opt, fuse=False, clip=False, k=4):
    """Liveness-correct optimizer slope: K steps threaded through ONE
    jitted lax.scan (params+opt_state as carry — the real train step's
    dataflow, bench_train.py::multi). The per-call variant above never
    donates opt_state, so XLA inserts defensive copies of all four moment
    buffers before each aliased Pallas update (~4 B/el extra traffic) that
    the production step does NOT pay; (t_2k - t_k)/k also cancels the RPC
    dispatch constant exactly."""
    import dataclasses

    import optax

    dts = []
    for L in (1, 2):
        cfg = dataclasses.replace(LlamaConfig.llama_7b(), num_layers=L)
        params, embeds, seg = build(cfg, fuse=fuse)
        _, tx = make_step(cfg, "dots", None, with_opt, clip=clip)

        def loss_fn(p, e):
            _, xh, _ = llama_forward(
                p, cfg, inputs_embeds=e, segment_ids=seg,
                use_flash=None, remat="dots", scan_layers=True,
            )
            return jnp.mean(xh.astype(jnp.float32) ** 2)

        if with_opt:
            def one(carry, _):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, embeds)
                updates, o = tx.update(grads, o, p)
                p = updates if with_opt == "fused" else optax.apply_updates(p, updates)
                return (p, o), loss

            carry0 = (params, tx.init(params))
        else:
            # grad-only baseline: iterations chained through a loss salt
            # (params untouched — no spurious param-write traffic)
            def one(salt, _):
                e = embeds + (salt * 1e-30).astype(embeds.dtype)
                loss, grads = jax.value_and_grad(loss_fn)(params, e)
                return loss + tree_dot(grads) * 1e-30, loss

            carry0 = jnp.zeros((), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("n",))
        def jmulti(carry, n):
            carry, losses = jax.lax.scan(one, carry, None, length=n)
            return losses[-1] + tree_dot(carry) * 1e-30

        def run(n):
            t0 = time.perf_counter()
            out = jmulti(carry0, n)
            float(np.asarray(out))
            return time.perf_counter() - t0

        run(k)
        run(2 * k)  # compile+warm both programs
        t_k = run(k)
        t_2k = run(2 * k)
        dt = (t_2k - t_k) / k
        print(f"{label} L={L}: {dt * 1e3:8.2f} ms/step", flush=True)
        dts.append(dt)
    print(f"{label:44s} slope {1e3 * (dts[1] - dts[0]):8.2f} ms/layer", flush=True)


def matmul_floor():
    # the layer's exact weight-matmul set, fwd+bwd, no attention/norms
    d, ff = 4096, 11008
    key = jax.random.PRNGKey(1)
    ws = {
        "qkv": jax.random.normal(key, (d, 3 * d), jnp.bfloat16) * 0.02,
        "o": jax.random.normal(key, (d, d), jnp.bfloat16) * 0.02,
        "gu": jax.random.normal(key, (d, 2 * ff), jnp.bfloat16) * 0.02,
        "down": jax.random.normal(key, (ff, d), jnp.bfloat16) * 0.02,
    }
    x = jax.random.normal(key, (B * S, d), jnp.bfloat16)

    def f(ws, x):
        y = x @ ws["qkv"]
        y = y[:, :d] + y[:, d:2 * d] + y[:, 2 * d:]
        y = y @ ws["o"]
        z = (x + y) @ ws["gu"]
        z = z[:, :ff] * jax.nn.silu(z[:, ff:])
        return jnp.mean((z @ ws["down"]).astype(jnp.float32) ** 2)

    @jax.jit
    def step(ws, x, salt):
        x = x + (salt * 1e-30).astype(x.dtype)
        loss, grads = jax.value_and_grad(f)(ws, x)
        return loss + tree_dot(grads) * 1e-30

    chain_time(step, (ws, x), label="matmul-only fwd+bwd (floor)")


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    matmul_floor()
    slope("grad-only dots flash", "dots", None, False)
    slope("grad-only none flash", None, None, False)
    slope("grad+adamw8bit dots flash", "dots", None, True)
    slope("grad-only dots XLA-attn", "dots", False, False)
    slope("grad-only dots flash FUSED-QKV", "dots", None, False, fuse=True)
    slope("grad+adamw8bit dots FUSED-QKV", "dots", None, True, fuse=True)
    slope("grad+adamw8bit FUSED-APPLY dots flash", "dots", None, "fused")
    # liveness-correct (scan-threaded) optimizer costs — the production
    # step's real dataflow; per-call jits above overstate the optimizer by
    # the defensive moment-buffer copies XLA inserts without donation
    slope_scan("SCAN grad-only FUSED-QKV", False, fuse=True)
    slope_scan("SCAN grad+opt FUSED-QKV", "fused", fuse=True)
    slope_scan("SCAN grad+opt+clip FUSED-QKV", "fused", fuse=True, clip=True)


if __name__ == "__main__":
    main()
