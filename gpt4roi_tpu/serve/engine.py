"""Inference engine: jitted SPI prefill + KV-cache decode.

Replaces the reference's ``model.generate`` serving path (reference:
gpt4roi/app.py:285-300 over HF generate + prepare_inputs_for_generation,
llava/model/llava.py:263-283). Region/image features enter only at prefill;
decode steps are pure LLaMA + KV cache (reference guard:
gpt4roi/models/spi_llava.py:47-48).

TPU-first: one compiled prefill (padded to a static bucket) and one compiled
decode step reused for every token; sampling (greedy or temperature) happens
on device; the stop-string check ('###', KeywordsStoppingCriteria in
llava/model/utils.py:26-46) runs on host over decoded text.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt4roi_tpu.models.gpt4roi import (
    Gpt4RoiConfig,
    build_input_embeds,
    encode_vision,
    masked_scatter_embeds,
)
from gpt4roi_tpu.models.llama import (
    KVCache,
    init_kv_cache,
    init_stacked_cache,
    llama_decode_step,
    llama_decode_step_stacked,
    llama_extend,
    llama_extend_stacked,
    llama_forward,
    to_stacked_params,
    write_prefill_kv,
    write_prefill_kv_stacked,
)


@dataclasses.dataclass
class EngineConfig:
    max_seq_len: int = 2048
    prefill_bucket: int = 1024
    max_regions: int = 32
    temperature: float = 0.2
    compute_dtype: Any = jnp.float32
    # None | 'int8': weight-only int8 decoder with W8A8 int8-MXU matmuls
    # (ops/quant.py) — ~1.6x decode speedup at 7B on one v5e, int8-class
    # numerics (beyond-reference capability; the reference serves fp16)
    quantize: Optional[str] = None
    # Optional (data, model) jax.sharding.Mesh: Megatron-style tensor-
    # parallel serving (column/row param shardings, KV heads sharded over
    # the model axis; XLA SPMD inserts the collectives). The reference has
    # no tensor parallelism at all.
    mesh: Any = None
    # >1 enables prompt-lookup speculative decoding for greedy
    # (temperature == 0) LLaMA requests: each weight pass verifies a
    # window of `speculative_window` tokens drafted on-device from the
    # sequence's own n-gram history (serve/speculative.py). Output is
    # bit-identical to vanilla greedy decode (tests/test_speculative.py);
    # throughput gain scales with draft acceptance. The reference emits
    # strictly one token per forward (llava/serve/model_worker.py:182-260).
    speculative_window: int = 0


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class Engine:
    def __init__(self, params, cfg: Gpt4RoiConfig, ecfg: Optional[EngineConfig] = None):
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg or EngineConfig()
        if self.ecfg.quantize == "int8":
            assert cfg.decoder_type == "llama", "int8 serving is LLaMA-only"
            from gpt4roi_tpu.ops.quant import quantize_llama_params

            # mode rides on the QuantDense aux (no process-global state)
            self.params = dict(params)
            self.params["llama"] = quantize_llama_params(params["llama"], mode="w8a8")
            # the vision encode side gets the int8 fuse-conv fast path too
            # (models/spi.py; 1892 vs 1603 regions/s on one v5e)
            self.cfg = cfg = dataclasses.replace(
                cfg, spi=dataclasses.replace(cfg.spi, fuse_int8=True)
            )

        cfg_ = self.cfg
        dtype = self.ecfg.compute_dtype
        is_mpt = cfg_.decoder_type == "mpt"
        dec_key = "mpt" if is_mpt else "llama"
        # Serving uses the stacked-layer layout for BOTH decoders:
        # scan-over-layers prefill/decode compiles in seconds instead of
        # minutes at 7B, with identical numerics
        # (models/llama.py::llama_decode_step_stacked,
        # models/mpt.py::mpt_decode_step_stacked)
        self._stacked = True
        self.params = dict(self.params)
        self.params[dec_key] = to_stacked_params(self.params[dec_key])
        stacked = self._stacked

        self._kv_spec = None
        if self.ecfg.mesh is not None:
            assert not is_mpt, "TP serving is LLaMA-only"
            from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

            from gpt4roi_tpu.core.mesh import MODEL_AXIS, tree_tp_shardings

            mesh = self.ecfg.mesh
            lp_sh = tree_tp_shardings(self.params["llama"], mesh, min_size=1)
            repl = _NS(mesh, _P())
            placed = {}
            for k, v in self.params.items():
                if k == "llama":
                    placed[k] = jax.tree_util.tree_map(jax.device_put, v, lp_sh)
                else:
                    placed[k] = jax.tree_util.tree_map(
                        lambda a: jax.device_put(a, repl), v
                    )
            self.params = placed
            nkv = cfg_.llama.kv_heads
            kv_axis = MODEL_AXIS if nkv % mesh.shape[MODEL_AXIS] == 0 else None
            # stacked cache (L, B, S, N, D): shard the head axis with the
            # column-parallel k/v outputs
            self._kv_spec = _NS(mesh, _P(None, None, None, kv_axis, None))

        @functools.partial(jax.jit, static_argnames=("prefill_len", "kv_rows"))
        def prefill_fn(params, input_ids, attention_mask, images, boxes, box_mask,
                       prefill_len, kv_rows=None, logits_at=None):
            embeds = build_input_embeds(
                params, cfg_, input_ids, images, boxes, box_mask, dtype
            )
            if is_mpt:
                from gpt4roi_tpu.models.mpt import mpt_forward

                logits, _, kv = mpt_forward(
                    params["mpt"], cfg_.mpt, inputs_embeds=embeds,
                    attention_mask=attention_mask, return_kv=True,
                    scan_layers=stacked, kv_pad_to=kv_rows if stacked else None,
                    logits_at=logits_at,
                )
            else:
                logits, _, kv = llama_forward(
                    params["llama"],
                    cfg_.llama,
                    inputs_embeds=embeds,
                    attention_mask=attention_mask,
                    return_kv=True,
                    scan_layers=stacked,
                    kv_pad_to=kv_rows if stacked else None,
                    logits_at=logits_at,
                )
            return logits, kv

        def one_step(params, cache, token_ids, cache_len, temperature, key):
            emb = params[dec_key]["embed"]["embedding"][token_ids][:, None, :].astype(dtype)
            if is_mpt and stacked:
                from gpt4roi_tpu.models.mpt import mpt_decode_step_stacked

                ck, cv = cache
                logits, ck, cv = mpt_decode_step_stacked(
                    params["mpt"], cfg_.mpt, ck, cv, emb, cache_len
                )
                cache = (ck, cv)
            elif is_mpt:
                from gpt4roi_tpu.models.mpt import mpt_decode_step

                logits, cache = mpt_decode_step(params["mpt"], cfg_.mpt, cache, emb, cache_len)
            elif stacked:
                ck, cv = cache
                logits, ck, cv = llama_decode_step_stacked(
                    params["llama"], cfg_.llama, ck, cv, emb, cache_len
                )
                cache = (ck, cv)
            else:
                logits, cache = llama_decode_step(params["llama"], cfg_.llama, cache, emb, cache_len)
            greedy = jnp.argmax(logits, axis=-1)
            scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
            sampled = jax.random.categorical(key, scaled, axis=-1)
            next_tok = jnp.where(temperature > 0.0, sampled, greedy)
            return next_tok.astype(jnp.int32), cache

        @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(1,))
        def decode_chunk_fn(params, cache, token_ids, cache_len, temperature, key, n_steps):
            """Decode ``n_steps`` tokens in ONE dispatch via lax.scan —
            per-token host round-trips dominate on RPC-tunnelled backends,
            so stop-sequence checks happen per chunk on the host instead."""

            def body(carry, step_key):
                tok, cache, clen = carry
                nxt, cache = one_step(params, cache, tok, clen, temperature, step_key)
                return (nxt, cache, clen + 1), nxt

            keys = jax.random.split(key, n_steps)
            (tok, cache, clen), toks = jax.lax.scan(body, (token_ids, cache, cache_len), keys)
            return toks.T, cache  # (B, n_steps)

        @functools.partial(
            jax.jit, static_argnames=("n_steps", "window"), donate_argnums=(1, 2)
        )
        def spec_chunk_fn(params, cache, ids_buf, cur, n_steps, window):
            """Greedy speculative chunk: n_steps verify passes, each
            emitting 1..window tokens (serve/speculative.py). LLaMA
            stacked-layout only; cache and ids buffers donated."""
            from gpt4roi_tpu.serve.speculative import spec_decode_chunk

            ck, cv = cache
            ids_buf, cur, ck, cv, emitted = spec_decode_chunk(
                params["llama"], cfg_.llama, ck, cv, ids_buf, cur, n_steps, window
            )
            return ids_buf, cur, (ck, cv), emitted

        @functools.partial(jax.jit, static_argnames=("prefill_len", "kv_rows"))
        def prefill_ragged_fn(params, input_ids, pad_len, images, boxes, box_mask,
                              prefill_len, kv_rows=None, logits_at=None):
            """Left-padded ragged prefill: content right-aligned so every
            sequence ends at the same buffer position; RoPE positions and
            the segment mask are derived from per-sample pad lengths."""
            b, s = input_ids.shape
            ar = jnp.arange(s)[None, :]
            seg = (ar >= pad_len[:, None]).astype(jnp.int32)  # 0 = pad
            pos = jnp.clip(ar - pad_len[:, None], 0, None)
            embeds = build_input_embeds(params, cfg_, input_ids, images, boxes, box_mask, dtype)
            if is_mpt:
                # ALiBi is translation-invariant, so left-padding needs no
                # position override — only the pad pair-mask
                from gpt4roi_tpu.models.mpt import mpt_forward

                logits, _, kv = mpt_forward(
                    params["mpt"], cfg_.mpt, inputs_embeds=embeds,
                    attention_mask=seg.astype(jnp.float32), return_kv=True,
                )
            else:
                logits, _, kv = llama_forward(
                    params["llama"], cfg_.llama, inputs_embeds=embeds,
                    positions=pos, segment_ids=seg, return_kv=True,
                    scan_layers=stacked,
                    kv_pad_to=kv_rows if stacked else None,
                    logits_at=logits_at,
                )
            return logits, kv

        @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(1,))
        def decode_chunk_ragged_fn(
            params, cache, token_ids, buf_pos, content_pos, key_mask, temperature, key, n_steps
        ):
            def body(carry, step_key):
                tok, cache, bp, cp = carry
                emb = params[dec_key]["embed"]["embedding"][tok][:, None, :].astype(dtype)
                if is_mpt and stacked:
                    # ALiBi over buffer positions is left-pad-correct
                    # (translation-invariant relative form) — no content-
                    # position override needed, only the pad key_mask
                    from gpt4roi_tpu.models.mpt import mpt_decode_step_stacked

                    ck, cv = cache
                    logits, ck, cv = mpt_decode_step_stacked(
                        params["mpt"], cfg_.mpt, ck, cv, emb, bp, key_mask=key_mask
                    )
                    cache = (ck, cv)
                elif is_mpt:
                    from gpt4roi_tpu.models.mpt import mpt_decode_step

                    logits, cache = mpt_decode_step(
                        params["mpt"], cfg_.mpt, cache, emb, bp, key_mask=key_mask
                    )
                elif stacked:
                    ck, cv = cache
                    logits, ck, cv = llama_decode_step_stacked(
                        params["llama"], cfg_.llama, ck, cv, emb, bp,
                        positions=cp, key_mask=key_mask,
                    )
                    cache = (ck, cv)
                else:
                    logits, cache = llama_decode_step(
                        params["llama"], cfg_.llama, cache, emb, bp,
                        positions=cp, key_mask=key_mask,
                    )
                greedy = jnp.argmax(logits, axis=-1)
                # temperature may be a scalar (whole batch) or per-slot (B,)
                # — continuous batching mixes requests with different temps
                t = jnp.reshape(jnp.maximum(temperature, 1e-6), (-1, 1))
                sampled = jax.random.categorical(
                    step_key, logits.astype(jnp.float32) / t, axis=-1
                )
                nxt = jnp.where(
                    jnp.reshape(temperature, (-1,)) > 0.0, sampled, greedy
                ).astype(jnp.int32)
                return (nxt, cache, bp + 1, cp + 1), nxt

            keys = jax.random.split(key, n_steps)
            (tok, cache, bp, cp), toks = jax.lax.scan(
                body, (token_ids, cache, buf_pos, content_pos), keys
            )
            return toks.T, cache

        @jax.jit
        def encode_vision_fn(params, images, boxes, box_mask):
            return encode_vision(params, cfg_, images, boxes, box_mask, dtype)

        @functools.partial(jax.jit, static_argnames=("frag_len",))
        def extend_fn(params, cache, input_ids, image_feats, spi_feats, start, frag_len):
            """Incremental prefill over ids[start:start+frag_len] with the
            image/SPI banks spliced by full-sequence masks (prefix-cache
            serving: vision encode + past rounds' KV are reused)."""
            embeds = params[dec_key]["embed"]["embedding"][input_ids].astype(dtype)
            embeds = masked_scatter_embeds(
                embeds, input_ids == cfg_.im_patch_token_id, image_feats
            )
            embeds = masked_scatter_embeds(
                embeds, input_ids == cfg_.bbox_token_id, spi_feats.astype(dtype)
            )
            frag = jax.lax.dynamic_slice(
                embeds, (0, start, 0), (embeds.shape[0], frag_len, embeds.shape[2])
            )
            if is_mpt and stacked:
                from gpt4roi_tpu.models.mpt import mpt_extend_stacked

                ck, cv = cache
                logits, ck, cv = mpt_extend_stacked(
                    params["mpt"], cfg_.mpt, ck, cv, frag, start
                )
                cache = (ck, cv)
            elif is_mpt:
                from gpt4roi_tpu.models.mpt import mpt_extend

                logits, cache = mpt_extend(params["mpt"], cfg_.mpt, cache, frag, start)
            elif stacked:
                ck, cv = cache
                logits, ck, cv = llama_extend_stacked(
                    params["llama"], cfg_.llama, ck, cv, frag, start
                )
                cache = (ck, cv)
            else:
                logits, cache = llama_extend(params["llama"], cfg_.llama, cache, frag, start)
            return logits, cache

        self._prefill = prefill_fn
        self._prefill_ragged = prefill_ragged_fn
        self._decode = jax.jit(one_step)
        self._decode_chunk = decode_chunk_fn
        self._decode_chunk_ragged = decode_chunk_ragged_fn
        self._spec_chunk = spec_chunk_fn
        self._encode_vision = encode_vision_fn
        self._extend = extend_fn

    def generate_ragged(
        self,
        prompts: List[Sequence[int]],  # variable-length token lists
        images: np.ndarray,  # (B, H, W, 3)
        boxes: np.ndarray,  # (B, R, 4)
        box_mask: np.ndarray,  # (B, R)
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        stop_token_ids: Sequence[int] = (),
        seed: int = 0,
        chunk_size: int = 16,
    ) -> List[List[int]]:
        """Batched generation over ragged prompts via left-padding: content
        is right-aligned so all sequences end at one buffer position —
        cache writes stay batch-uniform and per-sample RoPE positions /
        pad masks keep numerics identical to unbatched generation. This is
        the batched-serving throughput lever (decode amortises the weight
        reads across the batch); the reference serves strictly one request
        per generate call."""
        b = len(prompts)
        lengths = np.asarray([len(p) for p in prompts], np.int32)
        bucket = _round_up(int(lengths.max()), self.ecfg.prefill_bucket)
        total = bucket + max_new_tokens
        assert total <= self.ecfg.max_seq_len

        ids = np.zeros((b, bucket), np.int32)
        pad_len = bucket - lengths
        for i, p in enumerate(prompts):
            ids[i, pad_len[i] :] = np.asarray(p, np.int32)

        logits, kv = self._prefill_ragged(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(pad_len),
            jnp.asarray(images),
            jnp.asarray(boxes),
            jnp.asarray(box_mask),
            bucket,
            kv_rows=total if self._stacked else None,
            logits_at=jnp.int32(bucket - 1) if self._stacked else None,
        )
        cache = self._make_cache(b, total, kv)

        key_mask = np.ones((b, total), bool)
        for i in range(b):
            key_mask[i, : pad_len[i]] = False

        logits_np = np.asarray(logits)
        last_logits = logits_np[:, -1] if logits_np.shape[1] == 1 else logits_np[:, bucket - 1]
        key = jax.random.PRNGKey(seed)
        if temperature > 0:
            key, sub = jax.random.split(key)
            next_tok = np.asarray(
                jax.random.categorical(sub, jnp.asarray(last_logits) / temperature, axis=-1)
            ).astype(np.int32)
        else:
            next_tok = last_logits.argmax(-1).astype(np.int32)

        outputs: List[List[int]] = [[int(t)] for t in next_tok]
        done = np.zeros((b,), bool)
        tok = jnp.asarray(next_tok)
        buf_pos = jnp.int32(bucket)
        content_pos = jnp.asarray(lengths)
        remaining = max_new_tokens - 1

        def check_stops() -> None:
            for i in range(b):
                if not done[i] and outputs[i] and outputs[i][-1] in stop_token_ids:
                    done[i] = True

        check_stops()
        while remaining > 0 and not done.all():
            n = min(chunk_size, remaining)
            key, sub = jax.random.split(key)
            toks, cache = self._decode_chunk_ragged(
                self.params, cache, tok, buf_pos, content_pos,
                jnp.asarray(key_mask), jnp.float32(temperature), sub, n,
            )
            toks_np = np.asarray(toks)
            buf_pos = buf_pos + n
            content_pos = content_pos + n
            tok = toks[:, -1]
            remaining -= n
            for i in range(b):
                if not done[i]:
                    outputs[i].extend(int(t) for t in toks_np[i])
            check_stops()
        if stop_token_ids:
            for i in range(b):
                for j, t in enumerate(outputs[i]):
                    if t in stop_token_ids:
                        outputs[i] = outputs[i][: j + 1]
                        break
        return outputs

    def _make_cache(self, b: int, total: int, kv):
        """Fresh cache filled with prefill K/V, in the decoder's layout
        (stacked (L, B, S, N, D) arrays for LLaMA serving, per-layer
        lists for MPT)."""
        if self._stacked:
            if (
                isinstance(kv, tuple) and hasattr(kv[0], "ndim")
                and kv[0].shape[2] == total
            ):
                # prefill emitted cache-ready padded buffers (kv_rows):
                # they ARE the cache — no second allocation, no copy
                ck, cv = kv[0].astype(self.ecfg.compute_dtype), kv[1].astype(self.ecfg.compute_dtype)
                if self._kv_spec is not None:
                    ck = jax.device_put(ck, self._kv_spec)
                    cv = jax.device_put(cv, self._kv_spec)
                return ck, cv
            ck, cv = init_stacked_cache(
                self.kv_config(), b, total, dtype=self.ecfg.compute_dtype
            )
            if self._kv_spec is not None:
                ck = jax.device_put(ck, self._kv_spec)
                cv = jax.device_put(cv, self._kv_spec)
            return write_prefill_kv_stacked(ck, cv, kv)
        cache = init_kv_cache(self.kv_config(), b, total, dtype=self.ecfg.compute_dtype)
        return write_prefill_kv(cache, kv)

    def kv_config(self):
        """Shape config for init_kv_cache, covering both decoder types."""
        if self.cfg.decoder_type == "mpt":
            mpt = self.cfg.mpt

            class _KV:
                num_layers = mpt.n_layers
                kv_heads = mpt.n_heads
                head_dim = mpt.head_dim

            return _KV
        return self.cfg.llama

    def cached_session(self) -> "CachedSession":
        return CachedSession(self)

    def generate(
        self,
        input_ids: np.ndarray,  # (B, S) unpadded prompt (right-aligned content)
        images: np.ndarray,  # (B, H, W, 3)
        boxes: np.ndarray,  # (B, R, 4)
        box_mask: np.ndarray,  # (B, R)
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        stop_token_ids: Sequence[int] = (),
        stop_fn=None,  # callable(List[int]) -> bool, host-side stop check
        seed: int = 0,
        chunk_size: int = 16,
    ) -> List[List[int]]:
        b, s = input_ids.shape
        # pad the prompt to a multiple of the bucket quantum so a handful of
        # prefill lengths share compiled programs
        bucket = _round_up(s, self.ecfg.prefill_bucket)
        total = bucket + max_new_tokens
        assert total <= self.ecfg.max_seq_len, (
            f"prompt bucket {bucket} + {max_new_tokens} new tokens exceeds "
            f"max_seq_len {self.ecfg.max_seq_len}"
        )

        ids = np.zeros((b, bucket), np.int32)
        mask = np.zeros((b, bucket), np.float32)
        ids[:, :s] = input_ids
        mask[:, :s] = 1.0

        logits, kv = self._prefill(
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(images),
            jnp.asarray(boxes),
            jnp.asarray(box_mask),
            bucket,
            kv_rows=total if self._stacked else None,
            logits_at=jnp.int32(s - 1) if self._stacked else None,
        )
        cache = self._make_cache(b, total, kv)

        # next token from the last valid prompt position
        lengths = np.full((b,), s, np.int32)
        logits_np = np.asarray(logits)
        last_logits = (
            logits_np[:, 0] if logits_np.shape[1] == 1
            else logits_np[np.arange(b), lengths - 1]
        )
        key = jax.random.PRNGKey(seed)
        if temperature > 0:
            key, sub = jax.random.split(key)
            next_tok = np.asarray(
                jax.random.categorical(sub, jnp.asarray(last_logits) / temperature, axis=-1)
            ).astype(np.int32)
        else:
            next_tok = last_logits.argmax(-1).astype(np.int32)

        outputs: List[List[int]] = [[int(t)] for t in next_tok]
        done = np.zeros((b,), bool)
        # scalar (batch-uniform) cache position -> single-DUS cache writes
        cache_len = jnp.int32(s)
        tok = jnp.asarray(next_tok)
        remaining = max_new_tokens - 1

        def check_stops() -> None:
            for i in range(b):
                if done[i]:
                    continue
                if outputs[i] and outputs[i][-1] in stop_token_ids:
                    done[i] = True
                elif stop_fn is not None and stop_fn(outputs[i]):
                    done[i] = True

        check_stops()
        spec_w = int(self.ecfg.speculative_window or 0)
        if (
            spec_w > 1
            and temperature == 0.0
            and self.cfg.decoder_type == "llama"
            and self._stacked
            and remaining > 0
            and not done.all()
        ):
            # prompt-lookup speculative greedy decode: per-row valid-length
            # vector replaces the scalar cache_len; each chunk of n verify
            # passes emits n..n*spec_w tokens per row. Bit-identical output
            # to the vanilla loop below (tests/test_speculative.py).
            buf = jnp.zeros((b, total), jnp.int32).at[:, :s].set(
                jnp.asarray(input_ids.astype(np.int32))
            )
            buf = buf.at[jnp.arange(b), jnp.asarray(lengths)].set(jnp.asarray(next_tok))
            cur = jnp.asarray(lengths + 1, jnp.int32)
            while not done.all():
                need = max(
                    (max_new_tokens - min(
                        len(outputs[i]) for i in range(b) if not done[i]
                    )),
                    0,
                )
                cur_np = np.asarray(cur)
                room = (total - int(cur_np.max())) // spec_w
                n = min(chunk_size, need, room)
                if n <= 0:
                    break
                buf, cur, cache, _ = self._spec_chunk(
                    self.params, cache, buf, cur, n, spec_w
                )
                buf_np = np.asarray(buf)
                cur_np = np.asarray(cur)
                for i in range(b):
                    if not done[i]:
                        end = min(int(cur_np[i]), int(lengths[i]) + max_new_tokens)
                        outputs[i] = [int(t) for t in buf_np[i, int(lengths[i]):end]]
                check_stops()
                if all(len(outputs[i]) >= max_new_tokens or done[i] for i in range(b)):
                    break
            remaining = 0  # the vanilla chunk loop below is skipped
        while remaining > 0 and not done.all():
            n = min(chunk_size, remaining)
            key, sub = jax.random.split(key)
            toks, cache = self._decode_chunk(
                self.params, cache, tok, cache_len, jnp.float32(temperature), sub, n
            )
            toks_np = np.asarray(toks)  # (B, n) — single host fetch per chunk
            cache_len = cache_len + n
            tok = toks[:, -1]
            remaining -= n
            for i in range(b):
                if not done[i]:
                    outputs[i].extend(int(t) for t in toks_np[i])
            check_stops()
        # trim past the first stop token for each sequence
        if stop_token_ids:
            for i in range(b):
                for j, t in enumerate(outputs[i]):
                    if t in stop_token_ids:
                        outputs[i] = outputs[i][: j + 1]
                        break
        return outputs


class CachedSession:
    """Multi-round generation with a persistent KV + vision-feature cache.

    The reference re-runs the full prefill (vision tower included) on every
    chat round (gpt4roi/app.py:242-328). Here the image is encoded once,
    past rounds' KV stays in the cache, and each round only runs an
    incremental prefill over the newly appended tokens (bucketed to
    ``frag_quantum`` so a handful of fragment lengths share compiled
    programs). Batch size 1 (chat semantics).
    """

    def __init__(self, engine: Engine, frag_quantum: int = 64):
        self.engine = engine
        self.frag_quantum = frag_quantum
        self.reset()

    def reset(self) -> None:
        e = self.engine.ecfg
        self.max_len = e.max_seq_len
        self.ids = np.zeros((1, self.max_len), np.int32)
        self.pos = 0  # valid tokens in self.ids
        self.cached_upto = 0  # positions whose K/V are in the cache (the
        # last generated token of a round is NOT cached until consumed)
        self.cache: Optional[Any] = None
        self.image_feats = None
        self.spi_feats = None

    def set_vision(self, images: np.ndarray, boxes: np.ndarray, box_mask: np.ndarray) -> None:
        """Encode the image + regions once; re-call only when boxes change."""
        img_feats, spi_feats = self.engine._encode_vision(
            self.engine.params, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(box_mask)
        )
        self.image_feats = img_feats
        self.spi_feats = spi_feats

    def _ensure_cache(self) -> None:
        if self.cache is None:
            if self.engine._stacked:
                self.cache = init_stacked_cache(
                    self.engine.kv_config(), 1, self.max_len,
                    dtype=self.engine.ecfg.compute_dtype,
                )
            else:
                self.cache = init_kv_cache(
                    self.engine.kv_config(), 1, self.max_len,
                    dtype=self.engine.ecfg.compute_dtype,
                )

    def append_and_generate(
        self,
        new_ids: Sequence[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        stop_token_ids: Sequence[int] = (),
        stop_fn=None,
        seed: int = 0,
        chunk_size: int = 16,
    ) -> List[int]:
        out: List[int] = []
        for chunk in self.append_and_generate_stream(
            new_ids, max_new_tokens, temperature, stop_token_ids, stop_fn, seed, chunk_size
        ):
            out.extend(chunk)
        if stop_token_ids:
            for j, t in enumerate(out):
                if t in stop_token_ids:
                    out = out[: j + 1]
                    break
        return out

    def append_and_generate_stream(
        self,
        new_ids: Sequence[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        stop_token_ids: Sequence[int] = (),
        stop_fn=None,
        seed: int = 0,
        chunk_size: int = 16,
    ):
        """Generator variant: yields lists of newly decoded token ids after
        the prefill and after every decode chunk (true streaming for the
        worker fleet)."""
        assert self.image_feats is not None, "set_vision first"
        self._ensure_cache()
        n = len(new_ids)
        assert self.pos + n + max_new_tokens <= self.max_len, "session overflow"
        self.ids[0, self.pos : self.pos + n] = np.asarray(new_ids, np.int32)
        # fragment starts at the first UNcached position (re-runs the last
        # generated token of the previous round, whose K/V were never
        # written by a subsequent decode step)
        start = self.cached_upto
        n_frag = self.pos + n - start
        frag_len = _round_up(n_frag, self.frag_quantum)
        frag_len = min(frag_len, self.max_len - start)

        logits, self.cache = self.engine._extend(
            self.engine.params,
            self.cache,
            jnp.asarray(self.ids),
            self.image_feats,
            self.spi_feats,
            jnp.int32(start),
            frag_len,
        )
        self.pos += n
        self.cached_upto = self.pos
        last_logits = np.asarray(logits)[0, n_frag - 1]
        key = jax.random.PRNGKey(seed)
        if temperature > 0:
            key, sub = jax.random.split(key)
            nxt = int(
                np.asarray(jax.random.categorical(sub, jnp.asarray(last_logits) / temperature))
            )
        else:
            nxt = int(last_logits.argmax())

        out = [nxt]
        self.ids[0, self.pos] = nxt
        tok = jnp.asarray([nxt], jnp.int32)
        cache_len = jnp.int32(self.pos)
        self.pos += 1
        yield [nxt]
        remaining = max_new_tokens - 1

        def stopped() -> bool:
            if out and out[-1] in stop_token_ids:
                return True
            return stop_fn is not None and stop_fn(out)

        while remaining > 0 and not stopped():
            k = min(chunk_size, remaining)
            key, sub = jax.random.split(key)
            toks, self.cache = self.engine._decode_chunk(
                self.engine.params, self.cache, tok, cache_len, jnp.float32(temperature), sub, k
            )
            toks_np = [int(t) for t in np.asarray(toks)[0]]
            for t in toks_np:
                self.ids[0, self.pos] = t
                self.pos += 1
                out.append(t)
            cache_len = cache_len + k
            self.cached_upto = int(cache_len)
            tok = toks[:, -1]
            remaining -= k
            yield toks_np
