"""Spatial Prompt Injection (SPI) module — the core new math of GPT4RoI.

Re-architecture of ``MLVLROIQueryModule``/``MLVLFuseModule``/
``MlvlRoIExtractor`` (reference: gpt4roi/models/layers.py:96-335) with static
shapes: boxes arrive as a padded (B, R, 4) tensor + validity mask instead of
per-image python lists, and the output is (B, R, out_dims) with exact zeros
at padded slots.

Pipeline (numerics identical to the reference):
  1. 4 pyramid levels of ViT tokens (B, 256, C) -> (B, 16, 16, C) maps,
     bilinear-upsampled (align_corners=True) to [128^2, 64^2, 32^2, 16^2]
     (layers.py:218-232);
  2. per-level concat of a 2-channel [-1, 1] coordinate grid (x then y;
     layers.py:117-126), 1x1 input conv 1026 -> 1024 (layers.py:129-131);
  3. ``num_fuse`` rounds of neighbour-level channel shuffling — each level
     keeps its first 512 channels, imports channels [768:1024] from the level
     above and [512:768] from the level below (bilinear-resized, fp32),
     then a 3x3 conv (no bias) + GroupNorm(64) + ReLU (layers.py:152-180);
  4. per-level aligned RoIAlign (output 14, sampling_ratio 2, strides
     [1.75, 3.5, 7, 14], fp32 — layers.py:206-216, 307-313) on boxes scaled
     from [0,1] to [0,224] (layers.py:297);
  5. per-level 3x3 conv (with bias), summed + ReLU, flattened in (C, h, w)
     order -> Linear(1024*14^2, 1024); plus a box MLP pos-embed
     4 -> 256 -> 1024 computed on the *normalised* boxes (layers.py:284-285);
     final ``updims`` Linear(1024 -> 4096) (layers.py:320-329).

All convs run channels-last on the MXU; RoIAlign is the separable-matmul op
from gpt4roi_tpu.ops.roi_align.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.ops.interp import interpolate_bilinear
from gpt4roi_tpu.ops.norms import group_norm, layer_norm
from gpt4roi_tpu.ops.roi_align import roi_align_batched


def _roi_align(feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio):
    """Backend dispatch: Pallas tap-kernel on TPU (HBM-bandwidth-bound,
    features streamed once per image), vmapped XLA matmuls elsewhere."""
    if jax.default_backend() == "tpu":
        from gpt4roi_tpu.ops.roi_align_pallas import roi_align_batched_pallas

        return roi_align_batched_pallas(
            feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio
        )
    return roi_align_batched(
        feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio
    )


@dataclasses.dataclass(frozen=True)
class SpiConfig:
    embed_dims: int = 1024
    out_dims: int = 4096
    num_levels: int = 4
    num_fuse: int = 5
    roi_output_size: int = 14
    sampling_ratio: int = 2
    base_grid: int = 16  # ViT token grid (16x16)
    image_size: float = 224.0
    gn_groups: int = 64
    pos_hidden: int = 256
    pos_dim: int = 1024
    # inference-only W8A8 int8 fuse convs (MXU int8 pipe, ~1.8x the bf16
    # conv rate on v5e); int8-class numerics — keep False for training
    # and for bit-parity with the fp reference
    fuse_int8: bool = False

    @property
    def shuffle_channels(self) -> int:
        return self.embed_dims // 4

    @property
    def remain_channels(self) -> int:
        return self.embed_dims - 2 * self.shuffle_channels

    @property
    def level_sizes(self) -> List[int]:
        # [base * 2^l for l] reversed -> finest first (layers.py:225-228)
        return [self.base_grid * 2 ** (self.num_levels - 1 - l) for l in range(self.num_levels)]

    @property
    def strides(self) -> List[float]:
        # image_size / level_size, e.g. 224/128 = 1.75 (layers.py:206)
        return [self.image_size / s for s in self.level_sizes]

    @classmethod
    def tiny(cls) -> "SpiConfig":
        return cls(embed_dims=32, out_dims=64, num_levels=3, num_fuse=2, roi_output_size=4, base_grid=4, image_size=28.0, gn_groups=8, pos_hidden=16, pos_dim=32)


Params = Dict[str, Any]


def _conv_init(key, kh, kw, cin, cout, std=0.01, bias=True, dtype=jnp.float32):
    p = {"kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _dense_init(key, cin, cout, dtype=jnp.float32):
    return {
        "kernel": jax.random.normal(key, (cin, cout), dtype) * (cin**-0.5),
        "bias": jnp.zeros((cout,), dtype),
    }


def init_spi_params(key: jax.Array, cfg: SpiConfig, dtype=jnp.float32) -> Params:
    d = cfg.embed_dims
    keys = jax.random.split(key, cfg.num_levels * 2 + cfg.num_fuse + 4)
    ki = iter(range(len(keys)))
    # normal_init(std=0.01) on convs matches the reference (layers.py:146-150, 275-278)
    input_convs = [_conv_init(keys[next(ki)], 1, 1, d + 2, d, dtype=dtype) for _ in range(cfg.num_levels)]
    fuse_convs = [
        {
            "conv": _conv_init(keys[next(ki)], 3, 3, d, d, bias=False, dtype=dtype),
            "gn": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        }
        for _ in range(cfg.num_fuse)
    ]
    pconvs = [_conv_init(keys[next(ki)], 3, 3, d, d, dtype=dtype) for _ in range(cfg.num_levels)]
    flat_in = d * cfg.roi_output_size**2
    return {
        "input_convs": input_convs,
        "fuse_convs": fuse_convs,
        "pconvs": pconvs,
        "pos_embed": {
            "fc1": _dense_init(keys[next(ki)], 4, cfg.pos_hidden, dtype),
            "ln1": {"scale": jnp.ones((cfg.pos_hidden,), dtype), "bias": jnp.zeros((cfg.pos_hidden,), dtype)},
            "fc2": _dense_init(keys[next(ki)], cfg.pos_hidden, cfg.pos_dim, dtype),
            "ln2": {"scale": jnp.ones((cfg.pos_dim,), dtype), "bias": jnp.zeros((cfg.pos_dim,), dtype)},
        },
        "flatten_linear": _dense_init(keys[next(ki)], flat_in, cfg.pos_dim, dtype),
        "updims": _dense_init(keys[next(ki)], cfg.pos_dim, cfg.out_dims, dtype),
    }


def _conv_kernel(kernel: jax.Array, x: jax.Array, stride: int = 1, padding: str = "SAME") -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv(p: Params, x: jax.Array, stride: int = 1, padding: str = "SAME") -> jax.Array:
    # no preferred_element_type here: mixing it with bf16 operands breaks
    # the conv transpose (AD) dtype check; XLA TPU already accumulates
    # bf16 convs in fp32 internally
    y = _conv_kernel(p["kernel"], x, stride, padding)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _dense(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) grid of [-1, 1] coords, channel order [x, y]
    (layers.py:117-126)."""
    x = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def _quant_kernel_slices(kern: jax.Array, splits: List[int]):
    """Per-OUTPUT-channel int8 quantization of a conv kernel, sliced along
    input channels AFTER quantization so all slices share one scale (their
    int32 partial sums stay commensurable)."""
    aw = jnp.max(jnp.abs(kern.astype(jnp.float32)), axis=(0, 1, 2))  # (cout,)
    sw = jnp.where(aw > 0, aw / 127.0, 1.0)
    kq = jnp.clip(jnp.round(kern.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    slices = []
    start = 0
    for width in splits:
        slices.append(kq[:, :, start : start + width, :])
        start += width
    return slices, sw


def _conv_int8(kq: jax.Array, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor dynamic int8 activation quant + int8 x int8 MXU conv.
    Returns (int32 conv result, activation scale); the caller applies
    sx * sw in the epilogue. v5e int8 conv measured 325 TOP/s vs 177
    bf16 TF/s (scripts/micro_int8_conv.py)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y, sx


def _quant_static(x: jax.Array, s: jax.Array) -> jax.Array:
    """Static-scale int8 activation quantization: pure elementwise (no absmax
    reduction pass), so XLA fuses it into the producing op (GN epilogue or
    bilinear interp). Out-of-range values saturate at ±127."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)


def _kernel_q(p: Params) -> Tuple[jax.Array, jax.Array]:
    """Int8 conv kernel + per-out-channel scale: pre-quantized if present
    (``prequantize_spi_kernels``), else quantized on the fly."""
    if "kernel_q" in p:
        return p["kernel_q"], p["kernel_scale"]
    (kq,), sw = _quant_kernel_slices(p["kernel"], [p["kernel"].shape[2]])
    return kq, sw


def prequantize_spi_kernels(params: Params) -> Params:
    """Serving prep: bake int8 kernels + scales for every conv the static
    W8A8 path uses (input convs, fuse convs, RoI-head pconvs), so the
    per-call kernel quantization passes (~9 f32 kernel reads + round
    chains per encode) disappear. The f32 kernels stay (training source of
    truth); the int8 copies add <40 MB at production scale."""

    def bake(p):
        p = dict(p)
        (kq,), sw = _quant_kernel_slices(p["kernel"], [p["kernel"].shape[2]])
        p["kernel_q"] = kq
        p["kernel_scale"] = sw
        return p

    out = dict(params)
    out["input_convs"] = [bake(p) for p in params["input_convs"]]
    out["fuse_convs"] = [
        {**fp, "conv": bake(fp["conv"])} for fp in params["fuse_convs"]
    ]
    out["pconvs"] = [bake(p) for p in params["pconvs"]]
    return out


def mlvl_fuse(
    params: Params,
    feats: List[jax.Array],
    cfg: SpiConfig,
    act_scales: jax.Array | None = None,
    collect_scales: bool = False,
    remat="full",
):
    """Coordinate concat + input convs + num_fuse shuffle rounds.

    ``act_scales`` (num_fuse, num_levels) f32 enables the static-scale W8A8
    path: one shared activation scale per (round, target-level) covering all
    three kernel slices, so the int32 partial sums add directly and the
    quantize has no per-call absmax reduction (the dynamic path's absmax
    passes cost ~31 ms/batch on v5e — see PARITY.md). Obtain scales with
    ``calibrate_fuse_act_scales``. ``collect_scales`` runs the fp path and
    additionally returns the observed (num_fuse, num_levels) conv-input
    absmaxes (the calibration measurement)."""
    in_scales = (
        params.get("input_act_scales")
        if (cfg.fuse_int8 and act_scales is not None and not collect_scales)
        else None
    )
    levels = []
    input_maxes = []
    for lvl, f in enumerate(feats):
        h, w = f.shape[1], f.shape[2]
        coord = jnp.broadcast_to(coordinate_grid(h, w, f.dtype), (f.shape[0], h, w, 2))
        x = jnp.concatenate([f, coord], axis=-1)
        ip = params["input_convs"][lvl]
        if in_scales is not None:
            # static-W8A8 1x1 input conv (1026 -> 1024; ~0.4 TFLOP/batch)
            kq, sw = _kernel_q(ip)
            s = in_scales[lvl]
            yi = jax.lax.conv_general_dilated(
                _quant_static(x, s), kq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = (yi.astype(jnp.float32) * (s * sw) + ip["bias"].astype(jnp.float32)).astype(f.dtype)
        else:
            if collect_scales:
                input_maxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = _conv(ip, x)
        levels.append(y)

    n = cfg.num_levels
    rc, sc = cfg.remain_channels, cfg.shuffle_channels

    def one_round_static(levels, fuse_p, scales_row):
        # W8A8 with calibrated static activation scales: quantizes are
        # elementwise (XLA-fused into interp/concat producers, no absmax
        # reduction pass), and the shared act scale per target level lets
        # the three kernel slices collapse back into ONE int8 conv over an
        # int8 channel-concat — one int32 output materialization instead of
        # three (int32 maps are 4 B/el of HBM traffic; the int8 concat is
        # 1 B/el). Single f32 epilogue applies s * sw before GroupNorm.
        kern = fuse_p["conv"]["kernel"]
        mode = os.environ.get("GPT4ROI_FUSE_STATIC", "pallas")
        if mode == "pallas" and jax.default_backend() != "tpu":
            mode = "concat"  # the Pallas epilogue is TPU-only (serving path)
        if mode in ("concat", "pallas"):
            kq_full, sw = _kernel_q(fuse_p["conv"])
        else:
            (kq_rem, kq_top, kq_down), sw = _quant_kernel_slices(
                kern, [rc, sc, kern.shape[2] - rc - sc]
            )
        new_levels = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            tar = levels[lvl]
            hw = (tar.shape[1], tar.shape[2])
            s = scales_row[lvl]
            from_top = interpolate_bilinear(levels[top][..., rc + sc :], hw, align_corners=True)
            from_down = interpolate_bilinear(levels[down][..., rc : rc + sc], hw, align_corners=True)
            if mode in ("concat", "pallas"):
                qcat = jnp.concatenate(
                    [
                        _quant_static(tar[..., :rc], s),
                        _quant_static(from_top, s),
                        _quant_static(from_down, s),
                    ],
                    axis=-1,
                )
                if mode == "pallas":
                    # fused conv + scale + GN epilogue (ops/fuse_conv_gn.py):
                    # the int32 map and the GN stats pass never hit HBM
                    from gpt4roi_tpu.ops.fuse_conv_gn import fuse_round_level_pallas

                    y = fuse_round_level_pallas(
                        qcat, kq_full, s * sw,
                        fuse_p["gn"]["scale"], fuse_p["gn"]["bias"],
                        out_dtype=tar.dtype, groups=cfg.gn_groups,
                    )
                    new_levels.append(y)
                    continue
                y = jax.lax.conv_general_dilated(
                    qcat, kq_full, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            else:
                y = None
                for kq, xs in ((kq_rem, tar[..., :rc]), (kq_top, from_top), (kq_down, from_down)):
                    yi = jax.lax.conv_general_dilated(
                        _quant_static(xs, s), kq, window_strides=(1, 1), padding="SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32,
                    )
                    y = yi if y is None else y + yi
            y = (y.astype(jnp.float32) * (s * sw)).astype(tar.dtype)
            y = group_norm(y, fuse_p["gn"]["scale"], fuse_p["gn"]["bias"], cfg.gn_groups)
            new_levels.append(jax.nn.relu(y))
        return new_levels

    def one_round(levels, fuse_p):
        # conv(concat(a, b, c)) == conv_a(a) + conv_b(b) + conv_c(c) with the
        # kernel sliced along input channels — skips materialising the
        # concatenated 1024-ch map (measured ~1 ms/round on v5e) while
        # keeping the reference's channel-shuffle semantics exactly
        kern = fuse_p["conv"]["kernel"]
        if cfg.fuse_int8:
            # inference fast path: W8A8 convs on the MXU int8 pipe (~1.8x
            # the bf16 conv rate on v5e). Shared per-out-channel weight
            # scale across the three slices; per-tensor activation scales
            # applied in the epilogue before summation. int8-class
            # numerics — never used in training (round() has no gradient).
            (kq_rem, kq_top, kq_down), sw = _quant_kernel_slices(kern, [rc, sc, kern.shape[2] - rc - sc])
        else:
            k_rem = kern[:, :, :rc, :]
            k_top = kern[:, :, rc : rc + sc, :]
            k_down = kern[:, :, rc + sc :, :]
        new_levels = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            tar = levels[lvl]
            hw = (tar.shape[1], tar.shape[2])
            from_top = interpolate_bilinear(levels[top][..., rc + sc :], hw, align_corners=True)
            from_down = interpolate_bilinear(levels[down][..., rc : rc + sc], hw, align_corners=True)
            if cfg.fuse_int8:
                y1, s1 = _conv_int8(kq_rem, tar[..., :rc])
                y2, s2 = _conv_int8(kq_top, from_top)
                y3, s3 = _conv_int8(kq_down, from_down)
                y = (
                    y1.astype(jnp.float32) * s1
                    + y2.astype(jnp.float32) * s2
                    + y3.astype(jnp.float32) * s3
                ) * sw
                y = y.astype(tar.dtype)
            else:
                y = (
                    _conv_kernel(k_rem, tar[..., :rc])
                    + _conv_kernel(k_top, from_top)
                    + _conv_kernel(k_down, from_down)
                )
            y = group_norm(y, fuse_p["gn"]["scale"], fuse_p["gn"]["bias"], cfg.gn_groups)
            new_levels.append(jax.nn.relu(y))
        return new_levels

    # remat per shuffle round under "full" only: the fuse pyramid's
    # activations dominate SPI training memory (5 rounds x 4 levels of
    # up-to-128^2x1024 maps), but the round recompute costs a measured
    # ~57 ms/step at stage-2 shape (scripts/micro_fuse_bwd.py) — under
    # "dots"/"none" the ~1.5 GB of round activations are kept instead
    if remat in ("full", True):
        one_round = jax.checkpoint(one_round)

    if collect_scales:
        # calibration: fp rounds, recording each round's per-target-level
        # conv-input absmax (max over the three kernel-slice inputs)
        maxes = []
        for fuse_p in params["fuse_convs"]:
            row = []
            for lvl in range(n):
                top = min(lvl + 1, n - 1)
                down = max(lvl - 1, 0)
                tar = levels[lvl]
                hw = (tar.shape[1], tar.shape[2])
                ft = interpolate_bilinear(levels[top][..., rc + sc :], hw, align_corners=True)
                fd = interpolate_bilinear(levels[down][..., rc : rc + sc], hw, align_corners=True)
                m = jnp.max(jnp.abs(tar[..., :rc].astype(jnp.float32)))
                m = jnp.maximum(m, jnp.max(jnp.abs(ft.astype(jnp.float32))))
                m = jnp.maximum(m, jnp.max(jnp.abs(fd.astype(jnp.float32))))
                row.append(m)
            maxes.append(jnp.stack(row))
            levels = one_round(levels, fuse_p)
        return levels, (jnp.stack(maxes), jnp.stack(input_maxes))

    if cfg.fuse_int8 and act_scales is not None:
        for r_i, fuse_p in enumerate(params["fuse_convs"]):
            levels = one_round_static(levels, fuse_p, act_scales[r_i])
        return levels

    for fuse_p in params["fuse_convs"]:
        levels = one_round(levels, fuse_p)
    return levels


def calibrate_fuse_act_scales(
    params: Params,
    mlvl_feats: Sequence[jax.Array],
    cfg: SpiConfig,
    margin: float = 1.0,
) -> jax.Array:
    """Run the fp fuse pyramid on a calibration batch and return static W8A8
    activation scales (num_fuse, num_levels) f32 for the int8 fast path.

    Store the result under ``params["fuse_act_scales"]`` to activate the
    static-scale path in :func:`spi_forward` (standard static-activation
    W8A8 serving practice; out-of-calibration outliers saturate at ±127).
    The reference has no quantized path — this accelerates the region encode
    of gpt4roi/models/layers.py:128-180 beyond it."""
    b = mlvl_feats[0].shape[0]
    g, c = cfg.base_grid, cfg.embed_dims
    feats = [f.reshape(b, g, g, c) for f in mlvl_feats]
    feats = [
        interpolate_bilinear(f, (s, s), align_corners=True)
        for f, s in zip(feats, cfg.level_sizes)
    ]
    _, (maxes, _) = mlvl_fuse(params, feats, cfg, collect_scales=True)
    return jnp.where(maxes > 0, maxes * margin / 127.0, 1.0).astype(jnp.float32)


def calibrate_spi_act_scales(
    params: Params,
    mlvl_feats: Sequence[jax.Array],
    boxes: jax.Array,
    box_mask: jax.Array,
    cfg: SpiConfig,
    margin: float = 1.0,
) -> Dict[str, jax.Array]:
    """Full static-W8A8 calibration for the SPI serving fast path: fuse-conv
    scales (num_fuse, num_levels) AND per-level RoI-head pconv input scales
    (num_levels,). Merge the returned dict into the spi params to activate
    both int8 stages in :func:`spi_forward` (the 4 per-level 3x3 pconvs are
    ~3.8 TFLOP per 256-region batch — the second-largest MXU consumer after
    the fuse pyramid; reference op: gpt4roi/models/layers.py:275-316)."""
    b = mlvl_feats[0].shape[0]
    g, c = cfg.base_grid, cfg.embed_dims
    feats = [f.reshape(b, g, g, c) for f in mlvl_feats]
    feats = [
        interpolate_bilinear(f, (s, s), align_corners=True)
        for f, s in zip(feats, cfg.level_sizes)
    ]
    fused, (maxes, in_maxes) = mlvl_fuse(params, feats, cfg, collect_scales=True)
    scaled = boxes.astype(jnp.float32) * cfg.image_size
    head_maxes = []
    for lvl in range(cfg.num_levels):
        rf = _roi_align(
            fused[lvl], scaled, box_mask, cfg.roi_output_size,
            1.0 / cfg.strides[lvl], cfg.sampling_ratio,
        )
        head_maxes.append(jnp.max(jnp.abs(rf.astype(jnp.float32))))
    to_scale = lambda m: jnp.where(m > 0, m * margin / 127.0, 1.0).astype(jnp.float32)
    return {
        "fuse_act_scales": to_scale(maxes),
        "pconv_act_scales": to_scale(jnp.stack(head_maxes)),
        "input_act_scales": to_scale(in_maxes),
    }


def box_position_embedding(params: Params, boxes: jax.Array) -> jax.Array:
    """MLP pos-embed on normalised boxes: Linear-ReLU-LN-Linear-ReLU-LN
    (layers.py:260-267); applied before the x224 scaling (layers.py:284-285)."""
    p = params["pos_embed"]
    y = jax.nn.relu(_dense(p["fc1"], boxes))
    y = layer_norm(y, p["ln1"]["scale"], p["ln1"]["bias"])
    y = jax.nn.relu(_dense(p["fc2"], y))
    return layer_norm(y, p["ln2"]["scale"], p["ln2"]["bias"])


def spi_forward(
    params: Params,
    mlvl_feats: Sequence[jax.Array],  # num_levels x (B, P, C) ViT token maps
    boxes: jax.Array,  # (B, R, 4) normalised [0, 1] x1 y1 x2 y2
    box_mask: jax.Array,  # (B, R) bool — True for real boxes
    cfg: SpiConfig,
    remat="full",
) -> jax.Array:
    """Region queries (B, R, out_dims); padded slots are exact zeros.

    ``remat`` controls the per-fuse-round checkpoint (see mlvl_fuse)."""
    b, r = boxes.shape[0], boxes.shape[1]
    g = cfg.base_grid
    c = cfg.embed_dims
    feats = [f.reshape(b, g, g, c) for f in mlvl_feats]
    feats = [
        interpolate_bilinear(f, (s, s), align_corners=True)
        for f, s in zip(feats, cfg.level_sizes)
    ]
    feats = mlvl_fuse(
        params, feats, cfg, act_scales=params.get("fuse_act_scales"), remat=remat
    )

    flat_boxes = boxes.reshape(b * r, 4).astype(jnp.float32)
    pos = box_position_embedding(params, flat_boxes)
    scaled = boxes.astype(jnp.float32) * cfg.image_size  # (B, R, 4)

    # serving fast path: W8A8 per-level pconvs with calibrated static
    # activation scales (the 4 convs are ~3.8 TFLOP per 256-region batch;
    # int8 MXU runs them ~1.8x the bf16 rate on v5e)
    int8_heads = cfg.fuse_int8 and "pconv_act_scales" in params

    acc = None
    for lvl in range(cfg.num_levels):
        rf = _roi_align(
            feats[lvl],
            scaled,
            box_mask,
            cfg.roi_output_size,
            1.0 / cfg.strides[lvl],
            cfg.sampling_ratio,
        )
        # (B, R, oh, ow, C) fp32 align, cast back (layers.py:310-313)
        rf = rf.reshape(b * r, cfg.roi_output_size, cfg.roi_output_size, cfg.embed_dims)
        if int8_heads:
            kq, sw = _kernel_q(params["pconvs"][lvl])
            s = params["pconv_act_scales"][lvl]
            yi = jax.lax.conv_general_dilated(
                _quant_static(rf, s), kq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = yi.astype(jnp.float32) * (s * sw) + params["pconvs"][lvl]["bias"].astype(jnp.float32)
            y = y.astype(feats[lvl].dtype)
        else:
            rf = rf.astype(feats[lvl].dtype)
            y = _conv(params["pconvs"][lvl], rf)
        acc = y if acc is None else acc + y
    fused = jax.nn.relu(acc)
    # flatten in (C, h, w) order to match the reference's NCHW flatten(1)
    fused = fused.transpose(0, 3, 1, 2).reshape(b * r, -1)
    out = _dense(params["flatten_linear"], fused)
    out = out + pos.astype(out.dtype)
    out = _dense(params["updims"], out)
    out = out * box_mask.reshape(b * r, 1).astype(out.dtype)
    return out.reshape(b, r, cfg.out_dims)


def sine_coordinate_encoding(
    coord: jax.Array, num_feats: int = 128, temperature: float = 10000.0
) -> jax.Array:
    """DETR-style sine/cosine encoding of (..., 2|4) normalised coords
    (reference: gpt4roi/models/layers.py coordinate_to_encoding — present
    but unused in the live path, which uses the pos-embed MLP instead).
    Feature order per coordinate: interleaved (sin, cos) pairs; 2-coord
    inputs emit (y, x), 4-coord (y, x, w, h)."""
    import math as _math

    scale = 2.0 * _math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    def enc(v):
        p = v[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
            *p.shape[:-1], -1
        )

    x, y = coord[..., 0], coord[..., 1]
    parts = [enc(y), enc(x)]
    if coord.shape[-1] == 4:
        parts = [enc(y), enc(x), enc(coord[..., 2]), enc(coord[..., 3])]
    elif coord.shape[-1] != 2:
        raise ValueError(f"coord last dim must be 2 or 4, got {coord.shape[-1]}")
    return jnp.concatenate(parts, axis=-1)
