"""SPI module parity vs an independent torch NCHW oracle that mirrors the
reference algorithm (gpt4roi/models/layers.py) step by step, using torch's
own conv/GroupNorm/interpolate kernels and the from-spec RoIAlign oracle.
Cross-checks layouts, channel ordering, and the convert_spi weight path."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from gpt4roi_tpu.models.spi import SpiConfig, spi_forward
from gpt4roi_tpu.utils.weights import convert_spi
from tests.test_roi_align import oracle_roi_align


class TorchFuse(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.embed_dims
        self.input_conv = nn.ModuleList(
            nn.Conv2d(d + 2, d, 1) for _ in range(cfg.num_levels)
        )
        fcs = []
        for _ in range(cfg.num_fuse):
            m = nn.Module()
            m.conv = nn.Conv2d(d, d, 3, padding=1, bias=False)
            m.gn = nn.GroupNorm(cfg.gn_groups, d)
            fcs.append(m)
        self.fuse_convs = nn.ModuleList(fcs)


class TorchRoI(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.embed_dims
        self.pconvs = nn.ModuleList(
            nn.Conv2d(d, d, 3, padding=1) for _ in range(cfg.num_levels)
        )
        self.pos_embedd = nn.Sequential(
            nn.Linear(4, cfg.pos_hidden),
            nn.ReLU(),
            nn.LayerNorm(cfg.pos_hidden),
            nn.Linear(cfg.pos_hidden, cfg.pos_dim),
            nn.ReLU(),
            nn.LayerNorm(cfg.pos_dim),
        )
        self.flatten_linear = nn.Linear(d * cfg.roi_output_size**2, cfg.pos_dim)
        self.updims = nn.Linear(cfg.pos_dim, cfg.out_dims)


class TorchSpi(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.mlvl_fuse = TorchFuse(cfg)
        self.roi_align = TorchRoI(cfg)

    def forward(self, cfg, mlvl_feats, boxes, box_mask):
        b, p, c = mlvl_feats[0].shape
        g = cfg.base_grid
        feats = [f.reshape(b, g, g, c).permute(0, 3, 1, 2) for f in mlvl_feats]
        feats = [
            F.interpolate(f, size=(s, s), mode="bilinear", align_corners=True)
            for f, s in zip(feats, cfg.level_sizes)
        ]
        # coordinate concat + input conv
        new = []
        for lvl, f in enumerate(feats):
            h, w = f.shape[-2:]
            xr = torch.linspace(-1, 1, w)
            yr = torch.linspace(-1, 1, h)
            yy, xx = torch.meshgrid(yr, xr, indexing="ij")
            coord = torch.stack([xx, yy]).unsqueeze(0).expand(b, -1, -1, -1)
            new.append(self.mlvl_fuse.input_conv[lvl](torch.cat([f, coord], 1)))
        feats = new
        rc, sc = cfg.remain_channels, cfg.shuffle_channels
        n = cfg.num_levels
        for fc in self.mlvl_fuse.fuse_convs:
            out = []
            for lvl in range(n):
                top, down = min(lvl + 1, n - 1), max(lvl - 1, 0)
                tar = feats[lvl]
                remain = tar[:, :rc]
                ft = F.interpolate(feats[top][:, rc + sc :], size=tar.shape[-2:], mode="bilinear", align_corners=True)
                fd = F.interpolate(feats[down][:, rc : rc + sc], size=tar.shape[-2:], mode="bilinear", align_corners=True)
                y = fc.conv(torch.cat([remain, ft, fd], 1))
                out.append(F.relu(fc.gn(y)))
            feats = out
        # roi extractor
        flat_boxes = boxes.reshape(-1, 4)
        pos = self.roi_align.pos_embedd(flat_boxes)
        bidx = np.where(
            box_mask.reshape(-1).numpy(), np.repeat(np.arange(b), boxes.shape[1]), -1
        ).astype(np.int32)
        scaled = (flat_boxes * cfg.image_size).numpy()
        acc = None
        for lvl in range(n):
            f_np = feats[lvl].permute(0, 2, 3, 1).detach().numpy()
            rf = oracle_roi_align(
                f_np, scaled, bidx, cfg.roi_output_size, 1.0 / cfg.strides[lvl], cfg.sampling_ratio
            )
            rf = torch.from_numpy(rf).permute(0, 3, 1, 2)
            y = self.roi_align.pconvs[lvl](rf)
            acc = y if acc is None else acc + y
        fused = F.relu(acc).flatten(1)
        out = self.roi_align.flatten_linear(fused) + pos
        out = self.roi_align.updims(out)
        out = out * box_mask.reshape(-1, 1)
        return out.reshape(boxes.shape[0], boxes.shape[1], -1)


@pytest.fixture(scope="module")
def cfg():
    return SpiConfig.tiny()


def test_spi_parity(cfg, rng):
    torch.manual_seed(0)
    oracle = TorchSpi(cfg).eval()
    sd = {f"model.spi_module.{k}": v for k, v in oracle.state_dict().items()}
    params = convert_spi(sd, num_levels=cfg.num_levels, num_fuse=cfg.num_fuse)

    b, r = 2, 5
    feats = [
        rng.standard_normal((b, cfg.base_grid**2, cfg.embed_dims), dtype=np.float32)
        for _ in range(cfg.num_levels)
    ]
    boxes = rng.random((b, r, 4), dtype=np.float32)
    boxes = np.concatenate(
        [boxes[..., :2] * 0.5, boxes[..., :2] * 0.5 + 0.1 + boxes[..., 2:] * 0.4], axis=-1
    ).astype(np.float32)
    mask = np.ones((b, r), bool)
    mask[1, 3:] = False

    with torch.no_grad():
        want = oracle(
            cfg,
            [torch.from_numpy(f) for f in feats],
            torch.from_numpy(boxes),
            torch.from_numpy(mask.astype(np.float32)),
        ).numpy()
    got = np.asarray(spi_forward(params, feats, boxes, mask, cfg))
    assert got.shape == want.shape == (b, r, cfg.out_dims)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # masked slots exact zero
    assert np.abs(got[1, 3:]).max() == 0.0


@pytest.mark.slow
def test_spi_grad_flows(cfg, rng):
    import jax
    import jax.numpy as jnp

    from gpt4roi_tpu.models.spi import init_spi_params

    params = init_spi_params(jax.random.PRNGKey(0), cfg)
    b, r = 1, 3
    feats = [
        jnp.asarray(rng.standard_normal((b, cfg.base_grid**2, cfg.embed_dims), dtype=np.float32))
        for _ in range(cfg.num_levels)
    ]
    boxes = jnp.asarray(np.array([[[0.1, 0.1, 0.6, 0.6], [0.3, 0.2, 0.9, 0.8], [0, 0, 0, 0]]], np.float32))
    mask = jnp.asarray(np.array([[True, True, False]]))

    def loss(p):
        return (spi_forward(p, feats, boxes, mask, cfg) ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_fuse_int8_matches_bf16_class(cfg, rng):
    """Inference-only W8A8 int8 fuse convs (SpiConfig.fuse_int8): output
    stays within the int8 numeric class of the fp path end to end."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from gpt4roi_tpu.models.spi import init_spi_params, spi_forward

    params = init_spi_params(jax.random.PRNGKey(0), cfg)
    b, r = 2, 3
    feats = [
        jnp.asarray(rng.standard_normal((b, cfg.base_grid**2, cfg.embed_dims)), jnp.float32)
        for _ in range(cfg.num_levels)
    ]
    boxes = jnp.asarray(rng.random((b, r, 4)).astype(np.float32) * 0.4 + 0.1)
    boxes = boxes.at[..., 2:].add(0.3)
    mask = jnp.ones((b, r), bool)

    want = np.asarray(spi_forward(params, feats, boxes, mask, cfg))
    cfg8 = dataclasses.replace(cfg, fuse_int8=True)
    got = np.asarray(spi_forward(params, feats, boxes, mask, cfg8))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    # 2 fuse rounds of W8A8 (per-tensor act + per-channel weight scales)
    assert rel < 0.05, rel
    # and it is actually a different path (int8 rounding visible)
    assert rel > 1e-6


def test_static_scale_int8_matches_bf16_class(cfg, rng):
    """Serving fast path with CALIBRATED static activation scales (fuse
    convs collapsed to one int8 conv per level + W8A8 RoI-head pconvs)
    stays within the int8 numeric class of the fp path; calibration runs
    on a DIFFERENT batch than the evaluation."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from gpt4roi_tpu.models.spi import (
        calibrate_spi_act_scales,
        init_spi_params,
        spi_forward,
    )

    params = init_spi_params(jax.random.PRNGKey(0), cfg)
    b, r = 2, 3
    def mk_feats():
        return [
            jnp.asarray(rng.standard_normal((b, cfg.base_grid**2, cfg.embed_dims)), jnp.float32)
            for _ in range(cfg.num_levels)
        ]
    feats = mk_feats()
    boxes = jnp.asarray(rng.random((b, r, 4)).astype(np.float32) * 0.4 + 0.1)
    boxes = boxes.at[..., 2:].add(0.3)
    mask = jnp.ones((b, r), bool)

    want = np.asarray(spi_forward(params, feats, boxes, mask, cfg))
    cfg8 = dataclasses.replace(cfg, fuse_int8=True)
    scales = calibrate_spi_act_scales(params, mk_feats(), boxes, mask, cfg8)
    assert scales["fuse_act_scales"].shape == (cfg.num_fuse, cfg.num_levels)
    assert scales["pconv_act_scales"].shape == (cfg.num_levels,)
    assert scales["input_act_scales"].shape == (cfg.num_levels,)
    from gpt4roi_tpu.models.spi import prequantize_spi_kernels

    p2 = dict(params)
    p2.update(scales)
    p2 = prequantize_spi_kernels(p2)
    got = np.asarray(spi_forward(p2, feats, boxes, mask, cfg8))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel
    assert rel > 1e-6  # actually the int8 path
