"""mmcv.ops.RoIAlign shim: aligned=True average RoIAlign, from-spec
(mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh:35-106), implemented
as the separable-matmul formulation in torch for CPU speed. Bit-for-bit
semantics: half-pixel offset, per-axis ``sampling_ratio`` taps averaged,
out-of-range samples contribute zero, clamped bilinear taps."""

from __future__ import annotations

import torch
import torch.nn as nn


def _axis_mats(start, length, size, oh, g):
    """(R,) interval starts/lengths -> (R, oh, size) pooled-interp matrix."""
    r = start.shape[0]
    bin_size = length / oh
    ph = torch.arange(oh, dtype=torch.float32)[None, :, None]
    iy = torch.arange(g, dtype=torch.float32)[None, None, :]
    pos = start[:, None, None] + (ph + (iy + 0.5) / g) * bin_size[:, None, None]
    oor = (pos < -1.0) | (pos > float(size))
    pc = pos.clamp(0.0, float(size - 1))
    lo = pc.floor().clamp(max=float(max(size - 2, 0)))
    frac = pc - lo
    lo_i = lo.long()
    m = torch.zeros(r, oh, size)
    wlo = torch.where(oor, torch.zeros(()), (1.0 - frac) / g)
    whi = torch.where(oor, torch.zeros(()), frac / g)
    m.scatter_add_(2, lo_i, wlo)
    m.scatter_add_(2, lo_i + 1, whi)
    return m


class RoIAlign(nn.Module):
    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode="avg", aligned=True):
        super().__init__()
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = output_size
        self.spatial_scale = float(spatial_scale)
        self.sampling_ratio = int(sampling_ratio)
        assert pool_mode == "avg" and aligned, "shim covers GPT4RoI's config"

    def forward(self, feats: torch.Tensor, rois: torch.Tensor) -> torch.Tensor:
        """feats (B, C, H, W); rois (N, 5) [batch_idx, x1, y1, x2, y2] in
        input coordinates -> (N, C, oh, ow)."""
        b, c, h, w = feats.shape
        n = rois.shape[0]
        oh, ow = self.output_size
        g = self.sampling_ratio if self.sampling_ratio > 0 else 2
        x1 = rois[:, 1] * self.spatial_scale - 0.5
        y1 = rois[:, 2] * self.spatial_scale - 0.5
        bw = rois[:, 3] * self.spatial_scale - 0.5 - x1
        bh = rois[:, 4] * self.spatial_scale - 0.5 - y1
        ay = _axis_mats(y1, bh, h, oh, g)  # (N, oh, H)
        ax = _axis_mats(x1, bw, w, ow, g)  # (N, ow, W)
        out = torch.zeros(n, c, oh, ow, dtype=feats.dtype)
        for img in range(b):
            sel = torch.nonzero(rois[:, 0].long() == img, as_tuple=False).flatten()
            if sel.numel() == 0:
                continue
            f = feats[img]  # (C, H, W)
            tmp = torch.einsum("rph,chw->rpcw", ay[sel], f)
            out[sel] = torch.einsum("rqw,rpcw->rcpq", ax[sel], tmp).to(feats.dtype)
        return out
