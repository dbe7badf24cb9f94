"""Measure the PyTorch reference encode pipeline (VERDICT item 8).

The reference (jshilong/GPT4RoI) publishes no throughput numbers and its CUDA
stack cannot run in this image, so BASELINE.md's A100 denominator was a pure
analytic estimate (50% tensor-core utilisation assumed). This script anchors
it with a measurement:

  1. run the reference encode pipeline (CLIP ViT-L/14 with hidden states +
     MLVLFuse 5-round shuffle pyramid + multi-level RoIAlign head, mirroring
     gpt4roi/models/spi_llava.py:51-87 + layers.py:96-335) in PyTorch on CPU,
     at full model size (1 image x 32 regions; FLOPs scale linearly in B);
  2. probe the same CPU's achievable dense-matmul rate with torch.matmul;
  3. derive the pipeline efficiency  eta = achieved FLOP/s / matmul FLOP/s —
     the fraction of available matmul throughput the reference pipeline
     sustains end to end (python loops, concats, GN, resizes included);
  4. project to A100: denominator = workload_flops / (eta * A100_MATMUL),
     with A100_MATMUL = 265 TF/s (85% of the 312 TF/s fp16 peak — a
     *generous* big-matmul achievable rate; real pipelines fare worse).

Two deliberate choices make the result an UPPER bound (harsh on us):
  * RoIAlign here uses our separable-matmul formulation in torch — far
    faster than mmcv's per-element CPU/CUDA kernels;
  * eta is measured at full map sizes where CPU conv efficiency peaks.

Usage: python scripts/measure_reference_baseline.py
Writes nothing; paste the printed numbers into BASELINE.md.
"""

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

D = 1024
LEVELS = [128, 64, 32, 16]
STRIDES = [1.75, 3.5, 7.0, 14.0]
NUM_FUSE = 5
R = 32  # regions per image
OH = 14


def torch_roi_align_separable(feat_nchw, boxes_scaled, oh, spatial_scale, g=2):
    """Separable-matmul RoIAlign (aligned=True, avg), vectorised in torch.
    feat (B=1, C, H, W); boxes (R, 4) in input coords."""
    _, c, h, w = feat_nchw.shape
    r = boxes_scaled.shape[0]

    def axis_mats(start, length, size):
        bin_size = length / oh  # (R,)
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
        return m  # (R, OH, size)

    x1 = boxes_scaled[:, 0] * spatial_scale - 0.5
    y1 = boxes_scaled[:, 1] * spatial_scale - 0.5
    bw = boxes_scaled[:, 2] * spatial_scale - 0.5 - x1
    bh = boxes_scaled[:, 3] * spatial_scale - 0.5 - y1
    ay = axis_mats(y1, bh, h)  # (R, OH, H)
    ax = axis_mats(x1, bw, w)  # (R, OH, W)
    f = feat_nchw[0]  # (C, H, W)
    tmp = torch.einsum("rph,chw->rpcw", ay, f)
    return torch.einsum("rqw,rpcw->rcpq", ax, tmp)  # (R, C, OH, OH)


class RefPipeline(nn.Module):
    """Full-size reference encode path (random weights; throughput only)."""

    def __init__(self):
        super().__init__()
        from transformers import CLIPVisionConfig, CLIPVisionModel

        self.vit = CLIPVisionModel(
            CLIPVisionConfig(
                hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
                num_attention_heads=16, image_size=224, patch_size=14,
            )
        ).eval()
        self.input_convs = nn.ModuleList(nn.Conv2d(D + 2, D, 1) for _ in LEVELS)
        fcs = []
        for _ in range(NUM_FUSE):
            m = nn.Module()
            m.conv = nn.Conv2d(D, D, 3, padding=1, bias=False)
            m.gn = nn.GroupNorm(64, D)
            fcs.append(m)
        self.fuse_convs = nn.ModuleList(fcs)
        self.pconvs = nn.ModuleList(nn.Conv2d(D, D, 3, padding=1) for _ in LEVELS)
        self.pos_embedd = nn.Sequential(
            nn.Linear(4, 256), nn.ReLU(), nn.LayerNorm(256),
            nn.Linear(256, D), nn.ReLU(), nn.LayerNorm(D),
        )
        self.flatten_linear = nn.Linear(D * OH * OH, D)
        self.updims = nn.Linear(D, 4096)
        self.mm_projector = nn.Linear(D, 4096)

    def forward(self, images, boxes):
        out = self.vit(images, output_hidden_states=True)
        hs = out.hidden_states
        image_feats = self.mm_projector(hs[-2][:, 1:])
        mlvl = [h[:, 1:] for h in hs[-2::-3][:4]][::-1]
        b = images.shape[0]
        feats = [f.reshape(b, 16, 16, D).permute(0, 3, 1, 2) for f in mlvl]
        feats = [
            F.interpolate(f, size=(s, s), mode="bilinear", align_corners=True)
            for f, s in zip(feats, LEVELS)
        ]
        new = []
        for lvl, f in enumerate(feats):
            h, w = f.shape[-2:]
            xr = torch.linspace(-1, 1, w)
            yr = torch.linspace(-1, 1, h)
            yy, xx = torch.meshgrid(yr, xr, indexing="ij")
            coord = torch.stack([xx, yy]).unsqueeze(0).expand(b, -1, -1, -1)
            new.append(self.input_convs[lvl](torch.cat([f, coord], 1)))
        feats = new
        rc, sc = 512, 256
        n = len(LEVELS)
        for fc in self.fuse_convs:
            out_l = []
            for lvl in range(n):
                top, down = min(lvl + 1, n - 1), max(lvl - 1, 0)
                tar = feats[lvl]
                ft = F.interpolate(feats[top][:, rc + sc:], size=tar.shape[-2:], mode="bilinear", align_corners=True)
                fd = F.interpolate(feats[down][:, rc: rc + sc], size=tar.shape[-2:], mode="bilinear", align_corners=True)
                y = fc.conv(torch.cat([tar[:, :rc], ft, fd], 1))
                out_l.append(F.relu(fc.gn(y)))
            feats = out_l
        pos = self.pos_embedd(boxes)
        scaled = boxes * 224.0
        acc = None
        for lvl in range(n):
            rf = torch_roi_align_separable(feats[lvl], scaled, OH, 1.0 / STRIDES[lvl])
            y = self.pconvs[lvl](rf)
            acc = y if acc is None else acc + y
        fused = F.relu(acc).flatten(1)
        out = self.flatten_linear(fused) + pos
        return image_feats, self.updims(out)


def workload_flops(b):
    """Dense-matmul FLOPs of the encode path for b images, R regions each."""
    t, d, L = 257, 1024, 24
    vit = b * (L * (8 * t * d * d + 4 * t * t * d + 16 * t * d * d) * 1 + 2 * t * 3 * 14 * 14 * d)
    pos_sum = sum(s * s for s in LEVELS)
    input_conv = b * 2 * pos_sum * (D + 2) * D
    pyramid = b * NUM_FUSE * 2 * pos_sum * 9 * D * D
    pconv = b * R * len(LEVELS) * 2 * OH * OH * 9 * D * D
    flatten = b * R * 2 * (D * OH * OH) * D
    updims = b * R * 2 * D * 4096
    proj = b * 2 * 256 * D * 4096
    return vit + input_conv + pyramid + pconv + flatten + updims + proj


def main():
    torch.manual_seed(0)
    b = 1
    model = RefPipeline()
    images = torch.randn(b, 3, 224, 224)
    xy = torch.rand(R, 2) * 0.45
    wh = torch.rand(R, 2) * 0.5
    boxes = torch.cat([xy, (xy + wh + 0.05).clamp(max=1.0)], 1)

    with torch.no_grad():
        model(images, boxes)  # warmup
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            model(images, boxes)
        dt = (time.perf_counter() - t0) / n
    flops = workload_flops(b)
    cpu_pipeline_rate = flops / dt

    # CPU matmul probe (same dtype the CPU pipeline ran in)
    m = 2048
    a = torch.randn(m, m)
    bm = torch.randn(m, m)
    torch.matmul(a, bm)
    t0 = time.perf_counter()
    for _ in range(5):
        a2 = torch.matmul(a, bm)
    t_mm = (time.perf_counter() - t0) / 5
    cpu_matmul_rate = 2 * m**3 / t_mm

    eta = cpu_pipeline_rate / cpu_matmul_rate
    A100_MATMUL = 265e12  # 85% of 312 TF/s fp16 peak (generous achievable)
    batch_flops = workload_flops(8)
    a100_time = batch_flops / (eta * A100_MATMUL)
    anchored = 8 * R / a100_time

    print(json.dumps({
        "cpu_encode_s_per_image": round(dt, 3),
        "cpu_regions_per_sec": round(R / dt, 2),
        "workload_flops_per_image": flops,
        "cpu_pipeline_gflops": round(cpu_pipeline_rate / 1e9, 2),
        "cpu_matmul_gflops": round(cpu_matmul_rate / 1e9, 2),
        "eta_pipeline_efficiency": round(eta, 4),
        "a100_matmul_assumed_tflops": 265,
        "anchored_a100_regions_per_sec": round(anchored, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
