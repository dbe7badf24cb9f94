"""mmdet.models.BaseRoIExtractor shim (mmdet-2.x semantics): builds one
RoI layer per featmap stride from the roi_layer cfg dict."""

from __future__ import annotations

import torch.nn as nn

from tests.reference_shims.mmcv import ops as mmcv_ops


class BaseRoIExtractor(nn.Module):
    def __init__(self, roi_layer, out_channels, featmap_strides, init_cfg=None):
        super().__init__()
        self.out_channels = out_channels
        self.featmap_strides = featmap_strides
        self.roi_layers = self.build_roi_layers(roi_layer, featmap_strides)

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def build_roi_layers(self, layer_cfg, featmap_strides):
        cfg = dict(layer_cfg)
        layer_type = cfg.pop("type")
        assert layer_type == "RoIAlign", "shim covers GPT4RoI's config"
        return nn.ModuleList(
            mmcv_ops.RoIAlign(spatial_scale=1.0 / s, **cfg) for s in featmap_strides
        )
