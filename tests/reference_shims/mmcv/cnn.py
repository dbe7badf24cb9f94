"""mmcv.cnn shim: ConvModule / Linear / normal_init (mmcv-1.4.7 semantics)."""

from __future__ import annotations

import torch.nn as nn

Linear = nn.Linear


def normal_init(module, mean=0.0, std=1.0, bias=0.0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class ConvModule(nn.Module):
    """conv -> norm -> act with mmcv's rules: bias='auto' disables the conv
    bias when a norm follows; the norm submodule is registered under its
    type name ('gn' for GroupNorm) so state_dict keys match mmcv's."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups=1,
        bias="auto",
        conv_cfg=None,
        norm_cfg=None,
        act_cfg=dict(type="ReLU"),
        inplace=True,
        order=("conv", "norm", "act"),
    ):
        super().__init__()
        assert conv_cfg is None, "shim supports plain Conv2d only"
        self.order = order
        with_norm = norm_cfg is not None
        if bias == "auto":
            bias = not with_norm
        self.conv = nn.Conv2d(
            in_channels, out_channels, kernel_size,
            stride=stride, padding=padding, dilation=dilation,
            groups=groups, bias=bias,
        )
        self.norm_name = None
        if with_norm:
            assert norm_cfg["type"] == "GN", "shim supports GN only"
            norm = nn.GroupNorm(norm_cfg["num_groups"], out_channels)
            self.norm_name = "gn"
            self.add_module(self.norm_name, norm)
        self.with_activation = act_cfg is not None
        if self.with_activation:
            assert act_cfg["type"] == "ReLU"
            self.activate = nn.ReLU(inplace=inplace)
        # mmcv init: kaiming for conv (nonlinearity per act), constant for norm
        nn.init.kaiming_normal_(self.conv.weight, mode="fan_out", nonlinearity="relu")
        if self.conv.bias is not None:
            nn.init.constant_(self.conv.bias, 0)
        if self.norm_name:
            nn.init.constant_(getattr(self, self.norm_name).weight, 1)
            nn.init.constant_(getattr(self, self.norm_name).bias, 0)

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.norm_name else None

    def forward(self, x):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and self.norm_name:
                x = getattr(self, self.norm_name)(x)
            elif layer == "act" and self.with_activation:
                x = self.activate(x)
        return x
