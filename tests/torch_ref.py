"""Test-only torch transcription of the reference DeepLab architecture
(networks/deeplabv3.py + backbone/mobilenet.py + aspp.py + decoder.py),
used as the numerical-parity oracle for the JAX model + weight converter.

Module naming deliberately reproduces the reference's state_dict key
layout (``backbone.features.N...``, ``aspp.asppK...``,
``decoder.last_conv...``) so `convert_deeplab_state_dict` can be validated
end-to-end against a real torch forward.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv_bn(inp, oup, stride):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False), nn.BatchNorm2d(oup), nn.ReLU6(inplace=True)
    )


class _InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, dilation, expand_ratio):
        super().__init__()
        hidden = round(inp * expand_ratio)
        self.stride = stride
        self.dilation = dilation
        self.use_res = stride == 1 and inp == oup
        if expand_ratio == 1:
            self.conv = nn.Sequential(
                nn.Conv2d(hidden, hidden, 3, stride, 0, dilation, groups=hidden, bias=False),
                nn.BatchNorm2d(hidden),
                nn.ReLU6(inplace=True),
                nn.Conv2d(hidden, oup, 1, 1, 0, 1, 1, bias=False),
                nn.BatchNorm2d(oup),
            )
        else:
            self.conv = nn.Sequential(
                nn.Conv2d(inp, hidden, 1, 1, 0, 1, bias=False),
                nn.BatchNorm2d(hidden),
                nn.ReLU6(inplace=True),
                nn.Conv2d(hidden, hidden, 3, stride, 0, dilation, groups=hidden, bias=False),
                nn.BatchNorm2d(hidden),
                nn.ReLU6(inplace=True),
                nn.Conv2d(hidden, oup, 1, 1, 0, 1, bias=False),
                nn.BatchNorm2d(oup),
            )

    def forward(self, x):
        k_eff = 3 + 2 * (self.dilation - 1)
        pad_total = k_eff - 1
        beg = pad_total // 2
        x_pad = F.pad(x, (beg, pad_total - beg, beg, pad_total - beg))
        return x + self.conv(x_pad) if self.use_res else self.conv(x_pad)


class _MobileNetV2(nn.Module):
    def __init__(self, output_stride=16):
        super().__init__()
        from uda_clr_tpu.models.mobilenet import mobilenet_block_plan

        feats = [_conv_bn(3, 32, 2)]
        for cin, cout, stride, dil, t in mobilenet_block_plan(output_stride):
            feats.append(_InvertedResidual(cin, cout, stride, dil, t))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        low = self.features[0:4](x)
        return self.features[4:](low), low


class _ASPPModule(nn.Module):
    def __init__(self, inplanes, planes, kernel_size, padding, dilation):
        super().__init__()
        self.atrous_conv = nn.Conv2d(
            inplanes, planes, kernel_size, 1, padding, dilation, bias=False
        )
        self.bn = nn.BatchNorm2d(planes)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class _ASPP(nn.Module):
    def __init__(self, inplanes=320, output_stride=16):
        super().__init__()
        d = (1, 6, 12, 18) if output_stride == 16 else (1, 12, 24, 36)
        self.aspp1 = _ASPPModule(inplanes, 256, 1, 0, d[0])
        self.aspp2 = _ASPPModule(inplanes, 256, 3, d[1], d[1])
        self.aspp3 = _ASPPModule(inplanes, 256, 3, d[2], d[2])
        self.aspp4 = _ASPPModule(inplanes, 256, 3, d[3], d[3])
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(inplanes, 256, 1, bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU(),
        )
        self.conv1 = nn.Conv2d(1280, 256, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(256)
        self.dropout = nn.Dropout(0.5)

    def forward(self, x):
        xs = [self.aspp1(x), self.aspp2(x), self.aspp3(x), self.aspp4(x)]
        x5 = self.global_avg_pool(x)
        x5 = F.interpolate(x5, size=xs[0].shape[2:], mode="bilinear", align_corners=True)
        h = torch.cat(xs + [x5], dim=1)
        return self.dropout(F.relu(self.bn1(self.conv1(h))))


class _Decoder(nn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.conv1 = nn.Conv2d(24, 48, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(48)
        self.last_conv = nn.Sequential(
            nn.BatchNorm2d(305), nn.ReLU(), nn.Dropout(0.1), nn.Conv2d(305, num_classes, 1)
        )
        self.last_conv_boundary = nn.Sequential(
            nn.Conv2d(304, 256, 3, 1, 1, bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU(),
            nn.Dropout(0.5),
            nn.Conv2d(256, 256, 3, 1, 1, bias=False),
            nn.BatchNorm2d(256),
            nn.ReLU(),
            nn.Dropout(0.1),
            nn.Conv2d(256, 1, 1),
        )

    def forward(self, x, low):
        low = F.relu(self.bn1(self.conv1(low)))
        x = F.interpolate(x, size=low.shape[2:], mode="bilinear", align_corners=True)
        x_bu = torch.cat((x, low), dim=1)
        boundary = self.last_conv_boundary(x_bu)
        x_feat = torch.cat([x_bu, boundary], 1)
        x1 = self.last_conv(x_feat)
        return x1, boundary, x_bu, x_feat


class TorchDeepLab(nn.Module):
    def __init__(self, num_classes=2, output_stride=16):
        super().__init__()
        self.backbone = _MobileNetV2(output_stride)
        self.aspp = _ASPP(320, output_stride)
        self.decoder = _Decoder(num_classes)

    def forward(self, x):
        high, low = self.backbone(x)
        feat = self.aspp(high)
        x1, boundary, x_bu, x_feat = self.decoder(feat, low)
        up = lambda t: F.interpolate(t, size=x.shape[2:], mode="bilinear", align_corners=True)
        return up(x1), up(boundary), feat, x_bu, x_feat, x1, boundary
