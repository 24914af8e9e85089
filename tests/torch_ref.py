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


class _ResBottleneck(nn.Module):
    """Reference backbone/resnet.py Bottleneck (expansion 4)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + res)


class _ResNet101(nn.Module):
    """Reference backbone/resnet.py ResNet101: [3,4,23,3] + MG [1,2,4]."""

    def __init__(self, output_stride=16):
        super().__init__()
        if output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._stage(64, 3, strides[0], [dilations[0]] * 3)
        self.layer2 = self._stage(128, 4, strides[1], [dilations[1]] * 4)
        self.layer3 = self._stage(256, 23, strides[2], [dilations[2]] * 23)
        self.layer4 = self._stage(512, 3, strides[3], [1 * dilations[3], 2 * dilations[3], 4 * dilations[3]])

    def _stage(self, planes, blocks, stride, dils):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_ResBottleneck(self.inplanes, planes, stride, dils[0], downsample)]
        self.inplanes = planes * 4
        for i in range(1, blocks):
            layers.append(_ResBottleneck(self.inplanes, planes, 1, dils[i]))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        low = x
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x, low


class _SepConv(nn.Module):
    """Reference backbone/xception.py SeparableConv2d (pre-padded, BN
    between depthwise and pointwise)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, inplanes, 3, stride, 0, dilation, groups=inplanes, bias=False)
        self.bn = nn.BatchNorm2d(inplanes)
        self.pointwise = nn.Conv2d(inplanes, planes, 1, 1, 0, 1, 1, bias=False)

    def forward(self, x):
        k_eff = 3 + 2 * (self.conv1.dilation[0] - 1)
        pad_total = k_eff - 1
        beg = pad_total // 2
        x = F.pad(x, (beg, pad_total - beg, beg, pad_total - beg))
        return self.pointwise(self.bn(self.conv1(x)))


class _XBlock(nn.Module):
    """Reference backbone/xception.py Block (rep Sequential layout kept so
    state_dict keys match the converter's index replay)."""

    def __init__(self, inplanes, planes, reps, stride=1, dilation=1,
                 start_with_relu=True, grow_first=True, is_last=False):
        super().__init__()
        if planes != inplanes or stride != 1:
            self.skip = nn.Conv2d(inplanes, planes, 1, stride, bias=False)
            self.skipbn = nn.BatchNorm2d(planes)
        else:
            self.skip = None
        rep = []
        filters = inplanes
        if grow_first:
            rep += [nn.ReLU(), _SepConv(inplanes, planes, 1, dilation), nn.BatchNorm2d(planes)]
            filters = planes
        for _ in range(reps - 1):
            rep += [nn.ReLU(), _SepConv(filters, filters, 1, dilation), nn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [nn.ReLU(), _SepConv(inplanes, planes, 1, dilation), nn.BatchNorm2d(planes)]
        if stride != 1:
            rep += [nn.ReLU(), _SepConv(planes, planes, 2, 1), nn.BatchNorm2d(planes)]
        if stride == 1 and is_last:
            rep += [nn.ReLU(), _SepConv(planes, planes, 1, 1), nn.BatchNorm2d(planes)]
        if not start_with_relu:
            rep = rep[1:]
        self.rep = nn.Sequential(*rep)

    def forward(self, x):
        out = self.rep(x)
        skip = self.skipbn(self.skip(x)) if self.skip is not None else x
        return out + skip


class _AlignedXception(nn.Module):
    """Reference backbone/xception.py AlignedXception (entry/middle/exit)."""

    def __init__(self, output_stride=16):
        super().__init__()
        if output_stride == 16:
            entry3, mid_dil, exit_dils = 2, 1, (1, 2)
        else:
            entry3, mid_dil, exit_dils = 1, 2, (2, 4)
        self.conv1 = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.block1 = _XBlock(64, 128, 2, 2, start_with_relu=False)
        self.block2 = _XBlock(128, 256, 2, 2, start_with_relu=False, grow_first=True)
        self.block3 = _XBlock(256, 728, 2, entry3, start_with_relu=True, grow_first=True, is_last=True)
        for i in range(4, 20):
            setattr(self, f"block{i}", _XBlock(728, 728, 3, 1, mid_dil))
        self.block20 = _XBlock(728, 1024, 2, 1, exit_dils[0], True, False, True)
        self.conv3 = _SepConv(1024, 1536, 1, exit_dils[1])
        self.bn3 = nn.BatchNorm2d(1536)
        self.conv4 = _SepConv(1536, 1536, 1, exit_dils[1])
        self.bn4 = nn.BatchNorm2d(1536)
        self.conv5 = _SepConv(1536, 2048, 1, exit_dils[1])
        self.bn5 = nn.BatchNorm2d(2048)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.block1(x)
        x = F.relu(x)
        low = x
        x = self.block2(x)
        x = self.block3(x)
        for i in range(4, 21):
            x = getattr(self, f"block{i}")(x)
        x = F.relu(x)
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.relu(self.bn4(self.conv4(x)))
        x = F.relu(self.bn5(self.conv5(x)))
        return x, low


class _DRN_D54(nn.Module):
    """Reference backbone/drn.py DRN(Bottleneck, [1,1,3,4,6,3,1,1], 'D')."""

    def __init__(self):
        super().__init__()
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        self.inplanes = ch[0]
        self.layer0 = nn.Sequential(
            nn.Conv2d(3, ch[0], 7, 1, 3, bias=False), nn.BatchNorm2d(ch[0]), nn.ReLU()
        )
        self.layer1 = self._convs(ch[0], 1, 1, 1)
        self.layer2 = self._convs(ch[1], 1, 2, 1)
        self.layer3 = self._bottles(ch[2], 3, 2, (1, 1))
        self.layer4 = self._bottles(ch[3], 4, 2, (1, 1))
        self.layer5 = self._bottles(ch[4], 6, 1, (2, 2))
        self.layer6 = self._bottles(ch[5], 3, 1, (4, 4))
        self.layer7 = self._convs(ch[6], 1, 1, 2)
        self.layer8 = self._convs(ch[7], 1, 1, 1)

    def _convs(self, channels, convs, stride, dilation):
        mods = []
        for i in range(convs):
            mods += [
                nn.Conv2d(self.inplanes, channels, 3, stride if i == 0 else 1,
                          dilation, dilation, bias=False),
                nn.BatchNorm2d(channels), nn.ReLU(),
            ]
            self.inplanes = channels
        return nn.Sequential(*mods)

    def _bottles(self, planes, blocks, stride, dil):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_ResBottleneck(self.inplanes, planes, stride, dil[1], downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_ResBottleneck(self.inplanes, planes, 1, dil[1]))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.layer0(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        low = x
        x = self.layer4(x)
        x = self.layer5(x)
        x = self.layer6(x)
        x = self.layer7(x)
        x = self.layer8(x)
        return x, low


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
    def __init__(self, num_classes=2, low_level_inplanes=24):
        super().__init__()
        self.conv1 = nn.Conv2d(low_level_inplanes, 48, 1, bias=False)
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


_BACKBONES = {
    # ctor, aspp inplanes, decoder low-level channels (reference
    # aspp.py:8-15 / decoder.py:10-17 dispatch)
    "mobilenet": (lambda os_: _MobileNetV2(os_), 320, 24),
    "resnet": (lambda os_: _ResNet101(os_), 2048, 256),
    "xception": (lambda os_: _AlignedXception(os_), 2048, 128),
    "drn": (lambda os_: _DRN_D54(), 512, 256),
}


class TorchDeepLab(nn.Module):
    def __init__(self, num_classes=2, output_stride=16, backbone="mobilenet"):
        super().__init__()
        if backbone == "drn":
            output_stride = 8  # reference deeplabv3.py:14-15
        ctor, aspp_in, low_ch = _BACKBONES[backbone]
        self.backbone = ctor(output_stride)
        self.aspp = _ASPP(aspp_in, output_stride)
        self.decoder = _Decoder(num_classes, low_ch)

    def forward(self, x):
        high, low = self.backbone(x)
        feat = self.aspp(high)
        x1, boundary, x_bu, x_feat = self.decoder(feat, low)
        up = lambda t: F.interpolate(t, size=x.shape[2:], mode="bilinear", align_corners=True)
        return up(x1), up(boundary), feat, x_bu, x_feat, x1, boundary
