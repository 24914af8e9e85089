"""DRN-D-54 backbone (reference networks/backbone/drn.py:102-230,377-384):
arch 'D' — plain-conv layers 0-2, Bottleneck layers 3-6 with dilations
(1,1,2,4-style schedule), plain dilated conv layers 7-8; channels
(16,32,64,128,256,512,512,512), block counts [1,1,3,4,6,3,1,1]. Output
512ch at stride 8 (DeepLab forces OS=8 for drn — deeplabv3.py:14-15);
low-level tap = layer3 output, 256ch @ 1/4."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d
from uda_clr_tpu.models.norm import DomainNorm2d


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: tuple = (1, 1)
    downsample: bool = False
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        p = self.planes
        h = Conv2d(p, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = DomainNorm2d(p, self.norm, dtype=self.dtype, name="bn1")(h, train, domains)
        h = nn.relu(h)
        d = self.dilation[1]
        h = Conv2d(p, 3, self.stride, d, dilation=d, use_bias=False, dtype=self.dtype,
                   name="conv2")(h)
        h = DomainNorm2d(p, self.norm, dtype=self.dtype, name="bn2")(h, train, domains)
        h = nn.relu(h)
        h = Conv2d(p * 4, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = DomainNorm2d(p * 4, self.norm, dtype=self.dtype, name="bn3")(h, train, domains)
        if self.downsample:
            res = Conv2d(p * 4, 1, self.stride, 0, use_bias=False, dtype=self.dtype,
                         name="down_conv")(x)
            res = DomainNorm2d(p * 4, self.norm, dtype=self.dtype, name="down_bn")(
                res, train, domains
            )
        else:
            res = x
        return nn.relu(h + res)


class DRN_D_54(nn.Module):
    norm: str = "bn"
    dtype: Any = jnp.float32
    remat: bool = False  # per-block jax.checkpoint (see MobileNetV2.remat)

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        block_cls = (
            nn.remat(_Bottleneck, static_argnums=(2, 3))
            if self.remat else _Bottleneck
        )
        channels = (16, 32, 64, 128, 256, 512, 512, 512)
        layers = (1, 1, 3, 4, 6, 3, 1, 1)
        nrm = lambda f, name: DomainNorm2d(f, self.norm, dtype=self.dtype, name=name)

        def conv_layers(h, ch, convs, stride, dilation, name):
            for i in range(convs):
                h = Conv2d(ch, 3, stride if i == 0 else 1, dilation, dilation=dilation,
                           use_bias=False, dtype=self.dtype, name=f"{name}_conv{i}")(h)
                h = nn.relu(nrm(ch, f"{name}_bn{i}")(h, train, domains))
            return h

        def bottleneck_stage(h, in_ch, planes, blocks, stride, dil_pair, name):
            for i in range(blocks):
                s = stride if i == 0 else 1
                d = dil_pair if i == 0 else (dil_pair[1], dil_pair[1])
                down = i == 0 and (stride != 1 or in_ch != planes * 4)
                h = block_cls(planes, s, d, down, self.norm, self.dtype,
                              name=f"{name}_{i}")(h, train, domains)
                in_ch = planes * 4
            return h

        # layer0: 7x7 s1 stem
        h = Conv2d(channels[0], 7, 1, 3, use_bias=False, dtype=self.dtype,
                   name="layer0_conv")(x)
        h = nn.relu(nrm(channels[0], "layer0_bn")(h, train, domains))
        h = conv_layers(h, channels[0], layers[0], 1, 1, "layer1")
        h = conv_layers(h, channels[1], layers[1], 2, 1, "layer2")
        h = bottleneck_stage(h, channels[1], channels[2], layers[2], 2, (1, 1), "layer3")
        low_level = h  # 256ch @ 1/4
        h = bottleneck_stage(h, channels[2] * 4, channels[3], layers[3], 2, (1, 1), "layer4")
        # layer5: dilation 2, new_level=False -> (2,2); layer6: 4 -> (4,4)
        h = bottleneck_stage(h, channels[3] * 4, channels[4], layers[4], 1, (2, 2), "layer5")
        h = bottleneck_stage(h, channels[4] * 4, channels[5], layers[5], 1, (4, 4), "layer6")
        h = conv_layers(h, channels[6], layers[6], 1, 2, "layer7")
        h = conv_layers(h, channels[7], layers[7], 1, 1, "layer8")
        return h, low_level
