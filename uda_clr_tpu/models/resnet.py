"""ResNet-101 backbone with multi-grid atrous last stage
(reference networks/backbone/resnet.py: Bottleneck stack [3,4,23,3],
multi-grid rates [1,2,4] in layer4, OS16 strides [1,2,2,1] /
dilations [1,1,1,2]; OS8 [1,2,1,1] / [1,1,2,4]; low-level tap after
layer1, 256ch)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d
from uda_clr_tpu.models.norm import DomainNorm2d


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2, padding=1) in NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        p = self.planes
        h = Conv2d(p, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = DomainNorm2d(p, self.norm, dtype=self.dtype, name="bn1")(h, train, domains)
        h = nn.relu(h)
        h = Conv2d(p, 3, self.stride, self.dilation, dilation=self.dilation,
                   use_bias=False, dtype=self.dtype, name="conv2")(h)
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


class ResNet101(nn.Module):
    output_stride: int = 16
    norm: str = "bn"
    dtype: Any = jnp.float32
    remat: bool = False  # per-block jax.checkpoint (see MobileNetV2.remat)

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2, 3))
            if self.remat else Bottleneck
        )
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError

        h = Conv2d(64, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = DomainNorm2d(64, self.norm, dtype=self.dtype, name="bn1")(h, train, domains)
        h = nn.relu(h)
        h = max_pool_3x3_s2(h)

        def stage(h, name, planes, blocks, stride, dilation, in_ch, mg=None):
            rates = mg or [1] * blocks
            for i in range(blocks):
                s = stride if i == 0 else 1
                d = rates[i] * dilation
                down = i == 0 and (stride != 1 or in_ch != planes * 4)
                h = block_cls(planes, s, d, down, self.norm, self.dtype,
                              name=f"{name}_{i}")(h, train, domains)
            return h

        h = stage(h, "layer1", 64, 3, strides[0], dilations[0], 64)
        low_level = h  # [B, H/4, W/4, 256]
        h = stage(h, "layer2", 128, 4, strides[1], dilations[1], 256)
        h = stage(h, "layer3", 256, 23, strides[2], dilations[2], 512)
        # multi-grid unit: 3 blocks with rates [1,2,4] * base dilation
        h = stage(h, "layer4", 512, 3, strides[3], dilations[3], 1024, mg=[1, 2, 4])
        return h, low_level
