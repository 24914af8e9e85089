"""Modified Aligned Xception backbone (reference
networks/backbone/xception.py): entry flow (conv stem + 3 strided blocks),
16-block middle flow at 728ch, exit flow block + 3 dilated separable convs
to 2048ch. Separable convs pre-pad via fixed_padding and carry a BN between
the depthwise and pointwise convs (:17-31). Low-level tap = relu(block1),
128ch (:185-188)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d, fixed_padding
from uda_clr_tpu.models.norm import DomainNorm2d


class SeparableConv2d(nn.Module):
    in_features: int
    features: int
    stride: int = 1
    dilation: int = 1
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        h = fixed_padding(x, 3, self.dilation)
        h = Conv2d(self.in_features, 3, self.stride, 0, dilation=self.dilation,
                   groups=self.in_features, use_bias=False, dtype=self.dtype,
                   name="depthwise")(h)
        h = DomainNorm2d(self.in_features, self.norm, dtype=self.dtype, name="bn")(
            h, train, domains
        )
        return Conv2d(self.features, 1, 1, 0, use_bias=False, dtype=self.dtype,
                      name="pointwise")(h)


class XceptionBlock(nn.Module):
    in_features: int
    features: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        sep = lambda cin, cout, stride, dil, name: (
            lambda h: DomainNorm2d(cout, self.norm, dtype=self.dtype, name=f"{name}_bn")(
                SeparableConv2d(cin, cout, stride, dil, self.norm, self.dtype, name=name)(
                    h, train, domains
                ),
                train,
                domains,
            )
        )
        h = x
        first = True
        filters = self.in_features

        def maybe_relu(h, first):
            # start_with_relu=False drops only the first ReLU (reference
            # Block trims rep[0], :74-75)
            if first and not self.start_with_relu:
                return h
            return nn.relu(h)

        idx = 0
        if self.grow_first:
            h = maybe_relu(h, first)
            first = False
            h = sep(filters, self.features, 1, self.dilation, f"sep{idx}")(h)
            idx += 1
            filters = self.features
        for _ in range(self.reps - 1):
            h = maybe_relu(h, first)
            first = False
            h = sep(filters, filters, 1, self.dilation, f"sep{idx}")(h)
            idx += 1
        if not self.grow_first:
            h = maybe_relu(h, first)
            first = False
            h = sep(self.in_features, self.features, 1, self.dilation, f"sep{idx}")(h)
            idx += 1
        if self.stride != 1:
            h = nn.relu(h)
            h = sep(self.features, self.features, 2, 1, f"sep{idx}")(h)
            idx += 1
        if self.stride == 1 and self.is_last:
            h = nn.relu(h)
            h = sep(self.features, self.features, 1, 1, f"sep{idx}")(h)
            idx += 1

        if self.features != self.in_features or self.stride != 1:
            skip = Conv2d(self.features, 1, self.stride, 0, use_bias=False,
                          dtype=self.dtype, name="skip")(x)
            skip = DomainNorm2d(self.features, self.norm, dtype=self.dtype,
                                name="skip_bn")(skip, train, domains)
        else:
            skip = x
        return h + skip


class AlignedXception(nn.Module):
    output_stride: int = 16
    norm: str = "bn"
    dtype: Any = jnp.float32
    remat: bool = False  # per-block jax.checkpoint (see MobileNetV2.remat)

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        block_cls = (
            nn.remat(XceptionBlock, static_argnums=(2, 3))
            if self.remat else XceptionBlock
        )
        if self.output_stride == 16:
            entry3_stride, mid_dil, exit_dils = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, mid_dil, exit_dils = 1, 2, (2, 4)
        else:
            raise NotImplementedError

        nrm = lambda f, name: DomainNorm2d(f, self.norm, dtype=self.dtype, name=name)
        h = Conv2d(32, 3, 2, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nrm(32, "bn1")(h, train, domains))
        h = Conv2d(64, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(nrm(64, "bn2")(h, train, domains))

        h = block_cls(64, 128, 2, 2, 1, False, True, False, self.norm, self.dtype,
                          name="block1")(h, train, domains)
        h = nn.relu(h)
        low_level = h  # 128ch @ 1/4
        h = block_cls(128, 256, 2, 2, 1, False, True, False, self.norm, self.dtype,
                          name="block2")(h, train, domains)
        h = block_cls(256, 728, 2, entry3_stride, 1, True, True, True, self.norm,
                          self.dtype, name="block3")(h, train, domains)
        for i in range(4, 20):
            h = block_cls(728, 728, 3, 1, mid_dil, True, True, False, self.norm,
                              self.dtype, name=f"block{i}")(h, train, domains)
        h = block_cls(728, 1024, 2, 1, exit_dils[0], True, False, True, self.norm,
                          self.dtype, name="block20")(h, train, domains)
        h = nn.relu(h)
        h = SeparableConv2d(1024, 1536, 1, exit_dils[1], self.norm, self.dtype,
                            name="conv3")(h, train, domains)
        h = nn.relu(nrm(1536, "bn3")(h, train, domains))
        h = SeparableConv2d(1536, 1536, 1, exit_dils[1], self.norm, self.dtype,
                            name="conv4")(h, train, domains)
        h = nn.relu(nrm(1536, "bn4")(h, train, domains))
        h = SeparableConv2d(1536, 2048, 1, exit_dils[1], self.norm, self.dtype,
                            name="conv5")(h, train, domains)
        h = nn.relu(nrm(2048, "bn5")(h, train, domains))
        return h, low_level
