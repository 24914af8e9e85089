"""ASPP atrous pyramid (reference networks/aspp.py:34-95)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d, TpuDropout
from uda_clr_tpu.models.norm import DomainNorm2d
from uda_clr_tpu.ops.resize import resize_bilinear_align_corners


class _ASPPBranch(nn.Module):
    features: int
    kernel_size: int
    dilation: int
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool, domains: int = 1):
        pad = 0 if self.kernel_size == 1 else self.dilation
        h = Conv2d(
            self.features, self.kernel_size, 1, pad, dilation=self.dilation,
            use_bias=False, dtype=self.dtype, name="atrous_conv",
        )(x)
        h = DomainNorm2d(self.features, self.norm, dtype=self.dtype, name="bn")(h, train, domains)
        return nn.relu(h)


class ASPP(nn.Module):
    """4 atrous branches + image-level pooling, concat -> 1x1 -> 256.

    Dilations [1,6,12,18] at OS16, [1,12,24,36] at OS8 (aspp.py:43-48).
    The pooled branch is broadcast back with align-corners bilinear
    (aspp.py:70-71); Dropout(0.5) on the output (aspp.py:62,78).

    Split into ``predrop`` (everything deterministic) + ``drop`` (the final
    dropout) so the MC fast path can run the deterministic part ONCE at
    batch B and replicate before sampling (train/steps.py) — BN moments
    over T identical copies equal the per-batch moments, so the split is
    bit-identical to running the whole module on the replicated batch.
    """

    output_stride: int = 16
    norm: str = "bn"
    dtype: Any = jnp.float32

    def setup(self):
        if self.output_stride == 16:
            dilations = (1, 6, 12, 18)
        elif self.output_stride == 8:
            dilations = (1, 12, 24, 36)
        else:
            raise NotImplementedError(f"output_stride {self.output_stride}")
        self.aspp1 = _ASPPBranch(256, 1, dilations[0], self.norm, self.dtype)
        self.aspp2 = _ASPPBranch(256, 3, dilations[1], self.norm, self.dtype)
        self.aspp3 = _ASPPBranch(256, 3, dilations[2], self.norm, self.dtype)
        self.aspp4 = _ASPPBranch(256, 3, dilations[3], self.norm, self.dtype)
        self.gap_conv = Conv2d(256, 1, 1, 0, use_bias=False, dtype=self.dtype)
        self.gap_bn = DomainNorm2d(256, self.norm, dtype=self.dtype)
        self.proj_conv = Conv2d(256, 1, 1, 0, use_bias=False, dtype=self.dtype)
        self.proj_bn = DomainNorm2d(256, self.norm, dtype=self.dtype)
        self.dropout = TpuDropout(0.5)

    def predrop(self, x, train: bool, domains: int = 1):
        """All of ASPP except the final Dropout(0.5)."""
        b1 = self.aspp1(x, train, domains)
        b2 = self.aspp2(x, train, domains)
        b3 = self.aspp3(x, train, domains)
        b4 = self.aspp4(x, train, domains)

        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = self.gap_conv(pooled)
        pooled = self.gap_bn(pooled, train, domains)
        pooled = nn.relu(pooled)
        b5 = resize_bilinear_align_corners(pooled, (x.shape[1], x.shape[2]))

        h = jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)
        h = self.proj_conv(h)
        h = self.proj_bn(h, train, domains)
        return nn.relu(h)

    def drop(self, h, train: bool):
        return self.dropout(h, deterministic=not train)

    def __call__(self, x, train: bool, domains: int = 1):
        return self.drop(self.predrop(x, train, domains), train)
