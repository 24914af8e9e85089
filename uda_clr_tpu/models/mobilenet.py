"""MobileNetV2 backbone (inverted residuals, atrous last stages), NHWC.

Behavioural spec from reference networks/backbone/mobilenet.py:
  * stem conv 3x3 s2 p1 + BN + ReLU6 (conv_bn, :8-13);
  * inverted-residual settings table (:77-86) with the DeepLab atrous
    adaptation: once the cumulative stride reaches ``output_stride`` blocks
    switch to stride 1 and the dilation rate multiplies (:93-108);
  * every block pre-pads its input via fixed_padding (:16-22,61-67), so the
    expansion conv + BN see the padded border — replicated exactly;
  * low-level taps after the first 4 feature stages (24ch @ 1/4 res),
    high-level output 320ch (:116-122).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d, fixed_padding, relu6
from uda_clr_tpu.models.norm import DomainNorm2d

# (expand_ratio t, channels c, repeats n, stride s)
_INVERTED_RESIDUAL_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class InvertedResidual(nn.Module):
    in_features: int
    features: int
    stride: int
    dilation: int
    expand_ratio: int
    norm: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, domains: int = 1) -> jnp.ndarray:
        hidden = round(self.in_features * self.expand_ratio)
        use_res = self.stride == 1 and self.in_features == self.features
        h = fixed_padding(x, 3, self.dilation)
        if self.expand_ratio != 1:
            h = Conv2d(hidden, 1, 1, 0, use_bias=False, dtype=self.dtype, name="expand")(h)
            h = DomainNorm2d(hidden, self.norm, dtype=self.dtype, name="expand_bn")(h, train, domains)
            h = relu6(h)
        h = Conv2d(
            hidden, 3, self.stride, 0, dilation=self.dilation, groups=hidden,
            use_bias=False, dtype=self.dtype, name="depthwise",
        )(h)
        h = DomainNorm2d(hidden, self.norm, dtype=self.dtype, name="depthwise_bn")(h, train, domains)
        h = relu6(h)
        h = Conv2d(self.features, 1, 1, 0, use_bias=False, dtype=self.dtype, name="project")(h)
        h = DomainNorm2d(self.features, self.norm, dtype=self.dtype, name="project_bn")(h, train, domains)
        if use_res:
            h = x + h
        return h


def mobilenet_block_plan(output_stride: int = 16):
    """Expand the settings table into per-block (in, out, stride, dilation, t).

    Mirrors the reference's stride/dilation bookkeeping
    (backbone/mobilenet.py:93-108) — notably ``dilation = rate`` is read
    *before* ``rate *= s``, so the first atrous stage keeps dilation 1.
    """
    plan = []
    in_ch = 32
    current_stride = 2  # after the stem conv
    rate = 1
    for t, c, n, s in _INVERTED_RESIDUAL_SETTINGS:
        if current_stride == output_stride:
            stride, dilation = 1, rate
            rate *= s
        else:
            stride, dilation = s, 1
            current_stride *= s
        for i in range(n):
            plan.append((in_ch, c, stride if i == 0 else 1, dilation, t))
            in_ch = c
    return plan


class MobileNetV2(nn.Module):
    """Returns (high_level [B,H/os,W/os,320], low_level [B,H/4,W/4,24]).

    ``remat=True`` wraps every inverted-residual block in ``nn.remat``
    (jax.checkpoint): only the inter-block activations are saved for the
    backward pass and the intra-block ones are recomputed — the TPU
    HBM/FLOP tradeoff that admits larger per-chip batches. Parameter
    tree, outputs and batch-stat updates are bit-identical; gradients
    agree to fp32-reassociation level (tests/test_remat.py)."""

    output_stride: int = 16
    norm: str = "bn"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, domains: int = 1):
        block_cls = (
            nn.remat(InvertedResidual, static_argnums=(2, 3))
            if self.remat else InvertedResidual
        )
        h = Conv2d(32, 3, 2, 1, use_bias=False, dtype=self.dtype, name="stem")(x)
        h = DomainNorm2d(32, self.norm, dtype=self.dtype, name="stem_bn")(h, train, domains)
        h = relu6(h)
        low_level = None
        for idx, (cin, cout, stride, dilation, t) in enumerate(
            mobilenet_block_plan(self.output_stride)
        ):
            h = block_cls(
                cin, cout, stride, dilation, t,
                norm=self.norm, dtype=self.dtype, name=f"block_{idx}",
            )(h, train, domains)
            # low-level tap = output of torch features[0:4] = stem + blocks 0-2
            if idx == 2:
                low_level = h
        return h, low_level
