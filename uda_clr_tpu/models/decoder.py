"""Dual-head (mask + boundary) DeepLab decoder (reference networks/decoder.py).

Faithful oddities preserved:
  * the mask head has *no* conv before its BN — it is BN(305) + ReLU +
    Dropout(0.1) + 1x1 conv (decoder.py:23-32, the 304->256 conv stack is
    commented out in the reference);
  * the boundary logit map is concatenated back onto the features to form
    the 305-channel ``x_feature`` the prototype losses pool over
    (decoder.py:53).

Split into ``low_prefix`` (the deterministic low-level projection) and
``suffix`` (upsample + both heads, all the dropout) so the MC fast path
can run the prefix ONCE at batch B and replicate (train/steps.py); the
split is bit-identical — see models/aspp.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d, TpuDropout
from uda_clr_tpu.models.norm import DomainNorm2d
from uda_clr_tpu.ops.resize import resize_bilinear_align_corners


class Decoder(nn.Module):
    num_classes: int = 2
    low_level_features: int = 24  # mobilenet; 256 resnet/drn, 128 xception
    norm: str = "bn"
    dtype: Any = jnp.float32

    def setup(self):
        self.low_conv = Conv2d(48, 1, 1, 0, use_bias=False, dtype=self.dtype)
        self.low_bn = DomainNorm2d(48, self.norm, dtype=self.dtype)
        self.bound_conv1 = Conv2d(256, 3, 1, 1, use_bias=False, dtype=self.dtype)
        self.bound_bn1 = DomainNorm2d(256, self.norm, dtype=self.dtype)
        self.bound_drop1 = TpuDropout(0.5)
        self.bound_conv2 = Conv2d(256, 3, 1, 1, use_bias=False, dtype=self.dtype)
        self.bound_bn2 = DomainNorm2d(256, self.norm, dtype=self.dtype)
        self.bound_drop2 = TpuDropout(0.1)
        self.bound_out = Conv2d(1, 1, 1, 0, use_bias=True, dtype=self.dtype)
        self.mask_bn = DomainNorm2d(305, self.norm, dtype=self.dtype)
        self.mask_drop = TpuDropout(0.1)
        self.mask_out = Conv2d(self.num_classes, 1, 1, 0, use_bias=True, dtype=self.dtype)

    def low_prefix(self, low_level_feat, train: bool, domains: int = 1):
        """Deterministic low-level projection (conv1+bn1+relu)."""
        ll = self.low_conv(low_level_feat)
        ll = self.low_bn(ll, train, domains)
        return nn.relu(ll)

    def suffix_bound(self, x, ll, train: bool, domains: int = 1):
        """Upsample + concat + the boundary head — everything the mask
        head consumes. Split out so the MC fast path can replace the mask
        head with the fused Pallas epilogue (ops/pallas/mask_head.py)."""
        x = resize_bilinear_align_corners(x, (ll.shape[1], ll.shape[2]))
        x_bu_feature = jnp.concatenate([x, ll], axis=-1)  # [B,128,128,304]

        # boundary head: 3x3x256 x2 + 1x1 -> 1 (decoder.py:33-41)
        b = self.bound_conv1(x_bu_feature)
        b = self.bound_bn1(b, train, domains)
        b = nn.relu(b)
        b = self.bound_drop1(b, deterministic=not train)
        b = self.bound_conv2(b)
        b = self.bound_bn2(b, train, domains)
        b = nn.relu(b)
        b = self.bound_drop2(b, deterministic=not train)
        boundary = self.bound_out(b)
        return x_bu_feature, boundary

    def suffix(self, x, ll, train: bool, domains: int = 1):
        """Upsample + boundary head + mask head (all the dropout sites).
        ``x`` is the (possibly already dropout-sampled) ASPP output."""
        x_bu_feature, boundary = self.suffix_bound(x, ll, train, domains)

        x_feature = jnp.concatenate([x_bu_feature, boundary], axis=-1)  # [B,128,128,305]

        # mask head: BN(305)+ReLU+Dropout(0.1)+1x1 (decoder.py:23-32)
        h = self.mask_bn(x_feature, train, domains)
        h = nn.relu(h)
        h = self.mask_drop(h, deterministic=not train)
        x1 = self.mask_out(h)

        return x1, boundary, x_bu_feature, x_feature

    def __call__(self, x, low_level_feat, train: bool, domains: int = 1):
        ll = self.low_prefix(low_level_feat, train, domains)
        return self.suffix(x, ll, train, domains)
