"""Dual-head (mask + boundary) DeepLab decoder (reference networks/decoder.py).

Faithful oddities preserved:
  * the mask head has *no* conv before its BN — it is BN(305) + ReLU +
    Dropout(0.1) + 1x1 conv (decoder.py:23-32, the 304->256 conv stack is
    commented out in the reference);
  * the boundary logit map is concatenated back onto the features to form
    the 305-channel ``x_feature`` the prototype losses pool over
    (decoder.py:53).
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

    @nn.compact
    def __call__(self, x, low_level_feat, train: bool, domains: int = 1):
        ll = Conv2d(48, 1, 1, 0, use_bias=False, dtype=self.dtype, name="low_conv")(low_level_feat)
        ll = DomainNorm2d(48, self.norm, dtype=self.dtype, name="low_bn")(ll, train, domains)
        ll = nn.relu(ll)

        x = resize_bilinear_align_corners(x, (ll.shape[1], ll.shape[2]))
        x_bu_feature = jnp.concatenate([x, ll], axis=-1)  # [B,128,128,304]

        # boundary head: 3x3x256 x2 + 1x1 -> 1 (decoder.py:33-41)
        b = Conv2d(256, 3, 1, 1, use_bias=False, dtype=self.dtype, name="bound_conv1")(x_bu_feature)
        b = DomainNorm2d(256, self.norm, dtype=self.dtype, name="bound_bn1")(b, train, domains)
        b = nn.relu(b)
        b = TpuDropout(0.5, name="bound_drop1")(b, deterministic=not train)
        b = Conv2d(256, 3, 1, 1, use_bias=False, dtype=self.dtype, name="bound_conv2")(b)
        b = DomainNorm2d(256, self.norm, dtype=self.dtype, name="bound_bn2")(b, train, domains)
        b = nn.relu(b)
        b = TpuDropout(0.1, name="bound_drop2")(b, deterministic=not train)
        boundary = Conv2d(1, 1, 1, 0, use_bias=True, dtype=self.dtype, name="bound_out")(b)

        x_feature = jnp.concatenate([x_bu_feature, boundary], axis=-1)  # [B,128,128,305]

        # mask head: BN(305)+ReLU+Dropout(0.1)+1x1 (decoder.py:23-32)
        h = DomainNorm2d(305, self.norm, dtype=self.dtype, name="mask_bn")(x_feature, train, domains)
        h = nn.relu(h)
        h = TpuDropout(0.1, name="mask_drop")(h, deterministic=not train)
        x1 = Conv2d(self.num_classes, 1, 1, 0, use_bias=True, dtype=self.dtype, name="mask_out")(h)

        return x1, boundary, x_bu_feature, x_feature
