"""PatchGAN discriminators (reference networks/GAN.py).

All conv discriminators share the 5-layer shape: conv(k4,s2,p2) channel
ladder 64-128-256-512-1 with LeakyReLU(0.2) between layers, no norm layers,
DCGAN init N(0, 0.02) (GAN.py:92-107). On a 512x512 input the patch output
is 17x17. They differ only in input channels:

  * OutputDiscriminator      2ch   (unused by the flagship trainer)
  * UncertaintyDiscriminator 2ch   entropy maps     — "model_dis2"
  * BoundaryDiscriminator    1ch   boundary sigmoid — "model_dis"
  * BoundaryEntDiscriminator 3ch   (unused)
  * MLPDiscriminator         24576-dim flat input (unused `Discriminator`)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.layers import Conv2d, leaky_relu, normal_002


class PatchDiscriminator(nn.Module):
    in_channels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate((64, 128, 256, 512)):
            x = Conv2d(
                ch, 4, 2, 2, use_bias=False, kernel_init=normal_002,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = leaky_relu(x, 0.2)
        return Conv2d(
            1, 4, 2, 2, use_bias=False, kernel_init=normal_002,
            dtype=self.dtype, name="conv5",
        )(x)


class BoundaryDiscriminator(PatchDiscriminator):
    in_channels: int = 1


class UncertaintyDiscriminator(PatchDiscriminator):
    in_channels: int = 2


class OutputDiscriminator(PatchDiscriminator):
    in_channels: int = 2


class BoundaryEntDiscriminator(PatchDiscriminator):
    in_channels: int = 3


class MLPDiscriminator(nn.Module):
    """Flat MLP discriminator (reference GAN.py:8-50, unused by trainers)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate((4096, 2048, 1024)):
            x = nn.Dense(
                ch, kernel_init=normal_002, bias_init=nn.initializers.zeros,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"fc{i + 1}",
            )(x)
            x = leaky_relu(x, 0.2)
        return nn.Dense(
            1, kernel_init=normal_002, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="fc4",
        )(x)
