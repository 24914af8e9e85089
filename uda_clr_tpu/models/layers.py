"""Shared conv building blocks (NHWC, explicit torch-style padding)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_ default: gain^2 = 2 (leaky_relu a=0), fan_in, normal.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# DCGAN-style init used by the reference discriminators (GAN.py:102-107).
normal_002 = nn.initializers.normal(stddev=0.02)


class Conv2d(nn.Module):
    """NHWC conv with torch-style symmetric integer padding.

    Mirrors ``nn.Conv2d(in, out, k, stride, padding, dilation, groups,
    bias)`` semantics so reference architectures transcribe 1:1; weights are
    HWIO (converter from torch OIHW lives in uda_clr_tpu.convert).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | Sequence[tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Any = kaiming_normal
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = list(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


def fixed_padding(x: jnp.ndarray, kernel_size: int, dilation: int) -> jnp.ndarray:
    """Pre-pad for 'same' output under stride, as the reference's MobileNetV2
    does before every inverted-residual block (backbone/mobilenet.py:16-22).

    Note the reference pads the *block input*, so the expansion 1x1 conv and
    its BN statistics see the padded border; we replicate that exactly.
    """
    k_eff = kernel_size + (kernel_size - 1) * (dilation - 1)
    pad_total = k_eff - 1
    beg = pad_total // 2
    end = pad_total - beg
    return jnp.pad(x, [(0, 0), (beg, end), (beg, end), (0, 0)])


# Dropout backend:
#   'xla16' (default) — 16-bit RngBitGenerator words + compare: half the
#     random-bit HBM traffic of the uint32 bernoulli draw; measured
#     139.2 -> 135.1 ms/step on the flagship bench. Keep probability is
#     quantized to 2^-16 (<=2e-5 absolute rate deviation, orders of
#     magnitude below the losses' step-to-step noise).
#   'xla' — jax.random.bernoulli (uint32), the exact flax/torch-rate
#     semantics.
#   'auto'/'pallas' — the fused Pallas kernel on TPU
#     (ops/pallas/dropout.py) — measured SLOWER end-to-end on real v5e
#     hardware (A/B on the flagship bench: 159.9 ms vs 151.4 ms per
#     step), because the custom call is a fusion barrier: XLA's
#     bernoulli+select melts into the producer/consumer fusions and its
#     random bits never round-trip HBM, while the kernel forces a
#     separate read of x and write of the output. Kept as an opt-in for
#     future shapes/hardware where the tradeoff flips.
#   'off' — every dropout an identity while BN stays in train mode; used
#     by the step-level parity harness, where torch/JAX dropout masks
#     cannot be made to coincide (tests/test_step_parity.py zeroes the
#     torch ps to match).
# Global for the same reason as models/norm.py's moments switch: read at
# trace time.
_DROPOUT_IMPL = "xla16"


def set_dropout_impl(impl: str) -> None:
    global _DROPOUT_IMPL
    assert impl in ("auto", "xla", "xla16", "pallas", "off"), impl
    _DROPOUT_IMPL = impl


class TpuDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` (same semantics: zero with prob ``rate``,
    scale survivors by 1/keep) with a selectable backend: XLA bernoulli
    (default — fuses best, see ``_DROPOUT_IMPL`` above for the measured
    A/B) or the fused Pallas PRNG kernel (ops/pallas/dropout.py)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0 or _DROPOUT_IMPL == "off":
            return x
        key = self.make_rng("dropout")
        from uda_clr_tpu.ops.pallas.dropout import (
            dropout_pallas, dropout_supported, seed_from_key,
        )

        impl = _DROPOUT_IMPL
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu"
        )
        if use_pallas and dropout_supported(x.shape, jnp.dtype(x.dtype).itemsize):
            return dropout_pallas(x, seed_from_key(key), self.rate)
        keep = 1.0 - self.rate
        if impl == "xla16":
            # 16-bit random words: half the RngBitGenerator HBM traffic of
            # jax.random.bernoulli's uint32 draw. Keep probability is
            # quantized to 2^-16 (e.g. 0.9 -> 58982/65536 = 0.899994, a
            # <=2e-5 absolute rate deviation — far below the run-to-run
            # noise of the stochastic losses). Masks remain i.i.d.
            # Bernoulli; bench A/B decides whether this ships as default.
            bits = jax.random.bits(key, x.shape, jnp.uint16)
            thr = min(int(round(keep * 65536.0)), 65535)
            mask = bits < jnp.uint16(thr)
        else:
            mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0).astype(x.dtype)


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)
