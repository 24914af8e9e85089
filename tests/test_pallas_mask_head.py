"""Fused MC mask-head epilogue (ops/pallas/mask_head.py).

The CPU interpreter stubs `prng_random_bits` to zeros, so every element
is kept (bits < threshold) and scaled by 1/keep — interpret mode
validates the BN-apply + relu + matmul plumbing against an analytically
equivalent jnp computation; mask statistics can only be asserted on real
TPU. The XLA fallback path (used on CPU and by the dropout-free parity
harness) is tested exactly against a hand-written epilogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.ops.pallas.mask_head import (
    _xla_reference,
    fused_mask_head,
    mask_head_supported,
)


def _inputs(dtype=jnp.float32, n=2, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    x_bu = jnp.asarray(rng.standard_normal((n, hw, hw, 304)), dtype)
    bnd = jnp.asarray(rng.standard_normal((n, hw, hw, 1)), dtype)
    mean = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.1
    var = jnp.asarray(rng.uniform(0.5, 2.0, 305), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.2 + 1.0
    bias = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.1
    w = jnp.asarray(rng.standard_normal((1, 1, 305, 2)), jnp.float32) * 0.05
    w_bias = jnp.asarray(rng.standard_normal(2), jnp.float32) * 0.1
    return x_bu, bnd, mean, var, scale, bias, w, w_bias


def test_supported_shapes():
    assert mask_head_supported((64, 128, 128, 304))
    assert mask_head_supported((2, 16, 16, 304))
    assert not mask_head_supported((1, 1, 7, 304))  # 7 rows: no block


def test_xla_fallback_matches_manual_epilogue():
    args = _inputs()
    key = jax.random.PRNGKey(3)
    got = fused_mask_head(*args, key, rate=0.1, impl="xla")

    x_bu, bnd, mean, var, scale, bias, w, w_bias = args
    xf = jnp.concatenate([x_bu, bnd], axis=-1)
    inv = jax.lax.rsqrt(var + 1e-5)
    h = (xf - mean) * (inv * scale) + bias
    h = jax.nn.relu(h)
    mask = jax.random.bernoulli(key, 0.9, h.shape)
    h = jnp.where(mask, h / 0.9, 0)
    want = jnp.einsum("nhwc,co->nhwo", h, w.reshape(305, 2)) + w_bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_rate_zero_is_exact_identity_of_dropout():
    """rate=0 (the dropout-off parity mode) must be the dropout-free
    epilogue exactly."""
    args = _inputs(seed=1)
    key = jax.random.PRNGKey(0)
    got = fused_mask_head(*args, key, rate=0.0, impl="xla")
    x_bu, bnd, mean, var, scale, bias, w, w_bias = args
    xf = jnp.concatenate([x_bu, bnd], axis=-1)
    inv = jax.lax.rsqrt(var + 1e-5)
    h = jax.nn.relu((xf - mean) * (inv * scale) + bias)
    want = jnp.einsum("nhwc,co->nhwo", h, w.reshape(305, 2)) + w_bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_interpret_structure():
    """Interpret mode: stubbed PRNG keeps everything -> result equals the
    dropout-free epilogue scaled by 1/keep on the post-relu activations
    (dropout scaling is linear through the matmul, bias added after)."""
    args = _inputs(seed=2)
    key = jax.random.PRNGKey(7)
    rate = 0.1
    got = fused_mask_head(*args, key, rate=rate, impl="interpret")

    x_bu, bnd, mean, var, scale, bias, w, w_bias = args
    xf = jnp.concatenate([x_bu, bnd], axis=-1)
    inv = jax.lax.rsqrt(var + 1e-5)
    h = jax.nn.relu((xf - mean) * (inv * scale) + bias) / (1.0 - rate)
    want = jnp.einsum("nhwc,co->nhwo", h, w.reshape(305, 2)) + w_bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs real TPU PRNG")
def test_pallas_tpu_statistics():
    """On hardware: the kernel's output distribution matches the XLA
    epilogue's (same moments within MC noise) and differs elementwise
    (different PRNG stream)."""
    args = _inputs(dtype=jnp.bfloat16, n=4, hw=32)
    key = jax.random.PRNGKey(11)
    got = np.asarray(fused_mask_head(*args, key, rate=0.1, impl="pallas")).astype(np.float32)
    ref = np.asarray(fused_mask_head(*args, key, rate=0.1, impl="xla")).astype(np.float32)
    assert np.abs(got.mean() - ref.mean()) < 0.05
    assert np.abs(got.std() - ref.std()) < 0.1


def test_split_kernel_interpret_structure():
    """Three-input variant (x_up[256] + ll[48] + boundary[1]): interpret
    mode (stubbed PRNG keeps everything) equals the dropout-free epilogue
    scaled by 1/keep."""
    from uda_clr_tpu.ops.pallas.mask_head import fused_mask_head_split

    rng = np.random.default_rng(5)
    n, hw = 2, 16
    x_up = jnp.asarray(rng.standard_normal((n, hw, hw, 256)), jnp.float32)
    ll = jnp.asarray(rng.standard_normal((n, hw, hw, 48)), jnp.float32)
    bnd = jnp.asarray(rng.standard_normal((n, hw, hw, 1)), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.1
    var = jnp.asarray(rng.uniform(0.5, 2.0, 305), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.2 + 1.0
    bias = jnp.asarray(rng.standard_normal(305), jnp.float32) * 0.1
    w = jnp.asarray(rng.standard_normal((1, 1, 305, 2)), jnp.float32) * 0.05
    w_bias = jnp.asarray(rng.standard_normal(2), jnp.float32) * 0.1
    rate = 0.1
    got = fused_mask_head_split(x_up, ll, bnd, mean, var, scale, bias, w,
                                w_bias, jax.random.PRNGKey(9), rate=rate,
                                impl="interpret")
    xf = jnp.concatenate([x_up, ll, bnd], axis=-1)
    inv = jax.lax.rsqrt(var + 1e-5)
    h = jax.nn.relu((xf - mean) * (inv * scale) + bias) / (1.0 - rate)
    want = jnp.einsum("nhwc,co->nhwo", h, w.reshape(305, 2)) + w_bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_split_kernel_xla_fallback_matches_joint():
    """CPU fallback of the split entry equals the joint entry for the
    same key (both concat + _xla_reference)."""
    from uda_clr_tpu.ops.pallas.mask_head import fused_mask_head_split

    args = _inputs(seed=6)
    x_bu, bnd, mean, var, scale, bias, w, w_bias = args
    key = jax.random.PRNGKey(4)
    joint = fused_mask_head(x_bu, bnd, mean, var, scale, bias, w, w_bias,
                            key, rate=0.1, impl="xla")
    split = fused_mask_head_split(x_bu[..., :256], x_bu[..., 256:], bnd,
                                  mean, var, scale, bias, w, w_bias,
                                  key, rate=0.1, impl="xla")
    np.testing.assert_allclose(np.asarray(joint), np.asarray(split), rtol=1e-6)
