"""Fused Pallas dropout (ops/pallas/dropout.py).

The CPU interpreter stubs ``pltpu.prng_random_bits`` to zeros, so mask
STATISTICS can only be asserted on real TPU — those tests skip on CPU and
run in the TPU bench sessions. Interpret-mode tests here cover plumbing:
shapes/dtypes, scaling of kept elements, VJP structure, block layout, and
the TpuDropout module fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.ops.pallas.dropout import (
    dropout_pallas,
    dropout_supported,
    seed_from_key,
)

ON_TPU = jax.default_backend() == "tpu"


def test_interpret_structure_and_scaling():
    # interpret-mode bits are all zero -> every element kept -> output must
    # be exactly x / keep (validates the scale + where + dtype plumbing)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128)), jnp.float32)
    y = np.asarray(dropout_pallas(x, jnp.int32(3), 0.5, True))
    np.testing.assert_allclose(y, np.asarray(x) * 2.0, rtol=1e-6)

    xb = x.astype(jnp.bfloat16)
    yb = dropout_pallas(xb, jnp.int32(3), 0.1, True)
    assert yb.dtype == jnp.bfloat16


def test_interpret_vjp_structure():
    x = jnp.ones((32, 256), jnp.float32)
    y, vjp = jax.vjp(lambda v: dropout_pallas(v, jnp.int32(42), 0.1, True), x)
    (dx,) = vjp(jnp.ones_like(y))
    # all-kept interpret masks: gradient is exactly 1/keep everywhere
    np.testing.assert_allclose(np.asarray(dx), 1.0 / 0.9, rtol=1e-6)


def test_interpret_multiblock_and_odd_channels():
    # M=512 rows over 2 blocks of 256; C=305 exercises lane padding
    x = jnp.ones((4, 8, 16, 305), jnp.float32)
    assert dropout_supported(x.shape)
    y = np.asarray(dropout_pallas(x, jnp.int32(9), 0.5, True))
    assert y.shape == x.shape
    assert np.all(np.isfinite(y))


def test_seed_from_key_distinct():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    s1, s2 = seed_from_key(k1), seed_from_key(k2)
    assert s1.dtype == jnp.int32
    assert int(s1) != int(s2)


def test_tpudropout_fallback_on_cpu():
    from uda_clr_tpu.models.layers import TpuDropout

    mod = TpuDropout(0.5)
    x = jnp.ones((4, 8, 8, 16), jnp.float32)
    y = mod.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    assert set(np.round(np.unique(y), 5)).issubset({0.0, 2.0})
    frac_kept = float((y != 0).mean())
    assert 0.3 < frac_kept < 0.7, frac_kept
    y_det = mod.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))


# ---------------------------------------------------------------------------
# real-TPU statistics (hardware PRNG); exercised from the bench sessions
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG required (interpreter stubs bits to 0)")
def test_tpu_mask_rate_scaling_and_vjp_agreement():
    x = jnp.ones((64, 128), jnp.float32)
    seed = jnp.int32(123)
    for rate in (0.1, 0.5):
        y, vjp = jax.vjp(lambda v: dropout_pallas(v, seed, rate), x)
        y = np.asarray(y)
        vals = set(np.round(np.unique(y), 4))
        assert vals.issubset({0.0, round(1.0 / (1.0 - rate), 4)}), vals
        frac = float((y != 0).mean())
        assert abs(frac - (1.0 - rate)) < 0.07, (rate, frac)
        (dx,) = vjp(jnp.ones_like(x))
        dx = np.asarray(dx)
        kept = y != 0
        np.testing.assert_allclose(dx[kept], 1.0 / (1.0 - rate), rtol=1e-5)
        np.testing.assert_array_equal(dx[~kept], 0.0)
    # distinct seeds -> distinct masks; same seed -> identical mask
    y1 = np.asarray(dropout_pallas(x, jnp.int32(1), 0.5))
    y2 = np.asarray(dropout_pallas(x, jnp.int32(2), 0.5))
    y1b = np.asarray(dropout_pallas(x, jnp.int32(1), 0.5))
    assert (y1 != y2).any()
    np.testing.assert_array_equal(y1, y1b)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG required")
def test_tpu_blocks_decorrelated():
    x = jnp.ones((1024, 256), jnp.float32)  # 2+ row blocks at bm<=512
    y = np.asarray(dropout_pallas(x, jnp.int32(5), 0.5)).reshape(-1, 256)
    half = y.shape[0] // 2
    assert (y[:half] != y[half:]).any()


def test_xla16_dropout_statistics_and_scaling():
    """The default 16-bit-words dropout backend: keep fraction within
    2^-16 quantization of the rate, survivors scaled exactly 1/keep."""
    import numpy as np
    from uda_clr_tpu.models import layers as layers_lib

    layers_lib.set_dropout_impl("xla16")
    try:
        m = layers_lib.TpuDropout(0.1)
        x = jnp.ones((4, 64, 64, 256))
        y = np.asarray(m.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}))
        keep_frac = (y > 0).mean()
        assert abs(keep_frac - 0.9) < 5e-3
        np.testing.assert_allclose(y[y > 0], 1.0 / 0.9, rtol=1e-6)
    finally:
        layers_lib.set_dropout_impl("xla16")
