"""Stable BCE-on-sigmoid: torch value parity + bounded gradients where the
naive autodiff NaNs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from uda_clr_tpu.ops import losses as L


def test_value_matches_torch_bceloss_on_sigmoid():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4, 8, 8, 2)) * 8).astype(np.float32)
    t = (rng.uniform(0, 1, x.shape) > 0.5).astype(np.float32)
    got = float(L.bce_sigmoid_stable(jnp.asarray(x), jnp.asarray(t)))
    want = float(torch.nn.BCELoss()(torch.sigmoid(torch.from_numpy(x)), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_saturated_logits_gradient_is_finite():
    # fp32 sigmoid(x) == 1.0 exactly for x >= ~17: naive clamped BCE autodiff
    # yields 0 * -inf = NaN there; the stable form must stay finite.
    x = jnp.asarray(np.array([[30.0, -120.0, 0.5, 17.5]], np.float32))
    t = jnp.asarray(np.array([[0.0, 1.0, 1.0, 0.0]], np.float32))

    naive = jax.grad(lambda a: L.bce_probs(jax.nn.sigmoid(a), t))(x)
    assert not np.all(np.isfinite(np.asarray(naive)))  # demonstrates the hazard

    g = jax.grad(lambda a: L.bce_sigmoid_stable(a, t))(x)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # gradient equals (sigmoid(x) - t)/N
    want = (np.asarray(jax.nn.sigmoid(x)) - np.asarray(t)) / x.size
    np.testing.assert_allclose(g, want, rtol=1e-6)

    ge = jax.grad(lambda a: jnp.sum(L.bce_sigmoid_stable_elementwise(a, t)))(x)
    assert np.all(np.isfinite(np.asarray(ge)))


def test_gradient_matches_unclamped_in_normal_regime():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32) * 3)
    t = jnp.asarray((rng.uniform(0, 1, (3, 5)) > 0.5).astype(np.float32))
    g_stable = np.asarray(jax.grad(lambda a: L.bce_sigmoid_stable(a, t))(x))
    g_naive = np.asarray(jax.grad(lambda a: L.bce_probs(jax.nn.sigmoid(a), t))(x))
    np.testing.assert_allclose(g_stable, g_naive, rtol=1e-4, atol=1e-7)
