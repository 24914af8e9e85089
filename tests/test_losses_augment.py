"""Loss-primitive parity with torch and on-device augmentation sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from uda_clr_tpu.ops import losses as L
from uda_clr_tpu.ops.augment import strong_augment


def test_bce_probs_matches_torch_bceloss():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, (4, 8, 8, 2)).astype(np.float32)
    t = (rng.uniform(0, 1, (4, 8, 8, 2)) > 0.5).astype(np.float32)
    got = float(L.bce_probs(p, t))
    want = float(torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 8, 8, 2)) * 10).astype(np.float32)
    t = (rng.uniform(0, 1, (4, 8, 8, 2)) > 0.5).astype(np.float32)
    got = float(L.bce_with_logits(x, t))
    want = float(F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_entropy_map_matches_reference_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    got = np.asarray(L.entropy_map(x))
    p = 1 / (1 + np.exp(-x))
    want = -1.0 * p * np.log(p + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_dice_loss_bounds():
    p = jnp.asarray(np.ones((2, 4, 4, 1), np.float32))
    t = jnp.asarray(np.ones((2, 4, 4, 1), np.float32))
    assert float(L.dice_loss(p, t)) < 1e-5
    t0 = jnp.zeros_like(t)
    assert float(L.dice_loss(p, t0)) > 0.9


def test_strong_augment_preserves_shape_and_range():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    y = np.asarray(strong_augment(jax.random.PRNGKey(0), jnp.asarray(x)))
    assert y.shape == x.shape
    assert y.min() >= -1.0001 and y.max() <= 1.0001
    # different keys -> different augs; same key -> deterministic
    y2 = np.asarray(strong_augment(jax.random.PRNGKey(0), jnp.asarray(x)))
    y3 = np.asarray(strong_augment(jax.random.PRNGKey(1), jnp.asarray(x)))
    np.testing.assert_array_equal(y, y2)
    assert not np.array_equal(y, y3)
    # per-image independence: at least some images differ from identity
    assert np.abs(y - x).max() > 1e-3


def test_hsv_roundtrip():
    from uda_clr_tpu.ops.augment import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(4)
    rgb = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    back = np.asarray(_hsv_to_rgb(_rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=1e-4)
