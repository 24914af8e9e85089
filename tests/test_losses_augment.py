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


# --- cv2-oracle tests: pin the albumentations-exact laws strong_augment
# claims (reference round-trips through cv2 — utils/Utils.py:33-85) against
# the real cv2 in this environment.


def test_binom_blur_matches_cv2_float():
    """cv2.GaussianBlur(k, sigma=0) uses fixed binomial taps for small k and
    BORDER_REFLECT_101; float input makes the comparison exact."""
    import cv2

    from uda_clr_tpu.ops.augment import _binom_blur

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (17, 13, 3)).astype(np.float32)
    for k in (3, 5):
        got = np.asarray(_binom_blur(jnp.asarray(img), k))
        want = cv2.GaussianBlur(img, (k, k), 0, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(got, want, atol=3e-6)


def test_binom_blur_uint8_within_one_lsb():
    """On the uint8 grid (what albumentations actually feeds cv2), our
    round-to-nearest snap lands within 1 LSB of cv2's fixed-point path."""
    import cv2

    from uda_clr_tpu.ops.augment import _binom_blur, _q8

    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    x = jnp.asarray(u8.astype(np.float32) / 255.0)
    for k in (3, 5):
        got = np.asarray(_q8(_binom_blur(x, k))) * 255.0
        want = cv2.GaussianBlur(u8, (k, k), 0).astype(np.float32)
        assert np.abs(got - want).max() <= 1.0


def test_togray_weights_match_cv2():
    """ToGray = cv2 RGB2GRAY (0.299/0.587/0.114); ours within 1 LSB of cv2's
    fixed-point LUT on uint8 input."""
    import cv2

    from uda_clr_tpu.ops.augment import _q8

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    x = u8.astype(np.float32) / 255.0
    got = np.asarray(_q8(jnp.sum(jnp.asarray(x) * jnp.asarray([0.299, 0.587, 0.114]), axis=-1))) * 255.0
    want = cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(got - want).max() <= 1.0


def test_rgb_to_hsv_matches_cv2_units():
    """_rgb_to_hsv's h in [0,1) maps to cv2's 180-unit hue circle (uint8
    RGB2HSV), s/v to 0..255 — the unit system HueSaturationValue shifts in.
    cv2 quantizes H to integers, so allow ~1 hue unit; skip near-gray pixels
    where hue is numerically unstable."""
    import cv2

    from uda_clr_tpu.ops.augment import _rgb_to_hsv

    rng = np.random.default_rng(8)
    u8 = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    hsv_cv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float32)
    ours = np.asarray(_rgb_to_hsv(jnp.asarray(u8.astype(np.float32) / 255.0)))
    stable = hsv_cv[..., 1] > 16  # saturated enough for hue to be well-defined
    dh = np.abs(ours[..., 0][stable] * 180.0 - hsv_cv[..., 0][stable])
    dh = np.minimum(dh, 180.0 - dh)  # circular distance
    assert dh.max() <= 1.5
    np.testing.assert_allclose(ours[..., 1] * 255.0, hsv_cv[..., 1], atol=1.5)
    np.testing.assert_allclose(ours[..., 2] * 255.0, hsv_cv[..., 2], atol=0.51)
