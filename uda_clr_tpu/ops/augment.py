"""On-device color-space strong augmentation for the consistency branch.

The reference round-trips every target batch through the host to run
albumentations (RandomBrightnessContrast + HueSaturationValue p=0.8,
ToGray p=0.2, GaussianBlur(5) p=0.5 — utils/Utils.py:33-43) with a
per-image Python loop and two cv2 color conversions (:44-85). Here the same
augmentation family is pure jnp inside the jitted train step: per-image
randomness via vmapped PRNG keys, blur as a separable 5x1/1x5 depthwise
conv, zero host<->device traffic.

Input/output: NHWC float32 images in the pipeline's [-1, 1] normalized
space; geometry is untouched (color-only), so pseudo-label maps transfer
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / (maxc + 1e-12), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _gaussian_kernel1d(sigma, radius: int = 2):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    return k / jnp.sum(k)


def _blur5(img, sigma):
    """Separable 5x5 Gaussian blur of one HWC image (edge-padded)."""
    k = _gaussian_kernel1d(sigma)
    pad = [(2, 2), (0, 0), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = jnp.einsum("k,khwc->hwc", k, jnp.stack([x[i : i + img.shape[0]] for i in range(5)]))
    pad = [(0, 0), (2, 2), (0, 0)]
    x = jnp.pad(x, pad, mode="edge")
    x = jnp.einsum("k,hkwc->hwc", k, jnp.stack([x[:, i : i + img.shape[1]] for i in range(5)], 1))
    return x


def _augment_one(key, img):
    """img: HWC in [-1, 1]."""
    ks = jax.random.split(key, 9)
    x = (img + 1.0) * 0.5  # -> [0, 1]

    # RandomBrightnessContrast + HueSaturationValue, joint p=0.8
    apply_color = jax.random.uniform(ks[0]) < 0.8
    brightness = jax.random.uniform(ks[1], minval=-0.2, maxval=0.2)
    contrast = 1.0 + jax.random.uniform(ks[2], minval=-0.2, maxval=0.2)
    hue_shift = jax.random.uniform(ks[3], minval=-20.0, maxval=20.0) / 360.0
    sat_scale = 1.0 + jax.random.uniform(ks[4], minval=-0.3, maxval=0.3)
    val_scale = 1.0 + jax.random.uniform(ks[5], minval=-0.2, maxval=0.2)

    def color(x):
        y = jnp.clip((x + brightness - 0.5) * contrast + 0.5, 0.0, 1.0)
        hsv = _rgb_to_hsv(y)
        hsv = jnp.stack(
            [
                (hsv[..., 0] + hue_shift) % 1.0,
                jnp.clip(hsv[..., 1] * sat_scale, 0.0, 1.0),
                jnp.clip(hsv[..., 2] * val_scale, 0.0, 1.0),
            ],
            axis=-1,
        )
        return _hsv_to_rgb(hsv)

    x = jnp.where(apply_color, color(x), x)

    # ToGray p=0.2
    gray = jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
    x = jnp.where(jax.random.uniform(ks[6]) < 0.2, jnp.broadcast_to(gray, x.shape), x)

    # GaussianBlur(5) p=0.5
    sigma = jax.random.uniform(ks[7], minval=0.5, maxval=1.5)
    x = jnp.where(jax.random.uniform(ks[8]) < 0.5, _blur5(x, sigma), x)

    return x * 2.0 - 1.0


def strong_augment(key, images):
    """Per-image strong augmentation, NHWC [-1,1] -> NHWC [-1,1]."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images)
