"""On-device color-space strong augmentation for the consistency branch.

The reference round-trips every target batch through the host to run
albumentations (Compose([RandomBrightnessContrast(p=1),
HueSaturationValue(p=1)], p=0.8), ToGray p=0.2, GaussianBlur(5) p=0.5 —
utils/Utils.py:33-43) with a per-image Python loop and two cv2 color
conversions (:44-85). Here the same augmentation is pure jnp inside the
jitted train step: per-image randomness via vmapped PRNG keys, blur as a
separable depthwise conv, zero host<->device traffic.

Albumentations-exact laws on the [0,1] float equivalent of its uint8 path:
brightness/contrast is ``clip(x*(1+c) + b)`` (``brightness_by_max=True``);
hue shift ±20 of cv2's 180-unit circle; saturation/value shifts ADDITIVE
±30/255 and ±20/255; ``GaussianBlur(5, sigma=0)`` is cv2's fixed binomial
small-kernel table with random odd ksize in {3,5}, reflect-101 border.
Intermediate results snap to the uint8 grid where albumentations
materializes uint8. The reference's augment() also wraps the call in a
cv2 BGR<->RGB round-trip on images that are ALREADY RGB (Utils.py:59-69),
so the color ops see channel-REVERSED images — reproduced here by flipping
the channel axis in and back out. Remaining deviation (documented): hue
shifts stay continuous instead of cv2's integer-LUT truncation (≤1/255
quantization noise, removed by the post-op grid snap).

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


# cv2.getGaussianKernel(ksize, sigma=0) small-kernel table (binomial taps) —
# what cv2.GaussianBlur uses for ksize<=7 with unset sigma, i.e. exactly
# albumentations GaussianBlur's kernels
_CV2_SMALL_GAUSS = {
    3: (0.25, 0.5, 0.25),
    5: (0.0625, 0.25, 0.375, 0.25, 0.0625),
}


def _tap5(ksize: int) -> tuple:
    """The ksize-3/5 binomial kernel expressed as 5 taps. Zero end taps are
    exact: 0.0*x contributes +0.0 to the running einsum sum, so the padded
    3-tap kernel is bit-identical to a true 3-tap pass — and it lets one
    traced 5-tap convolution serve both kernel sizes (the jit'd augment
    selects the kernel instead of computing both blurs)."""
    k = _CV2_SMALL_GAUSS[ksize]
    pad = (5 - ksize) // 2
    return (0.0,) * pad + k + (0.0,) * pad


def _blur5(img, k):
    """Separable 5-tap blur of one HWC image with kernel row ``k``
    (BORDER_REFLECT_101 == numpy 'reflect')."""
    x = jnp.pad(img, [(2, 2), (0, 0), (0, 0)], mode="reflect")
    x = jnp.einsum("k,khwc->hwc", k,
                   jnp.stack([x[i : i + img.shape[0]] for i in range(5)]))
    x = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="reflect")
    x = jnp.einsum("k,hkwc->hwc", k,
                   jnp.stack([x[:, i : i + img.shape[1]] for i in range(5)], 1))
    return x


def _binom_blur(img, ksize: int):
    """Separable cv2-exact Gaussian blur of one HWC image."""
    return _blur5(img, jnp.asarray(_tap5(ksize), jnp.float32))


def _q8(x):
    """Snap to the uint8 grid, rounding to nearest — the cv2 fixed-point ops
    (cvtColor HSV round-trips, RGB2GRAY, GaussianBlur) round their uint8
    outputs."""
    return jnp.round(x * 255.0) / 255.0


def _t8(x):
    """Snap to the uint8 grid, TRUNCATING — ``astype(np.uint8)`` semantics,
    used by the reference's input conversion (Utils.py:59-60) and by
    albumentations' brightness/contrast LUT (``.astype(np.uint8)``). The tiny
    epsilon absorbs float32 representation error of exact n/255 grid points
    (ours reach the grid via x/255*255 round-trips; the reference's LUT works
    on exact integers) without perturbing genuinely fractional values."""
    return jnp.floor(x * 255.0 + 1e-3) / 255.0


def _augment_one(key, img):
    """img: HWC in [-1, 1]."""
    ks = jax.random.split(key, 9)
    # channel-reversed view: the reference's BGR<->RGB round-trip on
    # already-RGB data (Utils.py:59-69) feeds the color ops swapped channels
    x = _t8((img[..., ::-1] + 1.0) * 0.5)  # -> uint8-grid [0, 1]

    # Compose([RandomBrightnessContrast(p=1), HueSaturationValue(p=1)], p=0.8)
    apply_color = jax.random.uniform(ks[0]) < 0.8
    alpha = 1.0 + jax.random.uniform(ks[1], minval=-0.2, maxval=0.2)  # contrast
    beta = jax.random.uniform(ks[2], minval=-0.2, maxval=0.2)  # brightness_by_max
    hue_shift = jax.random.uniform(ks[3], minval=-20.0, maxval=20.0) / 180.0
    sat_shift = jax.random.uniform(ks[4], minval=-30.0, maxval=30.0) / 255.0
    val_shift = jax.random.uniform(ks[5], minval=-20.0, maxval=20.0) / 255.0

    def color(x):
        y = _t8(jnp.clip(x * alpha + beta, 0.0, 1.0))
        hsv = _rgb_to_hsv(y)
        hsv = jnp.stack(
            [
                (hsv[..., 0] + hue_shift) % 1.0,
                jnp.clip(hsv[..., 1] + sat_shift, 0.0, 1.0),
                jnp.clip(hsv[..., 2] + val_shift, 0.0, 1.0),
            ],
            axis=-1,
        )
        return _q8(_hsv_to_rgb(hsv))

    x = jnp.where(apply_color, color(x), x)

    # ToGray p=0.2 (cv2 RGB2GRAY weights, on the swapped channels as the
    # reference does)
    gray = _q8(jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True))
    x = jnp.where(jax.random.uniform(ks[6]) < 0.2, jnp.broadcast_to(gray, x.shape), x)

    # GaussianBlur(5) p=0.5: random odd ksize in {3,5}, cv2 sigma-0 kernels.
    # One 5-tap pass with a selected kernel — the zero-padded 3-tap row is
    # bit-identical to a true 3-tap blur at half the traced conv work.
    use5 = jax.random.uniform(ks[7]) < 0.5
    kern = jnp.where(use5, jnp.asarray(_tap5(5), jnp.float32),
                     jnp.asarray(_tap5(3), jnp.float32))
    x = jnp.where(jax.random.uniform(ks[8]) < 0.5, _q8(_blur5(x, kern)), x)

    return x[..., ::-1] * 2.0 - 1.0


def strong_augment(key, images):
    """Per-image strong augmentation, NHWC [-1,1] -> NHWC [-1,1]."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images)
