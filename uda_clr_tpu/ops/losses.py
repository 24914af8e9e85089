"""Loss primitives matching torch semantics bit-for-bit in fp32.

The reference mixes BCELoss-on-sigmoid for training
(Trainer_prototype_full.py:18,292) with BCE-with-logits for validation
(:135) and for the adversarial terms (:456-457); we preserve that asymmetry
deliberately (it changes gradient clamping behaviour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_probs(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss(mean): ``-[t log p + (1-t) log(1-p)]`` with log
    clamped at -100 (torch's documented behaviour).

    NOTE: like torch's BCELoss, the gradient blows up as p -> {0, 1}; in
    fp32, sigmoid saturates EXACTLY to 1.0 for logits >= ~17, where the
    clamp's gradient becomes ``0 * inf = NaN``. For training on sigmoid
    outputs use :func:`bce_sigmoid_stable`, which keeps this value but a
    bounded logits-space gradient."""
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


@jax.custom_vjp
def bce_sigmoid_stable(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """``BCELoss(sigmoid(logits), targets)`` with torch's -100 log clamp in
    the VALUE, and the exact unclamped derivative ``(sigmoid(x) - t)/N`` in
    the BACKWARD (bounded for all logits).

    Rationale: the reference trains with BCELoss-on-sigmoid
    (Trainer_prototype_full.py:18,292). In fp32, sigmoid(x) rounds to
    exactly 1.0 for x >= ~17 (and 0.0 below ~-104); there torch's clamp
    keeps the value finite but autodiff of ``max(log(1-p), -100)`` yields
    ``0 * -inf = NaN`` (observed as whole-network NaN on TPU once logits
    confidently saturate). The logits-space derivative is the correct
    gradient of the unclamped loss and matches the clamped one everywhere
    the clamp is inactive."""
    # VALUE reproduces torch bit-for-bit including fp32 sigmoid saturation
    # (sigmoid(x)==1.0 for x>=~17 makes torch emit the -100 clamp, not the
    # true -x); safe here because custom_vjp shields it from autodiff.
    p = jax.nn.sigmoid(logits)
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


def _bce_sig_fwd(logits, targets):
    return bce_sigmoid_stable(logits, targets), (logits, targets)


def _bce_sig_bwd(res, g):
    logits, targets = res
    n = logits.size
    grad = (jax.nn.sigmoid(logits) - targets) / n
    return (g * grad, None)


bce_sigmoid_stable.defvjp(_bce_sig_fwd, _bce_sig_bwd)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.binary_cross_entropy_with_logits (mean),
    numerically stable: ``max(x,0) - x t + log(1+exp(-|x|))``."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_with_logits_elementwise(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce_probs_elementwise(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1p)


@jax.custom_vjp
def bce_sigmoid_stable_elementwise(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise ``BCELoss(sigmoid(x), t)`` (torch clamp in value,
    bounded logits-space gradient) — see :func:`bce_sigmoid_stable`."""
    p = jax.nn.sigmoid(logits)
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1p)


def _bce_sig_el_fwd(logits, targets):
    return bce_sigmoid_stable_elementwise(logits, targets), (logits, targets)


def _bce_sig_el_bwd(res, g):
    logits, targets = res
    return (g * (jax.nn.sigmoid(logits) - targets), None)


bce_sigmoid_stable_elementwise.defvjp(_bce_sig_el_fwd, _bce_sig_el_bwd)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def entropy_map(mask_logits: jnp.ndarray, smooth: float = 1e-7) -> jnp.ndarray:
    """Per-pixel prediction-entropy map ``-p * log(p + eps)`` fed to the
    uncertainty discriminator (Trainer_prototype_full.py:452)."""
    p = jax.nn.sigmoid(mask_logits)
    return -1.0 * p * jnp.log(p + smooth)


def dice_loss(probs: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Differentiable soft-Dice loss (utils/metrics.py:135-148)."""
    p = probs.reshape(-1)
    t = targets.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def discriminator_loss(d_out, is_source: bool) -> jnp.ndarray:
    """PatchGAN discriminator BCE toward domain label 1 (source) / 0
    (target) (Trainer_prototype_full.py:485-508)."""
    label = jnp.full_like(d_out, 1.0 if is_source else 0.0)
    return bce_with_logits(d_out, label)
