"""Class-prototype (centroid) math for category-level regularization.

Re-implements reference utils/Utils.py:86-311 in NHWC jnp. All centroid
reductions are sums over (batch, H, W); under a data-sharded mesh XLA turns
them into cross-replica reductions over ICI automatically, so the global
EMA prototype bank sees the *full* per-step batch on every chip — the
multi-chip generalization of the reference's single-GPU semantics.

Conventions:
  * ``pred``: soft or hard masks [B, h, w, 2] with channel 0 = cup,
    channel 1 = disc;
  * ``feature``: [B, h, w, C] (C=305 decoder feature);
  * centroids are returned as a dict with keys
    ``cup_obj, disc_obj, cup_bck, disc_bck`` -> [C] vectors.

The reference divides by the mask mass unguarded (Utils.py:127-130), which
NaNs if a class is absent from the whole batch; we guard with +eps and
document the deviation (the reference only survives because fundus crops
always contain both structures).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uda_clr_tpu.ops.resize import resize_bilinear_align_corners

_EPS = 1e-12


class Prototypes(NamedTuple):
    cup_obj: jnp.ndarray
    disc_obj: jnp.ndarray
    cup_bck: jnp.ndarray
    disc_bck: jnp.ndarray

    def stack(self) -> jnp.ndarray:
        return jnp.stack([self.cup_obj, self.disc_obj, self.cup_bck, self.disc_bck])

    @staticmethod
    def unstack(x: jnp.ndarray) -> "Prototypes":
        return Prototypes(x[0], x[1], x[2], x[3])


def _masked_sums(feature, mask, weight=None):
    """(sum(feature * mask * weight), sum(mask * weight)) over (B,H,W)."""
    w = mask if weight is None else mask * weight
    num = jnp.sum(feature * w, axis=(0, 1, 2))
    den = jnp.sum(w, axis=(0, 1, 2))
    return num, den


def _masked_centroid(feature, mask, weight=None):
    """sum(feature * mask * weight) / sum(mask * weight) over (B,H,W)."""
    num, den = _masked_sums(feature, mask, weight)
    return num / (den + _EPS)


def gen_prototype(pred: jnp.ndarray, feature: jnp.ndarray) -> Prototypes:
    """Soft-mask global class centroids (Utils.py:108-131)."""
    cup = pred[..., 0:1]
    disc = pred[..., 1:2]
    return Prototypes(
        cup_obj=_masked_centroid(feature, cup),
        disc_obj=_masked_centroid(feature, disc),
        cup_bck=_masked_centroid(feature, 1.0 - cup),
        disc_bck=_masked_centroid(feature, 1.0 - disc),
    )


def gen_prototype_src_trg(pred_s, feat_s, pred_t, feat_t) -> Prototypes:
    """Joint source+target centroids (Utils.py:132-158)."""
    pred = jnp.concatenate([pred_s, pred_t], axis=0)
    feat = jnp.concatenate([feat_s, feat_t], axis=0)
    return gen_prototype(pred, feat)


class RectifiedPrototypes(NamedTuple):
    prototypes: Prototypes
    std_map: jnp.ndarray  # [B, H, W, 2] MC-dropout uncertainty (full res)
    conf_mask: jnp.ndarray  # [B, h, w, 2] std<thr confidence mask (feat res)


def gen_prototype_retrify(
    mask_before: jnp.ndarray,  # [B, h, w, 2] target mask logits (feature res)
    feature: jnp.ndarray,  # [B, h, w, C]
    mc_logits: jnp.ndarray,  # [T, B, H, W, 2] MC-dropout mask logits (full res)
    pseudo_threshold: float = 0.75,
    std_threshold: float = 0.04,
) -> RectifiedPrototypes:
    """MC-dropout-rectified target centroids (Utils.py:159-225).

    Matches the reference numerics: std over T of temperature-softened
    ``sigmoid(logits / 2)`` with the **unbiased** estimator (torch.std
    default), mean prediction from plain sigmoid, both bilinearly
    (align-corners) resized to the feature grid; pseudo-labels hard
    thresholded at ``> 0.75`` on ``sigmoid(mask_before)``; confidence mask
    ``std < 0.04``; centroids weighted by both the confidence mask and the
    mean MC probability (object) / 1-probability (background).
    """
    masks, weights, std_map, conf = _rectify_masks(
        mask_before, feature, mc_logits, pseudo_threshold, std_threshold
    )
    protos = Prototypes(
        *(_masked_centroid(feature, m, w) for m, w in zip(masks, weights))
    )
    return RectifiedPrototypes(protos, std_map, conf)


def _rectify_masks(mask_before, feature, mc_logits, pseudo_threshold, std_threshold):
    """Shared preamble of the two ``*_retrify`` variants: per-region
    (pseudo-label x confidence) masks and mean-MC-probability weights, in
    Prototypes field order (cup_obj, disc_obj, cup_bck, disc_bck)."""
    h, w = feature.shape[1], feature.shape[2]
    preds_soft = jax.nn.sigmoid(mc_logits / 2.0)
    if mc_logits.shape[0] > 1:
        std_map = jnp.std(preds_soft, axis=0, ddof=1)
    else:
        std_map = jnp.zeros_like(preds_soft[0])
    prediction = jnp.mean(jax.nn.sigmoid(mc_logits), axis=0)
    prediction_small = resize_bilinear_align_corners(prediction, (h, w))
    std_small = resize_bilinear_align_corners(std_map, (h, w))

    pseudo = (jax.nn.sigmoid(mask_before) > pseudo_threshold).astype(feature.dtype)
    conf = (std_small < std_threshold).astype(feature.dtype)

    masks = (
        pseudo[..., 0:1] * conf[..., 0:1],
        pseudo[..., 1:2] * conf[..., 1:2],
        (1.0 - pseudo[..., 0:1]) * conf[..., 0:1],
        (1.0 - pseudo[..., 1:2]) * conf[..., 1:2],
    )
    weights = (
        prediction_small[..., 0:1],
        prediction_small[..., 1:2],
        1.0 - prediction_small[..., 0:1],
        1.0 - prediction_small[..., 1:2],
    )
    return masks, weights, std_map, conf


def gen_prototype_src_trg_retrify(
    pred_s: jnp.ndarray,  # [B, h, w, 2] soft source GT masks (feature res)
    feat_s: jnp.ndarray,  # [B, h, w, C]
    mask_before_t: jnp.ndarray,  # [B, h, w, 2] target mask logits (feature res)
    feat_t: jnp.ndarray,  # [B, h, w, C]
    mc_logits: jnp.ndarray,  # [T, B, H, W, 2] MC-dropout mask logits (full res)
    pseudo_threshold: float = 0.75,
    std_threshold: float = 0.04,
) -> Prototypes:
    """Joint source+target MC-rectified centroids (Utils.py:227-311).

    Source contributes plain soft-GT-weighted sums; target contributes
    pseudo-label x (std<thr) masked sums weighted by the mean MC
    probability; numerators and mask masses are summed across domains
    *before* the division (Utils.py:306-314), so each centroid is the
    pixel-mass-weighted blend of the two domains. The reference's only call
    site is commented out (Trainer_prototype_full.py:400-430); provided for
    API completeness and enabled nowhere by default.
    """
    pred_regions = (
        pred_s[..., 0:1],
        pred_s[..., 1:2],
        1.0 - pred_s[..., 0:1],
        1.0 - pred_s[..., 1:2],
    )
    masks_t, weights_t, _, _ = _rectify_masks(
        mask_before_t, feat_t, mc_logits, pseudo_threshold, std_threshold
    )
    out = []
    for m_s, m_t, w_t in zip(pred_regions, masks_t, weights_t):
        num_s, den_s = _masked_sums(feat_s, m_s)
        num_t, den_t = _masked_sums(feat_t, m_t, w_t)
        out.append((num_s + num_t) / (den_s + den_t + _EPS))
    return Prototypes(*out)


def ema_update(bank: Prototypes, current: Prototypes, decay: float) -> Prototypes:
    """EMA prototype-bank update, ``new = (1-decay)*bank + decay*current``
    (Trainer_prototype_full.py:100-109,347-351 — note the reference's
    ``global_pro_weight`` weights the *current* batch)."""
    return Prototypes(
        *(
            (1.0 - decay) * b + decay * jax.lax.stop_gradient(c)
            for b, c in zip(bank, current)
        )
    )


def intra_domain_loss(src: Prototypes, trg: Prototypes) -> jnp.ndarray:
    """Inter-domain alignment ("intra") loss: 4x MSE between matching
    source/target centroids (Trainer_prototype_full.py:428-441)."""
    return (
        jnp.mean(jnp.square(src.cup_obj - trg.cup_obj))
        + jnp.mean(jnp.square(src.disc_obj - trg.disc_obj))
        + jnp.mean(jnp.square(src.cup_bck - trg.cup_bck))
        + jnp.mean(jnp.square(src.disc_bck - trg.disc_bck))
    )


def inter_domain_loss(src: Prototypes) -> jnp.ndarray:
    """Source obj-vs-bck separation, computed-and-logged-only in the
    reference (Trainer_prototype_full.py:443-449,465)."""
    return jnp.mean(jnp.square(src.disc_obj - src.disc_bck)) + jnp.mean(
        jnp.square(src.cup_obj - src.cup_bck)
    )


def source_discriminative_loss(
    feature: jnp.ndarray,  # [B, h, w, C] source features
    pred: jnp.ndarray,  # [B, h, w, 2] GT masks nearest-resized to feature res
    protos: Prototypes,
) -> jnp.ndarray:
    """Prototype-guided discriminative regularization on source
    (``loss_src_reg`` of the bytecode-only Trainer_prototype_mt).

    Instruction-verified against the disassembly (tools/pyc_disasm.py) of
    Trainer_prototype_mt.cpython-38.pyc, train_epoch offsets 1866-2244
    (source :438-476): per-pixel squared Euclidean distances to the own- and
    opposite-region centroids, CHANNEL-MEAN (``torch.mean(pow(f-c,2),dim=1)``),
    hinged with margin +0.01 (``F.relu(d_own - d_other + 0.01)``), weighted by
    the region's soft GT mask (``pred_oS[:, i]`` / ``1 - pred_oS[:, i]``) and
    reduced with a plain global mean (NOT mask-normalized). The ``*_norm``
    locals in the bytecode are straight aliases — there is NO feature or
    centroid normalization (offsets 1866-1884 are bare LOAD/STORE pairs).
    Gradients flow into both the features and the centroids: the bytecode's
    loss reads the grad-carrying EMA blends, not ``self.*`` (which store
    ``.detach()`` copies for the next iteration).

        loss_i_obj = mean( pred_i     * relu(d(f,c_i_obj) - d(f,c_i_bck) + 0.01) )
        loss_i_bck = mean((1-pred_i)  * relu(d(f,c_i_bck) - d(f,c_i_obj) + 0.01) )
        loss = loss_0_obj + loss_0_bck + loss_1_obj + loss_1_bck   (0=cup, 1=disc)
    """
    margin = 0.01

    def chan_dist(c):
        return jnp.mean(jnp.square(feature - c), axis=-1)  # [B, h, w]

    d_cup_obj = chan_dist(protos.cup_obj)
    d_cup_bck = chan_dist(protos.cup_bck)
    d_disc_obj = chan_dist(protos.disc_obj)
    d_disc_bck = chan_dist(protos.disc_bck)
    cup = pred[..., 0]
    disc = pred[..., 1]
    loss_0_obj = jnp.mean(cup * jax.nn.relu(d_cup_obj - d_cup_bck + margin))
    loss_0_bck = jnp.mean((1.0 - cup) * jax.nn.relu(d_cup_bck - d_cup_obj + margin))
    loss_1_obj = jnp.mean(disc * jax.nn.relu(d_disc_obj - d_disc_bck + margin))
    loss_1_bck = jnp.mean((1.0 - disc) * jax.nn.relu(d_disc_bck - d_disc_obj + margin))
    return loss_0_obj + loss_0_bck + loss_1_obj + loss_1_bck


def masked_pool_mean(
    feature: jnp.ndarray, mask: jnp.ndarray, eps: float = 1.0
) -> jnp.ndarray:
    """Per-image masked pooling with smoothed denominator, then batch
    mean: ``mean_b( sum_hw(feat*mask) / (sum_hw(mask)+eps) )`` — the bmm
    pooling used by Trainer_prototype (:360-383, eps=+1 everywhere) and
    cal_prototype (:156-175). The bytecode-only
    Trainer_prototype_delete_en uses eps=+1e-16 for the cup/disc pools
    (keeping +1 for bu) — instruction-verified via tools/pyc_disasm.py
    (train_epoch :388/:395 and the target-side pools).
    [B,h,w,C] x [B,h,w,1] -> [C]."""
    num = jnp.sum(feature * mask, axis=(1, 2))  # [B, C]
    den = jnp.sum(mask, axis=(1, 2)) + eps  # [B, 1]
    return jnp.mean(num / den, axis=0)


def adaptation_factor(m) -> jnp.ndarray:
    """Epoch-ramped pseudo-label threshold (Utils.py:104-107):
    ``1/(1+exp(-0.8(m+1))) - 0.3``."""
    return 1.0 / (1.0 + jnp.exp(-0.8 * (m + 1.0))) - 0.3


def cosine_prototype_weight(feature: jnp.ndarray, prototype: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel cosine similarity to a prototype (Utils.py:86-103),
    [B,h,w,C] x [C] -> [B,h,w,1]."""
    fn = feature / (jnp.linalg.norm(feature, axis=-1, keepdims=True) + 1e-8)
    pn = prototype / (jnp.linalg.norm(prototype) + 1e-8)
    return jnp.einsum("bhwc,c->bhw", fn, pn)[..., None]


def feat_prototype_distance(feature: jnp.ndarray, prototype: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L2 distance map to a prototype
    (Trainer_prototype.py:98-104), [B,h,w,C] x [C] -> [B,h,w,1]."""
    d = jnp.linalg.norm(feature - prototype[None, None, None, :], axis=-1)
    return d[..., None]


def minmax_prototype_weight(dist: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalized distance weight (Trainer_prototype.py:106-116)."""
    lo = jnp.min(dist)
    hi = jnp.max(dist)
    return (dist - lo) / (hi - lo + _EPS)
