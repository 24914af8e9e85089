"""DeepLabv3+ composite with the reference's 7-tuple forward contract.

Forward contract (reference networks/deeplabv3.py:32-41), NHWC here:
    mask_logits      [B, H, W, num_classes]   (x1,  upsampled, align-corners)
    boundary_logits  [B, H, W, 1]             (x2,  upsampled, align-corners)
    aspp_feature     [B, H/os, W/os, 256]
    x_bu_feature     [B, H/4, W/4, 304]
    x_feature        [B, H/4, W/4, 305]
    mask_before      [B, H/4, W/4, num_classes]
    boundary_before  [B, H/4, W/4, 1]

``norm='bn'`` corresponds to the reference's ``sync_bn=True`` wiring (plain
BatchNorm2d, deeplabv3.py:17-20, which becomes *cross-replica* BN here when
the batch is sharded over a mesh); ``norm='tn'`` is TransNorm
(``--use_TN``).

The module is split into ``features`` (backbone — no dropout anywhere in
any of the four backbones) and ``heads`` (ASPP + decoder + upsample, all
the dropout layers). MC-dropout pseudo-label rectification exploits this:
one backbone pass feeds a vmap of T dropout-sampled head passes
(train/steps.py), instead of the reference's T/2 full forwards of a
2x-repeated batch (Trainer_prototype_full.py:358-368).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from uda_clr_tpu.models.aspp import ASPP
from uda_clr_tpu.models.decoder import Decoder
from uda_clr_tpu.models.mobilenet import MobileNetV2
from uda_clr_tpu.ops.resize import resize_bilinear_align_corners

_LOW_LEVEL_FEATURES = {"mobilenet": 24, "resnet": 256, "drn": 256, "xception": 128}


class DeepLabOutputs(NamedTuple):
    mask_logits: jnp.ndarray
    boundary_logits: jnp.ndarray
    aspp_feature: jnp.ndarray
    x_bu_feature: jnp.ndarray
    x_feature: jnp.ndarray
    mask_before: jnp.ndarray
    boundary_before: jnp.ndarray


def _build_backbone(backbone: str, output_stride: int, norm: str, dtype: Any,
                    remat: bool = False):
    if backbone == "mobilenet":
        return MobileNetV2(output_stride=output_stride, norm=norm, dtype=dtype,
                           remat=remat, name="backbone")
    if backbone == "resnet":
        from uda_clr_tpu.models.resnet import ResNet101

        return ResNet101(output_stride=output_stride, norm=norm, dtype=dtype,
                         remat=remat, name="backbone")
    if backbone == "xception":
        from uda_clr_tpu.models.xception import AlignedXception

        return AlignedXception(output_stride=output_stride, norm=norm, dtype=dtype,
                               remat=remat, name="backbone")
    if backbone == "drn":
        from uda_clr_tpu.models.drn import DRN_D_54

        return DRN_D_54(norm=norm, dtype=dtype, remat=remat, name="backbone")
    raise NotImplementedError(f"backbone {backbone!r}")


class DeepLab(nn.Module):
    num_classes: int = 2
    backbone: str = "mobilenet"
    output_stride: int = 16
    norm: str = "bn"  # 'bn' | 'tn'
    dtype: Any = jnp.float32
    # rematerialize backbone blocks (jax.checkpoint) — trades backbone
    # recompute for HBM, admitting larger per-chip batches; numerics are
    # bit-identical (tests/test_remat.py, PARITY.md "Batch-size scaling")
    remat: bool = False

    def setup(self):
        output_stride = 8 if self.backbone == "drn" else self.output_stride
        self._os = output_stride
        self.backbone_net = _build_backbone(self.backbone, output_stride, self.norm,
                                            self.dtype, self.remat)
        self.aspp = ASPP(output_stride=output_stride, norm=self.norm, dtype=self.dtype)
        self.decoder = Decoder(
            num_classes=self.num_classes,
            low_level_features=_LOW_LEVEL_FEATURES[self.backbone],
            norm=self.norm,
            dtype=self.dtype,
        )

    def features(self, x: jnp.ndarray, train: bool = False, domains: int = 1):
        """Backbone only (deterministic — no dropout in any backbone)."""
        return self.backbone_net(x, train, domains)

    def heads_prefix(self, high, low, train: bool = False, domains: int = 1):
        """Deterministic (pre-dropout) part of the heads: full ASPP minus
        its final Dropout(0.5), plus the decoder's low-level projection.
        The MC fast path runs this ONCE at batch B and replicates the two
        outputs T times before sampling — bit-identical to replicating
        first (BN moments over T identical copies equal the per-batch
        moments), at 1/T of the compute (train/steps.py)."""
        feat_predrop = self.aspp.predrop(high, train, domains)
        ll = self.decoder.low_prefix(low, train, domains)
        return feat_predrop, ll

    def heads_suffix(self, feat_predrop, ll, out_hw, train: bool = False,
                     domains: int = 1) -> DeepLabOutputs:
        """Dropout-bearing remainder: ASPP dropout + decoder heads +
        align-corners upsample to ``out_hw``."""
        feat = self.aspp.drop(feat_predrop, train)
        x1, boundary, x_bu_feature, x_feature = self.decoder.suffix(feat, ll, train, domains)
        mask_logits = resize_bilinear_align_corners(x1, out_hw)
        boundary_logits = resize_bilinear_align_corners(boundary, out_hw)
        return DeepLabOutputs(
            mask_logits, boundary_logits, feat, x_bu_feature, x_feature, x1, boundary
        )

    def heads(self, high, low, out_hw, train: bool = False, domains: int = 1) -> DeepLabOutputs:
        """ASPP + dual-head decoder + align-corners upsample to ``out_hw``."""
        feat_predrop, ll = self.heads_prefix(high, low, train, domains)
        return self.heads_suffix(feat_predrop, ll, out_hw, train, domains)

    def __call__(self, x: jnp.ndarray, train: bool = False, domains: int = 1) -> DeepLabOutputs:
        high, low = self.features(x, train, domains)
        return self.heads(high, low, (x.shape[1], x.shape[2]), train, domains)


# Backwards-compatible alias used by a few call sites/tests.
def build_backbone(backbone: str, output_stride: int, norm: str, dtype: Any):
    return _build_backbone(backbone, output_stride, norm, dtype)
