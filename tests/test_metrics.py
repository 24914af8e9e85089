"""Metric parity against direct torch/numpy transcriptions of
reference utils/metrics.py."""

import numpy as np
import torch

from uda_clr_tpu.utils.metrics import (
    SegmentationMetric,
    dice_coeff_2label,
    dice_coefficient_numpy,
    pixel_acc,
)


def test_dice_smoothing_contract():
    # empty masks -> dice = 1.0 thanks to +1 smoothing
    z = np.zeros((4, 4))
    assert dice_coefficient_numpy(z, z) == 1.0
    o = np.ones((4, 4))
    assert dice_coefficient_numpy(o, o) == (2 * 16 + 1) / (1 + 32)


def test_dice_coeff_2label_matches_torch_reference_formula():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    target = (rng.uniform(0, 1, (2, 16, 16, 2)) > 0.5).astype(np.float32)
    got = dice_coeff_2label(logits, target)

    # torch oracle (reference metrics.py:118-132)
    pred = torch.sigmoid(torch.from_numpy(logits.transpose(0, 3, 1, 2)))
    pred = (pred > 0.75).float().numpy()
    t = target.transpose(0, 3, 1, 2)

    def ref_dice(p, g):
        p = p.astype(bool)
        g = g.astype(bool)
        inter = float(np.logical_and(p, g).sum())
        return (2 * inter + 1.0) / (1.0 + p.sum() + g.sum())

    np.testing.assert_allclose(got[0], ref_dice(pred[:, 0], t[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(got[1], ref_dice(pred[:, 1], t[:, 1]), rtol=1e-6)


def test_pixel_acc_confusion_matrix():
    pred = np.array([[0, 1], [1, 1]])
    label = np.array([[0, 1], [0, 1]])
    m = SegmentationMetric(2)
    m.add_batch(pred, label)
    # confusion: label0: pred0=1 pred1=1; label1: pred1=2
    assert m.pixel_accuracy() == 3 / 4
    iou0 = 1 / (2 + 1 - 1)  # inter=1, union = rowsum+colsum-diag = 2+1-1
    iou1 = 2 / (2 + 3 - 2)
    np.testing.assert_allclose(m.mean_iou(), (iou0 + iou1) / 2)


def test_pixel_acc_end_to_end():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    target = (rng.uniform(0, 1, (1, 8, 8, 2)) > 0.5).astype(np.float32)
    pa_cup, pa_disc, iou_cup, iou_disc = pixel_acc(logits, target)
    for v in (pa_cup, pa_disc, iou_cup, iou_disc):
        assert 0.0 <= v <= 1.0
