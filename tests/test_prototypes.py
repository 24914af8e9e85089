"""Prototype math parity against a direct torch transcription of
reference utils/Utils.py formulas."""

import numpy as np
import torch

from uda_clr_tpu.ops.prototypes import (
    Prototypes,
    adaptation_factor,
    ema_update,
    gen_prototype,
    gen_prototype_retrify,
    inter_domain_loss,
    intra_domain_loss,
)


def _torch_gen_prototype(pred_nchw, feat_nchw):
    """Direct transcription of Utils.py:108-131 for the oracle."""
    cup = pred_nchw[:, 0:1]
    disc = pred_nchw[:, 1:]
    outs = []
    for m in (cup, disc, 1.0 - cup, 1.0 - disc):
        num = torch.sum(feat_nchw * m, dim=[0, 2, 3])
        den = torch.sum(m, dim=[0, 2, 3])
        outs.append((num / den).numpy())
    return outs  # cup_obj, disc_obj, cup_bck, disc_bck


def test_gen_prototype_matches_torch_oracle():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (2, 8, 8, 2)).astype(np.float32)
    feat = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    got = gen_prototype(pred, feat)
    want = _torch_gen_prototype(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
    )
    for g, w in zip([got.cup_obj, got.disc_obj, got.cup_bck, got.disc_bck], want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5)


def test_gen_prototype_retrify_semantics():
    rng = np.random.default_rng(1)
    B, H, W, h, w, C, T = 2, 16, 16, 8, 8, 6, 8
    mask_before = rng.standard_normal((B, h, w, 2)).astype(np.float32)
    feature = rng.standard_normal((B, h, w, C)).astype(np.float32)
    mc_logits = rng.standard_normal((T, B, H, W, 2)).astype(np.float32) * 0.1
    out = gen_prototype_retrify(mask_before, feature, mc_logits)

    # torch oracle for the std map (unbiased std of sigmoid(x/2) over T)
    t_logits = torch.from_numpy(mc_logits)
    std = torch.std(torch.sigmoid(t_logits / 2.0), dim=0).numpy()
    np.testing.assert_allclose(np.asarray(out.std_map), std, rtol=1e-4, atol=1e-5)
    # low-noise logits -> low std -> all pixels confident
    assert np.asarray(out.conf_mask).min() == 1.0
    for v in out.prototypes:
        assert np.all(np.isfinite(np.asarray(v)))


def test_ema_update_and_losses():
    rng = np.random.default_rng(2)
    a = Prototypes(*(rng.standard_normal(4).astype(np.float32) for _ in range(4)))
    b = Prototypes(*(rng.standard_normal(4).astype(np.float32) for _ in range(4)))
    upd = ema_update(a, b, 0.9)
    np.testing.assert_allclose(
        np.asarray(upd.cup_obj), 0.1 * a.cup_obj + 0.9 * b.cup_obj, rtol=1e-6
    )
    want_intra = sum(float(np.mean((x - y) ** 2)) for x, y in zip(a, b))
    np.testing.assert_allclose(float(intra_domain_loss(a, b)), want_intra, rtol=1e-5)
    want_inter = float(np.mean((a.disc_obj - a.disc_bck) ** 2)) + float(
        np.mean((a.cup_obj - a.cup_bck) ** 2)
    )
    np.testing.assert_allclose(float(inter_domain_loss(a)), want_inter, rtol=1e-5)


def test_adaptation_factor():
    import math

    for m in [0, 5, 24, 100]:
        want = 1.0 / (1.0 + math.exp(-0.8 * (m + 1))) - 0.3
        np.testing.assert_allclose(float(adaptation_factor(m)), want, rtol=1e-6)


def _torch_src_trg_retrify(pred_s, feat_s, o_before_t, feat_t, preds_TB):
    """Direct transcription of Utils.py:227-311 (NCHW torch oracle)."""
    import torch.nn.functional as F

    preds1 = torch.sigmoid(preds_TB)
    soft = torch.sigmoid(preds_TB / 2.0)
    std_map = torch.std(soft, dim=0)
    prediction = torch.mean(preds1, dim=0)
    h, w = feat_t.shape[2], feat_t.shape[3]
    pred_small = F.interpolate(prediction, size=(h, w), mode="bilinear", align_corners=True)
    std_small = F.interpolate(std_map, size=(h, w), mode="bilinear", align_corners=True)

    pseudo = torch.sigmoid(o_before_t).clone()
    pseudo[pseudo > 0.75] = 1.0
    pseudo[pseudo <= 0.75] = 0.0
    t_obj = [pseudo[:, 0:1], pseudo[:, 1:]]
    t_bck = [1.0 - t_obj[0], 1.0 - t_obj[1]]
    conf = [(std_small[:, 0:1] < 0.04).float(), (std_small[:, 1:] < 0.04).float()]
    pw = [pred_small[:, 0:1], pred_small[:, 1:]]

    s_obj = [pred_s[:, 0:1], pred_s[:, 1:]]
    s_bck = [1.0 - s_obj[0], 1.0 - s_obj[1]]

    outs = []
    for s_m, t_m, c, weight in (
        (s_obj[0], t_obj[0], conf[0], pw[0]),
        (s_obj[1], t_obj[1], conf[1], pw[1]),
        (s_bck[0], t_bck[0], conf[0], 1.0 - pw[0]),
        (s_bck[1], t_bck[1], conf[1], 1.0 - pw[1]),
    ):
        num_t = torch.sum(feat_t * t_m * c * weight, dim=[0, 2, 3])
        den_t = torch.sum(c * t_m * weight, dim=[0, 2, 3])
        num_s = torch.sum(feat_s * s_m, dim=[0, 2, 3])
        den_s = torch.sum(s_m, dim=[0, 2, 3])
        outs.append(((num_s + num_t) / (den_s + den_t)).numpy())
    return outs  # cup_obj, disc_obj, cup_bck, disc_bck


def test_gen_prototype_src_trg_retrify_matches_torch_oracle():
    from uda_clr_tpu.ops.prototypes import gen_prototype_src_trg_retrify

    rng = np.random.default_rng(3)
    B, H, W, h, w, C, T = 2, 16, 16, 8, 8, 6, 8
    pred_s = rng.uniform(0, 1, (B, h, w, 2)).astype(np.float32)
    feat_s = rng.standard_normal((B, h, w, C)).astype(np.float32)
    mask_before_t = rng.standard_normal((B, h, w, 2)).astype(np.float32) * 2.0
    feat_t = rng.standard_normal((B, h, w, C)).astype(np.float32)
    # mix of confident (tiny spread) and uncertain (large spread) pixels so
    # the std<0.04 mask is non-trivial
    base = rng.standard_normal((1, B, H, W, 2)).astype(np.float32)
    spread = rng.uniform(0, 1, (1, B, H, W, 2)) > 0.5
    mc = base + rng.standard_normal((T, B, H, W, 2)).astype(np.float32) * np.where(
        spread, 1.0, 0.01
    ).astype(np.float32)

    got = gen_prototype_src_trg_retrify(pred_s, feat_s, mask_before_t, feat_t, mc)
    want = _torch_src_trg_retrify(
        torch.from_numpy(pred_s.transpose(0, 3, 1, 2)),
        torch.from_numpy(feat_s.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask_before_t.transpose(0, 3, 1, 2)),
        torch.from_numpy(feat_t.transpose(0, 3, 1, 2)),
        torch.from_numpy(mc.transpose(0, 1, 4, 2, 3)),
    )
    for g, name, wv in zip(got, ("cup_obj", "disc_obj", "cup_bck", "disc_bck"), want):
        np.testing.assert_allclose(np.asarray(g), wv, rtol=2e-4, atol=2e-5, err_msg=name)
