"""E2E smokes for the bytecode-only trainer-variant ablations
(VERDICT r2 item 4). Evidence for each switch is quoted in
train/steps.py:make_train_step's docstring; reference bytecode:
/root/reference/train_process/__pycache__/Trainer_posal.cpython-38.pyc,
Trainer_MT_wo_ad.cpython-38.pyc, Trainer_baseline_wob.cpython-38.pyc,
Trainer_prototype_delete_en.cpython-38.pyc."""

import numpy as np
import pytest

from tests.test_train_e2e import _tiny_cfg


def _one_epoch(tmp_path, method, **overrides):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, method, warmup_epoch=0, **overrides)
    tr = Trainer(cfg)
    tr.epoch = 1
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"])
    return tr, m


def test_posal_single_discriminator(tmp_path):
    """Trainer_posal: adversarial UDA with ONLY the boundary PatchGAN —
    bytecode has model_dis/optim_dis and zero entropy-D symbols."""
    tr, m = _one_epoch(tmp_path, "posal")
    assert "loss_adv" in m and "loss_D" in m
    assert "loss_D2" not in m  # the entropy discriminator never runs
    # the entropy D's params were never updated (still at init)
    cfg2 = _tiny_cfg(tmp_path, "adversarial", warmup_epoch=0)
    cfg2.run.out_dir = str(tmp_path / "adv_ref")
    from uda_clr_tpu.train.trainer import Trainer

    tr2 = Trainer(cfg2)
    d2_init = np.asarray(tr2.state.dis2_params["conv1"]["conv"]["kernel"])
    d2_after = np.asarray(tr.state.dis2_params["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(d2_init, d2_after)
    # ... while the boundary D did move
    d_init = np.asarray(tr2.state.dis_params["conv1"]["conv"]["kernel"])
    d_after = np.asarray(tr.state.dis_params["conv1"]["conv"]["kernel"])
    assert np.abs(d_init - d_after).max() > 0


def test_mt_wo_ad_no_discriminators(tmp_path):
    """Trainer_MT_wo_ad: mean teacher WITHOUT the adversarial branch
    (bytecode: student/teacher + consistency symbols, no D symbols)."""
    tr, m = _one_epoch(tmp_path, "mean_teacher", use_adv=False)
    assert "loss_consistency" in m
    assert "loss_adv" not in m and "loss_D" not in m and "loss_D2" not in m


def test_baseline_wob_drops_boundary_term(tmp_path):
    """Trainer_baseline_wob: supervised baseline without the boundary MSE
    (bytecode train_epoch has loss_seg1 but no loss_seg2). With the term
    off, loss_seg must equal the pure mask BCE — strictly smaller than the
    with-boundary run from the same seed/data."""
    _, m_wob = _one_epoch(tmp_path, "baseline", use_boundary_loss=False)
    cfg = _tiny_cfg(tmp_path, "baseline", warmup_epoch=0)
    cfg.run.out_dir = str(tmp_path / "baseline_wb")
    from uda_clr_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    tr.epoch = 1
    m_wb = tr.train_epoch()
    assert m_wob["loss_seg"] < m_wb["loss_seg"]


def test_prototype_delete_en_drops_bu_term(tmp_path):
    """Trainer_prototype_delete_en: the bank method without the bu
    prototype-distance term (bytecode logs train_pro/loss_cup and
    loss_disc but no loss_bu)."""
    _, m = _one_epoch(tmp_path, "prototype", bank_use_bu=False)
    assert "loss_cup" in m and "loss_disc" in m
    assert "loss_bu" not in m


def test_prototype_wotn_weight_rectify_and_initial_pseudo(tmp_path):
    """Trainer_prototype_woTN (instruction-verified round 3): the bank
    method with plain BN, min-max L2-distance weight rectification of the
    target soft maps, and pseudo-labels from the frozen initial model's
    'before' heads. The frozen model must not move; the rectified run must
    diverge from the plain bank run on the same seed/data."""
    tr, m = _one_epoch(
        tmp_path, "prototype", use_weight_rectify=True, pseudo_from_initial=True
    )
    assert "loss_cup" in m and "loss_disc" in m and "loss_bu" in m
    # the frozen pseudo-label model is present and training moved only the
    # live generator away from it
    import jax

    assert tr.state.initial_params is not None
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.state.initial_params, tr.state.gen_params,
    )
    assert max(jax.tree.leaves(diffs)) > 0

    cfg2 = _tiny_cfg(tmp_path, "prototype", warmup_epoch=0)
    cfg2.run.out_dir = str(tmp_path / "bank_plain")
    from uda_clr_tpu.train.trainer import Trainer

    tr2 = Trainer(cfg2)
    tr2.epoch = 1
    m_plain = tr2.train_epoch()
    assert m["loss_cup"] != m_plain["loss_cup"]  # rectification changed the pools


def test_wotn_frozen_initial_survives_checkpoint_roundtrip(tmp_path):
    """The frozen pseudo-label model (TrainState.initial_params, populated
    by pseudo_from_initial) must ride through an orbax save/restore: on
    resume, the restored snapshot must win over the fresh-init snapshot the
    constructor takes (Trainer.__init__ snapshots BEFORE _resume), so the
    pseudo-label source stays the one the original run froze."""
    import jax

    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(
        tmp_path, "prototype", warmup_epoch=0,
        use_weight_rectify=True, pseudo_from_initial=True,
    )
    tr = Trainer(cfg)
    tr.epoch = 1
    tr.train_epoch()
    frozen = jax.device_get(tr.state.initial_params)
    ckpt_dir = str(tmp_path / "prototype" / "checkpoints")
    ckpt_lib.save_checkpoint(ckpt_dir, tr.state, epoch=1, best_mean_dice=0.1, tag="checkpoint_1")

    cfg2 = _tiny_cfg(
        tmp_path, "prototype", warmup_epoch=0,
        use_weight_rectify=True, pseudo_from_initial=True,
    )
    cfg2.run.out_dir = str(tmp_path / "wotn_resume")
    cfg2.run.resume = ckpt_dir
    cfg2.run.seed = 3  # different init, so a clobbered snapshot would differ
    tr2 = Trainer(cfg2)
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(jax.device_get(tr2.state.initial_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_config_unchanged_by_switches(tmp_path):
    """The new switches default to the full method: prototype_full still
    reports both D losses and the adversarial term."""
    tr, m = _one_epoch(tmp_path, "prototype_full")
    assert {"loss_adv", "loss_D", "loss_D2", "loss_intra"} <= set(m)
