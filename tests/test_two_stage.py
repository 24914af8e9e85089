"""The two-stage accuracy protocol, chained end-to-end in miniature
(VERDICT r3 item 2): stage-1 BEAL-style adversarial training produces a
best-Dice checkpoint; stage 2 (the flagship prototype_full) warm-starts
from it via cfg.run.initial_resume — the reference's production flow
(train_use_fix_initial.py:183-199,228-256; configs/beal_*.yaml ->
clr_*.yaml)."""

import os

import jax
import numpy as np

from uda_clr_tpu.config import Config


def _cfg(tmp_path, method: str, out: str) -> Config:
    cfg = Config()
    cfg.model.output_stride = 16
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 4
    cfg.data.image_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 1
    cfg.method.method = method
    cfg.method.mc_samples = 2
    cfg.method.warmup_epoch = 0
    cfg.run.out_dir = str(tmp_path / out)
    cfg.run.interval_validate = 1
    cfg.run.seed = 0
    return cfg


def test_two_stage_beal_to_clr_chain(tmp_path):
    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    # ---- stage 1: BEAL bootstrap (configs/beal_*.yaml in miniature)
    cfg1 = _cfg(tmp_path, "adversarial", "beal")
    cfg1.run.max_epoch = 2
    tr1 = Trainer(cfg1)
    tr1.train()
    assert tr1.best_epoch > 0  # validation ran and saved a best checkpoint
    ckpt_dir = os.path.join(cfg1.run.out_dir, "checkpoints")
    best_tag = f"checkpoint_{tr1.best_epoch}"
    best_path = os.path.join(ckpt_dir, best_tag)
    assert os.path.isdir(best_path)

    # ---- stage 2: full CLR warm-started from stage 1's best checkpoint
    # (configs/clr_*.yaml's --initial-resume flow)
    cfg2 = _cfg(tmp_path, "prototype_full", "clr")
    cfg2.run.max_epoch = 1
    cfg2.run.initial_resume = best_path
    tr2 = Trainer(cfg2)

    # the warm start actually loaded: stage 2's generator equals the
    # checkpointed stage-1 weights, not a fresh init
    restored, _ = ckpt_lib.restore_checkpoint(ckpt_dir, best_tag, tr1.state)
    want = jax.device_get(restored.gen_params)
    got = jax.device_get(tr2.state.gen_params)
    for path_want, path_got in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert path_want[0] == path_got[0]
        np.testing.assert_array_equal(np.asarray(path_want[1]), np.asarray(path_got[1]))

    # fresh-init control: a cold stage-2 trainer (same seed, no
    # initial_resume) must NOT share the stage-1 weights
    cfg3 = _cfg(tmp_path, "prototype_full", "clr_cold")
    cfg3.run.max_epoch = 1
    tr3 = Trainer(cfg3)
    stem_cold = np.asarray(tr3.state.gen_params["backbone"]["stem"]["conv"]["kernel"])
    stem_warm = np.asarray(got["backbone"]["stem"]["conv"]["kernel"])
    assert np.abs(stem_cold - stem_warm).max() > 0

    # and stage 2 actually TRAINS from the warm start
    m = tr2.train_epoch()
    assert np.isfinite(m["loss_all"]) and np.isfinite(m["loss_seg"])
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(tr2.state.gen_params), want,
    )
    assert max(jax.tree.leaves(moved)) > 0
    val = tr2.validate()
    assert 0.0 <= val["cup_dice"] <= 1.0
    # the stage-1 best checkpoint ON DISK is untouched by the stage-2 run
    # (note: tr1's FINAL params legitimately differ from the BEST checkpoint
    # whenever best_epoch < max_epoch, so the invariant is disk-vs-disk)
    restored2, _ = ckpt_lib.restore_checkpoint(ckpt_dir, best_tag, tr1.state)
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(restored2.gen_params)),
        jax.tree_util.tree_leaves_with_path(want),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
