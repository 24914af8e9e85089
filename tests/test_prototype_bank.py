"""Trainer_prototype (disk-bank) variant + cal_prototype tool tests."""

import numpy as np

from uda_clr_tpu.config import Config


def test_cal_prototype_tool(tmp_path):
    import jax
    import jax.numpy as jnp

    from uda_clr_tpu.data.pipeline import BatchLoader
    from uda_clr_tpu.data.synthetic import SyntheticFundus
    from uda_clr_tpu.data.transforms import eval_transforms
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.tools.cal_prototype import compute_prototypes

    model = DeepLab(num_classes=2, backbone="mobilenet", norm="bn")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ds = SyntheticFundus(4, 80, transform=eval_transforms(64))
    loader = BatchLoader(ds, 2, shuffle=False, drop_last=False, num_workers=1)
    bank = compute_prototypes(model, variables, loader.epoch(0))
    assert bank["bu"].shape == (304,)
    assert bank["cup"].shape == (305,)
    assert bank["disc"].shape == (305,)
    assert all(np.all(np.isfinite(v)) for v in bank.values())
    np.savez(tmp_path / "bank.npz", **bank)


def test_prototype_method_trains(tmp_path):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 4
    cfg.data.image_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 1
    cfg.method.method = "prototype"
    cfg.method.warmup_epoch = 0
    cfg.run.out_dir = str(tmp_path / "proto")
    cfg.run.max_epoch = 1
    tr = Trainer(cfg)
    bank_before = {k: np.asarray(v).copy() for k, v in tr.state.proto_bank.items()}
    tr.epoch = 1  # past warmup
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"])
    assert "loss_bu" in m and "loss_cup" in m and "loss_disc" in m
    # bank moved via EMA (non-degenerate target prototypes)
    moved = any(
        not np.array_equal(bank_before[k], np.asarray(tr.state.proto_bank[k]))
        for k in bank_before
    )
    assert moved
