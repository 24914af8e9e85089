"""Validation-image strips are written when enabled."""

import numpy as np

from uda_clr_tpu.config import Config


def test_validate_saves_strips(tmp_path):
    from uda_clr_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 4
    cfg.data.image_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 1
    cfg.method.method = "baseline"
    cfg.run.out_dir = str(tmp_path / "viz")
    cfg.run.max_epoch = 1
    cfg.run.save_val_images = True
    tr = Trainer(cfg)
    val = tr.validate()
    assert np.isfinite(val["loss"])
    out = tmp_path / "viz" / "visualization" / "epoch_0.png"
    assert out.exists() and out.stat().st_size > 0
