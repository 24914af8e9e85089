"""Evaluate tool + TransNorm end-to-end training smoke."""

import numpy as np


def test_evaluate_tool_synthetic(tmp_path, capsys):
    from uda_clr_tpu.tools import evaluate as ev

    ev.main([
        "--synthetic", "--image-size", "64", "--batch-size", "4",
        "--postprocess", "--save-viz", str(tmp_path / "viz"),
    ])
    out = capsys.readouterr().out
    import json

    metrics = json.loads(out[out.index("{"):])
    assert set(metrics) == {"cup_dice", "disc_dice", "cup_pa", "disc_pa", "cup_iou", "disc_iou"}
    assert all(0.0 <= v <= 1.0 for v in metrics.values())
    assert (tmp_path / "viz" / "overlay").exists()


def test_transnorm_training_e2e(tmp_path):
    from uda_clr_tpu.config import Config
    from uda_clr_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.norm = "tn"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 4
    cfg.data.image_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 1
    cfg.method.method = "prototype_full"
    cfg.method.warmup_epoch = 0
    cfg.method.mc_samples = 2
    cfg.run.out_dir = str(tmp_path / "tn")
    cfg.run.max_epoch = 1
    tr = Trainer(cfg)
    tr.epoch = 1
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"]) and "loss_intra" in m
    # TransNorm per-domain stats both moved
    stats = tr.state.gen_stats["backbone_net"]["stem_bn"] if "backbone_net" in tr.state.gen_stats \
        else tr.state.gen_stats["backbone"]["stem_bn"]
    assert np.any(np.asarray(stats["mean_source"]) != 0)
    assert np.any(np.asarray(stats["mean_target"]) != 0)
    val = tr.validate()
    assert 0 <= val["cup_dice"] <= 1
