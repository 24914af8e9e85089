"""Real-dataset readiness (VERDICT r3 item 7): fail-fast layout validation
for the fundus directory convention, and a from-disk round trip of a
reference-format torch ``.pth.tar`` checkpoint through the Trainer's
``--initial-resume`` path (previous rounds only tested in-process
state_dicts; the ``torch.load``-a-file path in trainer._initial_resume was
uncovered)."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from uda_clr_tpu.config import Config
from uda_clr_tpu.data.fundus import FundusSegmentation, validate_layout


def _make_layout(root, dataset="refuge", split="train", n=2, size=32,
                 skip_mask_for=()):
    img_dir = root / dataset / split / "ROIs" / "image"
    mask_dir = root / dataset / split / "ROIs" / "mask"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f"sample_{i:03d}.png"
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(
            img_dir / name)
        if name not in skip_mask_for:
            Image.fromarray(
                rng.integers(0, 255, (size, size), dtype=np.uint8), mode="L"
            ).save(mask_dir / name)
    return img_dir, mask_dir


def test_validator_accepts_good_layout_and_dataset_loads(tmp_path):
    _make_layout(tmp_path, n=3)
    paths = validate_layout(str(tmp_path), "refuge", "train")
    assert len(paths) == 3
    ds = FundusSegmentation(str(tmp_path), "refuge", "train")
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].mode == "RGB" and s["label"].mode == "L"
    assert s["img_name"] == "sample_000.png"


def test_validator_names_missing_dataset_dir(tmp_path):
    _make_layout(tmp_path, dataset="refuge")
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "Drishti-GS", "train")
    msg = str(ei.value)
    # names the missing level, the expected layout, and what IS there
    assert "Drishti-GS" in msg and "{root}/{dataset}/{split}/ROIs" in msg
    assert "refuge" in msg  # the sibling that exists is listed


def test_validator_names_missing_split_and_rois(tmp_path):
    _make_layout(tmp_path, split="train")
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "refuge", "test")
    assert os.path.join("refuge", "test") in str(ei.value)
    assert "train" in str(ei.value)
    # ROIs level missing
    (tmp_path / "refuge" / "test").mkdir()
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "refuge", "test")
    assert "ROIs" in str(ei.value)


def test_validator_reports_empty_image_dir_contents(tmp_path):
    img_dir = tmp_path / "refuge" / "train" / "ROIs" / "image"
    img_dir.mkdir(parents=True)
    (img_dir / "readme.txt").write_text("not a png")
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "refuge", "train")
    msg = str(ei.value)
    assert "no *.png" in msg and "readme.txt" in msg


def test_validator_catches_missing_masks(tmp_path):
    # whole mask dir missing
    img_dir = tmp_path / "refuge" / "train" / "ROIs" / "image"
    img_dir.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "a.png")
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "refuge", "train")
    assert "mask" in str(ei.value)
    # one image's mask missing
    _make_layout(tmp_path, dataset="rim", n=2, skip_mask_for=("sample_001.png",))
    with pytest.raises(FileNotFoundError) as ei:
        validate_layout(str(tmp_path), "rim", "train")
    assert "1/2" in str(ei.value) and "sample_001.png" in str(ei.value)


def test_image_component_in_data_root(tmp_path):
    """A data root (or dataset name) containing an 'image'/'mask' path
    component must not confuse the image→mask mapping — the reference's
    global ``path.replace('image','mask')`` (fundus_dataloader.py:40)
    rewrites the root too; ours joins the sibling mask dir with the
    basename."""
    root = tmp_path / "image" / "fundus"
    _make_layout(root, n=2)
    paths = validate_layout(str(root), "refuge", "train")
    assert len(paths) == 2
    ds = FundusSegmentation(str(root), "refuge", "train")
    assert len(ds) == 2
    assert ds[1]["label"].mode == "L"


def test_initial_resume_from_pth_tar_file(tmp_path):
    """Save a reference-format training checkpoint (full torch state_dicts
    incl. num_batches_tracked, as train_use_fix_initial.py:276-289 writes
    them) to a real ``.pth.tar`` FILE and warm-start a Trainer from it via
    cfg.run.initial_resume — the BEAL bootstrap
    (train_use_fix_initial.py:183-199) exercised from disk."""
    from tests.torch_ref import TorchDeepLab
    from tests.torch_step_ref import TorchPatchDiscriminator
    from uda_clr_tpu.train.trainer import Trainer

    torch.manual_seed(7)
    tm = TorchDeepLab(num_classes=2, output_stride=16, backbone="mobilenet")
    dis = TorchPatchDiscriminator(in_channels=1)   # boundary D ("model_dis")
    dis2 = TorchPatchDiscriminator(in_channels=2)  # entropy D ("model_dis2")
    ckpt_path = tmp_path / "checkpoint_25.pth.tar"
    torch.save(
        {
            "epoch": 25,
            "model_state_dict": tm.state_dict(),
            "model_dis_state_dict": dis.state_dict(),
            "model_dis2_state_dict": dis2.state_dict(),
            "best_mean_dice": 0.5,
        },
        str(ckpt_path),
    )

    cfg = Config()
    cfg.model.output_stride = 16
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 4
    cfg.data.image_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 1
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 2
    cfg.method.warmup_epoch = 0
    cfg.run.out_dir = str(tmp_path / "run")
    cfg.run.max_epoch = 1
    cfg.run.interval_validate = 10
    cfg.run.seed = 0
    cfg.run.initial_resume = str(ckpt_path)
    tr = Trainer(cfg)

    # the generator stem kernel must equal the converted torch weight —
    # proof the file was loaded, converted OIHW->HWIO, and merged
    want = tm.state_dict()["backbone.features.0.0.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(tr.state.gen_params["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, want)
    # BN running stats came through to gen_stats
    want_mean = tm.state_dict()["backbone.features.0.1.running_mean"].numpy()
    got_mean = np.asarray(tr.state.gen_stats["backbone"]["stem_bn"]["mean"])
    np.testing.assert_array_equal(got_mean, want_mean)
    # discriminators merged (N(0,0.02)-initialized flax params replaced)
    want_d = dis.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got_d = np.asarray(tr.state.dis_params["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(got_d, want_d)
    want_d2 = dis2.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got_d2 = np.asarray(tr.state.dis2_params["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(got_d2, want_d2)

    # and the warm-started trainer actually trains
    m = tr.train_epoch()
    assert np.isfinite(m["loss_all"])
