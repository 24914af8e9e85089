"""Visualization + extra transform smoke tests."""

import numpy as np
from PIL import Image

from uda_clr_tpu.data.transforms import (
    FixedResize,
    Normalize,
    Normalize_cityscapes,
    RandomSizedCrop,
    Resize,
    ResizeImg,
    Scale,
)
from uda_clr_tpu.utils.visualize import (
    construct_color_img,
    draw_boundary,
    draw_ent,
    draw_mask,
    joint_val_image,
    save_per_img,
    save_val_img,
    untransform,
)


def _sample(size=40):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    lbl = Image.fromarray(np.full((size, size), 128, dtype=np.uint8), "L")
    return {"image": img, "label": lbl, "img_name": "x.png"}


def test_extra_transforms_shapes():
    rng = np.random.default_rng(1)
    s = FixedResize((20, 24))(_sample())
    assert s["image"].size == (24, 20)
    s = Scale(20)(_sample())
    assert s["image"].size == (20, 20)
    s = RandomSizedCrop(16)(_sample(), rng)
    assert s["image"].size == (16, 16)
    s = ResizeImg(12)(_sample())
    assert s["image"].size == (12, 12)
    s = Resize(12)(_sample())
    assert s["image"].size == (12, 12) and s["label"].size == (12, 12)
    s = Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))(_sample())
    assert s["image"].dtype == np.float32 and abs(s["image"]).max() <= 1.0
    s = Normalize_cityscapes((10, 10, 10))(_sample())
    assert s["image"].dtype == np.float32


def test_visualization_outputs(tmp_path):
    rng = np.random.default_rng(2)
    pred = rng.uniform(0, 1, (32, 32, 2)).astype(np.float32)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    mask = (pred > 0.5).astype(np.float32)

    assert construct_color_img(pred[..., 0]).shape == (32, 32, 3)
    draw_ent(pred, str(tmp_path), "a.png")
    draw_mask(pred, str(tmp_path), "a.png")
    draw_boundary(pred[..., 0], str(tmp_path), "a.png")
    assert (tmp_path / "cup" / "a.png").exists()
    assert (tmp_path / "disc" / "a.png").exists()
    assert (tmp_path / "boundary" / "a.png").exists()

    strip = joint_val_image(img, pred, mask)
    assert strip.shape == (32, 32 * 4, 3)
    save_val_img(str(tmp_path), 3, [strip, strip])
    assert (tmp_path / "visualization" / "epoch_3.png").exists()

    patch = (img * 255).astype(np.uint8)
    # blob-shaped probability map so contours exist
    yy, xx = np.mgrid[0:32, 0:32]
    blob = (((yy - 16) ** 2 + (xx - 16) ** 2) < 100).astype(np.float32)
    pm = np.stack([blob, blob], -1)
    save_per_img(patch, str(tmp_path), "b.png", pm)
    assert (tmp_path / "overlay" / "b.png").exists()
    assert (tmp_path / "original_image" / "b.png").exists()

    im2, lt2 = untransform(img * 2 - 1, mask)
    assert im2.min() >= 0 and im2.max() <= 255.0001
