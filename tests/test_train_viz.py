"""Train-time tensorboard image grids (reference
Trainer_prototype_full.py:307-325,519-575): tag mapping and image
normalization, without building a full Trainer."""

import numpy as np

from uda_clr_tpu.train.trainer import Trainer


class _Recorder:
    def __init__(self):
        self.images = {}

    def add_image(self, tag, img, step):
        self.images[tag] = np.asarray(img)


def test_write_train_images_reference_tags():
    t = Trainer.__new__(Trainer)  # skip heavy __init__; method only uses writer
    rec = _Recorder()
    t.writer = rec

    rng = np.random.default_rng(0)
    h = w = 16
    batch_s = {
        "image": rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32),
        "map": (rng.uniform(0, 1, (2, h, w, 2)) > 0.5).astype(np.float32),
        "boundary": rng.uniform(0, 1, (2, h, w, 1)).astype(np.float32),
    }
    batch_t = {"image": batch_s["image"], "map": batch_s["map"]}
    viz = {
        "pred_s": rng.uniform(0, 1, (h, w, 2)).astype(np.float32),
        "pred_b_s": rng.uniform(0, 1, (h, w, 1)).astype(np.float32),
        "pred_t": rng.uniform(0, 1, (h, w, 2)).astype(np.float32),
        "bnd_t_raw": rng.standard_normal((h, w, 1)).astype(np.float32),
        "std_t": rng.uniform(0, 0.1, (h, w, 2)).astype(np.float32),
        "conf_t": (rng.uniform(0, 1, (8, 8, 2)) > 0.5).astype(np.float32),
    }
    t._write_train_images(30, batch_s, batch_t, viz)

    want = {
        "DomainS/image", "DomainS/target_cup", "DomainS/target_disc",
        "DomainS/target_boundary", "DomainS/prediction_cup",
        "DomainS/prediction_disc", "DomainS/prediction_boundary",
        "DomainT/image", "DomainT/target_cup", "DomainT/target_disc",
        "DomainT/prediction_cup", "DomainT/prediction_disc", "DomainT/boundaryT",
        "DomainT/target_cup_std_map", "DomainT/target_disc_std_map",
        "DomainT/mask_0", "DomainT/mask_1",
    }
    assert set(rec.images) == want


def test_scalarwriter_add_image_normalizes(tmp_path):
    from uda_clr_tpu.utils.logging import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    img = np.linspace(-3.0, 5.0, 64, dtype=np.float32).reshape(8, 8)
    w.add_image("t/x", img, 0)  # must not raise; min-max normalized internally
    w.add_image("t/rgb", np.zeros((8, 8, 3), np.float32), 0)  # constant image
    w.close()
