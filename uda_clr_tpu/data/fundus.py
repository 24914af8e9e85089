"""Fundus ROI segmentation dataset (reference dataloaders/fundus_dataloader.py).

Directory layout: ``{base}/{dataset}/{split}/ROIs/image/*.png`` with labels
at ``.../ROIs/mask/*.png``. Like the reference, images are decoded once into
RAM (datasets are a few hundred ROI crops); unlike the reference this class
is framework-free — batching/transform scheduling lives in
uda_clr_tpu.data.pipeline.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np
from PIL import Image


class FundusSegmentation:
    def __init__(self, base_dir: str, dataset: str = "refuge", split: str = "train",
                 transform=None):
        self._base_dir = base_dir
        self.dataset = dataset
        self.split = split
        self.transform = transform
        self._image_dir = os.path.join(base_dir, dataset, split, "ROIs", "image")
        image_paths = sorted(glob(os.path.join(self._image_dir, "*.png")))
        if not image_paths:
            raise FileNotFoundError(f"no images under {self._image_dir}")
        self.image_pool: list[Image.Image] = []
        self.label_pool: list[Image.Image] = []
        self.img_name_pool: list[str] = []
        for image_path in image_paths:
            gt_path = image_path.replace("image", "mask")
            self.image_pool.append(Image.open(image_path).convert("RGB"))
            target = Image.open(gt_path)
            if target.mode == "RGB":
                target = target.convert("L")
            self.label_pool.append(target)
            self.img_name_pool.append(os.path.basename(image_path))

    def __len__(self) -> int:
        return len(self.image_pool)

    def __getitem__(self, index: int):
        sample = {
            "image": self.image_pool[index],
            "label": self.label_pool[index],
            "img_name": self.img_name_pool[index],
        }
        return sample

    def get(self, index: int, rng: np.random.Generator):
        sample = self[index]
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample

    def __str__(self) -> str:
        return f"Fundus(dataset={self.dataset}, split={self.split}, n={len(self)})"
