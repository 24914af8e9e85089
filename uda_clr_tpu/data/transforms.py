"""Host-side augmentation pipeline (reference dataloaders/custom_transforms.py).

Numpy/PIL/scipy re-implementation with explicit ``np.random.Generator``
randomness (the reference uses process-global ``random``/``np.random``
state; we thread a generator for reproducibility and for worker
independence). Semantics, probabilities, and parameter ranges match the
reference exactly; deliberate fixes are noted inline.

Samples are dicts. Before ``Normalize_tf``: ``{'image', 'label',
'img_name'}`` (PIL or HWC uint8 numpy). ``Normalize_tf`` re-keys to
``{'image' [H,W,3] float32 in [-1,1], 'map' [H,W,2] float32,
'boundary' [H,W,1] float32, 'img_name'}`` — channel-last throughout
(TPU-native NHWC; the reference's CHW ``ToTensor`` is a torch-ism we drop).

Label encoding contract (custom_transforms.py:443-457): grayscale mask
pixels >200 -> background, 51..200 -> disc rim (class 1), <=50 -> cup
(class 2); multilabel ch0 = cup, ch1 = disc (cup pixels set both).
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi
from PIL import Image, ImageOps


def _to_pil(img, mode=None):
    if isinstance(img, Image.Image):
        return img
    return Image.fromarray(np.asarray(img).astype(np.uint8), mode=mode)


def _to_np(img):
    return np.asarray(img)


def to_multilabel(pre_mask: np.ndarray, classes: int = 2) -> np.ndarray:
    mask = np.zeros((pre_mask.shape[0], pre_mask.shape[1], classes))
    mask[pre_mask == 1] = [0, 1]
    mask[pre_mask == 2] = [1, 1]
    return mask


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample, rng: np.random.Generator):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class RandomCrop:
    """Random 512 crop with pad-to-fit (custom_transforms.py:152-182);
    image padded with 0, mask with 255 (background)."""

    def __init__(self, size, padding=0):
        self.size = (int(size), int(size)) if isinstance(size, (int, float)) else size
        self.padding = padding

    def __call__(self, sample, rng):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        w, h = img.size
        if self.padding > 0 or w < self.size[0] or h < self.size[1]:
            padding = int(
                np.maximum(
                    self.padding,
                    np.maximum((self.size[0] - w) // 2 + 5, (self.size[1] - h) // 2 + 5),
                )
            )
            img = ImageOps.expand(img, border=padding, fill=0)
            mask = ImageOps.expand(mask, border=padding, fill=255)
        w, h = img.size
        th, tw = self.size
        if (w, h) != (tw, th):
            x1 = int(rng.integers(0, w - tw + 1))
            y1 = int(rng.integers(0, h - th + 1))
            img = img.crop((x1, y1, x1 + tw, y1 + th))
            mask = mask.crop((x1, y1, x1 + tw, y1 + th))
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class CenterCrop:
    def __init__(self, size):
        self.size = (int(size), int(size)) if isinstance(size, (int, float)) else size

    def __call__(self, sample, rng=None):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        w, h = img.size
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        img = img.crop((x1, y1, x1 + tw, y1 + th))
        mask = mask.crop((x1, y1, x1 + tw, y1 + th))
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class RandomScaleCrop:
    """p=0.5 anisotropic rescale U(0.5,1.5) then RandomCrop
    (custom_transforms.py:334-355)."""

    def __init__(self, size):
        self.size = size
        self.crop = RandomCrop(size)

    def __call__(self, sample, rng):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        if rng.random() > 0.5:
            w = int(rng.uniform(0.5, 1.5) * img.size[0])
            h = int(rng.uniform(0.5, 1.5) * img.size[1])
            img = img.resize((w, h), Image.BILINEAR)
            mask = mask.resize((w, h), Image.NEAREST)
        return self.crop({"image": img, "label": mask, "img_name": sample["img_name"]}, rng)


class RandomRotate:
    """p=0.5 rotation by a multiple of 90 degrees.

    Deliberate fix vs reference (custom_transforms.py:315-331): the
    reference draws the angle once at construction, freezing it for the
    whole run; we draw per call."""

    def __call__(self, sample, rng):
        if rng.random() > 0.5:
            k = int(rng.integers(1, 5))  # 90/180/270/360
            img = _to_pil(sample["image"]).rotate(k * 90, Image.BILINEAR, expand=False)
            mask = _to_pil(sample["label"]).rotate(k * 90, Image.NEAREST, expand=False)
            return {"image": img, "label": mask, "img_name": sample["img_name"]}
        return sample


class RandomFlip:
    def __call__(self, sample, rng):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
            mask = mask.transpose(Image.FLIP_TOP_BOTTOM)
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class elastic_transform:
    """Simard-style elastic deformation, p=0.5
    (custom_transforms.py:95-147): alpha=2W, sigma=0.08W, bilinear image /
    nearest label warp. Always converts to numpy (like the reference)."""

    def __call__(self, sample, rng):
        img = _to_pil(sample["image"])
        lbl = sample["label"]
        if rng.random() > 0.5:
            from uda_clr_tpu.data import native

            shape = img.size[0:2]
            alpha = img.size[1] * 2
            sigma = img.size[1] * 0.08
            rand_x = rng.random(shape) * 2 - 1
            rand_y = rng.random(shape) * 2 - 1
            out, out_lbl = native.elastic(
                np.asarray(img), np.asarray(_to_pil(lbl)), rand_x, rand_y, alpha, sigma
            )
            return {
                "image": out.astype(np.uint8),
                "label": out_lbl.astype(np.uint8),
                "img_name": sample["img_name"],
            }
        return {
            "image": np.asarray(img),
            "label": np.asarray(_to_pil(lbl)),
            "img_name": sample["img_name"],
        }


class add_salt_pepper_noise:
    """Salt (p=0.25) / pepper (p=0.25) speckle (custom_transforms.py:22-46).
    Keeps the reference quirk of writing value 1 (not 255) for 'salt'."""

    def __call__(self, sample, rng):
        image = np.asarray(sample["image"]).copy()
        amount, salt_vs_pepper = 0.004, 0.2
        num_salt = int(np.ceil(amount * image.size * salt_vs_pepper))
        num_pepper = int(np.ceil(amount * image.size * (1.0 - salt_vs_pepper)))
        seed = rng.random()
        if seed > 0.75:
            coords = [rng.integers(0, i - 1, num_salt) for i in image.shape[:2]]
            image[coords[0], coords[1], :] = 1
        elif seed > 0.5:
            coords = [rng.integers(0, i - 1, num_pepper) for i in image.shape[:2]]
            image[coords[0], coords[1], :] = 0
        return {"image": image, "label": sample["label"], "img_name": sample["img_name"]}


class adjust_light:
    """p=0.5 gamma jitter, gamma in [0.5, 3.5] via uint8 LUT
    (custom_transforms.py:48-61)."""

    def __call__(self, sample, rng):
        if rng.random() > 0.5:
            gamma = rng.random() * 3 + 0.5
            inv = 1.0 / gamma
            table = (((np.arange(256) / 255.0) ** inv) * 255).astype(np.uint8)
            image = table[np.asarray(sample["image"]).astype(np.uint8)]
            return {"image": image, "label": sample["label"], "img_name": sample["img_name"]}
        return sample


class eraser:
    """p=0.5 random erasing of the image only (custom_transforms.py:64-93)."""

    def __call__(self, sample, rng, s_l=0.02, s_h=0.06, r_1=0.3, r_2=0.6, v_l=0, v_h=255):
        if rng.random() > 0.5:
            return sample
        image = np.asarray(sample["image"]).copy()
        img_h, img_w = image.shape[:2]
        while True:
            s = rng.uniform(s_l, s_h) * img_h * img_w
            r = rng.uniform(r_1, r_2)
            w = int(np.sqrt(s / r))
            h = int(np.sqrt(s * r))
            left = int(rng.integers(0, img_w))
            top = int(rng.integers(0, img_h))
            if left + w <= img_w and top + h <= img_h:
                break
        image[top : top + h, left : left + w, :] = rng.uniform(v_l, v_h)
        return {"image": image, "label": sample["label"], "img_name": sample["img_name"]}


class GetBoundary:
    """Cup+disc boundary ring by dilation XOR erosion, width 5
    (custom_transforms.py:414-429)."""

    def __init__(self, width=5):
        self.width = width

    def __call__(self, mask):
        from uda_clr_tpu.data import native

        return native.boundary_ring(mask[:, :, :2], iters=self.width)


class Normalize_tf:
    """Image -> [-1,1]; grayscale mask -> multilabel {cup,disc}; Gaussian
    boundary target (custom_transforms.py:432-466). The Gaussian blur runs
    on the uint8-scaled ring exactly like the reference (including its
    integer quantization of the blurred target).

    ``wire="u8"`` keeps all three outputs uint8 (image pre-scale, binary
    map, blurred-ring boundary pre-/255) for the 4x-smaller host->device
    wire format; the scale/offset then happens on device
    (``data/wire.py``), bit-exactly — every value here is an exact uint8
    (see the provenance notes in that module's docstring)."""

    def __init__(self, wire: str = "f32"):
        if wire not in ("f32", "u8"):
            raise ValueError(f"wire must be 'f32' or 'u8', got {wire!r}")
        self.wire = wire
        self.get_boundary = GetBoundary()

    def __call__(self, sample, rng=None):
        img_raw = np.asarray(sample["image"])
        __mask = np.asarray(_to_pil(sample["label"])).astype(np.uint8).copy()
        _mask = np.zeros(__mask.shape[:2])
        _mask[__mask > 200] = 255
        _mask[(__mask > 50) & (__mask < 201)] = 128
        __mask[_mask == 0] = 2
        __mask[_mask == 255] = 0
        __mask[_mask == 128] = 1
        mask = to_multilabel(__mask)
        boundary_u8 = ndi.gaussian_filter(
            (self.get_boundary(mask) * 255).astype(np.uint8), sigma=3
        )
        if self.wire == "u8":
            return {
                "image": img_raw.astype(np.uint8),
                "map": mask.astype(np.uint8),
                "boundary": boundary_u8[..., None],
                "img_name": sample["img_name"],
            }
        return {
            "image": img_raw.astype(np.float32) / 127.5 - 1.0,
            "map": mask.astype(np.float32),
            "boundary": (boundary_u8 / 255.0)[..., None].astype(np.float32),
            "img_name": sample["img_name"],
        }


class FixedResize:
    """Resize to (h, w): image bilinear, mask nearest
    (custom_transforms.py:226-242)."""

    def __init__(self, size):
        self.size = tuple(reversed(size))  # (h, w) -> PIL (w, h)

    def __call__(self, sample, rng=None):
        img = _to_pil(sample["image"]).resize(self.size, Image.BILINEAR)
        mask = _to_pil(sample["label"]).resize(self.size, Image.NEAREST)
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class Scale:
    """Resize shorter side preserving the reference's early-exit quirk
    (custom_transforms.py:245-269)."""

    def __init__(self, size):
        self.size = (int(size), int(size)) if isinstance(size, (int, float)) else size

    def __call__(self, sample, rng=None):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        w, h = img.size
        if (w >= h and w == self.size[1]) or (h >= w and h == self.size[0]):
            return {"image": img, "label": mask, "img_name": sample["img_name"]}
        oh, ow = self.size
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class RandomSizedCrop:
    """Random area/aspect crop then resize (custom_transforms.py:272-312)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, sample, rng):
        img, mask = _to_pil(sample["image"]), _to_pil(sample["label"])
        for _ in range(10):
            area = img.size[0] * img.size[1]
            target_area = rng.uniform(0.45, 1.0) * area
            aspect = rng.uniform(0.5, 2)
            w = int(round(np.sqrt(target_area * aspect)))
            h = int(round(np.sqrt(target_area / aspect)))
            if rng.random() < 0.5:
                w, h = h, w
            if w <= img.size[0] and h <= img.size[1]:
                x1 = int(rng.integers(0, img.size[0] - w + 1))
                y1 = int(rng.integers(0, img.size[1] - h + 1))
                img = img.crop((x1, y1, x1 + w, y1 + h))
                mask = mask.crop((x1, y1, x1 + w, y1 + h))
                img = img.resize((self.size, self.size), Image.BILINEAR)
                mask = mask.resize((self.size, self.size), Image.NEAREST)
                return {"image": img, "label": mask, "img_name": sample["img_name"]}
        sample = Scale(self.size)({"image": img, "label": mask, "img_name": sample["img_name"]})
        return CenterCrop(self.size)(sample)


class ResizeImg:
    """Resize the image only (custom_transforms.py:358-372)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, sample, rng=None):
        img = _to_pil(sample["image"]).resize((self.size, self.size))
        return {"image": img, "label": sample["label"], "img_name": sample["img_name"]}


class Resize:
    """Resize image and mask with PIL default resampling
    (custom_transforms.py:375-390)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, sample, rng=None):
        img = _to_pil(sample["image"]).resize((self.size, self.size))
        mask = _to_pil(sample["label"]).resize((self.size, self.size))
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class Normalize:
    """Mean/std normalization after /255 (custom_transforms.py:392-411)."""

    def __init__(self, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
        self.mean = mean
        self.std = std

    def __call__(self, sample, rng=None):
        img = np.asarray(sample["image"]).astype(np.float32) / 255.0
        img = (img - np.float32(self.mean)) / np.float32(self.std)
        mask = np.asarray(sample["label"]).astype(np.float32)
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


class Normalize_cityscapes:
    """Mean subtraction then /255 (custom_transforms.py:469-486)."""

    def __init__(self, mean=(0.0, 0.0, 0.0)):
        self.mean = mean

    def __call__(self, sample, rng=None):
        img = (np.asarray(sample["image"]).astype(np.float32) - np.float32(self.mean)) / np.float32(255.0)
        mask = np.asarray(sample["label"]).astype(np.float32)
        return {"image": img, "label": mask, "img_name": sample["img_name"]}


def train_transforms(size: int = 512, wire: str = "f32") -> Compose:
    """The reference training pipeline (train_use_fix_initial.py:150-160).

    ``wire="u8"`` emits uint8 batches for the 4x-smaller host->device
    wire format (bit-exact after the on-device decode — data/wire.py)."""
    return Compose(
        [
            RandomScaleCrop(size),
            RandomRotate(),
            RandomFlip(),
            elastic_transform(),
            add_salt_pepper_noise(),
            adjust_light(),
            eraser(),
            Normalize_tf(wire=wire),
        ]
    )


def eval_transforms(size: int = 512, wire: str = "f32") -> Compose:
    """The reference test pipeline (train_use_fix_initial.py:162-166)."""
    return Compose([RandomCrop(size), Normalize_tf(wire=wire)])
