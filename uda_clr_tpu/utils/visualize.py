"""Visualization artifacts (reference utils/Utils.py:349-589) rebuilt on
cv2/PIL (no skimage in this environment — contour drawing uses
cv2.findContours instead of skimage.measure.find_contours).

Array convention: predictions/masks are channel-last [H, W, C] with
channel 0 = cup, channel 1 = disc; images are HWC uint8 RGB (or the
pipeline's [-1, 1] floats, see ``untransform``).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
import scipy.ndimage as ndi
import scipy.signal

from uda_clr_tpu.utils.postprocess import diamond, get_largest_fillhole


def construct_color_img(prob_per_slice: np.ndarray) -> np.ndarray:
    """Grayscale probability map -> JET heatmap (Utils.py:349-357)."""
    img = np.zeros((*prob_per_slice.shape[:2], 3), dtype=np.uint8)
    v = np.clip(prob_per_slice * 255, 0, 255).astype(np.uint8)
    img[:, :, 0] = v
    img[:, :, 1] = v
    img[:, :, 2] = v
    return cv2.applyColorMap(img, cv2.COLORMAP_JET)


def normalize_ent(ent: np.ndarray) -> np.ndarray:
    """Scale entropy to ~[0,1] with the reference's fixed 0.4 divisor
    (Utils.py:360-367)."""
    return (ent - np.amin(ent)) / 0.4


def draw_ent(prediction: np.ndarray, save_root: str, name: str) -> None:
    """Save cup/disc entropy heatmaps (Utils.py:370-391); prediction
    [H,W,2] probabilities."""
    smooth = 1e-8
    for idx, sub in ((0, "cup"), (1, "disc")):
        os.makedirs(os.path.join(save_root, sub), exist_ok=True)
        p = prediction[..., idx]
        ent = normalize_ent(-p * np.log(p + smooth))
        cv2.imwrite(
            os.path.join(save_root, sub, name.split(".")[0] + ".png"),
            construct_color_img(ent),
        )


def draw_mask(prediction: np.ndarray, save_root: str, name: str) -> None:
    """Save cup/disc probability heatmaps (Utils.py:394-411)."""
    for idx, sub in ((0, "cup"), (1, "disc")):
        os.makedirs(os.path.join(save_root, sub), exist_ok=True)
        cv2.imwrite(
            os.path.join(save_root, sub, name.split(".")[0] + ".png"),
            construct_color_img(prediction[..., idx]),
        )


def draw_boundary(boundary: np.ndarray, save_root: str, name: str) -> None:
    """Save a boundary probability heatmap (Utils.py:413-424);
    boundary [H,W] or [H,W,1]."""
    os.makedirs(os.path.join(save_root, "boundary"), exist_ok=True)
    b = boundary[..., 0] if boundary.ndim == 3 else boundary
    cv2.imwrite(
        os.path.join(save_root, "boundary", name.split(".")[0] + ".png"),
        construct_color_img(b),
    )


def joint_val_image(image: np.ndarray, prediction: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """[image | gt overlay | cup pred overlay | disc pred overlay] strip
    (Utils.py:477-498). image HWC in [0,1]-ish, prediction/mask [H,W,2]."""
    ratio = 0.5
    h, w = mask.shape[:2]
    pred_cup = np.repeat(prediction[..., 0:1], 3, axis=-1)
    pred_disc = np.repeat(prediction[..., 1:2], 3, axis=-1)
    m = np.zeros((h, w, 3))
    m[..., 0] = mask[..., 0]
    m[..., 1] = mask[..., 1]
    rows = [
        image,
        ratio * image + (1 - ratio) * m,
        ratio * image + (1 - ratio) * pred_cup,
        ratio * image + (1 - ratio) * pred_disc,
    ]
    return np.concatenate(rows, axis=1)


def save_val_img(path: str, epoch: int, imgs: list[np.ndarray]) -> None:
    """Stack joint_val_image strips vertically into
    visualization/epoch_N.png (Utils.py:501-510)."""
    out_dir = os.path.join(path, "visualization")
    os.makedirs(out_dir, exist_ok=True)
    stack = np.concatenate(imgs, axis=0)
    stack = np.clip(stack * 255, 0, 255).astype(np.uint8)
    cv2.imwrite(os.path.join(out_dir, f"epoch_{epoch}.png"), stack[..., ::-1])


def _clean_mask(m: np.ndarray, threshold: float) -> np.ndarray:
    m = (m > threshold).astype(np.uint8)
    for _ in range(5):
        m = scipy.signal.medfilt2d(m, 7)
    m = ndi.binary_erosion(m, structure=diamond(7)).astype(np.uint8)
    m = get_largest_fillhole(m).astype(np.uint8)
    m = ndi.binary_dilation(m, structure=diamond(7)).astype(np.uint8)
    return get_largest_fillhole(m).astype(np.uint8)


def save_per_img(patch_image: np.ndarray, data_save_path: str, img_name: str,
                 prob_map: np.ndarray, ext: str = "png") -> None:
    """Save the original ROI and a contour overlay (cup green, disc blue)
    (Utils.py:515-585). ``prob_map`` [H,W,2] with ch0=cup, ch1=disc —
    note the reference indexes [0] as disc there; we keep the package-wide
    cup-first convention. Borders are zeroed like the reference."""
    overlay_dir = os.path.join(data_save_path, "overlay")
    orig_dir = os.path.join(data_save_path, "original_image")
    os.makedirs(overlay_dir, exist_ok=True)
    os.makedirs(orig_dir, exist_ok=True)
    base = img_name.split(".")[0] + ".png"

    prob = prob_map.copy()
    prob[0, :, :] = 0
    prob[-1, :, :] = 0
    prob[:, 0, :] = 0
    prob[:, -1, :] = 0

    cup_mask = _clean_mask(prob[..., 0], 0.75)
    disc_mask = _clean_mask(prob[..., 1], 0.75)

    patch = np.asarray(patch_image).astype(np.uint8).copy()
    cv2.imwrite(os.path.join(orig_dir, base), patch[..., ::-1])

    for m, color in ((cup_mask, (0, 255, 0)), (disc_mask, (0, 0, 255))):
        contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
        cv2.drawContours(patch, contours, -1, color, thickness=2)
    cv2.imwrite(os.path.join(overlay_dir, base), patch[..., ::-1])


def untransform(img: np.ndarray, lt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Invert Normalize_tf scaling (Utils.py:587-589)."""
    return (img + 1) * 127.5, lt * 128
