"""Standalone evaluation / inference tool.

Runs a checkpoint over a dataset split and reports the reference metric
suite (cup/disc Dice, PA, IoU at threshold 0.75 — utils/metrics.py
semantics), optionally applying the morphological ``postprocessing``
(Utils.py:438-474) and saving contour overlays (save_per_img,
Utils.py:515-585) like the reference's offline analysis flow.

Usage:
  python -m uda_clr_tpu.tools.evaluate --checkpoint runs/x/checkpoints/checkpoint_7 \\
      --data-dir /data/Fundus --dataset Drishti-GS --split test \\
      [--postprocess] [--save-viz out/]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(model, variables, loader, dataset_name: str = "Drishti-GS",
             postprocess: bool = False, save_viz: str | None = None):
    from uda_clr_tpu.utils.metrics import dice_coefficient_numpy, dice_coeff_2label, pixel_acc
    from uda_clr_tpu.utils.postprocess import postprocessing
    from uda_clr_tpu.utils.visualize import save_per_img, untransform

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).mask_logits)
    totals = {k: 0.0 for k in ("cup_dice", "disc_dice", "cup_pa", "disc_pa", "cup_iou", "disc_iou")}
    n = 0
    for batch in loader.epoch(0):
        logits = np.asarray(fwd(variables, batch["image"]).astype(jnp.float32))
        if postprocess:
            cup_d = disc_d = 0.0
            for i in range(logits.shape[0]):
                probs = 1.0 / (1.0 + np.exp(-logits[i]))
                cleaned = postprocessing(probs, dataset=dataset_name)
                cup_d += dice_coefficient_numpy(cleaned[..., 0], batch["map"][i][..., 0])
                disc_d += dice_coefficient_numpy(cleaned[..., 1], batch["map"][i][..., 1])
            cup_d /= logits.shape[0]
            disc_d /= logits.shape[0]
        else:
            cup_d, disc_d = dice_coeff_2label(logits, batch["map"])
        pa_cup, pa_disc, iou_cup, iou_disc = pixel_acc(logits, batch["map"])
        for k, v in zip(totals, (cup_d, disc_d, pa_cup, pa_disc, iou_cup, iou_disc)):
            totals[k] += v
        if save_viz:
            for i, name in enumerate(batch["img_name"]):
                probs = 1.0 / (1.0 + np.exp(-logits[i]))
                img, _ = untransform(batch["image"][i], batch["map"][i])
                save_per_img(img.astype(np.uint8), save_viz, name, probs)
        n += 1
    return {k: v / max(n, 1) for k, v in totals.items()}


def main(argv=None):
    from uda_clr_tpu.data.fundus import FundusSegmentation
    from uda_clr_tpu.data.pipeline import BatchLoader
    from uda_clr_tpu.data.synthetic import SyntheticFundus
    from uda_clr_tpu.data.transforms import eval_transforms
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.train import checkpoint as ckpt_lib

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=False, default=None,
                   help="orbax checkpoint dir/tag or reference .pth.tar")
    p.add_argument("--data-dir", default="")
    p.add_argument("--dataset", default="Drishti-GS")
    p.add_argument("--split", default="test")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--use_TN", action="store_true")
    p.add_argument("--postprocess", action="store_true")
    p.add_argument("--save-viz", default=None)
    args = p.parse_args(argv)

    model = DeepLab(num_classes=2, backbone="mobilenet", norm="tn" if args.use_TN else "bn")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.image_size, args.image_size, 3)), train=False
    )
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar")):
            from uda_clr_tpu.convert.torch_import import load_reference_checkpoint

            conv = load_reference_checkpoint(args.checkpoint)
            params, stats = conv["gen"]
            variables = {"params": params, "batch_stats": stats}
        else:
            import os

            d, tag = os.path.split(args.checkpoint.rstrip("/"))
            variables, _ = ckpt_lib.restore_checkpoint(d, tag, variables)

    if args.synthetic:
        ds = SyntheticFundus(8, args.image_size + 28, transform=eval_transforms(args.image_size))
    else:
        ds = FundusSegmentation(args.data_dir, args.dataset, args.split,
                                eval_transforms(args.image_size))
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False, num_workers=2)
    metrics = evaluate(model, variables, loader, args.dataset, args.postprocess, args.save_viz)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
