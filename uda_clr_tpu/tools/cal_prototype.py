"""Offline prototype-bank initialization (reference cal_prototype.py).

Runs a (pre-trained) generator over the target train split with the eval
transform and pools masked-average feature prototypes:
  * 'bu'   [304]: x_bu_feature under sigmoid(boundary_before) > 0.5
  * 'cup'  [305]: x_feature under sigmoid(mask_before)[...,0] > 0.1
  * 'disc' [305]: x_feature under sigmoid(mask_before)[...,1] > 0.5
(cal_prototype.py:144-175 thresholds; per-image +1-smoothed pooling.)

Deliberate fix, recorded: the reference's running-average update
overwrites its accumulator with the current batch before accumulating
(`proto = (cur*num + cur)/(num+1)` — cal_prototype.py:177-190), so the
saved bank equals the LAST image's prototype. We compute the intended
arithmetic mean over the dataset.

Saves an .npz with keys {'bu','cup','disc'} consumed by
``MethodConfig.prototype_bank_path``.

Usage: python -m uda_clr_tpu.tools.cal_prototype --checkpoint <dir/tag>
           --data-dir ... --datasetT Drishti-GS --out prototypes.npz
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from uda_clr_tpu.models.deeplab import DeepLab


def compute_prototypes(model: DeepLab, variables: dict, batches) -> dict:
    """``batches``: iterable of host batches with 'image' [B,H,W,3]."""

    @jax.jit
    def pooled(image):
        out = model.apply(variables, image, train=False)
        pred = jax.nn.sigmoid(out.mask_before.astype(jnp.float32))
        bu = (jax.nn.sigmoid(out.boundary_before.astype(jnp.float32)) > 0.5).astype(jnp.float32)
        cup = (pred[..., 0:1] > 0.1).astype(jnp.float32)
        disc = (pred[..., 1:2] > 0.5).astype(jnp.float32)
        xf = out.x_feature.astype(jnp.float32)
        xbu = out.x_bu_feature.astype(jnp.float32)

        def pool(feat, mask):  # per-image +1-smoothed pooled prototypes [B, C]
            return jnp.sum(feat * mask, axis=(1, 2)) / (jnp.sum(mask, axis=(1, 2)) + 1.0)

        return pool(xbu, bu), pool(xf, cup), pool(xf, disc)

    sums = {"bu": 0.0, "cup": 0.0, "disc": 0.0}
    n = 0
    for batch in batches:
        bu, cup, disc = pooled(batch["image"])
        sums["bu"] = sums["bu"] + np.sum(np.asarray(bu), axis=0)
        sums["cup"] = sums["cup"] + np.sum(np.asarray(cup), axis=0)
        sums["disc"] = sums["disc"] + np.sum(np.asarray(disc), axis=0)
        n += bu.shape[0]
    return {k: (v / max(n, 1)).astype(np.float32) for k, v in sums.items()}


def main(argv=None):
    from uda_clr_tpu.data.fundus import FundusSegmentation
    from uda_clr_tpu.data.pipeline import BatchLoader
    from uda_clr_tpu.data.synthetic import SyntheticFundus
    from uda_clr_tpu.data.transforms import eval_transforms
    from uda_clr_tpu.train import checkpoint as ckpt_lib

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (or torch .pth.tar)")
    p.add_argument("--data-dir", default="")
    p.add_argument("--datasetT", default="Drishti-GS")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="prototypes.npz")
    p.add_argument("--use_TN", action="store_true")
    args = p.parse_args(argv)

    model = DeepLab(num_classes=2, backbone="mobilenet", norm="tn" if args.use_TN else "bn")
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.image_size, args.image_size, 3)), train=False
    )
    variables = dict(init_vars)
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".pth.tar")):
            from uda_clr_tpu.convert.torch_import import load_reference_checkpoint

            conv = load_reference_checkpoint(args.checkpoint)
            params, stats = conv["gen"]
            variables = {"params": params, "batch_stats": stats}
        else:
            import os

            d, tag = os.path.split(args.checkpoint.rstrip("/"))
            restored, _ = ckpt_lib.restore_checkpoint(d, tag, init_vars)
            variables = restored

    if args.synthetic:
        ds = SyntheticFundus(8, args.image_size + 28, transform=eval_transforms(args.image_size))
    else:
        ds = FundusSegmentation(
            args.data_dir, args.datasetT, "train", eval_transforms(args.image_size)
        )
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False, num_workers=2)
    bank = compute_prototypes(model, variables, loader.epoch(0))
    np.savez(args.out, **bank)
    print(f"saved prototype bank to {args.out}: "
          + ", ".join(f"{k}[{v.shape[0]}]" for k, v in bank.items()))


if __name__ == "__main__":
    main()
