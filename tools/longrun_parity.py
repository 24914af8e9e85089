"""Long-horizon training-dynamics parity: the fused JAX prototype_full
step vs the torch transcription of the reference's per-iteration
choreography (tests/torch_step_ref.py, mirroring
/root/reference/train_process/Trainer_prototype_full.py:248-592), driven
from identical converted weights over identical synthetic data for
hundreds of iterations (VERDICT r2 items 1 and 2).

Both frameworks see: the same init (torch-initialized, converted), the
same per-iteration batches (synthetic fundus, fixed seed), fp32, dropout
off (cross-framework RNGs cannot be aligned; BN/Adam/EMA-bank state fully
exercised), production hyperparameters (lr_gen 1e-3 Adam, lr_dis 2.5e-5
SGD momentum 0.99, adv weight 0.01, bank EMA 0.9/0.1).

Outputs a CSV with per-iteration scalars from both frameworks and prints
a summary: smoothed-trajectory divergence, D-loss movement (the
flat-discriminator question), and final held-out val Dice per framework.

Usage:
  python tools/longrun_parity.py --iters 150 --out docs/longrun_parity.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_ref import TorchDeepLab
from tests.torch_step_ref import TorchBank, TorchPatchDiscriminator, prototype_full_iteration
from uda_clr_tpu.config import Config
from uda_clr_tpu.convert.torch_import import (
    convert_deeplab_state_dict,
    convert_discriminator_state_dict,
)
from uda_clr_tpu.data.pipeline import BatchLoader
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data.transforms import eval_transforms, train_transforms
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step
from uda_clr_tpu.utils.metrics import dice_coeff_2label

KEYS = ("loss_all", "loss_seg", "loss_intra", "loss_adv", "loss_D", "loss_D2")


def _zero_torch_dropout(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=150)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--mc-samples", type=int, default=4)
    p.add_argument("--lr-gen", type=float, default=1e-3)
    p.add_argument("--lr-dis", type=float, default=2.5e-5)
    p.add_argument("--mc-fast", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--out", default="docs/longrun_parity.csv")
    p.add_argument("--n-data", type=int, default=24, help="synthetic images per domain")
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    torch.manual_seed(0)
    B, SIZE, T = args.batch, args.size, args.mc_samples

    # ---- torch side ----
    tm = TorchDeepLab(num_classes=2, output_stride=16)
    tm.train()
    _zero_torch_dropout(tm)
    # spread mask logits so pseudo-labels straddle the 0.75 threshold from
    # iteration 0 (same init trick as tests/test_step_parity.py:87-94; the
    # reference warm-starts from a BEAL checkpoint with the same property)
    with torch.no_grad():
        tm.decoder.last_conv[3].weight.mul_(10.0)
        tm.decoder.last_conv[3].bias.mul_(10.0)
    tdis, tdis2 = TorchPatchDiscriminator(1), TorchPatchDiscriminator(2)
    tdis.train(), tdis2.train()
    opt_gen = torch.optim.Adam(tm.parameters(), lr=args.lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)

    # ---- identical converted weights into JAX ----
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches_tracked" not in k}
    gen_params, gen_stats = convert_deeplab_state_dict(sd, output_stride=16)
    dis_params = convert_discriminator_state_dict({k: v.numpy() for k, v in tdis.state_dict().items()})
    dis2_params = convert_discriminator_state_dict({k: v.numpy() for k, v in tdis2.state_dict().items()})

    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = T
    cfg.method.mc_fast = args.mc_fast
    cfg.method.rng_impl = "threefry2x32"
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        gen_stats=jax.tree.map(jnp.asarray, gen_stats),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    # ---- identical data streams ----
    ds_s = SyntheticFundus(args.n_data, SIZE + 28, seed=1, transform=train_transforms(SIZE))
    ds_t = SyntheticFundus(args.n_data, SIZE + 28, seed=2, transform=train_transforms(SIZE))
    ds_val = SyntheticFundus(8, SIZE + 28, seed=3, transform=eval_transforms(SIZE))
    loader_s = BatchLoader(ds_s, B, shuffle=True, seed=0, num_workers=1)
    loader_t = BatchLoader(ds_t, B, shuffle=False, seed=1, num_workers=1)
    it_t = loader_t.forever()

    bank = TorchBank()
    rows = []
    t0 = time.time()
    epoch = 0
    done = 0
    while done < args.iters:
        for batch_s in loader_s.epoch(epoch):
            if done >= args.iters:
                break
            batch_t = next(it_t)
            img_s, map_s = batch_s["image"], batch_s["map"]
            bnd_s, img_t = batch_s["boundary"], batch_t["image"]

            batch = {
                "image_s": jnp.asarray(img_s),
                "map_s": jnp.asarray(map_s),
                "boundary_s": jnp.asarray(bnd_s),
                "image_t": jnp.asarray(img_t),
            }
            state, metrics = step(state, batch, args.lr_gen, args.lr_dis, 30)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}

            want = prototype_full_iteration(
                tm, tdis, tdis2, opt_gen, opt_dis, opt_dis2, bank,
                _to_nchw(img_s), _to_nchw(map_s), _to_nchw(bnd_s), _to_nchw(img_t),
                use_pid=True, retrify=True, T=T,
            )

            row = {"iter": done}
            for k in KEYS:
                row[f"jax_{k}"] = got.get(k, float("nan"))
                row[f"torch_{k}"] = want.get(k, float("nan"))
            rows.append(row)
            if done % 10 == 0:
                print(
                    f"[{done}/{args.iters}] jax loss_all {row['jax_loss_all']:.4f} "
                    f"torch {row['torch_loss_all']:.4f}  "
                    f"jax loss_D {row['jax_loss_D']:.6f} torch {row['torch_loss_D']:.6f}  "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
            done += 1
        epoch += 1

    # ---- held-out val Dice, each framework through its own eval path ----
    eval_step = make_eval_step(model)
    variables = {"params": state.gen_params, "batch_stats": state.gen_stats}
    tm.eval()
    jd, td = [], []
    with torch.no_grad():
        for batch in BatchLoader(ds_val, 4, shuffle=False, drop_last=False, num_workers=1).epoch(0):
            logits, _, _ = eval_step(variables, batch["image"], batch["map"])
            jd.append(dice_coeff_2label(np.asarray(logits), batch["map"]))
            to = tm(_to_nchw(batch["image"]))[0].numpy().transpose(0, 2, 3, 1)
            td.append(dice_coeff_2label(to, batch["map"]))
    jax_dice = np.mean(np.array(jd), axis=0)
    torch_dice = np.mean(np.array(td), axis=0)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # ---- summary ----
    def series(k, fw):
        return np.array([r[f"{fw}_{k}"] for r in rows])

    def smooth(x, w=10):
        if len(x) < w:
            return x
        return np.convolve(x, np.ones(w) / w, mode="valid")

    print(f"\nwrote {args.out} ({len(rows)} iterations, {time.time()-t0:.0f}s)")
    print(f"val Dice (cup, disc): jax {tuple(np.round(jax_dice,4))} "
          f"torch {tuple(np.round(torch_dice,4))}")
    for k in KEYS:
        a, b = series(k, "jax"), series(k, "torch")
        if np.all(np.isnan(a)):
            continue
        sa, sb = smooth(a), smooth(b)
        denom = np.maximum(np.abs(sb), 1e-3)
        rel = np.abs(sa - sb) / denom
        print(
            f"{k:12s} smoothed rel diff: mean {np.mean(rel):.4f} max {np.max(rel):.4f}   "
            f"range jax [{a.min():.4f},{a.max():.4f}] torch [{b.min():.4f},{b.max():.4f}]"
        )
    for k in ("loss_D", "loss_D2"):
        for fw in ("jax", "torch"):
            s = series(k, fw)
            print(f"{fw}_{k}: start {s[0]:.6f} end {s[-1]:.6f} "
                  f"max|dev from 2ln2| {np.max(np.abs(s - 2*np.log(2))):.6f}")


if __name__ == "__main__":
    main()
