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
SGD momentum 0.99, adv weight 0.01, bank EMA 0.9/0.1). The setup is
shared with tools/longrun_chaos_control.py via tools/_longrun_common.py.

Outputs a CSV with per-iteration scalars from both frameworks and prints
a summary: smoothed-trajectory divergence, D-loss movement (the
flat-discriminator question), and final held-out val Dice per framework.

Usage:
  python tools/longrun_parity.py --iters 150 --out docs/longrun_parity.csv
"""

from __future__ import annotations

import argparse
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

from tests.torch_step_ref import TorchBank, prototype_full_iteration
from tools import _longrun_common as C
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step

KEYS = ("loss_all", "loss_seg", "loss_intra", "loss_adv", "loss_D", "loss_D2")


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
    B, SIZE, T = args.batch, args.size, args.mc_samples

    # ---- torch side + identical converted weights into JAX ----
    tm, tdis, tdis2 = C.build_torch_side()
    opt_gen = torch.optim.Adam(tm.parameters(), lr=args.lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    gen_params, gen_stats, dis_params, dis2_params = C.convert_to_jax(tm, tdis, tdis2)

    cfg = C.build_config(mc_samples=T, mc_fast=args.mc_fast)
    model = C.build_model()
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        gen_stats=jax.tree.map(jnp.asarray, gen_stats),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    # ---- identical data streams ----
    loader_s, it_t = C.train_streams(SIZE, B, args.n_data)
    ds_val = C.val_set(SIZE)

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

            state, metrics = step(state, C.device_batch(batch_s, batch_t),
                                  args.lr_gen, args.lr_dis, 30)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}

            want = prototype_full_iteration(
                tm, tdis, tdis2, opt_gen, opt_dis, opt_dis2, bank,
                C.to_nchw(img_s), C.to_nchw(map_s), C.to_nchw(bnd_s), C.to_nchw(img_t),
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
    jax_dice = C.jax_val_dice(eval_step, state, ds_val)

    C.write_rows_csv(args.out, rows)
    print(f"\nwrote {args.out} ({len(rows)} iterations, {time.time()-t0:.0f}s)")
    print(f"val Dice (cup, disc): jax {tuple(np.round(jax_dice,4))} "
          f"torch {tuple(np.round(C.torch_val_dice(tm, ds_val),4))}")
    C.print_rel_diff_summary(rows, KEYS, width=12)
    for k in ("loss_D", "loss_D2"):
        for fw in ("jax", "torch"):
            s = C.series(rows, k, fw)
            print(f"{fw}_{k}: start {s[0]:.6f} end {s[-1]:.6f} "
                  f"max|dev from 2ln2| {np.max(np.abs(s - 2*np.log(2))):.6f}")


if __name__ == "__main__":
    main()
