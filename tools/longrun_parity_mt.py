"""Long-horizon training-dynamics parity for the bytecode-only
``Trainer_MT`` reconstruction: the fused JAX mean_teacher step vs the
torch transcription (tests/torch_step_ref.py:mean_teacher_iteration,
instruction-verified against Trainer_MT.cpython-38.pyc) from identical
converted weights over identical synthetic data.

Complements tools/longrun_parity.py (flagship prototype_full) at the
2-iteration step-parity test's longer horizon: hundreds of Adam + SGD +
ramped-alpha-EMA + BN-stat round-trips, teacher tracking the student
throughout. fp32, dropout off, teacher_noise=0 (cross-framework RNGs
cannot be aligned), production hyperparameters otherwise.

Usage:
  python tools/longrun_parity_mt.py --iters 100 --out docs/longrun_parity_mt.csv
"""

from __future__ import annotations

import argparse
import copy
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

from tests.torch_step_ref import mean_teacher_iteration
from tools import _longrun_common as C
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step

KEYS = ("loss_all", "loss_seg", "loss_consistency", "loss_adv", "loss_D", "loss_D2")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr-gen", type=float, default=1e-3)
    p.add_argument("--lr-dis", type=float, default=2.5e-5)
    p.add_argument("--consistency", type=float, default=1.0)
    p.add_argument("--out", default="docs/longrun_parity_mt.csv")
    p.add_argument("--n-data", type=int, default=24)
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    B, SIZE = args.batch, args.size

    tm, tdis, tdis2 = C.build_torch_side()
    tteacher = copy.deepcopy(tm)
    opt_gen = torch.optim.Adam(tm.parameters(), lr=args.lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    gen_params, gen_stats, dis_params, dis2_params = C.convert_to_jax(tm, tdis, tdis2)

    cfg = C.build_config(mc_samples=2)
    cfg.method.method = "mean_teacher"
    cfg.method.teacher_noise = 0.0
    model = C.build_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_teacher=True
    )
    gp = jax.tree.map(jnp.asarray, gen_params)
    gs = jax.tree.map(jnp.asarray, gen_stats)
    state = state.replace(
        gen_params=gp, gen_stats=gs,
        teacher_params=jax.tree.map(jnp.copy, gp),
        teacher_stats=jax.tree.map(jnp.copy, gs),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
    )
    step = make_train_step(model, cfg, "mean_teacher", proto_phase=False)

    loader_s, it_t = C.train_streams(SIZE, B, args.n_data)
    ds_val = C.val_set(SIZE)

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

            db = C.device_batch(batch_s, batch_t)
            db["consistency_weight"] = jnp.float32(args.consistency)
            state, metrics = step(state, db, args.lr_gen, args.lr_dis, 30)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}

            want = mean_teacher_iteration(
                tm, tteacher, tdis, tdis2, opt_gen, opt_dis, opt_dis2,
                C.to_nchw(img_s), C.to_nchw(map_s), C.to_nchw(bnd_s), C.to_nchw(img_t),
                global_step=done, consistency_weight=args.consistency,
                ema_decay=cfg.method.ema_decay,
            )

            row = {"iter": done}
            for k in KEYS:
                row[f"jax_{k}"] = got.get(k, float("nan"))
                row[f"torch_{k}"] = want.get(k, float("nan"))
            rows.append(row)
            if done % 10 == 0:
                print(
                    f"[{done}/{args.iters}] jax loss_all {row['jax_loss_all']:.4f} "
                    f"torch {row['torch_loss_all']:.4f}  cons jax "
                    f"{row['jax_loss_consistency']:.5f} torch {row['torch_loss_consistency']:.5f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
            done += 1
        epoch += 1

    # held-out Dice — the STUDENT for both, plus the torch TEACHER (the
    # quantity mean-teacher actually deploys)
    eval_step = make_eval_step(model)
    jax_dice = C.jax_val_dice(eval_step, state, ds_val)
    teacher_state = state.replace(gen_params=state.teacher_params, gen_stats=state.teacher_stats)
    jax_teacher_dice = C.jax_val_dice(eval_step, teacher_state, ds_val)

    C.write_rows_csv(args.out, rows)
    print(f"\nwrote {args.out} ({len(rows)} iterations, {time.time()-t0:.0f}s)")
    print(f"val Dice (cup, disc): jax student {tuple(np.round(jax_dice,4))} "
          f"torch student {tuple(np.round(C.torch_val_dice(tm, ds_val),4))}")
    print(f"               teacher: jax {tuple(np.round(jax_teacher_dice,4))} "
          f"torch {tuple(np.round(C.torch_val_dice(tteacher, ds_val),4))}")
    C.print_rel_diff_summary(rows, KEYS, width=18)


if __name__ == "__main__":
    main()
