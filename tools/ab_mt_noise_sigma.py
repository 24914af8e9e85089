"""Sensitivity sweep bounding the mean-teacher noise-sigma reconstruction.

``Trainer_MT``'s bytecode feeds the teacher a ``randn``-noised target view,
but the sigma is a non-extractable constant (Trainer_MT.cpython-38.pyc
:316-318); the rebuild ships the canonical 0.1 (steps.py teacher-forward
block, ``cfg.method.teacher_noise``). VERDICT r4 item 6: turn that guess
into a bounded claim — run the trajectory at sigma in {0, 0.05, 0.1, 0.2}
on BOTH frameworks (torch oracle noise via its own RNG; cross-framework
RNG alignment is impossible) and show the sigma effect on the training
trajectory is within / below the framework-parity gap itself, so no
plausible sigma choice can move the reconstruction outside its already-
verified band.

Per sigma: 100 fused-step iterations from identical converted weights over
identical synthetic batches (fp32, dropout off — the
tools/longrun_parity_mt.py configuration with noise ON), recording
loss_all / loss_consistency trajectories and final student+teacher val
Dice for both frameworks.

Usage:
  python tools/ab_mt_noise_sigma.py --iters 100 --out docs/ab_mt_noise_sigma.csv
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

SIGMAS = (0.0, 0.05, 0.1, 0.2)
KEYS = ("loss_all", "loss_consistency")


def run_pair(sigma: float, iters: int, size: int, batch: int,
             consistency: float, lr_gen: float, lr_dis: float):
    """One torch + one jax mean_teacher trajectory at this sigma from the
    shared deterministic init/data. Returns (rows, summary)."""
    tm, tdis, tdis2 = C.build_torch_side()
    tteacher = copy.deepcopy(tm)
    opt_gen = torch.optim.Adam(tm.parameters(), lr=lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=lr_dis, momentum=0.99,
                              weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=lr_dis, momentum=0.99,
                               weight_decay=5e-4)
    gen_params, gen_stats, dis_params, dis2_params = C.convert_to_jax(tm, tdis, tdis2)
    torch.manual_seed(1234)  # the oracle's noise stream (post-init)

    cfg = C.build_config(mc_samples=2)
    cfg.method.method = "mean_teacher"
    cfg.method.teacher_noise = sigma
    model = C.build_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, size, size, 3), with_teacher=True
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
    loader_s, it_t = C.train_streams(size, batch)
    ds_val = C.val_set(size)

    rows = []
    done, epoch = 0, 0
    while done < iters:
        for batch_s in loader_s.epoch(epoch):
            if done >= iters:
                break
            batch_t = next(it_t)
            db = C.device_batch(batch_s, batch_t)
            db["consistency_weight"] = jnp.float32(consistency)
            state, metrics = step(state, db, lr_gen, lr_dis, 30)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}
            want = mean_teacher_iteration(
                tm, tteacher, tdis, tdis2, opt_gen, opt_dis, opt_dis2,
                C.to_nchw(batch_s["image"]), C.to_nchw(batch_s["map"]),
                C.to_nchw(batch_s["boundary"]), C.to_nchw(batch_t["image"]),
                global_step=done, consistency_weight=consistency,
                ema_decay=cfg.method.ema_decay, teacher_noise=sigma,
            )
            row = {"sigma": sigma, "iter": done}
            for k in KEYS:
                row[f"jax_{k}"] = got.get(k, float("nan"))
                row[f"torch_{k}"] = want.get(k, float("nan"))
            rows.append(row)
            done += 1
        epoch += 1

    eval_step = make_eval_step(model)
    jd = C.jax_val_dice(eval_step, state, ds_val)
    tstate = state.replace(gen_params=state.teacher_params,
                           gen_stats=state.teacher_stats)
    jtd = C.jax_val_dice(eval_step, tstate, ds_val)
    td = C.torch_val_dice(tm, ds_val)
    ttd = C.torch_val_dice(tteacher, ds_val)
    # late-window (2nd half) trajectory means: the sigma-sensitivity
    # statistic — early iterations are dominated by the shared init
    half = iters // 2
    summary = {"sigma": sigma,
               "jax_student_dice": float(np.mean(jd)),
               "jax_teacher_dice": float(np.mean(jtd)),
               "torch_student_dice": float(np.mean(td)),
               "torch_teacher_dice": float(np.mean(ttd))}
    for k in KEYS:
        summary[f"jax_{k}_late"] = float(np.mean(C.series(rows, k, "jax")[half:]))
        summary[f"torch_{k}_late"] = float(np.mean(C.series(rows, k, "torch")[half:]))
    return rows, summary


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--consistency", type=float, default=1.0)
    p.add_argument("--lr-gen", type=float, default=1e-3)
    p.add_argument("--lr-dis", type=float, default=2.5e-5)
    p.add_argument("--out", default="docs/ab_mt_noise_sigma.csv")
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    all_rows, summaries = [], []
    t0 = time.time()
    for sigma in SIGMAS:
        rows, summary = run_pair(sigma, args.iters, args.size, args.batch,
                                 args.consistency, args.lr_gen, args.lr_dis)
        all_rows += rows
        summaries.append(summary)
        print(f"sigma={sigma}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in summary.items() if k != "sigma"),
            flush=True)

    C.write_rows_csv(args.out, all_rows)
    print(f"\nwrote {args.out} ({len(all_rows)} rows, {time.time()-t0:.0f}s)")

    # the bound: max cross-sigma spread vs the jax-vs-torch parity gap
    for k in KEYS:
        for fw in ("jax", "torch"):
            vals = [s[f"{fw}_{k}_late"] for s in summaries]
            print(f"{fw:5s} {k}: late-window mean across sigmas "
                  f"[{min(vals):.5f}, {max(vals):.5f}] spread "
                  f"{max(vals)-min(vals):.5f}")
        gaps = [abs(s[f"jax_{k}_late"] - s[f"torch_{k}_late"]) for s in summaries]
        print(f"      {k}: per-sigma jax-vs-torch gap max {max(gaps):.5f}")


if __name__ == "__main__":
    main()
