"""Long-horizon training-dynamics parity for the disk-bank prototype
method (``method='prototype'``, the checked-in Trainer_prototype) vs its
torch transcription (tests/torch_step_ref.py:prototype_bank_iteration),
from identical converted weights, an identical INITIALIZED prototype bank,
and identical synthetic data streams.

This is the most config-branched state chain in the family (VERDICT r3
item 5): per-iteration bank EMA (0.001, zero-guarded) feeding the next
iteration's prototype-distance losses, epoch-RAMPED pseudo-label
thresholds (adaptation_factor advances with the epoch counter here, unlike
the fixed-epoch 2-iteration step-parity test), Adam + 2x SGD + BN-stat
round-trips. ``--wotn`` switches BOTH sides to the Trainer_prototype_woTN
configuration (min-max L2 weight rectification of the target soft maps
against the live bank + pseudo-labels from a FROZEN initial model) —
exercising the instruction-verified woTN semantics over a long horizon.

fp32, dropout off, production hyperparameters otherwise.

Usage:
  python tools/longrun_parity_bank.py --iters 100 --out docs/longrun_parity_bank.csv
  python tools/longrun_parity_bank.py --iters 100 --wotn --out docs/longrun_parity_bank_wotn.csv
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

from tests.torch_step_ref import prototype_bank_iteration
from tools import _longrun_common as C
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step

KEYS = ("loss_all", "loss_seg", "loss_adv", "loss_bu", "loss_cup",
        "loss_disc", "loss_D", "loss_D2")
BANK_DIMS = {"bu": 304, "cup": 305, "disc": 305}  # mobilenet OS16 feature dims


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr-gen", type=float, default=1e-3)
    p.add_argument("--lr-dis", type=float, default=2.5e-5)
    p.add_argument("--wotn", action="store_true",
                   help="Trainer_prototype_woTN config: weight rectify + frozen pseudo model")
    p.add_argument("--out", default="docs/longrun_parity_bank.csv")
    p.add_argument("--n-data", type=int, default=24)
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    B, SIZE = args.batch, args.size

    tm, tdis, tdis2 = C.build_torch_side()
    # spread the BOUNDARY head too: the bank method thresholds
    # sigmoid(boundary_before) against the ramped adaptation factor
    # (same trick as tests/test_step_parity.py:386-387)
    with torch.no_grad():
        tm.decoder.last_conv_boundary[8].weight.mul_(10.0)
        tm.decoder.last_conv_boundary[8].bias.mul_(10.0)
    pseudo_tm = copy.deepcopy(tm) if args.wotn else None
    opt_gen = torch.optim.Adam(tm.parameters(), lr=args.lr_gen, betas=(0.9, 0.99))
    opt_dis = torch.optim.SGD(tdis.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    opt_dis2 = torch.optim.SGD(tdis2.parameters(), lr=args.lr_dis, momentum=0.99, weight_decay=5e-4)
    gen_params, gen_stats, dis_params, dis2_params = C.convert_to_jax(tm, tdis, tdis2)

    cfg = C.build_config(mc_samples=2)
    cfg.method.method = "prototype"
    if args.wotn:
        cfg.method.use_weight_rectify = True
        cfg.method.pseudo_from_initial = True
    model = C.build_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_proto_bank=True
    )
    gp = jax.tree.map(jnp.asarray, gen_params)
    gs = jax.tree.map(jnp.asarray, gen_stats)

    # INITIALIZED bank, identical on both sides (a production run seeds it
    # from cal_prototype.py's .npz; seeded unit normals exercise the same
    # chain: nonzero distance losses + EMA from iteration 0)
    bank_rng = np.random.default_rng(11)
    bank_np = {k: bank_rng.standard_normal(d).astype(np.float32) * 0.1
               for k, d in BANK_DIMS.items()}
    bank_t = {k: torch.from_numpy(v.copy()) for k, v in bank_np.items()}

    state = state.replace(
        gen_params=gp, gen_stats=gs,
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis2_params=jax.tree.map(jnp.asarray, dis2_params),
        proto_bank={k: jnp.asarray(v) for k, v in bank_np.items()},
    )
    if args.wotn:
        state = state.replace(
            initial_params=jax.tree.map(jnp.copy, gp),
            initial_stats=jax.tree.map(jnp.copy, gs),
        )
    step = make_train_step(model, cfg, "prototype", proto_phase=True)

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
            state, metrics = step(state, db, args.lr_gen, args.lr_dis, epoch)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}

            want = prototype_bank_iteration(
                tm, tdis, tdis2, opt_gen, opt_dis, opt_dis2, bank_t,
                C.to_nchw(img_s), C.to_nchw(map_s), C.to_nchw(bnd_s), C.to_nchw(img_t),
                epoch=epoch,
                use_weight_rectify=args.wotn,
                pseudo_model=pseudo_tm,
            )

            row = {"iter": done, "epoch": epoch}
            for k in KEYS:
                row[f"jax_{k}"] = got.get(k, float("nan"))
                row[f"torch_{k}"] = want.get(k, float("nan"))
            # the chained state itself: relative L2 divergence of the
            # EMA'd bank vectors
            for k in BANK_DIMS:
                a = np.asarray(state.proto_bank[k])
                b = bank_t[k].numpy()
                row[f"bank_{k}_reldiff"] = float(
                    np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
            rows.append(row)
            if done % 10 == 0:
                print(
                    f"[{done}/{args.iters}] ep{epoch} jax loss_all {row['jax_loss_all']:.4f} "
                    f"torch {row['torch_loss_all']:.4f}  cup jax "
                    f"{row['jax_loss_cup']:.5f} torch {row['torch_loss_cup']:.5f} "
                    f"bank_cup rel {row['bank_cup_reldiff']:.2e} ({time.time()-t0:.0f}s)",
                    flush=True,
                )
            done += 1
        epoch += 1

    eval_step = make_eval_step(model)
    jax_dice = C.jax_val_dice(eval_step, state, ds_val)

    C.write_rows_csv(args.out, rows)
    print(f"\nwrote {args.out} ({len(rows)} iterations, wotn={args.wotn}, "
          f"{time.time()-t0:.0f}s)")
    print(f"val Dice (cup, disc): jax {tuple(np.round(jax_dice, 4))} "
          f"torch {tuple(np.round(C.torch_val_dice(tm, ds_val), 4))}")
    for k in BANK_DIMS:
        print(f"bank[{k}] final rel L2 diff: {rows[-1][f'bank_{k}_reldiff']:.3e}")
    C.print_rel_diff_summary(rows, KEYS, width=10)


if __name__ == "__main__":
    main()
