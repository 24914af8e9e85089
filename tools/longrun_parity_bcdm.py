"""Long-horizon training-dynamics parity for the bytecode-only
``Trainer_bcdm`` reconstruction: the fused 3-phase JAX bcdm step vs the
torch transcription (tests/torch_step_ref.py:bcdm_iteration,
instruction-verified against Trainer_bcdm.cpython-38.pyc) from identical
converted weights over identical synthetic data.

Per iteration both frameworks run the full compiled choreography: phase A
(tempered source seg, F+C1+C2 Adam), phase B (dead source forward's BN
side effects + classifier-only 0.01*cdd_before), phase C (4 inner
feature-extractor iterations) — i.e. 6 optimizer steps and ~11 train-mode
forwards per iteration, the densest state-update chain of any method.
fp32, dropout off, production lr 1e-3 (the bytecode's const).

Usage:
  python tools/longrun_parity_bcdm.py --iters 60 --out docs/longrun_parity_bcdm.csv
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

from tests.torch_ref import TorchDeepLab
from tests.torch_step_ref import bcdm_iteration
from tools import _longrun_common as C
from uda_clr_tpu.convert.torch_import import convert_deeplab_state_dict
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step

KEYS = ("loss_seg", "loss_cdd_before", "loss_cdd_after", "loss_all")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr-gen", type=float, default=1e-3)
    p.add_argument("--out", default="docs/longrun_parity_bcdm.csv")
    p.add_argument("--n-data", type=int, default=24)
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    B, SIZE = args.batch, args.size

    torch.manual_seed(0)
    tm1 = TorchDeepLab(num_classes=2, output_stride=16)
    tm2 = TorchDeepLab(num_classes=2, output_stride=16)
    tm1.train(), tm2.train()
    C.zero_torch_dropout(tm1), C.zero_torch_dropout(tm2)
    opt_fea = torch.optim.Adam(tm1.backbone.parameters(), lr=args.lr_gen, betas=(0.9, 0.99))
    opt_cls = torch.optim.Adam(
        list(tm1.aspp.parameters()) + list(tm1.decoder.parameters())
        + list(tm2.aspp.parameters()) + list(tm2.decoder.parameters()),
        lr=args.lr_gen, betas=(0.9, 0.99),
    )

    def conv(m):
        sd = {k: v.numpy() for k, v in m.state_dict().items() if "num_batches_tracked" not in k}
        return convert_deeplab_state_dict(sd, output_stride=16)

    p1, s1 = conv(tm1)
    p2, s2 = conv(tm2)

    cfg = C.build_config(mc_samples=2)
    cfg.method.method = "bcdm"
    model = C.build_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), with_cls2=True
    )
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, p1),
        gen_stats=jax.tree.map(jnp.asarray, s1),
        cls2_params={k: jax.tree.map(jnp.asarray, p2[k]) for k in ("aspp", "decoder")},
        cls2_stats={k: jax.tree.map(jnp.asarray, s2[k]) for k in ("aspp", "decoder")},
    )
    step = make_train_step(model, cfg, "bcdm", proto_phase=False)

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

            state, metrics = step(state, C.device_batch(batch_s, batch_t),
                                  args.lr_gen, 2.5e-5, 30)
            metrics.pop("_viz", None)
            got = {k: float(v) for k, v in jax.device_get(metrics).items()}

            want = bcdm_iteration(
                tm1, tm2, opt_fea, opt_cls,
                C.to_nchw(img_s), C.to_nchw(map_s), C.to_nchw(bnd_s), C.to_nchw(img_t),
            )
            want["loss_all"] = want["loss_seg"] + 0.01 * (
                want["loss_cdd_before"] + want["loss_cdd_after"]
            )

            row = {"iter": done}
            for k in KEYS:
                row[f"jax_{k}"] = got.get(k, float("nan"))
                row[f"torch_{k}"] = want.get(k, float("nan"))
            rows.append(row)
            if done % 10 == 0:
                print(
                    f"[{done}/{args.iters}] jax seg {row['jax_loss_seg']:.4f} "
                    f"torch {row['torch_loss_seg']:.4f}  cdd_after jax "
                    f"{row['jax_loss_cdd_after']:.5f} torch {row['torch_loss_cdd_after']:.5f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
            done += 1
        epoch += 1

    # held-out Dice of classifier 1 (the eval model), both frameworks
    eval_step = make_eval_step(model)
    jax_dice = C.jax_val_dice(eval_step, state, ds_val)

    C.write_rows_csv(args.out, rows)
    print(f"\nwrote {args.out} ({len(rows)} iterations, {time.time()-t0:.0f}s)")
    print(f"val Dice (cup, disc) of classifier 1: jax {tuple(np.round(jax_dice,4))} "
          f"torch {tuple(np.round(C.torch_val_dice(tm1, ds_val),4))}")
    C.print_rel_diff_summary(rows, KEYS, width=16)


if __name__ == "__main__":
    main()
