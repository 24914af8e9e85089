"""Chaos-sensitivity control for the long-horizon parity run
(docs/longrun_parity.csv): re-run the SAME JAX training twice — once
unperturbed, once with a 1e-6 relative perturbation on one backbone
kernel — and report the final val-Dice spread.

If a 1e-6 perturbation moves the 300-iteration outcome by as much as the
JAX-vs-torch gap, the gap is chaotic trajectory divergence (fp32 noise
amplified through Adam sign-like steps and hard pseudo-label
thresholds), not a systematic framework difference.

The training setup (weights, data streams, config) is shared with
tools/longrun_parity.py via tools/_longrun_common.py so the control
provably measures the same training it controls for.
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

from tools import _longrun_common as C
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args(argv)

    layers_lib.set_dropout_impl("off")
    B, SIZE = args.batch, args.size

    tm, tdis, tdis2 = C.build_torch_side()
    gen_params, gen_stats, dis_params, dis2_params = C.convert_to_jax(tm, tdis, tdis2)

    cfg = C.build_config(mc_samples=4)
    model = C.build_model()
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    eval_step = make_eval_step(model)
    ds_val = C.val_set(SIZE)

    def run(perturb: float):
        state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
        gp = jax.tree.map(jnp.asarray, gen_params)
        if perturb:
            k = gp["backbone"]["stem"]["conv"]["kernel"]
            gp["backbone"]["stem"]["conv"]["kernel"] = k * (1.0 + perturb)
        state = state.replace(
            gen_params=gp,
            gen_stats=jax.tree.map(jnp.asarray, gen_stats),
            dis_params=jax.tree.map(jnp.asarray, dis_params),
            dis2_params=jax.tree.map(jnp.asarray, dis2_params),
        )
        loader_s, it_t = C.train_streams(SIZE, B)
        done, epoch = 0, 0
        while done < args.iters:
            for batch_s in loader_s.epoch(epoch):
                if done >= args.iters:
                    break
                batch = C.device_batch(batch_s, next(it_t))
                state, metrics = step(state, batch, 1e-3, 2.5e-5, 30)
                done += 1
            epoch += 1
        return C.jax_val_dice(eval_step, state, ds_val), float(metrics["loss_all"])

    t0 = time.time()
    d0, l0 = run(0.0)
    d1, l1 = run(1e-6)
    print(f"unperturbed: val dice (cup, disc) = ({d0[0]:.4f}, {d0[1]:.4f}), last loss {l0:.4f}")
    print(f"1e-6 perturbed: val dice (cup, disc) = ({d1[0]:.4f}, {d1[1]:.4f}), last loss {l1:.4f}")
    print(f"dice spread from 1e-6 perturbation: cup {abs(d0[0]-d1[0]):.4f} disc {abs(d0[1]-d1[1]):.4f}")
    print(f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
