#!/usr/bin/env python
"""A/B the MC-rectification fast path (VERDICT r1 item 9).

Three variants of the flagship prototype_full step, identical seed and
identical synthetic data stream:

  fast+fused  — mc_fast=True, Pallas fused mask head (production default)
  fast+xla    — mc_fast=True, XLA mask head (isolates the kernel)
  slow        — mc_fast=False (the reference's repeated-2B full forwards)

The paths differ ONLY inside the no-grad MC sampling (stats granularity
of the train-mode BNs across T samples and the dropout PRNG stream), so
their loss/std-map trajectories should be statistically indistinguishable;
systematic divergence would mean the mc_fast approximation is NOT noise
and the default must flip (steps.py:_mc_dropout_forward docstring).

Runs on whatever backend is default (real TPU under axon). Prints a CSV
of per-step losses + the mean MC std-map mass per variant.

Usage: python tools/ab_mc_fast.py [--steps 60] [--size 256] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(name, mc_fast, mask_head_impl, steps, size, batch):
    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8
    cfg.method.mc_fast = mc_fast
    cfg.method.mask_head_impl = mask_head_impl

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm="bn", dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    rng = np.random.default_rng(0)  # same stream for every variant
    losses, intras = [], []
    for i in range(steps):
        data = {
            "image_s": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
            "map_s": (rng.uniform(0, 1, (batch, size, size, 2)) > 0.5).astype(np.float32),
            "boundary_s": rng.uniform(0, 1, (batch, size, size, 1)).astype(np.float32),
            "image_t": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
        }
        state, m = step(state, data, 1e-3, 2.5e-5, 30)
        losses.append(float(m["loss_all"]))
        intras.append(float(m["loss_intra"]))
    print(f"# {name}: loss[0]={losses[0]:.4f} loss[-1]={losses[-1]:.4f} "
          f"mean_last10={np.mean(losses[-10:]):.4f} "
          f"intra_last10={np.mean(intras[-10:]):.5f}", flush=True)
    return losses, intras


def main():
    from uda_clr_tpu.utils.benchmarking import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="docs/ab_mc_fast.csv")
    args = ap.parse_args()

    variants = [
        ("fast_fused", True, "auto"),
        ("fast_xla", True, "xla"),
        ("slow", False, "xla"),
    ]
    results = {}
    for name, fast, impl in variants:
        results[name] = run_variant(name, fast, impl, args.steps, args.size, args.batch)

    with open(args.out, "w") as f:
        f.write("step," + ",".join(
            f"{n}_loss,{n}_intra" for n, _, _ in variants) + "\n")
        for i in range(args.steps):
            row = [str(i)]
            for n, _, _ in variants:
                row += [f"{results[n][0][i]:.5f}", f"{results[n][1][i]:.6f}"]
            f.write(",".join(row) + "\n")
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
