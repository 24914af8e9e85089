#!/usr/bin/env python
"""Throughput vs batch size for the flagship step (perf headroom artifact).

The reference trains at batch 8 (train_use_fix_initial.py:42-48); this
tool measures the same fused prototype_full step at B in {8, 16, 32} to
show how much of the chip the workload can still absorb at larger
per-chip batches (the relevant regime for production DP serving/training,
where global batch = 8 x n_chips and per-chip batch is a free knob).
Pre-staged device arrays (device-bound; the host path is measured
separately by bench.py's host_fed block / tools/bench_e2e.py).

Prints one JSON line with a row per batch size: median step ms over 3
windows, img/s/chip, and XLA cost-analysis MFU.

Usage: python tools/bench_batch_scaling.py [--batches 8,16,32] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uda_clr_tpu.utils.benchmarking import (
    cost_mfu, enable_persistent_compile_cache, oom_message, staged_train_batch,
    timed_windows,
)


def main():
    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized backbone (cfg.model.remat): frees "
                         "HBM for larger batches at ~1 backbone fwd of FLOPs")
    args = ap.parse_args()

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.models.layers import set_dropout_impl
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))
    size = args.size
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8

    mesh = get_mesh((1,))
    sh = batch_sharding(mesh)
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm="bn", dtype=jnp.bfloat16, remat=args.remat)
    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
        try:
            rows.append(_measure(batch, size, args, cfg, model, mesh, sh,
                                 create_train_state, replicated_sharding,
                                 make_train_step))
        except Exception as e:  # e.g. HBM OOM at large batches — report, keep going
            msg = oom_message(e)
            rows.append({"batch": batch, "error": msg})
            print(f"# B{batch}: FAILED: {msg}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": f"prototype_full batch scaling ({size}x{size}, "
                                "T=8 MC, bf16"
                                + (", remat" if args.remat else "") + ")",
                      "rows": rows, "device_kind": jax.devices()[0].device_kind}))


def _measure(batch, size, args, cfg, model, mesh, sh,
             create_train_state, replicated_sharding, make_train_step):
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))
    data = staged_train_batch(batch, size, sh)
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    def step_once(st):
        st, metrics = step(st, data, 1e-3, 2.5e-5, 30)
        return st, metrics["loss_all"]

    state, stats = timed_windows(step_once, state,
                                 windows=args.windows, iters=args.iters)
    med, compile_s = stats["median_ms"], stats["compile_s"]
    mfu, tflops = cost_mfu(lambda: step.lower(state, data, 1e-3, 2.5e-5, 30), med)
    row = {"batch": batch, "step_ms": round(med, 1),
           "img_per_sec_chip": round(batch / (med / 1e3), 2),
           "mfu": round(mfu, 4) if mfu is not None else None,
           "step_tflops": round(tflops, 2) if tflops is not None else None,
           "compile_s": round(compile_s, 1)}
    print(f"# B{batch}: {med:.1f} ms/step, {row['img_per_sec_chip']} img/s, "
          f"MFU {row['mfu']}", file=sys.stderr, flush=True)
    return row


if __name__ == "__main__":
    main()
