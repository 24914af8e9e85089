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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
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

    from uda_clr_tpu.utils.devinfo import peak_tflops
    peak = peak_tflops(jax.devices()[0].device_kind)

    mesh = get_mesh((1,))
    sh = batch_sharding(mesh)
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm="bn", dtype=jnp.bfloat16, remat=args.remat)
    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
        try:
            rows.append(_measure(batch, size, args, cfg, model, mesh, sh, peak,
                                 create_train_state, replicated_sharding,
                                 make_train_step))
        except Exception as e:  # e.g. HBM OOM at large batches — report, keep going
            msg = str(e)
            cut = msg.lower().find("ran out of memory")
            if cut >= 0:
                msg = msg[cut:]
            rows.append({"batch": batch, "error": msg[:160]})
            print(f"# B{batch}: FAILED: {msg[:160]}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": f"prototype_full batch scaling ({size}x{size}, "
                                "T=8 MC, bf16"
                                + (", remat" if args.remat else "") + ")",
                      "rows": rows, "device_kind": jax.devices()[0].device_kind}))


def _measure(batch, size, args, cfg, model, mesh, sh, peak,
             create_train_state, replicated_sharding, make_train_step):
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))
    rng = np.random.default_rng(0)
    data = {
        "image_s": jax.device_put(
            rng.standard_normal((batch, size, size, 3)).astype(np.float32), sh),
        "map_s": jax.device_put(
            (rng.uniform(0, 1, (batch, size, size, 2)) > 0.5).astype(np.float32), sh),
        "boundary_s": jax.device_put(
            rng.uniform(0, 1, (batch, size, size, 1)).astype(np.float32), sh),
        "image_t": jax.device_put(
            rng.standard_normal((batch, size, size, 3)).astype(np.float32), sh),
    }
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    t0 = time.time()
    state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])  # relay-safe barrier (CLAUDE.md)
    compile_s = time.time() - t0
    for _ in range(2):
        state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])
    window_ms = []
    for _ in range(args.windows):
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
        float(metrics["loss_all"])
        window_ms.append((time.time() - t0) / args.iters * 1000.0)
    med = float(np.median(window_ms))
    mfu = tflops = None
    try:
        cost = step.lower(state, data, 1e-3, 2.5e-5, 30).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        tflops = float(cost["flops"]) / 1e12
        if peak:
            mfu = tflops / (med / 1e3) / peak
    except Exception as e:
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
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
