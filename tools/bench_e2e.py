#!/usr/bin/env python
"""End-to-end host-fed TPU throughput (VERDICT r3 item 4).

bench.py times the device step on PRE-STAGED arrays; this tool measures
the production feeding story: the real BatchLoader (full 512x512 train
augmentation stack, native C++ hot path) -> per-batch jax.device_put ->
the flagship jitted step, overlapped exactly like Trainer.train_epoch
(async dispatch, one data-dependent drain at the end of the window).
Reported alongside a same-session pre-staged window so the host overhead
is a measured in-session delta, not cross-session arithmetic, plus a
worker-count scaling row.

Reference hot path being reproduced: DataLoader(num_workers=6) feeding
per-iteration .cuda() H2D copies (train_use_fix_initial.py:170-177,
Trainer_prototype_full.py:273-285).

Usage: python tools/bench_e2e.py [--size 512] [--batch 8] [--steps 24]
       [--workers 1,2] [--norm bn]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24, help="steps per timed window")
    ap.add_argument("--workers", default="1,2", help="comma list of loader thread counts")
    ap.add_argument("--norm", default="bn")
    ap.add_argument("--n-data", type=int, default=64, help="synthetic dataset size")
    args = ap.parse_args()

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.data import SyntheticFundus, train_transforms
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.models.layers import set_dropout_impl
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step
    from uda_clr_tpu.utils import hostfeed
    from uda_clr_tpu.utils.benchmarking import (
        enable_persistent_compile_cache,
        timed_windows,
    )

    enable_persistent_compile_cache()

    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))
    size, batch = args.size, args.batch

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.norm = args.norm
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8

    n_dev = len(jax.devices())
    n_data = n_dev
    while batch % n_data:
        n_data -= 1
    mesh = get_mesh((n_data,))
    sh = batch_sharding(mesh)
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm=args.norm, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    # source + target datasets with the FULL train augmentation pipeline
    ds_s = SyntheticFundus(n=args.n_data, size=size + 32, transform=train_transforms(size))
    ds_t = SyntheticFundus(n=args.n_data, size=size + 32, transform=train_transforms(size), seed=1)

    # ---- compile + warmup on one real batch; close the generator before
    # anything is timed so its producer threads can't compete for this
    # single core during the pre-staged window or the H2D probe
    gen = hostfeed.paired_batches(ds_s, ds_t, batch, workers=2)
    bs, bt = next(gen)
    gen.close()
    time.sleep(0.5)  # stop-aware workers wake within 0.2 s (pipeline.py)
    db = hostfeed.device_batch(bs, bt, sh)

    def step_once(st):
        st, metrics = step(st, db, 1e-3, 2.5e-5, 30)
        return st, metrics["loss_all"]

    # ---- compile + pre-staged window (same session, bench.py-style
    # methodology via the shared scaffold)
    state, stats = timed_windows(step_once, state, windows=1, iters=args.steps)
    print(f"# compiled in {stats['compile_s']:.1f}s", file=sys.stderr, flush=True)
    prestaged_ms = stats["median_ms"]
    prestaged_ips = batch / (prestaged_ms / 1e3) / n_data
    print(f"# pre-staged: {prestaged_ms:.1f} ms/step, {prestaged_ips:.1f} img/s/chip",
          file=sys.stderr, flush=True)

    # ---- pure H2D transfer cost of one step's batch through this box's
    # tunneled relay (the device_put path production PCIe does in ~10 ms)
    one = {k: np.asarray(jax.device_get(v)) for k, v in db.items()}
    h2d_ms, nbytes = hostfeed.h2d_probe(one, sh)
    print(f"# pure H2D: {h2d_ms:.1f} ms for {nbytes/1e6:.1f} MB "
          f"({nbytes/1e6/(h2d_ms/1e3):.0f} MB/s)", file=sys.stderr, flush=True)

    # ---- host-fed windows, one per worker count (+ a pure-loader row)
    rows = []
    for workers in [int(w) for w in args.workers.split(",")]:
        gen = hostfeed.paired_batches(ds_s, ds_t, batch, workers)
        ms, state = hostfeed.host_fed_window(step, state, gen, sh, args.steps)
        ips = batch / (ms / 1e3) / n_data
        # pure loader throughput at this worker count (no device work)
        load_ms = hostfeed.pure_load_ms(gen, args.steps, workers=workers)
        gen.close()  # don't let this row's workers pollute the next row
        time.sleep(0.5)
        rows.append({"workers": workers, "step_ms": round(ms, 1),
                     "img_per_sec_chip": round(ips, 2),
                     "device_fraction": round(prestaged_ms / ms, 3),
                     "load_ms": round(load_ms, 1)})
        print(f"# host-fed ({workers} workers): {ms:.1f} ms/step, {ips:.1f} img/s/chip, "
              f"pure-load {load_ms:.1f} ms", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"host-fed e2e train throughput ({size}x{size}, B{batch}, "
                  f"T=8 MC, bf16, {args.norm})",
        "prestaged_step_ms": round(prestaged_ms, 1),
        "prestaged_img_per_sec_chip": round(prestaged_ips, 2),
        "h2d_ms": round(h2d_ms, 1),
        "h2d_mbytes": round(nbytes / 1e6, 1),
        "host_fed": rows,
        "device_kind": jax.devices()[0].device_kind,
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
