#!/usr/bin/env python
"""Same-session bn-vs-tn throughput A/B of the flagship train step.

The TPU relay's session state moves absolute step time ~17% between
sessions (README "Perf caveat"), so the TransNorm overhead claim must be
measured as a ratio INSIDE one process: this times the production
prototype_full step (512x512, batch 8, T=8 MC, bf16) for norm='bn' and
norm='tn' back to back and prints both plus tn/bn.

Reference capability: --use_TN (networks/sync_batchnorm/batchnorm.py:390-521);
target: the BASELINE.md >=3x north star should hold for the TN
configuration too (VERDICT r3 item 3).

Usage: python tools/bench_norm_ab.py [--size 512] [--batch 8] [--windows 5]
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
    enable_persistent_compile_cache,
    staged_train_batch,
    timed_windows,
)
from uda_clr_tpu.utils.devinfo import A100_REFERENCE_IMG_PER_SEC


def bench_norm(norm: str, size: int, batch: int, windows: int, iters: int):
    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.norm = norm
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8

    n_dev = len(jax.devices())
    n_data = n_dev
    while batch % n_data:
        n_data -= 1
    mesh = get_mesh((n_data,))
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm=norm, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))

    sh = batch_sharding(mesh)
    data = staged_train_batch(batch, size, sh)
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    def step_once(st):
        st, metrics = step(st, data, 1e-3, 2.5e-5, 30)
        return st, metrics["loss_all"]

    state, stats = timed_windows(step_once, state, windows=windows, iters=iters)
    print(f"# [{norm}] compiled in {stats['compile_s']:.1f}s",
          file=sys.stderr, flush=True)
    med = stats["median_ms"]
    return {
        "norm": norm,
        "step_ms_median": round(med, 1),
        "step_ms_windows": [round(w, 1) for w in stats["window_ms"]],
        "img_per_sec_chip": round(batch / (med / 1e3) / n_data, 2),
        "compile_s": round(stats["compile_s"], 1),
    }


def main():
    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from uda_clr_tpu.models.layers import set_dropout_impl
    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))

    results = [bench_norm(n, args.size, args.batch, args.windows, args.iters)
               for n in ("bn", "tn")]
    ratio = results[1]["step_ms_median"] / results[0]["step_ms_median"]
    out = {
        "bn": results[0],
        "tn": results[1],
        "tn_over_bn": round(ratio, 3),
        "tn_vs_baseline": round(
            results[1]["img_per_sec_chip"] / A100_REFERENCE_IMG_PER_SEC, 3),
        "device_kind": jax.devices()[0].device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
