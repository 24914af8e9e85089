#!/usr/bin/env python
"""Capture an XLA device trace of the flagship train step on real TPU and
print the per-op time breakdown (the trace-driven perf workflow from
CLAUDE.md: jax.profiler trace -> uda_clr_tpu.utils.xplane reader, since
the tensorboard profile plugin is broken in this environment).

Usage:
    python tools/profile_step.py [--steps 5] [--top 40] [--out /tmp/trace]
    UDA_DROPOUT_IMPL=pallas python tools/profile_step.py   # backend A/B
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from uda_clr_tpu.utils.benchmarking import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/uda_trace")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.models.layers import set_dropout_impl
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step
    from uda_clr_tpu.utils.xplane import latest_trace, op_totals

    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))

    size, batch = args.size, args.batch
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 8

    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm="bn", dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    rng = np.random.default_rng(0)
    data = {
        "image_s": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
        "map_s": (rng.uniform(0, 1, (batch, size, size, 2)) > 0.5).astype(np.float32),
        "boundary_s": rng.uniform(0, 1, (batch, size, size, 1)).astype(np.float32),
        "image_t": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
    }
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)

    print("# compiling...", file=sys.stderr, flush=True)
    state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])
    for _ in range(2):
        state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])

    print(f"# tracing {args.steps} steps...", file=sys.stderr, flush=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    float(metrics["loss_all"])
    jax.profiler.stop_trace()

    path = latest_trace(args.out)
    rows = op_totals(path, top=args.top)
    total = sum(ms for _, ms, _ in op_totals(path, top=100000))
    print(f"# trace: {path}")
    print(f"# total device op time: {total:.1f} ms over {args.steps} steps "
          f"({total / args.steps:.1f} ms/step)")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for name, ms, cnt in rows:
        print(f"{ms / args.steps:9.3f}  {cnt:6d}  {name[:140]}")


if __name__ == "__main__":
    main()
