#!/usr/bin/env python
"""Inference (serving) throughput of the eval path.

The reference has no inference benchmark — its only eval surface is the
per-epoch ``validate()`` loop (Trainer_prototype_full.py:110-222, batch 8,
one no-grad forward per batch). For production serving the relevant
numbers are: images/sec/chip of the deterministic eval forward (the
deployed artifact: backbone -> ASPP -> dual-head decoder -> sigmoid
probabilities at 512x512) across per-chip batch sizes, and the host-side
post-processing cost per image (utils/postprocess.py — medfilt/erosion/
largest-fillhole, reference Utils.py:438-474) that a serving host pays
downstream of the chip.

Prints one JSON line: a row per batch size (median step ms over windows,
img/s/chip, XLA cost-analysis MFU) plus the host postprocess ms/image.

Usage: python tools/bench_eval.py [--size 512] [--batches 8,32,64]
       [--norm bn] [--dtype bfloat16] [--windows 3] [--iters 10]
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

from uda_clr_tpu.utils.benchmarking import (
    cost_mfu, enable_persistent_compile_cache, oom_message, timed_windows,
)


def main():
    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", default="8,32,64")
    ap.add_argument("--norm", default="bn")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
    from uda_clr_tpu.utils.postprocess import postprocessing

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    size = args.size
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16,
                    norm=args.norm, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), train=False
    )
    mesh = get_mesh((1,))
    variables = jax.device_put(variables, replicated_sharding(mesh))
    sh = batch_sharding(mesh)

    @jax.jit
    def serve(variables, image, token):
        """The deployed forward: eval-mode dual-head DeepLab -> cup/disc
        sigmoid probabilities (fp32, ready for host postprocessing). The
        scalar checksum is the relay-safe timing barrier (CLAUDE.md);
        ``token`` (the previous call's checksum) is folded into the input
        so consecutive serve calls CHAIN on device — timed_windows'
        end-of-window fetch then provably forces the whole sequence (XLA
        cannot fold ``0.0 * token`` away: floats admit NaN/Inf)."""
        outs = model.apply(variables, (image + 0.0 * token).astype(dtype),
                           train=False)
        probs = jax.nn.sigmoid(outs.mask_logits.astype(jnp.float32))
        return probs, jnp.mean(probs)

    rng = np.random.default_rng(0)
    rows = []
    probs_np = None
    for batch in [int(b) for b in args.batches.split(",")]:
        try:
            image = jax.device_put(
                rng.standard_normal((batch, size, size, 3)).astype(np.float32), sh)

            token0 = jnp.float32(0.0)

            def serve_once(carry):
                _, token = carry
                probs, chk = serve(variables, image, token)
                return (probs, chk), chk

            (probs, _), stats = timed_windows(serve_once, (None, token0),
                                              windows=args.windows,
                                              iters=args.iters)
            med, compile_s = stats["median_ms"], stats["compile_s"]
            if probs_np is None:
                probs_np = np.asarray(jax.device_get(probs))[0]
            mfu, tflops = cost_mfu(
                lambda: serve.lower(variables, image, token0), med)
            row = {"batch": batch, "step_ms": round(med, 1),
                   "img_per_sec_chip": round(batch / (med / 1e3), 2),
                   "mfu": round(mfu, 4) if mfu is not None else None,
                   "step_tflops": round(tflops, 3) if tflops is not None else None,
                   "compile_s": round(compile_s, 1)}
            print(f"# B{batch}: {med:.1f} ms, {row['img_per_sec_chip']} img/s, "
                  f"MFU {row['mfu']}", file=sys.stderr, flush=True)
            rows.append(row)
        except Exception as e:
            msg = oom_message(e)
            rows.append({"batch": batch, "error": msg})
            print(f"# B{batch}: FAILED: {msg}", file=sys.stderr, flush=True)

    # host post-processing cost per image (serving pays this on CPU after
    # the chip; reference Utils.py:438-474 semantics)
    post_ms = None
    if probs_np is not None:
        n = 3
        t0 = time.time()
        for _ in range(n):
            postprocessing(probs_np, threshold=0.75, dataset="G")
        post_ms = (time.time() - t0) / n * 1000.0
        print(f"# host postprocessing: {post_ms:.1f} ms/image", file=sys.stderr)

    print(json.dumps({
        "metric": f"eval/serving forward throughput ({size}x{size}, "
                  f"{args.dtype}, {args.norm})",
        "rows": rows,
        "host_postprocess_ms_per_image": round(post_ms, 1) if post_ms else None,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
