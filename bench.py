#!/usr/bin/env python
"""Train-throughput benchmark on real TPU hardware.

Measures images/sec/chip of the FULL flagship method (prototype_full: fused
source‖target forward, T=8 MC-dropout rectification, prototype EMA +
adversarial G and dual-D updates) at the reference's production config —
512x512, batch 8 (train_use_fix_initial.py:42-48) — in bfloat16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md — "published": {}). We baseline against an ESTIMATED
A100 throughput of the PyTorch reference's full method of 20 images/sec
(per-iteration work = 2 grad forwards + 4 no-grad forwards at 2x batch + 2
PatchGAN D passes + 3 backwards at batch 8 / 512^2; mobilenet DeepLabv3+
forward ~25ms at this size on A100 => ~0.4s/iter => ~20 img/s). The
BASELINE.json north-star target is 3x that (60 img/s/chip);
vs_baseline reported here is measured / 20 (i.e. >3.0 meets the target).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from uda_clr_tpu.utils.benchmarking import (
    cost_mfu,
    enable_persistent_compile_cache,
    staged_train_batch,
    timed_windows,
)
from uda_clr_tpu.utils.devinfo import A100_REFERENCE_IMG_PER_SEC


def main():
    import os

    enable_persistent_compile_cache()

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.models.layers import set_dropout_impl
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    # kernel-backend A/B knobs (default = shipped configuration)
    set_dropout_impl(os.environ.get("UDA_DROPOUT_IMPL", "xla16"))
    # UDA_BENCH_NORM=tn benchmarks the TransNorm configuration (--use_TN:
    # per-domain running stats + transferability residual); default is the
    # production plain-BN path the headline number tracks.
    norm = os.environ.get("UDA_BENCH_NORM", "bn")
    # UDA_BENCH_METHOD=prototype_mt benchmarks the paper-complete CLR step
    # (flagship + on-device strong-aug consistency + discriminative source
    # regularizer); default is the flagship the headline number tracks.
    method = os.environ.get("UDA_BENCH_METHOD", "prototype_full")
    # UDA_BENCH_WIRE=u8 measures the uint8 wire format end to end: the
    # pre-staged batch is staged in u8 too, so the timed executable is the
    # decode-inclusive one and device_fraction compares like programs
    # (data/wire.py). Default stays f32 for cross-round comparability.
    wire = os.environ.get("UDA_BENCH_WIRE", "f32")

    # UDA_BENCH_SIZE/UDA_BENCH_BATCH exist ONLY so the full script can be
    # smoke-tested at toy shapes on the CPU backend; the driver runs the
    # defaults (the reference's production 512x512 / B8 config).
    size = int(os.environ.get("UDA_BENCH_SIZE", "512"))
    batch = int(os.environ.get("UDA_BENCH_BATCH", "8"))
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.norm = norm
    cfg.method.method = method
    cfg.method.mc_samples = 8  # reference T=8
    cfg.method.mask_head_impl = os.environ.get("UDA_MASKHEAD_IMPL", "auto")

    n_dev = len(jax.devices())
    n_data = n_dev
    while batch % n_data:
        n_data -= 1
    mesh = get_mesh((n_data,))
    model = DeepLab(
        num_classes=2, backbone="mobilenet", output_stride=16, norm=norm,
        dtype=jnp.bfloat16,
    )
    state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3))
    state = jax.device_put(state, replicated_sharding(mesh))

    sh = batch_sharding(mesh)
    data = staged_train_batch(batch, size, sh, wire=wire)

    step = make_train_step(model, cfg, method, proto_phase=True)

    def step_once(carry):
        st, _ = carry
        st, metrics = step(st, data, 1e-3, 2.5e-5, 30)
        return (st, metrics), metrics["loss_all"]

    # compile + warmup + >=5 independent timing windows (VERDICT r2 item
    # 3): median + spread so one hot/cold relay window can't move the
    # headline by itself. Barrier methodology lives in utils/benchmarking.
    print("# compiling...", file=sys.stderr, flush=True)
    (state, metrics), stats = timed_windows(step_once, (state, None),
                                            windows=5, iters=10)
    compile_s = stats["compile_s"]
    window_ms = stats["window_ms"]
    med_ms = stats["median_ms"]
    print(f"# compiled in {compile_s:.1f}s", file=sys.stderr, flush=True)

    # Achieved MFU from XLA's compiled per-chip flop count vs chip peak —
    # self-contained, independent of the estimated A100 denominator.
    mfu, step_tflops = cost_mfu(
        lambda: step.lower(state, data, 1e-3, 2.5e-5, 30), med_ms)

    # End-to-end host-fed windows (VERDICT r3 item 4 / r4 item 2): the real
    # BatchLoader (full 512^2 train augmentation stack, native C++ hot
    # path) -> per-batch device_put -> the same jitted step, overlapped
    # like Trainer.train_epoch. The PRIMARY row is the production
    # configuration (uint8 wire + fork-process workers — the training
    # defaults since round 5); the f32/thread row is kept alongside for
    # cross-round comparability with BENCH_r01-r04. Reference hot path:
    # DataLoader(num_workers=6) + per-iteration .cuda() copies
    # (train_use_fix_initial.py:170-177).
    def host_fed_config(hf_wire: str, backend: str, workers: int,
                        st, hf_steps: int = 12):
        from uda_clr_tpu.data import SyntheticFundus, train_transforms
        from uda_clr_tpu.utils import hostfeed

        ds_s = SyntheticFundus(n=16, size=size + 32,
                               transform=train_transforms(size, wire=hf_wire))
        ds_t = SyntheticFundus(n=16, size=size + 32,
                               transform=train_transforms(size, wire=hf_wire),
                               seed=1)
        # pure H2D transfer of one REAL loader batch in THIS wire format
        # (the pre-staged bench batch is random noise, not encodable u8),
        # measured BEFORE any loader workers exist — prefetch competing
        # for this box's single core would otherwise inflate it
        one_s = [ds_s.get(i, np.random.default_rng((0, i))) for i in range(batch)]
        one_t = [ds_t.get(i, np.random.default_rng((1, i))) for i in range(batch)]
        from uda_clr_tpu.data.pipeline import collate

        bs0, bt0 = collate(one_s), collate(one_t)
        one = {"image_s": bs0["image"], "map_s": bs0["map"],
               "boundary_s": bs0["boundary"], "image_t": bt0["image"]}
        h2d_ms, nbytes = hostfeed.h2d_probe(one, sh)

        gen = hostfeed.paired_batches(ds_s, ds_t, batch, workers,
                                      backend=backend)
        hf_ms, st = hostfeed.host_fed_window(step, st, gen, sh, hf_steps)
        # pure loader pulls (host augmentation+collation, no device work);
        # with the h2d number above this decomposes the host-fed step — on
        # this tunneled-relay box the per-step device_put dominates,
        # production PCIe hosts move it in ~10 ms
        load_ms = hostfeed.pure_load_ms(gen, hf_steps, workers=workers)
        gen.close()
        row = {
            "step_ms": round(hf_ms, 1),
            "img_per_sec_chip": round(batch / (hf_ms / 1e3) / n_data, 2),
            "wire": hf_wire,
            "backend": backend,
            "workers": workers,
            "host_cores": os.cpu_count(),
            "device_fraction": round(med_ms / hf_ms, 3),
            "h2d_ms": round(h2d_ms, 1),
            "h2d_mbytes": round(nbytes / 1e6, 1),
            "load_ms": round(load_ms, 1),
        }
        print(f"# host-fed ({hf_wire}/{backend} x{workers}): "
              f"{hf_ms:.1f} ms/step", file=sys.stderr, flush=True)
        return row, st

    host_fed = host_fed_f32 = None
    workers = min(2, os.cpu_count() or 1)
    try:
        host_fed, state = host_fed_config("u8", "process", workers, state)
    except Exception as e:  # never let the host pipeline break the headline
        print(f"# host-fed u8 window unavailable: {e}", file=sys.stderr)
    try:
        host_fed_f32, state = host_fed_config("f32", "thread", workers, state)
    except Exception as e:
        print(f"# host-fed f32 window unavailable: {e}", file=sys.stderr)

    ips_per_chip = batch / (med_ms / 1e3) / n_data
    result = {
        "metric": f"{method} train throughput ({size}x{size}, B{batch}, T=8 MC, bf16"
        + (", TransNorm" if norm == "tn" else "")
        + (", u8 wire)" if wire == "u8" else ")"),
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / A100_REFERENCE_IMG_PER_SEC, 3),
        # the denominator is a documented ESTIMATE (BASELINE.md
        # sensitivity): plausible A100 numbers 15-25 img/s bound the ratio
        "vs_baseline_range": [round(ips_per_chip / 25.0, 2),
                              round(ips_per_chip / 15.0, 2)],
        "step_ms_median": round(med_ms, 1),
        "step_ms_windows": [round(w, 1) for w in window_ms],
        "mfu": round(mfu, 4) if mfu is not None else None,
        "step_tflops": round(step_tflops, 2) if step_tflops is not None else None,
        "host_fed": host_fed,
        "host_fed_f32": host_fed_f32,
        "device_kind": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))
    print(
        f"# devices={n_dev} mesh_data={n_data} compile={compile_s:.1f}s "
        f"step={med_ms:.1f}ms (windows {window_ms[0]:.1f}..{window_ms[-1]:.1f}) "
        f"loss={float(metrics['loss_all']):.4f}",
        file=sys.stderr,
        flush=True,
    )


if __name__ == "__main__":
    main()
