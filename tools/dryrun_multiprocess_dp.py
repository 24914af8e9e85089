#!/usr/bin/env python
"""Multi-process data-parallel dryrun: 2 OS processes x 4 CPU devices
train ONE global-mesh flagship step with loss identical to the
single-process 8-device run.

VERDICT r4 item 5 (pod readiness): the DP story must work ACROSS
processes, not just across one process's devices, before a multi-host
pod ever appears. This driver proves the whole path on the CPU backend:

  jax.distributed.initialize (parallel/distributed.py, config-gated in
  RunConfig.dist_*)  ->  per-process dataset sharding
  (BatchLoader(process_index, process_count) — each process augments only
  its batch rows, global (seed, epoch, bi, global_j) rng contract)  ->
  jax.make_array_from_process_local_data global batches  ->  the SAME
  jitted prototype_full train step over the global ('data',) mesh, XLA
  collectives now crossing process boundaries.

Identity claim checked: worker 0 loss == worker 1 loss == single-process
8-device loss (exact across workers; allclose vs single-process, whose
executable may schedule reductions differently).

Usage (parent orchestrates everything):
  python tools/dryrun_multiprocess_dp.py [--out docs/dryrun_multiprocess_dp.txt]

Roles (spawned internally):
  --role single            1 process, 8 CPU devices
  --role worker --pid N    2 processes x 4 CPU devices, gloo collectives
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE = 48  # stride-16-clean; matches __graft_entry__.dryrun_multichip
BATCH = 8
COORD = "127.0.0.1:12973"


def _force_cpu(n_devices: int) -> None:
    import jax

    # sitecustomize pins the TPU plugin and ignores JAX_PLATFORMS env
    # (CLAUDE.md) — force the CPU backend before anything touches it
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    from uda_clr_tpu.utils.benchmarking import enable_persistent_compile_cache

    enable_persistent_compile_cache()


def _run_step(mesh, process_index: int, process_count: int) -> float:
    """Build the deterministic loader slice + state, run ONE flagship
    step over `mesh`, return loss_all (replicated scalar)."""
    import jax
    import numpy as np

    from uda_clr_tpu.config import Config
    from uda_clr_tpu.data.pipeline import BatchLoader
    from uda_clr_tpu.data.synthetic import SyntheticFundus
    from uda_clr_tpu.data.transforms import train_transforms
    from uda_clr_tpu.models.deeplab import DeepLab
    from uda_clr_tpu.parallel.distributed import put_global, put_global_batch
    from uda_clr_tpu.parallel.mesh import batch_sharding, replicated_sharding
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    ds_s = SyntheticFundus(16, SIZE + 28, seed=1, transform=train_transforms(SIZE))
    ds_t = SyntheticFundus(16, SIZE + 28, seed=2, transform=train_transforms(SIZE))
    mk = lambda ds, seed: BatchLoader(
        ds, BATCH, shuffle=True, seed=seed, num_workers=1,
        process_index=process_index, process_count=process_count)
    bs = next(mk(ds_s, 0).epoch(0))
    bt = next(mk(ds_t, 1).epoch(0))
    host_batch = {
        "image_s": bs["image"], "map_s": bs["map"],
        "boundary_s": bs["boundary"], "image_t": bt["image"],
    }
    data = put_global_batch(host_batch, batch_sharding(mesh))

    cfg = Config()
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 2
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(model, jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3))
    # identical on every process (same PRNGKey); re-stage the host values
    # as replicated GLOBAL arrays so the step's donation/collectives see
    # one logical state
    rep = replicated_sharding(mesh)
    state = jax.tree.map(
        lambda x: put_global(np.asarray(jax.device_get(x)), rep), state)

    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    new_state, metrics = step(state, data, 1e-3, 2.5e-5, 30)
    assert int(jax.device_get(new_state.step)) == 1
    return float(jax.device_get(metrics["loss_all"]))


def role_single() -> None:
    _force_cpu(8)
    import jax

    from uda_clr_tpu.parallel.mesh import get_mesh

    loss = _run_step(get_mesh((8,)), 0, 1)
    print(json.dumps({"role": "single", "devices": len(jax.devices()),
                      "loss_all": loss}), flush=True)


def role_worker(pid: int) -> None:
    _force_cpu(4)
    import jax

    # cross-process CPU collectives ride gloo; on a pod this would be the
    # TPU runtime's ICI/DCN instead — same program, different transport
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    from uda_clr_tpu.parallel.distributed import initialize
    from uda_clr_tpu.parallel.mesh import get_mesh

    initialize(COORD, 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = get_mesh((8,), devices=jax.devices())  # GLOBAL mesh
    loss = _run_step(mesh, pid, 2)
    print(json.dumps({"role": f"worker{pid}", "process_index": jax.process_index(),
                      "devices": len(jax.devices()),
                      "local_devices": len(jax.local_devices()),
                      "loss_all": loss}), flush=True)


def parent(out_path: str) -> None:
    env = dict(os.environ)
    me = os.path.abspath(__file__)

    def last_json(text: str) -> dict:
        for line in reversed(text.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(f"no JSON line in output:\n{text[-2000:]}")

    print("# single-process 8-device reference...", flush=True)
    single = subprocess.run(
        [sys.executable, me, "--role", "single"], env=env,
        capture_output=True, text=True, timeout=1800)
    if single.returncode != 0:
        sys.exit(f"single-process run failed:\n{single.stderr[-3000:]}")
    ref = last_json(single.stdout)
    print(f"# single: {ref}", flush=True)

    print("# 2 processes x 4 devices...", flush=True)
    workers = [
        subprocess.Popen([sys.executable, me, "--role", "worker", "--pid", str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in (0, 1)
    ]
    outs = []
    for i, w in enumerate(workers):
        try:
            out, err = w.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            sys.exit(f"worker {i} timed out")
        if w.returncode != 0:
            sys.exit(f"worker {i} failed:\n{err[-3000:]}")
        outs.append(last_json(out))
        print(f"# worker{i}: {outs[-1]}", flush=True)

    l0, l1, ls = outs[0]["loss_all"], outs[1]["loss_all"], ref["loss_all"]
    assert l0 == l1, f"workers disagree: {l0} vs {l1}"
    assert abs(l0 - ls) <= 1e-5 * max(1.0, abs(ls)), \
        f"multi-process loss {l0} != single-process {ls}"
    lines = [
        "multi-process DP dryrun: PASS",
        f"single-process 8-device loss_all: {ls}",
        f"worker0 (2proc x 4dev) loss_all:  {l0}",
        f"worker1 (2proc x 4dev) loss_all:  {l1}",
        "workers exact-equal; multi- vs single-process allclose(1e-5)",
    ]
    print("\n".join(lines))
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
        f.write(json.dumps({"single": ref, "workers": outs}) + "\n")
    print(f"# wrote {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="parent", choices=("parent", "single", "worker"))
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "dryrun_multiprocess_dp.txt"))
    args = ap.parse_args()
    if args.role == "single":
        role_single()
    elif args.role == "worker":
        role_worker(args.pid)
    else:
        parent(args.out)


if __name__ == "__main__":
    main()
