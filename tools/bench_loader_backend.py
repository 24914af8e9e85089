#!/usr/bin/env python
"""Thread-vs-process loader backend A/B + GIL-hold measurement.

Answers VERDICT r4 item 1 with numbers instead of extrapolation: the
production feeding claim needs (a) a worker model that actually scales
across cores (the reference uses 6 worker *processes* —
/root/reference/train_use_fix_initial.py:170-177), and (b) evidence for
how far the thread backend's GIL-released fraction carries it.

This box has ONE host core, so between-cell speedups are expected to be
~1.0 and are NOT the point. The three core-count-independent outputs are:

* ``cpu_s_per_batch`` (thread cells): total host CPU to augment + collate
  one batch — the numerator of "cores needed per chip".
* ``parent_cpu_s_per_batch`` (process cells): the parent's own CPU per
  batch (IPC unpickle + collate + queue) — the *serial* Amdahl term that
  caps process-backend scaling at 1/parent_cpu batches/s however many
  workers run.
* ``gil_stall_frac`` (thread backend): the fraction of a batch's CPU
  seconds spent inside unpreemptible GIL-held C calls, measured as probe-
  thread stalls >4x the GIL switch interval. Preemptible GIL-held
  bytecode yields every ~5 ms (switch interval) even on one core, so long
  probe stalls can only come from unpreemptible GIL-held C calls — the
  part of the pipeline that can never overlap across thread workers.
  (A plain rate-based probe would instead measure CPU contention on a
  1-core box; the gap criterion is what isolates held-GIL time, and the
  absolute held seconds are normalized by the separate no-probe
  cpu_s_per_batch because the probe stretches its own window's wall.)

Scaling model carried into PARITY.md "Host feeding": thread workers can
overlap at most the (1 - gil_stall_frac) of batch CPU that releases the
GIL; process workers scale to cpu_s_per_batch / target_step_s cores until
the parent's parent_cpu_s_per_batch serializes.

Run: python tools/bench_loader_backend.py [--batches 12] [--size 512]
Writes docs/loader_backend_ab.csv and prints one JSON line.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uda_clr_tpu.data.pipeline import BatchLoader  # noqa: E402
from uda_clr_tpu.data.synthetic import SyntheticFundus  # noqa: E402
from uda_clr_tpu.data.transforms import train_transforms  # noqa: E402

# every cell drains the same number of batches before its timed window so
# all cells time the SAME batch indices (augmentation cost is seed-
# dependent; per-cell drains would compare different work)
DRAIN = 5


def make_gen(ds, batch: int, backend: str, workers: int, prefetch: int = 2):
    loader = BatchLoader(ds, batch_size=batch, shuffle=True, seed=0,
                         num_workers=workers, prefetch=prefetch,
                         backend=backend)
    gen = loader.forever()
    for _ in range(DRAIN):
        next(gen)
    return gen


def measure_cell(ds, batch: int, backend: str, workers: int,
                 batches: int) -> dict:
    """Steady-state wall + parent-process CPU per batch; no probe thread
    runs during this window (it would steal the single core)."""
    gen = make_gen(ds, batch, backend, workers)
    cpu0 = time.process_time()
    t0 = time.time()
    for _ in range(batches):
        next(gen)
    wall = time.time() - t0
    cpu = time.process_time() - cpu0
    gen.close()
    cell = {
        "backend": backend,
        "workers": workers,
        "ms_per_batch": round(wall / batches * 1000.0, 1),
    }
    if backend == "thread":
        cell["cpu_s_per_batch"] = round(cpu / batches, 3)
    else:
        cell["parent_cpu_s_per_batch"] = round(cpu / batches, 3)
    return cell


def measure_gil_stalls(ds, batch: int, batches: int) -> dict:
    """Fraction of wall time the GIL was held unpreemptibly (stalls of a
    probe thread longer than 4x the switch interval; module docstring)."""
    switch = sys.getswitchinterval()
    threshold = 4.0 * switch
    stalls = []
    stop = threading.Event()

    def probe():
        last = time.monotonic()
        while not stop.is_set():
            now = time.monotonic()
            gap = now - last
            if gap > threshold:
                stalls.append(gap)
            last = now

    gen = make_gen(ds, batch, "thread", workers=1)
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    for _ in range(batches):
        next(gen)
    stop.set()
    t.join()
    gen.close()
    held = sum(stalls)
    # normalized against the NO-probe cpu_s_per_batch in main(): on one
    # core the probe itself stretches this window's wall clock, but the
    # absolute held-GIL seconds per batch are scheduling-invariant
    return {
        "gil_held_s_per_batch": round(held / batches, 3),
        "gil_stall_count": len(stalls),
        "gil_stall_max_ms": round(max(stalls) * 1000.0, 1) if stalls else 0.0,
        "switch_interval_ms": round(switch * 1000.0, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "loader_backend_ab.csv"))
    args = ap.parse_args()

    ds = SyntheticFundus(n=16, size=args.size + 32,
                         transform=train_transforms(args.size, wire="u8"))

    cells = []
    for backend in ("thread", "process"):
        for workers in (1, 2):
            cell = measure_cell(ds, args.batch, backend, workers, args.batches)
            print(f"# {cell}", file=sys.stderr, flush=True)
            cells.append(cell)

    gil = measure_gil_stalls(ds, args.batch, args.batches)
    print(f"# {gil}", file=sys.stderr, flush=True)

    with open(args.out, "w", newline="") as f:
        fields = sorted({k for c in cells for k in c}, key=lambda k: k != "backend")
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(cells)

    thread1 = next(c for c in cells if c["backend"] == "thread" and c["workers"] == 1)
    proc1 = next(c for c in cells if c["backend"] == "process" and c["workers"] == 1)
    frac = min(1.0, gil["gil_held_s_per_batch"] / max(thread1["cpu_s_per_batch"], 1e-6))
    result = {
        "host_cores": os.cpu_count(),
        "cells": cells,
        **gil,
        "gil_stall_frac": round(frac, 3),
        # ceilings implied by the measurements (batches/s with many cores).
        # thread ceiling: only UNPREEMPTIBLE holds are measurable on one
        # core (docstring); zero stalls bounds those at ~0 but leaves
        # preemptible GIL-held bytecode unbounded — hence null, not inf.
        "thread_ceiling_batch_s": (
            round(1.0 / gil["gil_held_s_per_batch"], 2)
            if gil["gil_held_s_per_batch"] > 1e-3 else None),
        "process_ceiling_batch_s": round(1.0 / max(proc1["parent_cpu_s_per_batch"], 1e-6), 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
