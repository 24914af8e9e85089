#!/usr/bin/env python
"""Host input-pipeline throughput at production shape (VERDICT r1 item 8).

Measures BatchLoader images/sec with the FULL 512x512 train augmentation
stack (RandomScaleCrop + flip/rotate + elastic + salt-pepper + light +
eraser + GetBoundary + normalize, data/transforms.py) over synthetic
fundus images, with the native C++ hot path (native/fundus_aug.cpp) on
and off. The flagship device step consumes batch-8 every ~148 ms
(~54 img/s/chip); the host must sustain more than that per chip to keep
the TPU fed.

Usage: python tools/bench_pipeline.py [--n 64] [--size 512] [--workers 2|6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(native: bool, n: int, size: int, workers: int, batch: int) -> float:
    from uda_clr_tpu.data import BatchLoader, SyntheticFundus, train_transforms
    from uda_clr_tpu.data import native as native_lib

    native_lib.set_enabled(native)
    ds = SyntheticFundus(n=n, size=size + 32, transform=train_transforms(size))
    loader = BatchLoader(ds, batch_size=batch, num_workers=workers, prefetch=2)
    # warmup one batch (thread pool spinup, PIL decode caches)
    it = loader.epoch(0)
    next(it)
    t0 = time.time()
    count = 1
    for _ in it:
        count += 1
    dt = time.time() - t0
    imgs = (count - 1) * batch
    return imgs / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    for native in (True, False):
        ips = run(native, args.n, args.size, args.workers, args.batch)
        print(f"native={native}: {ips:.1f} img/s "
              f"({args.workers} workers, {args.size}x{args.size})", flush=True)


if __name__ == "__main__":
    main()
