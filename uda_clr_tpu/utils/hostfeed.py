"""Host-fed throughput measurement helpers.

One implementation of the host->device feeding methodology shared by
``bench.py`` (the driver benchmark's ``host_fed`` block) and
``tools/bench_e2e.py`` (the worker-scaling breakdown), so the two tools'
"same-session measured delta" claims stay comparable by construction.

The pattern being measured is the production feeding story — the
reference's DataLoader(num_workers=6) + per-iteration ``.cuda()`` copies
(train_use_fix_initial.py:170-177, Trainer_prototype_full.py:273-285)
re-expressed as: threaded ``BatchLoader`` (full train augmentation stack)
-> per-batch ``jax.device_put`` -> the fused jitted step, overlapped like
``Trainer.train_epoch``.

All barriers here are data-dependent host fetches: on this environment's
tunneled TPU relay ``block_until_ready`` returns before device execution
completes (CLAUDE.md), so fetching a scalar that depends on the work is
the only sound way to stop a clock.
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp


def h2d_probe(host_batch: dict, sh, loads: int = 6) -> tuple[float, int]:
    """Pure H2D cost of one step batch: average ms to ``device_put`` every
    array in ``host_batch`` with sharding ``sh``, and the total byte size.

    Measure this BEFORE any loader threads exist — on a single-core host,
    prefetch workers competing for the core inflate the number.
    """
    nbytes = sum(v.nbytes for v in host_batch.values())

    def _load_once():
        d = {k: jax.device_put(v, sh) for k, v in host_batch.items()}
        # fetch barrier depending on EVERY transferred array (relay-safe)
        float(sum(jnp.sum(v[0, 0, 0]) for v in d.values()))

    # one untimed load first: the barrier's eager sum programs trace+compile
    # on the first pass (once per dtype), and on the tunneled relay that
    # one-time dispatch cost would otherwise land inside the timed window
    _load_once()
    t0 = time.time()
    for _ in range(loads):
        _load_once()
    return (time.time() - t0) / loads * 1000.0, nbytes


def paired_batches(ds_s, ds_t, batch: int, workers: int,
                   prefetch: int = 2, epochs: int = 10**6,
                   backend: str = "thread") -> Iterator[tuple]:
    """(source, target) HOST batches from two fresh loaders, epoch after
    epoch — the ``Trainer.train_epoch`` feeding pattern. Fresh
    ``BatchLoader``s per call: each ``epoch()`` spins its own workers, so
    abandoned iterators are safe. ``backend`` selects thread or forked
    process workers (data/pipeline.py)."""
    from uda_clr_tpu.data.pipeline import BatchLoader

    loader_s = BatchLoader(ds_s, batch_size=batch, num_workers=workers,
                           prefetch=prefetch, backend=backend)
    loader_t = BatchLoader(ds_t, batch_size=batch, num_workers=workers,
                           prefetch=prefetch, backend=backend)
    if len(loader_s) == 0 or len(loader_t) == 0:
        raise ValueError(
            f"paired_batches: a dataset yields zero batches per epoch "
            f"(len={len(ds_s)}/{len(ds_t)} < batch_size={batch}) — the "
            f"stream would spin through empty epochs, one worker thread "
            f"each, and then StopIteration with no diagnostic"
        )
    for ep in range(epochs):
        for bs, bt in zip(loader_s.epoch(ep), loader_t.epoch(ep + 1000)):
            yield bs, bt


def device_batch(bs: dict, bt: dict, sh) -> dict:
    """Stage one (source, target) host batch pair as the train step's input
    dict, each array device_put with sharding ``sh``."""
    return {
        "image_s": jax.device_put(bs["image"], sh),
        "map_s": jax.device_put(bs["map"], sh),
        "boundary_s": jax.device_put(bs["boundary"], sh),
        "image_t": jax.device_put(bt["image"], sh),
    }


def host_fed_window(step, state, gen, sh, steps: int,
                    lr_gen: float = 1e-3, lr_dis: float = 2.5e-5,
                    epoch: int = 30):
    """Warm up (thread spinup + first prefetch fill), then time ``steps``
    host-fed train steps end-to-end. Returns (ms_per_step, final state)."""
    bs, bt = next(gen)
    state, metrics = step(state, device_batch(bs, bt, sh), lr_gen, lr_dis, epoch)
    float(metrics["loss_all"])
    t0 = time.time()
    for _ in range(steps):
        bs, bt = next(gen)
        state, metrics = step(state, device_batch(bs, bt, sh), lr_gen, lr_dis, epoch)
    float(metrics["loss_all"])
    return (time.time() - t0) / steps * 1000.0, state


def pure_load_ms(gen, steps: int, drain: int | None = None,
                 workers: int = 1, prefetch: int = 2) -> float:
    """Host-side loader throughput alone (augmentation + collation, no
    device work): average ms per pulled batch pair.

    ``drain`` untimed pulls come first: callers reuse the generator from a
    preceding ``host_fed_window``, whose device-bound phase left each
    loader's prefetch queue full (``prefetch`` batches + one completed
    batch blocked on the queue put per worker) — those batches return
    instantly and would deflate the steady-state number by up to ~25%.
    When ``drain`` is None it is sized from that model
    (``prefetch + workers + 1``), so higher worker counts drain their
    correspondingly deeper ready backlog; pass the loader's ``workers`` /
    ``prefetch`` alongside."""
    if drain is None:
        drain = prefetch + workers + 1
    for _ in range(drain):
        next(gen)
    t0 = time.time()
    for _ in range(steps):
        next(gen)
    return (time.time() - t0) / steps * 1000.0
