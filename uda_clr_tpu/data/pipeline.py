"""Batched, prefetching host->device input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=6,
pin_memory=True)`` (train_use_fix_initial.py:170-177) with a
thread-prefetched numpy batcher: worker threads run the (GIL-releasing
PIL/scipy) transform pipeline and a background thread keeps a bounded queue
of ready batches so the TPU step never waits on augmentation. Device
placement happens in the trainer via ``jax.device_put`` with the mesh
sharding, so batches land already sharded across chips.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_BATCH_KEYS = ("image", "map", "boundary")


def collate(samples) -> dict:
    batch = {}
    for k in _BATCH_KEYS:
        arr = np.stack([s[k] for s in samples])
        # uint8 wire-format batches (data/wire.py) cross host->device as-is
        # (4x fewer bytes); everything else keeps the fp32 contract
        batch[k] = arr if arr.dtype == np.uint8 else arr.astype(np.float32)
    batch["img_name"] = [s["img_name"] for s in samples]
    return batch


class BatchLoader:
    """Iterates shuffled (or sequential) batches forever or per-epoch.

    ``drop_last=True`` keeps shapes static for jit (pad-free); eval uses
    ``drop_last=False`` with a final partial batch handled host-side.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 2,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> list[list[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(n)
        batches = []
        for i in range(0, n - (n % self.batch_size if self.drop_last else 0), self.batch_size):
            idx = order[i : i + self.batch_size]
            if len(idx) == 0 or (self.drop_last and len(idx) < self.batch_size):
                break
            batches.append(list(idx))
        return batches

    def epoch(self, epoch: int | None = None, start: int = 0):
        """Yield one epoch of batches with background prefetch.

        ``start`` skips the first ``start`` batches without paying their
        augmentation cost; the remaining batches keep their absolute batch
        index ``bi`` (which seeds the per-sample augmentation rngs), so a
        stream entered mid-epoch is sample-exact with the full epoch.
        """
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        batches = self._epoch_indices(epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # stop-aware put: a consumer that abandons the generator mid-epoch
            # sets `stop` while this thread may be parked on a full queue — a
            # blind q.put would then block forever, leaking the thread and
            # its queued batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for bi in range(start, len(batches)):
                        if stop.is_set():
                            return
                        idx = batches[bi]
                        rngs = [
                            np.random.default_rng((self.seed, epoch, bi, j))
                            for j in range(len(idx))
                        ]
                        samples = list(pool.map(lambda a: self.dataset.get(*a), zip(idx, rngs)))
                        if not _put(collate(samples)):
                            return
                _put(None)
            except BaseException as e:
                # surface dataset/transform failures to the consumer instead
                # of dying silently (which would hang q.get() forever); torch
                # DataLoader propagates worker exceptions the same way
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise RuntimeError(f"BatchLoader worker failed: {item!r}") from item
                yield item
        finally:
            stop.set()

    def forever(self, start_batch: int = 0):
        """Endless batch stream (target-domain loader cycling,
        Trainer_prototype_full.py:279-283).

        ``start_batch`` fast-forwards the stream to the given global batch
        index (= batches already consumed) without doing the skipped
        batches' augmentation work, so a resumed run's target stream lines
        up exactly with the uninterrupted run's. Positions are only
        comparable while the dataset length is unchanged between runs.
        """
        n = len(self)
        if n == 0:
            raise ValueError(
                f"BatchLoader.forever(): dataset yields zero batches per epoch "
                f"(len(dataset)={len(self.dataset)} < batch_size="
                f"{self.batch_size} with drop_last={self.drop_last}) — an "
                f"endless stream would busy-spin without ever yielding"
            )
        epoch, off = divmod(start_batch, n)
        while True:
            yield from self.epoch(epoch, start=off)
            off = 0
            epoch += 1
