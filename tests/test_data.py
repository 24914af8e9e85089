"""Data pipeline tests: label encoding contract, boundary target,
transform pipeline output shapes, loader batching."""

import numpy as np
from PIL import Image

from uda_clr_tpu.data.pipeline import BatchLoader
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data.transforms import (
    Normalize_tf,
    eval_transforms,
    to_multilabel,
    train_transforms,
)


def test_to_multilabel_encoding():
    pre = np.array([[0, 1], [2, 0]])
    m = to_multilabel(pre)
    # class1 (disc rim) -> [0,1]; class2 (cup) -> [1,1]; class0 -> [0,0]
    np.testing.assert_array_equal(m[0, 0], [0, 0])
    np.testing.assert_array_equal(m[0, 1], [0, 1])
    np.testing.assert_array_equal(m[1, 0], [1, 1])


def test_normalize_tf_contract():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    label = np.full((64, 64), 255, dtype=np.uint8)
    label[20:44, 20:44] = 128  # disc
    label[28:36, 28:36] = 0  # cup
    s = Normalize_tf()(
        {"image": Image.fromarray(img), "label": Image.fromarray(label, "L"), "img_name": "x"}
    )
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
    np.testing.assert_allclose(s["image"], img.astype(np.float32) / 127.5 - 1.0, atol=1e-6)
    assert s["map"].shape == (64, 64, 2)
    # cup region sets both channels; disc ring sets only disc
    assert s["map"][32, 32, 0] == 1 and s["map"][32, 32, 1] == 1
    assert s["map"][22, 22, 0] == 0 and s["map"][22, 22, 1] == 1
    assert s["map"][0, 0, 0] == 0 and s["map"][0, 0, 1] == 0
    assert s["boundary"].shape == (64, 64, 1)
    assert s["boundary"].max() <= 1.0 and s["boundary"].min() >= 0.0
    assert s["boundary"].max() > 0.1  # the ring exists


def test_train_pipeline_shapes_and_determinism():
    ds = SyntheticFundus(n=2, size=600, transform=train_transforms(512))
    a = ds.get(0, np.random.default_rng(42))
    b = ds.get(0, np.random.default_rng(42))
    c = ds.get(0, np.random.default_rng(43))
    assert a["image"].shape == (512, 512, 3)
    assert a["map"].shape == (512, 512, 2)
    assert a["boundary"].shape == (512, 512, 1)
    np.testing.assert_array_equal(a["image"], b["image"])
    assert not np.array_equal(a["image"], c["image"])  # different seed differs


def test_eval_pipeline_and_loader():
    ds = SyntheticFundus(n=5, size=540, transform=eval_transforms(512))
    loader = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False, num_workers=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 512, 512, 3)
    assert batches[-1]["image"].shape == (1, 512, 512, 3)
    assert batches[0]["image"].dtype == np.float32


def test_loader_drop_last_static_shapes():
    ds = SyntheticFundus(n=5, size=540, transform=eval_transforms(512))
    loader = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=1, seed=7)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert all(b["image"].shape[0] == 2 for b in batches)
    # different epochs shuffle differently
    b2 = list(loader.epoch(1))
    assert not np.array_equal(batches[0]["image"], b2[0]["image"])


def test_forever_fast_forward_is_position_exact():
    """forever(start_batch=k) must reproduce the uninterrupted stream from
    position k exactly — same batch composition AND the same per-sample
    augmentation seeds (bi keeps its absolute index), across epoch
    boundaries of the cycling stream."""
    ds = SyntheticFundus(n=5, size=540, transform=train_transforms(512))
    mk = lambda: BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                             num_workers=1, seed=3)
    full = mk().forever()
    want = [next(full) for _ in range(7)]  # 2 batches/epoch -> 3+ epochs
    for k in (1, 2, 3, 5):  # mid-epoch, boundary, and later-epoch positions
        ff = mk().forever(start_batch=k)
        got = next(ff)
        np.testing.assert_array_equal(got["image"], want[k]["image"])
        np.testing.assert_array_equal(got["map"], want[k]["map"])
        got2 = next(ff)  # stream continues correctly past the entry point
        np.testing.assert_array_equal(got2["image"], want[k + 1]["image"])


def test_process_backend_matches_thread_backend():
    """The fork-process worker pool must produce the bit-identical batch
    stream as the thread pool (same (seed, epoch, bi, j) per-sample rng
    contract), including across the forever() fast-forward path."""
    ds = SyntheticFundus(n=5, size=96, transform=train_transforms(64))
    mk = lambda backend: BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                                     num_workers=2, backend=backend)
    thread_gen = mk("thread").forever()
    want = [next(thread_gen) for _ in range(5)]
    got_gen = mk("process").forever()
    for k in range(5):
        got = next(got_gen)
        np.testing.assert_array_equal(got["image"], want[k]["image"])
        np.testing.assert_array_equal(got["map"], want[k]["map"])
        np.testing.assert_array_equal(got["boundary"], want[k]["boundary"])
        assert got["img_name"] == want[k]["img_name"]
    # fast-forward entry is position-exact on the process backend too
    ff = mk("process").forever(start_batch=3)
    np.testing.assert_array_equal(next(ff)["image"], want[3]["image"])


def test_process_backend_propagates_worker_exception():
    """A worker-process failure must surface in the consumer (pickled back
    through the pool), not hang or kill the run silently."""
    import pytest

    class Broken:
        def __len__(self):
            return 4

        def get(self, index, rng):
            raise OSError(f"corrupt sample {index}")

    loader = BatchLoader(Broken(), batch_size=2, shuffle=False, num_workers=2,
                         backend="process")
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader.epoch(0))


def test_process_sharded_loading_partitions_global_stream():
    """Multi-process DP loading (parallel/distributed.py): each process's
    slice of every batch must concatenate to the single-process global
    batch bit-exactly — same composition AND same per-sample augmentation
    (global (seed, epoch, bi, global_j) rng keys)."""
    import pytest

    ds = SyntheticFundus(n=8, size=96, transform=train_transforms(64))
    full = next(BatchLoader(ds, 4, shuffle=True, seed=5, num_workers=1).epoch(0))
    parts = [
        next(BatchLoader(ds, 4, shuffle=True, seed=5, num_workers=1,
                         process_index=i, process_count=2).epoch(0))
        for i in (0, 1)
    ]
    assert parts[0]["image"].shape[0] == 2
    for k in ("image", "map", "boundary"):
        np.testing.assert_array_equal(
            np.concatenate([p[k] for p in parts]), full[k])
    assert parts[0]["img_name"] + parts[1]["img_name"] == full["img_name"]

    with pytest.raises(ValueError, match="divide evenly"):
        BatchLoader(ds, 5, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(ds, 4, drop_last=False, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="out of range"):
        BatchLoader(ds, 4, process_index=2, process_count=2)


def test_loader_rejects_unknown_backend():
    import pytest

    ds = SyntheticFundus(n=2, size=96, transform=eval_transforms(64))
    with pytest.raises(ValueError, match="backend"):
        BatchLoader(ds, batch_size=2, backend="greenlet")


def test_loader_propagates_worker_exception():
    """A failing dataset.get (corrupt file, transform bug) must surface in
    the consumer as an exception, not hang q.get() forever."""
    import pytest

    class Broken:
        def __len__(self):
            return 4

        def get(self, index, rng):
            raise OSError(f"corrupt sample {index}")

    loader = BatchLoader(Broken(), batch_size=2, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader.epoch(0))


def test_forever_rejects_zero_batch_dataset():
    """Dataset smaller than the batch size with drop_last: forever() would
    busy-spin yielding nothing — must fail fast instead."""
    import pytest

    ds = SyntheticFundus(n=2, size=540, transform=eval_transforms(512))
    loader = BatchLoader(ds, batch_size=8, drop_last=True, num_workers=1)
    with pytest.raises(ValueError, match="zero batches"):
        next(loader.forever())


def test_abandoned_epoch_does_not_leak_producer():
    """Breaking out of an epoch mid-stream must unblock a producer parked
    on the full prefetch queue (stop-aware put)."""
    import threading
    import time

    ds = SyntheticFundus(n=8, size=540, transform=eval_transforms(512))
    loader = BatchLoader(ds, batch_size=1, shuffle=False, num_workers=1, prefetch=1)
    before = threading.active_count()
    gen = loader.epoch(0)
    next(gen)  # producer now works ahead and parks on the bounded queue
    gen.close()  # abandon: fires the finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread still alive"
