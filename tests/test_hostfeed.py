"""Guards and shared tables behind the benchmark tooling.

These pin the failure modes the round-4 review found: the zero-batch
busy-spin in ``hostfeed.paired_batches`` (same class of bug
``BatchLoader.forever`` already guards), the empty-rows crash in the
longrun CSV writer, and the single-source peak-TFLOPs table.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_paired_batches_zero_batch_fails_fast():
    from uda_clr_tpu.data import SyntheticFundus, train_transforms
    from uda_clr_tpu.utils import hostfeed

    ds = SyntheticFundus(n=4, size=80, transform=train_transforms(48))
    with pytest.raises(ValueError, match="zero batches"):
        next(hostfeed.paired_batches(ds, ds, batch=8, workers=1))


def test_paired_batches_yields_and_closes():
    from uda_clr_tpu.data import SyntheticFundus, train_transforms
    from uda_clr_tpu.utils import hostfeed

    ds = SyntheticFundus(n=4, size=80, transform=train_transforms(48))
    gen = hostfeed.paired_batches(ds, ds, batch=2, workers=1)
    bs, bt = next(gen)
    gen.close()  # must not hang: epoch() workers observe the stop event
    assert bs["image"].shape == (2, 48, 48, 3)
    assert bt["image"].shape == (2, 48, 48, 3)
    assert not np.array_equal(bs["image"], bt["image"])  # independent streams


def test_devinfo_peak_lookup():
    from uda_clr_tpu.utils.devinfo import A100_REFERENCE_IMG_PER_SEC, peak_tflops

    assert peak_tflops("TPU v5 lite") == 197.0
    assert peak_tflops("TPU v6e") == 918.0
    assert peak_tflops("unknown accelerator") is None
    assert A100_REFERENCE_IMG_PER_SEC > 0


def test_write_rows_csv_empty_rows_clear_error(tmp_path):
    from _longrun_common import write_rows_csv

    with pytest.raises(ValueError, match="no rows"):
        write_rows_csv(str(tmp_path / "out.csv"), [])


def test_write_rows_csv_roundtrip(tmp_path):
    import csv

    from _longrun_common import write_rows_csv

    p = str(tmp_path / "out.csv")
    write_rows_csv(p, [{"a": 1, "b": 2.5}, {"a": 3, "b": 4.5}])
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert [r["a"] for r in rows] == ["1", "3"]


def test_pure_load_ms_drains_before_timing():
    """Callers hand pure_load_ms a generator whose prefetch queues were
    filled during a preceding device-bound window; the drain pulls must be
    consumed untimed so instant queue hits can't deflate the number."""
    from uda_clr_tpu.utils import hostfeed

    pulled = []

    def gen():
        i = 0
        while True:
            pulled.append(i)
            yield (None, None)
            i += 1

    hostfeed.pure_load_ms(gen(), steps=3, drain=4)
    assert len(pulled) == 7  # 4 drained + 3 timed


def test_pure_load_ms_drain_scales_with_workers():
    """The ready backlog after a device-bound window is prefetch batches
    plus one blocked batch per worker; the default drain must scale with
    the caller's worker count or high-worker rows under-drain and deflate
    (the exact skew the drain exists to remove)."""
    from uda_clr_tpu.utils import hostfeed

    for workers, prefetch in ((1, 2), (4, 2), (2, 5)):
        pulled = []

        def gen():
            while True:
                pulled.append(0)
                yield (None, None)

        hostfeed.pure_load_ms(gen(), steps=2, workers=workers,
                              prefetch=prefetch)
        assert len(pulled) == (prefetch + workers + 1) + 2
