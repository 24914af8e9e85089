"""Shared bench scaffolding (utils/benchmarking.py) contract tests.

The five throughput entry points (bench.py + tools/bench_*) all measure
through this one module; these tests pin its call-count/ordering contract
so a methodology regression shows up here, not as silently drifted
numbers in the tools.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.utils.benchmarking import (
    cost_mfu, oom_message, staged_train_batch, timed_windows,
)


def test_timed_windows_call_count_and_stats():
    calls = []

    def step_once(carry):
        calls.append(carry)
        return carry + 1, jnp.float32(carry)

    carry, stats = timed_windows(step_once, 0, windows=3, iters=4, warmup=2)
    # 1 compile call + 2 warmup + 3 windows x 4 iters
    assert len(calls) == 1 + 2 + 3 * 4
    assert carry == len(calls)
    assert len(stats["window_ms"]) == 3
    assert stats["window_ms"] == sorted(stats["window_ms"])
    assert stats["median_ms"] == float(np.median(stats["window_ms"]))
    assert stats["compile_s"] >= 0.0


def test_timed_windows_fetches_barrier():
    """The barrier must be convertible to float — a non-scalar return is a
    caller bug and should fail loudly, not time garbage."""
    with pytest.raises(TypeError):
        timed_windows(lambda c: (c, jnp.zeros((2, 2))), None, windows=1, iters=1)


def test_staged_train_batch_contract():
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh

    sh = batch_sharding(get_mesh((1,)))
    data = staged_train_batch(4, 32, sh)
    assert set(data) == {"image_s", "map_s", "boundary_s", "image_t"}
    assert data["image_s"].shape == (4, 32, 32, 3)
    assert data["map_s"].shape == (4, 32, 32, 2)
    assert data["boundary_s"].shape == (4, 32, 32, 1)
    for v in data.values():
        assert v.dtype == jnp.float32
    binary = np.asarray(data["map_s"])
    assert set(np.unique(binary)) <= {0.0, 1.0}


def test_staged_train_batch_u8_wire_decodes():
    """wire='u8' must stage uint8 wire-format arrays whose in-graph decode
    is valid (so UDA_BENCH_WIRE=u8 times the decode-inclusive executable
    rather than an f32-compiled baseline)."""
    from uda_clr_tpu.data.wire import decode_batch
    from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh

    sh = batch_sharding(get_mesh((1,)))
    data = staged_train_batch(4, 32, sh, wire="u8")
    assert set(data) == {"image_s", "map_s", "boundary_s", "image_t"}
    for v in data.values():
        assert v.dtype == jnp.uint8
    dec = jax.jit(decode_batch)(data)
    img = np.asarray(dec["image_s"])
    assert img.dtype == np.float32 and img.min() >= -1.0 and img.max() <= 1.0
    assert set(np.unique(np.asarray(dec["map_s"]))) <= {0.0, 1.0}
    bnd = np.asarray(dec["boundary_s"])
    assert bnd.min() >= 0.0 and bnd.max() <= 1.0


def test_cost_mfu_never_raises():
    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((64, 64), jnp.float32)
    float(jnp.sum(f(x)))
    mfu, tflops = cost_mfu(lambda: f.lower(x), median_ms=1.0)
    # CPU backends may or may not expose cost analysis / a known peak;
    # the contract is: no exception, and tflops is positive when present
    assert mfu is None or mfu > 0
    assert tflops is None or tflops > 0


def test_oom_message_trims_xla_preamble():
    e = RuntimeError("x" * 500 + "RESOURCE EXHAUSTED: Ran out of memory in HBM"
                     + "y" * 500)
    msg = oom_message(e)
    assert msg.startswith("Ran out of memory")
    assert len(msg) <= 160
    # messages without the marker pass through (truncated)
    assert oom_message(RuntimeError("boom")) == "boom"
