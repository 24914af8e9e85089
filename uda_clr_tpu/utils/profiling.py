"""Profiling hooks — the reference only wall-clocks epochs
(Trainer_prototype_full.py:247,602-624); here we expose the JAX/XLA
profiler (TensorBoard-viewable traces of device compute, HBM usage, and
collective timing) plus a context-manager epoch timer."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture an XLA profiler trace: ``with trace(run_dir): step(...)``."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class EpochTimer:
    def __init__(self):
        self.history: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.time()
        yield
        self.history.append(time.time() - t0)

    @property
    def last(self) -> float:
        return self.history[-1] if self.history else 0.0
