"""Pallas TPU kernel for batch-norm moment accumulation.

The framework's hottest non-conv op (xplane-profiled): the per-channel
(sum, sum-of-squares) reduction over [N, H, W, C] activations feeding
every DomainNorm2d in train mode. XLA's convert-reduce fusion runs these
at ~60-125 GB/s on v5e; this kernel streams row-blocks HBM->VMEM and
accumulates in fp32 VMEM across the (sequential) grid, targeting HBM
bandwidth.

Layout note: ``pallas_call`` pins the operand to the default row-major
layout — XLA may insert one copy if the producer chose an exotic layout;
measured end-to-end before enabling anywhere (see
uda_clr_tpu/models/norm.py:set_moments_impl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments_kernel(x_ref, sum_ref, sumsq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    xb = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(xb, axis=0, keepdims=True)
    sumsq_ref[:] += jnp.sum(xb * xb, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def channel_sums(x: jnp.ndarray, block_rows: int = 1024):
    """(sum[C], sumsq[C]) in fp32 over all leading axes of [..., C]."""
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    m = flat.shape[0]
    bm = min(block_rows, m)
    # pad rows to a multiple of the block (zero rows contribute nothing)
    pad = (-m) % bm
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    grid = flat.shape[0] // bm
    s, sq = pl.pallas_call(
        _moments_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
    )(flat)
    return s[0], sq[0]


def batch_moments_pallas(x: jnp.ndarray):
    """Mean and biased variance over all axes except the trailing channel,
    drop-in for the XLA path in models/norm.py."""
    n = 1
    for a in x.shape[:-1]:
        n *= a
    s, sq = channel_sums(x)
    mean = s / n
    var = jnp.maximum(sq / n - jnp.square(mean), 0.0)  # cancellation guard
    return mean, var, n
