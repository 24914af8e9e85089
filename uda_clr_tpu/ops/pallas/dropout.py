"""Pallas TPU fused dropout: on-chip PRNG + mask + scale in ONE pass.

STATUS: opt-in only (`models.layers.set_dropout_impl('pallas')`), NOT the
default. The A/B on the flagship bench (512x512, B8, T=8 MC, bf16, real
v5e) measured the kernel a net LOSS: 159.9 ms/step vs 151.4 ms with
XLA's bernoulli. Hypothesis held before measuring: XLA materializes 4
random bytes/element through HBM. What the hardware showed: XLA fuses
the RngBitGenerator + compare + select into the producer/consumer
fusions, so the random bits never round-trip HBM — while this custom
call is a fusion BARRIER that forces a separate HBM read of x and write
of the output. Kept for shapes/hardware where the tradeoff flips; the
kernel itself is correct (structural tests in interpret mode, statistics
on real TPU).

This kernel generates the random bits in VMEM with the hardware PRNG
(`pltpu.prng_random_bits`) and applies mask+scale in the same pass, so
HBM sees exactly one read of x and one write of the output.

The backward pass regenerates the identical bits from the saved integer
seed (same grid, same per-block seeding) instead of storing the mask —
dropout's VJP is the same masked scale applied to the cotangent.

Numerics: keep probability is quantized to 2^-32 (bits < floor(keep *
2^32) on uint32), the same granularity XLA's threefry-based bernoulli
uses; masked elements are scaled by 1/keep in the input dtype, matching
torch/flax dropout semantics. The random STREAM differs from flax's
threefry (dropout draws are i.i.d. either way; reference parity never
depends on a specific mask realization — parity tests run dropout-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block sizes tried in order; block = (bm, C) of the [M, C] flattened
# view, further capped by the VMEM budget below.
_BLOCK_ROWS = (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)

# Mosaic's default scoped-VMEM limit is 16 MB; the kernel's working set is
# in-block + out-block, each double-buffered (4 buffers), with the lane
# dimension padded to a multiple of 128. Budget well under the limit so
# the random-bits buffer and spills fit too (a 24 MB block at C=305
# OOMed scoped vmem on real v5e hardware at the flagship shapes).
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _pick_block_rows(m: int, c: int, itemsize: int) -> int | None:
    c_padded = -(-c // 128) * 128
    for bm in _BLOCK_ROWS:
        if m % bm == 0 and 4 * bm * c_padded * itemsize <= _VMEM_BUDGET_BYTES:
            return bm
    return None


def dropout_supported(shape, itemsize: int = 4) -> bool:
    """The kernel handles any [..., C] whose leading-axes product divides
    into an aligned row block that fits the VMEM budget (always true for
    the framework's NHWC activation shapes)."""
    m = 1
    for d in shape[:-1]:
        m *= d
    return _pick_block_rows(m, shape[-1], itemsize) is not None


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float):
    i = pl.program_id(0)
    # distinct stream per row-block; int32 wrap-around is fine (seeding
    # only needs to decorrelate blocks)
    pltpu.prng_seed(seed_ref[0, 0] + i * jnp.int32(-1640531527))  # 0x9E3779B9
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits < jnp.uint32(threshold)
    x = x_ref[:]
    o_ref[:] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype), 0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def _apply(x: jnp.ndarray, seed: jnp.ndarray, rate: float, interpret: bool = False):
    keep = 1.0 - rate
    threshold = min(int(keep * 2.0**32), 2**32 - 1)
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    m = flat.shape[0]
    bm = _pick_block_rows(m, c, x.dtype.itemsize)
    assert bm is not None, f"unsupported dropout shape {x.shape}"
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, threshold=threshold, inv_keep=1.0 / keep),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        # NOTE: the CPU interpreter stubs prng_random_bits to zeros (every
        # element kept) — interpret mode only validates structure/plumbing;
        # mask statistics are asserted on real TPU (tests/test_pallas_dropout.py)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed.reshape(1, 1), flat)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dropout_pallas(x, seed, rate: float, interpret: bool = False):
    """Fused dropout; ``seed`` is an int32 scalar array (see
    ``seed_from_key``), ``rate`` the drop probability (static)."""
    return _apply(x, seed, rate, interpret)


def _fwd(x, seed, rate, interpret):
    return _apply(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seed + same grid -> identical bits -> exact dropout VJP
    return _apply(g, seed, rate, interpret), None


dropout_pallas.defvjp(_fwd, _bwd)


def seed_from_key(key) -> jnp.ndarray:
    """Fold a JAX PRNG key (threefry or rbg) into one int32 seed."""
    kd = jax.random.key_data(key).reshape(-1)
    folded = kd[0] ^ kd[-1]
    return jax.lax.bitcast_convert_type(folded, jnp.int32)
