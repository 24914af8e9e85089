"""Pallas TPU fused mask-head epilogue for the no-grad MC-dropout pass.

The decoder's mask head is BN(305) + ReLU + Dropout(0.1) + 1x1 conv ->
2 channels (models/decoder.py, reference networks/decoder.py:23-32), and
its 305-channel input is ``concat(x_bu_feature[304], boundary[1])``. At
the MC fast path's flagship shapes ([T*B=64, 128, 128, .]) XLA lowers
this chain to: a concat materialization, an RngBitGenerator writing 4
random bytes/element, a BN+relu+dropout fusion stuck in a W-minor layout,
a full-tensor layout copy to C-minor, and the 1x1 conv — ~10 ms/step of
almost pure HBM traffic for a [.,2]-channel result (trace anatomy in
PARITY.md).

This kernel computes the whole epilogue in ONE streaming pass: each
[bm, 304] x_bu block and [bm, 1] boundary block is read once; the BN
apply (exactly models/norm.py:_normalize's bf16 arithmetic), ReLU,
dropout (hardware PRNG in VMEM, same 2^-32 keep quantization as
ops/pallas/dropout.py) and the [304+1, 2] matmul all happen on-chip; HBM
sees one read of each input and one [bm, 2] write. The 305-channel
concat NEVER materializes.

Scope: the MC rectification pass only (Trainer_prototype_full.py:358-368
— torch.no_grad there), so no VJP is needed or defined; the call sits
under stop_gradient in train/steps.py. The dropout STREAM differs from
flax's threefry masks — the same class of deviation as the documented
flat-T*B MC batch (steps.py): MC dropout samples are i.i.d. either way.

Unlike ops/pallas/dropout.py (retired to opt-in after losing its A/B),
this kernel replaces a chain XLA demonstrably does NOT fuse well — the
measured A/B on the flagship bench is recorded in PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uda_clr_tpu.ops.pallas.dropout import seed_from_key

_GOLDEN = -1640531527  # 0x9E3779B9 as int32, per-block stream decorrelation
_BLOCK_ROWS = (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
# in-blocks (x 2 for double buffering) + random bits + f32 temps; the
# lane dim pads 304 -> 384. 2048 rows: ~1.5 MB bf16 in x2, 3 MB u32 bits,
# ~3 MB f32 temps -> comfortably inside the 16 MB scoped-vmem limit.
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _pick_block_rows(m: int, itemsize: int = 2) -> int | None:
    for bm in _BLOCK_ROWS:
        if m % bm == 0 and 4 * bm * 384 * itemsize <= _VMEM_BUDGET_BYTES:
            return bm
    return None


def mask_head_supported(shape, itemsize: int = 2) -> bool:
    m = 1
    for d in shape[:-1]:
        m *= d
    return _pick_block_rows(m, itemsize) is not None


def _kernel(seed_ref, xbu_ref, bnd_ref, mu_ref, a_ref, beta_ref, w_ref,
            wtail_ref, o_ref, *, threshold: int, inv_keep: float):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + i * jnp.int32(_GOLDEN))

    # BN apply in the input dtype, exactly like models/norm.py:_normalize:
    # (x - mu) * (rsqrt(var+eps)*scale) + beta, all in bf16/f32.
    x = xbu_ref[:]  # [bm, 304]
    dt = x.dtype
    h = (x - mu_ref[0:1, :304].astype(dt)) * a_ref[0:1, :304].astype(dt) \
        + beta_ref[0:1, :304].astype(dt)
    h = jnp.maximum(h, jnp.zeros((), dt))
    bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
    h = jnp.where(bits < jnp.uint32(threshold), h * jnp.asarray(inv_keep, dt), 0)

    acc = jnp.dot(h, w_ref[:, :2].astype(dt), preferred_element_type=jnp.float32)

    b = bnd_ref[:]  # [bm, 1]
    hb = (b - mu_ref[0:1, 304:305].astype(dt)) * a_ref[0:1, 304:305].astype(dt) \
        + beta_ref[0:1, 304:305].astype(dt)
    hb = jnp.maximum(hb, jnp.zeros((), dt))
    bits_b = pltpu.bitcast(pltpu.prng_random_bits((b.shape[0], 128)), jnp.uint32)
    hb = jnp.where(bits_b[:, :1] < jnp.uint32(threshold),
                   hb * jnp.asarray(inv_keep, dt), 0)
    # wtail row 0 = W[304], row 1 = conv bias
    acc = acc + hb.astype(jnp.float32) * wtail_ref[0:1, :2].astype(jnp.float32)
    acc = acc + wtail_ref[1:2, :2].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "eps", "interpret"))
def _fused(x_bu, boundary, mean, var, scale, bias, w, w_bias,
           rate: float, eps: float, interpret: bool = False, *, seed):
    n, H, W, C = x_bu.shape
    m = n * H * W
    bm = _pick_block_rows(m, jnp.dtype(x_bu.dtype).itemsize)
    assert bm is not None, f"unsupported mask-head shape {x_bu.shape}"
    keep = 1.0 - rate
    threshold = min(int(keep * 2.0**32), 2**32 - 1)

    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(jnp.float32)[None, :]  # [1,305]
    mu = mean.astype(jnp.float32)[None, :]
    beta = bias.astype(jnp.float32)[None, :]
    w2 = w.reshape(305, -1).astype(jnp.float32)  # [305, 2]
    wtail = jnp.stack([w2[304], w_bias.astype(jnp.float32)])  # [2, 2]

    flat_x = x_bu.reshape(m, C)
    flat_b = boundary.reshape(m, 1)
    out = pl.pallas_call(
        functools.partial(_kernel, threshold=threshold, inv_keep=1.0 / keep),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 2), x_bu.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed.reshape(1, 1), flat_x, flat_b, mu, a, beta, w2[:304], wtail)
    return out.reshape(n, H, W, 2)


def _xla_reference(x_bu, boundary, mean, var, scale, bias, w, w_bias,
                   rate, eps, key):
    """Plain-jnp epilogue (BN apply + relu + bernoulli dropout + 1x1) —
    the CPU fallback AND the oracle the kernel is tested against."""
    x_feature = jnp.concatenate([x_bu, boundary], axis=-1)
    dt = x_feature.dtype
    inv = jax.lax.rsqrt(var + eps)
    h = (x_feature - mean.astype(dt)) * (inv * scale).astype(dt) + bias.astype(dt)
    h = jax.nn.relu(h)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, h.shape)
    h = jnp.where(mask, h / keep, 0).astype(dt)
    out = jax.lax.dot_general(
        h, w.reshape(305, -1).astype(dt),
        (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out + w_bias).astype(dt)


def _kernel_split(seed_ref, x_ref, ll_ref, bnd_ref, mu_ref, a_ref, beta_ref,
                  wx_ref, wll_ref, wtail_ref, o_ref, *, threshold: int,
                  inv_keep: float):
    """Three-part variant: the mask head's 305 input channels arrive as
    x_up[256] + ll[48] + boundary[1] — the concat never exists anywhere."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + i * jnp.int32(_GOLDEN))

    def part(ref, lo, hi):
        x = ref[:]
        dt = x.dtype
        h = (x - mu_ref[0:1, lo:hi].astype(dt)) * a_ref[0:1, lo:hi].astype(dt) \
            + beta_ref[0:1, lo:hi].astype(dt)
        h = jnp.maximum(h, jnp.zeros((), dt))
        n = hi - lo
        shape = (x.shape[0], max(n, 128)) if n < 128 else h.shape
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return jnp.where(bits[:, :n] < jnp.uint32(threshold),
                         h * jnp.asarray(inv_keep, dt), 0)

    hx = part(x_ref, 0, 256)
    acc = jnp.dot(hx, wx_ref[:].astype(hx.dtype), preferred_element_type=jnp.float32)
    hl = part(ll_ref, 256, 304)
    acc = acc + jnp.dot(hl, wll_ref[:, :2].astype(hl.dtype),
                        preferred_element_type=jnp.float32)
    hb = part(bnd_ref, 304, 305)
    acc = acc + hb.astype(jnp.float32) * wtail_ref[0:1, :2].astype(jnp.float32)
    acc = acc + wtail_ref[1:2, :2].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "eps", "interpret"))
def _fused_split(x_up, ll, boundary, mean, var, scale, bias, w, w_bias,
                 rate: float, eps: float, interpret: bool = False, *, seed):
    n, H, W, _ = x_up.shape
    m = n * H * W
    bm = _pick_block_rows(m, jnp.dtype(x_up.dtype).itemsize)
    assert bm is not None, f"unsupported mask-head shape {x_up.shape}"
    keep = 1.0 - rate
    threshold = min(int(keep * 2.0**32), 2**32 - 1)

    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(jnp.float32)[None, :]
    mu = mean.astype(jnp.float32)[None, :]
    beta = bias.astype(jnp.float32)[None, :]
    w2 = w.reshape(305, -1).astype(jnp.float32)
    wtail = jnp.stack([w2[304], w_bias.astype(jnp.float32)])  # [2, 2]

    out = pl.pallas_call(
        functools.partial(_kernel_split, threshold=threshold, inv_keep=1.0 / keep),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 48), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 305), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 2), x_up.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed.reshape(1, 1), x_up.reshape(m, 256), ll.reshape(m, 48),
      boundary.reshape(m, 1), mu, a, beta, w2[:256], w2[256:304], wtail)
    return out.reshape(n, H, W, 2)


def fused_mask_head_split(x_up, ll, boundary, mean, var, scale, bias, w,
                          w_bias, key, rate: float = 0.1, eps: float = 1e-5,
                          impl: str = "auto"):
    """Three-input mask-head epilogue for the hand-scheduled MC boundary
    path (train/steps.py:_mc_suffix): the 305 channels arrive as
    x_up[256] + ll[48] + boundary[1] in the concat's channel order, so the
    [.,304]/[.,305] concats never materialize. Same semantics as
    :func:`fused_mask_head`."""
    use_pallas = impl in ("pallas", "interpret") or (
        impl == "auto" and jax.default_backend() == "tpu" and jax.device_count() == 1
    )
    shapes_ok = (
        mask_head_supported(x_up.shape, jnp.dtype(x_up.dtype).itemsize)
        and x_up.shape[-1] == 256 and ll.shape[-1] == 48
        and w.size == 305 * 2
    )
    if use_pallas and shapes_ok:
        return _fused_split(x_up, ll, boundary, mean, var, scale, bias, w,
                            w_bias, rate, eps, impl == "interpret",
                            seed=seed_from_key(key))
    return _xla_reference(jnp.concatenate([x_up, ll], axis=-1), boundary,
                          mean, var, scale, bias, w, w_bias, rate, eps, key)


def fused_mask_head(x_bu, boundary, mean, var, scale, bias, w, w_bias, key,
                    rate: float = 0.1, eps: float = 1e-5,
                    impl: str = "auto"):
    """Mask-head epilogue: x1 = conv1x1(drop(relu(BN(cat(x_bu, bnd))))).

    ``mean``/``var`` are the 305-channel batch moments of the (virtual)
    concat; ``scale``/``bias`` the BN affine params; ``w``/``w_bias`` the
    1x1 conv kernel [1,1,305,2] (or [305,2]) and bias [2]. ``impl``:
    'auto' = Pallas on TPU, XLA elsewhere; 'xla' / 'pallas' / 'interpret'
    force a backend.
    """
    # auto engages the kernel on single-chip TPU only: pallas_call carries
    # no GSPMD partitioning rule, so under a data-sharded mesh XLA would
    # gather the full batch onto each chip. Multi-chip keeps the XLA path
    # (itself well-fused there) until a shard_map wrapper is warranted.
    use_pallas = impl in ("pallas", "interpret") or (
        impl == "auto" and jax.default_backend() == "tpu" and jax.device_count() == 1
    )
    # the kernel is specialized to the reference's 304+1 -> 2 mask head
    shapes_ok = (
        mask_head_supported(x_bu.shape, jnp.dtype(x_bu.dtype).itemsize)
        and x_bu.shape[-1] == 304
        and w.size == 305 * 2
    )
    if use_pallas and shapes_ok:
        return _fused(x_bu, boundary, mean, var, scale, bias, w, w_bias,
                      rate, eps, impl == "interpret", seed=seed_from_key(key))
    return _xla_reference(x_bu, boundary, mean, var, scale, bias, w, w_bias,
                          rate, eps, key)
