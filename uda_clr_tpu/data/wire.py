"""uint8 wire format for host->device batches.

The three training tensors are exactly representable in uint8:

* ``image`` — ``Normalize_tf`` maps uint8 pixels to ``u/127.5 - 1``
  (custom_transforms.py:443 in the reference); every transform upstream of
  it (crop/rotate/flip/elastic/salt/light/eraser) produces uint8, so the
  pre-normalization image IS uint8.
* ``map`` — binary {0,1} per channel (``to_multilabel``).
* ``boundary`` — ``gaussian_filter(uint8_ring, sigma=3) / 255`` where
  scipy's uint8-in/uint8-out filtering quantizes the blur to integers
  (custom_transforms.py:458-460), so the target is exactly ``u/255``.

Shipping uint8 over the wire and applying the same scale/offset on device
(through a REAL divide — see ``_decode_one`` for why the naive constant
division is 1 ulp off and why a LUT gather is too slow) is therefore
BIT-EXACT vs the fp32 pipeline (``tests/test_wire.py``) while moving 4x
fewer bytes per step (6 B/pixel vs 24) through collate, the host->device
transfer, and HBM staging — and it skips the host-side fp32 conversion
entirely.
Enable with ``cfg.data.wire = "u8"`` (CLI ``--wire u8``); the jitted
steps decode by dtype, so fp32 batches keep working unchanged.

The reference has no analogue (it ships fp32 CHW tensors through
pin_memory, train_use_fix_initial.py:170-177); this is a TPU-production
optimization of the same data contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# scale/offset per batch key; None means plain cast (binary masks)
_DECODE = {
    "image": (127.5, -1.0),
    "image_s": (127.5, -1.0),
    "image_t": (127.5, -1.0),
    "map": None,
    "map_s": None,
    "map_t": None,
    "boundary": (255.0, 0.0),
    "boundary_s": (255.0, 0.0),
    "boundary_t": (255.0, 0.0),
}


def _assert_decodable(key: str, x) -> None:
    """uint8 arrays under an unknown key pass through ``_decode_one``
    untouched — catch that loudly rather than scaling 0..255 values into a
    loss."""
    if getattr(x, "dtype", None) == np.uint8 and key not in _DECODE:
        raise KeyError(
            f"wire: no decode rule for uint8 batch key {key!r} "
            f"(known: {sorted(_DECODE)}) — add it to wire._DECODE"
        )


def _decode_one(xp, key: str, x):
    if getattr(x, "dtype", None) != np.uint8 or key not in _DECODE:
        return x
    rule = _DECODE[key]
    x = x.astype(xp.float32)
    if rule is None:  # binary mask: plain cast
        return x
    scale, offset = rule
    if xp is np:
        y = x / np.float32(scale)
    else:
        # A plain jnp ``x / 127.5`` is NOT bit-equal to numpy: XLA rewrites
        # division by a non-power-of-2 constant into multiply-by-reciprocal,
        # a 1-ulp difference on ~15% of values (caught by tests/test_wire.py).
        # Hiding the constant behind an optimization barrier keeps the real
        # IEEE divide — still a cheap fused elementwise op (a 256-entry LUT
        # gather, the other exact formulation, measured 2x the whole step
        # time on TPU v5e).
        y = x / jax.lax.optimization_barrier(jnp.float32(scale))
    return y + np.float32(offset) if offset else y


def decode_batch(batch: dict) -> dict:
    """Device-side (jnp) decode of a possibly-uint8 batch; fp32 keys and
    non-array entries pass through untouched. Called inside the jitted
    steps so the conversion compiles into the graph."""
    for k, v in batch.items():
        _assert_decodable(k, v)
    return {k: _decode_one(jnp, k, v) for k, v in batch.items()}


def decode_array(key: str, x: np.ndarray) -> np.ndarray:
    """Host-side (numpy) decode of one sample/batch array, for the few
    host consumers (viz tiles, CPU metrics) of wire-format batches."""
    x = np.asarray(x)
    _assert_decodable(key, x)
    return _decode_one(np, key, x)


def encode_array(key: str, x: np.ndarray) -> np.ndarray:
    """Host-side exact inverse of the decode: canonical fp32 -> uint8 wire.
    Only valid for arrays that came from the fp32 pipeline (whose values
    are exact uint8 images by provenance — see module docstring); used by
    benchmarks and the bit-exactness tests."""
    x = np.asarray(x)
    if x.dtype == np.uint8 or key not in _DECODE:
        return x
    rule = _DECODE[key]
    if rule is None:
        u = x
    else:
        scale, offset = rule
        u = (x - offset) * scale
    u = np.rint(u)
    if not (u.min() >= 0 and u.max() <= 255):
        raise ValueError(f"{key}: values outside uint8 wire range "
                         f"[{u.min()}, {u.max()}]")
    return u.astype(np.uint8)
