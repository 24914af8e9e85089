"""Device-mesh data parallelism.

The scaling design (SURVEY.md §2.7): a 1-D ``('data',)`` mesh; batches
sharded on axis 0, parameters/stats/prototype bank replicated. Everything
else falls out of GSPMD:

  * gradient all-reduce — emitted by XLA because replicated params receive
    contributions from sharded batch elements;
  * cross-replica ("sync") BatchNorm — the batch-moment reductions inside
    DomainNorm2d become global all-reduces over ICI, giving the semantics
    the reference's dormant SynchronizedBatchNorm scaffolding aspired to
    (networks/sync_batchnorm/comm.py) with no communication code at all;
  * TransNorm's per-domain moments — the source/target halves are
    contiguous slices of the sharded batch axis, so each domain's moment
    reduction is a (subset) cross-replica reduction, keyed by the static
    split exactly as on one chip.

An optional second ``'space'`` axis spatially shards the 512x512
activations (XLA inserts halo exchanges for convs) for models/batches that
outgrow one chip's HBM; off by default at this model size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(shape: tuple | None = None, devices=None) -> Mesh:
    """('data',) mesh over all (or the first prod(shape)) devices; a 2-tuple
    shape gives ('data', 'space')."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    axis_names = ("data",) if len(shape) == 1 else ("data", "space")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; spatial axis over 'space' if present."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put numeric arrays of a host batch with the batch sharding
    (the H2D transfer lands each shard directly on its chip)."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
