"""Multi-process (multi-host) data parallelism.

Generalizes the single-process GSPMD design (parallel/mesh.py) across OS
processes / hosts: each process owns a slice of the devices, loads its
slice of every global batch (``BatchLoader(process_index, process_count)``
— data/pipeline.py), assembles jax global Arrays from the local shards,
and runs the SAME jitted train step over the global mesh — XLA's
collectives (gradient all-reduce, cross-replica BN moments) now ride
whatever links connect the processes (ICI within a slice, DCN across
hosts/slices).

This is the across-process extension of the capability the reference's
dormant SyncBN scaffolding aspired to within one process
(/root/reference/networks/sync_batchnorm/comm.py:56); proven by
tools/dryrun_multiprocess_dp.py (2 OS processes x 4 CPU devices train one
global-mesh step with loss identical to the single-process 8-device run).

Design notes for a real pod (README "Scaling"):

* One process per host (v5e-8: a single host, a single process — this
  module is a no-op there); multi-slice: one process per slice-host, DCN
  between slices.
* Keep the mesh's 'data' axis ordered so each process's batch rows land
  on its OWN local devices — ``make_array_from_process_local_data`` then
  builds every global batch with zero cross-process traffic; only grad/BN
  reductions use the network.
* Checkpointing: orbax writes sharded arrays cooperatively; the trainer's
  host-side logging/validation runs on process 0.
"""

from __future__ import annotations

import jax


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """``jax.distributed.initialize`` wrapper (config-gated by callers).

    MUST run before anything touches a jax backend in this process
    (jax.devices(), device_put, ...). ``coordinator`` is "host:port" of
    process 0.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def maybe_initialize(run_cfg) -> bool:
    """Config-gated init: RunConfig.dist_coordinator set => multi-process.
    Returns True when distributed mode is active."""
    coord = getattr(run_cfg, "dist_coordinator", None)
    if not coord:
        return False
    initialize(coord, run_cfg.dist_num_processes, run_cfg.dist_process_id)
    return True


def put_global(x, sharding):
    """Stage a host array as a (possibly multi-process) global Array.

    Single process: plain ``jax.device_put``. Multi-process: ``x`` is this
    process's slice of the global value (its batch rows for a
    data-sharded spec, the full — identical — value for a replicated
    spec), assembled into one global Array without cross-process traffic.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def put_global_batch(batch: dict, sharding) -> dict:
    """``put_global`` every array of a host batch dict; scalars pass
    through untouched (they are replicated by the jit call itself)."""
    return {
        k: put_global(v, sharding) if getattr(v, "ndim", 0) > 1 else v
        for k, v in batch.items()
    }
