"""Spatial sharding == single-device equivalence (the 'space' mesh axis).

The optional 2-D ``('data', 'space')`` mesh (parallel/mesh.py:44-48) shards
the activation H axis across devices in addition to the batch axis — the
attention-free CNN analogue of sequence parallelism (SURVEY.md §2.7: the
reference has no TP/PP/SP; spatial sharding is this architecture's scaling
axis beyond pure DP, for models/batches that outgrow one chip's HBM). The
multichip dryrun (__graft_entry__.py) compiles and executes the 4x2 mesh and
asserts a finite loss; this test pins the stronger claim: the spatially
sharded step computes the SAME training step — XLA's conv halo exchanges,
the BN moment reductions spanning both mesh axes, and the gradient
all-reduce must reproduce the 1-device numbers to reduction-reorder noise.

Tolerances follow tests/test_mesh_equivalence.py (same measured noise
mechanisms: per-shard moment reassociation re-normalized by ~50 BN layers,
hard pseudo-label/confidence thresholds downstream of the drift, Adam's
sign-like first step amplifying near-zero-gradient leaves).
"""

import numpy as np
import pytest
import jax

from tests.test_mesh_equivalence import (
    B,
    LOOSE,
    SIZE,
    TIGHT,
    _cfg,
    _fixed_batch,
    _max_abs_diff,
    dropout_off,  # noqa: F401  (fixture)
)
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_train_step


def _run_step_on_mesh(mesh_shape: tuple):
    cfg = _cfg("bn")
    mesh = get_mesh(mesh_shape)
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), cfg.optim)
    state = jax.device_put(state, replicated_sharding(mesh))
    sh = batch_sharding(mesh)  # P('data','space') on a 2-D mesh
    batch = {k: jax.device_put(v, sh) for k, v in _fixed_batch().items()}
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    state, metrics = step(state, batch, 1e-3, 2.5e-5, 26)
    metrics.pop("_viz", None)
    return jax.device_get(state), {
        k: float(v) for k, v in jax.device_get(metrics).items()
    }


def test_one_device_vs_4x2_spatial_mesh(dropout_off):  # noqa: F811
    s1, m1 = _run_step_on_mesh((1,))
    s2, m2 = _run_step_on_mesh((4, 2))

    assert set(m1) == set(m2)
    for k in m1:
        tol = 2e-5 if k in TIGHT else 2e-3
        assert abs(m1[k] - m2[k]) < tol, f"{k}: {m1[k]} vs {m2[k]}"

    assert _max_abs_diff(s1.gen_stats, s2.gen_stats) < 2e-3
    assert _max_abs_diff(s1.gen_params, s2.gen_params) < 3e-3
    assert _max_abs_diff(s1.dis_params, s2.dis_params) < 1e-3
    assert _max_abs_diff(s1.dis2_params, s2.dis2_params) < 1e-3
    assert _max_abs_diff(s1.proto_src, s2.proto_src) < 1e-3
    assert _max_abs_diff(s1.proto_trg, s2.proto_trg) < 0.1

    # the sharded outputs must actually BE spatially sharded (guard against
    # GSPMD silently gathering everything to one device and "passing")
    mesh = get_mesh((4, 2))
    x = jax.device_put(np.zeros((B, SIZE, SIZE, 3), np.float32), batch_sharding(mesh))
    assert x.sharding.spec == jax.sharding.PartitionSpec("data", "space")
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (B // 4, SIZE // 2, SIZE, 3)
