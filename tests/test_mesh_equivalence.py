"""Multi-device == single-device equivalence (VERDICT r2 item 5).

The GSPMD scaling claim (parallel/mesh.py docstring, models/norm.py:21-26,
ops/prototypes.py:4-7) is that sharding the batch axis changes WHERE the
reductions run, not WHAT they compute: cross-replica BN moments, prototype
pools, loss means, and gradient all-reduces must match the single-device
values. This runs the full flagship train step on the same global batch
under a 1-device and an 8-device mesh (fp32, dropout off) and asserts:

  * step-0 continuous losses agree to reduction-reorder noise (<=1e-5) —
    a per-shard-moments bug (BN over B=1 instead of B=8) would shift
    these by ~1e-2;
  * generator gradients agree leaf-wise to the same noise level — the
    literal "gradient all-reduce == full-batch gradient" invariant;
  * updated running stats agree, bn and tn (per-domain) alike.

Measured noise floor (CPU, fp32, matmul precision highest): forward
logits diverge up to ~7e-4 after ~50 conv+BN layers (moment reductions
reassociate per shard; each BN re-normalizes the drift), and the
prototype path crosses hard thresholds (sigmoid > 0.75, std < 0.04) —
one boundary pixel in 32768 flipped in the measurement run, discretely
moving the masked centroids by ~2e-2. The prototype-side tolerances are
therefore loose by design; the tight assertions above are the ones a
sharding-semantics bug cannot evade.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uda_clr_tpu.config import Config
from uda_clr_tpu.models import layers as layers_lib
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_train_step

B, SIZE = 8, 64

TIGHT = {"loss_seg", "loss_D", "loss_D2", "loss_adv"}  # no threshold ops
LOOSE = {"loss_intra", "loss_inter", "loss_all"}  # downstream of hard masks


@pytest.fixture()
def dropout_off():
    prev = layers_lib._DROPOUT_IMPL
    layers_lib.set_dropout_impl("off")
    yield
    layers_lib.set_dropout_impl(prev)


def _fixed_batch():
    rng = np.random.default_rng(7)
    return {
        "image_s": rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32),
        "map_s": (rng.uniform(0, 1, (B, SIZE, SIZE, 2)) > 0.5).astype(np.float32),
        "boundary_s": rng.uniform(0, 1, (B, SIZE, SIZE, 1)).astype(np.float32),
        "image_t": rng.standard_normal((B, SIZE, SIZE, 3)).astype(np.float32),
    }


def _cfg(norm: str) -> Config:
    cfg = Config()
    cfg.model.output_stride = 16
    cfg.model.norm = norm
    cfg.model.compute_dtype = "float32"
    cfg.method.mc_samples = 2
    return cfg


def _make(n_devices: int, norm: str):
    cfg = _cfg(norm)
    mesh = get_mesh((n_devices,))
    model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm=norm)
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), cfg.optim)
    state = jax.device_put(state, replicated_sharding(mesh))
    sh = batch_sharding(mesh)
    batch = {k: jax.device_put(v, sh) for k, v in _fixed_batch().items()}
    return cfg, model, state, batch


def _run_step(n_devices: int, norm: str):
    cfg, model, state, batch = _make(n_devices, norm)
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    state, metrics = step(state, batch, 1e-3, 2.5e-5, 26)
    metrics.pop("_viz", None)
    return jax.device_get(state), {
        k: float(v) for k, v in jax.device_get(metrics).items()
    }


def _max_abs_diff(a, b):
    return max(
        float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("norm", ["bn", "tn"])
def test_one_vs_eight_device_step_equivalence(dropout_off, norm):
    s1, m1 = _run_step(1, norm)
    s8, m8 = _run_step(8, norm)

    assert set(m1) == set(m8)
    for k in m1:
        tol = 1e-5 if k in TIGHT else 2e-3
        assert abs(m1[k] - m8[k]) < tol, f"{k}: {m1[k]} vs {m8[k]}"

    # running stats after one step: cross-replica (per-domain, for tn)
    # moments must be the full-batch moments on every device
    assert _max_abs_diff(s1.gen_stats, s8.gen_stats) < 2e-3
    # params after one Adam/SGD step: Adam's m/(sqrt(v)+eps) ~ sign(g) at
    # step 0, so a near-zero-gradient leaf can flip sign under 1e-7 noise
    # and move a parameter by up to 2*lr — bound, don't chase exactness
    assert _max_abs_diff(s1.gen_params, s8.gen_params) < 3e-3
    assert _max_abs_diff(s1.dis_params, s8.dis_params) < 1e-3
    assert _max_abs_diff(s1.dis2_params, s8.dis2_params) < 1e-3
    # prototype banks: global masked pools; loose because the hard
    # pseudo-label/confidence thresholds flip O(1) boundary pixels
    assert _max_abs_diff(s1.proto_src, s8.proto_src) < 1e-3
    assert _max_abs_diff(s1.proto_trg, s8.proto_trg) < 0.1


@pytest.mark.parametrize("norm", ["bn", "tn"])
def test_gradient_allreduce_equivalence(dropout_off, norm):
    """The sharded-batch generator gradient must equal the full-batch
    gradient leaf-for-leaf (the precise claim that replicated params +
    sharded batch => XLA's gradient all-reduce sums every example)."""
    from uda_clr_tpu.ops import losses as L
    from uda_clr_tpu.train.steps import _gen_apply, _split

    def grads_on(n_devices):
        cfg, model, state, batch = _make(n_devices, norm)

        @jax.jit
        def g(params):
            def loss_fn(p):
                x_all = jnp.concatenate([batch["image_s"], batch["image_t"]], axis=0)
                outs, _ = _gen_apply(
                    model, p, state.gen_stats, x_all,
                    jax.random.PRNGKey(3), True, 2, mutable=True,
                )
                out_s, _ = _split(outs, B)
                return L.bce_sigmoid_stable(
                    out_s.mask_logits.astype(jnp.float32), batch["map_s"]
                ) + L.mse(
                    jax.nn.sigmoid(out_s.boundary_logits.astype(jnp.float32)),
                    batch["boundary_s"],
                )

            return jax.grad(loss_fn)(params)

        return jax.device_get(g(state.gen_params))

    g1, g8 = grads_on(1), grads_on(8)
    flat1, flat8 = jax.tree.leaves(g1), jax.tree.leaves(g8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(float(np.max(np.abs(a))), 1e-3)
        assert float(np.max(np.abs(a - b))) < 5e-4 * scale


# ---------------------------------------------------------------------------
# The same 1-vs-8-device invariant across every OTHER method family: the
# flagship tests above pin the mechanism (cross-replica BN moments, gradient
# all-reduce); these pin that no method's step smuggles in a per-shard
# reduction. Tight keys are continuous scalars (a per-shard-moments bug moves
# them ~1e-2); loose keys sit downstream of hard thresholds (pseudo-label /
# confidence binarization), where one flipped boundary pixel moves masked
# means discretely.
# ---------------------------------------------------------------------------

_METHOD_CASES = {
    # bcdm's ONLY pre-update scalar is loss_seg (measured 1-vs-8 diff:
    # 1.2e-7). The cdd scalars and their loss_all aggregate are computed
    # after 1-6 same-step Adam updates at lr=1e-3, where Adam's sign-like
    # first steps amplify per-shard reassociation noise (~1e-7 on grads) to
    # lr-scale param diffs; being differences of sibling classifier outputs,
    # the cdds inherit that twice (measured: 1.5e-3 / 1.2e-2). "post" keys
    # get a 4e-2 bound — still an order under any per-shard-reduction bug.
    "bcdm": dict(
        state_kw=dict(with_cls2=True),
        overrides={},
        tight={"loss_seg"},
        post={"loss_cdd_before", "loss_cdd_after", "loss_all"},
    ),
    "mean_teacher": dict(
        state_kw=dict(with_teacher=True),
        overrides={"teacher_noise": 0.0},
        tight={"loss_seg", "loss_adv", "loss_consistency", "loss_D", "loss_D2", "loss_all"},
    ),
    "posal": dict(
        state_kw={},
        overrides={},
        tight={"loss_seg", "loss_adv", "loss_D", "loss_all"},
    ),
    "prototype": dict(
        state_kw=dict(with_proto_bank=True),
        overrides={},
        tight={"loss_seg", "loss_adv", "loss_D", "loss_D2"},
        loose={"loss_all", "loss_cup", "loss_disc", "loss_bu"},
    ),
    "prototype_mt": dict(
        state_kw={},
        overrides={"use_trg_cons": True},
        tight={"loss_seg", "loss_adv", "loss_D", "loss_D2", "loss_src_reg"},
        loose={"loss_all", "loss_intra", "loss_inter", "loss_aug"},
    ),
}


@pytest.mark.parametrize("method", sorted(_METHOD_CASES))
def test_method_surface_mesh_equivalence(dropout_off, method):
    case = _METHOD_CASES[method]

    def run(n_devices):
        cfg = _cfg("bn")
        cfg.method.method = method
        for k, v in case["overrides"].items():
            setattr(cfg.method, k, v)
        mesh = get_mesh((n_devices,))
        model = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm="bn")
        state = create_train_state(
            model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3), cfg.optim,
            **case["state_kw"],
        )
        state = jax.device_put(state, replicated_sharding(mesh))
        sh = batch_sharding(mesh)
        batch = {k: jax.device_put(v, sh) for k, v in _fixed_batch().items()}
        step = make_train_step(
            model, cfg, method,
            proto_phase=method in ("prototype", "prototype_mt"),
        )
        _, metrics = step(state, batch, 1e-3, 2.5e-5, 26)
        metrics.pop("_viz", None)
        return {k: float(v) for k, v in jax.device_get(metrics).items()}

    m1, m8 = run(1), run(8)
    assert set(m1) == set(m8)
    checked = case["tight"] | case.get("loose", set()) | case.get("post", set())
    assert case["tight"] <= set(m1), f"missing tight keys: {case['tight'] - set(m1)}"
    for k in m1:
        assert k in checked, f"unclassified metric {k} for {method}"
        tol = 1e-5 if k in case["tight"] else (4e-2 if k in case.get("post", set()) else 2e-2)
        assert abs(m1[k] - m8[k]) < tol, f"{method}.{k}: {m1[k]} vs {m8[k]}"
