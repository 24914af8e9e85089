"""Backbone rematerialization (cfg.model.remat / DeepLab(remat=True)).

``nn.remat`` (jax.checkpoint) around every backbone block trades ~one
extra backbone forward of FLOPs for HBM at train time — the TPU knob
that admits larger per-chip batches (B32 at 512² OOMs without it,
PARITY.md "Batch-size scaling"). It must be a pure memory/scheduling
transform: identical parameter tree, outputs, batch-stat updates, and
gradients. No reference counterpart (torch activation checkpointing is
never used there) — this is TPU-native surface.

Equivalence contract: parameter tree, forward outputs and batch-stat
updates are BITWISE identical; gradients agree to fp32-reassociation
level (the rematerialized backward is scheduled/fused differently by
XLA, so deep backbones pick up O(1e-5) relative reduction-order noise —
mobilenet happens to be bitwise, resnet101 is not).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_clr_tpu.models.deeplab import DeepLab

B, SIZE = 2, 48


def _model(backbone, remat):
    return DeepLab(num_classes=2, backbone=backbone, output_stride=16,
                   norm="bn", remat=remat)


@pytest.mark.parametrize("backbone", ["mobilenet", "resnet"])
def test_remat_is_numerically_identical(backbone):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, SIZE, SIZE, 3)), jnp.float32
    )
    plain, remat = _model(backbone, False), _model(backbone, True)
    variables = plain.init(jax.random.PRNGKey(0), x[:1], train=False)
    # identical parameter tree: remat is a lifted transform, not a rewire
    v2 = remat.init(jax.random.PRNGKey(0), x[:1], train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    def run(model):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, domains=2, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return (
                jnp.sum(out.mask_logits**2) + jnp.sum(out.boundary_logits**2)
            ) / x.size, (out, mut)

        (loss, (out, mut)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        return loss, out, mut, grads

    l1, o1, m1, g1 = run(plain)
    l2, o2, m2, g2 = run(remat)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(o1.mask_logits), np.asarray(o2.mask_logits))
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        # fp32 reduction-reassociation noise of the recomputed backward;
        # scale-relative per-leaf bound (see module docstring)
        tol = 1e-4 * max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=tol)


def test_remat_trains_through_the_full_step():
    """The fused prototype_full step (vmap MC + stop_gradient D phases +
    donated state) compiles and runs with a remat'ed backbone."""
    from uda_clr_tpu.config import Config
    from uda_clr_tpu.train.state import create_train_state
    from uda_clr_tpu.train.steps import make_train_step

    cfg = Config()
    cfg.model.remat = True
    cfg.method.method = "prototype_full"
    cfg.method.mc_samples = 2
    cfg.method.rng_impl = "threefry2x32"
    model = _model("mobilenet", True)
    state = create_train_state(model, jax.random.PRNGKey(0), (B, SIZE, SIZE, 3))
    rng = np.random.default_rng(1)
    batch = {
        "image_s": jnp.asarray(rng.standard_normal((B, SIZE, SIZE, 3)), jnp.float32),
        "map_s": jnp.asarray(rng.uniform(0, 1, (B, SIZE, SIZE, 2)) > 0.5, jnp.float32),
        "boundary_s": jnp.asarray(rng.uniform(0, 1, (B, SIZE, SIZE, 1)), jnp.float32),
        "image_t": jnp.asarray(rng.standard_normal((B, SIZE, SIZE, 3)), jnp.float32),
    }
    step = make_train_step(model, cfg, "prototype_full", proto_phase=True)
    state, metrics = step(state, batch, 1e-3, 2.5e-5, 30)
    assert np.isfinite(float(metrics["loss_all"]))
    assert int(state.step) == 1
