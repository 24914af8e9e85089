"""Pallas moment kernel vs XLA reduction (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_channel_sums_interpret_matches_xla(monkeypatch):
    from jax.experimental import pallas as pl

    import uda_clr_tpu.ops.pallas.moments as M

    # force interpreter mode so the TPU kernel runs on CPU
    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 256)).astype(np.float32))
    s, sq = M.channel_sums(x, block_rows=64)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(jnp.sum(x, axis=(0, 1, 2))), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sq), np.asarray(jnp.sum(x * x, axis=(0, 1, 2))), rtol=1e-5, atol=1e-4
    )

    mean, var, n = M.batch_moments_pallas(x)
    assert n == 4 * 8 * 8
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.mean(x, axis=(0, 1, 2))),
                               rtol=1e-5, atol=1e-5)


def test_norm_moments_impl_switch():
    from uda_clr_tpu.models import norm

    assert norm._MOMENTS_IMPL == "xla"
    norm.set_moments_impl("pallas")
    assert norm._MOMENTS_IMPL == "pallas"
    norm.set_moments_impl("xla")
