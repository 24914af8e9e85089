"""Model architecture contract tests: 7-tuple shapes, GAN patch shape,
conv padding parity with torch, and backbone behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.models.gan import BoundaryDiscriminator, UncertaintyDiscriminator
from uda_clr_tpu.models.layers import Conv2d
from uda_clr_tpu.models.mobilenet import MobileNetV2, mobilenet_block_plan


def test_block_plan_matches_reference_schedule():
    plan = mobilenet_block_plan(16)
    assert len(plan) == 17
    # strides: [1, 2,1, 2,1,1, 2,1,1,1, 1,1,1, 1,1,1, 1]
    strides = [p[2] for p in plan]
    assert strides == [1, 2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
    # dilation 1 everywhere except the final 320 block (rate multiplies late)
    dils = [p[3] for p in plan]
    assert dils == [1] * 16 + [2]
    assert plan[-1][1] == 320


def test_conv_padding_matches_torch():
    """k4 s2 p2 (PatchGAN) and dilated 3x3 (ASPP) vs torch."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 33, 33, 2), dtype=np.float32)
    for k, s, p, d in [(4, 2, 2, 1), (3, 1, 6, 6), (3, 2, 1, 1), (1, 1, 0, 1)]:
        m = Conv2d(5, k, s, p, dilation=d, use_bias=False)
        variables = m.init(jax.random.PRNGKey(0), x)
        w = np.asarray(variables["params"]["conv"]["kernel"])  # HWIO
        got = np.asarray(m.apply(variables, x))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        want = F.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), wt, stride=s, padding=p, dilation=d
        ).numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (k, s, p, d)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mobilenet_shapes():
    m = MobileNetV2(output_stride=16)
    x = jnp.zeros((2, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    high, low = m.apply(variables, x, train=False)
    assert high.shape == (2, 8, 8, 320)
    assert low.shape == (2, 32, 32, 24)


@pytest.mark.parametrize("norm", ["bn", "tn"])
def test_deeplab_seven_tuple_contract(norm):
    m = DeepLab(num_classes=2, backbone="mobilenet", output_stride=16, norm=norm)
    x = jnp.zeros((2, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    B = 2
    assert out.mask_logits.shape == (B, 128, 128, 2)
    assert out.boundary_logits.shape == (B, 128, 128, 1)
    assert out.aspp_feature.shape == (B, 8, 8, 256)
    assert out.x_bu_feature.shape == (B, 32, 32, 304)
    assert out.x_feature.shape == (B, 32, 32, 305)
    assert out.mask_before.shape == (B, 32, 32, 2)
    assert out.boundary_before.shape == (B, 32, 32, 1)


def test_deeplab_train_mode_with_domains_runs():
    m = DeepLab(num_classes=2, backbone="mobilenet", norm="tn")
    x = jnp.zeros((4, 64, 64, 3))  # 2 source + 2 target
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out, updated = m.apply(
        variables, x, train=True, domains=2,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.mask_logits.shape == (4, 64, 64, 2)
    assert "batch_stats" in updated


def test_patchgan_output_shape():
    # torch ladder for 512 input: 257 -> 129 -> 65 -> 33 -> 17; verify the
    # same arithmetic at 128: 65 -> 33 -> 17 -> 9 -> 5.
    x = jnp.zeros((2, 128, 128, 1))
    m = BoundaryDiscriminator()
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 5, 5, 1)

    x2 = jnp.zeros((2, 128, 128, 2))
    m2 = UncertaintyDiscriminator()
    v2 = m2.init(jax.random.PRNGKey(0), x2)
    assert m2.apply(v2, x2).shape == (2, 5, 5, 1)
