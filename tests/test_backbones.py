"""Shape contracts for the alternative backbones through the full DeepLab."""

import jax
import jax.numpy as jnp
import pytest

from uda_clr_tpu.models.deeplab import DeepLab


@pytest.mark.parametrize(
    "backbone,low_ch,high_div",
    [("resnet", 256, 16), ("xception", 128, 16), ("drn", 256, 8)],
)
def test_backbone_deeplab_contract(backbone, low_ch, high_div):
    size = 64
    m = DeepLab(num_classes=2, backbone=backbone, output_stride=16, norm="bn")
    x = jnp.zeros((1, size, size, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.mask_logits.shape == (1, size, size, 2)
    assert out.boundary_logits.shape == (1, size, size, 1)
    assert out.aspp_feature.shape == (1, size // high_div, size // high_div, 256)
    assert out.x_bu_feature.shape == (1, size // 4, size // 4, 304)
    assert out.x_feature.shape == (1, size // 4, size // 4, 305)


def test_resnet_low_level_channels():
    from uda_clr_tpu.models.resnet import ResNet101

    m = ResNet101(output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    high, low = m.apply(v, x, train=False)
    assert high.shape == (1, 4, 4, 2048)
    assert low.shape == (1, 16, 16, 256)
