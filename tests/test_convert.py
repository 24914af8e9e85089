"""End-to-end weight-conversion parity: a torch forward of the reference
architecture vs the JAX model with converted weights — the M1 parity
instrument (SURVEY.md §7)."""

import jax
import numpy as np
import pytest
import torch

from tests.torch_ref import TorchDeepLab
from uda_clr_tpu.convert.torch_import import (
    convert_deeplab_state_dict,
    convert_discriminator_state_dict,
    merge_pretrained,
)
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.models.gan import BoundaryDiscriminator


@pytest.mark.parametrize("backbone", ["mobilenet", "resnet", "xception", "drn"])
def test_deeplab_conversion_full_forward_parity(backbone):
    torch.manual_seed(0)
    tm = TorchDeepLab(num_classes=2, output_stride=16, backbone=backbone)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    sd = {f"{k}": v for k, v in sd.items()}

    params, stats = convert_deeplab_state_dict(sd, output_stride=16)

    model = DeepLab(num_classes=2, backbone=backbone, output_stride=16, norm="bn")
    ref_vars = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False)
    # structure check: converted trees align with the model's own init
    chex_paths = lambda t: {tuple(str(p) for p, _ in jax.tree_util.tree_flatten_with_path(t)[0])}
    conv_flat = {kp: v.shape for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    init_flat = {kp: v.shape for kp, v in jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
    assert conv_flat == init_flat

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for got, want, name, tol in [
        (out.mask_logits, t_out[0], "mask", 2e-3),
        (out.boundary_logits, t_out[1], "boundary", 2e-3),
        (out.x_feature, t_out[4], "x_feature", 2e-3),
    ]:
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=tol, err_msg=name)


def test_discriminator_conversion():
    torch.manual_seed(1)
    layers = {}
    chans = [1, 64, 128, 256, 512, 1]
    sd = {}
    for i in range(5):
        w = torch.randn(chans[i + 1], chans[i], 4, 4) * 0.02
        sd[f"conv{i + 1}.weight"] = w.numpy()
    params = convert_discriminator_state_dict(sd)

    m = BoundaryDiscriminator()
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    got = np.asarray(m.apply({"params": params}, x))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for i in range(5):
        t = torch.nn.functional.conv2d(t, torch.from_numpy(sd[f"conv{i+1}.weight"]), stride=2, padding=2)
        if i < 4:
            t = torch.nn.functional.leaky_relu(t, 0.2)
    np.testing.assert_allclose(got, t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_merge_pretrained_filters_shapes():
    a = {"x": {"w": np.zeros((2, 2)), "b": np.zeros(3)}, "y": np.ones(4)}
    src = {"x": {"w": np.ones((2, 2)), "b": np.ones(5)}, "z": np.ones(1)}
    out, n = merge_pretrained(a, src)
    assert n == 1
    np.testing.assert_array_equal(out["x"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["x"]["b"], np.zeros(3))  # shape mismatch skipped


def test_raw_imagenet_backbone_import():
    """RAW backbone checkpoints (the reference's hard-coded ImageNet zoo
    files: 'features....' mobilenet keys / torchvision 'layer1....' resnet
    keys, no 'backbone.' prefix) import through the same converter."""
    torch.manual_seed(2)
    tm = TorchDeepLab(num_classes=2, output_stride=16)
    # simulate the zoo file: backbone-only keys without the prefix
    sd = {k[len("backbone."):]: v.numpy() for k, v in tm.state_dict().items()
          if k.startswith("backbone.") and "num_batches_tracked" not in k}
    params, stats = convert_deeplab_state_dict(sd, output_stride=16)
    assert "backbone" in params and "stem" in params["backbone"]
    np.testing.assert_array_equal(
        params["backbone"]["stem"]["conv"]["kernel"],
        sd["features.0.0.weight"].transpose(2, 3, 1, 0),
    )
