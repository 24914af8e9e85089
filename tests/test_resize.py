"""Parity of align-corners bilinear / nearest resize against torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from uda_clr_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((32, 32), (128, 128)), ((128, 128), (512, 512)), ((1, 1), (32, 32)),
     ((16, 16), (7, 7)), ((8, 8), (8, 8))],
)
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear_align_corners(x, out_hw))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((512, 512), (128, 128)), ((10, 10), (4, 4))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 2), dtype=np.float32)
    got = np.asarray(resize_nearest(x, out_hw))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, size=out_hw, mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
