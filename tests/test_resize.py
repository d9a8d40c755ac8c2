"""Golden test: our bilinear resize vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from vit_ad_tpu.ops.resize import interpolate_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((14, 14), (224, 224)), ((7, 9), (32, 48)), ((16, 16), (8, 8))]
)
def test_matches_torch(rng, align_corners, in_hw, out_hw):
    b, c = 2, 3
    x = rng.normal(size=(b, *in_hw, c)).astype(np.float32)
    got = np.asarray(
        interpolate_bilinear(x, out_hw[0], out_hw[1], align_corners=align_corners)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        TF.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_3d_input(rng):
    x = rng.normal(size=(4, 14, 14)).astype(np.float32)
    got = interpolate_bilinear(x, 28, 28, align_corners=True)
    assert got.shape == (4, 28, 28)
