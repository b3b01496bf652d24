"""Golden tests for the wrapper's bilinear resize-to-teacher-grid.

The keystone student-wrapper contract (reference ``models/model_zoo.py:116-129``)
is ``F.interpolate(feat, size=n_patches, mode='bilinear',
align_corners=False)``. VERDICT r2 weak #5: the bicubic pos-embed path had
torch goldens but the bilinear path every student actually uses did not —
these pin ``ops.resize.resize_nhwc`` against torch for the odd up/down
ratios students hit (e.g. stdc res5 7x7 -> 16x16, res2 56x56 -> 16x16).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dinov2_distillation_tpu.ops.resize import resize_nhwc

_CASES = [
    ((7, 7), (16, 16)),      # res5 of a /32 backbone at 224 -> ViT-S grid
    ((28, 28), (16, 16)),    # res3 downscale
    ((56, 56), (16, 16)),    # res2 heavy downscale
    ((14, 14), (16, 16)),    # near-identity upscale
    ((7, 7), (37, 37)),      # vitl/518-style grid, non-integer ratio
    ((5, 9), (16, 16)),      # anisotropic input
    ((16, 16), (16, 16)),    # identity shortcut
]


@pytest.mark.parametrize("in_hw,out_hw", _CASES, ids=[f"{i}->{o}" for i, o in _CASES])
def test_resize_nhwc_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 5)).astype(np.float32)
    got = np.asarray(resize_nhwc(jnp.asarray(x), out_hw, "bilinear"))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=False, antialias=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nhwc_preserves_dtype(rng):
    x = jnp.asarray(rng.standard_normal((1, 7, 7, 4)), jnp.bfloat16)
    out = resize_nhwc(x, (16, 16))
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 16, 16, 4)
