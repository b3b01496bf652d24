"""DINOv2 teacher: output contract, pos-embed interpolation, block-suffix
forwarding, cascade range arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.models.vit import (
    DINOv2ViT,
    VIT_CONFIGS,
    ViTConfig,
)
from dinov2_distillation_tpu.ops.resize import interpolate_pos_embed
from dinov2_distillation_tpu.train.distill import teacher_block_range


@pytest.fixture(scope="module")
def tiny_teacher():
    cfg = ViTConfig("tiny", embed_dim=32, depth=4, num_heads=2, pos_grid=7)
    model = DINOv2ViT(cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 56, 56, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    return model, variables


def test_feature_map_contract(tiny_teacher, rng):
    """Last-layer patch tokens, CLS dropped, NHWC grid
    (reference models/backbones/dinov2.py:27-46)."""
    model, variables = tiny_teacher
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert set(out) == {"feature_map"}
    assert out["feature_map"].shape == (2, 4, 4, 32)  # 56/14 = 4


def test_variant_table():
    assert VIT_CONFIGS["dinov2_vits14"].embed_dim == 384
    assert VIT_CONFIGS["dinov2_vitb14"].embed_dim == 768
    assert VIT_CONFIGS["dinov2_vitl14"].embed_dim == 1024
    assert VIT_CONFIGS["dinov2_vitg14"].embed_dim == 1536
    assert VIT_CONFIGS["dinov2_vitg14"].ffn == "swiglu"
    assert VIT_CONFIGS["dinov2_vitl14"].depth == 24


def test_pos_embed_interpolation_identity_and_resample(rng):
    pos = jnp.asarray(rng.standard_normal((1, 49, 16)).astype(np.float32))
    same = interpolate_pos_embed(pos, (7, 7))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))
    up = interpolate_pos_embed(pos, (16, 16))
    assert up.shape == (1, 256, 16)
    # constant embeddings stay constant under bicubic resampling
    const = jnp.ones((1, 49, 16))
    up_const = interpolate_pos_embed(const, (16, 16))
    np.testing.assert_allclose(np.asarray(up_const), 1.0, rtol=1e-5)


def test_forward_blocks_suffix(tiny_teacher, rng):
    """Applying blocks [a,b) then [b,c) equals [a,c); empty range is a no-op
    (the cascade's block-suffix contract)."""
    model, variables = tiny_teacher
    tokens = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))

    def fwd(t, s, e):
        return model.apply(variables, t, s, e, method=model.forward_blocks)

    noop = fwd(tokens, 2, 2)
    np.testing.assert_array_equal(np.asarray(noop), np.asarray(tokens))
    step_a = fwd(tokens, 0, 2)
    step_b = fwd(step_a, 2, 4)
    full = fwd(tokens, 0, 4)
    np.testing.assert_allclose(np.asarray(step_b), np.asarray(full), rtol=1e-5)


def test_cascade_block_ranges():
    """Reference arithmetic (train/distillation_module.py:162-178, verified
    in SURVEY.md §2.1): ViT-S res2/res3 are empty; res4 = [9, 11);
    24-block ViT-L res4 = [18, 23)."""
    assert teacher_block_range(12, "res2") == (3, 2)    # empty
    assert teacher_block_range(12, "res3") == (6, 2)    # empty
    assert teacher_block_range(12, "res4") == (9, 11)
    assert teacher_block_range(24, "res4") == (18, 23)
    assert teacher_block_range(40, "res4") == (30, 39)


def test_larger_crop_changes_grid(tiny_teacher, rng):
    model, variables = tiny_teacher
    x = jnp.asarray(rng.standard_normal((1, 112, 112, 3)).astype(np.float32))
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out["feature_map"].shape == (1, 8, 8, 32)
