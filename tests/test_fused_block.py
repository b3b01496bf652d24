"""Fused ViT block kernel vs the unfused flax Block — numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_distillation_tpu.models.vit import Block, ViTConfig
from dinov2_distillation_tpu.ops.fused_block import fused_block_supported, fused_vit_block


def test_fused_block_matches_unfused(rng):
    cfg = ViTConfig("tiny", embed_dim=128, depth=1, num_heads=2)
    blk = Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 257, 128)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    want = blk.apply({"params": params}, x)
    got = fused_vit_block(x, params, num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_fused_block_support_matrix():
    from dinov2_distillation_tpu.ops.fused_block import fused_split_supported

    assert fused_block_supported(384, "mlp", 257)      # ViT-S
    assert fused_block_supported(768, "mlp", 257)      # ViT-B
    assert not fused_block_supported(1024, "mlp", 257)  # ViT-L: weights > VMEM
    assert not fused_block_supported(1536, "swiglu", 257)  # ViT-g
    assert not fused_block_supported(384, "mlp", 1370)  # 518px crop: N too long
    assert fused_split_supported(1024, "mlp", 257)      # ViT-L split path
    assert not fused_split_supported(1536, "swiglu", 257)


def test_fused_split_matches_unfused(rng):
    from dinov2_distillation_tpu.ops.fused_block import fused_vit_block_split

    cfg = ViTConfig("tiny", embed_dim=128, depth=1, num_heads=2)
    blk = Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 257, 128)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    want = blk.apply({"params": params}, x)
    got = fused_vit_block_split(x, params, num_heads=2, hidden_chunks=4,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
