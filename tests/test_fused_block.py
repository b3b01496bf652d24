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
    # ViT-g swiglu split path (r4): supported at the real hidden width
    assert fused_split_supported(1536, "swiglu", 257, 4096)
    assert not fused_split_supported(4096, "swiglu", 257, 16384)


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


def test_fused_block_dx_matches_autodiff(rng):
    """Input-gradient kernel vs jax.vjp of the unfused block (the cascade
    needs d(input) only — teacher params are never optimized)."""
    from dinov2_distillation_tpu.ops.fused_block import fused_vit_block_dx

    cfg = ViTConfig("tiny", embed_dim=128, depth=1, num_heads=2)
    blk = Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    _, vjp = jax.vjp(lambda x_: blk.apply({"params": params}, x_), x)
    (want,) = vjp(g)
    got = fused_vit_block_dx(x, g, params, num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_fused_block_diff_roundtrip(rng):
    """custom_vjp wrapper: forward == fused forward, grad == dx kernel, and
    weight cotangents are all-zero (teacher frozen)."""
    from dinov2_distillation_tpu.ops.fused_block import fused_vit_block_diff

    cfg = ViTConfig("tiny", embed_dim=128, depth=1, num_heads=2)
    blk = Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fused(x_):
        y = fused_vit_block_diff(x_, params, 2, True)
        return jnp.sum(y ** 2)

    def loss_ref(x_):
        y = blk.apply({"params": params}, x_)
        return jnp.sum(y ** 2)

    l1, g1 = jax.value_and_grad(loss_fused)(x)
    l2, g2 = jax.value_and_grad(loss_ref)(x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-3, atol=5e-2)


def test_fused_split_swiglu_matches_unfused(rng):
    """SwiGLU (vitg) split-block kernel vs the unfused flax Block — the w12
    chunk order (x1 = first half, silu-gated) must match SwiGLUFFNFused
    (upstream dinov2/layers/swiglu_ffn.py)."""
    from dinov2_distillation_tpu.ops.fused_block import fused_vit_block_split

    cfg = ViTConfig("tiny_sg", embed_dim=128, depth=1, num_heads=2,
                    ffn="swiglu", ffn_hidden=256)
    blk = Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 257, 128)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)["params"]

    want = blk.apply({"params": params}, x)
    got = fused_vit_block_split(x, params, num_heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
