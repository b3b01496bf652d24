"""DINOv2 ViT teacher — native JAX/flax inference graph.

The reference loads the teacher from torch.hub and only ever calls
``get_intermediate_layers(x, n=1, return_class_token=True)`` on it
(``models/backbones/dinov2.py:20,32``); the actual ViT (patch embed,
interpolated pos-embeds, pre-norm MHSA blocks with LayerScale, MLP/SwiGLU)
lives in the external package. Here that inference graph is implemented
natively: NHWC patch embedding, bicubic pos-embed interpolation
(``ops.resize.interpolate_pos_embed``), and MHSA running through the fused
Pallas attention kernel (``ops.attention.fused_attention``).

Also exposes per-block application (``forward_blocks``) so the training core
can route projected student tokens through a *suffix* of teacher blocks —
the ScaleKD teacher-path-projection cascade
(reference ``train/distillation_module.py:139-178``).

Variant table (embed dim per reference ``train.py:103-108``; depth/heads/ffn
are the published DINOv2 architectures):

=============== ===== ===== ===== ==============
variant          dim  depth heads ffn
=============== ===== ===== ===== ==============
dinov2_vits14    384    12     6  mlp (4x)
dinov2_vitb14    768    12    12  mlp (4x)
dinov2_vitl14   1024    24    16  mlp (4x)
dinov2_vitg14   1536    40    24  swiglu (4096)
=============== ===== ===== ===== ==============
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import token_major_attention
from ..ops.resize import interpolate_pos_embed

PATCH_SIZE = 14
# DINOv2 models were trained at 518px -> 37x37 patch grid.
_PRETRAIN_GRID = 37
_LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    name: str
    embed_dim: int
    depth: int
    num_heads: int
    ffn: str = "mlp"  # "mlp" | "swiglu"
    ffn_hidden: Optional[int] = None  # swiglu only; mlp uses 4*dim
    patch_size: int = PATCH_SIZE
    pos_grid: int = _PRETRAIN_GRID
    layerscale_init: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


VIT_CONFIGS: Dict[str, ViTConfig] = {
    "dinov2_vits14": ViTConfig("dinov2_vits14", 384, 12, 6),
    "dinov2_vitb14": ViTConfig("dinov2_vitb14", 768, 12, 12),
    "dinov2_vitl14": ViTConfig("dinov2_vitl14", 1024, 24, 16),
    "dinov2_vitg14": ViTConfig("dinov2_vitg14", 1536, 40, 24, ffn="swiglu", ffn_hidden=4096),
}


class MHSA(nn.Module):
    """Pre-norm multi-head self-attention with fused QKV projection."""

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        # token-major attention: heads are lane slices in-kernel; no 5-D
        # reshape/transpose round-trips through HBM
        q = qkv[..., : self.dim]
        k = qkv[..., self.dim: 2 * self.dim]
        v = qkv[..., 2 * self.dim:]
        out = token_major_attention(q, k, v, self.num_heads, scale=head_dim ** -0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma.astype(x.dtype)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.activations import gelu_exact

        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """DINOv2-g's fused SwiGLU FFN (w12 -> split -> silu(x1)*x2 -> w3)."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x12 = nn.Dense(2 * self.hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="w3")(nn.silu(x1) * x2)


class Block(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm1")(x)
        h = MHSA(c.embed_dim, c.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(h)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm2")(x)
        if c.ffn == "swiglu":
            h = SwiGLU(c.embed_dim, c.ffn_hidden or 4 * c.embed_dim, dtype=self.dtype, name="mlp")(h)
        else:
            h = Mlp(c.embed_dim, 4 * c.embed_dim, dtype=self.dtype, name="mlp")(h)
        return x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(h)


class DINOv2ViT(nn.Module):
    """Frozen DINOv2 teacher.

    ``__call__`` mirrors the reference teacher wrapper's contract
    (``models/backbones/dinov2.py:27-46``): last-layer patch tokens, final
    LayerNorm applied, CLS dropped, reshaped to a spatial feature map — but
    NHWC: ``{'feature_map': (B, H/14, W/14, D)}``.
    """

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    use_fused: bool = True  # fused-block inference kernel on TPU (ViT-S/B)

    def setup(self):
        c = self.cfg
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + c.pos_grid * c.pos_grid, c.embed_dim),
        )
        self.patch_embed = nn.Conv(
            features=c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
        )
        # list-valued submodule attr: flax names these blocks_0 .. blocks_{d-1}
        self.blocks = [Block(c, dtype=self.dtype) for _ in range(c.depth)]
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype)

    def _pos_for_grid(self, hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cls_pos = self.pos_embed[:, :1]
        patch_pos = interpolate_pos_embed(self.pos_embed[:, 1:], hw)
        return cls_pos, patch_pos

    def embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) -> tokens (B, 1 + h*w, D) with pos-embeds added."""
        x = self.patch_embed(images.astype(self.dtype))
        b, h, w, d = x.shape
        tokens = x.reshape(b, h * w, d)
        cls_pos, patch_pos = self._pos_for_grid((h, w))
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (b, 1, d))
        tokens = jnp.concatenate([cls + cls_pos.astype(self.dtype),
                                  tokens + patch_pos.astype(self.dtype)], axis=1)
        return tokens

    def forward_blocks(self, tokens: jnp.ndarray, start: int, end: int) -> jnp.ndarray:
        """Apply transformer blocks [start, end) to a token sequence.

        Used by the ScaleKD cascade to run projected student tokens (no CLS)
        through a teacher-block suffix (reference
        ``train/distillation_module.py:162-178``). Blocks are sequence-length
        agnostic, so 256-token (CLS-free) inputs are fine.

        On TPU this differentiates through the fused block kernels
        (``ops.fused_block.fused_vit_block_diff``): the cascade needs input
        gradients only (teacher params are never optimized), so the backward
        is one recompute-based dx kernel per block instead of XLA's unfused
        LN/softmax/GELU backward chain.
        """
        import os

        tokens = tokens.astype(self.dtype)
        if (self._fused_mode(tokens.shape[1]) == "single"
                and os.environ.get("DKT_CASCADE_DX", "1") == "1"):
            from ..ops.fused_block import fused_vit_block_diff

            for blk in self.blocks[start:end]:
                tokens = fused_vit_block_diff(
                    tokens, blk.variables["params"], self.cfg.num_heads)
            return tokens
        for blk in self.blocks[start:end]:
            tokens = blk(tokens)
        return tokens

    def _fused_mode(self, n_tokens: int) -> str:
        from ..ops.fused_block import fused_block_supported, fused_split_supported

        if not self.use_fused or self.is_initializing():
            return "off"
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if not on_tpu:
            return "off"
        if fused_block_supported(self.cfg.embed_dim, self.cfg.ffn, n_tokens):
            return "single"  # whole block in one kernel (ViT-S/B)
        if fused_split_supported(self.cfg.embed_dim, self.cfg.ffn, n_tokens,
                                 self.cfg.ffn_hidden or 0):
            # split (attention-half + resident-weight MLP-half) kernels for
            # ViT-L (mlp) and ViT-g (swiglu half, r4). ViT-L measured
            # 138.7 ms vs 199.2 ms unfused XLA (B=128, 224px, v5e) after
            # full-width qkv + polynomial erf + sublane token padding — on
            # by default; DKT_VITL_FUSED=0 disables.
            import os

            if os.environ.get("DKT_VITL_FUSED", "1") == "1":
                return "split"
        return "off"

    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, ih, iw, _ = images.shape
        h, w = ih // self.cfg.patch_size, iw // self.cfg.patch_size
        tokens = self.embed(images)
        mode = self._fused_mode(tokens.shape[1])
        if mode != "off":
            # inference-only fused path: Pallas kernels with VMEM-resident
            # weights (the teacher is frozen; gradients never enter here)
            from ..ops.fused_block import fused_vit_block, fused_vit_block_split

            apply_block = fused_vit_block if mode == "single" else fused_vit_block_split
            for blk in self.blocks:
                tokens = apply_block(
                    tokens, blk.variables["params"], num_heads=self.cfg.num_heads)
        else:
            for blk in self.blocks:
                tokens = blk(tokens)
        tokens = self.norm(tokens)
        patch_tokens = tokens[:, 1:]
        feature_map = patch_tokens.reshape(b, h, w, self.cfg.embed_dim)
        return {"feature_map": feature_map}


def create_teacher(model_name: str, dtype: Any = jnp.bfloat16) -> DINOv2ViT:
    if model_name not in VIT_CONFIGS:
        raise KeyError(f"Unknown teacher '{model_name}'; expected one of {sorted(VIT_CONFIGS)}")
    return DINOv2ViT(VIT_CONFIGS[model_name], dtype=dtype)
