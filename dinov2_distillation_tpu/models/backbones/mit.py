"""MiT (SegFormer Multiscale Image Transformer) student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/mit.py``: four stages
of overlap patch embedding (7/4 then 3/2 convs, LayerNorm) + transformer
blocks with spatial-reduction attention (separate q and fused kv projections,
``sr_ratio`` conv downsampling the kv tokens — reference :81-163) and
depthwise-conv MLPs (dwconv 3x3 between fc1 and GELU — reference :22-78);
per-stage final LayerNorm, outputs res2..res5.

Wrapper config (reference mit_wrapper.py:6-13, 76-86): heads [1,2,4,8],
mlp_ratios 4, qkv_bias=True, all drop rates 0. Variants:
  b0 [2,2,2,2]/[32,64,160,256]; b1 [2,2,2,2]/[64,128,320,512];
  b2 [3,4,6,3]; b3 [3,4,18,3]; b4 [3,8,27,3]; b5 [3,6,40,3] (dims as b1).

Attention runs through the fused Pallas kernel; kv length after spatial
reduction is tiny (49 tokens at sr 8), q length up to 3136 -> the kernel's
single-block strategy still fits VMEM since scores are (Nq, Nk_small).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.attention import token_major_attention


class DWConvMlp(nn.Module):
    """fc1 -> dwconv3x3(spatial) -> GELU -> fc2 (reference :22-78)."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, _ = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = y.reshape(b, h, w, self.hidden)
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(y)
        y = y.reshape(b, n, self.hidden)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference :81-163)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="q")(x)

        kv_in = x
        if self.sr_ratio > 1:
            y = x.reshape(b, h, w, c)
            y = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                        strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                        dtype=self.dtype, name="sr")(y)
            y = y.reshape(b, -1, c)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        kv = nn.Dense(2 * self.dim, use_bias=True, dtype=self.dtype, name="kv")(kv_in)
        k = kv[..., : self.dim]
        v = kv[..., self.dim:]

        out = token_major_attention(q, k, v, nh, scale=hd ** -0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(y, h, w)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + DWConvMlp(self.dim, self.dim * self.mlp_ratio,
                          dtype=self.dtype, name="mlp")(y, h, w)
        return x


class MultiscaleImageTransformer(nn.Module):
    depths: Sequence[int] = (3, 4, 6, 3)
    dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, jnp.ndarray] = {}
        h_img = x
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            patch, stride = (7, 4) if i == 0 else (3, 2)
            pad = patch // 2
            y = nn.Conv(dim, (patch, patch), strides=(stride, stride),
                        padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                        name=f"patch_embed{i + 1}")(h_img)
            b, h, w, _ = y.shape
            tokens = y.reshape(b, h * w, dim)
            tokens = nn.LayerNorm(dtype=self.dtype, name=f"patch_norm{i + 1}")(tokens)
            for j in range(depth):
                tokens = MiTBlock(dim, self.num_heads[i], self.sr_ratios[i],
                                  dtype=self.dtype, name=f"block{i + 1}_{j}")(tokens, h, w)
            tokens = nn.LayerNorm(dtype=self.dtype, name=f"norm{i + 1}")(tokens)
            h_img = tokens.reshape(b, h, w, dim)
            outs[f"res{i + 2}"] = h_img
        return outs


_VARIANTS = {
    "mit_b0": ((2, 2, 2, 2), (32, 64, 160, 256)),
    "mit_b1": ((2, 2, 2, 2), (64, 128, 320, 512)),
    "mit_b2": ((3, 4, 6, 3), (64, 128, 320, 512)),
    "mit_b3": ((3, 4, 18, 3), (64, 128, 320, 512)),
    "mit_b4": ((3, 8, 27, 3), (64, 128, 320, 512)),
    "mit_b5": ((3, 6, 40, 3), (64, 128, 320, 512)),
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not a MIT config called {model_name}.")
    depths, dims = _VARIANTS[model_name]
    net = MultiscaleImageTransformer(depths=depths, dims=dims, dtype=dtype)
    channels = {f"res{i + 2}": d for i, d in enumerate(dims)}
    return net, channels
