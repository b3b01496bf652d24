"""ConvNeXt-V2 student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/convnext.py`` (the
ConvNeXt-**V2** with Global Response Normalization): 4x4 stride-4 patchify
stem + LayerNorm, four stages of (dw7x7 -> LN -> pw 4x -> GELU -> GRN -> pw)
blocks with LN+2x2-stride-2 downsampling between stages; drop_path 0.0 per
the wrapper (``convnext_wrapper.py:94-99``). NHWC is the native layout here —
the reference juggles channels_first/last permutes; we never permute.

Variants (reference convnext_wrapper.py:19-49):
  atto [2,2,6,2]/[40,80,160,320], pico [2,2,6,2]/[64,128,256,512],
  nano [2,2,8,2]/[80,160,320,640], tiny [3,3,9,3]/[96,192,384,768],
  base [3,3,27,3]/[128,256,512,1024]
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

_LN_EPS = 1e-6


class GRN(nn.Module):
    """Global Response Normalization (reference convnext.py:39-50)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(xf * xf, axis=(1, 2), keepdims=True))  # (B,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> pw(4x) -> GELU -> GRN -> pw -> +residual
    (reference convnext.py:53-87)."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = GRN(4 * self.dim, name="grn")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        return x + h


class ConvNeXtV2(nn.Module):
    """Trunk returning {res2..res5} (strides 4/8/16/32 —
    reference convnext.py:90-167, 183-188)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        # stem: 4x4/4 conv + LN  (downsample_layers[0])
        h = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="stem_norm")(h)

        outs: Dict[str, jnp.ndarray] = {}
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype,
                                 name=f"downsample_norm_{i}")(h)
                h = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"downsample_conv_{i}")(h)
            for j in range(depth):
                h = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage_{i}_block_{j}")(h)
            outs[f"res{i + 2}"] = h
        return outs


_VARIANTS = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnext_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(
            f"There is not a ConvNext config called {model_name}.")
    depths, dims = _VARIANTS[model_name]
    net = ConvNeXtV2(depths=depths, dims=dims, dtype=dtype)
    channels = {f"res{i + 2}": d for i, d in enumerate(dims)}
    return net, channels
