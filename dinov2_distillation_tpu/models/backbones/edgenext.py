"""EdgeNeXt student backbone (NHWC, flax).

The reference serves these via timm ``features_only`` (``timm_wrapper.py:
6-21``; the 2-GPU baseline run distilled into ``edgenext_xx_small``). Native
equivalent of the EdgeNeXt architecture: a 4x4/4 patchify stem, four stages
mixing ConvNeXt-style convolution encoders (dwconv k x k -> LN -> pw 4x ->
GELU -> pw, LayerScale 1e-6) with one Split-Depthwise-Transpose-Attention
(SDTA) encoder at the end of stages 2-4: Res2Net-style cascaded depthwise
3x3 over channel splits, optional XCA positional embedding, cross-covariance
attention over channels (learnable per-head temperature), then an LN + pw
MLP — all residual with LayerScale.

Variants (timm edgenext configs):
  xx_small: depths [2,2,6,2], dims [24,48,88,168],  heads 4
  x_small:  depths [3,3,9,3], dims [32,64,100,192], heads 4
  small:    depths [3,3,9,3], dims [48,96,160,304], heads 8
  base:     depths [3,3,9,3], dims [80,160,288,584], heads 8
Feature taps = stage outputs (strides 4/8/16/32), channels = dims.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_LN_EPS = 1e-6


class ConvEncoder(nn.Module):
    """dw kxk -> LN -> pw 4x -> GELU -> pw, LayerScale, residual."""

    dim: int
    kernel: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2
        h = nn.Conv(self.dim, (self.kernel, self.kernel),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + h * gamma.astype(h.dtype)


class XCA(nn.Module):
    """Cross-covariance attention: softmax over the channel-channel matrix of
    L2-normalized q,k with a learnable per-head temperature."""

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        temperature = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 4, 1)  # (3,B,nh,hd,N)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-12).astype(q.dtype)
        k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-12).astype(k.dtype)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * temperature, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class PositionalEncodingFourier(nn.Module):
    """XCA positional embedding (sine-cosine -> 1x1 conv), used in stage 2."""

    dim: int
    hidden: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, b: int, h: int, w: int) -> jnp.ndarray:
        import numpy as np

        scale = 2 * np.pi
        eps = 1e-6
        y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
        x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
        dim_t = 10000 ** (2 * (np.arange(self.hidden) // 2) / self.hidden)
        pos_x = x[:, :, None] / dim_t
        pos_y = y[:, :, None] / dim_t
        pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                         axis=3).reshape(h, w, -1)
        pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                         axis=3).reshape(h, w, -1)
        pos = jnp.asarray(np.concatenate([pos_y, pos_x], axis=-1)[None])
        proj = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="token_projection")(
            pos.astype(self.dtype))
        return jnp.broadcast_to(proj, (b, h, w, self.dim))


class SDTAEncoder(nn.Module):
    """Split depthwise transpose attention encoder."""

    dim: int
    num_heads: int = 4
    scales: int = 2
    use_pos_emb: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # Res2Net-style cascaded depthwise 3x3 over channel splits
        width = max(1, -(-c // self.scales))  # ceil
        splits = [x[..., i * width:(i + 1) * width] for i in range(self.scales)
                  if i * width < c]
        outs = []
        prev = None
        for i, sp in enumerate(splits[:-1] if len(splits) > 1 else splits):
            inp = sp if prev is None else sp + prev
            cch = inp.shape[-1]
            prev = nn.Conv(cch, (3, 3), padding=[(1, 1), (1, 1)],
                           feature_group_count=cch, dtype=self.dtype,
                           name=f"dw_{i}")(inp)
            outs.append(prev)
        if len(splits) > 1:
            outs.append(splits[-1])
        y = jnp.concatenate(outs, axis=-1)

        tokens = y.reshape(b, h * w, c)
        if self.use_pos_emb:
            pos = PositionalEncodingFourier(c, dtype=self.dtype, name="pos_embd")(b, h, w)
            tokens = tokens + pos.reshape(b, h * w, c)
        t = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_xca")(tokens)
        gamma_xca = self.param("gamma_xca", nn.initializers.constant(1e-6), (c,))
        tokens = tokens + gamma_xca.astype(t.dtype) * XCA(
            c, self.num_heads, dtype=self.dtype, name="xca")(t)

        t = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(tokens)
        m = nn.Dense(4 * c, dtype=self.dtype, name="pwconv1")(t)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(c, dtype=self.dtype, name="pwconv2")(m)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,))
        tokens = tokens + m * gamma.astype(m.dtype)
        return tokens.reshape(b, h, w, c)


class EdgeNeXt(nn.Module):
    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (24, 48, 88, 168)
    num_heads: int = 4
    global_blocks: Sequence[int] = (0, 1, 1, 1)
    d2_scales: Sequence[int] = (2, 2, 3, 4)
    kernel_sizes: Sequence[int] = (3, 5, 7, 9)
    pos_embd: Sequence[bool] = (False, True, False, False)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
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
            n_global = self.global_blocks[i]
            n_conv = depth - n_global
            for j in range(n_conv):
                h = ConvEncoder(dim, self.kernel_sizes[i], dtype=self.dtype,
                                name=f"stage{i}_conv{j}")(h)
            for j in range(n_global):
                h = SDTAEncoder(dim, self.num_heads, self.d2_scales[i],
                                use_pos_emb=self.pos_embd[i], dtype=self.dtype,
                                name=f"stage{i}_sdta{j}")(h)
            outs[f"res{i + 2}"] = h
        return outs


_VARIANTS = {
    "edgenext_xx_small": {"depths": (2, 2, 6, 2), "dims": (24, 48, 88, 168), "num_heads": 4},
    "edgenext_x_small": {"depths": (3, 3, 9, 3), "dims": (32, 64, 100, 192), "num_heads": 4},
    "edgenext_small": {"depths": (3, 3, 9, 3), "dims": (48, 96, 160, 304), "num_heads": 8},
    "edgenext_base": {"depths": (3, 3, 9, 3), "dims": (80, 160, 288, 584), "num_heads": 8},
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not an EdgeNeXt config called {model_name}.")
    v = _VARIANTS[model_name]
    net = EdgeNeXt(depths=v["depths"], dims=v["dims"], num_heads=v["num_heads"],
                   dtype=dtype)
    channels = {f"res{i + 2}": d for i, d in enumerate(v["dims"])}
    return net, channels
