"""Swin Transformer student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/swin.py`` (the
detectron2-style Swin trunk): 4x4 patch embed + LayerNorm, four stages of
shifted-window attention blocks (relative-position-bias tables, cyclic shift
with the -100 additive attention mask for shifted windows, window 7), patch
merging (2x2 concat -> LN -> Linear 4C->2C) between stages, per-stage output
LayerNorm; outputs res2..res5 at strides 4/8/16/32 with channels C,2C,4C,8C.

Wrapper config (reference swin_wrapper.py:11-28, 79-94): swin_tiny
depths [2,2,6,2], swin_small [2,2,18,2]; embed 96, heads [3,6,12,24],
window 7, qkv_bias, drop_rate **0.3** (dropout after pos/proj/MLP — needs a
'dropout' PRNG in train mode), attn_drop 0, drop_path 0.

Window attention (49 tokens) runs as plain XLA einsum attention — at this
size the Pallas single-block kernel would pad 49 -> 128 and waste the MXU;
XLA fuses the bias+softmax chain fine.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 bias table (reference :89-141)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask, *, train: bool) -> jnp.ndarray:
        """x: (B_windows, N=ws*ws, C); mask: (nW, N, N) additive or None."""
        bw, n, c = x.shape
        nh, hd = self.num_heads, self.dim // self.num_heads
        ws = self.window_size

        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
        )
        idx = jnp.asarray(_rel_pos_index(ws).reshape(-1))
        bias = bias_table[idx].reshape(n, n, nh).transpose(2, 0, 1)  # (nh, N, N)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.drop_rate, deterministic=not train)(out)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins: jnp.ndarray, ws: int, b: int, h: int, w: int) -> jnp.ndarray:
    c = wins.shape[-1]
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _attn_mask(hp: int, wp: int, ws: int, shift: int) -> jnp.ndarray:
    """-100 additive mask for shifted windows (reference :438-464)."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    wins = img.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(mask)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: int = 4
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = self.shift if min(hp, wp) > ws else 0
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _attn_mask(hp, wp, ws, shift)
        else:
            mask = None

        wins = _window_partition(y, ws)
        wins = WindowAttention(self.dim, ws, self.num_heads, self.drop_rate,
                               dtype=self.dtype, name="attn")(wins, mask, train=train)
        y = _window_reverse(wins, ws, b, hp, wp)

        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :h, :w]
        x = shortcut + y

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(y)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_rate: float = 0.3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        h = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(h)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)

        outs: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                h = SwinBlock(dim, self.num_heads[i], self.window_size,
                              shift=0 if j % 2 == 0 else self.window_size // 2,
                              drop_rate=self.drop_rate, dtype=self.dtype,
                              name=f"stage{i}_block{j}")(h, train=train)
            out = nn.LayerNorm(dtype=self.dtype, name=f"out_norm{i}")(h)
            outs[f"res{i + 2}"] = out
            if i < len(self.depths) - 1:
                h = PatchMerging(dim, dtype=self.dtype, name=f"downsample{i}")(h)
                dim *= 2
        return outs


_VARIANTS = {
    "swin_tiny": {"depths": (2, 2, 6, 2)},
    "swin_small": {"depths": (2, 2, 18, 2)},
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not a Swin config called {model_name}.")
    net = SwinTransformer(depths=_VARIANTS[model_name]["depths"], dtype=dtype)
    channels = {f"res{i + 2}": 96 * (2 ** i) for i in range(4)}
    return net, channels
