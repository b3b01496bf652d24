"""PResNet (RT-DETR ResNet) student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/presnet.py``:
variant-"d" deep stem (three 3x3 convs, strides 2/1/1) + 3x3/2 maxpool;
BasicBlock (depth < 50) or BottleNeck (1x1 -> 3x3(stride) -> 1x1x4,
variant b/d put the stride in the 3x3); variant-d stride-2 downsampling
shortcuts are AvgPool(2, ceil) + 1x1 conv (reference :231-241, 281-292).
``freeze_norm=False``, ``freeze_at=-1`` per the wrapper (:59-67) — nothing
frozen. Depths 18/34/50/101; channels 64..512 (x4 expansion for >=50).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, max_pool_same


def _avg_pool_ceil2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(2, 2, 0, ceil_mode=True): pad bottom/right when odd, count
    only valid elements (torch ceil_mode excludes implicit padding)."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.ones((1, h, w, 1), x.dtype)
        ones = jnp.pad(ones, ((0, 0), (0, ph), (0, pw), (0, 0)))
        s = nn.avg_pool(x, (2, 2), (2, 2), padding="VALID", count_include_pad=True)
        n = nn.avg_pool(ones, (2, 2), (2, 2), padding="VALID", count_include_pad=True)
        return s / n
    return nn.avg_pool(x, (2, 2), (2, 2), padding="VALID")


class PBasicBlock(nn.Module):
    out_channels: int
    stride: int
    shortcut: bool  # True -> identity shortcut
    variant: str = "d"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = ConvBN(self.out_channels, 3, self.stride, dtype=self.dtype,
                   name="branch2a")(x, train)
        h = ConvBN(self.out_channels, 3, 1, act=None, dtype=self.dtype,
                   name="branch2b")(h, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_ceil2(x)
            short = ConvBN(self.out_channels, 1, 1, padding=0, act=None,
                           dtype=self.dtype, name="short_conv")(short, train)
        else:
            short = ConvBN(self.out_channels, 1, self.stride, padding=0, act=None,
                           dtype=self.dtype, name="short")(x, train)
        return nn.relu(h + short)


class PBottleNeck(nn.Module):
    width: int        # ch_out (pre-expansion)
    stride: int
    shortcut: bool
    variant: str = "d"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        s1, s2 = (self.stride, 1) if self.variant == "a" else (1, self.stride)
        out_ch = self.width * 4
        h = ConvBN(self.width, 1, s1, padding=0, dtype=self.dtype,
                   name="branch2a")(x, train)
        h = ConvBN(self.width, 3, s2, dtype=self.dtype, name="branch2b")(h, train)
        h = ConvBN(out_ch, 1, 1, padding=0, act=None, dtype=self.dtype,
                   name="branch2c")(h, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_ceil2(x)
            short = ConvBN(out_ch, 1, 1, padding=0, act=None, dtype=self.dtype,
                           name="short_conv")(short, train)
        else:
            short = ConvBN(out_ch, 1, self.stride, padding=0, act=None,
                           dtype=self.dtype, name="short")(x, train)
        return nn.relu(h + short)


_CFG = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}


class PResNet(nn.Module):
    depth: int = 50
    variant: str = "d"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        bottleneck = self.depth >= 50
        block_nums = _CFG[self.depth]

        if self.variant in ("c", "d"):
            h = ConvBN(32, 3, 2, dtype=self.dtype, name="conv1_1")(x, train)
            h = ConvBN(32, 3, 1, dtype=self.dtype, name="conv1_2")(h, train)
            h = ConvBN(64, 3, 1, dtype=self.dtype, name="conv1_3")(h, train)
        else:
            h = ConvBN(64, 7, 2, padding=3, dtype=self.dtype, name="conv1_1")(x, train)
        h = max_pool_same(h, 3, 2, 1)

        outs: Dict[str, jnp.ndarray] = {}
        ch_out_list = [64, 128, 256, 512]
        for i, (n, width) in enumerate(zip(block_nums, ch_out_list)):
            stage_num = i + 2
            for b in range(n):
                stride = 2 if b == 0 and stage_num != 2 else 1
                name = f"res{stage_num}_{b}"
                if bottleneck:
                    h = PBottleNeck(width, stride, shortcut=b != 0,
                                    variant=self.variant, dtype=self.dtype,
                                    name=name)(h, train)
                else:
                    h = PBasicBlock(width, stride, shortcut=b != 0,
                                    variant=self.variant, dtype=self.dtype,
                                    name=name)(h, train)
            outs[f"res{stage_num}"] = h
        return outs


def build(model_name: str, dtype: Any = jnp.bfloat16):
    depth = int(model_name.split("_")[1])
    if depth not in _CFG:
        raise NotImplementedError(f"There is not a PResNet config called {model_name}.")
    net = PResNet(depth=depth, variant="d", dtype=dtype)
    exp = 4 if depth >= 50 else 1
    channels = {f"res{i + 2}": c * exp for i, c in enumerate([64, 128, 256, 512])}
    return net, channels
