"""ResNet student backbone (NHWC, flax).

Capability parity with the reference's detectron2-lineage ResNet
(``models/backbones/resnet.py``): BasicStem (7x7 stride-2 conv + BN + ReLU +
3x3 stride-2 maxpool), then four stages of BasicBlock (depth < 50) or
BottleneckBlock (stride in the 3x3, ``stride_in_1x1=False`` — reference
:418), outputs res2..res5. Depth table reference :858-875:

  18: [2,2,2,2] basic, channels 64/128/256/512
  34: [3,4,6,3] basic
  50: [3,4,6,3] bottleneck, channels 256/512/1024/2048
  101: [3,4,23,3] bottleneck
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ConvBN, max_pool_same


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference resnet.py:334-399)."""

    out_channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = ConvBN(
                self.out_channels, kernel=1, stride=self.stride, padding=0,
                act=None, norm=self.norm, dtype=self.dtype, name="shortcut",
            )(x, train)
        h = ConvBN(self.out_channels, kernel=3, stride=self.stride,
                   norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        h = ConvBN(self.out_channels, kernel=3, act=None,
                   norm=self.norm, dtype=self.dtype, name="conv2")(h, train)
        return nn.relu(h + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 residual block (reference resnet.py:402-512)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = ConvBN(
                self.out_channels, kernel=1, stride=self.stride, padding=0,
                act=None, norm=self.norm, dtype=self.dtype, name="shortcut",
            )(x, train)
        h = ConvBN(self.bottleneck_channels, kernel=1, stride=1, padding=0,
                   norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        h = ConvBN(self.bottleneck_channels, kernel=3, stride=self.stride,
                   padding=self.dilation, norm=self.norm, dtype=self.dtype,
                   name="conv2")(h, train)
        h = ConvBN(self.out_channels, kernel=1, padding=0, act=None,
                   norm=self.norm, dtype=self.dtype, name="conv3")(h, train)
        return nn.relu(h + shortcut)


_DEPTH_TABLE = {
    18: ([2, 2, 2, 2], False),
    34: ([3, 4, 6, 3], False),
    50: ([3, 4, 6, 3], True),
    101: ([3, 4, 23, 3], True),
    152: ([3, 8, 36, 3], True),
}


class ResNet(nn.Module):
    """Detectron2-style ResNet trunk returning {res2..res5} NHWC maps.

    ``norm`` selects the normalization for every cell (reference
    ``get_norm``, resnet.py:198-224); ``freeze_at`` freezes the stem
    (>=1) and stages res2..res{freeze_at} (reference freeze machinery,
    resnet.py:697-719): frozen parts run their norms in inference mode and
    their outputs pass through ``stop_gradient``, and the trainer masks
    their parameters out of the optimizer update
    (``models.zoo.freeze_mask_fn`` -> ``optim.create_optimizer``) so
    decoupled weight decay cannot move them either. The reference's own
    wrapper config keeps both off (resnet_wrapper.py:62-74: norm='BN',
    freeze_at=0) — the parity default."""

    depth: int = 50
    norm: str = "BN"
    freeze_at: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        blocks_per_stage, bottleneck = _DEPTH_TABLE[self.depth]
        out_channels = [256, 512, 1024, 2048] if bottleneck else [64, 128, 256, 512]
        strides = [1, 2, 2, 2]

        # BasicStem (reference resnet.py:515-544)
        stem_frozen = self.freeze_at >= 1
        h = ConvBN(64, kernel=7, stride=2, padding=3, norm=self.norm,
                   dtype=self.dtype, name="stem")(x, train and not stem_frozen)
        if stem_frozen:
            h = jax.lax.stop_gradient(h)
        h = max_pool_same(h, 3, 2, 1)

        outs: Dict[str, jnp.ndarray] = {}
        for stage_idx, (n, oc, s) in enumerate(zip(blocks_per_stage, out_channels, strides)):
            frozen = self.freeze_at >= stage_idx + 2
            for b in range(n):
                stride = s if b == 0 else 1
                name = f"res{stage_idx + 2}_{b}"
                if bottleneck:
                    h = BottleneckBlock(oc, oc // 4, stride, norm=self.norm,
                                        dtype=self.dtype, name=name)(
                                            h, train and not frozen)
                else:
                    h = BasicBlock(oc, stride, norm=self.norm,
                                   dtype=self.dtype, name=name)(
                                       h, train and not frozen)
            if frozen:
                h = jax.lax.stop_gradient(h)
            outs[f"res{stage_idx + 2}"] = h
        return outs


def frozen_path_predicate(norm: str, freeze_at: int):
    """Path predicate for the optimizer freeze mask: True for params the
    reference's freeze machinery would exclude from training — everything
    in the stem / stages <= freeze_at, plus every norm cell when the norm
    itself is frozen (FrozenBN). Paths are relative to the backbone root
    (e.g. ('stem', 'bn', 'scale'))."""
    import re

    def frozen(path) -> bool:
        segs = [str(s) for s in path]
        if norm == "FrozenBN" and "bn" in segs:
            return True
        if not segs:
            return False
        if segs[0] == "stem":
            return freeze_at >= 1
        m = re.match(r"res(\d+)_\d+$", segs[0])
        if m:
            return freeze_at >= int(m.group(1))
        return False

    return frozen


def build(model_name: str, dtype: Any = jnp.bfloat16, *, norm: str = "BN",
          freeze_at: int = 0):
    depth = int(model_name.split("_")[1])
    if depth not in _DEPTH_TABLE:
        raise NotImplementedError(f"There is not a ResNet config called {model_name}.")
    net = ResNet(depth=depth, norm=norm, freeze_at=freeze_at, dtype=dtype)
    _, bottleneck = _DEPTH_TABLE[depth]
    chans = [256, 512, 1024, 2048] if bottleneck else [64, 128, 256, 512]
    channels = {f"res{i + 2}": c for i, c in enumerate(chans)}
    return net, channels
