"""MobileNetV2 student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/mobilenet_v2.py``
(an mmdet-lineage D2MobileNetV2): 3x3 stride-2 stem conv, then the 7-layer
arch_settings table of InvertedResidual blocks with per-layer stride/dilation
overrides for the output-stride variants
(``mobilenet_v2_wrapper.py:7-20``):

  mobilenet_v2       strides (1,2,2,2,1,2,1), dilations all 1
  mobilenet_v2_os8   strides (1,2,2,1,1,1,1), dilations (1,1,1,2,2,4,4)
  mobilenet_v2_os16  strides (1,2,2,2,1,1,1), dilations (1,1,1,1,1,2,2)

Feature taps (reference :448-453): layer2->res2, layer3->res3, layer5->res4,
layer7->res5; channels {24, 32, 96, 320}.

Preserved quirk: the reference's Conv2d wrapper applies ReLU6 after *every*
conv, including the 1x1 projection (no linear bottleneck —
``mobilenet_v2.py:337-371`` passes ``activation`` to all three convs).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import batch_norm

# (expand_ratio, channel, num_blocks) per layer (reference :396-404)
ARCH_SETTINGS = (
    (1, 16, 1),
    (6, 24, 2),
    (6, 32, 3),
    (6, 64, 4),
    (6, 96, 3),
    (6, 160, 3),
    (6, 320, 1),
)

_LAYER_TO_RES = {2: "res2", 3: "res3", 5: "res4", 7: "res5"}


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBNAct6(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = self.dilation if self.kernel == 3 else 0
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = batch_norm(train, name="bn")(x)
        return _relu6(x)


class InvertedResidual(nn.Module):
    """expand 1x1 -> dw 3x3(stride, dilation) -> project 1x1, residual when
    stride 1 and channels match (reference :292-371)."""

    out_channels: int
    stride: int
    expand_ratio: int
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.out_channels
        h = x
        if self.expand_ratio != 1:
            h = _ConvBNAct6(hidden, kernel=1, dtype=self.dtype, name="expand")(h, train)
        h = _ConvBNAct6(hidden, kernel=3, stride=self.stride, dilation=self.dilation,
                        groups=hidden, dtype=self.dtype, name="dw")(h, train)
        h = _ConvBNAct6(self.out_channels, kernel=1, dtype=self.dtype, name="project")(h, train)
        return x + h if use_res else h


class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        wf = self.widen_factor
        h = _ConvBNAct6(int(32 * wf), kernel=3, stride=2, dilation=1,
                        dtype=self.dtype, name="conv1")(x, train)
        # note: the stem's padding is 1 (not dilation-dependent); kernel=3
        outs: Dict[str, jnp.ndarray] = {}
        for i, (expand, channel, num_blocks) in enumerate(ARCH_SETTINGS):
            out_ch = int(channel * wf)
            for b in range(num_blocks):
                h = InvertedResidual(
                    out_ch,
                    stride=self.strides[i] if b == 0 else 1,
                    expand_ratio=expand,
                    dilation=self.dilations[i] if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{b}",
                )(h, train)
            res = _LAYER_TO_RES.get(i + 1)
            if res:
                outs[res] = h
        return outs


_VARIANTS = {
    "mobilenet_v2": {"strides": (1, 2, 2, 2, 1, 2, 1), "dilations": (1, 1, 1, 1, 1, 1, 1)},
    "mobilenet_v2_os8": {"strides": (1, 2, 2, 1, 1, 1, 1), "dilations": (1, 1, 1, 2, 2, 4, 4)},
    "mobilenet_v2_os16": {"strides": (1, 2, 2, 2, 1, 1, 1), "dilations": (1, 1, 1, 1, 1, 2, 2)},
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not a MobileNet config called {model_name}.")
    v = _VARIANTS[model_name]
    net = MobileNetV2(strides=v["strides"], dilations=v["dilations"], dtype=dtype)
    channels = {"res2": 24, "res3": 32, "res4": 96, "res5": 320}
    return net, channels
