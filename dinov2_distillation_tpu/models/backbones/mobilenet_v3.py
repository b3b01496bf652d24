"""MobileNetV3 student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/mobilenet_v3.py``,
which subclasses *torchvision's* MobileNetV3 built from
``_mobilenet_v3_conf``: small/large inverted-residual tables with
squeeze-excitation, hardswish/relu activations, and the ``dilated`` variant
(dilation 2 in the last stage -> stride-8 output, strides {4,8,8,8} —
reference :50-53). Feature taps by features[] index (reference :31-48):

  small: [2]->res2 (24ch), [4]->res3 (40), [9]->res4 (96), [12]->res5 (576)
  large: [4]->res2 (40),  [7]->res3 (80), [13]->res4 (160), [16]->res5 (960)

where the last tap is the 1x1 "lastconv" (6x expansion).

``build_timm_style`` serves the reference's timm-wrapper names
(``mobilenetv3_{small_050,small_075,small_100,large_075,large_100}``,
``timm_wrapper.py:6-21``) as width-multiplied variants of the same trunk,
tapping the last four stride levels like timm ``features_only``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import batch_norm


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


@dataclasses.dataclass(frozen=True)
class BneckCfg:
    in_ch: int
    kernel: int
    expanded: int
    out_ch: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int

    def scaled(self, wm: float) -> "BneckCfg":
        return dataclasses.replace(
            self,
            in_ch=_make_divisible(self.in_ch * wm),
            expanded=_make_divisible(self.expanded * wm),
            out_ch=_make_divisible(self.out_ch * wm),
        )


def _conf(size: str, dilated: bool) -> Tuple[List[BneckCfg], int]:
    """torchvision ``_mobilenet_v3_conf`` tables; returns (blocks, last_ch)."""
    d = 2 if dilated else 1
    if size == "large":
        rows = [
            (16, 3, 16, 16, False, False, 1, 1),
            (16, 3, 64, 24, False, False, 2, 1),
            (24, 3, 72, 24, False, False, 1, 1),
            (24, 5, 72, 40, True, False, 2, 1),
            (40, 5, 120, 40, True, False, 1, 1),
            (40, 5, 120, 40, True, False, 1, 1),
            (40, 3, 240, 80, False, True, 2, 1),
            (80, 3, 200, 80, False, True, 1, 1),
            (80, 3, 184, 80, False, True, 1, 1),
            (80, 3, 184, 80, False, True, 1, 1),
            (80, 3, 480, 112, True, True, 1, 1),
            (112, 3, 672, 112, True, True, 1, 1),
            (112, 5, 672, 160, True, True, 2, d),
            (160, 5, 960, 160, True, True, 1, d),
            (160, 5, 960, 160, True, True, 1, d),
        ]
        last = 960
    else:
        rows = [
            (16, 3, 16, 16, True, False, 2, 1),
            (16, 3, 72, 24, False, False, 2, 1),
            (24, 3, 88, 24, False, False, 1, 1),
            (24, 5, 96, 40, True, True, 2, 1),
            (40, 5, 240, 40, True, True, 1, 1),
            (40, 5, 240, 40, True, True, 1, 1),
            (40, 5, 120, 48, True, True, 1, 1),
            (48, 5, 144, 48, True, True, 1, 1),
            (48, 5, 288, 96, True, True, 2, d),
            (96, 5, 576, 96, True, True, 1, d),
            (96, 5, 576, 96, True, True, 1, d),
        ]
        last = 576
    return [BneckCfg(*r) for r in rows], last


class SqueezeExcitation(nn.Module):
    """torchvision SE: avgpool -> fc(relu) -> fc(hardsigmoid) -> scale."""

    channels: int
    squeeze: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * _hardsigmoid(s)


class InvertedResidualV3(nn.Module):
    cfg: BneckCfg
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.cfg
        act = _hardswish if c.use_hs else nn.relu
        # torchvision: stride collapses to 1 when dilation > 1
        stride = 1 if c.dilation > 1 else c.stride
        use_res = stride == 1 and c.in_ch == c.out_ch
        h = x
        if c.expanded != c.in_ch:
            h = nn.Conv(c.expanded, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = batch_norm(train, name="expand_bn", epsilon=1e-3)(h)
            h = act(h)
        pad = (c.kernel // 2) * c.dilation
        h = nn.Conv(c.expanded, (c.kernel, c.kernel), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(c.dilation, c.dilation),
                    feature_group_count=c.expanded, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = batch_norm(train, name="dw_bn", epsilon=1e-3)(h)
        h = act(h)
        if c.use_se:
            h = SqueezeExcitation(c.expanded, _make_divisible(c.expanded // 4),
                                  dtype=self.dtype, name="se")(h)
        h = nn.Conv(c.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = batch_norm(train, name="project_bn", epsilon=1e-3)(h)  # linear bottleneck
        return x + h if use_res else h


class MobileNetV3(nn.Module):
    size: str = "small"
    dilated: bool = False
    width_mult: float = 1.0
    # feature taps: torchvision-index style ({idx: res}) or "timm" stage style
    tap_style: str = "torchvision"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        blocks, last = _conf(self.size, self.dilated)
        if self.width_mult != 1.0:
            blocks = [b.scaled(self.width_mult) for b in blocks]
            last = _make_divisible(last * self.width_mult)

        h = nn.Conv(blocks[0].in_ch, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = batch_norm(train, name="stem_bn", epsilon=1e-3)(h)
        h = _hardswish(h)

        taps = _taps(self.size)
        outs: Dict[str, jnp.ndarray] = {}
        for i, bc in enumerate(blocks):
            h = InvertedResidualV3(bc, dtype=self.dtype, name=f"block_{i}")(h, train)
            feat_idx = i + 1  # torchvision features[] index
            if feat_idx in taps:
                outs[taps[feat_idx]] = h
        # lastconv (features[-1]): 1x1 -> 6x, hardswish
        h = nn.Conv(last, (1, 1), use_bias=False, dtype=self.dtype,
                    name="lastconv")(h)
        h = batch_norm(train, name="lastconv_bn", epsilon=1e-3)(h)
        h = _hardswish(h)
        # res5 is the lastconv output (reference taps features[12]/[16])
        outs["res5"] = h
        return outs


def _taps(size: str) -> Dict[int, str]:
    # reference mobilenet_v3.py:31-48 (features[] indices)
    if size == "small":
        return {2: "res2", 4: "res3", 9: "res4", 12: "res5"}
    return {4: "res2", 7: "res3", 13: "res4", 16: "res5"}


def _channels(size: str, width_mult: float = 1.0) -> Dict[str, int]:
    blocks, last = _conf(size, False)
    if width_mult != 1.0:
        blocks = [b.scaled(width_mult) for b in blocks]
        last = _make_divisible(last * width_mult)
    taps = _taps(size)
    table = {}
    for feat_idx, res in taps.items():
        if feat_idx == len(blocks) + 1:
            table[res] = last
        else:
            table[res] = blocks[feat_idx - 1].out_ch
    table["res5"] = last
    return table


_VARIANTS = {
    "mobilenet_v3_small": {"size": "small", "dilated": False},
    "mobilenet_v3_large": {"size": "large", "dilated": False},
    "mobilenet_v3_small_os8": {"size": "small", "dilated": True},
    "mobilenet_v3_large_os8": {"size": "large", "dilated": True},
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not a MobileNetV3 config called {model_name}.")
    v = _VARIANTS[model_name]
    net = MobileNetV3(size=v["size"], dilated=v["dilated"], dtype=dtype)
    return net, _channels(v["size"])


_TIMM_VARIANTS = {
    "mobilenetv3_small_050": ("small", 0.50),
    "mobilenetv3_small_075": ("small", 0.75),
    "mobilenetv3_small_100": ("small", 1.0),
    "mobilenetv3_large_075": ("large", 0.75),
    "mobilenetv3_large_100": ("large", 1.0),
}


def build_timm_style(model_name: str, dtype: Any = jnp.bfloat16):
    """The reference routed these names through timm features_only
    (timm_wrapper.py); served here by the same native trunk with the timm
    width multiplier."""
    if model_name not in _TIMM_VARIANTS:
        raise NotImplementedError(f"There is not a timm mobilenetv3 called {model_name}.")
    size, wm = _TIMM_VARIANTS[model_name]
    net = MobileNetV3(size=size, width_mult=wm, dtype=dtype)
    return net, _channels(size, wm)
