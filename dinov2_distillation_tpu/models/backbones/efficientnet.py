"""EfficientNet-B0..B4 student backbone (NHWC, flax).

The reference serves these via timm ``features_only`` (``timm_wrapper.py:
6-21``, ``models/backbones/timm.py:256-283``), mapping the last four feature
levels to res2..res5. Native equivalent: standard EfficientNet (MBConv with
squeeze-excitation on input-channel ratio 0.25, SiLU, BN eps 1e-3) with the
compound width/depth scaling of B0..B4; taps at the ends of stages 2/3/5/7
(strides 4/8/16/32), matching timm's feature_info for these models:

  b0: res2..res5 channels (24, 40, 112, 320)
  scaled by width_mult with divisor-8 rounding for b1..b4.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import batch_norm

# (expand, kernel, stride, out_ch, repeats) — EfficientNet-B0 stage table
_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)
_STAGE_TO_RES = {1: "res2", 2: "res3", 4: "res4", 6: "res5"}  # 0-based stage idx

# (width_mult, depth_mult) per variant
_SCALING = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
}


def _round_channels(ch: float, mult: float, divisor: int = 8) -> int:
    ch *= mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def _round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(r * mult))


class MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        use_res = self.stride == 1 and in_ch == self.out_ch
        h = x
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = batch_norm(train, name="expand_bn", epsilon=1e-3)(h)
            h = nn.silu(h)
        pad = self.kernel // 2
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    padding=[(pad, pad), (pad, pad)], feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(h)
        h = batch_norm(train, name="dw_bn", epsilon=1e-3)(h)
        h = nn.silu(h)
        # SE on input-channel ratio (timm: se_ratio * in_chs)
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(h.dtype)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        h = h * nn.sigmoid(s)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = batch_norm(train, name="project_bn", epsilon=1e-3)(h)
        return x + h if use_res else h


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        stem = _round_channels(32, self.width_mult)
        h = nn.Conv(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        h = batch_norm(train, name="stem_bn", epsilon=1e-3)(h)
        h = nn.silu(h)

        outs: Dict[str, jnp.ndarray] = {}
        for si, (expand, k, s, out, reps) in enumerate(_B0_STAGES):
            out_ch = _round_channels(out, self.width_mult)
            for b in range(_round_repeats(reps, self.depth_mult)):
                h = MBConv(out_ch, expand, k, s if b == 0 else 1,
                           dtype=self.dtype, name=f"stage{si}_block{b}")(h, train)
            res = _STAGE_TO_RES.get(si)
            if res:
                outs[res] = h
        return outs


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _SCALING:
        raise NotImplementedError(f"There is not an EfficientNet config called {model_name}.")
    wm, dm = _SCALING[model_name]
    net = EfficientNet(width_mult=wm, depth_mult=dm, dtype=dtype)
    channels = {res: _round_channels(_B0_STAGES[si][3], wm)
                for si, res in _STAGE_TO_RES.items()}
    return net, channels
