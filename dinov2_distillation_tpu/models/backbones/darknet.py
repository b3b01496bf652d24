"""YOLOv8 DarkNet (CSP) student backbone (NHWC, flax).

Capability parity with the reference ``models/backbones/darknet.py``: five
stride-2 stages p1..p5; p2..p5 each follow their downsampling Conv with a
C2f CSP block (split -> n bottlenecks appending to the concat list -> 1x1
fuse). Conv cell = conv(bias=False) + BN(eps 1e-3, momentum 0.03) + SiLU
(reference :44-68). Outputs res2..res5 = p2..p5.

Variants (reference darknet_wrapper.py:8-14): n/s/m/l/x with
(depths, widths) as listed there; channels {res2: w2, res3: w3, res4: w4,
res5: w5}.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import batch_norm


class ConvSiLU(nn.Module):
    """Conv + BN(1e-3, 0.03) + SiLU (reference darknet.py:44-68)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, name="bn", epsilon=1e-3, momentum=0.97)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """3x3 + 3x3 with optional residual (reference :71-84)."""

    channels: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = ConvSiLU(self.channels, 3, dtype=self.dtype, name="cv1")(x, train)
        h = ConvSiLU(self.channels, 3, dtype=self.dtype, name="cv2")(h, train)
        return x + h if self.shortcut and x.shape[-1] == self.channels else h


class C2f(nn.Module):
    """CSP bottleneck: 1x1 -> chunk(2) -> n bottlenecks appended -> 1x1 fuse
    (reference :87-111)."""

    channels: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.channels // 2
        h = ConvSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [h[..., :c], h[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                 name=f"m_{i}")(ys[-1], train))
        return ConvSiLU(self.channels, 1, dtype=self.dtype,
                        name="cv2")(jnp.concatenate(ys, axis=-1), train)


class DarkNet(nn.Module):
    depths: Sequence[int] = (1, 2, 2, 1)
    widths: Sequence[int] = (3, 16, 32, 64, 128, 256)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        w, d = self.widths, self.depths
        h = ConvSiLU(w[1], 3, 2, dtype=self.dtype, name="p1_conv")(x, train)
        outs: Dict[str, jnp.ndarray] = {}
        for stage in range(4):  # p2..p5
            h = ConvSiLU(w[stage + 2], 3, 2, dtype=self.dtype,
                         name=f"p{stage + 2}_conv")(h, train)
            h = C2f(w[stage + 2], n=d[stage], shortcut=True, dtype=self.dtype,
                    name=f"p{stage + 2}_c2f")(h, train)
            outs[f"res{stage + 2}"] = h
        return outs


_VARIANTS = {
    "darknet_n": ((1, 2, 2, 1), (3, 16, 32, 64, 128, 256)),
    "darknet_s": ((1, 2, 2, 1), (3, 32, 64, 128, 256, 512)),
    "darknet_m": ((2, 4, 4, 2), (3, 48, 96, 192, 384, 576)),
    "darknet_l": ((3, 6, 6, 3), (3, 64, 128, 256, 512, 512)),
    "darknet_x": ((3, 6, 6, 3), (3, 80, 160, 320, 640, 640)),
}


def build(model_name: str, dtype: Any = jnp.bfloat16):
    if model_name not in _VARIANTS:
        raise NotImplementedError(f"There is not a DarkNet config called {model_name}.")
    depths, widths = _VARIANTS[model_name]
    net = DarkNet(depths=depths, widths=widths, dtype=dtype)
    channels = {f"res{i + 2}": widths[i + 2] for i in range(4)}
    return net, channels
