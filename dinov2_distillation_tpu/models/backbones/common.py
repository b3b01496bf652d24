"""Shared building blocks for CNN student backbones (NHWC, flax).

The reference carries several near-duplicate Conv/Norm wrappers
(``models/backbones/resnet.py:236-289``, ``mobilenet_v2.py:11-289``,
``presnet.py:28-183``); here there is one. BatchNorm statistics live in the
``batch_stats`` collection; under a data-sharded global batch the moment
reduction is a cross-replica mean inserted by XLA, i.e. sync-BN semantics
(the reference used per-replica BN for non-timm students — SURVEY.md §2.6;
documented divergence, better-behaved at large DP).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

_BN_MOMENTUM = 0.9  # torch BatchNorm2d default momentum 0.1 -> flax momentum 0.9
_BN_EPS = 1e-5


def torch_padding(kernel: Union[int, Tuple[int, int]], padding: Union[int, Tuple[int, int]]):
    """Explicit symmetric padding matching torch's integer ``padding=`` arg."""
    if isinstance(padding, int):
        padding = (padding, padding)
    return [(padding[0], padding[0]), (padding[1], padding[1])]


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + optional activation — the ubiquitous
    CNN cell (e.g. reference stdc.py ``ConvX`` :8-24)."""

    features: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None  # None -> kernel//2
    groups: int = 1
    act: Optional[Callable] = nn.relu
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel, self.kernel)
        s = self.stride if isinstance(self.stride, tuple) else (self.stride, self.stride)
        pad = self.padding if self.padding is not None else k[0] // 2
        x = nn.Conv(
            self.features,
            kernel_size=k,
            strides=s,
            padding=torch_padding(k, pad),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS,
            dtype=self.dtype,  # stats still reduce in fp32 inside flax
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def batch_norm(train: bool, name: str = "bn", epsilon: float = _BN_EPS,
               momentum: float = _BN_MOMENTUM, dtype: Any = jnp.bfloat16) -> nn.BatchNorm:
    """BatchNorm cell. ``dtype`` is the compute/output dtype; flax computes
    the batch moments in fp32 regardless, and the running stats live in
    fp32 params — keeping the (B, H, W, C) activation traffic in bf16
    halves the HBM cost of every BN in the CNN students."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        dtype=dtype,
        name=name,
    )


def max_pool_same(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pool with torch-style integer padding (pads with -inf)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )


def avg_pool_torch(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Average pool matching torch ``AvgPool2d(count_include_pad=True)``:
    zero-padded and divided by the full window size."""
    return nn.avg_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        count_include_pad=True,
    )
