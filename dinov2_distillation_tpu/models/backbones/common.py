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
import jax
import jax.numpy as jnp

_BN_MOMENTUM = 0.9  # torch BatchNorm2d default momentum 0.1 -> flax momentum 0.9
_BN_EPS = 1e-5

# --- BN statistics scope ----------------------------------------------------
# The reference trains non-timm students with PER-REPLICA BatchNorm (each
# GPU normalizes its local batch; only timm students get SyncBN —
# models/backbones/timm.py:273-274). Under jit with a data-sharded batch,
# plain flax BatchNorm reduces moments over the GLOBAL batch (sync-BN).
# ``set_bn_groups(G)`` switches every subsequently *constructed* student BN
# to grouped moments over G equal batch slices — with G = the data-parallel
# degree and shard-aligned slicing this reproduces the reference's
# per-replica semantics exactly, deterministically, and (on real meshes)
# without any cross-device moment reduction. G=1 (default) is sync-BN.
# NOTE: this is build-time state — set it BEFORE constructing models, and
# never change it between traces of the same jitted function.
_BN_GROUPS = 1


def set_bn_groups(groups: int) -> None:
    global _BN_GROUPS
    _BN_GROUPS = max(1, int(groups))


def get_bn_groups() -> int:
    return _BN_GROUPS


class GroupedBatchNorm(nn.Module):
    """BatchNorm with moments computed per batch group (virtual replicas).

    Parameter/stat tree is identical to ``nn.BatchNorm`` (scale/bias params,
    mean/var batch_stats), so checkpoints are interchangeable between modes.
    Running stats are the group-mean of the per-group moments (torch DDP
    keeps independent per-replica EMAs and checkpoints rank 0's; averaging
    is the deterministic equivalent).
    """

    use_running_average: Optional[bool]
    groups: int = 1
    momentum: float = _BN_MOMENTUM
    epsilon: float = _BN_EPS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        # call-time override mirrors nn.BatchNorm (setup-style modules build
        # the cell before knowing `train`)
        if use_running_average is None:
            use_running_average = self.use_running_average
        if use_running_average is None:
            # mirror nn.BatchNorm: silently training (mutating running stats)
            # when the mode was never specified is a footgun, not a default
            raise ValueError(
                "GroupedBatchNorm: use_running_average must be set either at "
                "construction or at call time")
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            y = x.astype(self.dtype) * inv.astype(self.dtype) + (
                bias - mean * inv).astype(self.dtype)
            return y

        g = self.groups
        b = x.shape[0]
        assert b % g == 0, f"batch {b} not divisible by bn groups {g}"
        xg = x.reshape(g, b // g, *x.shape[1:]).astype(jnp.float32)
        red = tuple(range(1, xg.ndim - 1))  # (sub-batch, spatial...)
        gmean = jnp.mean(xg, axis=red)                       # (G, C)
        gvar = jnp.mean(jnp.square(xg), axis=red) - jnp.square(gmean)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * jnp.mean(gmean, 0)
            ra_var.value = m * ra_var.value + (1 - m) * jnp.mean(gvar, 0)
        shape = (g, 1) + (1,) * (xg.ndim - 3) + (-1,)
        inv = jax.lax.rsqrt(gvar + self.epsilon) * scale
        y = xg * inv.reshape(shape) + (bias - gmean * inv).reshape(shape)
        return y.reshape(x.shape).astype(self.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm frozen into a fixed affine transform (reference
    ``FrozenBatchNorm2d``, resnet.py:10-165; dup mobilenet_v2.py:11-289,
    presnet.py:28-183): statistics never update, scale/bias never receive
    gradients. The param/stat tree is IDENTICAL to ``nn.BatchNorm``
    (scale/bias params, mean/var batch_stats), so imported frozen-BN
    ``.pkl`` checkpoints land in the same slots and modes can be switched
    without re-keying. Gradient freezing uses ``stop_gradient``; the
    optimizer additionally masks these paths so decoupled weight decay
    cannot move them (``train/optim.create_optimizer(freeze_mask=...)``).
    """

    epsilon: float = _BN_EPS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        # mode argument accepted (cell-compatible with batch_norm) and
        # ignored: frozen BN always applies the stored statistics
        c = x.shape[-1]
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        return x.astype(self.dtype) * inv.astype(self.dtype) + (
            bias - mean.value * inv).astype(self.dtype)


def get_norm(norm: str, train: Optional[bool], name: str = "bn",
             dtype: Any = jnp.bfloat16):
    """Norm-cell factory by name (reference ``get_norm``,
    resnet.py:198-224): BN / SyncBN / FrozenBN / GN / LN; '' -> None.

    Under our jit-over-global-batch semantics plain BN already reduces
    moments globally, so 'SyncBN' and 'BN' coincide (per-replica statistics
    are the ``set_bn_groups`` axis instead — module docstring)."""
    if not norm:
        return None
    if norm in ("BN", "SyncBN", "naiveSyncBN"):
        return batch_norm(train, name=name, dtype=dtype)
    if norm == "FrozenBN":
        return FrozenBatchNorm(dtype=dtype, name=name)
    if norm == "GN":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype,
                            name=name)
    if norm in ("LN", "nnSyncBN"):
        if norm == "LN":
            # channel-last LayerNorm over C (reference LayerNorm,
            # resnet.py:168-195, channels_first there; NHWC here)
            return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)
        return batch_norm(train, name=name, dtype=dtype)
    raise KeyError(f"Unknown norm '{norm}' (expected BN/SyncBN/FrozenBN/GN/LN)")


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
    norm: str = "BN"  # get_norm name (reference Conv2d norm arg, resnet.py:236-289)
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
        cell = get_norm(self.norm, train, name="bn", dtype=self.dtype)
        if cell is not None:
            x = cell(x)
        if self.act is not None:
            x = self.act(x)
        return x


def batch_norm(train: Optional[bool], name: str = "bn", epsilon: float = _BN_EPS,
               momentum: float = _BN_MOMENTUM, dtype: Any = jnp.bfloat16):
    """BatchNorm cell. ``dtype`` is the compute/output dtype; flax computes
    the batch moments in fp32 regardless, and the running stats live in
    fp32 params — keeping the (B, H, W, C) activation traffic in bf16
    halves the HBM cost of every BN in the CNN students.

    Honors ``set_bn_groups``: G>1 returns the grouped (per-virtual-replica)
    variant with an identical param/stat tree. ``train=None`` defers the
    mode to a call-time ``use_running_average`` argument (setup-style
    callers that build the cell before knowing ``train``)."""
    ura = None if train is None else not train
    if _BN_GROUPS > 1:
        return GroupedBatchNorm(
            use_running_average=ura, groups=_BN_GROUPS,
            momentum=momentum, epsilon=epsilon, dtype=dtype, name=name)
    return nn.BatchNorm(
        use_running_average=ura,
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
