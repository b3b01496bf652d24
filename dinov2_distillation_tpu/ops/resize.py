"""Spatial resize ops with torch-``F.interpolate`` parity semantics.

The keystone contract of the model zoo is bilinear-resizing every student
feature level to the teacher's patch grid with ``align_corners=False``
(reference ``models/model_zoo.py:116-129``), and the teacher interpolates its
positional embeddings bicubically. ``jax.image.resize`` with
``antialias=False`` uses half-pixel sampling, which is exactly torch's
``align_corners=False`` behavior for both methods (torch's default
``antialias=False`` as well).

Implemented as gather-free matmuls when profitable: XLA lowers
``jax.image.resize`` to dense dot products over the interpolation weights,
which maps straight onto the MXU for NHWC maps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_nhwc(
    x: jnp.ndarray,
    size: Tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    """Resize (B, H, W, C) -> (B, size[0], size[1], C).

    Matches ``torch.nn.functional.interpolate(..., mode=method,
    align_corners=False, antialias=False)`` on the equivalent NCHW tensor.
    """
    b, _, _, c = x.shape
    out_shape = (b, size[0], size[1], c)
    if x.shape == out_shape:
        return x
    orig_dtype = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method=method, antialias=False)
    return y.astype(orig_dtype)


def _torch_bicubic_matrix(in_size: int, out_size: int, scale: float) -> "np.ndarray":
    """Row-stochastic-ish (out, in) interpolation matrix reproducing torch's
    ``upsample_bicubic2d`` with ``align_corners=False`` and an *explicit*
    coordinate scale (``src = scale * (dst + 0.5) - 0.5``).

    torch's cubic convolution kernel (A = -0.75), access indices clamped to
    the border (weights accumulate on edge samples, no renormalization) —
    bitwise-matching ATen's ``cubic_interp1d`` path to fp32 rounding.
    """
    import numpy as np

    A = -0.75

    def cubic(x: float) -> float:
        x = abs(x)
        if x <= 1.0:
            return (A + 2.0) * x ** 3 - (A + 3.0) * x ** 2 + 1.0
        if x < 2.0:
            return A * x ** 3 - 5.0 * A * x ** 2 + 8.0 * A * x - 4.0 * A
        return 0.0

    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = scale * (i + 0.5) - 0.5
        base = int(np.floor(src))
        t = src - base
        for off in (-1, 0, 1, 2):
            idx = min(max(base + off, 0), in_size - 1)
            W[i, idx] += cubic(t - off)
    return W.astype(np.float32)


def interpolate_pos_embed(
    pos: jnp.ndarray,
    grid_hw: Tuple[int, int],
    interpolate_offset: float = 0.1,
) -> jnp.ndarray:
    """Bicubically resample ViT patch pos-embeds to a new grid, reproducing
    the DINOv2 hub's ``interpolate_pos_encoding`` exactly.

    ``pos`` is (1, Hp*Wp, D) for a square source grid M x M; returns
    (1, grid_hw[0]*grid_hw[1], D). The hub (reached via
    ``models/backbones/dinov2.py:20``) resizes with
    ``F.interpolate(..., mode='bicubic', antialias=False,
    scale_factor=((h0+0.1)/M, (w0+0.1)/M))`` — the 0.1 ``interpolate_offset``
    shifts the half-pixel coordinate mapping slightly off ``M/h0``, so a
    plain resize-to-size differs from the teacher the reference trained
    against. Implemented as two static matmul contractions (MXU-friendly;
    the weight matrices are trace-time numpy constants).
    """
    n = pos.shape[1]
    src = int(round(n ** 0.5))
    assert src * src == n, f"pos embed grid is not square: {n}"
    h, w = grid_hw
    if (h, w) == (src, src):
        # hub fast path: returns pos_embed untouched for the pretrain grid
        return pos
    d = pos.shape[-1]
    p = pos.astype(jnp.float32).reshape(src, src, d)
    if interpolate_offset:
        # torch derives the coordinate scale from the *given* scale_factor,
        # not out/in: src = (dst + 0.5) * M/(g + offset) - 0.5
        scale_h = src / (h + interpolate_offset)
        scale_w = src / (w + interpolate_offset)
    else:
        scale_h = src / h
        scale_w = src / w
    wh = jnp.asarray(_torch_bicubic_matrix(src, h, scale_h))
    ww = jnp.asarray(_torch_bicubic_matrix(src, w, scale_w))
    p = jnp.einsum("hy,yxd->hxd", wh, p)
    p = jnp.einsum("wx,hxd->hwd", ww, p)
    return p.reshape(1, h * w, d).astype(pos.dtype)
