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


def interpolate_pos_embed(
    pos: jnp.ndarray, grid_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bicubically resample ViT patch pos-embeds to a new grid.

    ``pos`` is (1, Hp*Wp, D) for a square source grid; returns
    (1, grid_hw[0]*grid_hw[1], D). Mirrors DINOv2's
    ``interpolate_pos_encoding`` (bicubic, antialias=False), which the
    reference pulls in via torch.hub (``models/backbones/dinov2.py:20``).
    """
    n = pos.shape[1]
    src = int(round(n ** 0.5))
    assert src * src == n, f"pos embed grid is not square: {n}"
    h, w = grid_hw
    if (h, w) == (src, src):
        return pos
    d = pos.shape[-1]
    p = pos.reshape(1, src, src, d)
    p = jax.image.resize(
        p.astype(jnp.float32), (1, h, w, d), method="bicubic", antialias=False
    )
    return p.reshape(1, h * w, d).astype(pos.dtype)
