"""2-D DCT-II / inverse as static matmul bases.

The reference (``losses/scalekd.py:337-428``) rebuilds an FFT-derived pair of
frozen ``nn.Linear`` layers *on every loss call, on device*. On TPU that is
both a trace hazard and wasted HBM traffic; here the (tiny, e.g. 16x16) DCT
basis is computed once on host in float64, cached, and closed over as a
compile-time constant — XLA folds the two separable 1-D transforms into MXU
matmuls fused with the surrounding loss arithmetic.

Convention parity: ``dct_matrix(N)[k, n] = 2 * cos(pi * k * (2n+1) / (2N))``,
identical to the reference's ``_dct(..., norm=None)`` (and to
``scipy.fftpack.dct(type=2, norm=None)``); the inverse is the exact matrix
inverse so ``idct2(dct2(x)) == x`` (the reference's ``_idct`` contract).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dct_bases(n: int):
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    fwd = 2.0 * np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n))
    inv = np.linalg.inv(fwd)
    return fwd.astype(np.float32), inv.astype(np.float32)


def dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II basis, shape (n, n): ``y = M @ x``."""
    return _dct_bases(n)[0]


def idct_matrix(n: int) -> np.ndarray:
    """Exact inverse of :func:`dct_matrix`."""
    return _dct_bases(n)[1]


def dct2(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D DCT-II over the trailing (H, W) spatial dims of NHWC-like
    input laid out as (..., H, W). Computed in fp32 for stability."""
    h, w = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(dct_matrix(h))
    mw = jnp.asarray(dct_matrix(w))
    x = x.astype(jnp.float32)
    x = jnp.einsum("kh,...hw->...kw", mh, x)
    x = jnp.einsum("lw,...kw->...kl", mw, x)
    return x


def idct2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dct2`."""
    h, w = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(idct_matrix(h))
    mw = jnp.asarray(idct_matrix(w))
    x = x.astype(jnp.float32)
    x = jnp.einsum("kh,...hw->...kw", mh, x)
    x = jnp.einsum("lw,...kw->...kl", mw, x)
    return x


def remove_dc_2d(x: jnp.ndarray) -> jnp.ndarray:
    """DCT -> zero the DC coefficient -> inverse DCT (reference :111-118).

    Zeroing only ``[..., 0, 0]`` in DCT space and inverting is equivalent to
    subtracting the spatial mean scaled by the DC basis; we keep the explicit
    transform-domain form for bit-level parity with the reference pipeline.
    """
    f = dct2(x)
    f = f.at[..., 0, 0].set(0.0)
    return idct2(f)
