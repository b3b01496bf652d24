"""Activation helpers shared by XLA and Pallas paths."""

from __future__ import annotations

import jax.numpy as jnp


def erf_as(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf, |err| < 1.5e-7 (fp32 in/out).

    Used instead of lax.erf/erfc because (a) Pallas TPU has no erf lowering
    and (b) on the VPU the exp-based polynomial runs at copy bandwidth while
    erfc costs ~1.5x (measured: 1.86 vs 2.76 ms on a (256,257,1536) map).
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-form GELU (torch ``nn.GELU`` semantics) to ~1e-7, fp32 internally."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_as(xf * 0.7071067811865476))).astype(x.dtype)
