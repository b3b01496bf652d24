"""Fused ScaleKD spatial/frequency loss — Pallas kernel pair (fwd + VJP).

Reference math (losses/scalekd.py:67-127): reshape student tokens onto the
teacher grid, optionally remove the spatial mean (the DCT-equivalent DC
removal, see ops/dct.py), L2-normalize both maps along channels, then
``MSELoss(reduction='sum')/B*alpha`` plus the mean channel cosine monitor.

The XLA lowering of that segment is a chain of HBM-bound elementwise and
reduction passes over the (2, B, N, D) projector pair (~8 ms of the r2 step
budget). Here one program per (branch, sample) reads its (N, D) student and
teacher tiles once in VMEM and emits two partial sums (sq-error, cosine);
the backward kernel recomputes the normalization locally and produces the
exact input gradient from two scalars per branch — no (2, B, N, D)
activation round-trips.

The cosine output is a monitor (not part of the training loss), but its
cotangent path is implemented anyway so the kernel is a faithful VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_NORM_EPS = 1e-12  # matches losses.scalekd._NORM_EPS


def loss_fusion_supported(n: int, d: int) -> bool:
    return n % 8 == 0 and d % 128 == 0


def _normalize(x, freq):
    """Mean-subtract (if freq) + channel L2-normalize; returns
    (normalized, centered, inv_norm)."""
    nn = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) * (1.0 / nn)
    u = jnp.where(freq > 0, x - mean, x)
    norm = jnp.sqrt(jnp.sum(u * u, axis=1, keepdims=True))
    inv = 1.0 / jnp.maximum(norm, _NORM_EPS)
    return u * inv, u, inv, norm


def _loss_fwd_kernel(flags_ref, s_ref, t_ref, out_ref, *, per_branch: int):
    p = pl.program_id(0)
    freq = flags_ref[p // per_branch, 0]
    s = s_ref[0].astype(_F32)                          # (N, D)
    t = t_ref[0].astype(_F32)
    sn, _, _, _ = _normalize(s, freq)
    tn, _, _, _ = _normalize(t, freq)
    sq = jnp.sum((sn - tn) ** 2)
    cos = jnp.sum(sn * tn)
    # (8, 128) store tile (TPU block minimum); sums replicated over sublanes,
    # the caller reads lanes 0/1 of row 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    out_ref[...] = jnp.where(lane == 0, sq, jnp.where(lane == 1, cos, 0.0))


def _loss_bwd_kernel(flags_ref, coef_ref, s_ref, t_ref, ds_ref,
                     *, per_branch: int):
    p = pl.program_id(0)
    br = p // per_branch
    freq = flags_ref[br, 0]
    c_sq = coef_ref[br, 0]
    c_cos = coef_ref[br, 1]
    s = s_ref[0].astype(_F32)
    t = t_ref[0].astype(_F32)
    nn = s.shape[0]
    sn, u, inv, norm = _normalize(s, freq)
    tn, _, _, _ = _normalize(t, freq)
    # d loss / d sn
    dsn = (2.0 * c_sq) * (sn - tn) + c_cos * tn
    # through y = u / max(||u||, eps): when ||u|| > eps the projection term
    # applies; below eps the max clamps and the map is linear
    proj = jnp.sum(sn * dsn, axis=1, keepdims=True)
    du = inv * (dsn - jnp.where(norm > _NORM_EPS, sn * proj, 0.0))
    # through the (freq) mean subtraction
    dmean = jnp.sum(du, axis=0, keepdims=True) * (1.0 / nn)
    ds = jnp.where(freq > 0, du - dmean, du)
    ds_ref[0] = ds.astype(ds_ref.dtype)


def _run_fwd(pair, tmap, flags, interpret):
    two, b, n, d = pair.shape
    out = pl.pallas_call(
        functools.partial(_loss_fwd_kernel, per_branch=b),
        grid=(two * b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, pb=b: (i % pb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((two * b, 8, 128), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(flags, pair.reshape(two * b, n, d), tmap)
    sums = out[:, 0, :2].reshape(two, b, 2).sum(axis=1)   # (2, [sq, cos])
    return sums


def _run_bwd(pair, tmap, flags, coef, interpret):
    two, b, n, d = pair.shape
    ds = pl.pallas_call(
        functools.partial(_loss_bwd_kernel, per_branch=b),
        grid=(two * b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, pb=b: (i % pb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((two * b, n, d), pair.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(flags, coef, pair.reshape(two * b, n, d), tmap)
    return ds.reshape(two, b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pair_loss_sums(pair: jnp.ndarray, tmap: jnp.ndarray,
                   freq_flags: Tuple[int, int] = (0, 1),
                   interpret: bool = False) -> jnp.ndarray:
    """pair (2, B, N, D) student branches; tmap (B, N, D) teacher tokens
    (no grad). Returns (2, 2) f32: [[sq_sum, cos_sum] per branch]. The
    caller scales: loss = sq_sum / B * alpha; similarity = cos_sum / (B*N).
    ``freq_flags[k]`` selects DC removal for branch k."""
    flags = jnp.asarray(freq_flags, jnp.int32).reshape(2, 1)
    return _run_fwd(pair, tmap, flags, interpret)


def _pls_fwd(pair, tmap, freq_flags, interpret):
    flags = jnp.asarray(freq_flags, jnp.int32).reshape(2, 1)
    return _run_fwd(pair, tmap, flags, interpret), (pair, tmap)


def _pls_bwd(freq_flags, interpret, res, g):
    pair, tmap = res
    flags = jnp.asarray(freq_flags, jnp.int32).reshape(2, 1)
    coef = g.astype(_F32)                               # (2, 2) cotangents
    ds = _run_bwd(pair, tmap, flags, coef, interpret)
    return ds, None


pair_loss_sums.defvjp(_pls_fwd, _pls_bwd)
