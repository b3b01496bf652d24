"""One RandAugment round as a single Pallas kernel — per-sample predicated.

The XLA batch engine (data/device_augment.py) applies each op once per batch
behind select masks: correct, but every mask term re-reads the full batch
from HBM (measured r3: warp 16.6 ms + point 15 ms per round at B=256, all
HBM-bound). Here one program per SAMPLE holds the (3, H, W) image in VMEM
and dispatches on its op scalar with ``pl.when`` — TPU grids execute
sequentially on the core, so predication skips the untaken ops' work
entirely (the op distribution is ~B/14 samples per op). Traffic per round
drops to one read + one write of the batch.

Covers ops 0-12 (identity, the five geometric warps, brightness, color,
contrast, sharpness, posterize, solarize, autocontrast). Equalize (13)
needs per-sample histograms and runs in the dedicated subset path
(device_augment._point_round / ops.equalize_kernel) — programs whose op is
13 pass through unchanged here.

Geometric ops arrive as precomputed per-row/column shift tables (B, H)/(B,
W) for the 3-pass x/y/x shear decomposition (device_augment._warp_pass_
params builds them; no transcendentals inside the kernel). Shifts execute
as the same two-stage masked slice sums as the XLA path — in VMEM the
"slices" are register moves, not HBM reads.

Storage is bf16 NCHW between rounds: every inter-round value is an integer
in [0, 255] (PIL quantizes after each op), which bf16 represents exactly;
in-kernel math is f32.

Reference behavior: torchvision RandAugment op set
(/root/reference/datasets/augmentations.py:53-59, num_ops=9, magnitude=9,
bilinear) as re-derived in data/augment.py / device_augment.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data import device_augment as _da

_F32 = jnp.float32


def _shift_w_vm(x, shift, maxs: int):
    """x (C, H, W) f32, shift (H, 1) f32: out[:, y, j] = x[:, y, j + s[y]]
    (bilinear, zero fill, |s| <= maxs). Two-stage masked slice sum."""
    c, h, w = x.shape
    r_n, q_n = _da._two_stage_sizes(maxs)
    s = jnp.clip(shift, -float(maxs), float(maxs))
    n = jnp.floor(s)
    f = (s - n)[None]                                   # (1, H, 1)
    k = (n + maxs).astype(jnp.int32)
    q = (k // r_n)[None]
    r = (k % r_n)[None]
    pad = jnp.pad(x, ((0, 0), (0, 0), (maxs, q_n * r_n - maxs)))
    w1 = w + (q_n - 1) * r_n
    t = jnp.zeros((c, h, w1), _F32)
    for rv in range(r_n):
        m = (r == rv).astype(_F32)
        t += (m * (1.0 - f)) * pad[:, :, rv:rv + w1] \
            + (m * f) * pad[:, :, rv + 1:rv + 1 + w1]
    out = jnp.zeros((c, h, w), _F32)
    for qv in range(q_n):
        mq = (q == qv).astype(_F32)
        out += mq * t[:, :, qv * r_n:qv * r_n + w]
    return out


def _shift_h_vm(x, shift, maxs: int):
    """x (C, H, W) f32, shift (1, W) f32: out[:, y, j] = x[:, y + s[j], j]."""
    c, h, w = x.shape
    r_n, q_n = _da._two_stage_sizes(maxs)
    s = jnp.clip(shift, -float(maxs), float(maxs))
    n = jnp.floor(s)
    f = (s - n)[None]                                   # (1, 1, W)
    k = (n + maxs).astype(jnp.int32)
    q = (k // r_n)[None]
    r = (k % r_n)[None]
    pad = jnp.pad(x, ((0, 0), (maxs, q_n * r_n - maxs), (0, 0)))
    h1 = h + (q_n - 1) * r_n
    t = jnp.zeros((c, h1, w), _F32)
    for rv in range(r_n):
        m = (r == rv).astype(_F32)
        t += (m * (1.0 - f)) * pad[:, rv:rv + h1] \
            + (m * f) * pad[:, rv + 1:rv + 1 + h1]
    out = jnp.zeros((c, h, w), _F32)
    for qv in range(q_n):
        mq = (q == qv).astype(_F32)
        out += mq * t[:, qv * r_n:qv * r_n + h]
    return out


def _round_kernel(op_ref, mag_ref, sa_ref, sb_ref, sc_ref, img_ref, out_ref,
                  *, maxs: int):
    i = pl.program_id(0)
    op = op_ref[i, 0]
    mag = mag_ref[i, 0]
    x = img_ref[0].astype(_F32)                         # (3, H, W)
    _, h, w = x.shape

    def store(v):
        out_ref[0] = jnp.round(jnp.clip(v, 0.0, 255.0)).astype(out_ref.dtype)

    # default: identity (ops 0 and 13 pass through)
    out_ref[0] = img_ref[0]

    @pl.when((op >= _da._SHEAR_X) & (op <= _da._ROTATE))
    def _geo():
        y = _shift_w_vm(x, sa_ref[0][:, None], maxs)
        y = _shift_h_vm(y, sb_ref[0][None, :], maxs)
        y = _shift_w_vm(y, sc_ref[0][:, None], maxs)
        store(y)

    @pl.when(op == _da._BRIGHT)
    def _bright():
        store((1.0 + mag) * x)

    gray = 0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2]   # (H, W)

    @pl.when(op == _da._COLOR)
    def _color():
        store(gray[None] + (1.0 + mag) * (x - gray[None]))

    @pl.when(op == _da._CONTRAST)
    def _contrast():
        mean = jnp.round(jnp.sum(jnp.round(gray)) * (1.0 / (h * w)))
        store(mean + (1.0 + mag) * (x - mean))

    @pl.when(op == _da._SHARP)
    def _sharp():
        p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        acc = 5.0 * x
        for dy, dx in ((0, 0), (0, 1), (0, 2), (1, 0), (1, 2),
                       (2, 0), (2, 1), (2, 2)):
            acc += p[:, dy:dy + h, dx:dx + w]
        blur = acc * (1.0 / 13.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        interior = ((rows > 0) & (rows < h - 1) & (cols > 0)
                    & (cols < w - 1))[None]
        sm = jnp.where(interior, blur, x)
        store(sm + (1.0 + mag) * (x - sm))

    @pl.when(op == _da._POSTER)
    def _poster():
        bits = jnp.clip(mag.astype(jnp.int32), 1, 8)
        mask = (0xFF << (8 - bits)) & 0xFF
        store((x.astype(jnp.int32) & mask).astype(_F32))

    @pl.when(op == _da._SOLAR)
    def _solar():
        store(jnp.where(x >= jnp.floor(mag), 255.0 - x, x))

    @pl.when(op == _da._AUTOC)
    def _autoc():
        lo = jnp.min(x, axis=(1, 2), keepdims=True)
        hi = jnp.max(x, axis=(1, 2), keepdims=True)
        sc = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
        off = jnp.where(hi > lo, -lo * sc, 0.0)
        store(x * sc + off)


@functools.partial(jax.jit, static_argnames=("maxs", "interpret"))
def randaugment_round(imgs: jnp.ndarray, op_idx: jnp.ndarray,
                      mag: jnp.ndarray, shifts: Tuple[jnp.ndarray, ...],
                      *, maxs: int, interpret: bool = False) -> jnp.ndarray:
    """imgs (B, 3, H, W) bf16 integer-valued; one RandAugment round for ops
    0-12 (equalize handled by the caller's subset path). ``shifts`` =
    (sa (B,H), sb (B,W), sc (B,H)) f32 pass tables."""
    b, c, h, w = imgs.shape
    sa, sb, sc = shifts
    grid = (b,)
    out = pl.pallas_call(
        functools.partial(_round_kernel, maxs=maxs),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # op
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # mag
            pl.BlockSpec((1, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(op_idx.astype(jnp.int32).reshape(b, 1),
      mag.astype(_F32).reshape(b, 1), sa, sb, sc, imgs)
    return out
