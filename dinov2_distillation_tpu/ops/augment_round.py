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


def _round_kernel(op_ref, par_ref, img_ref, out_ref, scratch_ref, f32_ref,
                  *, maxs: int, branches: tuple):
    i = pl.program_id(0)
    op = op_ref[i, 0]
    mag = par_ref[i, 0]
    _, h, w = img_ref.shape[1:]

    def load():
        return img_ref[0].astype(_F32)                  # (3, H, W)

    def store(v):
        scratch_ref[...] = jnp.round(
            jnp.clip(v, 0.0, 255.0)).astype(scratch_ref.dtype)

    def gray_of(x):
        return 0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2]

    # branches write a VMEM scratch; ONE unconditional final store keeps the
    # output DMA's time/location static so Mosaic can pipeline it across
    # grid steps (branch-dependent out_ref stores measured ~8 us/program
    # slower than a copy kernel)
    scratch_ref[...] = img_ref[0]

    if "geo" in branches:
        # Per-PASS predication (r4): the x/y/x shear decomposition is an
        # exact identity pass for every geometric op except its own axis
        # (only rotation uses all three), and a zero-shift pass is
        # bit-exact identity (f=0 selects one slice with weight 1.0) — so
        # skipping it is free parity-wise and saves ~53% of the warp work
        # (shear/translate run 1 pass instead of 3). Inter-pass values ride
        # an f32 scratch: NO intermediate rounding, matching the XLA
        # engine's unrounded 3-pass chain bit-for-bit.
        geo = (op >= _da._SHEAR_X) & (op <= _da._ROTATE)
        pass_a = (op == _da._SHEAR_X) | (op == _da._TRANS_X) | (op == _da._ROTATE)
        pass_b = (op == _da._SHEAR_Y) | (op == _da._TRANS_Y) | (op == _da._ROTATE)
        pass_c = op == _da._ROTATE
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(_F32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(_F32)

        @pl.when(geo)
        def _geo_init():
            f32_ref[...] = load()

        @pl.when(pass_a)
        def _pass_a():
            sa = par_ref[i, 1] * rows + par_ref[i, 2]
            f32_ref[...] = _shift_w_vm(f32_ref[...], sa, maxs)

        @pl.when(pass_b)
        def _pass_b():
            sb = par_ref[i, 3] * cols + par_ref[i, 4]
            f32_ref[...] = _shift_h_vm(f32_ref[...], sb, maxs)

        @pl.when(pass_c)
        def _pass_c():
            sc = par_ref[i, 5] * rows + par_ref[i, 6]
            f32_ref[...] = _shift_w_vm(f32_ref[...], sc, maxs)

        @pl.when(geo)
        def _geo_store():
            store(f32_ref[...])

    if "bright" in branches:
        @pl.when(op == _da._BRIGHT)
        def _bright():
            store((1.0 + mag) * load())

    if "color" in branches:
        @pl.when(op == _da._COLOR)
        def _color():
            x = load()
            gray = gray_of(x)
            store(gray[None] + (1.0 + mag) * (x - gray[None]))

    if "contrast" in branches:
        @pl.when(op == _da._CONTRAST)
        def _contrast():
            x = load()
            gray = gray_of(x)
            mean = jnp.round(jnp.sum(jnp.round(gray)) * (1.0 / (h * w)))
            store(mean + (1.0 + mag) * (x - mean))

    if "sharp" in branches:
        @pl.when(op == _da._SHARP)
        def _sharp():
            x = load()
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

    if "poster" in branches:
        @pl.when(op == _da._POSTER)
        def _poster():
            # select-chain instead of a dynamic-amount shift (Mosaic-safe)
            bits = jnp.clip(mag.astype(jnp.int32), 1, 8)
            mask = jnp.int32(128)
            for k, mv in enumerate((192, 224, 240, 248, 252, 254, 255)):
                mask = jnp.where(bits == k + 2, mv, mask)
            store((load().astype(jnp.int32) & mask).astype(_F32))

    if "solar" in branches:
        @pl.when(op == _da._SOLAR)
        def _solar():
            x = load()
            store(jnp.where(x >= jnp.floor(mag), 255.0 - x, x))

    if "autoc" in branches:
        @pl.when(op == _da._AUTOC)
        def _autoc():
            # per-channel scalar reductions + slice stores: the (3,1,1)
            # keepdims layout of a multi-axis reduce aborts the remote
            # Mosaic compiler (bisected r3)
            for cc in range(3):
                xc = img_ref[0, cc].astype(_F32)
                lo = jnp.min(xc)
                hi = jnp.max(xc)
                sc = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
                off = jnp.where(hi > lo, -lo * sc, 0.0)
                scratch_ref[cc] = jnp.round(
                    jnp.clip(xc * sc + off, 0.0, 255.0)
                ).astype(scratch_ref.dtype)

    out_ref[0] = scratch_ref[...]


_ALL_BRANCHES = ("geo", "bright", "color", "contrast", "sharp", "poster",
                 "solar", "autoc")


@functools.partial(jax.jit,
                   static_argnames=("maxs", "interpret", "branches"))
def randaugment_round(imgs: jnp.ndarray, op_idx: jnp.ndarray,
                      mag: jnp.ndarray, shifts: Tuple[jnp.ndarray, ...],
                      *, maxs: int, interpret: bool = False,
                      branches: tuple = _ALL_BRANCHES) -> jnp.ndarray:
    """imgs (B, 3, H, W) bf16 integer-valued; one RandAugment round for ops
    0-12 (equalize handled by the caller's subset path). ``shifts`` =
    ((coef_a, off_a), (coef_b, off_b), (coef_c, off_c)) per-sample scalars
    of the three shift passes (shift = coef * index + off)."""
    b, c, h, w = imgs.shape
    (ca, oa), (cb, ob), (cc_, oc) = shifts
    params = jnp.stack(
        [mag.astype(_F32), ca, oa, cb, ob, cc_, oc], axis=1)      # (B, 7)
    out = pl.pallas_call(
        functools.partial(_round_kernel, maxs=maxs, branches=branches),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # op
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), imgs.dtype),
        scratch_shapes=[pltpu.VMEM((c, h, w), imgs.dtype),
                        pltpu.VMEM((c, h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(op_idx.astype(jnp.int32).reshape(b, 1), params.astype(_F32), imgs)
    return out
