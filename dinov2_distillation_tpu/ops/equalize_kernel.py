"""PIL ImageOps.equalize as a Pallas kernel over a gathered sample subset.

Two generations live here, selected by ``DKT_EQ_RADIX`` (default: radix):

* **Radix-16** (r5, ``_equalize_subset_radix``): pixels split into nibbles,
  each nibble one-hot into a (16, P) lane-major mask — 32 compares/pixel.
  The 256-bin histogram is ONE MXU matmul ``hist[hi,lo] = Σ_p mh·ml``;
  cumulative counts are strict-triangular (16,16) matmuls; the LUT apply is
  a (16,16)@(16,P) matmul + a 16-sublane multiply/reduce. Measured 8.4 µs
  per valid sample at 224px (16× the 256-bin kernel; ~7.7× net of the
  (K,3,H,W)↔(K,3,1,H·W) boundary reshapes).
* **256-bin** (r3, ``_equalize_subset_bins``): each program streams row
  chunks of one VMEM-resident (3, H, W) sample against the 256-bin iota
  twice (histogram + LUT apply), ~77M VPU ops per valid program.

Both replace the XLA formulation (device_augment._equalize_batch), which
broadcasts a (K, H, W, C, 256) compare through HBM (~10 ms/round at the r3
capacity); programs whose ``valid`` flag is 0 copy through unchanged.

Mosaic layout discipline (hard-won): the 256 bins live on the LEADING
(sub-lane-major) axis — ``(256, chunk, W)`` compares are plain broadcasts
of ``(1, chunk, W)`` pixel blocks against a ``(256, 1, 1)`` iota, with
single-axis reductions only. Minor-dim ``[..., None]`` reshapes and
multi-axis keepdims reductions abort the remote compiler. The exclusive
cumulative histogram runs as 8 doubling sub-lane shifts (Hillis-Steele)
— no scatter, no cumsum primitive.

Algorithm parity (PIL ImageOps.equalize via the single-image reference
``device_augment._equalize``, itself pinned against PIL):
  n[v]   = #pixels with value < v
  h_last = #pixels equal to the channel max
  step   = (total - h_last) // 255
  lut[v] = clip((step // 2 + n[v]) // step, 0, 255)   (identity if step == 0)
Integer divisions run as f32 divide + floor: all operands are exact f32
integers (< 2^18) and quotients sit >= 1/590 from the next integer, so
floor(f32-div) == integer div.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def equalize_one_sample(img_ref, out_ref, sample: int, chunk: int) -> None:
    """Equalize sample ``sample`` of an NCHW block: reads
    ``img_ref[sample]``, writes ``out_ref[sample]``. Shared by the subset
    kernel below and the grouped RandAugment round kernel."""
    c, h, w = img_ref.shape[1:]
    total = float(h * w)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (256, 1, 1), 0).astype(_F32)
    # Mosaic can't broadcast one operand along sublanes AND lanes in a
    # single op: pre-expand the bin iota along lanes first
    iota_w = iota3 + jnp.zeros((256, 1, w), _F32)        # (256, 1, W)
    for cc in range(c):
        pix = img_ref[sample, cc].astype(_F32)           # (H, W) ints

        def hist_body(j, acc):
            blk = img_ref[sample, cc, pl.ds(j * chunk, chunk), :] \
                .astype(_F32)[None]                      # (1, chunk, W)
            cmp = (blk == iota_w).astype(_F32)           # (256, chunk, W)
            return acc + jnp.sum(cmp, axis=1, keepdims=True)

        # rolled loop: the unrolled form kept every chunk temp live and
        # blew the 128M VMEM budget
        acc = jax.lax.fori_loop(0, h // chunk, hist_body,
                                jnp.zeros((256, 1, w), _F32))
        hist = jnp.sum(acc, axis=2, keepdims=True)       # (256, 1, 1)
        incl = hist
        for k in (1, 2, 4, 8, 16, 32, 64, 128):
            incl = incl + jnp.pad(incl, ((k, 0), (0, 0), (0, 0)))[:256]
        n = incl - hist                                  # exclusive cumsum
        maxv = jnp.max(pix)
        h_last = jnp.sum((pix == maxv).astype(_F32))
        step = jnp.floor((total - h_last) * (1.0 / 255.0))
        lut = jnp.floor((jnp.floor(step * 0.5) + n) /
                        jnp.maximum(step, 1.0))
        lut = jnp.where(step > 0.0, jnp.clip(lut, 0.0, 255.0), iota3)
        lut_w = lut + jnp.zeros((256, 1, w), _F32)       # (256, 1, W)

        def apply_body(j, carry):
            blk = img_ref[sample, cc, pl.ds(j * chunk, chunk), :] \
                .astype(_F32)[None]
            cmp = (blk == iota_w).astype(_F32)
            sel = jnp.sum(cmp * lut_w, axis=0)           # (chunk, W)
            out_ref[sample, cc, pl.ds(j * chunk, chunk), :] = \
                sel.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, h // chunk, apply_body, 0)


def _equalize_kernel(valid_ref, img_ref, out_ref, *, chunk: int):
    i = pl.program_id(0)
    out_ref[0] = img_ref[0]  # pass-through default

    @pl.when(valid_ref[i, 0] > 0)
    def _eq():
        equalize_one_sample(img_ref, out_ref, 0, chunk)


# ---------------------------------------------------------------------------
# Radix-16 formulation (round-5 rewrite of the O(256·pixels) passes above)
# ---------------------------------------------------------------------------
#
# Split every pixel v = 16*hi + lo into nibbles and one-hot each nibble into
# a (16, P) mask (P = H*W pixels on the LANE axis). Then
#   hist[hi, lo] = sum_p  mh[hi, p] * ml[lo, p]      -- ONE (16,P)x(P,16)
# MXU matmul replaces the 256-bin VPU compare/accumulate sweep, and the LUT
# apply collapses to
#   y[p] = sum_hi mh[hi, p] * (lut16x16 @ ml)[hi, p] -- one (16,16)@(16,P)
# matmul + a 16-sublane multiply/reduce. VPU work drops from ~5*256 element
# ops per pixel (compare+sum in the histogram, compare+mul+add in the apply)
# to ~4 nibble ops + 2 compares + ~32 mul/add -- ~20x fewer; the O(256*P)
# contractions ride the MXU at ~P/128 passes each. The cumulative-histogram /
# PIL step math is unchanged (same formulas as equalize_one_sample, on a
# (16,16) grid: n = V@hist@ones + hist@U with strict-triangular constants),
# so the LUT is bit-identical to the 256-bin path.
#
# Layout notes (Mosaic rules, see module docstring): the image block rides
# in as (1, C, 1, H*W) so each channel is a single (1, P) lane-major row;
# nibble masks are (16, P) -- bins on sublanes, every pixel on lanes.


def _strict_upper(n: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r < c).astype(_F32)


def _equalize_radix_kernel(valid_ref, img_ref, out_ref):
    i = pl.program_id(0)
    c, p = img_ref.shape[1], img_ref.shape[3]
    out_ref[0] = img_ref[0]  # pass-through default

    @pl.when(valid_ref[i, 0] > 0)
    def _eq():
        total = float(p)
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0).astype(_F32)
        # pre-expand the bin iota along lanes (single-op broadcast rule)
        iota_p = iota16 + jnp.zeros((16, p), _F32)
        upper = _strict_upper(16)            # U[a,b] = a < b
        lower = jnp.transpose(upper)         # V[a,b] = a > b
        ones16 = jnp.ones((16, 16), _F32)
        lin = (16.0 * jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
               + jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)).astype(_F32)
        for cc in range(c):
            pix = img_ref[0, cc].astype(_F32)          # (1, P)
            hi = jnp.floor(pix * (1.0 / 16.0))
            lo = pix - 16.0 * hi
            mh = (hi == iota_p).astype(_F32)           # (16, P)
            ml = (lo == iota_p).astype(_F32)           # (16, P)
            hist = jax.lax.dot_general(
                mh, ml, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)           # (16, 16) bin counts
            # exclusive cumulative count n[v] = #pixels < v, v = 16*hi+lo:
            # row-exclusive prefix (over hi) + lane-exclusive prefix (over lo).
            # HIGHEST precision: hist holds counts up to H*W (not bf16-exact),
            # and the MXU's default single-pass bf16 truncation of the f32
            # operand shifts n by up to ~200 -> 1-LSB LUT errors (measured
            # 3% of pixels on TPU; the mask/lut dots are exact as 0/1 and
            # <=255-valued operands are bf16-exact)
            hp = jax.lax.Precision.HIGHEST
            row_excl = jnp.dot(lower, jnp.dot(hist, ones16, precision=hp,
                                              preferred_element_type=_F32),
                               precision=hp, preferred_element_type=_F32)
            n = row_excl + jnp.dot(hist, upper, precision=hp,
                                   preferred_element_type=_F32)
            # h_last = count at the channel max = hist at the last nonzero bin
            lin_masked = jnp.where(hist > 0.0, lin, -1.0)
            idx_max = jnp.max(jnp.max(lin_masked, axis=1, keepdims=True))
            h_last = jnp.sum(jnp.sum(
                jnp.where(lin == idx_max, hist, 0.0), axis=1, keepdims=True))
            step = jnp.floor((total - h_last) * (1.0 / 255.0))
            lut = jnp.floor((jnp.floor(step * 0.5) + n) /
                            jnp.maximum(step, 1.0))
            lut = jnp.where(step > 0.0, jnp.clip(lut, 0.0, 255.0), lin)
            mapped = jnp.dot(lut, ml, preferred_element_type=_F32)  # (16, P)
            y = jnp.sum(mh * mapped, axis=0, keepdims=True)         # (1, P)
            out_ref[0, cc] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _equalize_subset_radix(imgs: jnp.ndarray, valid: jnp.ndarray,
                           *, interpret: bool) -> jnp.ndarray:
    k, c, h, w = imgs.shape
    flat = imgs.reshape(k, c, 1, h * w)
    out = pl.pallas_call(
        _equalize_radix_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 1, h * w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 1, h * w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, 1, h * w), imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            # programs touch disjoint blocks -> parallel semantics (measured
            # 2.10 vs 2.89 ms/call at k=52 against "arbitrary": Mosaic can
            # pipeline the block DMAs across grid steps)
            dimension_semantics=("parallel",),
            # two (16, P) f32 masks + the mapped product + compare temps:
            # ~16 MB at 224px; headroom for the scheduler's double buffers
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(valid.astype(jnp.int32).reshape(k, 1), flat)
    return out.reshape(k, c, h, w)


def equalize_subset(imgs: jnp.ndarray, valid: jnp.ndarray,
                    *, interpret: bool = False) -> jnp.ndarray:
    """imgs (K, 3, H, W) integer-valued bf16/f32; valid (K,) bool — equalize
    the valid rows, pass the rest through. ``DKT_EQ_RADIX=0`` selects the
    256-bin kernel. The env var is read here, outside the jitted cores, but
    the production call site traces this function inside the jitted augment
    pipeline — like the other DKT_* toggles it is resolved at trace time of
    the enclosing jit, so set it before the first step."""
    if os.environ.get("DKT_EQ_RADIX", "1") != "0":
        return _equalize_subset_radix(imgs, valid, interpret=interpret)
    return _equalize_subset_bins(imgs, valid, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _equalize_subset_bins(imgs: jnp.ndarray, valid: jnp.ndarray,
                          *, interpret: bool = False) -> jnp.ndarray:
    """256-bin per-sample kernel (the pre-radix path; see module docstring)."""
    k, c, h, w = imgs.shape
    # Rolled-loop chunk height: bigger chunks amortize the ~1.1 us/iter
    # fori overhead (r4 sweep at 224px, 18 valid samples: chunk 8 -> 279
    # us/sample, 56 -> 200, 112 -> 205 — the VPU compare bound); cap at 56
    # so per-iteration (256, chunk, W) temps stay ~6 MB.
    chunk = h
    for cand in range(min(h, 56), 7, -1):
        if h % cand == 0 and cand % 8 == 0:
            chunk = cand
            break
    out = pl.pallas_call(
        functools.partial(_equalize_kernel, chunk=chunk),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, h, w), imgs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # chunk-56 (256, chunk, W) f32 temps are ~20 MB; the default
            # scoped limit is 16 MB
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(valid.astype(jnp.int32).reshape(k, 1), imgs)
    return out
