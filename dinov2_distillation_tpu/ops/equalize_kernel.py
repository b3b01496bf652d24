"""PIL ImageOps.equalize as a Pallas kernel over a gathered sample subset.

The XLA formulation (device_augment._equalize_batch) broadcasts a
(K, H, W, C, 256) compare against the bin iota twice (histogram + LUT
apply) — measured ~10 ms per round at the r3 capacity (52) because the
broadcast materializes through HBM. Here each program holds one sample's
(3, H, W) in VMEM and streams row chunks against the 256 bins in-register:
one read + one write of the subset per round, ~77M VPU ops per valid
program (~B/14 of them; the rest copy through under the ``valid`` flag).

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


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_subset(imgs: jnp.ndarray, valid: jnp.ndarray,
                    *, interpret: bool = False) -> jnp.ndarray:
    """imgs (K, 3, H, W) integer-valued bf16/f32; valid (K,) bool — equalize
    the valid rows, pass the rest through."""
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
