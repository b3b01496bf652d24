#!/usr/bin/env python
"""Stage-by-stage device-augmentation benchmark on the ambient backend.

Measures (batch B, staged SxS uint8 -> 224 crops):
  h2d        host->device transfer of the staged uint8 batch
  full       augment_batch (RRC + flip + 9 RandAugment rounds + erase draw)
  rrc        batched crop-resize einsums only
  warp       one _warp_round (3 shift passes)
  point      one _point_round (all point ops + subset equalize)
  equalize   _equalize_batch on the capacity subset alone

Timing discipline (CLAUDE.md): a device->host scalar fetch before AND after
each timed region; N enqueues per region, divide.
"""

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_distillation_tpu.utils.jax_setup import enable_compilation_cache


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., 0].astype(jnp.float32)))


def timed(fn, args, n=8, label=""):
    out = fn(*args)
    sync(out)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:10s} {dt * 1e3:8.2f} ms   (sink {s:.1f})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--staged", type=int, default=256)
    ap.add_argument("--num-ops", type=int, default=9)
    args = ap.parse_args()

    enable_compilation_cache()
    from dinov2_distillation_tpu.data import device_augment as da

    B, S = args.batch, args.staged
    print(f"backend={jax.default_backend()} B={B} staged={S}", flush=True)
    rng = np.random.default_rng(0)
    staged = rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8)

    # h2d
    x = jax.device_put(staged)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(4):
        x = jax.device_put(staged)
    sync(x)
    dt = (time.perf_counter() - t0) / 4
    gbs = staged.nbytes / dt / 1e9
    print(f"h2d        {dt * 1e3:8.2f} ms   ({gbs:.2f} GB/s)", flush=True)

    key = jax.random.PRNGKey(0)

    full = jax.jit(lambda im, k: da.augment_batch(
        im, k, num_ops=args.num_ops)["image"])
    timed(full, (x, key), n=4, label="full")

    imgs224 = jnp.asarray(
        rng.integers(0, 256, (B, 224, 224, 3)).astype(np.float32))
    op_idx = jnp.asarray(rng.integers(0, 14, (B,)), jnp.int32)
    mag = jnp.asarray(rng.uniform(-0.3, 0.3, (B,)), jnp.float32)
    maxs = da._max_shift(224, 9, 31)
    ecap = da._eq_capacity(B)

    rects = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.full((B,), S, jnp.int32), jnp.full((B,), S, jnp.int32))
    rrc = jax.jit(lambda im: da._batched_crop_resize(
        im.astype(jnp.float32), rects, 224))
    timed(rrc, (x,), label="rrc")

    warp = jax.jit(lambda im: da._warp_round(im, op_idx, mag, maxs))
    timed(warp, (imgs224,), label="warp")

    point = jax.jit(lambda im: da._point_round(im, op_idx, mag * 100, ecap)[0])
    timed(point, (imgs224,), label="point")

    eq = jax.jit(lambda im: da._equalize_batch(im[:ecap]))
    timed(eq, (imgs224,), label=f"equal({ecap})")

    onepass = jax.jit(lambda im: da._shift_pass(
        im, jnp.broadcast_to(mag[:, None] * 50, (B, 224)), maxs, 2))
    timed(onepass, (imgs224,), label="shift1")

    from dinov2_distillation_tpu.ops.augment_round import randaugment_round
    nchw = jnp.asarray(
        rng.integers(0, 256, (B, 3, 224, 224)).astype(np.float32),
        jnp.bfloat16)
    za = jnp.zeros((B,), jnp.float32)
    roundk = jax.jit(lambda im: randaugment_round(
        im, op_idx, mag, ((za, za), (za, za), (za, za)), maxs=maxs))
    timed(roundk, (nchw,), label="round_k")

    eqsub = jax.jit(lambda im: da._equalize_subset_nchw(im, op_idx, ecap)[0])
    timed(eqsub, (nchw,), label="eqsub")


if __name__ == "__main__":
    main()
# appended: quick kernel-vs-xla compare entry (used ad hoc)
