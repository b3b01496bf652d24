#!/usr/bin/env python
"""Student-conv bound study: XLA conv vs im2col-ideal GEMM per stdc_2 shape.

VERDICT r4 weak #2 / next #3: the student conv path (~35 ms of the 146 ms
step at ~49 eff TFLOP/s) is the one large block without a demonstrated
machine bound. This measures, for every distinct conv shape in stdc_2 at
flagship geometry (B=256, 224px — reference models/backbones/stdc.py:27-172,
ConvX = conv+BN+ReLU), three timings on the real chip:

  conv_fwd   : XLA's convolution as the model runs it (NHWC, bf16)
  gemm_ideal : a bf16 GEMM with the conv's exact MXU work —
               M=B*Ho*Wo, K=kh*kw*Cin, N=Cout — i.e. the time an ideal
               im2col/direct kernel would take if patch extraction were free
  conv_bwd   : fwd+bwd of conv (dx+dw via jax.grad of sum)

Timing discipline (CLAUDE.md + r5 measurement): the tunnel round-trip for
a dispatch+scalar-fetch measured ~25 ms this session, so per-iteration
times come from DIFFERENTIAL timing of one-dispatch lax.scan chains:
t_iter = (T(iters) - T(1)) / (iters - 1), each T a median of reps. The
per-iteration weight bump must survive bf16 rounding (1 + i*1e-8 rounds
to exactly 1 in bf16 and lets XLA hoist the conv — the first run of this
script measured pure overhead that way); 0.004 steps are representable.

Output: one line per shape with eff TFLOP/s for each form + the ratio.
ratio ~1 => XLA conv is already at the im2col machine bound for that shape
(the remaining gap to peak is the MXU N/K pad tax, shown per shape).
"""

import argparse
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_distillation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

# (tag, Cin, Cout, k, stride, Hin, count_in_model) at 224px flagship.
# counts: how many times the shape occurs per fwd pass of stdc_2
# (stem + stage blocks as built in models/backbones/stdc.py).
SHAPES = [
    ("stem0", 3, 32, 3, 2, 224, 1),
    ("stem1", 32, 64, 3, 2, 112, 1),
    # res3 stage (out_planes 256, widths [128, 64, 32, 32])
    ("r3.b0.c0", 64, 128, 1, 1, 56, 1),
    ("r3.b0.c1", 128, 64, 3, 1, 28, 1),
    ("r3.c0", 256, 128, 1, 1, 28, 3),
    ("r3.c1", 128, 64, 3, 1, 28, 3),
    ("r3.c2", 64, 32, 3, 1, 28, 4),
    ("r3.c3", 32, 32, 3, 1, 28, 4),
    # res4 stage (out_planes 512, widths [256, 128, 64, 64])
    ("r4.b0.c0", 256, 256, 1, 1, 28, 1),
    ("r4.b0.c1", 256, 128, 3, 1, 14, 1),
    ("r4.c0", 512, 256, 1, 1, 14, 4),
    ("r4.c1", 256, 128, 3, 1, 14, 4),
    ("r4.c2", 128, 64, 3, 1, 14, 5),
    ("r4.c3", 64, 64, 3, 1, 14, 5),
    # res5 stage (out_planes 1024, widths [512, 256, 128, 128])
    ("r5.b0.c0", 512, 512, 1, 1, 14, 1),
    ("r5.b0.c1", 512, 256, 3, 1, 7, 1),
    ("r5.c0", 1024, 512, 1, 1, 7, 2),
    ("r5.c1", 512, 256, 3, 1, 7, 2),
    ("r5.c2", 256, 128, 3, 1, 7, 3),
    ("r5.c3", 128, 128, 3, 1, 7, 3),
]

# depthwise stride-2 'avd' convs (VPU-ish work, no GEMM equivalent):
# (tag, C, Hin, count)
DW_SHAPES = [
    ("r3.avd", 128, 56, 1),
    ("r4.avd", 256, 28, 1),
    ("r5.avd", 512, 14, 1),
]

PEAK = 197e12  # v5e bf16


def _median_total(fn, args, reps):
    float(fn(*args))  # warmup/compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


LO_ITERS = 200


def timed(fn, *args, iters, reps=5):
    """Differential per-iteration time: the ~25 ms (+/- 2-3 jitter)
    dispatch+fetch round-trip measured this session dwarfs sub-ms kernels,
    and a small iteration delta drowns in the jitter — so time the chain at
    `iters` (default 1000) and at LO_ITERS=200 and divide the difference by
    800: the delta is >= ~15 ms even for ~20 us kernels."""
    assert iters > LO_ITERS
    t_n = _median_total(fn, args[:-1] + (iters,), reps)
    t_1 = _median_total(fn, args[:-1] + (LO_ITERS,), reps)
    return max(t_n - t_1, 1e-9) / (iters - LO_ITERS)


def conv_chain(x, w, stride, bwd, groups, iters):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = "SAME" if w.shape[0] > 1 else "VALID"

    # perturb the (tiny) WEIGHT per iteration for the data dependence —
    # perturbing x would add a full activation-sized HBM pass per iteration
    def conv_w(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (stride, stride), pad, dimension_numbers=dn,
            feature_group_count=groups)

    if bwd:
        # sum(o**2): sum(conv) alone has a closed form (one input reduce +
        # a tiny dot) and a sliced output lets XLA narrow the conv window —
        # both were measured as "conv faster than peak" artifacts. The
        # square forces the full conv and gives the real bwd pair
        # (dx = conv_T(2o, w), dw = corr(x, 2o)).
        def loss(x_, w_):
            o = conv_w(x_, w_)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def body(c, i):
            wi = w * (1 + i * jnp.bfloat16(0.004))
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, wi)
            # full nonlinear consumption of BOTH grads — sliced consumption
            # let XLA narrow dx/dw to a 3-element window (measured "bwd
            # faster than fwd, 520 TF/s" artifacts)
            return (c + l + jnp.sum(gx.astype(jnp.float32) ** 2)
                    + jnp.sum(gw.astype(jnp.float32) ** 2)), None
    else:
        def body(c, i):
            wi = w * (1 + i * jnp.bfloat16(0.004))
            o = conv_w(x, wi)
            return c + jnp.sum(o.astype(jnp.float32) ** 2), None

    c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters, dtype=jnp.bfloat16))
    return c


def gemm_chain(a, b, iters):
    def body(c, i):
        bi = b * (1 + i * jnp.bfloat16(0.004))
        out = jax.lax.dot_general(a, bi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # consume the FULL output nonlinearly (see conv_chain note); cast to
        # bf16 first so the square-reduce traffic matches the conv form
        ob = out.astype(jnp.bfloat16)
        return c + jnp.sum(ob.astype(jnp.float32) ** 2), None

    c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters, dtype=jnp.bfloat16))
    return c


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--only", default=None, help="substring filter on tag")
    p.add_argument("--skip-bwd", action="store_true")
    args = p.parse_args(argv)

    b = args.batch
    jit_conv = jax.jit(conv_chain,
                       static_argnames=("stride", "iters", "bwd", "groups"))
    assert args.iters > LO_ITERS
    jit_gemm = jax.jit(gemm_chain, static_argnames=("iters",))

    rows = []
    tot = {"conv_fwd": 0.0, "gemm": 0.0, "conv_bwd": 0.0, "flops": 0.0,
           "flops_bwd": 0.0}
    rng = np.random.default_rng(0)
    for tag, cin, cout, k, stride, hin, count in SHAPES:
        if args.only and args.only not in tag:
            continue
        hout = hin // stride
        m, kk, n = b * hout * hout, k * k * cin, cout
        flops = 2.0 * m * kk * n
        x = jnp.asarray(rng.standard_normal((b, hin, hin, cin)), jnp.bfloat16)
        w = jnp.asarray(0.05 * rng.standard_normal((k, k, cin, cout)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((m, kk)), jnp.bfloat16)
        g = jnp.asarray(0.05 * rng.standard_normal((kk, n)), jnp.bfloat16)

        t_conv = timed(jit_conv, x, w, stride, False, 1, args.iters,
                       iters=args.iters)
        t_gemm = timed(jit_gemm, a, g, args.iters, iters=args.iters)
        if args.skip_bwd:
            t_bwd = float("nan")
        else:
            t_bwd = timed(jit_conv, x, w, stride, True, 1, args.iters,
                          iters=args.iters)
        # pad-tax utilization cap: K and N pad to 128 lanes, M to 8 sublanes
        pad = (kk / (128 * math.ceil(kk / 128))) * (n / (128 * math.ceil(n / 128)))
        row = dict(tag=tag, M=m, K=kk, N=n, count=count,
                   conv_ms=1e3 * t_conv, gemm_ms=1e3 * t_gemm,
                   bwd_ms=1e3 * t_bwd,
                   conv_tf=flops / t_conv / 1e12,
                   gemm_tf=flops / t_gemm / 1e12,
                   bwd_tf=3 * flops / t_bwd / 1e12,
                   ratio=t_conv / t_gemm,
                   padcap_tf=PEAK * pad / 1e12)
        rows.append(row)
        tot["conv_fwd"] += count * t_conv
        tot["gemm"] += count * t_gemm
        tot["conv_bwd"] += 0 if args.skip_bwd else count * t_bwd
        tot["flops"] += count * flops
        tot["flops_bwd"] += count * 3 * flops
        print(f"{tag:10s} M={m:>8d} K={kk:>5d} N={n:>4d} x{count}  "
              f"conv {1e3*t_conv:7.3f} ms ({row['conv_tf']:6.1f} TF/s)  "
              f"gemm {1e3*t_gemm:7.3f} ms ({row['gemm_tf']:6.1f} TF/s)  "
              f"bwd {1e3*t_bwd:7.3f} ms ({row['bwd_tf']:6.1f} TF/s)  "
              f"conv/gemm {row['ratio']:5.2f}  padcap {row['padcap_tf']:6.1f} TF/s",
              flush=True)

    for tag, c, hin, count in DW_SHAPES:
        if args.only and args.only not in tag:
            continue
        x = jnp.asarray(rng.standard_normal((b, hin, hin, c)), jnp.bfloat16)
        w = jnp.asarray(0.05 * rng.standard_normal((3, 3, 1, c)), jnp.bfloat16)
        try:
            t_conv = timed(jit_conv, x, w, 2, False, c, args.iters,
                           iters=args.iters)
        except Exception as e:
            print(f"{tag}: fwd failed: {str(e)[:80]}")
            continue
        try:
            t_bwd = (float("nan") if args.skip_bwd else
                     timed(jit_conv, x, w, 2, True, c, args.iters,
                           iters=args.iters))
        except Exception as e:  # dw bwd hit a remote tpu_compile_helper 500
            print(f"{tag}: bwd failed: {str(e)[:80]}")
            t_bwd = float("nan")
        fl = 2.0 * b * (hin // 2) ** 2 * 9 * c
        tot["conv_fwd"] += count * t_conv
        if not math.isnan(t_bwd):
            tot["conv_bwd"] += count * t_bwd
        tot["flops"] += count * fl
        tot["flops_bwd"] += count * 3 * fl
        print(f"{tag:10s} depthwise C={c} H={hin}  conv {1e3*t_conv:7.3f} ms  "
              f"bwd {1e3*t_bwd:7.3f} ms", flush=True)

    print(json.dumps({
        "model_conv_fwd_ms": 1e3 * tot["conv_fwd"],
        "model_gemm_ideal_ms": 1e3 * tot["gemm"],
        "model_conv_bwd_ms": 1e3 * tot["conv_bwd"],
        "fwd_eff_tf": (tot["flops"] / tot["conv_fwd"] / 1e12
                       if tot["conv_fwd"] else None),
        "gemm_eff_tf": (tot["flops"] / tot["gemm"] / 1e12
                        if tot["gemm"] else None),
        "bwd_eff_tf": (tot["flops_bwd"] / tot["conv_bwd"] / 1e12
                       if tot["conv_bwd"] else None),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
