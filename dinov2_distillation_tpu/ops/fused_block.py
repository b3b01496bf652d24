"""Fused ViT transformer block — single Pallas kernel per block (forward).

The teacher's main forward is inference (gradients never flow into it: the
feature map is stop_gradient'd and teacher params are not differentiated), so
the whole pre-norm block — LN1 -> QKV -> MHSA -> proj -> LayerScale ->
residual -> LN2 -> MLP(GELU) -> LayerScale -> residual — can run as ONE
kernel per batch element with every weight resident in VMEM (index_map
constant -> fetched once for the whole grid) and zero activation round-trips
to HBM inside the block.

Why: profiling the unfused ViT-S forward at batch 256 shows the MXU gemms at
only 14 ms of a ~90 ms block stack — the rest is HBM traffic for LayerNorms,
reshape/transposes, attention score tensors, GELU and residuals. Fusion
removes that traffic entirely.

Scope: MLP (4x, exact GELU) variant, head_dim 64, embed dim <= 768 (ViT-S/B
— weights per block at D=768 are ~14 MB bf16, the VMEM ceiling). ViT-L/g and
the differentiated cascade path use the unfused modules.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Token-dim padding granularity: bf16 sublane tile height. Tokens are the
# ROW (sublane) dim of every in-kernel tensor, so they only need tile
# alignment, not 128-lane alignment — padding 257 tokens to 272 instead of
# 384 cuts ~29% of all row-wise work (LN, GELU, matmul rows, softmax rows);
# Mosaic masks the non-128-aligned lane dim of the (N, N) score tensors.
_SUBLANE = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


from .activations import erf_as as _erf  # A&S erf: Pallas has no erf lowering
from .activations import gelu_exact as _gelu_exact


def _layernorm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _block_kernel(
    x_ref,
    n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ls1_ref,
    n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls2_ref,
    o_ref,
    *, n_tokens: int, num_heads: int, head_dim: int,
):
    x = x_ref[0]                      # (N_pad, D) bf16
    n_pad, d = x.shape

    # --- attention half ------------------------------------------------
    h = _layernorm(x, n1s_ref[:], n1b_ref[:])
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (N, 3D)

    scale = head_dim ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_tokens

    # Per-head lane slices (Mosaic cannot re-layout a lane-dim split; the
    # (N, D) -> (H, N, hd) reshape crashes the compiler). Phased so the
    # scheduler sees independent MXU (scores), VPU (softmax), MXU (P@V)
    # chains to overlap across heads.
    def head(off, i):
        return qkv[:, off + i * head_dim:off + (i + 1) * head_dim]

    scores = [
        jax.lax.dot_general(
            head(0, i), head(d, i),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        for i in range(num_heads)
    ]
    probs = []
    for s in scores:
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs.append((e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype))
    outs = [
        jnp.dot(p, head(2 * d, i), preferred_element_type=jnp.float32).astype(x.dtype)
        for i, p in enumerate(probs)
    ]
    attn = jnp.concatenate(outs, axis=-1)                     # (N, D)

    attn = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bproj_ref[:].astype(jnp.float32)
    x = x + (attn * ls1_ref[:].astype(jnp.float32)).astype(x.dtype)

    # --- MLP half --------------------------------------------------------
    h = _layernorm(x, n2s_ref[:], n2b_ref[:])
    m1 = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    m1 = m1 + b1_ref[:].astype(jnp.float32)
    m1 = _gelu_exact(m1).astype(x.dtype)
    m2 = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32)
    m2 = m2 + b2_ref[:].astype(jnp.float32)
    x = x + (m2 * ls2_ref[:].astype(jnp.float32)).astype(x.dtype)

    o_ref[0] = x


def fused_vit_block(
    x: jnp.ndarray,
    block_params,
    *,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one pre-norm ViT block to (B, N, D) tokens via the fused kernel.

    ``block_params`` is the flax param subtree of models.vit.Block
    ({norm1, attn{qkv, proj}, ls1, norm2, mlp{fc1, fc2}, ls2}).
    """
    b, n, d = x.shape
    head_dim = d // num_heads
    n_pad = _round_up(n, _SUBLANE)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    p = block_params
    dt = x.dtype
    weights = [
        p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
        p["attn"]["qkv"]["kernel"].astype(dt), p["attn"]["qkv"]["bias"].astype(dt),
        p["attn"]["proj"]["kernel"].astype(dt), p["attn"]["proj"]["bias"].astype(dt),
        p["ls1"]["gamma"].astype(dt),
        p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
        p["mlp"]["fc1"]["kernel"].astype(dt), p["mlp"]["fc1"]["bias"].astype(dt),
        p["mlp"]["fc2"]["kernel"].astype(dt), p["mlp"]["fc2"]["bias"].astype(dt),
        p["ls2"]["gamma"].astype(dt),
    ]

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _block_kernel, n_tokens=n, num_heads=num_heads, head_dim=head_dim)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * (4 * d * d + 8 * d * d + 2 * n_pad * d),
            bytes_accessed=2 * b * n_pad * d * 2 + sum(w.size for w in weights) * 2,
            transcendentals=b * n_pad * 4 * d,
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, *weights)
    return out[:, :n]


def fused_block_supported(embed_dim: int, ffn: str, n_tokens: int) -> bool:
    """Weights must fit VMEM alongside activations; MLP variant only."""
    weight_bytes = (12 * embed_dim * embed_dim) * 2  # qkv+proj+fc1+fc2, bf16
    return ffn == "mlp" and weight_bytes <= 15 * 2 ** 20 and _round_up(n_tokens, _SUBLANE) <= 1024


# ---------------------------------------------------------------------------
# Differentiable fused block (input gradients only) — the ScaleKD cascade
# routes PROJECTED STUDENT tokens through frozen teacher blocks
# (reference train/distillation_module.py:162-178) and needs d(input), never
# d(weights): teacher params are not in the optimizer. That makes the
# backward a single recompute-based kernel per block — forward internals are
# rebuilt in VMEM and only dx leaves — instead of XLA's unfused LN/softmax/
# GELU backward chain materializing every intermediate in HBM.
# ---------------------------------------------------------------------------


def _ln_fwd(x, scale, bias, eps=1e-6):
    """LayerNorm forward returning (y, xhat, rstd) for reuse in backward."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y, xhat, rstd


def _ln_bwd(dy, xhat, rstd, scale):
    """d(input) of LayerNorm given dy (fp32 in/out)."""
    dxhat = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * rstd


def _gelu_grad(z):
    """d/dz gelu(z) in fp32: Phi(z) + z*phi(z)."""
    phi_cdf = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    pdf = 0.3989422804014327 * jnp.exp(-0.5 * z * z)
    return phi_cdf + z * pdf


def _block_dx_kernel(
    x_ref, g_ref,
    n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, ls1_ref,
    n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls2_ref,
    dx_ref,
    *, n_tokens: int, num_heads: int, head_dim: int,
):
    """Recompute-based input-gradient of one pre-norm ViT block.

    One batch element per program; weights VMEM-resident across the grid.
    Forward is rebuilt exactly as ``_block_kernel`` computes it (so the
    gradient is of the *kernel's* numerics, bf16 matmuls and all), then the
    chain runs backwards entirely in VMEM: MLP half -> LN2 -> attention
    softmax (per-head lane slices) -> LN1 -> dx.
    """
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    n_pad, d = x.shape

    # ---- forward recompute: attention half -----------------------------
    h1, xhat1, rstd1 = _ln_fwd(x, n1s_ref[:], n1b_ref[:])
    h1b = h1.astype(x.dtype)
    qkv = jnp.dot(h1b, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)

    scale = head_dim ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_tokens

    def head(off, i):
        return qkv[:, off + i * head_dim:off + (i + 1) * head_dim]

    # phased like the forward kernel: MXU scores, VPU softmax, MXU P@V
    scores = [
        jax.lax.dot_general(
            head(0, i), head(d, i),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        for i in range(num_heads)
    ]
    probs = []
    for s in scores:
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs.append(e / jnp.sum(e, axis=-1, keepdims=True))  # fp32
    outs = [
        jnp.dot(probs[i].astype(x.dtype), head(2 * d, i),
                preferred_element_type=jnp.float32).astype(x.dtype)
        for i in range(num_heads)
    ]
    attn = jnp.concatenate(outs, axis=-1)
    attn_proj = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    attn_proj = attn_proj + bproj_ref[:].astype(jnp.float32)
    x1 = x + (attn_proj * ls1_ref[:].astype(jnp.float32)).astype(x.dtype)

    # ---- forward recompute: MLP half (pre-activation kept) -------------
    h2, xhat2, rstd2 = _ln_fwd(x1, n2s_ref[:], n2b_ref[:])
    h2b = h2.astype(x.dtype)
    z1 = jnp.dot(h2b, w1_ref[:], preferred_element_type=jnp.float32)
    z1 = z1 + b1_ref[:].astype(jnp.float32)               # (N, 4D) fp32
    a1 = (0.5 * z1 * (1.0 + _erf(z1 * 0.7071067811865476))).astype(x.dtype)

    # ---- backward: MLP half --------------------------------------------
    gm = g * ls2_ref[:].astype(jnp.float32)               # d(mlp out)
    gmb = gm.astype(x.dtype)
    da1 = jnp.dot(gmb, w2_ref[:].T, preferred_element_type=jnp.float32)
    dz1 = (da1 * _gelu_grad(z1)).astype(x.dtype)
    dh2 = jnp.dot(dz1, w1_ref[:].T, preferred_element_type=jnp.float32)
    dx1 = g + _ln_bwd(dh2, xhat2, rstd2, n2s_ref[:])

    # ---- backward: attention half --------------------------------------
    gattn = dx1 * ls1_ref[:].astype(jnp.float32)
    gattnb = gattn.astype(x.dtype)
    dattn = jnp.dot(gattnb, wproj_ref[:].T,
                    preferred_element_type=jnp.float32)   # (N, D) fp32

    dqkv_parts_q = []
    dqkv_parts_k = []
    dqkv_parts_v = []
    for i in range(num_heads):
        p = probs[i]                                      # (N, N) fp32
        da_h = dattn[:, i * head_dim:(i + 1) * head_dim].astype(x.dtype)
        vh = head(2 * d, i)
        # dv = p^T da
        dv = jax.lax.dot_general(
            p.astype(x.dtype), da_h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp = da v^T
        dp = jax.lax.dot_general(
            da_h, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(x.dtype)
        kh = head(d, i)
        qh = head(0, i)
        dq = jnp.dot(dsb, kh, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dsb, qh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dqkv_parts_q.append(dq.astype(x.dtype))
        dqkv_parts_k.append(dk.astype(x.dtype))
        dqkv_parts_v.append(dv.astype(x.dtype))

    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1)  # (N, 3D)
    dh1 = jnp.dot(dqkv, wqkv_ref[:].T, preferred_element_type=jnp.float32)
    dx = dx1 + _ln_bwd(dh1, xhat1, rstd1, n1s_ref[:])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _block_weights(block_params, dt):
    p = block_params
    return [
        p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
        p["attn"]["qkv"]["kernel"].astype(dt), p["attn"]["qkv"]["bias"].astype(dt),
        p["attn"]["proj"]["kernel"].astype(dt), p["attn"]["proj"]["bias"].astype(dt),
        p["ls1"]["gamma"].astype(dt),
        p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
        p["mlp"]["fc1"]["kernel"].astype(dt), p["mlp"]["fc1"]["bias"].astype(dt),
        p["mlp"]["fc2"]["kernel"].astype(dt), p["mlp"]["fc2"]["bias"].astype(dt),
        p["ls2"]["gamma"].astype(dt),
    ]


def fused_vit_block_dx(
    x: jnp.ndarray,
    g: jnp.ndarray,
    block_params,
    *,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """d(input) of ``fused_vit_block`` at x for output cotangent g."""
    b, n, d = x.shape
    head_dim = d // num_heads
    n_pad = _round_up(n, _SUBLANE)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))

    weights = _block_weights(block_params, x.dtype)

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _block_dx_kernel, n_tokens=n, num_heads=num_heads, head_dim=head_dim)
    dx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[xspec, xspec] + [wspec(w) for w in weights],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * (24 * d * d + 6 * n_pad * d),
            bytes_accessed=3 * b * n_pad * d * 2 + sum(w.size for w in weights) * 2,
            transcendentals=b * n_pad * (2 * n_pad + 8 * d),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=interpret,
    )(x, g, *weights)
    return dx[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_vit_block_diff(x, block_params, num_heads: int, interpret: bool = False):
    """Differentiable fused block: fused forward, fused dx backward.

    Weight cotangents are zeros (the cascade never optimizes teacher
    params; XLA dead-code-eliminates the unused zero tree)."""
    return fused_vit_block(x, block_params, num_heads=num_heads,
                           interpret=interpret)


def _fvbd_fwd(x, block_params, num_heads, interpret):
    y = fused_vit_block(x, block_params, num_heads=num_heads,
                        interpret=interpret)
    return y, (x, block_params)


def _fvbd_bwd(num_heads, interpret, res, g):
    x, block_params = res
    dx = fused_vit_block_dx(x, g, block_params, num_heads=num_heads,
                            interpret=interpret)
    dparams = jax.tree_util.tree_map(jnp.zeros_like, block_params)
    return dx, dparams


fused_vit_block_diff.defvjp(_fvbd_fwd, _fvbd_bwd)


# ---------------------------------------------------------------------------
# Split-kernel variant for larger embed dims (ViT-L): the whole block's
# weights exceed VMEM, so the block runs as two kernels — an attention half
# (qkv+proj weights resident) and an MLP half whose hidden dimension is
# tiled across a reduction grid axis with a VMEM fp32 accumulator.
# ---------------------------------------------------------------------------


def _attn_half_kernel(x_ref, n1s_ref, n1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ls1_ref, o_ref,
                      *, n_tokens: int, num_heads: int, head_dim: int):
    x = x_ref[0]
    n_pad, d = x.shape
    h = _layernorm(x, n1s_ref[:], n1b_ref[:])

    scale = head_dim ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    key_mask = col < n_tokens

    # Full-width qkv projection (one (N,D)@(D,3D) MXU matmul — per-head
    # 64-wide projections ran at half lane utilization and measured slower
    # than unfused XLA), then the same phased per-head lane-slice attention
    # as the ViT-S kernel (commit e524700): each list comprehension is a
    # stage of independent per-head ops, so Mosaic can overlap head i's VPU
    # softmax with head i+1's MXU matmuls. Buffers fit because the split
    # path runs under vmem_limit_bytes=64MB (the 16MB scoped default that
    # originally forced per-head projection no longer applies).
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (N, 3D)

    def head(off, i):
        return qkv[:, off + i * head_dim:off + (i + 1) * head_dim]

    scores = [
        jax.lax.dot_general(
            head(0, i), head(d, i), dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        for i in range(num_heads)
    ]
    probs = []
    for s in scores:
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        probs.append((e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype))
    outs = [
        jnp.dot(probs[i], head(2 * d, i),
                preferred_element_type=jnp.float32).astype(x.dtype)
        for i in range(num_heads)
    ]
    attn = jnp.concatenate(outs, axis=-1)
    attn = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bproj_ref[:].astype(jnp.float32)
    o_ref[0] = x + (attn * ls1_ref[:].astype(jnp.float32)).astype(x.dtype)


def _mlp_half_kernel(x_ref, n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref,
                     ls2_ref, b2_ref, o_ref):
    """Grid (b,): whole MLP with fc1+fc2 weights VMEM-resident (constant
    index_map -> fetched ONCE for the entire grid). The previous
    hidden-chunked variant re-DMAed a 4 MB weight tile per (batch, chunk)
    program — ~2 GB of weight traffic per ViT-L block — and lost to
    unfused XLA on that traffic alone. At D=1024 the full 16 MB of MLP
    weights plus the (N,4D) fp32 hidden activation fit comfortably under
    the 64 MB vmem limit."""
    x = x_ref[0]
    h = _layernorm(x, n2s_ref[:], n2b_ref[:])
    m1 = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    m1 = m1 + b1_ref[:].astype(jnp.float32)
    m1 = _gelu_exact(m1).astype(x.dtype)
    m2 = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32)
    m2 = m2 + b2_ref[:].astype(jnp.float32)
    o_ref[0] = x + (m2 * ls2_ref[:].astype(jnp.float32)).astype(x.dtype)


def _swiglu_half_kernel(x_ref, n2s_ref, n2b_ref, w12_ref, b12_ref,
                        w3_ref, b3_ref, ls2_ref, o_ref, *, hidden: int):
    """DINOv2-g SwiGLUFFNFused half: LN2 -> w12 -> silu(x1)*x2 -> w3 ->
    LayerScale -> residual, all weights VMEM-resident (w12+w3 at D=1536 /
    hidden 4096 are ~38 MB bf16 — runs under a raised vmem limit).
    x1 = FIRST half of the w12 output (upstream chunk order —
    dinov2/layers/swiglu_ffn.py; reference teacher
    /root/reference/models/backbones/dinov2.py:20)."""
    x = x_ref[0]
    h = _layernorm(x, n2s_ref[:], n2b_ref[:])
    x12 = jnp.dot(h, w12_ref[:], preferred_element_type=jnp.float32)
    x12 = x12 + b12_ref[:].astype(jnp.float32)
    x1 = x12[:, :hidden]
    x2 = x12[:, hidden:]
    g = (x1 / (1.0 + jnp.exp(-x1))) * x2          # silu(x1) * x2, fp32
    m = jnp.dot(g.astype(x.dtype), w3_ref[:], preferred_element_type=jnp.float32)
    m = m + b3_ref[:].astype(jnp.float32)
    o_ref[0] = x + (m * ls2_ref[:].astype(jnp.float32)).astype(x.dtype)


def fused_vit_block_split(
    x: jnp.ndarray,
    block_params,
    *,
    num_heads: int,
    hidden_chunks: int = 4,  # hc must stay 1024-aligned for the 1-D bias slice
    interpret: bool = False,
) -> jnp.ndarray:
    """ViT block as attention-half + MLP-half kernels (ViT-L mlp, ViT-g
    swiglu — the FFN flavor is dispatched from the param tree)."""
    b, n, d = x.shape
    head_dim = d // num_heads
    n_pad = _round_up(n, _SUBLANE)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    p = block_params
    dt = x.dtype
    del hidden_chunks  # retained for API compat; the MLP half is no longer tiled

    aw = [
        p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
        p["attn"]["qkv"]["kernel"].astype(dt), p["attn"]["qkv"]["bias"].astype(dt),
        p["attn"]["proj"]["kernel"].astype(dt), p["attn"]["proj"]["bias"].astype(dt),
        p["ls1"]["gamma"].astype(dt),
    ]

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_attn_half_kernel, n_tokens=n, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(b,),
        in_specs=[xspec] + [wspec(w) for w in aw],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20,  # default scoped limit is 16 MB
        ),
        interpret=interpret,
    )(x, *aw)

    n2s = p["norm2"]["scale"].astype(dt)
    n2b = p["norm2"]["bias"].astype(dt)
    ls2 = p["ls2"]["gamma"].astype(dt)

    if "w12" in p["mlp"]:  # SwiGLUFFNFused (vitg)
        w12 = p["mlp"]["w12"]["kernel"].astype(dt)
        b12 = p["mlp"]["w12"]["bias"].astype(dt)
        w3 = p["mlp"]["w3"]["kernel"].astype(dt)
        b3 = p["mlp"]["w3"]["bias"].astype(dt)
        hidden = w3.shape[0]
        mw = [n2s, n2b, w12, b12, w3, b3, ls2]
        out = pl.pallas_call(
            functools.partial(_swiglu_half_kernel, hidden=hidden),
            grid=(b,),
            in_specs=[xspec] + [wspec(w) for w in mw],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 2 ** 20,  # 38 MB weights + fp32 acts
            ),
            interpret=interpret,
        )(y, *mw)
        return out[:, :n]

    w1 = p["mlp"]["fc1"]["kernel"].astype(dt)
    b1 = p["mlp"]["fc1"]["bias"].astype(dt)
    w2 = p["mlp"]["fc2"]["kernel"].astype(dt)
    b2 = p["mlp"]["fc2"]["bias"].astype(dt)

    mw = [n2s, n2b, w1, b1, w2, ls2, b2]
    out = pl.pallas_call(
        _mlp_half_kernel,
        grid=(b,),
        in_specs=[xspec] + [wspec(w) for w in mw],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=interpret,
    )(y, *mw)
    return out[:, :n]


def fused_split_supported(embed_dim: int, ffn: str, n_tokens: int,
                          ffn_hidden: int = 0) -> bool:
    """Both halves' weights must be VMEM-resident: attention 4*D^2 bf16
    (+ (N,3D) qkv and per-head fp32 score buffers) under 24 MB; the MLP
    half (mlp: 8*D^2 bf16 + (N,4D) fp32 hidden; swiglu: (2+1)*D*hidden*2
    bf16 + (N,2*hidden) fp32) under its raised vmem limit."""
    n_pad = _round_up(n_tokens, _SUBLANE)
    attn_bytes = 4 * embed_dim * embed_dim * 2 + n_pad * 3 * embed_dim * 4
    if ffn == "swiglu":
        hid = ffn_hidden or 4 * embed_dim
        mlp_bytes = 3 * embed_dim * hid * 2 + n_pad * 2 * hid * 4
        return (attn_bytes <= 24 * 2 ** 20 and mlp_bytes <= 64 * 2 ** 20
                and n_pad <= 1024)
    mlp_bytes = 8 * embed_dim * embed_dim * 2 + n_pad * 4 * embed_dim * 4
    return (ffn == "mlp" and attn_bytes <= 24 * 2 ** 20
            and mlp_bytes <= 48 * 2 ** 20 and n_pad <= 1024)
