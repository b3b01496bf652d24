"""Fused multi-head attention for short ViT sequences (Pallas TPU kernel).

The teacher's hot op is 12-40 pre-norm MHSA blocks over ~257 tokens
(224px / 14 patch -> 16x16 + CLS; reference delegates this to torch.hub's
DINOv2 — SURVEY.md §2.3). At this sequence length the win on TPU is not
streaming/tiling cleverness but *fusion and VMEM residency*: one kernel per
(batch, head) keeps Q, K, V, the fp32 score matrix and the softmax entirely
in VMEM, runs both matmuls on the MXU, and never round-trips the (N, N)
attention matrix through HBM.

Numerics: scores and softmax in fp32 (matching torch's fp32 softmax under
AMP), probabilities cast to bf16 for the P@V matmul with fp32 accumulation.

Falls back to a pure-XLA implementation off-TPU (CPU tests, interpreters) and
for sequence lengths where the single-block strategy would bust VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAX_SINGLE_BLOCK_N = 1024  # fp32 score matrix: 1024^2*4B = 4 MB of VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, nk: int, scale: float):
    """Fused attention for one batch element, ALL heads in-program.

    q_ref: (1, H, Nq_pad, Dh), k_ref/v_ref: (1, H, Nk_pad, Dh), o_ref like q.
    Head-batching matters: a (batch*heads,) grid of tiny programs is
    dominated by per-program sequencing overhead (~1us each); batching the
    heads turns 1536 programs x 38 MFLOP into 256 programs x 226 MFLOP and
    runs ~6x faster on the 257-token teacher workload.

    ``nk`` is the real (unpadded) key count — static, so the padding mask is
    a compile-time constant.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    # (H, Nq, Dh) x (H, Nk, Dh) -> (H, Nq, Nk), batched over heads on the MXU
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale

    nk_pad = k.shape[1]
    if nk_pad != nk:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=2)
        scores = jnp.where(col < nk, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _xla_attention(q, k, v, scale: float):
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


# Keep the per-program fp32 score tensor under ~4 MB: h * nq_pad * nk_pad * 4.
_MAX_SCORE_ELEMS = 1024 * 1024


def _pallas_attention(q, k, v, scale: float, interpret: bool = False):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    nq_pad = _round_up(nq, _LANE)
    nk_pad = _round_up(nk, _LANE)
    dh_pad = _round_up(dh, _LANE)

    if (nq_pad, dh_pad) != (nq, dh):
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, dh_pad - dh)))
    if (nk_pad, dh_pad) != (nk, dh):
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, dh_pad - dh)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, dh_pad - dh)))

    # Batch as many heads per program as the VMEM score budget allows.
    hb = max(1, min(h, _MAX_SCORE_ELEMS // (nq_pad * nk_pad)))
    while h % hb:
        hb -= 1
    grid = (b, h // hb)

    kernel = functools.partial(_attn_kernel, nk=nk, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, nq_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, nk_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, nk_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, nq_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_pad, dh_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (nq_pad * nk_pad * dh_pad * 2),
            bytes_accessed=(b * h) * (2 * nq_pad + 2 * nk_pad) * dh_pad * q.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :nq, :dh]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Token-major attention: q/k/v stay (B, N, D); heads are lane slices inside
# the kernel. This avoids BOTH the (B, H, N, dh) transpose copies and the
# HBM materialization of dh->128 padded tensors that XLA emits around the
# head-major layout (profiled at tens of ms per step for the ScaleKD
# projectors, whose head_dims are 16/24).
# ---------------------------------------------------------------------------


def _tm_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, nk: int, num_heads: int,
                   scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    n_pad, d = q.shape
    nk_pad = k.shape[0]
    hd = d // num_heads
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, nk_pad), dimension=1)
    key_mask = col < nk
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jnp.dot(
            p, v[:, sl], preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _tm_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                   *, nk: int, num_heads: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    n_pad, d = q.shape
    nk_pad = k.shape[0]
    hd = d // num_heads
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, nk_pad), dimension=1)
    key_mask = col < nk
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pb = p.astype(q.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pb, gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq_ref[0, :, sl] = (jnp.dot(
            dsb, kh, preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            dsb, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _tm_pad(x, n_pad):
    n = x.shape[1]
    return x if n == n_pad else jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))


def _tm_pallas_fwd(q, k, v, num_heads: int, scale: float, interpret=False):
    b, nq, d = q.shape
    nk = k.shape[1]
    nq_pad = _round_up(nq, _LANE)
    nk_pad = _round_up(nk, _LANE)
    q, k, v = _tm_pad(q, nq_pad), _tm_pad(k, nk_pad), _tm_pad(v, nk_pad)
    kernel = functools.partial(_tm_fwd_kernel, nk=nk, num_heads=num_heads,
                               scale=scale)
    spec_q = pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v)
    return out[:, :nq]


def _tm_pallas_bwd(q, k, v, g, num_heads: int, scale: float, interpret=False):
    b, nq, d = q.shape
    nk = k.shape[1]
    nq_pad = _round_up(nq, _LANE)
    nk_pad = _round_up(nk, _LANE)
    q, g = _tm_pad(q, nq_pad), _tm_pad(g, nq_pad)
    k, v = _tm_pad(k, nk_pad), _tm_pad(v, nk_pad)
    kernel = functools.partial(_tm_bwd_kernel, nk=nk, num_heads=num_heads,
                               scale=scale)
    spec_q = pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v, g)
    return dq[:, :nq], dk[:, :nk], dv[:, :nk]


def _tm_xla(q, k, v, num_heads: int, scale: float):
    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    out = _xla_attention(qh, kh, vh, scale)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _tm_core(q, k, v, num_heads: int, scale: float, use_pallas: bool):
    if use_pallas:
        return _tm_pallas_fwd(q, k, v, num_heads, scale)
    return _tm_xla(q, k, v, num_heads, scale)


def _tm_fwd(q, k, v, num_heads, scale, use_pallas):
    return _tm_core(q, k, v, num_heads, scale, use_pallas), (q, k, v)


def _tm_bwd(num_heads, scale, use_pallas, res, g):
    q, k, v = res
    if use_pallas:
        return _tm_pallas_bwd(q, k, v, g, num_heads, scale)
    # XLA fallback via the head-major custom bwd
    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // num_heads

    def to_h(x, n):
        return x.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    dq, dk, dv = _attention_bwd(scale, False, (to_h(q, nq), to_h(k, nk), to_h(v, nk)),
                                to_h(g, nq))

    def back(x, n):
        return x.transpose(0, 2, 1, 3).reshape(b, n, d)

    return back(dq, nq), back(dk, nk), back(dv, nk)


def token_major_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
    *,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over (B, N, D) token tensors.

    Heads are static lane slices of D inside the kernel — no head-major
    transpose and no head-dim padding ever reaches HBM. Preferred form for
    every non-windowed attention in the framework.
    """
    d = q.shape[-1]
    if scale is None:
        scale = (d // num_heads) ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu()
    nq, nk = q.shape[1], k.shape[1]
    if max(_round_up(nq, _LANE), _round_up(nk, _LANE)) > _MAX_SINGLE_BLOCK_N:
        use_pallas = False
    return _tm_core(q, k, v, num_heads, float(scale), bool(use_pallas))


_tm_core.defvjp(_tm_fwd, _tm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_core(q, k, v, scale: float, use_pallas: bool):
    if use_pallas:
        return _pallas_attention(q, k, v, scale)
    return _xla_attention(q, k, v, scale)


def _attention_fwd(q, k, v, scale: float, use_pallas: bool):
    return _attention_core(q, k, v, scale, use_pallas), (q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, nk: int, scale: float):
    """Recompute-based attention backward, fully VMEM-resident.

    Without this, XLA materializes the fp32 (B, H, N, N) probability /
    dP / dS tensors in HBM several times per attention site — profiling the
    train step showed those fusions dominating the whole backward pass.
    Here each (batch, head-block) program rebuilds its scores in VMEM and
    emits only dq/dk/dv.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    nk_pad = k.shape[1]
    if nk_pad != nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < nk, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (hb, Nq, Nk) fp32

    pb = p.astype(q.dtype)
    # dv = p^T g
    dv = jax.lax.dot_general(
        pb, g.astype(q.dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp = g v^T
    dp = jax.lax.dot_general(
        g.astype(q.dtype), v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dsb, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pallas_attention_bwd(q, k, v, g, scale: float, interpret: bool = False):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    nq_pad = _round_up(nq, _LANE)
    nk_pad = _round_up(nk, _LANE)
    dh_pad = _round_up(dh, _LANE)

    if (nq_pad, dh_pad) != (nq, dh):
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, dh_pad - dh)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, nq_pad - nq), (0, dh_pad - dh)))
    if (nk_pad, dh_pad) != (nk, dh):
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, dh_pad - dh)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, dh_pad - dh)))

    # four fp32 (Nq, Nk) temporaries per head in VMEM
    hb = max(1, min(h, (_MAX_SCORE_ELEMS // 2) // (nq_pad * nk_pad)))
    while h % hb:
        hb -= 1

    kernel = functools.partial(_bwd_kernel, nk=nk, scale=scale)
    spec_q = pl.BlockSpec((1, hb, nq_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, hb, nk_pad, dh_pad), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // hb),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, nk_pad, dh_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk_pad, dh_pad), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq_pad * nk_pad * dh_pad * 5,
            bytes_accessed=(b * h) * (4 * nq_pad + 4 * nk_pad) * dh_pad * q.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, g)
    return dq[:, :, :nq, :dh], dk[:, :, :nk, :dh], dv[:, :, :nk, :dh]


def _attention_bwd(scale: float, use_pallas: bool, res, g):
    q, k, v = res
    nq, nk = q.shape[2], k.shape[2]
    if use_pallas and max(_round_up(nq, _LANE), _round_up(nk, _LANE)) <= _MAX_SINGLE_BLOCK_N:
        return _pallas_attention_bwd(q, k, v, g, scale)
    g = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention_core.defvjp(_attention_fwd, _attention_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    *,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Scaled-dot-product attention over (B, H, N, Dh) tensors.

    ``scale`` defaults to ``Dh**-0.5``; pass an explicit value to fold extra
    factors in (e.g. the ScaleKD projector's ``softmax_scale`` —
    reference ``losses/scalekd.py:308``). Differentiable via a custom VJP
    (fused Pallas forward; recompute backward).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu()
    nq, nk = q.shape[2], k.shape[2]
    if max(_round_up(nq, _LANE), _round_up(nk, _LANE)) > _MAX_SINGLE_BLOCK_N:
        use_pallas = False
    return _attention_core(q, k, v, float(scale), bool(use_pallas))
