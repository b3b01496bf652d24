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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


from .activations import gelu_exact as _gelu_exact  # A&S erf: Pallas has no erf


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
    n_pad = _round_up(n, _LANE)
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
    return ffn == "mlp" and weight_bytes <= 15 * 2 ** 20 and _round_up(n_tokens, _LANE) <= 1024


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

    # q/k/v projected PER HEAD inside the loop (same total MXU work as one
    # (N, 3D) projection): at D=1024 even the bf16 full-width qkv buffers
    # push the kernel over the 16 MB scoped-VMEM budget
    def proj_head(part, i):
        lo = part * d + i * head_dim
        y = jnp.dot(h, wqkv_ref[:, lo:lo + head_dim],
                    preferred_element_type=jnp.float32)
        return (y + bqkv_ref[lo:lo + head_dim].astype(jnp.float32)).astype(x.dtype)

    outs = []
    for i in range(num_heads):
        qh = proj_head(0, i)
        kh = proj_head(1, i)
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(key_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(jnp.dot(p, proj_head(2, i),
                            preferred_element_type=jnp.float32).astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)
    attn = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bproj_ref[:].astype(jnp.float32)
    o_ref[0] = x + (attn * ls1_ref[:].astype(jnp.float32)).astype(x.dtype)


def _mlp_half_kernel(x_ref, n2s_ref, n2b_ref, w1_ref, b1_ref, w2_ref,
                     ls2_ref, b2full_ref, o_ref, acc_ref, h_ref,
                     *, n_chunks: int, hc: int):
    """Grid (b, n_chunks): hidden dim tiled over j with fp32 accumulation.
    LN(x) is computed once per batch element (j == 0) into scratch."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_ref[...] = _layernorm(x_ref[0], n2s_ref[:], n2b_ref[:])

    m1 = jnp.dot(h_ref[...], w1_ref[:], preferred_element_type=jnp.float32)
    # full bias resident; dynamic lane slice for this hidden chunk
    b1c = b1_ref[pl.ds(pl.multiple_of(j * hc, hc), hc)]
    m1 = m1 + b1c.astype(jnp.float32)
    m1 = _gelu_exact(m1).astype(x_ref.dtype)
    part = jnp.dot(m1, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(j == n_chunks - 1)
    def _():
        total = acc_ref[...] + b2full_ref[:].astype(jnp.float32)
        o_ref[0] = x_ref[0] + (total * ls2_ref[:].astype(jnp.float32)).astype(x_ref.dtype)


def fused_vit_block_split(
    x: jnp.ndarray,
    block_params,
    *,
    num_heads: int,
    hidden_chunks: int = 4,  # hc must stay 1024-aligned for the 1-D bias slice
    interpret: bool = False,
) -> jnp.ndarray:
    """ViT block as attention-half + hidden-tiled MLP-half kernels (ViT-L)."""
    b, n, d = x.shape
    head_dim = d // num_heads
    n_pad = _round_up(n, _LANE)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    p = block_params
    dt = x.dtype
    hidden = p["mlp"]["fc1"]["kernel"].shape[1]
    assert hidden % hidden_chunks == 0
    hc = hidden // hidden_chunks

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
    w1 = p["mlp"]["fc1"]["kernel"].astype(dt)
    b1 = p["mlp"]["fc1"]["bias"].astype(dt)
    w2 = p["mlp"]["fc2"]["kernel"].astype(dt)
    b2 = p["mlp"]["fc2"]["bias"].astype(dt)
    ls2 = p["ls2"]["gamma"].astype(dt)

    xspec2 = pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_half_kernel, n_chunks=hidden_chunks, hc=hc),
        grid=(b, hidden_chunks),
        in_specs=[
            xspec2,
            pl.BlockSpec(n2s.shape, lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(n2b.shape, lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            # full 1-D bias resident (blocked 1-D operands hit layout-tiling
            # mismatches); the kernel takes a dynamic lane slice per chunk
            pl.BlockSpec(b1.shape, lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ls2.shape, lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=xspec2,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        scratch_shapes=[
            pltpu.VMEM((n_pad, d), jnp.float32),  # accumulator
            pltpu.VMEM((n_pad, d), dt),           # LN(x) reused across chunks
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=interpret,
    )(y, n2s, n2b, w1, b1, w2, ls2, b2)
    return out[:, :n]


def fused_split_supported(embed_dim: int, ffn: str, n_tokens: int) -> bool:
    """Attention-half weights (4*D^2 bf16) must fit VMEM."""
    return (ffn == "mlp" and (4 * embed_dim * embed_dim) * 2 <= 10 * 2 ** 20
            and _round_up(n_tokens, _LANE) <= 1024)
