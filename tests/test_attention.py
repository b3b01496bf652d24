"""Fused attention: XLA path numerics, Pallas path (interpret mode) parity,
gradient correctness of the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.ops.attention import (
    _pallas_attention,
    _xla_attention,
    fused_attention,
)


def _ref_attention(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_xla_attention_matches_reference(rng):
    q = rng.standard_normal((2, 3, 17, 8)).astype(np.float32)
    k = rng.standard_normal((2, 3, 29, 8)).astype(np.float32)
    v = rng.standard_normal((2, 3, 29, 8)).astype(np.float32)
    scale = 8 ** -0.5
    out = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    np.testing.assert_allclose(out, _ref_attention(q, k, v, scale), rtol=1e-4, atol=1e-5)


def test_pallas_interpret_matches_xla(rng):
    """Interpret-mode run of the kernel (incl. 257-token padding/masking)."""
    q = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    k = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    v = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    scale = 64 ** -0.5
    ours = np.asarray(_pallas_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, interpret=True))
    golden = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 10, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 12, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 12, 8)).astype(np.float32))
    scale = 8 ** -0.5

    def f_custom(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, use_pallas=False) ** 2)

    def f_plain(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
    g_plain = jax.grad(f_plain, argnums=(0, 1, 2))(q, k, v)
    for gc, gp in zip(g_custom, g_plain):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-4, atol=1e-5)


def test_pallas_bwd_kernel_matches_xla(rng):
    """Flash-style backward kernel (interpret mode) vs the einsum gradients."""
    from dinov2_distillation_tpu.ops.attention import _pallas_attention_bwd

    q = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    k = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    v = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    g = rng.standard_normal((1, 2, 257, 64)).astype(np.float32)
    scale = 64 ** -0.5

    dq, dk, dv = _pallas_attention_bwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        scale, interpret=True)

    def f(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) * jnp.asarray(g))

    want = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for got, w in zip((dq, dk, dv), want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(w), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("num_heads,d", [(2, 32), (16, 384), (24, 384)])
def test_token_major_matches_head_major(rng, num_heads, d):
    """Token-major attention (heads as lane slices) == reference head-major
    math, including the projector head_dims 24 and 16."""
    from dinov2_distillation_tpu.ops.attention import token_major_attention

    b, nq, nk = 2, 16, 12
    hd = d // num_heads
    q = rng.standard_normal((b, nq, d)).astype(np.float32)
    k = rng.standard_normal((b, nk, d)).astype(np.float32)
    v = rng.standard_normal((b, nk, d)).astype(np.float32)
    got = np.asarray(token_major_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads,
        use_pallas=False))

    def heads(x, n):
        return x.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)

    want = _ref_attention(heads(q, nq), heads(k, nk), heads(v, nk), hd ** -0.5)
    want = want.transpose(0, 2, 1, 3).reshape(b, nq, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_token_major_pallas_interpret(rng):
    from dinov2_distillation_tpu.ops.attention import _tm_pallas_fwd, _tm_xla

    q = jnp.asarray(rng.standard_normal((1, 257, 96)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 200, 96)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 200, 96)).astype(np.float32))
    got = np.asarray(_tm_pallas_fwd(q, k, v, 4, 24 ** -0.5, interpret=True))
    want = np.asarray(_tm_xla(q, k, v, 4, 24 ** -0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_token_major_grads(rng):
    from dinov2_distillation_tpu.ops.attention import token_major_attention

    q = jnp.asarray(rng.standard_normal((1, 10, 48)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 12, 48)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 12, 48)).astype(np.float32))

    def f_custom(q, k, v):
        return jnp.sum(token_major_attention(q, k, v, 4, use_pallas=False) ** 2)

    def f_plain(q, k, v):
        hd = 12
        qh = q.reshape(1, 10, 4, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(1, 12, 4, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(1, 12, 4, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * hd ** -0.5
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return jnp.sum((o.transpose(0, 2, 1, 3).reshape(1, 10, 48)) ** 2)

    gc = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(f_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(gc, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=1e-4, atol=1e-5)


def test_token_major_bwd_kernel_interpret(rng):
    from dinov2_distillation_tpu.ops.attention import _tm_pallas_bwd, _tm_xla

    q = jnp.asarray(rng.standard_normal((1, 100, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 80, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 80, 64)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 100, 64)).astype(np.float32))
    dq, dk, dv = _tm_pallas_bwd(q, k, v, g, 4, 16 ** -0.5, interpret=True)

    def f(q, k, v):
        return jnp.sum(_tm_xla(q, k, v, 4, 16 ** -0.5) * g)

    want = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for got, w in zip((dq, dk, dv), want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(w),
                                   rtol=2e-3, atol=2e-3)


def test_softmax_scale_folding(rng):
    """The ScaleKD projector folds softmax_scale into the logit scale
    (reference losses/scalekd.py:308)."""
    q = jnp.asarray(rng.standard_normal((1, 1, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 4, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, 4, 8)).astype(np.float32))
    a = fused_attention(q, k, v, (8 ** -0.5) * 5.0, use_pallas=False)
    b = _xla_attention(q * 5.0, k, v, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
