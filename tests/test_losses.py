"""ScaleKD loss arithmetic goldens and projector behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.losses.scalekd import (
    AttentionProjector,
    ScaleKD,
    frequency_loss_fn,
    spatial_loss_fn,
)


def _np_normalize(x, axis):
    n = np.sqrt((x * x).sum(axis=axis, keepdims=True))
    return x / np.maximum(n, 1e-12)


def test_spatial_loss_golden(rng):
    """MSE(sum)/B * alpha over channel-normalized maps + mean cosine sim
    (reference losses/scalekd.py:67-92)."""
    b, h, w, d = 3, 4, 4, 8
    alpha = 0.08
    s_tokens = rng.standard_normal((b, h * w, d)).astype(np.float32)
    t_map = rng.standard_normal((b, h, w, d)).astype(np.float32)

    loss, sim = spatial_loss_fn(jnp.asarray(s_tokens), jnp.asarray(t_map), alpha)

    s = _np_normalize(s_tokens.reshape(b, h, w, d), -1)
    t = _np_normalize(t_map, -1)
    want_loss = ((s - t) ** 2).sum() / b * alpha
    want_sim = (s * t).sum(-1).mean()
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    # sim is a mean cosine of random draws (near zero): atol required
    np.testing.assert_allclose(float(sim), want_sim, rtol=1e-5, atol=1e-6)


def test_frequency_loss_golden(rng):
    """DC removal == spatial-mean subtraction, then normalized MSE
    (reference losses/scalekd.py:95-127)."""
    b, h, w, d = 2, 4, 4, 8
    alpha = 0.06
    s_tokens = rng.standard_normal((b, h * w, d)).astype(np.float32)
    t_map = rng.standard_normal((b, h, w, d)).astype(np.float32)

    loss, sim = frequency_loss_fn(jnp.asarray(s_tokens), jnp.asarray(t_map), alpha)

    s = s_tokens.reshape(b, h, w, d)
    s = s - s.mean(axis=(1, 2), keepdims=True)
    t = t_map - t_map.mean(axis=(1, 2), keepdims=True)
    s = _np_normalize(s, -1)
    t = _np_normalize(t, -1)
    want_loss = ((s - t) ** 2).sum() / b * alpha
    want_sim = (s * t).sum(-1).mean()
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    # sim is a mean cosine of random draws (near zero): atol required
    np.testing.assert_allclose(float(sim), want_sim, rtol=1e-5, atol=1e-6)


def test_identical_maps_give_zero_loss_unit_similarity(rng):
    b, h, w, d = 2, 4, 4, 8
    t_map = rng.standard_normal((b, h, w, d)).astype(np.float32)
    tokens = t_map.reshape(b, h * w, d)
    loss, sim = spatial_loss_fn(jnp.asarray(tokens), jnp.asarray(t_map), 1.0)
    assert float(loss) < 1e-8
    np.testing.assert_allclose(float(sim), 1.0, atol=1e-6)


@pytest.fixture
def projector_setup(rng):
    proj = AttentionProjector(
        student_dim=16, teacher_dim=32, hw=(4, 4), pos_dim=32,
        self_query=True, softmax_scale=5.0, num_heads=4, dtype=jnp.float32,
    )
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
    variables = proj.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return proj, variables, x


def test_projector_output_shape(projector_setup):
    proj, variables, x = projector_setup
    out, mutated = proj.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 32)
    # BN running stats must update in train mode
    old = variables["batch_stats"]["proj_bn"]["mean"]
    new = mutated["batch_stats"]["proj_bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_projector_external_query_overrides_self_query(projector_setup, rng):
    proj, variables, x = projector_setup
    q1 = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    out_a = proj.apply(variables, x, query=q1, train=False)
    out_b = proj.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_scalekd_composite_keys(rng):
    head = ScaleKD(
        student_dim=16, teacher_dim=32, query_hw=(4, 4), pos_dim=32,
        alpha=(0.08, 0.06), self_query=True, softmax_scale=(5.0, 5.0),
        num_heads=4, dtype=jnp.float32,
    )
    s = jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0)}, s, t, train=False)
    out = head.apply(variables, s, t, train=False)
    assert set(out) == {"spatial_loss", "frequency_loss", "spatial_similarity",
                        "frequency_similarity", "loss"}
    np.testing.assert_allclose(
        float(out["loss"]), float(out["spatial_loss"] + out["frequency_loss"]), rtol=1e-6)


def test_window_partition_changes_attention(rng):
    """window_shapes=(2,2) must attend within 4 local windows, differing from
    global attention (reference losses/scalekd.py:303-306, 327-335)."""
    def make(ws):
        return ScaleKD(
            student_dim=16, teacher_dim=32, query_hw=(4, 4), pos_dim=32,
            window_shapes=ws, self_query=True, softmax_scale=(5.0, 5.0),
            num_heads=4, dtype=jnp.float32,
        )
    s = jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    head_g, head_w = make((1, 1)), make((2, 2))
    variables = head_g.init({"params": jax.random.PRNGKey(0)}, s, t, train=False)
    out_g = head_g.apply(variables, s, t, train=False)
    out_w = head_w.apply(variables, s, t, train=False)  # same params, windowed
    assert not np.isclose(float(out_g["loss"]), float(out_w["loss"]))


def test_loss_fns_mask_invariant_to_padding(rng):
    """VERDICT r2 #10: wrap-padded val batches must not bias metrics — the
    masked reductions over a padded batch equal the unpadded ones."""
    b, h, w, d = 5, 4, 4, 8
    s = jnp.asarray(rng.standard_normal((b, h * w, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, h, w, d)).astype(np.float32))
    # wrap-pad to 8 the way parallel.mesh.shard_batch does
    idx = np.arange(8) % b
    s_pad, t_pad = s[idx], t[idx]
    mask = jnp.asarray((np.arange(8) < b).astype(np.float32))

    for fn in (spatial_loss_fn, frequency_loss_fn):
        loss, sim = fn(s, t, 0.08)
        loss_m, sim_m = fn(s_pad, t_pad, 0.08, mask)
        np.testing.assert_allclose(float(loss), float(loss_m), rtol=1e-5)
        np.testing.assert_allclose(float(sim), float(sim_m), rtol=1e-5,
                                   atol=1e-6)
        # unmasked padded value IS biased (sanity that the test can fail)
        loss_p, _ = fn(s_pad, t_pad, 0.08)
        assert not np.isclose(float(loss), float(loss_p), rtol=1e-5)


def test_shard_batch_zero_pads_mask(rng):
    from dinov2_distillation_tpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh()
    batch = {
        "image": rng.integers(0, 255, (5, 8, 8, 3)).astype(np.uint8),
        "mask": np.ones(5, np.float32),
    }
    out = shard_batch(batch, mesh)
    assert out["image"].shape[0] == 8
    got = np.asarray(out["mask"])
    np.testing.assert_array_equal(got, np.asarray([1, 1, 1, 1, 1, 0, 0, 0], np.float32))
    # images wrap-pad (duplicate), not zero-pad
    np.testing.assert_array_equal(
        np.asarray(out["image"][5]), np.asarray(out["image"][0]))


def test_fused_pair_loss_matches_xla(rng):
    """ops/scalekd_loss kernel (interpret): forward sums and input gradients
    must match the XLA spatial/frequency loss fns."""
    from dinov2_distillation_tpu.losses.scalekd import fused_pair_losses

    b, h, w, d = 3, 4, 4, 128
    pair = jnp.asarray(rng.standard_normal((2, b, h * w, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, h, w, d)).astype(np.float32))
    alphas = (0.08, 0.06)

    def fused(pair_):
        (l0, s0), (l1, s1) = fused_pair_losses(pair_, t, alphas, (0, 1),
                                               "interpret")
        return l0 + l1, (l0, l1, s0, s1)

    def ref(pair_):
        l0, s0 = spatial_loss_fn(pair_[0], t, alphas[0])
        l1, s1 = frequency_loss_fn(pair_[1], t, alphas[1])
        return l0 + l1, (l0, l1, s0, s1)

    (lf, auxf), gf = jax.value_and_grad(fused, has_aux=True)(pair)
    (lr, auxr), gr = jax.value_and_grad(ref, has_aux=True)(pair)
    for a, b_ in zip(auxf, auxr):
        np.testing.assert_allclose(float(a), float(b_), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)

    # spatial-only flags (the res4 cascade path)
    def fused_sp(pair_):
        (l0, _), (l1, _) = fused_pair_losses(pair_, t, (0.08, 0.08), (0, 0),
                                             "interpret")
        return l0 + l1

    def ref_sp(pair_):
        l0, _ = spatial_loss_fn(pair_[0], t, 0.08)
        l1, _ = spatial_loss_fn(pair_[1], t, 0.08)
        return l0 + l1

    np.testing.assert_allclose(float(fused_sp(pair)), float(ref_sp(pair)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(fused_sp)(pair)),
                               np.asarray(jax.grad(ref_sp)(pair)),
                               rtol=1e-4, atol=1e-6)


def test_fused_pair_loss_cos_cotangent():
    """The cosine output's VJP path is faithful too (even though training
    only differentiates the sq term). Own fixed rng: the session-shared
    stream made the rtol=1e-4 grad compare order-flaky (near-zero grad
    components; same class as the r3 engine-parity flake)."""
    from dinov2_distillation_tpu.ops.scalekd_loss import pair_loss_sums

    own = np.random.default_rng(20250821)
    b, n, d = 2, 16, 128
    pair = jnp.asarray(own.standard_normal((2, b, n, d)).astype(np.float32))
    t = jnp.asarray(own.standard_normal((b, n, d)).astype(np.float32))

    def cos_sum(pair_):
        return jnp.sum(pair_loss_sums(pair_, t, (0, 1), True)[:, 1])

    def cos_ref(pair_):
        outs = []
        for k, freq in enumerate((False, True)):
            s = pair_[k]
            tt = t
            if freq:
                s = s - jnp.mean(s, axis=1, keepdims=True)
                tt = t - jnp.mean(t, axis=1, keepdims=True)
            sn = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
            tn = tt / jnp.maximum(jnp.linalg.norm(tt, axis=-1, keepdims=True), 1e-12)
            outs.append(jnp.sum(sn * tn))
        return outs[0] + outs[1]

    np.testing.assert_allclose(float(cos_sum(pair)), float(cos_ref(pair)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(cos_sum)(pair)),
                               np.asarray(jax.grad(cos_ref)(pair)),
                               rtol=1e-4, atol=1e-6)


def test_attention_rejects_non_dividing_heads():
    """embed_dim % num_heads != 0 must raise (reference parity: the torch
    (B,N,nh,hd) reshape throws — scalekd.py:303-306; the lane-slice path
    would otherwise silently drop tail channels — found r4 at vitl dims)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from dinov2_distillation_tpu.losses.scalekd import (
        WindowMultiheadPosAttention)

    attn = WindowMultiheadPosAttention(
        embed_dim=1024, pos_dim=1024, num_heads=24, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 1024))
    with _pytest.raises(ValueError, match="not divisible"):
        attn.init(jax.random.PRNGKey(0), x, x)
