"""Multi-level loss orchestration: the TPP cascade quirks end-to-end
(reference train/distillation_module.py:180-246)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.models.vit import DINOv2ViT, ViTConfig
from dinov2_distillation_tpu.models.zoo import create_student
from dinov2_distillation_tpu.train.distill import DistillationModel


def _model(levels, depth=8):
    teacher = DINOv2ViT(ViTConfig("tiny", 32, depth, 2, pos_grid=7), dtype=jnp.float32)
    student, channels = create_student(
        "resnet_18", (4, 4), [lv for lv in levels], dtype=jnp.float32)
    kw = dict(teacher_dims=32, pos_dims=32, pos_hw=[4, 4], query_hw=[4, 4],
              alpha=[0.08, 0.06], window_shapes=[1, 1], softmax_scale=[5.0, 5.0],
              num_heads=2)
    specs = tuple(
        (f"scalekd_{lv}", 1.0, dict(kw, self_query=(lv != "res5"),
                                    student_dims=channels[lv]))
        for lv in levels
    )
    return DistillationModel(teacher=teacher, student=student,
                             loss_specs=specs, dtype=jnp.float32)


@pytest.mark.slow
def test_three_level_cascade(rng):
    """res3 -> res4 -> res5 chains queries through teacher-block suffixes and
    emits per-level metrics; break after res5."""
    model = _model(["res5", "res4", "res3"])
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x, False))()
    loss, metrics = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    for lv in ("res3", "res4", "res5"):
        assert f"scalekd_{lv}_total_loss" in metrics
        assert f"scalekd_{lv}_spatial_similarity" in metrics
    want = sum(float(metrics[f"scalekd_{lv}_total_loss"])
               for lv in ("res3", "res4", "res5"))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


@pytest.mark.slow
def test_res5_break_skips_levels_after(rng):
    """Sorted iteration breaks after the res5 head: with heads named res5 and
    res6(!), res6 sorts after res5 and must be ignored
    (reference :207-224 `break`)."""
    teacher = DINOv2ViT(ViTConfig("tiny", 32, 4, 2, pos_grid=7), dtype=jnp.float32)
    student, channels = create_student("resnet_18", (4, 4), ["res5", "res4"],
                                       dtype=jnp.float32)
    kw = dict(teacher_dims=32, pos_dims=32, pos_hw=[4, 4], query_hw=[4, 4],
              alpha=[0.08, 0.06], window_shapes=[1, 1], softmax_scale=[5.0, 5.0],
              num_heads=2, self_query=True)
    specs = (
        ("scalekd_res5", 1.0, dict(kw, student_dims=channels["res5"])),
        ("scalekd_res6", 1.0, dict(kw, student_dims=channels["res5"])),
    )
    model = DistillationModel(teacher=teacher, student=student,
                              loss_specs=specs, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x, False))()
    _, metrics = model.apply(variables, x, False)
    assert "scalekd_res5_total_loss" in metrics
    assert not any(k.startswith("scalekd_res6") for k in metrics)


@pytest.mark.slow
def test_cascade_queries_affect_res5(rng):
    """The res5 projectors must consume the res4 cascade outputs: zeroing the
    res4 head's influence changes the res5 losses."""
    model = _model(["res5", "res4"])
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, x, False))()
    _, m_full = model.apply(variables, x, False)

    # res5-only model with identical res5 head params
    model5 = _model(["res5"])
    # self_query=False res5 without a cascade must raise
    with pytest.raises(ValueError):
        model5.init({"params": jax.random.PRNGKey(0)}, x, False)
