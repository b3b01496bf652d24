"""End-to-end smoke: distillation training makes progress (SURVEY.md §4 —
loss decreases, the monitored spatial similarity increases)."""

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_distillation_tpu.models.vit import DINOv2ViT, ViTConfig
from dinov2_distillation_tpu.models.zoo import create_student
from dinov2_distillation_tpu.train.distill import DistillationModel
from dinov2_distillation_tpu.train.optim import create_optimizer
from dinov2_distillation_tpu.train.state import init_state, make_eval_step, make_train_step


def test_training_improves_similarity(rng):
    teacher = DINOv2ViT(ViTConfig("tiny", 32, 2, 2, pos_grid=37), dtype=jnp.float32)
    student, channels = create_student("stdc_1", (4, 4), ["res5", "res4"],
                                       dtype=jnp.float32)
    kw = dict(teacher_dims=32, pos_dims=32, pos_hw=[4, 4], query_hw=[4, 4],
              alpha=[0.08, 0.06], window_shapes=[1, 1], softmax_scale=[5.0, 5.0])
    specs = (
        ("scalekd_res4", 1.0, dict(kw, self_query=True, num_heads=2,
                                   student_dims=channels["res4"])),
        ("scalekd_res5", 1.0, dict(kw, self_query=False, num_heads=2,
                                   student_dims=channels["res5"])),
    )
    model = DistillationModel(teacher=teacher, student=student,
                              loss_specs=specs, dtype=jnp.float32)
    tx, _ = create_optimizer(
        {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.01},
         "scheduler": {"type": "CosineAnnealingLR", "kwargs": {"T_max": 5}}},
        updates_per_epoch=5)

    batch = {
        "image": rng.integers(0, 256, (4, 56, 56, 3), dtype=np.uint8),
        "erase": np.zeros((4, 4), np.int32),
    }
    state = init_state(model, tx, batch, seed=0)
    step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    first = eval_step(state, jb)
    losses = []
    for _ in range(10):
        state, metrics = step(state, jb)
        losses.append(float(metrics["loss"]))
    last = eval_step(state, jb)

    assert losses[-1] < losses[0] * 0.9, losses
    assert float(last["loss"]) < float(first["loss"])
    # the checkpoint-monitored metric must improve
    key = "scalekd_res5_spatial_similarity"
    assert float(last[key]) > float(first[key]), (float(first[key]), float(last[key]))
    # grad norm is finite and nonzero
    assert 0.0 < losses[0] < 1e6
