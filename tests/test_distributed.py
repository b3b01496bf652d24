"""Sharded-training tests on the virtual 8-device CPU mesh (SURVEY.md §4):
dryrun of the full step, and 1-device vs 8-device gradient equivalence (the
DDP-allreduce parity property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.models.vit import DINOv2ViT, ViTConfig
from dinov2_distillation_tpu.models.zoo import create_student
from dinov2_distillation_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from dinov2_distillation_tpu.train.distill import DistillationModel
from dinov2_distillation_tpu.train.optim import create_optimizer
from dinov2_distillation_tpu.train.state import init_state, make_train_step


def _tiny_model():
    teacher = DINOv2ViT(ViTConfig("tiny", 32, 2, 2, pos_grid=37), dtype=jnp.float32)
    student, channels = create_student("resnet_18", (4, 4), ["res5", "res4"],
                                       dtype=jnp.float32)
    kw = dict(teacher_dims=32, pos_dims=32, pos_hw=[4, 4], query_hw=[4, 4],
              alpha=[0.08, 0.06], window_shapes=[1, 1], softmax_scale=[5.0, 5.0])
    specs = (
        ("scalekd_res4", 1.0, dict(kw, self_query=True, num_heads=2,
                                   student_dims=channels["res4"])),
        ("scalekd_res5", 1.0, dict(kw, self_query=False, num_heads=2,
                                   student_dims=channels["res5"])),
    )
    return DistillationModel(teacher=teacher, student=student,
                             loss_specs=specs, dtype=jnp.float32)


def _batch(global_batch=8, crop=56, seed=0):
    r = np.random.default_rng(seed)
    return {
        "image": r.integers(0, 256, (global_batch, crop, crop, 3), dtype=np.uint8),
        "erase": np.zeros((global_batch, 4), np.int32),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    model = _tiny_model()
    # SGD: the update is linear in the gradient, so 1-vs-8-device param
    # deltas compare meaningfully (AdamW's g/sqrt(v) at step 1 amplifies
    # reduction-order float noise on near-zero grads into sign flips).
    tx, _ = create_optimizer(
        {"type": "SGD", "kwargs": {"lr": 1e-2}},
        updates_per_epoch=10)
    batch = _batch()
    state = init_state(model, tx, batch, seed=0)
    return model, tx, batch, state


def _run_step(model, tx, state, batch_np, devices):
    mesh = create_mesh(devices)
    sharding = batch_sharding(mesh)
    batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch_np)
    # deep-copy: the jitted step donates its input state, and the fixture's
    # state is reused across parametrized runs
    state = jax.tree_util.tree_map(lambda x: np.array(x), state)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx)
    new_state, metrics = step(state, batch)
    jax.block_until_ready(new_state.params)
    return new_state, {k: float(v) for k, v in metrics.items()}


def test_one_vs_eight_device_equivalence(tiny_setup):
    """Same global batch on 1 vs 8 devices must produce the same loss and
    (numerically close) updated params — the psum-mean gradient reduction
    replaces DDP allreduce transparently."""
    model, tx, batch, state = tiny_setup
    s1, m1 = _run_step(model, tx, state, batch, jax.devices()[:1])
    s8, m8 = _run_step(model, tx, state, batch, jax.devices()[:8])
    assert np.isclose(m1["loss"], m8["loss"], rtol=1e-4), (m1["loss"], m8["loss"])
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_batch_stats_are_global(tiny_setup):
    """BN statistics over a data-sharded batch equal the full-batch stats
    (sync-BN semantics; documented divergence from the reference's
    per-replica BN — SURVEY.md §2.6)."""
    model, tx, batch, state = tiny_setup
    s1, _ = _run_step(model, tx, state, batch, jax.devices()[:1])
    s8, _ = _run_step(model, tx, state, batch, jax.devices()[:8])
    flat1 = jax.tree_util.tree_leaves(s1.batch_stats)
    flat8 = jax.tree_util.tree_leaves(s8.batch_stats)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_graft_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
