"""Optimizer/scheduler factory: torch-semantics parity + grad accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dinov2_distillation_tpu.train.optim import create_optimizer


def _run_schedule(sched_cfg, updates_per_epoch=10, base_lr=1e-3, steps=()):
    cfg = {"type": "SGD", "kwargs": {"lr": base_lr}, "scheduler": sched_cfg}
    _, sched = create_optimizer(cfg, updates_per_epoch)
    return [float(sched(s)) for s in steps]


def test_cosine_annealing_matches_torch_formula():
    # torch CosineAnnealingLR: lr(e) = eta_min + (lr0-eta_min)(1+cos(pi e/T))/2
    vals = _run_schedule(
        {"type": "CosineAnnealingLR", "kwargs": {"T_max": 50, "eta_min": 1e-5}},
        updates_per_epoch=10, steps=[0, 10, 250, 500, 700],
    )
    import math

    def torch_lr(e):
        e = min(e, 50)
        return 1e-5 + (1e-3 - 1e-5) * (1 + math.cos(math.pi * e / 50)) / 2

    np.testing.assert_allclose(vals, [torch_lr(0), torch_lr(1), torch_lr(25),
                                      torch_lr(50), torch_lr(50)], rtol=1e-6)


def test_step_lr():
    vals = _run_schedule(
        {"type": "StepLR", "kwargs": {"step_size": 2, "gamma": 0.1}},
        updates_per_epoch=5, steps=[0, 9, 10, 20],
    )
    np.testing.assert_allclose(vals, [1e-3, 1e-3, 1e-4, 1e-5], rtol=1e-6)


def test_multistep_lr():
    vals = _run_schedule(
        {"type": "MultiStepLR", "kwargs": {"milestones": [3, 6], "gamma": 0.5}},
        updates_per_epoch=1, steps=[0, 2, 3, 5, 6, 9],
    )
    np.testing.assert_allclose(vals, [1e-3, 1e-3, 5e-4, 5e-4, 2.5e-4, 2.5e-4], rtol=1e-6)


def test_interval_step():
    vals = _run_schedule(
        {"type": "ExponentialLR", "kwargs": {"gamma": 0.9}, "interval": "step"},
        updates_per_epoch=100, steps=[0, 1, 2],
    )
    np.testing.assert_allclose(vals, [1e-3, 9e-4, 8.1e-4], rtol=1e-5)


def test_unknown_types_raise():
    with pytest.raises(KeyError):
        create_optimizer({"type": "Lion", "kwargs": {}}, 10)
    with pytest.raises(KeyError):
        create_optimizer({"type": "SGD", "kwargs": {},
                          "scheduler": {"type": "OneCycleLR", "kwargs": {}}}, 10)


def test_grad_accumulation_equivalence():
    """MultiSteps over k micro-batches == one step on the averaged gradient
    (Lightning accumulate_grad_batches semantics)."""
    params = {"w": jnp.asarray([1.0, 2.0])}
    grads = [{"w": jnp.asarray([0.1, -0.2])}, {"w": jnp.asarray([0.3, 0.4])}]

    tx_plain, _ = create_optimizer({"type": "SGD", "kwargs": {"lr": 0.1}}, 10)
    tx_accum, _ = create_optimizer({"type": "SGD", "kwargs": {"lr": 0.1}}, 10,
                                   accumulate_grad_batches=2)

    mean_grad = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    s = tx_plain.init(params)
    upd, _ = tx_plain.update(mean_grad, s, params)
    want = optax.apply_updates(params, upd)

    s2 = tx_accum.init(params)
    p2 = params
    for g in grads:
        upd2, s2 = tx_accum.update(g, s2, p2)
        p2 = optax.apply_updates(p2, upd2)

    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(want["w"]), rtol=1e-6)


def test_clip_by_global_norm_applied():
    tx, _ = create_optimizer({"type": "SGD", "kwargs": {"lr": 1.0}}, 10, clip_norm=1.0)
    params = {"w": jnp.zeros(3)}
    big = {"w": jnp.asarray([30.0, 40.0, 0.0])}  # norm 50 -> scaled to 1
    s = tx.init(params)
    upd, _ = tx.update(big, s, params)
    got = np.asarray(upd["w"])
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, rtol=1e-5)
