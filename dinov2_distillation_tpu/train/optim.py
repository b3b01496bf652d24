"""Optimizer / LR-scheduler factory from the torch-named config surface.

The reference resolves ``optimizer.type`` / ``optimizer.scheduler.type`` by
name via ``getattr(torch.optim, ...)`` (``train/distillation_module.py:476-489``)
— we keep the exact same YAML surface (``AdamW`` + ``CosineAnnealingLR`` etc.,
torch kwarg names included) and map it onto optax transforms:

  chain(clip_by_global_norm(1.0),          # Lightning gradient_clip_val=1.0
        <optimizer>(<schedule>))           # schedule in torch "scheduler.step()
                                           #  per epoch" semantics
  wrapped in optax.MultiSteps for ``accumulate_grad_batches``.

Torch scheduler semantics are epoch-quantized: the learning rate is a
function of ``epoch = opt_step // updates_per_epoch`` when
``interval: epoch`` (the reference default), or of the raw optimizer step
when ``interval: step``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import optax

Schedule = Callable[[int], float]


def _build_scheduler(
    sched_cfg: Optional[Dict[str, Any]], base_lr: float, updates_per_epoch: int
) -> Schedule:
    if not sched_cfg:
        return lambda step: base_lr

    stype = sched_cfg["type"]
    kw = dict(sched_cfg.get("kwargs", {}) or {})
    interval = sched_cfg.get("interval", "epoch")

    # Schedules are traced inside the jitted step (optax passes a traced
    # count), so they must be written with jnp ops, not Python control flow.
    def epoch_of(step):
        return step // updates_per_epoch if interval == "epoch" else step

    if stype == "CosineAnnealingLR":
        t_max = int(kw["T_max"])
        eta_min = float(kw.get("eta_min", 0.0))

        def fn(step):
            e = jnp.minimum(epoch_of(step), t_max)
            return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * e / t_max)) / 2

    elif stype == "StepLR":
        step_size = int(kw["step_size"])
        gamma = float(kw.get("gamma", 0.1))

        def fn(step):
            return base_lr * gamma ** (epoch_of(step) // step_size)

    elif stype == "MultiStepLR":
        milestones = jnp.asarray(sorted(int(m) for m in kw["milestones"]))
        gamma = float(kw.get("gamma", 0.1))

        def fn(step):
            e = epoch_of(step)
            return base_lr * gamma ** jnp.sum(e >= milestones)

    elif stype == "ExponentialLR":
        gamma = float(kw["gamma"])

        def fn(step):
            return base_lr * gamma ** epoch_of(step)

    elif stype == "LinearLR":
        start = float(kw.get("start_factor", 1.0 / 3))
        end = float(kw.get("end_factor", 1.0))
        total = int(kw.get("total_iters", 5))

        def fn(step):
            e = jnp.minimum(epoch_of(step), total)
            return base_lr * (start + (end - start) * e / total)

    elif stype == "ConstantLR":
        factor = float(kw.get("factor", 1.0 / 3))
        total = int(kw.get("total_iters", 5))

        def fn(step):
            return base_lr * jnp.where(epoch_of(step) < total, factor, 1.0)

    elif stype == "CosineAnnealingWarmRestarts":
        t0 = int(kw["T_0"])
        t_mult = int(kw.get("T_mult", 1))
        eta_min = float(kw.get("eta_min", 0.0))

        def fn(step):
            e = epoch_of(step)
            if t_mult == 1:
                t_i = t0
                t_cur = e % t0
            else:
                # closed form: number of completed restart cycles
                n = jnp.floor(
                    jnp.log1p((t_mult - 1) * e / t0) / math.log(t_mult)
                ).astype(jnp.int32)
                t_i = t0 * t_mult ** n
                t_cur = e - t0 * (t_mult ** n - 1) // (t_mult - 1)
            return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * t_cur / t_i)) / 2

    else:
        raise KeyError(f"Unsupported scheduler type: {stype!r}")

    return fn


def _build_base_optimizer(otype: str, kw: Dict[str, Any], schedule: Schedule):
    lr = schedule
    if otype == "AdamW":
        betas = kw.get("betas", (0.9, 0.999))
        return optax.adamw(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
            eps=float(kw.get("eps", 1e-8)),
            weight_decay=float(kw.get("weight_decay", 0.01)),
        )
    if otype == "Adam":
        betas = kw.get("betas", (0.9, 0.999))
        return optax.adam(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
            eps=float(kw.get("eps", 1e-8)),
        )
    if otype == "SGD":
        mom = float(kw.get("momentum", 0.0))
        wd = float(kw.get("weight_decay", 0.0))
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.sgd(
            learning_rate=lr, momentum=mom if mom else None,
            nesterov=bool(kw.get("nesterov", False)),
        ))
        return optax.chain(*parts)
    if otype == "RMSprop":
        return optax.rmsprop(
            learning_rate=lr, decay=float(kw.get("alpha", 0.99)),
            eps=float(kw.get("eps", 1e-8)), momentum=float(kw.get("momentum", 0.0)),
        )
    if otype == "Adagrad":
        return optax.adagrad(learning_rate=lr, eps=float(kw.get("eps", 1e-10)))
    raise KeyError(f"Unsupported optimizer type: {otype!r}")


def create_optimizer(
    opt_cfg: Dict[str, Any],
    updates_per_epoch: int,
    accumulate_grad_batches: int = 1,
    clip_norm: float = 1.0,
) -> Tuple[optax.GradientTransformation, Schedule]:
    """Build the full gradient transformation + the LR schedule (for logging).

    ``updates_per_epoch`` counts *optimizer* updates (micro-steps /
    accumulation), since torch schedulers tick per epoch of optimizer steps.
    """
    kw = dict(opt_cfg.get("kwargs", {}) or {})
    base_lr = float(kw.get("lr", 1e-3))
    schedule = _build_scheduler(opt_cfg.get("scheduler"), base_lr, updates_per_epoch)

    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        _build_base_optimizer(opt_cfg["type"], kw, schedule),
    )
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx, schedule
