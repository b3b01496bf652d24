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
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[int], float]


class HostLRScaleState(NamedTuple):
    """Opt-state leaf holding a host-controlled LR multiplier.

    ``ReduceLROnPlateau`` is inherently host-driven (it reacts to validation
    metrics between epochs), so instead of threading the metric into the
    jitted step, the update is scaled by this state scalar and the host
    rewrites it at epoch boundaries (``set_lr_scale``). Scaling the final
    update (gradient term + decoupled weight decay) is exactly what scaling
    ``lr`` does in torch AdamW.
    """

    scale: jnp.ndarray


def host_lr_scale() -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return HostLRScaleState(jnp.asarray(1.0, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map(
            lambda u: u * state.scale.astype(u.dtype), updates)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def _is_scale_leaf(x) -> bool:
    return isinstance(x, HostLRScaleState)


def get_lr_scale(opt_state) -> float:
    """Read the plateau LR multiplier out of an opt state (1.0 if absent)."""
    vals = [
        float(leaf.scale) for leaf in jax.tree_util.tree_leaves(
            opt_state, is_leaf=_is_scale_leaf) if _is_scale_leaf(leaf)
    ]
    return vals[0] if vals else 1.0


def set_lr_scale(opt_state, scale: float):
    """Return a copy of ``opt_state`` with the plateau multiplier replaced."""
    def repl(x):
        if _is_scale_leaf(x):
            return HostLRScaleState(jnp.asarray(scale, jnp.float32))
        return x

    return jax.tree_util.tree_map(repl, opt_state, is_leaf=_is_scale_leaf)


class PlateauController:
    """Host-side ``ReduceLROnPlateau`` with torch semantics
    (torch.optim.lr_scheduler.ReduceLROnPlateau; reference resolves it by
    name at ``train/distillation_module.py:484-487`` and wires
    ``monitor``/``frequency`` at ``:495-501``).

    ``step(value)`` consumes the monitored validation metric and returns the
    current LR multiplier (product of ``factor`` reductions, floored at
    ``min_lr / base_lr``).
    """

    def __init__(self, kwargs: Dict[str, Any], base_lr: float):
        kw = dict(kwargs or {})
        self.mode = str(kw.get("mode", "min"))
        self.factor = float(kw.get("factor", 0.1))
        self.patience = int(kw.get("patience", 10))
        self.threshold = float(kw.get("threshold", 1e-4))
        self.threshold_mode = str(kw.get("threshold_mode", "rel"))
        self.cooldown = int(kw.get("cooldown", 0))
        self.min_lr = float(kw.get("min_lr", 0.0))
        self.base_lr = float(base_lr)
        if self.mode not in ("min", "max"):
            raise KeyError(f"ReduceLROnPlateau mode must be min|max, got {self.mode!r}")
        if self.threshold_mode not in ("rel", "abs"):
            raise KeyError(
                f"ReduceLROnPlateau threshold_mode must be rel|abs, got {self.threshold_mode!r}")
        self.best = math.inf if self.mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def _is_better(self, a: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < self.best * (1.0 - self.threshold)
            return a < self.best - self.threshold
        if self.threshold_mode == "rel":
            return a > self.best * (1.0 + self.threshold)
        return a > self.best + self.threshold

    def step(self, value: float) -> float:
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            floor = self.min_lr / self.base_lr if self.base_lr > 0 else 0.0
            self.scale = max(self.scale * self.factor, floor)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> Dict[str, Any]:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "scale": self.scale,
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.best = float(sd.get("best", self.best))
        self.num_bad_epochs = int(sd.get("num_bad_epochs", 0))
        self.cooldown_counter = int(sd.get("cooldown_counter", 0))
        self.scale = float(sd.get("scale", 1.0))


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

    elif stype == "ReduceLROnPlateau":
        # Host-driven: the schedule is flat at base_lr; the reduction factor
        # is a HostLRScaleState multiplier the trainer updates from val
        # metrics via a PlateauController (see class docstring).
        def fn(step):
            return base_lr

    elif stype == "PolynomialLR":
        total = int(kw.get("total_iters", 5))
        power = float(kw.get("power", 1.0))

        def fn(step):
            e = jnp.minimum(epoch_of(step), total)
            return base_lr * (1.0 - e / total) ** power

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
    if otype == "Adadelta":
        return optax.adadelta(
            learning_rate=lr, rho=float(kw.get("rho", 0.9)),
            eps=float(kw.get("eps", 1e-6)),
            weight_decay=float(kw.get("weight_decay", 0.0)),
        )
    if otype == "Adamax":
        betas = kw.get("betas", (0.9, 0.999))
        return optax.adamax(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
            eps=float(kw.get("eps", 1e-8)),
        )
    if otype == "NAdam":
        betas = kw.get("betas", (0.9, 0.999))
        return optax.nadam(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
            eps=float(kw.get("eps", 1e-8)),
        )
    if otype == "RAdam":
        betas = kw.get("betas", (0.9, 0.999))
        return optax.radam(
            learning_rate=lr, b1=float(betas[0]), b2=float(betas[1]),
            eps=float(kw.get("eps", 1e-8)),
        )
    raise KeyError(f"Unsupported optimizer type: {otype!r}")


def create_optimizer(
    opt_cfg: Dict[str, Any],
    updates_per_epoch: int,
    accumulate_grad_batches: int = 1,
    clip_norm: float = 1.0,
    flatten: bool = True,
    freeze_mask=None,
) -> Tuple[optax.GradientTransformation, Schedule]:
    """Build the full gradient transformation + the LR schedule (for logging).

    ``updates_per_epoch`` counts *optimizer* updates (micro-steps /
    accumulation), since torch schedulers tick per epoch of optimizer steps.

    ``flatten`` wraps the whole chain in ``optax.flatten``: clip + the
    elementwise optimizer run on ONE raveled parameter vector instead of
    per-leaf, collapsing the hundreds of tiny per-parameter kernels in the
    step's tail into a few full-width VPU ops. Mathematically identical
    (global-norm clip is global either way; AdamW is elementwise); config
    ``optimizer.flatten: false`` opts out.
    """
    kw = dict(opt_cfg.get("kwargs", {}) or {})
    base_lr = float(kw.get("lr", 1e-3))
    sched_cfg = opt_cfg.get("scheduler")
    schedule = _build_scheduler(sched_cfg, base_lr, updates_per_epoch)

    parts = [
        optax.clip_by_global_norm(clip_norm),
        _build_base_optimizer(opt_cfg["type"], kw, schedule),
    ]
    if sched_cfg and sched_cfg.get("type") == "ReduceLROnPlateau":
        parts.append(host_lr_scale())
    tx = optax.chain(*parts)
    if bool(opt_cfg.get("flatten", flatten)):
        tx = optax.flatten(tx)
    if freeze_mask is not None:
        # zero the final updates on frozen params (reference freeze_at /
        # FrozenBN machinery, resnet.py:697-719): stop_gradient alone
        # would still let decoupled weight decay move them. Outside the
        # flatten wrap so the mask sees the real param tree.
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), freeze_mask))
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx, schedule


def create_plateau_controller(
    opt_cfg: Dict[str, Any],
) -> Optional[Tuple[PlateauController, str, int]]:
    """(controller, monitor, frequency) when the config asks for
    ReduceLROnPlateau, else None. ``monitor`` defaults to ``val_loss`` and
    ``frequency`` to 1, like Lightning's lr_scheduler config dict
    (reference ``train/distillation_module.py:495-501``)."""
    sched = opt_cfg.get("scheduler")
    if not sched or sched.get("type") != "ReduceLROnPlateau":
        return None
    kw = dict(opt_cfg.get("kwargs", {}) or {})
    base_lr = float(kw.get("lr", 1e-3))
    controller = PlateauController(sched.get("kwargs", {}), base_lr)
    monitor = str(sched.get("monitor", "val_loss"))
    frequency = int(sched.get("frequency", 1))
    return controller, monitor, frequency
