"""Metric logging: JSONL + TensorBoard + optional W&B, host-0 gated.

Replaces the reference's three wired channels (SURVEY.md §5): Lightning
``self.log(sync_dist=True)`` -> our metrics are already global scalars (the
jitted step reduces over the data mesh axis), TensorBoardLogger ->
``torch.utils.tensorboard`` writer when available, wandb(sync_tensorboard)
-> used when the package exists, silently skipped otherwise (zero-egress
environments). A JSONL stream is always written — it is the source of truth
the tooling (bench, tests) reads.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

from .logger import get_logger


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        *,
        is_main_process: bool = True,
        use_tensorboard: bool = True,
        wandb_cfg: Optional[Dict[str, Any]] = None,
        run_name: Optional[str] = None,
        hparams: Optional[Dict[str, Any]] = None,
    ):
        self.log_dir = log_dir
        self.is_main = is_main_process
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if not self.is_main:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)

        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception as e:  # pragma: no cover
                get_logger().warning(f"TensorBoard writer unavailable: {e}")

        if wandb_cfg:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_cfg.get("project"),
                    name=run_name,
                    tags=wandb_cfg.get("tags"),
                    notes=wandb_cfg.get("notes"),
                    config=hparams,
                    sync_tensorboard=True,
                )
            except Exception as e:
                get_logger().warning(f"wandb unavailable ({e}); continuing without it")

        if hparams is not None and self._tb is not None:
            self._tb.add_text("hparams", json.dumps(hparams, indent=2, default=str))

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.is_main:
            return
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), global_step=int(step))
        if self._wandb is not None:
            self._wandb.log(dict(scalars, global_step=int(step)), step=int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class ThroughputMeter:
    """Images/sec + step-time meter (the reference exposed only Lightning's
    tqdm it/s; throughput is our north-star so it is first-class)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._images = 0
        self._start = None
        self._last = None

    def tick(self, images_in_batch: int) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._count == self.warmup:
            self._start = now
            self._images = 0
        elif self._count > self.warmup:
            self._images += images_in_batch
        self._last = now

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self._last is None or self._last <= self._start:
            return 0.0
        return self._images / (self._last - self._start)

    @property
    def steps_measured(self) -> int:
        return max(0, self._count - self.warmup)
