"""Training checkpoints: monitored top-k + last + full resume (orbax).

Parity with the reference's Lightning ``ModelCheckpoint`` semantics
(``train.py:247-254``, ``config/config.yaml:81-85``): keep the ``save_top_k``
best checkpoints by a monitored metric (``val_scalekd_res5_spatial_similarity``,
mode=max), always keep the latest for crash recovery (``save_last=True``), and
restore the *complete* training state — params, frozen teacher, BN stats,
optimizer state, step/epoch, RNG — for resume (``train.py:282-285``).

Implemented as two orbax CheckpointManagers over the same state pytree:
``<dir>/best`` (max_to_keep=save_top_k, best_fn=monitor) and ``<dir>/last``
(max_to_keep=1).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .logger import get_logger


class DistillCheckpointManager:
    def __init__(
        self,
        dirpath: str,
        *,
        monitor: str = "val_scalekd_res5_spatial_similarity",
        mode: str = "max",
        save_top_k: int = 1,
    ):
        self.dirpath = os.path.abspath(dirpath)
        self.monitor = monitor
        self.mode = mode
        os.makedirs(self.dirpath, exist_ok=True)

        self._best = ocp.CheckpointManager(
            os.path.join(self.dirpath, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max(1, int(save_top_k)),
                best_fn=lambda metrics: float(metrics[monitor]),
                best_mode=mode,
                create=True,
            ),
        )
        self._last = ocp.CheckpointManager(
            os.path.join(self.dirpath, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )

    def save(self, step: int, state: Any, metrics: Dict[str, float],
             extra: Optional[Dict[str, Any]] = None) -> None:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        metrics = {k: float(v) for k, v in metrics.items()}
        if self.monitor in metrics:
            self._best.save(step, args=ocp.args.StandardSave(payload), metrics=metrics)
        self._last.save(step, args=ocp.args.StandardSave(payload), metrics=metrics)

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    # --- restore ------------------------------------------------------------

    def _restore_from(self, mgr, step: int, abstract_state: Any,
                      abstract_extra: Optional[Any]) -> Tuple[Any, Dict[str, Any]]:
        target = {"state": abstract_state}
        if abstract_extra is not None:
            target["extra"] = abstract_extra
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return restored["state"], restored.get("extra", {})

    def restore_last(self, abstract_state: Any, abstract_extra: Optional[Any] = None):
        step = self._last.latest_step()
        if step is None:
            return None
        get_logger().info(f"Resuming from last checkpoint at step {step}")
        state, extra = self._restore_from(self._last, step, abstract_state, abstract_extra)
        return step, state, extra

    def restore_best(self, abstract_state: Any, abstract_extra: Optional[Any] = None):
        step = self._best.best_step()
        if step is None:
            return None
        get_logger().info(f"Restoring best checkpoint (step {step})")
        state, extra = self._restore_from(self._best, step, abstract_state, abstract_extra)
        return step, state, extra

    def best_step(self) -> Optional[int]:
        return self._best.best_step()

    def close(self) -> None:
        self.wait()
        self._best.close()
        self._last.close()
