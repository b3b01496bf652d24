"""Profiling hooks: jax.profiler traces + step-time accounting.

The reference has no tracing at all (SURVEY.md §5 — only Lightning's tqdm);
here throughput is the north star, so trace capture is first-class:
``with trace_steps(logdir): ...`` wraps a few training steps in a
``jax.profiler`` trace viewable in TensorBoard/XProf or Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

from .logger import get_logger


@contextlib.contextmanager
def trace_steps(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed steps."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    get_logger().info(f"Capturing jax.profiler trace to {logdir}")
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        get_logger().info(f"Trace written to {logdir}")


class StepTimer:
    """Wall-clock accounting per phase (data / step / logging)."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._t: Optional[float] = None
        self._phase: Optional[str] = None

    def phase(self, name: str) -> None:
        now = time.perf_counter()
        if self._phase is not None and self._t is not None:
            self._acc[self._phase] = self._acc.get(self._phase, 0.0) + (now - self._t)
        self._phase, self._t = name, now

    def stop(self) -> None:
        self.phase("__end__")
        self._phase = None

    def summary(self) -> Dict[str, float]:
        total = sum(v for k, v in self._acc.items() if k != "__end__")
        out = {k: v for k, v in self._acc.items() if k != "__end__"}
        out["total"] = total
        return out

    def reset(self) -> None:
        self._acc.clear()
        self._phase = None
        self._t = None
