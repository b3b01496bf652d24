"""Process-level JAX setup: persistent compilation cache.

The axon TPU tunnel compiles remotely and slowly (tens of minutes for the
full train step); the persistent cache makes every subsequent process start
in seconds. Called by the CLIs (train.py, bench.py) — harmless off-TPU.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "DKT_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".dkt_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
