"""bench.py helper coverage: the MFU/flops plumbing (VERDICT r4 #8).

``step_flops`` feeds the ``mfu`` field in the driver-recorded bench JSON;
pin it against a known GEMM so jax API drift (cost_analysis moving/return
shape changes) fails loudly here instead of silently dropping the field.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import step_flops  # noqa: E402


def test_step_flops_counts_gemm():
    m = k = n = 256

    @jax.jit
    def step(state, batch):
        return {"loss": jnp.sum(state @ batch)}

    a = jnp.zeros((m, k), jnp.bfloat16)
    b = jnp.zeros((k, n), jnp.bfloat16)
    f = step_flops(step, a, b)
    assert f is not None
    # XLA counts 2*M*N*K for the dot; the reduce adds M*N
    assert abs(f - 2 * m * n * k) / (2 * m * n * k) < 0.1, f


def test_step_flops_none_on_failure():
    assert step_flops(object(), None, None) is None
