"""BatchNorm statistics scope: sync (global-batch) vs per-replica groups.

The reference trains non-timm students with per-replica BN (each GPU's local
moments; SyncBN only for timm — ``models/backbones/timm.py:273-274``).
``GroupedBatchNorm`` reproduces that deterministically as grouped moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from dinov2_distillation_tpu.models.backbones import common
from dinov2_distillation_tpu.models.backbones.common import (
    ConvBN,
    GroupedBatchNorm,
    batch_norm,
    get_bn_groups,
    set_bn_groups,
)


@pytest.fixture(autouse=True)
def _reset_groups():
    yield
    set_bn_groups(1)


def _run(mod, x, train=True):
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, mut = mod.apply(variables, x, mutable=["batch_stats"])
    return y, variables, mut["batch_stats"]


def test_single_group_matches_flax_batchnorm(rng):
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 16)).astype(np.float32))
    ours = GroupedBatchNorm(use_running_average=False, groups=1,
                            dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    y1, _, s1 = _run(ours, x)
    y2, _, s2 = _run(ref, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1["mean"]), np.asarray(s2["mean"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["var"]), np.asarray(s2["var"]),
                               rtol=1e-5)


def test_grouped_equals_independent_per_group(rng):
    """G=4 output == running plain BN on each quarter of the batch."""
    x = jnp.asarray(rng.standard_normal((8, 3, 3, 5)).astype(np.float32))
    grouped = GroupedBatchNorm(use_running_average=False, groups=4,
                               dtype=jnp.float32)
    yg, _, _ = _run(grouped, x)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    for g in range(4):
        sl = slice(g * 2, (g + 1) * 2)
        yr, _, _ = _run(ref, x[sl])
        np.testing.assert_allclose(np.asarray(yg[sl]), np.asarray(yr),
                                   atol=1e-5)


def test_param_tree_identical_between_modes(rng):
    """Checkpoints must be interchangeable between sync and grouped BN."""
    x = jnp.zeros((8, 4, 4, 6), jnp.float32)
    a = GroupedBatchNorm(use_running_average=False, groups=2, dtype=jnp.float32)
    b = nn.BatchNorm(use_running_average=False, dtype=jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(0), x)
    ta = jax.tree_util.tree_map(lambda v: (v.shape, v.dtype), va)
    tb = jax.tree_util.tree_map(lambda v: (v.shape, v.dtype), vb)
    assert ta == tb


def test_eval_uses_running_stats(rng):
    x = jnp.asarray(rng.standard_normal((8, 2, 2, 3)).astype(np.float32) * 3 + 1)
    mod = GroupedBatchNorm(use_running_average=False, groups=4, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # several train steps to move the EMA
    stats = variables["batch_stats"]
    for _ in range(50):
        _, mut = mod.apply({**variables, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
        stats = mut["batch_stats"]
    eval_mod = GroupedBatchNorm(use_running_average=True, groups=4,
                                dtype=jnp.float32)
    y = eval_mod.apply({**variables, "batch_stats": stats}, x)
    # normalized with (near-converged) running stats -> near zero-mean/unit-var
    assert abs(float(jnp.mean(y))) < 0.3
    assert 0.5 < float(jnp.std(y)) < 1.5


def test_factory_honors_global_flag(rng):
    x = jnp.asarray(rng.standard_normal((8, 2, 2, 4)).astype(np.float32))
    set_bn_groups(4)
    assert get_bn_groups() == 4
    bn = batch_norm(True, dtype=jnp.float32)
    assert isinstance(bn, GroupedBatchNorm)
    y, _, _ = _run(bn, x)
    assert y.shape == x.shape
    set_bn_groups(1)
    assert isinstance(batch_norm(True), nn.BatchNorm)


def test_convbn_runs_grouped(rng):
    set_bn_groups(2)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    mod = ConvBN(features=8, kernel=3, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, mut = mod.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (4, 8, 8, 8)
    assert "bn" in mut["batch_stats"]
