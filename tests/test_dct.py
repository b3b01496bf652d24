"""DCT golden tests vs scipy (SURVEY.md §4 test plan) and the DC-removal
equivalence that the frequency loss relies on."""

import jax.numpy as jnp
import numpy as np
import scipy.fftpack

from dinov2_distillation_tpu.ops.dct import (
    dct2,
    dct_matrix,
    idct2,
    idct_matrix,
    remove_dc_2d,
)


def test_dct_matrix_matches_scipy(rng):
    n = 16
    x = rng.standard_normal((4, n)).astype(np.float32)
    ours = x @ dct_matrix(n).T
    golden = scipy.fftpack.dct(x, type=2, norm=None, axis=-1)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_idct_is_exact_inverse(rng):
    n = 16
    x = rng.standard_normal((3, n)).astype(np.float32)
    y = x @ dct_matrix(n).T
    back = y @ idct_matrix(n).T
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_dct2_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct2(dct2(x))), np.asarray(x), atol=1e-4)


def test_dct2_matches_scipy_2d(rng):
    x = rng.standard_normal((16, 16)).astype(np.float32)
    ours = np.asarray(dct2(jnp.asarray(x)))
    golden = scipy.fftpack.dct(
        scipy.fftpack.dct(x, type=2, norm=None, axis=-1), type=2, norm=None, axis=-2
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-2)


def test_remove_dc_equals_transform_domain_form(rng):
    """The hot-path mean-subtraction must equal DCT->zero DC->IDCT.

    This is the identity that lets frequency_loss_fn skip the transforms
    (reference losses/scalekd.py:107-118 built the DCT per call).
    """
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 16)).astype(np.float32))
    transform_form = np.asarray(remove_dc_2d(x))
    mean_form = np.asarray(x - jnp.mean(x, axis=(-2, -1), keepdims=True))
    np.testing.assert_allclose(transform_form, mean_form, atol=1e-4)
