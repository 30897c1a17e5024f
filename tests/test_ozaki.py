"""Ozaki exact-split f64 matmul vs the reference f64 product."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detqmc_tpu.linalg.ozaki import matmul_f64


def _rel_err(got, ref):
    scale = np.maximum(np.abs(ref).max(axis=(-2, -1), keepdims=True),
                       1e-300)
    return (np.abs(got - ref) / scale).max()


@pytest.mark.parametrize("shape", [(8, 8), (64, 64), (3, 64, 64),
                                   (33, 40)])
def test_matmul_f64_random(shape):
    rng = np.random.default_rng(0)
    *lead, m, k = shape
    n = k + 5
    A = rng.standard_normal((*lead, m, k))
    B = rng.standard_normal((*lead, k, n))
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    ref = A @ B
    assert _rel_err(got, ref) < 1e-13


def test_matmul_f64_graded():
    """The stabilization V factors span huge dynamic ranges across rows
    and columns — the row/column power-of-two scaling must absorb it."""
    rng = np.random.default_rng(1)
    n = 64
    A = rng.standard_normal((n, n)) * np.exp(
        np.linspace(-40, 10, n))[:, None]
    B = rng.standard_normal((n, n)) * np.exp(
        np.linspace(8, -35, n))[None, :]
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    ref = A @ B
    # per-row relative accuracy (row scales factor out exactly)
    row_scale = np.maximum(np.abs(ref).max(axis=-1, keepdims=True), 1e-300)
    assert (np.abs(got - ref) / row_scale).max() < 1e-12


def test_matmul_f64_large_k_stays_exact():
    """k > 256 shrinks the limb width so the f32 accumulation stays
    error-free."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((16, 512))
    B = rng.standard_normal((512, 16))
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    assert _rel_err(got, A @ B) < 1e-12


def test_matmul_f64_reduced_limbs():
    """Capped limb counts trade accuracy for matmuls on a known curve:
    ~2^{-8*limbs} relative to row/col norms at s=8. The refinement
    residuals run at limbs=5 (ozaki.residual_limbs) — assert that tier
    really delivers beyond-f32 accuracy, and that accuracy is monotone
    in the cap."""
    rng = np.random.default_rng(3)
    n = 96
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, n))
    ref = A @ B
    errs = {
        limbs: _rel_err(
            np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B),
                                  limbs=limbs)), ref)
        for limbs in (3, 4, 5, 6)}
    assert errs[5] < 1e-10          # residual tier: way below f32 eps
    assert errs[4] < 1e-8
    assert errs[3] < 1e-5
    assert errs[3] > errs[4] > errs[5] >= errs[6]


def test_refine_residual_limbs_float_of_inv():
    """inv_refined with the default residual limb cap (5) converges to
    the same floor as the full-accuracy residual on the graded inner
    class (the measured basis for the default; see ozaki.residual_limbs)."""
    import os
    from unittest import mock

    from detqmc_tpu.linalg.udv import inv_refined

    rng = np.random.default_rng(4)
    n = 64
    Q1, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Q2, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.exp(np.linspace(4.0, -4.0, n))
    A = (Q1 * d) @ Q2 + np.eye(n)
    expected = np.linalg.inv(A)
    col = np.abs(expected).max(axis=0)

    def floor(limbs):
        env = {"DETQMC_TPU_RESIDUAL_LIMBS": str(limbs),
               # force the Ozaki path so the cap is actually exercised
               # (mm_f64 otherwise routes to plain f64 mm off-TPU)
               "DETQMC_TPU_NO_OZAKI": ""}
        with mock.patch.dict(os.environ, env):
            with mock.patch("detqmc_tpu.linalg.ozaki._use_ozaki",
                            return_value=True):
                Z = inv_refined(jnp.asarray(A)[None], n_iter=2)
        return (np.abs(np.asarray(Z[0], np.float64) - expected)
                / col[None, :]).max()

    assert floor(5) < 3e-6
    assert floor(5) < 1.5 * floor(6) + 1e-9


def test_matmul_f64_zero_rows():
    A = np.zeros((8, 8))
    A[0, 0] = 1.0
    B = np.eye(8)
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, A, atol=1e-15)
