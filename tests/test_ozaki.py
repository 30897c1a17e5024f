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


def test_matmul_f64_zero_rows():
    A = np.zeros((8, 8))
    A[0, 0] = 1.0
    B = np.eye(8)
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, A, atol=1e-15)
