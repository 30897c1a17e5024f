"""Complex lane-batched kernels: cqr_lanes and solve_inner_complex.

Interpret-mode checks against NumPy complex linear algebra, including an
ill-conditioned inner solve that f32 alone cannot represent (the df32
claim).
"""

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu.linalg import df32
from detqmc_tpu.linalg.pallas_cqr_lanes import cqr_lanes
from detqmc_tpu.linalg.pallas_cgreen_lanes import solve_inner_complex


def _rand_pair(rng, b, n):
    A = rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
    pair = np.stack([A.real, A.imag], axis=1).astype(np.float32)
    return A, jnp.asarray(pair)


def test_cqr_reconstructs():
    rng = np.random.default_rng(0)
    b, n = 3, 16
    A, pair = _rand_pair(rng, b, n)
    Q, R = cqr_lanes(pair, interpret=True)
    Q = np.asarray(Q[:, 0] + 1j * Q[:, 1], np.complex128)
    R = np.asarray(R[:, 0] + 1j * R[:, 1], np.complex128)
    for k in range(b):
        # unitary Q, upper-triangular R, exact reconstruction
        np.testing.assert_allclose(Q[k].conj().T @ Q[k], np.eye(n),
                                   atol=2e-5)
        assert np.abs(np.tril(R[k], -1)).max() == 0.0
        Af32 = A[k].astype(np.complex64).astype(np.complex128)
        np.testing.assert_allclose(Q[k] @ R[k], Af32, atol=5e-5)


def test_cqr_vmapped():
    rng = np.random.default_rng(1)
    _, pair = _rand_pair(rng, 4, 8)
    Q1, R1 = cqr_lanes(pair, interpret=True)
    Q2, R2 = jax.vmap(lambda a: cqr_lanes(a, interpret=True))(pair)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)


def _graded_complex(rng, n, span):
    """DQMC-like inner: O(1) orthogonal mix + graded diagonal dominance
    (the class green_from_two_udv feeds the kernel after range-splitting;
    same construction as tests/test_pallas_green._make_graded)."""
    Q, _ = np.linalg.qr(rng.normal(size=(n, n))
                        + 1j * rng.normal(size=(n, n)))
    g = np.exp(np.linspace(0.0, -span, n))
    return Q * 0.3 + np.diag(g)


def test_solve_inner_complex_illconditioned():
    """Condition ~ e^40: f32 fails utterly; df32 must keep per-COLUMN
    relative accuracy (the same criterion as the real kernel's test —
    Householder QR without pivoting is only column-scale accurate)."""
    rng = np.random.default_rng(2)
    n = 32
    inner = _graded_complex(rng, n, 20.0)[None]
    r1 = np.exp(np.linspace(0.0, -15.0, n))[None]
    expected = np.linalg.solve(inner[0], np.diag(r1[0]))

    hi_r, lo_r = df32.from_f64(jnp.asarray(inner.real, jnp.float64))
    hi_i, lo_i = df32.from_f64(jnp.asarray(inner.imag, jnp.float64))
    mid = solve_inner_complex(hi_r, lo_r, hi_i, lo_i,
                              jnp.asarray(r1, jnp.float32),
                              interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-4, rel.max()


def test_solve_inner_complex_matches_rho_embedding():
    """The complex solve and the real-embedded solve compute the same
    mid: rho(inner)^{-1} diag(r1, r1) == rho(inner^{-1} diag(r1))."""
    rng = np.random.default_rng(3)
    n = 8
    A = rng.normal(size=(1, n, n)) + 1j * rng.normal(size=(1, n, n))
    r1 = rng.uniform(0.5, 1.0, size=(1, n))
    hi_r, lo_r = df32.from_f64(jnp.asarray(A.real, jnp.float64))
    hi_i, lo_i = df32.from_f64(jnp.asarray(A.imag, jnp.float64))
    mid = solve_inner_complex(hi_r, lo_r, hi_i, lo_i,
                              jnp.asarray(r1, jnp.float32),
                              interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    expected = np.linalg.solve(A[0], np.diag(r1[0]))
    np.testing.assert_allclose(got, expected, atol=1e-6)
