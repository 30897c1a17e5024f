"""Lane-batched f32 QR kernel vs jnp.linalg.qr (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu.linalg.pallas_qr_lanes import qr_lanes
from detqmc_tpu.linalg.udv import _sign_fix


def _check(A):
    Q, R = qr_lanes(jnp.asarray(A, jnp.float32), interpret=True)
    Q, R = np.asarray(Q, np.float64), np.asarray(R, np.float64)
    n = A.shape[-1]
    # Q orthogonal, R upper triangular, QR = A
    eye = np.eye(n)
    for b in range(A.shape[0]):
        np.testing.assert_allclose(Q[b].T @ Q[b], eye, atol=2e-5)
        assert np.allclose(np.tril(R[b], -1), 0.0)
        np.testing.assert_allclose(
            Q[b] @ R[b], A[b],
            atol=3e-6 * max(1.0, np.abs(A[b]).max()))
    return Q, R


def test_qr_lanes_random():
    rng = np.random.default_rng(0)
    _check(rng.standard_normal((5, 16, 16)))
    _check(rng.standard_normal((2, 64, 64)))


def test_qr_lanes_sign_fixed_udv_matches_lapack():
    """After udv_decompose's sign normalization, the kernel's and
    LAPACK's factorizations agree (the UdV is unique for nonsingular
    input with positive d)."""
    rng = np.random.default_rng(1)
    A = rng.standard_normal((3, 24, 24)).astype(np.float32)
    Qk, Rk = qr_lanes(jnp.asarray(A), interpret=True)
    f_kernel = _sign_fix(jnp.asarray(A), Qk, Rk)
    Ql, Rl = jnp.linalg.qr(jnp.asarray(A))
    f_lapack = _sign_fix(jnp.asarray(A), Ql, Rl)
    np.testing.assert_allclose(np.asarray(f_kernel.d),
                               np.asarray(f_lapack.d), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(f_kernel.U),
                               np.asarray(f_lapack.U), atol=5e-4)
    np.testing.assert_allclose(np.asarray(f_kernel.V),
                               np.asarray(f_lapack.V), atol=5e-4,
                               rtol=2e-3)
