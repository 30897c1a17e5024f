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


def test_qr_big_reconstructs():
    """Column-lane real QR (n = 136: multi-CHUNK lane ranges):
    orthogonal Q, upper R, exact reconstruction; matches the lane
    kernel's convention where both apply."""
    from detqmc_tpu.linalg.pallas_qr_big import qr_big

    rng = np.random.default_rng(60)
    b, n = 2, 136
    A = jnp.asarray(rng.normal(size=(b, n, n)), jnp.float32)
    Q, R = qr_big(A, interpret=True)
    Qn = np.asarray(Q, np.float64)
    Rn = np.asarray(R, np.float64)
    for k in range(b):
        np.testing.assert_allclose(Qn[k].T @ Qn[k], np.eye(n), atol=5e-5)
        assert np.abs(np.tril(Rn[k], -1)).max() == 0.0
        np.testing.assert_allclose(Qn[k] @ Rn[k], np.asarray(A[k]),
                                   atol=2e-4)


def test_qr_big_matches_lanes():
    from detqmc_tpu.linalg.pallas_qr_big import qr_big
    from detqmc_tpu.linalg.pallas_qr_lanes import qr_lanes

    rng = np.random.default_rng(61)
    A = jnp.asarray(rng.normal(size=(3, 24, 24)), jnp.float32)
    Q1, R1 = qr_lanes(A, interpret=True)
    Q2, R2 = qr_big(A, interpret=True)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-5)


def test_inv_refined_large_n():
    """inv_refined above the lane kernels' MAX_N routes through
    qr_big + trinv_big (n = 136)."""
    from detqmc_tpu.linalg.udv import inv_refined

    n = 136
    key = jax.random.key(62)
    from tests.test_pallas_green import _make_graded

    inner = _make_graded(key, n, 6.0)[None]
    Z = np.asarray(inv_refined(inner, n_iter=2, interpret=True),
                   np.float64)
    expected = np.linalg.inv(np.asarray(inner[0], np.float64))
    col = np.maximum(np.abs(expected).max(axis=0), 1e-30)
    rel = (np.abs(Z[0] - expected) / col[None, :]).max()
    assert rel < 5e-5, rel


def test_qr_wy_matches_rank1_kernel():
    """Real blocked compact-WY QR == the rank-1 column-lane kernel up to
    f32 rounding; exact upper triangularity (n = 40: partial last panel;
    n = 136: multi-CHUNK + multiple panels)."""
    from detqmc_tpu.linalg.pallas_qr_wy import qr_wy

    rng = np.random.default_rng(81)
    for n in (40, 136):
        A = jnp.asarray(rng.normal(size=(2, n, n)), jnp.float32)
        Q, R = qr_wy(A, interpret=True)
        Qn = np.asarray(Q, np.float64)
        Rn = np.asarray(R, np.float64)
        for k in range(2):
            np.testing.assert_allclose(Qn[k].T @ Qn[k], np.eye(n),
                                       atol=1e-5)
            assert np.abs(np.tril(Rn[k], -1)).max() == 0.0
            np.testing.assert_allclose(Qn[k] @ Rn[k], np.asarray(A[k]),
                                       atol=2e-4)
