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


# ---- column-lane (large-n) complex kernels: pallas_cqr / pallas_cgreen ----

from detqmc_tpu.linalg.pallas_cqr import cqr_big
from detqmc_tpu.linalg.pallas_cgreen import solve_inner_complex_big


def test_cqr_big_reconstructs():
    """Column-lane complex QR: unitary Q, upper R, exact reconstruction —
    n = 136 exercises the multi-CHUNK lane ranges (c0 = 128 for the last
    chunk) that only exist above n = 128, the lane kernel's ceiling."""
    rng = np.random.default_rng(10)
    b, n = 2, 136
    A, pair = _rand_pair(rng, b, n)
    Q, R = cqr_big(pair, interpret=True)
    Q = np.asarray(Q[:, 0] + 1j * Q[:, 1], np.complex128)
    R = np.asarray(R[:, 0] + 1j * R[:, 1], np.complex128)
    for k in range(b):
        np.testing.assert_allclose(Q[k].conj().T @ Q[k], np.eye(n),
                                   atol=5e-5)
        assert np.abs(np.tril(R[k], -1)).max() == 0.0
        Af32 = A[k].astype(np.complex64).astype(np.complex128)
        np.testing.assert_allclose(Q[k] @ R[k], Af32, atol=2e-4)


def test_cqr_big_matches_lanes():
    """Same factorization as the lane-batched kernel where both apply
    (identical complex Householder convention -> identical Q, R up to
    f32 rounding)."""
    rng = np.random.default_rng(11)
    _, pair = _rand_pair(rng, 3, 24)
    Q1, R1 = cqr_lanes(pair, interpret=True)
    Q2, R2 = cqr_big(pair, interpret=True)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-5)


def test_cqr_big_vmapped():
    rng = np.random.default_rng(12)
    _, pair = _rand_pair(rng, 4, 16)
    Q1, R1 = cqr_big(pair, interpret=True)
    Q2, R2 = jax.vmap(lambda a: cqr_big(a, interpret=True))(pair)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)


def test_solve_inner_complex_big_illconditioned():
    """Column-lane complex df32 solve at condition ~ e^40: per-column
    relative accuracy like the lane kernel (same criterion as the real
    kernels' tests)."""
    rng = np.random.default_rng(13)
    n = 40
    inner = _graded_complex(rng, n, 20.0)[None]
    r1 = np.exp(np.linspace(0.0, -15.0, n))[None]
    expected = np.linalg.solve(inner[0], np.diag(r1[0]))

    hi_r, lo_r = df32.from_f64(jnp.asarray(inner.real, jnp.float64))
    hi_i, lo_i = df32.from_f64(jnp.asarray(inner.imag, jnp.float64))
    mid = solve_inner_complex_big(hi_r, lo_r, hi_i, lo_i,
                                  jnp.asarray(r1, jnp.float32),
                                  interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-4, rel.max()


def test_solve_inner_complex_big_multichunk():
    """n = 136 crosses the 128-lane CHUNK boundary in both the QR and the
    back-substitution; check against NumPy at moderate conditioning."""
    rng = np.random.default_rng(14)
    n = 136
    inner = _graded_complex(rng, n, 8.0)[None]
    r1 = np.exp(np.linspace(0.0, -4.0, n))[None]
    expected = np.linalg.solve(inner[0], np.diag(r1[0]))

    hi_r, lo_r = df32.from_f64(jnp.asarray(inner.real, jnp.float64))
    hi_i, lo_i = df32.from_f64(jnp.asarray(inner.imag, jnp.float64))
    mid = solve_inner_complex_big(hi_r, lo_r, hi_i, lo_i,
                                  jnp.asarray(r1, jnp.float32),
                                  interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-5, rel.max()


# ---- general-RHS solves (time-displaced G path) ----

from detqmc_tpu.linalg.pallas_cgreen_lanes import solve_inner_complex_rhs
from detqmc_tpu.linalg.pallas_cgreen import solve_inner_complex_big_rhs


def _rhs_case(rng, n, span, rhs_scale=1.0):
    inner = _graded_complex(rng, n, span)[None]
    rhs = (rng.normal(size=(1, n, n)) + 1j * rng.normal(size=(1, n, n))
           ) * rhs_scale
    expected = np.linalg.solve(inner[0], rhs[0])
    ip = (df32.from_f64(jnp.asarray(inner.real, jnp.float64))
          + df32.from_f64(jnp.asarray(inner.imag, jnp.float64)))
    rp = (df32.from_f64(jnp.asarray(rhs.real, jnp.float64))
          + df32.from_f64(jnp.asarray(rhs.imag, jnp.float64)))
    return ip, rp, expected


def test_solve_inner_complex_rhs_matches_numpy():
    """Lane kernel, dense-RHS variant: per-column relative accuracy at
    condition ~ e^20 against NumPy complex solve."""
    rng = np.random.default_rng(21)
    ip, rp, expected = _rhs_case(rng, 24, 20.0)
    mid = solve_inner_complex_rhs(ip, rp, interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-4, rel.max()


def test_solve_inner_complex_big_rhs_matches_numpy():
    """Column-lane kernel, dense-RHS variant (n = 136: multi-CHUNK)."""
    rng = np.random.default_rng(22)
    ip, rp, expected = _rhs_case(rng, 136, 8.0)
    mid = solve_inner_complex_big_rhs(ip, rp, interpret=True)
    got = np.asarray(mid[0, 0] + 1j * mid[0, 1], np.complex128)
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-5, rel.max()


def test_cgreen_tau_zero_matches_rho_embedding():
    """cgreen_tau_zero_df32 == the rho-embedded f64 green_tau_zero on a
    DQMC-style factored pair chain."""
    from detqmc_tpu.linalg.cudv import (cgreen_tau_zero_df32,
                                        cudv_decompose, cudv_refactor,
                                        embed_udv)
    from detqmc_tpu.linalg.udv import green_tau_zero

    rng = np.random.default_rng(23)
    n = 16

    def chain(seed_off, steps):
        _, pair = _rand_pair(rng, 1, n)
        f = cudv_decompose(pair)
        for _ in range(steps):
            _, B = _rand_pair(rng, 1, n)
            from detqmc_tpu.linalg.cudv import cpx_mm_last
            f = cudv_refactor(cpx_mm_last(B * 0.6, f.U), f.d, f.V)
        return f

    left = chain(0, 3)
    right_t = chain(1, 3)
    got = cgreen_tau_zero_df32(left, right_t, interpret=True)
    G_rho = green_tau_zero(embed_udv(left), embed_udv(right_t),
                           compute_dtype=jnp.float64)
    exp_re = np.asarray(G_rho[..., :n, :n])
    exp_im = np.asarray(G_rho[..., n:, :n])
    np.testing.assert_allclose(np.asarray(got[:, 0]), exp_re, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[:, 1]), exp_im, atol=2e-5)


def test_clog_abs_det_matches_rho_slogdet():
    """Inverse-free complex |det(1+UdV)| == the rho-embedded f64
    slogdet formula across a wide d range (e^-30 .. e^30)."""
    from detqmc_tpu.linalg.cudv import (clog_abs_det_one_plus_udv,
                                        cudv_decompose, embed_udv)
    from detqmc_tpu.linalg.udv import UDV, log_det_one_plus_udv

    rng = np.random.default_rng(31)
    n = 24
    _, pairU = _rand_pair(rng, 1, n)
    f0 = cudv_decompose(pairU)                       # unitary-ish U
    d = jnp.asarray(np.exp(np.linspace(30.0, -30.0, n))[None],
                    jnp.float64)
    _, pairV = _rand_pair(rng, 1, n)
    gV = cudv_decompose(pairV)
    f = UDV(U=f0.U, d=d, V=gV.U.astype(jnp.float64))  # unitary V too
    ld = clog_abs_det_one_plus_udv(f)
    ld_rho, _ = log_det_one_plus_udv(embed_udv(
        UDV(f.U.astype(jnp.float64), f.d, f.V)))
    # det rho = |det|^2
    np.testing.assert_allclose(2.0 * np.asarray(ld), np.asarray(ld_rho),
                               rtol=1e-5, atol=2e-3)


# ---- triangular inverse + refined inner inverse (mixed-precision green) ----


def test_ctrinv_matches_numpy():
    """Column-lane complex triangular inverse against NumPy, including a
    graded diagonal (the class QR of the inner matrix produces) and an
    n = 136 multi-CHUNK case."""
    from detqmc_tpu.linalg.pallas_ctrinv import ctrinv_big

    rng = np.random.default_rng(41)
    for n, span in ((24, 6.0), (136, 3.0)):
        A = rng.normal(size=(2, n, n)) + 1j * rng.normal(size=(2, n, n))
        R = np.triu(A) + np.diag(np.exp(np.linspace(0.0, -span, n)))[None]
        pair = jnp.asarray(np.stack([R.real, R.imag], axis=1), jnp.float32)
        X = ctrinv_big(pair, interpret=True)
        Xc = np.asarray(X[:, 0] + 1j * X[:, 1], np.complex128)
        for b in range(2):
            expected = np.linalg.inv(R[b].astype(np.complex64))
            # strictly upper triangular result, column-relative accuracy
            assert np.abs(np.tril(Xc[b], -1)).max() == 0.0
            col = np.maximum(np.abs(expected).max(axis=0), 1e-30)
            rel = np.abs(Xc[b] - expected) / col[None, :]
            assert rel.max() < 5e-5, (n, rel.max())


def test_ctrinv_vmapped():
    from detqmc_tpu.linalg.pallas_ctrinv import ctrinv_big

    rng = np.random.default_rng(42)
    A = rng.normal(size=(3, 16, 16)) + 1j * rng.normal(size=(3, 16, 16))
    R = np.triu(A + 3.0 * np.eye(16))
    pair = jnp.asarray(np.stack([R.real, R.imag], axis=1), jnp.float32)
    X1 = ctrinv_big(pair, interpret=True)
    X2 = jax.vmap(lambda r: ctrinv_big(r, interpret=True))(pair)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-6)


def test_cinv_refined_converges():
    """Mixed-precision refined inverse: f32 QR factor + MXU refinement
    reaches ~f32-storage-floor per-column accuracy on the moderately
    conditioned inner class (cond ~ e^8 — the range-split inner matrix
    is O(1)-entried by construction)."""
    from detqmc_tpu.linalg.cudv import cinv_refined

    rng = np.random.default_rng(43)
    n = 40
    inner = _graded_complex(rng, n, 8.0)[None]
    pair = jnp.asarray(np.stack([inner.real, inner.imag], axis=1),
                       jnp.float64)
    expected = np.linalg.inv(inner[0])
    col = np.maximum(np.abs(expected).max(axis=0), 1e-30)

    Z0 = cinv_refined(pair, n_iter=0, interpret=True)
    Z2 = cinv_refined(pair, n_iter=2, interpret=True)
    rel = lambda Z: (np.abs(  # noqa: E731
        np.asarray(Z[0, 0] + 1j * Z[0, 1], np.complex128) - expected)
        / col[None, :]).max()
    # unrefined f32 solve carries cond * eps_f32; two refinements must
    # recover per-column accuracy comparable to the df32 kernels
    assert rel(Z2) < 2e-5, (rel(Z0), rel(Z2))
    assert rel(Z2) <= rel(Z0)


def test_cgreen_refine_matches_df32():
    """cgreen_refine == cgreen_from_two_udv_df32 on a DQMC-style factored
    pair chain (same assembly, refined solve)."""
    from detqmc_tpu.linalg.cudv import (cgreen_from_two_udv_df32,
                                        cgreen_refine, cudv_decompose,
                                        cudv_refactor, cpx_mm_last)

    rng = np.random.default_rng(44)
    n = 16

    def chain(steps):
        _, pair = _rand_pair(rng, 1, n)
        f = cudv_decompose(pair)
        for _ in range(steps):
            _, B = _rand_pair(rng, 1, n)
            f = cudv_refactor(cpx_mm_last(B * 0.6, f.U), f.d, f.V)
        return f

    left = chain(3)
    right_t = chain(3)
    G_ref = np.asarray(cgreen_from_two_udv_df32(left, right_t,
                                                interpret=True))
    G_ref64 = np.asarray(G_ref, np.float64)
    G_new = np.asarray(cgreen_refine(left, right_t, interpret=True),
                       np.float64)
    scale = max(np.abs(G_ref64).max(), 1e-30)
    assert np.abs(G_new - G_ref64).max() / scale < 5e-6


def test_cgreen_tau_zero_refine_matches_rho_embedding():
    """The refined-MXU time-displaced solve == the rho-embedded f64
    green_tau_zero on a DQMC-style factored pair chain."""
    from detqmc_tpu.linalg.cudv import (cgreen_tau_zero_refine,
                                        cudv_decompose, cudv_refactor,
                                        cpx_mm_last, embed_udv)
    from detqmc_tpu.linalg.udv import green_tau_zero

    rng = np.random.default_rng(71)
    n = 16

    def chain(steps):
        _, pair = _rand_pair(rng, 1, n)
        f = cudv_decompose(pair)
        for _ in range(steps):
            _, B = _rand_pair(rng, 1, n)
            f = cudv_refactor(cpx_mm_last(B * 0.6, f.U), f.d, f.V)
        return f

    left = chain(3)
    right_t = chain(3)
    got = cgreen_tau_zero_refine(left, right_t, interpret=True)
    G_rho = green_tau_zero(embed_udv(left), embed_udv(right_t),
                           compute_dtype=jnp.float64)
    exp_re = np.asarray(G_rho[..., :n, :n])
    exp_im = np.asarray(G_rho[..., n:, :n])
    np.testing.assert_allclose(np.asarray(got[:, 0]), exp_re, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[:, 1]), exp_im, atol=2e-5)


def test_cqr_wy_matches_rank1_kernel():
    """Blocked compact-WY QR == the rank-1 kernel's factorization
    (identical Householder convention) up to f32 rounding; exact upper
    triangularity; n = 40 exercises a partial last panel and n = 136 the
    multi-CHUNK lane ranges + multiple full panels."""
    from detqmc_tpu.linalg.pallas_cqr_wy import cqr_wy

    rng = np.random.default_rng(80)
    for n in (40, 136):
        A, pair = _rand_pair(rng, 2, n)
        Q, R = cqr_wy(pair, interpret=True)
        Qc = np.asarray(Q[:, 0] + 1j * Q[:, 1], np.complex128)
        Rc = np.asarray(R[:, 0] + 1j * R[:, 1], np.complex128)
        for k in range(2):
            np.testing.assert_allclose(Qc[k].conj().T @ Qc[k], np.eye(n),
                                       atol=1e-5)
            assert np.abs(np.tril(Rc[k], -1)).max() == 0.0
            Af32 = A[k].astype(np.complex64).astype(np.complex128)
            np.testing.assert_allclose(Qc[k] @ Rc[k], Af32, atol=2e-4)


def test_ctrinv_col_matches_numpy(monkeypatch):
    """DETQMC_TPU_TRINV=col (the non-default pure column
    back-substitution kernel, complex) matches NumPy like the default
    blocked kernel does."""
    monkeypatch.setenv("DETQMC_TPU_TRINV", "col")
    import detqmc_tpu.linalg.pallas_ctrinv as m

    rng = np.random.default_rng(91)
    for n in (24, 136):
        A = rng.normal(size=(2, n, n)) + 1j * rng.normal(size=(2, n, n))
        R = np.triu(A) + np.diag(np.exp(np.linspace(0.0, -4.0, n)))[None]
        pair = jnp.asarray(np.stack([R.real, R.imag], 1), jnp.float32)
        m._make_ctrinv.cache_clear()
        X = m.ctrinv_big(pair, interpret=True)
        Xc = np.asarray(X[:, 0] + 1j * X[:, 1], np.complex128)
        for b in range(2):
            expected = np.linalg.inv(R[b].astype(np.complex64))
            assert np.abs(np.tril(Xc[b], -1)).max() == 0.0
            col = np.maximum(np.abs(expected).max(axis=0), 1e-30)
            assert (np.abs(Xc[b] - expected) / col[None, :]).max() < 5e-5
    m._make_ctrinv.cache_clear()
