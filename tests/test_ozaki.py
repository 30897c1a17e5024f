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


@pytest.mark.parametrize("k", [96, 512])
@pytest.mark.parametrize("limbs", [4, 5])
def test_split_pair_parity_with_classic(k, limbs, monkeypatch):
    """The pair split must match the classic split's accuracy wherever
    auto selects it. At k=96 (s=8, 8|24) pair is exact and auto uses it;
    at k=512 (s=7, 7∤24) the pair fold-in misaligns with the limb grid
    (ADVICE r4: 1.9-3.4x worse), so auto must route to classic — assert
    the auto path's error matches the classic path's at the capped
    chain/residual tiers, not the degraded forced-pair one."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((16, k))
    B = rng.standard_normal((k, 16))
    ref = A @ B

    def err(mode):
        monkeypatch.setenv("DETQMC_TPU_OZAKI_SPLIT", mode)
        return _rel_err(
            np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B),
                                  limbs=limbs)), ref)

    e_classic = err("classic")
    e_auto = err("auto")
    # auto is never worse than ~1.5x classic (identical rounding class)
    assert e_auto <= 1.5 * e_classic + 1e-16
    if k == 512:
        # regression guard for the s=7 bug: forced pair is measurably
        # worse there; auto must not have picked it
        e_pair = err("pair")
        assert e_pair > 1.5 * e_classic


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


def test_chain_limbs_green_floor():
    """The capped chain tier (ozaki.chain_limbs, V-chain accumulation +
    VVh inner product) must not move the green floor: with the Ozaki
    path forced on, a graded ill-conditioned chain's refined G at the
    default cap matches the f64 direct inverse as well as the full
    6-limb product does."""
    import os
    from unittest import mock

    from detqmc_tpu.linalg.udv import (green_refine, udv_eye,
                                       udv_multiply_left)

    rng = np.random.default_rng(11)
    n, m, l_split = 16, 12, 6
    Bs = [np.linalg.qr(rng.standard_normal((n, n)))[0]
          @ np.diag(np.exp(np.linspace(-2.5, 2.5, n)))
          for _ in range(m)]

    def build(limbs):
        env = {"DETQMC_TPU_CHAIN_LIMBS": str(limbs)}
        with mock.patch.dict(os.environ, env):
            with mock.patch("detqmc_tpu.linalg.ozaki._use_ozaki",
                            return_value=True):
                left = udv_eye(n, jnp.float64)
                for B in Bs[:l_split]:
                    left = udv_multiply_left(jnp.asarray(B), left)
                right_t = udv_eye(n, jnp.float64)
                for B in reversed(Bs[l_split:]):
                    right_t = udv_multiply_left(jnp.asarray(B).T, right_t)
                return np.asarray(
                    green_refine(left, right_t, n_iter=1), np.float64)

    Lp = np.eye(n)
    for B in Bs[:l_split]:
        Lp = B @ Lp
    Rp = np.eye(n)
    for B in Bs[l_split:]:
        Rp = B @ Rp
    G_direct = np.linalg.inv(np.eye(n) + Lp @ Rp)
    scale = np.abs(G_direct).max()

    err = {limbs: np.abs(build(limbs) - G_direct).max() / scale
           for limbs in (4, 6)}
    assert err[4] < 1e-5                      # the refined-f32 G floor
    assert err[4] < 2.0 * err[6] + 1e-9       # cap doesn't move the floor


def test_chain_limbs_complex_green_floor():
    """Complex-pair mirror of the chain-limb floor check: the SDW native
    chain accumulates its V factors and VVh through cudv, so the capped
    tier must hold for cgreen_refine too."""
    import os
    from unittest import mock

    from detqmc_tpu.linalg import cudv

    rng = np.random.default_rng(7)
    n, m, l_split = 12, 12, 6

    def runi(n):
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        return np.linalg.qr(A)[0]

    Bs = [runi(n) @ np.diag(np.exp(np.linspace(-1.5, 1.5, n)))
          for _ in range(m)]

    def pair(M):
        return jnp.stack([jnp.asarray(M.real), jnp.asarray(M.imag)],
                         axis=0).astype(jnp.float64)

    def build(limbs):
        env = {"DETQMC_TPU_CHAIN_LIMBS": str(limbs)}
        with mock.patch.dict(os.environ, env):
            with mock.patch("detqmc_tpu.linalg.ozaki._use_ozaki",
                            return_value=True):
                left = cudv.cudv_decompose(
                    pair(np.eye(n, dtype=complex)))
                for B in Bs[:l_split]:
                    left = cudv.cudv_refactor(
                        cudv.cpx_mm_last(pair(B), left.U),
                        left.d, left.V)
                right_t = cudv.cudv_decompose(
                    pair(np.eye(n, dtype=complex)))
                for B in reversed(Bs[l_split:]):
                    right_t = cudv.cudv_refactor(
                        cudv.cpx_mm_last(pair(B.conj().T), right_t.U),
                        right_t.d, right_t.V)
                P = np.asarray(
                    cudv.cgreen_refine(left, right_t, n_iter=1),
                    np.float64)
        return P[0] + 1j * P[1]

    Lp = np.eye(n, dtype=complex)
    for B in Bs[:l_split]:
        Lp = B @ Lp
    Rp = np.eye(n, dtype=complex)
    for B in Bs[l_split:]:
        Rp = B @ Rp
    G_direct = np.linalg.inv(np.eye(n) + Lp @ Rp)
    scale = np.abs(G_direct).max()

    err = {limbs: np.abs(build(limbs) - G_direct).max() / scale
           for limbs in (4, 6)}
    assert err[4] < 1e-5
    assert err[4] < 2.0 * err[6] + 1e-9


def test_chain_limbs_resolution():
    """Per-caller tier: models request their conditioning-appropriate
    limb count; the env var beats everything (A/B hook)."""
    import os
    from unittest import mock

    from detqmc_tpu.linalg.ozaki import chain_limbs

    env0 = {k: v for k, v in os.environ.items()
            if k != "DETQMC_TPU_CHAIN_LIMBS"}
    with mock.patch.dict(os.environ, env0, clear=True):
        assert chain_limbs() == 4
        assert chain_limbs(5) == 5
    with mock.patch.dict(os.environ, {"DETQMC_TPU_CHAIN_LIMBS": "6"}):
        assert chain_limbs() == 6
        assert chain_limbs(5) == 6

    from detqmc_tpu.models.hubbard import HubbardConfig
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel
    assert HubbardConfig(L=4, beta=4.0, m=8, s=4).ozaki_chain_limbs == 5
    # SDW resolves the tier by conditioning regime at model init
    # (beta <= 5 -> 4 limbs, beyond -> 5; r5 on-chip measurements)
    assert SDWModel(SDWConfig(L=2, beta=1.0, m=8, s=4)).chain_limbs == 4
    assert SDWModel(SDWConfig(L=2, beta=8.0, m=16, s=4)).chain_limbs == 5
    assert SDWModel(SDWConfig(L=2, beta=8.0, m=16, s=4,
                              ozaki_chain_limbs=4)).chain_limbs == 4


def test_matmul_f64_zero_rows():
    A = np.zeros((8, 8))
    A[0, 0] = 1.0
    B = np.eye(8)
    got = np.asarray(matmul_f64(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, A, atol=1e-15)
