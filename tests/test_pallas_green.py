"""df32 Householder QR + solve kernel vs f64 reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu.linalg import df32
from detqmc_tpu.linalg.pallas_green import solve_inner


def _make_graded(key, n, spread):
    """Ill-conditioned graded matrix like the stabilization inner matrix."""
    A = jax.random.normal(key, (n, n), dtype=jnp.float64)
    scale_r = jnp.exp(jnp.linspace(-spread, 0, n))
    scale_c = jnp.exp(jnp.linspace(0, -spread, n))
    return scale_r[:, None] * A * scale_c[None, :] + jnp.eye(n)


def test_solve_inner_well_conditioned():
    n = 16
    inner = _make_graded(jax.random.key(0), n, 2.0)
    r1 = jnp.abs(jax.random.normal(jax.random.key(1), (n,),
                                   dtype=jnp.float64)) + 0.5
    hi, lo = df32.from_f64(inner)
    mid = solve_inner(hi[None], lo[None], r1.astype(jnp.float32)[None],
                      interpret=True)
    expected = np.linalg.solve(np.asarray(inner), np.diag(np.asarray(r1)))
    np.testing.assert_allclose(np.asarray(mid[0]), expected,
                               rtol=1e-5, atol=1e-6)


def test_solve_inner_ill_conditioned_graded():
    """Condition ~ e^40: f32 fails utterly; df32 must keep per-mode
    relative accuracy (checked through the residual, scaled)."""
    n = 32
    inner = _make_graded(jax.random.key(2), n, 20.0)  # cond ~ e^40
    r1 = jnp.exp(jnp.linspace(0.0, -15.0, n))
    hi, lo = df32.from_f64(inner)
    mid = solve_inner(hi[None], lo[None], r1.astype(jnp.float32)[None],
                      interpret=True)
    expected = np.linalg.solve(np.asarray(inner, np.float64),
                               np.diag(np.asarray(r1, np.float64)))
    got = np.asarray(mid[0], np.float64)
    # relative to the column scale of the true solution
    col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
    rel = np.abs(got - expected) / col_scale[None, :]
    assert rel.max() < 1e-4, rel.max()


def test_lanes_kernel_matches_column_kernel():
    """The lane-batched layout (n <= 64 dispatch) must agree with the
    column-lane kernel bit-for-bit-ish (same algorithm, same arithmetic,
    different data layout) — checked at the headline n = 64 including the
    batch-padding path (Bt not a multiple of 128)."""
    from detqmc_tpu.linalg.pallas_green import _make_solve_inner
    from detqmc_tpu.linalg.pallas_green_lanes import solve_inner_lanes

    n, Bt = 64, 5
    keys = jax.random.split(jax.random.key(9), Bt)
    inners = jnp.stack([_make_graded(k, n, 10.0) for k in keys])
    r1 = jnp.exp(jnp.linspace(0.0, -6.0, n))[None, :].repeat(Bt, 0)
    hi, lo = df32.from_f64(inners)
    r1f = r1.astype(jnp.float32)
    got = solve_inner_lanes(hi, lo, r1f, interpret=True)
    ref = _make_solve_inner(True)(hi, lo, r1f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)
    # and against the f64 truth
    for b in range(Bt):
        expected = np.linalg.solve(np.asarray(inners[b]),
                                   np.diag(np.asarray(r1[b])))
        col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
        rel = np.abs(np.asarray(got[b], np.float64) - expected) / col_scale
        assert rel.max() < 1e-4, rel.max()


def test_solve_inner_batched():
    n = 8
    keys = jax.random.split(jax.random.key(3), 6)
    inners = jnp.stack([_make_graded(k, n, 3.0) for k in keys])
    r1 = jnp.ones((6, n), jnp.float32)
    hi, lo = df32.from_f64(inners)
    mid = solve_inner(hi, lo, r1, interpret=True)
    for b in range(6):
        expected = np.linalg.inv(np.asarray(inners[b]))
        np.testing.assert_allclose(np.asarray(mid[b]), expected,
                                   rtol=1e-4, atol=1e-5)


def test_solve_inner_lanes_rhs_matches_numpy():
    """General-RHS lane solve (time-displaced G path): X = inner^{-1} RHS
    at condition ~ e^15, per-column relative accuracy."""
    from detqmc_tpu.linalg.pallas_green_lanes import solve_inner_lanes_rhs

    n = 24
    keys = jax.random.split(jax.random.key(7), 3)
    inners = jnp.stack([_make_graded(k, n, 15.0) for k in keys])
    rng = np.random.default_rng(40)
    rhs = jnp.asarray(rng.normal(size=(3, n, n)), jnp.float64)
    hi, lo = df32.from_f64(inners)
    rh, rl = df32.from_f64(rhs)
    got = solve_inner_lanes_rhs(hi, lo, rh, rl, interpret=True)
    for b in range(3):
        expected = np.linalg.solve(np.asarray(inners[b]),
                                   np.asarray(rhs[b]))
        col_scale = np.maximum(np.abs(expected).max(axis=0), 1e-300)
        rel = np.abs(np.asarray(got[b], np.float64) - expected) / col_scale
        assert rel.max() < 1e-4, rel.max()


def test_green_tau_zero_df32_matches_f64():
    """green_tau_zero_df32 == the f64 green_tau_zero on a DQMC-style
    factored chain (graded d spanning e^20)."""
    from detqmc_tpu.linalg.udv import (UDV, green_tau_zero,
                                       green_tau_zero_df32, udv_decompose,
                                       udv_refactor)

    n = 16
    key = jax.random.key(9)

    def chain(k, steps):
        ks = jax.random.split(k, steps + 1)
        f = udv_decompose(jax.random.normal(ks[0], (n, n), jnp.float64))
        for i in range(steps):
            B = 0.5 * jax.random.normal(ks[i + 1], (n, n), jnp.float64)
            B = B + jnp.diag(jnp.exp(jnp.linspace(2.0, -2.0, n)))
            f = udv_refactor(B @ f.U, f.d, f.V, compose_dtype=jnp.float64)
        return f

    k1, k2 = jax.random.split(key)
    left = chain(k1, 5)
    right_t = chain(k2, 5)
    exp = np.asarray(green_tau_zero(left, right_t,
                                    compute_dtype=jnp.float64))
    cast32 = lambda f: UDV(f.U.astype(jnp.float32), f.d, f.V)  # noqa: E731
    got = np.asarray(green_tau_zero_df32(cast32(left), cast32(right_t),
                                         interpret=True), np.float64)
    scale = max(np.abs(exp).max(), 1e-300)
    assert np.abs(got - exp).max() / scale < 5e-5


def test_trinv_matches_numpy():
    """Real column-lane triangular inverse against NumPy, graded
    diagonal + n = 136 multi-CHUNK case."""
    from detqmc_tpu.linalg.pallas_trinv import trinv_big

    rng = np.random.default_rng(50)
    for n, span in ((24, 6.0), (136, 3.0)):
        R = np.triu(rng.normal(size=(2, n, n))) \
            + np.diag(np.exp(np.linspace(0.0, -span, n)))[None]
        X = trinv_big(jnp.asarray(R, jnp.float32), interpret=True)
        for b in range(2):
            expected = np.linalg.inv(R[b].astype(np.float32))
            got = np.asarray(X[b], np.float64)
            assert np.abs(np.tril(got, -1)).max() == 0.0
            col = np.maximum(np.abs(expected).max(axis=0), 1e-30)
            rel = np.abs(got - expected) / col[None, :]
            assert rel.max() < 5e-5, (n, rel.max())


def test_inv_refined_converges():
    """Real mixed-precision refined inverse on the moderately
    conditioned graded class: refinement recovers per-column accuracy
    near the f32 storage floor."""
    from detqmc_tpu.linalg.udv import inv_refined

    n = 48
    key = jax.random.key(51)
    inner = jnp.stack([_make_graded(k, n, 8.0)
                       for k in jax.random.split(key, 2)])
    expected = np.linalg.inv(np.asarray(inner, np.float64))
    Z0 = np.asarray(inv_refined(inner, n_iter=0, interpret=True),
                    np.float64)
    Z2 = np.asarray(inv_refined(inner, n_iter=2, interpret=True),
                    np.float64)

    def rel(Z):
        col = np.maximum(np.abs(expected).max(axis=1, keepdims=True),
                         1e-30)
        return (np.abs(Z - expected) / col).max()

    assert rel(Z2) < 2e-5, (rel(Z0), rel(Z2))
    assert rel(Z2) <= rel(Z0)


def test_green_refine_matches_f64():
    """udv.green_refine against the exact f64 green on a DQMC-style
    factored chain (graded d spanning e^20). Measured on this chain:
    refine 2e-7 vs the df32 kernel's 1.9e-5 — the Newton corrections
    land closer to f64 than the df32 backsub."""
    from detqmc_tpu.linalg.udv import (UDV, green_from_two_udv,
                                       green_refine, udv_decompose,
                                       udv_refactor)

    n = 16
    key = jax.random.key(52)

    def chain(k, steps):
        ks = jax.random.split(k, steps + 1)
        f = udv_decompose(jax.random.normal(ks[0], (n, n), jnp.float64))
        for i in range(steps):
            B = 0.5 * jax.random.normal(ks[i + 1], (n, n), jnp.float64)
            B = B + jnp.diag(jnp.exp(jnp.linspace(2.0, -2.0, n)))
            f = udv_refactor(B @ f.U, f.d, f.V, compose_dtype=jnp.float64)
        return f

    k1, k2 = jax.random.split(key)
    cast32 = lambda f: UDV(f.U.astype(jnp.float32), f.d, f.V)  # noqa: E731
    left, right_t = cast32(chain(k1, 5)), cast32(chain(k2, 5))
    G_exact = np.asarray(green_from_two_udv(left, right_t,
                                            compute_dtype=jnp.float64),
                         np.float64)
    G_new = np.asarray(green_refine(left, right_t, interpret=True),
                       np.float64)
    scale = max(np.abs(G_exact).max(), 1e-30)
    assert np.abs(G_new - G_exact).max() / scale < 2e-6


def test_trinv_col_matches_numpy(monkeypatch):
    """DETQMC_TPU_TRINV=col (the non-default pure column
    back-substitution kernel) computes the same triangular inverse as
    the default blocked kernel."""
    monkeypatch.setenv("DETQMC_TPU_TRINV", "col")
    import detqmc_tpu.linalg.pallas_trinv as m

    rng = np.random.default_rng(90)
    for n in (24, 136):
        # 0.2x off-diagonal keeps the (exponentially growing) inverse of
        # a random triangular matrix within f32 range at n = 136
        R = 0.2 * np.triu(rng.normal(size=(2, n, n)), 1) \
            + np.diag(np.exp(np.linspace(0.0, -4.0, n)))[None]
        # fresh trace per env value: drop the cached custom_vmap builder
        m._make_trinv.cache_clear()
        X = m.trinv_big(jnp.asarray(R, jnp.float32), interpret=True)
        for b in range(2):
            expected = np.linalg.inv(R[b].astype(np.float32))
            got = np.asarray(X[b], np.float64)
            assert np.abs(np.tril(got, -1)).max() == 0.0
            col = np.maximum(np.abs(expected).max(axis=0), 1e-30)
            assert (np.abs(got - expected) / col[None, :]).max() < 2e-4
    m._make_trinv.cache_clear()
