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
