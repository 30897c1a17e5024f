"""Batched CholeskyQR2: an all-MXU QR for the stabilization refactor.

The Hubbard B-chain refactor QRs huge batches of small well-conditioned
matrices (bench shape: thousands of 64x64 f32; udv_refactor's d-scaling
trick guarantees the QR input M = B-block . U_prev carries NO d-range —
its conditioning is the interval block's, e^{O(s dtau W)}). The
Householder lane kernel processes those column by column on the VPU —
n sequential skinny steps per matrix, which is why the measured
QR-chain rate is ~0.03% MFU (BENCH_r04; VERDICT r4 item 4).

CholeskyQR2 (Yamamoto et al., classic tall-skinny/batched TPU answer)
replaces the column loop with batched matmuls:

    pass:   G = M^T M          (MXU, precision=highest)
            R = chol(G)^T      (n x n, the only non-matmul step)
            Q = M R^{-1}       (trinv kernel + MXU matmul)
    twice:  Q2 = Q1 R2^{-1},  R = R2 R1

One pass loses orthogonality ~eps * cond(M)^2; the second pass repairs
it to ~eps (CholeskyQR2's standard analysis) PROVIDED the first
Cholesky does not break down, i.e. cond(M)^2 * eps_f32 < 1 — cond(M)
<~ 2000. The stabilization interval keeps cond(M) far below that by
construction (that is the whole point of refactoring every s slices);
the always-on green_dev/sv monitors gate any violation at run time.

Flops: ~9 n^3 vs Householder's 4 n^3 — 2.25x more arithmetic, all of
it MXU-shaped batched matmul instead of VPU column chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HI)


def _chol_pass(M):
    """One CholeskyQR pass: M = Q R with R upper triangular, positive
    diagonal. Returns (Q, R)."""
    G = _mm(jnp.swapaxes(M, -1, -2), M)
    # symmetrize against matmul rounding (cholesky wants exact symmetry)
    G = 0.5 * (G + jnp.swapaxes(G, -1, -2))
    L = jnp.linalg.cholesky(G)
    R = jnp.swapaxes(L, -1, -2)
    Rinv = _trinv(R)
    return _mm(M, Rinv), R


def _trinv(R):
    """Upper-triangular inverse on the fastest valid path: the Pallas
    column-lane kernel on TPU f32, solve_triangular elsewhere."""
    if R.dtype == jnp.float32 and jax.default_backend() == "tpu" \
            and R.shape[-1] % 8 == 0:
        from detqmc_tpu.linalg.pallas_trinv import trinv_big

        return trinv_big(R)
    n = R.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=R.dtype), R.shape)
    return jax.scipy.linalg.solve_triangular(R, eye, lower=False)


def cholqr2(M: jax.Array):
    """(Q, R) of batched (..., n, n) matrices via CholeskyQR2.

    R's diagonal is positive by construction (no sign fixing needed
    downstream). Orthogonality of Q is ~eps after the second pass for
    cond(M) <~ 2000 in f32 (see module docstring)."""
    Q1, R1 = _chol_pass(M)
    Q2, R2 = _chol_pass(Q1)
    return Q2, _mm(R2, R1)


def use_cholqr() -> bool:
    """Trace-time routing knob (read per trace like the other QR-route
    env overrides; no caching so tests can flip it mid-process)."""
    import os

    return os.environ.get("DETQMC_TPU_QR", "") == "cholqr2"
