"""Complex-pair UdV chain: refactor + stable Green on (re, im) planes.

Native-complex counterpart of linalg/udv.py for the SDW chain
(models/sdw.py fermion_repr="native_pair"). Complex matrices are real
arrays with a pair axis at -3 (X[..., 0, :, :] = Re, X[..., 1, :, :] =
Im; see linalg/cpx.py). Compared to the real embedding rho(M) this
halves every matmul/QR/solve op count and keeps the complex structure
through the factorizations (a real QR of rho(M) destroys it).

Dispatch: the f32 QR goes to the lane-batched complex kernel
(pallas_cqr_lanes) on TPU up to its VMEM bound and to the column-lane
kernel (pallas_cqr) above it, jnp complex QR off-TPU; the
ill-conditioned green inner solve goes to the complex df32 kernels
(pallas_cgreen_lanes / pallas_cgreen, same split). Only non-8-multiple
dims fall back to the REAL df32 solver on the rho embedding of the
inner matrix (correct at any size — the solve pays the embedded 2x
there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from detqmc_tpu.linalg import cpx, df32
from detqmc_tpu.linalg.udv import UDV
from detqmc_tpu.precision import mm


def _scale_cols_pair(A, s):
    return A * s[..., None, None, :]


def _scale_rows_pair(s, A):
    return s[..., None, :, None] * A


def cudv_decompose(A) -> UDV:
    """QR-based UdV of a pair matrix (..., 2, n, n): d positive real, the
    complex phase of R's diagonal folded into U (udv sign convention)."""
    n = A.shape[-1]
    if (A.dtype == jnp.float32 and n % 8 == 0
            and jax.default_backend() == "tpu"):
        from detqmc_tpu.linalg.pallas_cqr_lanes import MAX_N, cqr_lanes

        if n <= MAX_N:
            Q, R = cqr_lanes(A)
        else:
            # science-scale dims (complex 256+): column-lane layout whose
            # VMEM footprint scales with the batch tile, not n^2 * 128
            from detqmc_tpu.linalg.pallas_cqr import cqr_big

            Q, R = cqr_big(A)
    else:
        cdt = jnp.complex64 if A.dtype == jnp.float32 else jnp.complex128
        Ac = (A[..., 0, :, :] + 1j * A[..., 1, :, :]).astype(cdt)
        Qc, Rc = jnp.linalg.qr(Ac)
        Q = jnp.stack([jnp.real(Qc), jnp.imag(Qc)], axis=-3).astype(A.dtype)
        R = jnp.stack([jnp.real(Rc), jnp.imag(Rc)], axis=-3).astype(A.dtype)
    diag_r = jnp.diagonal(R[..., 0, :, :], axis1=-2, axis2=-1)
    diag_i = jnp.diagonal(R[..., 1, :, :], axis1=-2, axis2=-1)
    d = jnp.sqrt(diag_r ** 2 + diag_i ** 2)
    safe = jnp.where(d == 0, 1.0, d)
    sr = jnp.where(d == 0, 1.0, diag_r / safe)
    si = jnp.where(d == 0, 0.0, diag_i / safe)
    # U = Q diag(sign): complex column scaling
    Qr, Qi = Q[..., 0, :, :], Q[..., 1, :, :]
    Ur = Qr * sr[..., None, :] - Qi * si[..., None, :]
    Ui = Qr * si[..., None, :] + Qi * sr[..., None, :]
    U = jnp.stack([Ur, Ui], axis=-3)
    # V = diag(conj(sign)/d) R: complex row scaling
    cr, ci = sr / safe, -si / safe
    Vr = cr[..., :, None] * R[..., 0, :, :] - ci[..., :, None] * R[..., 1, :, :]
    Vi = cr[..., :, None] * R[..., 1, :, :] + ci[..., :, None] * R[..., 0, :, :]
    V = jnp.stack([Vr, Vi], axis=-3)
    return UDV(U=U, d=d, V=V)


def cudv_refactor(M, d, V, compose_dtype=None) -> UDV:
    """UdV of (M diag(d) V) for pair matrices — the complex twin of
    udv.udv_refactor (same log-domain d/V composition; QR of the
    unscaled well-conditioned M; complex f64 V-compose through 4 Ozaki
    bf16-limb products)."""
    g = cudv_decompose(M)
    cdt = compose_dtype or jnp.float64
    rdt = jnp.finfo(cdt).dtype
    d = d.astype(rdt)
    d_new = g.d.astype(rdt) * d
    tiny = jnp.finfo(rdt).tiny
    logd = jnp.log(jnp.maximum(d, tiny))
    n = M.shape[-1]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool))
    ratio = jnp.where(upper,
                      jnp.exp(logd[..., None, :] - logd[..., :, None]),
                      0.0)
    Vb = g.V.astype(rdt) * ratio[..., None, :, :].astype(rdt)
    from detqmc_tpu.linalg.ozaki import mm_f64

    return UDV(U=g.U, d=d_new,
               V=cpx_mm_last(Vb, V.astype(rdt), mm_fn=mm_f64))


def cgreen_from_two_udv_df32(left: UDV, right_t: UDV,
                             interpret: bool = False):
    """Stable G = (1 + A)^{-1} from factored complex halves, as a pair
    matrix (2, n, n) f32 — the native-complex twin of
    udv.green_from_two_udv_df32 (same hybrid assembly and range split).
    """
    f64, f32 = jnp.float64, jnp.float32
    U1 = left.U.astype(f32)
    U2 = right_t.U.astype(f32)
    d1 = left.d.astype(f64)
    d2 = right_t.d.astype(f64)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    UhU = cpx_mm_last(cpx_conjT(U1), U2).astype(f64)
    from detqmc_tpu.linalg.ozaki import mm_f64

    VVh = cpx_mm_last(left.V.astype(f64),
                      cpx_conjT(right_t.V.astype(f64)), mm_fn=mm_f64)
    inner = (_scale_cols_pair(_scale_rows_pair(1.0 / d1max, UhU),
                              1.0 / d2max)
             + _scale_cols_pair(_scale_rows_pair(d1min, VVh), d2min))
    r1max = (1.0 / d1max).astype(f32)
    r2max = (1.0 / d2max).astype(f32)
    n = inner.shape[-1]
    from detqmc_tpu.linalg.pallas_cgreen_lanes import (MAX_N,
                                                      solve_inner_complex)

    if n % 8 == 0:
        rh, rl = df32.from_f64(inner[..., 0, :, :])
        ih, il = df32.from_f64(inner[..., 1, :, :])
        if n <= MAX_N:
            mid = solve_inner_complex(rh, rl, ih, il, r1max,
                                      interpret=interpret)
        else:
            # column-lane complex kernel: half the rho-embedded op count
            from detqmc_tpu.linalg.pallas_cgreen import (
                solve_inner_complex_big)

            mid = solve_inner_complex_big(rh, rl, ih, il, r1max,
                                          interpret=interpret)
    else:
        # rho fallback: only the solve pays the embedded 2x
        from detqmc_tpu.linalg.pallas_green import solve_inner

        rho = cpx.to_rho(jnp.moveaxis(inner, -3, 0))
        hi, lo = df32.from_f64(rho)
        r1rho = jnp.concatenate([r1max, r1max], axis=-1)
        mid_rho = solve_inner(hi, lo, r1rho, interpret=interpret)
        mid = jnp.moveaxis(cpx.from_rho(mid_rho), 0, -3)
    return cpx_mm_last(_scale_cols_pair(U2, r2max),
                       cpx_mm_last(mid, cpx_conjT(U1)))


def cgreen_tau_zero_df32(left: UDV, right_t: UDV,
                         interpret: bool = False):
    """Stable time-displaced G(tau, 0) = B(tau,0) [1 + B(beta,0)]^{-1}
    for the complex pair chain — the native twin of udv.green_tau_zero:

        G(tau,0) = U2 d2max^{-1} inner^{-1} (d1min V1)

    with `inner` EXACTLY the range-split matrix of the equal-time pair
    formula; only the right-hand side (dense: d1min V1 instead of
    diag(1/d1max)) and the outer factors differ. The solve runs in the
    complex df32 kernels' general-RHS variant, so the native chain's
    unequal-time measurements never pay the rho embedding's (2n)^3.
    (Reference parity: time-displaced Green support, SURVEY.md §3 "DQMC
    core", §9 "Unequal-time".)"""
    f64, f32 = jnp.float64, jnp.float32
    U1 = left.U.astype(f32)
    U2 = right_t.U.astype(f32)
    d1 = left.d.astype(f64)
    d2 = right_t.d.astype(f64)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    UhU = cpx_mm_last(cpx_conjT(U1), U2).astype(f64)
    from detqmc_tpu.linalg.ozaki import mm_f64

    VVh = cpx_mm_last(left.V.astype(f64),
                      cpx_conjT(right_t.V.astype(f64)), mm_fn=mm_f64)
    inner = (_scale_cols_pair(_scale_rows_pair(1.0 / d1max, UhU),
                              1.0 / d2max)
             + _scale_cols_pair(_scale_rows_pair(d1min, VVh), d2min))
    rhs = _scale_rows_pair(d1min, left.V.astype(f64))
    r2max = (1.0 / d2max).astype(f32)
    n = inner.shape[-1]
    if n % 8 == 0:
        ip = (df32.from_f64(inner[..., 0, :, :])
              + df32.from_f64(inner[..., 1, :, :]))
        rp = (df32.from_f64(rhs[..., 0, :, :])
              + df32.from_f64(rhs[..., 1, :, :]))
        inner_planes = (ip[0], ip[1], ip[2], ip[3])
        rhs_planes = (rp[0], rp[1], rp[2], rp[3])
        from detqmc_tpu.linalg.pallas_cgreen import (
            solve_inner_complex_big_rhs)
        from detqmc_tpu.linalg.pallas_cgreen_lanes import (
            MAX_N, solve_inner_complex_rhs)

        if n <= MAX_N:
            mid = solve_inner_complex_rhs(inner_planes, rhs_planes,
                                          interpret=interpret)
        else:
            mid = solve_inner_complex_big_rhs(inner_planes, rhs_planes,
                                              interpret=interpret)
    else:
        # rho fallback (non-8-multiple dims): embedded f64 solve
        from detqmc_tpu.linalg.udv import green_tau_zero

        G_rho = green_tau_zero(embed_udv(left), embed_udv(right_t),
                               compute_dtype=f64)
        return jnp.stack([G_rho[..., :n, :n], G_rho[..., n:, :n]],
                         axis=-3).astype(f32)
    return cpx_mm_last(_scale_cols_pair(U2, r2max), mid)


def cpx_conjT(A):
    """conj transpose with the pair axis at -3."""
    return jnp.stack([jnp.swapaxes(A[..., 0, :, :], -1, -2),
                      -jnp.swapaxes(A[..., 1, :, :], -1, -2)], axis=-3)


def cpx_mm_last(A, B, mm_fn=mm):
    """Complex matmul with the pair axis at -3."""
    ar, ai = A[..., 0, :, :], A[..., 1, :, :]
    br, bi = B[..., 0, :, :], B[..., 1, :, :]
    re = mm_fn(ar, br) - mm_fn(ai, bi)
    im = mm_fn(ar, bi) + mm_fn(ai, br)
    return jnp.stack([re, im], axis=-3)


def cpx_eye(n, dtype, batch_shape=()):
    re = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (*batch_shape, n, n))
    return jnp.stack([re, jnp.zeros_like(re)], axis=-3)


def embed_udv(f: UDV) -> UDV:
    """Pair UDV -> real-embedded UDV: rho(U d V) = rho(U) diag(d, d)
    rho(V) (used by the occasional rho-fallback paths: global-move
    log-dets, time-displaced greens)."""
    pair_first = lambda X: jnp.moveaxis(X, -3, 0)  # noqa: E731
    return UDV(U=cpx.to_rho(pair_first(f.U)),
               d=jnp.concatenate([f.d, f.d], axis=-1),
               V=cpx.to_rho(pair_first(f.V)))
