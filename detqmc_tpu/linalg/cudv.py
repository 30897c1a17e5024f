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


def _big_cqr_impl():
    """Column-lane complex QR implementation for n > the lane ceiling:
    the blocked compact-WY kernel (MXU trailing updates, pallas_cqr_wy)
    by default — measured faster than rank-1 at SDW L=8 with identical
    green_dev; DETQMC_TPU_QR=panel selects the pure rank-1 kernel."""
    import os

    if os.environ.get("DETQMC_TPU_QR", "") == "panel":
        from detqmc_tpu.linalg.pallas_cqr import cqr_big

        return cqr_big
    from detqmc_tpu.linalg.pallas_cqr_wy import cqr_wy

    return cqr_wy


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
            Q, R = _big_cqr_impl()(A)
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


def cudv_refactor(M, d, V, compose_dtype=None, chain_limbs=None) -> UDV:
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
    n = M.shape[-1]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool))
    # direct d_k / d_j division instead of the log/exp round trip —
    # bounded by the chain's d-spread, inside f64 range to beta ~ 25;
    # see udv.udv_refactor's note (the real twin, measured on-chip r5)
    if rdt == jnp.float64:
        ds = jnp.maximum(d, tiny)
        ratio = jnp.where(upper,
                          ds[..., None, :] / ds[..., :, None], 0.0)
    else:
        logd = jnp.log(jnp.maximum(d, tiny))
        ratio = jnp.where(
            upper,
            jnp.exp(logd[..., None, :] - logd[..., :, None]), 0.0)
    Vb = g.V.astype(rdt) * ratio[..., None, :, :].astype(rdt)
    from detqmc_tpu.linalg import ozaki

    cl = ozaki.chain_limbs(chain_limbs)
    mm_chain = lambda a, b: ozaki.mm_f64(a, b, limbs=cl)  # noqa: E731
    return UDV(U=g.U, d=d_new,
               V=cpx_mm_last(Vb, V.astype(rdt), mm_fn=mm_chain))


def _green_inner(left: UDV, right_t: UDV, chain_limbs=None):
    """The range-split inner stabilization matrix shared by every green
    variant: inner = d1max^{-1} U1^H U2 d2max^{-1} + d1min V1 V2^H d2min
    as an f64 pair, plus the f32 outer scales 1/d1max, 1/d2max."""
    f64, f32 = jnp.float64, jnp.float32
    U1 = left.U.astype(f32)
    U2 = right_t.U.astype(f32)
    d1 = left.d.astype(f64)
    d2 = right_t.d.astype(f64)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    UhU = cpx_mm_last(cpx_conjT(U1), U2).astype(f64)
    from detqmc_tpu.linalg import ozaki

    cl = ozaki.chain_limbs(chain_limbs)
    mm_chain = lambda a, b: ozaki.mm_f64(a, b, limbs=cl)  # noqa: E731
    VVh = cpx_mm_last(left.V.astype(f64),
                      cpx_conjT(right_t.V.astype(f64)), mm_fn=mm_chain)
    inner = (_scale_cols_pair(_scale_rows_pair(1.0 / d1max, UhU),
                              1.0 / d2max)
             + _scale_cols_pair(_scale_rows_pair(d1min, VVh), d2min))
    r1max = (1.0 / d1max).astype(f32)
    r2max = (1.0 / d2max).astype(f32)
    return inner, r1max, r2max, U1, U2, (d1max, d1min, d2max, d2min)


def cinv_refined(inner, n_iter: int = 2, interpret: bool = False):
    """Z ~= inner^{-1} for a complex pair matrix (..., 2, n, n), f64
    planes in / f32 pair out, via mixed-precision iterative refinement:

      1. factor A32 = QR once in PLAIN f32 (pallas_cqr[_lanes]) —
         ~15-20x fewer VPU ops than the df32 QR of pallas_cgreen;
      2. invert R once (pallas_ctrinv, f32 VPU);
      3. Z0 = R^{-1} Q^H, then n_iter Newton-type corrections
         Z += R^{-1} Q^H (I - A Z), each = two f32 MXU matmuls plus an
         Ozaki bf16-limb f64 residual — MXU work, not VPU.

    Householder QR is backward stable in f32, so the per-iteration error
    contraction is ~cond(inner) * n * eps_f32; the stabilized inner
    matrix is O(1)-entried and well-conditioned by construction (that is
    the point of the range split), giving ~1e-7 relative after two
    iterations — the same floor as the df32 kernels' f32 output.
    (Reference parity: greenFromUdV's stable inner solve, SURVEY.md §3
    "DQMC core"; the precision strategy is TPU-native.)"""
    f64, f32 = jnp.float64, jnp.float32
    n = inner.shape[-1]
    A32 = inner.astype(f32)
    on_kernel = n % 8 == 0 and (interpret
                                or jax.default_backend() == "tpu")
    if on_kernel:
        from detqmc_tpu.linalg.pallas_cqr_lanes import MAX_N, cqr_lanes
        from detqmc_tpu.linalg.pallas_ctrinv import ctrinv_big

        if n <= MAX_N:
            Q, R = cqr_lanes(A32, interpret=interpret)
        else:
            Q, R = _big_cqr_impl()(A32, interpret=interpret)
        Rinv = ctrinv_big(R, interpret=interpret)
    else:
        # off-TPU correctness path: jnp complex QR + triangular solve
        Ac = (A32[..., 0, :, :] + 1j * A32[..., 1, :, :]).astype(
            jnp.complex64)
        Qc, Rc = jnp.linalg.qr(Ac)
        eye_c = jnp.broadcast_to(jnp.eye(n, dtype=Rc.dtype),
                                 Rc.shape)
        Rinv_c = jax.lax.linalg.triangular_solve(
            Rc, eye_c, left_side=True, lower=False)
        pair = lambda X: jnp.stack(  # noqa: E731
            [jnp.real(X), jnp.imag(X)], axis=-3).astype(f32)
        Q, Rinv = pair(Qc), pair(Rinv_c)
    Qh = cpx_conjT(Q)
    Z = cpx_mm_last(Rinv, Qh)
    from detqmc_tpu.linalg.ozaki import mm_f64, residual_limbs

    eye = cpx_eye(n, f64, inner.shape[:-3])
    rl = residual_limbs()
    mm_res = lambda a, b: mm_f64(a, b, limbs=rl)  # noqa: E731
    # Newton-Schulz with a divergence freeze guard — see
    # udv.inv_refined: quadratic contraction (rho0^(2^k)) at the same
    # per-step cost, and batch elements whose residual max|S| >= 1
    # keep their current Z instead of blowing up.
    for _ in range(n_iter):
        S = eye - cpx_mm_last(inner, Z.astype(f64), mm_fn=mm_res)
        S32 = S.astype(f32)
        ok = (jnp.max(jnp.abs(S32), axis=(-3, -2, -1), keepdims=True)
              < 1.0).astype(f32)
        Z = Z + ok * cpx_mm_last(Z, S32)
    return Z


def cgreen_refine(left: UDV, right_t: UDV, n_iter: int = 2,
                  interpret: bool = False, chain_limbs=None):
    """Stable G = (1 + A)^{-1} via the refined f32-factor inner inverse
    (cinv_refined) — the fast TPU path for large complex dims. Identical
    assembly to cgreen_from_two_udv_df32; only the inner solve differs
    (Z = inner^{-1} refined on the MXU, then exact column scaling by
    diag(1/d1max))."""
    inner, r1max, r2max, U1, U2, _ = _green_inner(
        left, right_t, chain_limbs=chain_limbs)
    Z = cinv_refined(inner, n_iter=n_iter, interpret=interpret)
    mid = _scale_cols_pair(Z, r1max)
    return cpx_mm_last(_scale_cols_pair(U2, r2max),
                       cpx_mm_last(mid, cpx_conjT(U1)))


def cgreen_from_two_udv_df32(left: UDV, right_t: UDV,
                             interpret: bool = False, chain_limbs=None):
    """Stable G = (1 + A)^{-1} from factored complex halves, as a pair
    matrix (2, n, n) f32 — the native-complex twin of
    udv.green_from_two_udv_df32 (same hybrid assembly and range split).
    """
    inner, r1max, r2max, U1, U2, _ = _green_inner(
        left, right_t, chain_limbs=chain_limbs)
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
                         interpret: bool = False, chain_limbs=None):
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
    inner, _, r2max, U1, U2, (d1max, d1min, d2max, d2min) = \
        _green_inner(left, right_t, chain_limbs=chain_limbs)
    rhs = _scale_rows_pair(d1min, left.V.astype(f64))
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


def cgreen_tau_zero_refine(left: UDV, right_t: UDV, n_iter: int = 2,
                           interpret: bool = False, chain_limbs=None):
    """Time-displaced G(tau, 0) for the complex pair chain on the
    refinement path — the native twin of udv.green_tau_zero_refine:
    X = Z (d1min V1) for the refined inner inverse Z (cinv_refined) plus
    one Newton correction on the X system, all MXU matmuls."""
    f64, f32 = jnp.float64, jnp.float32
    inner, _, r2max, U1, U2, (d1max, d1min, d2max, d2min) = \
        _green_inner(left, right_t, chain_limbs=chain_limbs)
    rhs = _scale_rows_pair(d1min, left.V.astype(f64))
    Z = cinv_refined(inner, n_iter=n_iter, interpret=interpret)
    X = cpx_mm_last(Z, rhs.astype(f32))
    from detqmc_tpu.linalg.ozaki import mm_f64, residual_limbs

    rl = residual_limbs()
    mm_res = lambda a, b: mm_f64(a, b, limbs=rl)  # noqa: E731
    r = (rhs - cpx_mm_last(inner, X.astype(f64), mm_fn=mm_res)
         ).astype(f32)
    X = X + cpx_mm_last(Z, r)
    return cpx_mm_last(_scale_cols_pair(U2, r2max), X)


def clog_abs_det_one_plus_udv(f: UDV) -> jax.Array:
    """log|det(1 + U d V)| for a complex pair chain, no V inverse.

    The real-path formula (udv.log_det_one_plus_udv) needs V^{-1} and
    three slogdets — on the TPU that means an emulated-f64 LU of the rho
    embedding at 2n. This uses the inverse-free factorization

        1 + U d V = (U dmax) (dmax^{-1} U^H + dmin V),    d = dmax dmin

    (check: U U^H + U dmax dmin V = 1 + U d V). U is unitary
    (|det U| = 1), dmax is diagonal, and M = dmax^{-1} U^H + dmin V has
    O(1)-bounded entries (1/dmax <= 1 rows of a unitary; dmin <= 1 rows
    of the unit-triangular-composed V), so

        log|det(1 + U d V)| = sum log dmax + sum log d_i(QR(M))

    with the QR running in the f32 complex pair kernels. Householder QR
    is column-scale accurate, so each log d_i carries ~n*eps_f32
    relative error; the accumulated absolute error on the log (~1e-3 at
    n = 256) is far below the O(1) log-ratio differences global-move
    accepts compare. (Reference parity: the stabilized determinant
    recompute for globalShift/Wolff accepts, SURVEY.md §4.1.)"""
    f64 = jnp.float64
    d = f.d.astype(f64)
    dmax, dmin = jnp.maximum(d, 1.0), jnp.minimum(d, 1.0)
    f32 = jnp.float32
    Uh = cpx_conjT(f.U.astype(f32))
    M = (_scale_rows_pair((1.0 / dmax).astype(f32), Uh)
         + _scale_rows_pair(dmin, f.V.astype(f64)).astype(f32))
    g = cudv_decompose(M)
    tiny = jnp.finfo(f32).tiny
    logdM = jnp.log(jnp.maximum(g.d.astype(f64), tiny)).sum(axis=-1)
    return jnp.log(dmax).sum(axis=-1) + logdM


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
