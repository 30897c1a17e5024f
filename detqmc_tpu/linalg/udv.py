"""QR-based UdV factorization and stable Green's-function formulas.

This is the TPU equivalent of the reference's stabilization primitive
(SURVEY.md §3 rows "UdV decomposition" / "DQMC core": ``udvDecompose``,
``greenFromUdV``, ``greenFromEye_and_UdV``). A long B-matrix chain has
condition number ~exp(beta*W); partial products are therefore kept in
factored form A = U @ diag(d) @ V with U unitary and d positive, and the
Green's function G = (1 + A)^{-1} is evaluated without ever forming the
ill-conditioned sum (SURVEY.md §9).

Convention used by the sweep (chosen so every ill-conditioned object is
sandwiched between *unitary* factors — no triangular inverses of stack
factors are ever needed, which is both more stable and more MXU-friendly
than solve-heavy forms):

- "left" stack entries factor   B_l ... B_1          = U1 d1 V1   (straight)
- "right" stack entries factor (B_m ... B_{l+1})^H   = U2 d2 V2,
  i.e. B_m ... B_{l+1} = V2^H d2 U2^H                (transposed)

so that G(l) = [1 + (U1 d1 V1)(V2^H d2 U2^H)]^{-1}
             = U2 [U1^H U2 + d1 (V1 V2^H) d2]^{-1} U1^H

with the inner bracket re-UdV'd and range-split (d = max(d,1)*min(d,1))
before any product is formed.

All functions are pure, jit-safe, batchable (leading batch dims broadcast),
and run contractions at HIGHEST precision (TPU defaults to bf16 matmuls).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from detqmc_tpu.precision import mm, scale_cols, scale_rows


class UDV(NamedTuple):
    """A = U @ diag(d) @ V; U unitary, d > 0."""

    U: jax.Array  # (..., n, n)
    d: jax.Array  # (..., n)      positive, real
    V: jax.Array  # (..., n, n)


def _H(a: jax.Array) -> jax.Array:
    """Conjugate transpose (plain transpose for real dtypes)."""
    at = jnp.swapaxes(a, -1, -2)
    return jnp.conj(at) if jnp.issubdtype(a.dtype, jnp.complexfloating) else at


def udv_decompose(A: jax.Array) -> UDV:
    """QR-based UdV: A = Q R = (Q s) |diag(R)| (diag(conj(s)/|R_ii|) R).

    The phase/sign of R's diagonal is folded into U so d stays positive,
    matching the reference's convention (positive scales make log-domain
    bookkeeping and conditioning monitors straightforward).

    On TPU the f32 factorization dispatches to the lane-batched Pallas
    kernel (pallas_qr_lanes; the sign convention differs from LAPACK's
    but is normalized away right here).
    """
    n = A.shape[-1]
    if (A.dtype == jnp.float32 and n % 8 == 0
            and jax.default_backend() == "tpu"):
        from detqmc_tpu.linalg.pallas_qr_lanes import MAX_N, qr_lanes

        from detqmc_tpu.linalg import cholqr

        if cholqr.use_cholqr():
            # batched all-MXU CholeskyQR2 (opt-in A/B route for the
            # small-n huge-batch refactor QRs; R diag positive by
            # construction so the sign fix is the identity)
            Q, R = cholqr.cholqr2(A)
            d = jnp.diagonal(R, axis1=-2, axis2=-1)
            safe = jnp.where(d == 0, 1.0, d)
            return UDV(U=Q, d=jnp.abs(d), V=scale_rows(1.0 / safe, R))
        if n <= MAX_N:
            Q, R = qr_lanes(A)
        else:
            # column-lane layout above the lane ceiling (embedded SDW
            # at L >= 8 runs dim 512): VMEM scales with the batch tile
            Q, R = _big_qr_impl()(A)
        return _sign_fix(A, Q, R)
    Q, R = jnp.linalg.qr(A)
    return _sign_fix(A, Q, R)


def _big_qr_impl():
    """Column-lane real QR for n above the lane ceiling: the blocked
    compact-WY kernel (MXU trailing updates) by default — measured
    faster than the rank-1 kernel at SDW L=8 with identical green_dev;
    DETQMC_TPU_QR=panel selects the pure rank-1 kernel."""
    import os

    if os.environ.get("DETQMC_TPU_QR", "") == "panel":
        from detqmc_tpu.linalg.pallas_qr_big import qr_big

        return qr_big
    from detqmc_tpu.linalg.pallas_qr_wy import qr_wy

    return qr_wy


def _sign_fix(A, Q, R) -> UDV:
    diag = jnp.diagonal(R, axis1=-2, axis2=-1)
    d = jnp.abs(diag)
    safe = jnp.where(d == 0, 1.0, d)  # guard degenerate input
    if jnp.issubdtype(A.dtype, jnp.complexfloating):
        sign = jnp.where(d == 0, 1.0 + 0j, diag / safe)
    else:
        sign = jnp.where(diag >= 0, 1.0, -1.0).astype(A.dtype)
    U = scale_cols(Q, sign)
    V = scale_rows(jnp.conj(sign) / safe, R)
    return UDV(U=U, d=d, V=V)


def udv_refactor(M: jax.Array, d: jax.Array, V: jax.Array,
                 compose_dtype=None, chain_limbs=None) -> UDV:
    """UdV of (M @ diag(d) @ V) for well-conditioned M and positive d.

    Key trick: QR commutes with positive column scaling —
    Q(M diag(d)) == Q(M) and R(M diag(d)) == R(M) diag(d) — so we QR the
    *unscaled* M (column norms O(1); a direct QR of M diag(d) overflows
    fp32 column-norm accumulation once d spans ~1e20, which happens at
    beta >~ 6 on the TPU). The d and V compositions then happen in the log
    domain:
        M diag(d) = U_g diag(g_d) V_g diag(d)
                  = U_g diag(g_d * d) [V_g o (d_k / d_j)]        (j <= k)
    with the d-ratio evaluated as exp(log d_k - log d_j) and masked to the
    upper triangle (V_g is unit-diagonal upper triangular).

    ``compose_dtype``: precision for the d/V accumulation across the whole
    chain. The QR itself sees only one well-conditioned interval block, so
    it can stay in the run dtype; but d spans e^{+-beta W} and V
    accumulates multiplicatively over the chain — composing those in fp32
    limits the stabilized G to ~1e-3 at beta=8. Passing float64 here keeps
    the *accumulated* factors accurate with no f64 QR anywhere (U stays in
    the run dtype: it is orthogonal and carries no scale).
    """
    g = udv_decompose(M)
    cdt = compose_dtype or d.dtype
    rdt = jnp.finfo(cdt).dtype
    d = d.astype(rdt)
    d_new = g.d.astype(rdt) * d
    tiny = jnp.finfo(rdt).tiny
    n = M.shape[-1]
    upper = jnp.triu(jnp.ones((n, n), dtype=bool))
    # d_k / d_j directly: the ratio is bounded by the chain's d-SPREAD
    # (e^{2 beta W} ~ 1e55 at beta=8), far inside f64 range up to
    # beta ~ 25 — one emulated-f64 divide per entry instead of the
    # log/exp round trip, which measured 2.7 ms of the 4.1 ms refactor
    # at the Hubbard bench shape (r5; emulated transcendentals are the
    # expensive TPU ops, division is cheap). In f32 compose mode the
    # spread can overflow f32 at beta >~ 6, so that path keeps the
    # log-domain form (it is not the hot configuration).
    if rdt == jnp.float64:
        ds = jnp.maximum(d, tiny)
        ratio = jnp.where(upper,
                          ds[..., None, :] / ds[..., :, None], 0.0)
    else:
        logd = jnp.log(jnp.maximum(d, tiny))
        ratio = jnp.where(
            upper,
            jnp.exp(logd[..., None, :] - logd[..., :, None]), 0.0)
    Vb = g.V.astype(cdt) * ratio.astype(cdt)
    # the V-chain accumulation is the sweep's hottest f64 product on TPU
    # (40 calls/pair at the headline config); mm_f64 routes it through
    # exact bf16-limb MXU matmuls (linalg/ozaki) instead of XLA's
    # double-word emulation, at the capped chain tier (see
    # ozaki.chain_limbs for the accuracy argument)
    from detqmc_tpu.linalg import ozaki

    return UDV(U=g.U, d=d_new,
               V=ozaki.mm_f64(Vb, V.astype(cdt),
                              limbs=ozaki.chain_limbs(chain_limbs)))


def udv_multiply_left(B: jax.Array, f: UDV, chain_limbs=None) -> UDV:
    """UdV of (B @ U d V): refactor (B U) d, accumulate V.

    Stack-advance step: extend a factored partial product by a freshly
    computed block of B matrices on the left (time grows leftward in
    B_m ... B_1). For the transposed right stack, pass B^H of the new block.
    """
    return udv_refactor(mm(B, f.U), f.d, f.V, chain_limbs=chain_limbs)


def udv_eye(n: int, dtype, batch_shape=()) -> UDV:
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (*batch_shape, n, n))
    real_dtype = jnp.finfo(dtype).dtype  # f32 for c64, f64 for c128, etc.
    one = jnp.ones((*batch_shape, n), dtype=real_dtype)
    return UDV(U=eye, d=one, V=eye)


def green_from_two_udv(left: UDV, right_t: UDV,
                       compute_dtype=None) -> jax.Array:
    """Stable G(l) = (1 + B_{<=l} B_{>l})^{-1} from factored halves.

    left    straight UdV of B_l ... B_1            (= U1 d1 V1)
    right_t UdV of the conj-transposed right half: (B_m ... B_{l+1})^H
            (= U2 d2 V2), so B_{>l} = V2^H d2 U2^H.

    G = U2 [ d1max (d1max^{-1} U1^H U2 d2max^{-1}
             + d1min (V1 V2^H) d2min) d2max ]^{-1} U1^H

    where dmax = max(d, 1), dmin = min(d, 1) bound every formed product's
    dynamic range. Only the inner re-UdV's V' is triangular-solved; all
    other inverses are unitary transposes.
    (Reference parity: greenFromUdV / advanceUp(Down)Green, SURVEY.md §9.)

    ``compute_dtype``: precision island for the inner combine/QR/solve.
    The inner matrix's condition grows like exp(beta * W), so fp32 drowns
    past beta ~ 4-5; passing float64 here (TPU: emulated, but only ~7
    matmul-equivalents per call) restores dev ~ 1e-7 while the rest of the
    sweep stays fp32 on the MXU. Inputs are upcast, G is cast back.
    """
    out_dtype = left.U.dtype
    if compute_dtype is not None and compute_dtype != out_dtype:
        cast = lambda a: a.astype(compute_dtype)  # noqa: E731
        left = UDV(cast(left.U), left.d.astype(
            jnp.finfo(compute_dtype).dtype), cast(left.V))
        right_t = UDV(cast(right_t.U), right_t.d.astype(
            jnp.finfo(compute_dtype).dtype), cast(right_t.V))
    d1 = left.d.astype(left.U.real.dtype)
    d2 = right_t.d.astype(left.U.real.dtype)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    UhU = mm(_H(left.U), right_t.U)            # U1^H U2
    VVh = mm(left.V, _H(right_t.V))            # V1 V2^H
    inner = (scale_cols(scale_rows(1.0 / d1max, UhU), 1.0 / d2max)
             + scale_cols(scale_rows(d1min, VVh), d2min))
    g = udv_decompose(inner)
    # G = U2 d2max^{-1} V'^{-1} d'^{-1} U'^H d1max^{-1} U1^H
    rhs = scale_rows(1.0 / g.d.astype(d1.dtype),
                     scale_cols(_H(g.U), 1.0 / d1max))
    # g.V is unit-diagonal upper triangular by construction
    mid = jax.lax.linalg.triangular_solve(
        g.V, rhs.astype(g.V.dtype), left_side=True, lower=False)
    G = mm(scale_cols(right_t.U, 1.0 / d2max), mm(mid, _H(left.U)))
    return G.astype(out_dtype)


def green_from_two_udv_df32(left: UDV, right_t: UDV,
                            interpret: bool = False,
                            chain_limbs=None) -> jax.Array:
    """Same math as green_from_two_udv, but the ill-conditioned inner
    factorization runs in the df32 Pallas kernel (pallas_green.py) instead
    of XLA's f64-emulated QR (~90 ms latency per call on TPU).

    Inputs follow the hybrid stack layout: U in f32, d/V in f64. The inner
    matrix is assembled in f64 XLA (cheap elementwise work), split into f32
    (hi, lo) pairs for the kernel, and the O(1)-conditioned outer matmuls
    stay plain f32 on the MXU. Output: f32 G.
    """
    from detqmc_tpu.linalg import df32 as _df
    from detqmc_tpu.linalg.pallas_green import solve_inner

    inner, r1max, r2max, U1, U2, _ = _green_inner_real(
        left, right_t, chain_limbs=chain_limbs)
    hi, lo = _df.from_f64(inner)
    mid = solve_inner(hi, lo, r1max, interpret=interpret)
    return mm(scale_cols(U2, r2max), mm(mid, _H(U1)))


def _green_inner_real(left: UDV, right_t: UDV, chain_limbs=None):
    """The range-split inner stabilization matrix (f64) + f32 outer
    scales, shared by the green variants.

    Hybrid assembly: the two cross matmuls stay f32 on the MXU (their
    entries only carry f32 relative accuracy anyway), while the d-range
    scalings and the sum — where the e^{+-beta W} grading enters — run
    as cheap f64 elementwise ops. (A fully-f32 assembly costs ~5x in G
    accuracy; a fully f64 one costs ~20% of the green time in
    emulated-f64 matmul latency.) V1 V2^H must stay f64-accurate: the
    composed stack V factors carry real beyond-f32 information
    (measured: f32 here costs 5x in G accuracy). mm_f64 = exact
    bf16-limb MXU product (linalg/ozaki)."""
    f64 = jnp.float64
    f32 = jnp.float32
    U1 = left.U.astype(f32)
    U2 = right_t.U.astype(f32)
    d1 = left.d.astype(f64)
    d2 = right_t.d.astype(f64)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    from detqmc_tpu.linalg import ozaki

    UhU = mm(_H(U1), U2).astype(f64)
    VVh = ozaki.mm_f64(left.V.astype(f64), _H(right_t.V.astype(f64)),
                       limbs=ozaki.chain_limbs(chain_limbs))
    inner = (scale_cols(scale_rows(1.0 / d1max, UhU), 1.0 / d2max)
             + scale_cols(scale_rows(d1min, VVh), d2min))
    r1max = (1.0 / d1max).astype(f32)
    r2max = (1.0 / d2max).astype(f32)
    return inner, r1max, r2max, U1, U2, (d1max, d1min, d2max, d2min)


def inv_refined(inner, n_iter: int = 2, interpret: bool = False):
    """Z ~= inner^{-1} for a real (..., n, n) f64 matrix, f32 out, via
    mixed-precision iterative refinement — the real twin of
    cudv.cinv_refined: one plain-f32 QR (pallas_qr_lanes) + one f32
    triangular inversion (pallas_trinv), then n_iter Newton-type
    corrections Z += R^{-1} Q^T (I - A Z) whose residuals run as Ozaki
    bf16-limb f64 MXU products. ~15-20x fewer VPU ops than the df32
    QR+backsub kernels; valid when cond(inner) * n * eps_f32 << 1 —
    which the range-split construction guarantees (O(1)-entried,
    well-conditioned inner), and green_dev monitors every sweep."""
    f64, f32 = jnp.float64, jnp.float32
    n = inner.shape[-1]
    A32 = inner.astype(f32)
    on_kernel = n % 8 == 0 and (interpret
                                or jax.default_backend() == "tpu")
    if on_kernel:
        from detqmc_tpu.linalg.pallas_qr_lanes import MAX_N, qr_lanes
        from detqmc_tpu.linalg.pallas_trinv import trinv_big

        if n > MAX_N:
            Q, R = _big_qr_impl()(A32, interpret=interpret)
        else:
            Q, R = qr_lanes(A32, interpret=interpret)
        Rinv = trinv_big(R, interpret=interpret)
    else:
        Q, R = jnp.linalg.qr(A32)
        eye32 = jnp.broadcast_to(jnp.eye(n, dtype=f32), R.shape)
        Rinv = jax.lax.linalg.triangular_solve(
            R, eye32, left_side=True, lower=False)
    Qt = jnp.swapaxes(Q, -1, -2)
    Z = mm(Rinv, Qt)
    from detqmc_tpu.linalg.ozaki import mm_f64, residual_limbs

    eye = jnp.broadcast_to(jnp.eye(n, dtype=f64),
                           (*inner.shape[:-2], n, n))
    rl = residual_limbs()
    # Newton-Schulz: Z <- Z + Z (I - A Z). Same cost per step as the
    # old stationary M(I - A Z) correction (one f32 matmul cheaper) but
    # QUADRATIC: the contraction at step k is rho0^(2^k) instead of
    # rho0^k, so high-conditioned inners (rho0 = n cond eps_f32
    # approaching 1 — Hubbard beta=8 anchors) still converge. Guard:
    # a step only applies where max|S| < 1 (the NS convergence
    # condition); divergent batch elements freeze at their best Z
    # instead of blowing up doubly-exponentially (round-3 measured
    # green_dev max ~4e6 from exactly that blowup).
    for _ in range(n_iter):
        S64 = eye - mm_f64(inner, Z.astype(f64), limbs=rl)
        S = S64.astype(f32)
        ok = (jnp.max(jnp.abs(S), axis=(-2, -1), keepdims=True)
              < 1.0).astype(f32)
        Z = Z + ok * mm(Z, S)
    return Z


def green_refine(left: UDV, right_t: UDV, n_iter: int = 2,
                 interpret: bool = False, chain_limbs=None) -> jax.Array:
    """Stable G via the refined f32-factor inner inverse (inv_refined) —
    identical assembly to green_from_two_udv_df32, with the inner solve
    replaced by Z = inner^{-1} on the refinement path and an exact
    column scaling by diag(1/d1max)."""
    inner, r1max, r2max, U1, U2, _ = _green_inner_real(
        left, right_t, chain_limbs=chain_limbs)
    Z = inv_refined(inner, n_iter=n_iter, interpret=interpret)
    mid = scale_cols(Z, r1max)
    return mm(scale_cols(U2, r2max), mm(mid, _H(U1)))


def green_from_udv(f: UDV) -> jax.Array:
    """Stable G = (1 + U d V)^{-1} for a straight full-chain factorization
    (used at sweep boundaries and after global moves).

    Implemented as the pair formula with an identity other half.
    """
    n = f.U.shape[-1]
    eye_t = udv_eye(n, f.U.dtype, batch_shape=f.d.shape[:-1])
    return green_from_two_udv(f, eye_t)


def green_tau_zero(left: UDV, right_t: UDV, compute_dtype=None
                   ) -> jax.Array:
    """Stable time-displaced G(tau, 0) = B(tau,0) [1 + B(beta,0)]^{-1}.

    Via the identity A(1+CA)^{-1} = [A^{-1} + C]^{-1} with A = B(tau,0)
    = U1 d1 V1 (left stack entry) and C = B(beta,tau) = V2^H d2 U2^H
    (transposed right entry):

        G(tau,0) = U2 [d1^{-1} U1^H U2 + (V1 V2^H) d2]^{-1} V1
                 = U2 D2max^{-1} inner^{-1} (D1min V1)

    where `inner` is EXACTLY the range-split matrix of the equal-time pair
    formula — only the right-hand side and outer scalings differ. All
    scalings stay bounded (d1min <= 1, 1/d2max <= 1).
    (Reference parity: time-displaced Green support, SURVEY.md §3 "DQMC
    core" and §9 "Unequal-time".)
    """
    out_dtype = left.U.dtype
    if compute_dtype is not None and compute_dtype != out_dtype:
        cast = lambda a: a.astype(compute_dtype)  # noqa: E731
        rdt = jnp.finfo(compute_dtype).dtype
        left = UDV(cast(left.U), left.d.astype(rdt), cast(left.V))
        right_t = UDV(cast(right_t.U), right_t.d.astype(rdt),
                      cast(right_t.V))
    d1 = left.d.astype(left.U.real.dtype)
    d2 = right_t.d.astype(left.U.real.dtype)
    d1max, d1min = jnp.maximum(d1, 1.0), jnp.minimum(d1, 1.0)
    d2max, d2min = jnp.maximum(d2, 1.0), jnp.minimum(d2, 1.0)
    UhU = mm(_H(left.U), right_t.U)
    VVh = mm(left.V, _H(right_t.V))
    inner = (scale_cols(scale_rows(1.0 / d1max, UhU), 1.0 / d2max)
             + scale_cols(scale_rows(d1min, VVh), d2min))
    g = udv_decompose(inner)
    rhs = scale_rows(1.0 / g.d.astype(d1.dtype),
                     mm(_H(g.U), scale_rows(d1min, left.V)))
    mid = jax.lax.linalg.triangular_solve(
        g.V, rhs.astype(g.V.dtype), left_side=True, lower=False)
    G = mm(scale_cols(right_t.U, 1.0 / d2max), mid)
    return G.astype(out_dtype)


def green_tau_zero_df32(left: UDV, right_t: UDV,
                        interpret: bool = False,
                        chain_limbs=None) -> jax.Array:
    """Stable G(tau, 0) with the inner solve in the df32 lane kernel:
    the same factorization as green_tau_zero, but the dense-RHS solve
    inner^{-1} (d1min V1) runs in pallas_green_lanes' general-RHS
    variant instead of an emulated-f64 QR + triangular solve on TPU.
    Valid for n <= pallas_green_lanes.MAX_N (the Hubbard sizes); the
    caller keeps green_tau_zero for larger/odd dims.
    (Reference parity: time-displaced Green support, SURVEY.md §3
    "DQMC core", §9 "Unequal-time".)"""
    from detqmc_tpu.linalg import df32 as _df
    from detqmc_tpu.linalg.pallas_green_lanes import solve_inner_lanes_rhs

    f64 = jnp.float64
    inner, _, r2max, U1, U2, (d1max, d1min, d2max, d2min) = \
        _green_inner_real(left, right_t, chain_limbs=chain_limbs)
    rhs = scale_rows(d1min, left.V.astype(f64))
    hi, lo = _df.from_f64(inner)
    rh, rl = _df.from_f64(rhs)
    mid = solve_inner_lanes_rhs(hi, lo, rh, rl, interpret=interpret)
    return mm(scale_cols(U2, r2max), mid)


def green_tau_zero_refine(left: UDV, right_t: UDV, n_iter: int = 2,
                          interpret: bool = False,
                          chain_limbs=None) -> jax.Array:
    """Time-displaced G(tau, 0) on the refinement path: the same
    factorization as green_tau_zero / green_tau_zero_df32, with the
    dense-RHS solve inner^{-1} (d1min V1) done as X = Z rhs for the
    refined inner inverse Z (inv_refined) plus one Newton correction on
    the X system (X += Z (rhs - inner X), residual in Ozaki f64) — all
    MXU matmuls, no df32 VPU kernel. The correction also absorbs the
    f32 rounding of the f64 rhs."""
    f64, f32 = jnp.float64, jnp.float32
    inner, _, r2max, U1, U2, (d1max, d1min, d2max, d2min) = \
        _green_inner_real(left, right_t, chain_limbs=chain_limbs)
    rhs = scale_rows(d1min, left.V.astype(f64))
    Z = inv_refined(inner, n_iter=n_iter, interpret=interpret)
    X = mm(Z, rhs.astype(f32))
    from detqmc_tpu.linalg.ozaki import mm_f64, residual_limbs

    r = (rhs - mm_f64(inner, X.astype(f64),
                      limbs=residual_limbs())).astype(f32)
    X = X + mm(Z, r)
    return mm(scale_cols(U2, r2max), X)


def log_det_one_plus_udv(f: UDV) -> Tuple[jax.Array, jax.Array]:
    """(log|det(1 + UdV)|, sign/phase) in the log domain.

    Used for global-move Metropolis ratios (the reference recomputes the
    stabilized determinant for globalShift/Wolff accepts, SURVEY.md §4.1).
    det(1 + UdV) = det(U) * det(U^H V^{-1} + d) * det(V); computed via the
    range-split inner matrix so no overflow occurs.
    """
    n = f.U.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=f.U.dtype), f.U.shape)
    Vinv = jnp.linalg.solve(f.V, eye)
    d = f.d.astype(f.U.real.dtype)
    dmax, dmin = jnp.maximum(d, 1.0), jnp.minimum(d, 1.0)
    # 1 + UdV = U dmax (dmax^{-1} U^H V^{-1} + dmin) V  (det of each factor)
    inner = scale_rows(1.0 / dmax, mm(_H(f.U), Vinv)) + _diag_embed(
        dmin.astype(f.U.dtype))
    sU, ldU = jnp.linalg.slogdet(f.U)
    sI, ldI = jnp.linalg.slogdet(inner)
    sV, ldV = jnp.linalg.slogdet(f.V)
    log_dmax = jnp.log(dmax).sum(axis=-1)
    return ldU + ldI + ldV + log_dmax, sU * sI * sV


def _diag_embed(d: jax.Array) -> jax.Array:
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def singular_value_range(f: UDV) -> Tuple[jax.Array, jax.Array]:
    """(log10 max d, log10 min d): the conditioning monitor the reference
    exposes via its logSV instrumentation (SURVEY.md §5 item 1)."""
    logd = jnp.log10(jnp.maximum(f.d, jnp.finfo(f.d.dtype).tiny))
    return logd.max(axis=-1), logd.min(axis=-1)
