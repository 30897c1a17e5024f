"""Blocked (compact-WY) column-lane COMPLEX f32 QR: MXU trailing updates.

pallas_cqr applies every Householder reflector as a rank-1 update — pure
VPU work, O(n^3) at vector-unit throughput. This kernel factors the same
matrices panel by panel (PANEL columns of classic rank-1 steps, cost
O(n^2 PANEL)) and applies the accumulated block reflector to the
trailing columns and to the Q^H accumulator as MATMULS on the MXU:

    H_1 H_2 ... H_b = I - V T V^H           (T upper triangular, b x b:
        T_kk = beta_k, T_{0:k,k} = -beta_k T_{0:k,0:k} (V^H v_k))
    applied operator (QR order)  = (H_1...H_b)^H = I - V T^H V^H
    B_trail <- B_trail - V T^H (V^H B_trail)
    P       <- P       - V T^H (V^H P)       (P = Q^H accumulator)

In the transposed tile layout (B[t, c, r] = A[r, c]; V[t, k, r] = k-th
reflector over lanes r) the three products per panel are plain 2-D dots
per batch element:

    S = B_trail . conj(V)^T      (szc, szl) x (szl, b)
    W = S . conj(T)              (szc, b) x (b, b)
    B_trail -= W . V             (szc, b) x (b, szl)

and similarly for P with the contraction over P's sublanes. The dots run
at jax.lax.Precision.HIGHEST; the algebra is verified against the
rank-1 kernel (identical Householder convention => identical Q, R up to
f32 rounding). Verified numerically in numpy before porting: recon /
orthogonality errors ~1e-15 in f64.

Panel work (fraction ~PANEL/n of the flops) stays on the VPU; trailing
work (the other ~1 - PANEL/n) moves to the MXU — the same
speed-of-light split as LAPACK's geqrt vs geqr2, laid out for Mosaic.
(Reference parity: the UdV stabilization QR, SURVEY.md §3.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 8
VMEM_BUDGET = 24 * 1024 * 1024
CHUNK = 128
SUBCHUNK = 8
PANEL = 32

_HI = jax.lax.Precision.HIGHEST


def _max_tile(n: int, b: int) -> int:
    # 4 (T,n,n) scratch + 6 io blocks + 2 (T,b,n) V planes
    per = (10 * n * n + 2 * b * n) * 4
    return max(1, min(MAX_TILE, VMEM_BUDGET // per))


def _dot(a, b_, ca: int, cb: int):
    """2-D dot contracting dim ca of a with dim cb of b_ (f32, HIGHEST)."""
    return jax.lax.dot_general(
        a, b_, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)


def _kernel(BTr_in, BTi_in, Qr_out, Qi_out, Rr_out, Ri_out,
            Br, Bi, Pr, Pi, Vr, Vi, Tr, Ti, *, n: int):
    f32 = Qr_out.dtype
    Br[...] = BTr_in[...]
    Bi[...] = BTi_in[...]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    Pr[...] = jnp.broadcast_to(eye, Pr.shape)
    Pi[...] = jnp.zeros_like(Pi)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    b = PANEL

    for p0 in range(0, n, b):
        pb = min(b, n - p0)
        c0 = (p0 // CHUNK) * CHUNK          # lane-aligned row start
        szl = n - c0
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        ls = pl.ds(c0, szl)
        ps = pl.ds(p0, pb)                  # panel columns (sublanes)
        Vr[...] = jnp.zeros_like(Vr)
        Vi[...] = jnp.zeros_like(Vi)
        Tr[...] = jnp.zeros_like(Tr)
        Ti[...] = jnp.zeros_like(Ti)
        krows = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
        kcols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

        def panel_step(kk, _, p0=p0, pb=pb, c0=c0, szl=szl, lane=lane,
                       ls=ls, ps=ps, krows=krows, kcols=kcols):
            j = jnp.int32(p0) + kk
            onehot = (lane == j).astype(f32)             # (1, 1, szl)
            geq = lane >= j
            xr = jnp.where(geq, Br[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            xi = jnp.where(geq, Bi[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            norm = jnp.sqrt(jnp.sum(xr * xr + xi * xi, -1, keepdims=True))
            x0r = jnp.sum(xr * onehot, -1, keepdims=True)
            x0i = jnp.sum(xi * onehot, -1, keepdims=True)
            a0 = jnp.sqrt(x0r * x0r + x0i * x0i)
            g0 = (a0 == 0).astype(f32)
            inv0 = 1.0 / (a0 + g0)
            ur = x0r * inv0 + g0
            ui = x0i * inv0
            ar_ = -ur * norm                             # alpha = R_jj
            ai_ = -ui * norm
            vr = xr - ar_ * onehot                       # (T, 1, szl)
            vi = xi - ai_ * onehot
            vtv = jnp.sum(vr * vr + vi * vi, -1, keepdims=True)
            guard = (vtv == 0).astype(f32)
            beta = 2.0 / (vtv + guard)                   # (T, 1, 1)

            # rank-1 update of the REMAINING PANEL columns only (VPU)
            Bbr = Br[:, ps, ls]                          # (T, pb, szl)
            Bbi = Bi[:, ps, ls]
            col_in_panel = jax.lax.broadcasted_iota(
                jnp.int32, (1, pb, 1), 1) + p0
            act = (col_in_panel >= j).astype(f32)        # columns >= j
            sr = jnp.sum(vr * Bbr + vi * Bbi, -1, keepdims=True) * act
            si = jnp.sum(vr * Bbi - vi * Bbr, -1, keepdims=True) * act
            bsr = beta * sr
            bsi = beta * si
            Br[:, ps, ls] = Bbr - (bsr * vr - bsi * vi)
            Bi[:, ps, ls] = Bbi - (bsi * vr + bsr * vi)
            is_j = lane_full == j
            Br[:, pl.ds(j, 1), :] = jnp.where(
                is_j, ar_, Br[:, pl.ds(j, 1), :])
            Bi[:, pl.ds(j, 1), :] = jnp.where(
                is_j, ai_, Bi[:, pl.ds(j, 1), :])

            # T column k: p = V^H v (over lanes), rows < k only;
            # T[:,k] = -beta T p, T[k,k] = beta
            Vbr = Vr[:, :, ls]                           # (T, b, szl)
            Vbi = Vi[:, :, ls]
            pr_ = jnp.sum(Vbr * vr + Vbi * vi, -1, keepdims=True)
            pi_ = jnp.sum(Vbr * vi - Vbi * vr, -1, keepdims=True)
            ltk = (krows < kk).astype(f32)               # (1, b, 1)
            pr_ = pr_ * ltk
            pi_ = pi_ * ltk
            trs, tis = [], []
            for t in range(Tr.shape[0]):
                trs.append(_dot(Tr[t], pr_[t], 1, 0)
                           - _dot(Ti[t], pi_[t], 1, 0))
                tis.append(_dot(Tr[t], pi_[t], 1, 0)
                           + _dot(Ti[t], pr_[t], 1, 0))
            # stack (concatenate) instead of .at[].set — scatter does
            # not lower in Mosaic TC kernels
            tcr = jnp.stack(trs) if len(trs) > 1 else trs[0][None]
            tci = jnp.stack(tis) if len(tis) > 1 else tis[0][None]
            tcr = -beta * tcr * ltk + beta * (krows == kk).astype(f32)
            tci = -beta * tci * ltk
            sel = kcols == kk                            # (1, 1, b)
            Tr[...] = jnp.where(sel, tcr, Tr[...])
            Ti[...] = jnp.where(sel, tci, Ti[...])
            # store v into V row k
            selr = krows == kk                           # (1, b, 1)
            Vr[:, :, ls] = jnp.where(selr, vr, Vr[:, :, ls])
            Vi[:, :, ls] = jnp.where(selr, vi, Vi[:, :, ls])
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(pb), panel_step, ())

        # ---- blocked trailing updates on the MXU ------------------------
        t0 = p0 + pb
        if t0 < n:
            cs_t = pl.ds(t0, n - t0)
            for t in range(Br.shape[0]):
                Bt_r = Br[t, cs_t, ls]                   # (szc, szl)
                Bt_i = Bi[t, cs_t, ls]
                Vt_r = Vr[t, :, ls]                      # (b, szl)
                Vt_i = Vi[t, :, ls]
                # S = B . conj(V)^T  (contract lanes)
                S_r = _dot(Bt_r, Vt_r, 1, 1) + _dot(Bt_i, Vt_i, 1, 1)
                S_i = _dot(Bt_i, Vt_r, 1, 1) - _dot(Bt_r, Vt_i, 1, 1)
                # W = S . conj(T)
                W_r = _dot(S_r, Tr[t], 1, 0) + _dot(S_i, Ti[t], 1, 0)
                W_i = _dot(S_i, Tr[t], 1, 0) - _dot(S_r, Ti[t], 1, 0)
                # B -= W . V
                Br[t, cs_t, ls] = Bt_r - (_dot(W_r, Vt_r, 1, 0)
                                          - _dot(W_i, Vt_i, 1, 0))
                Bi[t, cs_t, ls] = Bt_i - (_dot(W_r, Vt_i, 1, 0)
                                          + _dot(W_i, Vt_r, 1, 0))

        # P <- P - V_math T^H (V_math^H P): contraction over P's sublanes
        # (rows r >= p0); V_math[r, k] = V[k, r]
        rs = pl.ds(p0, n - p0)
        for t in range(Pr.shape[0]):
            Pt_r = Pr[t, rs, :]                          # (nr, n)
            Pt_i = Pi[t, rs, :]
            Vt_r = Vr[t, :, rs]                          # (b, nr)
            Vt_i = Vi[t, :, rs]
            # Sp = V_math^H P = conj(V) . P  (contract rows r)
            Sp_r = _dot(Vt_r, Pt_r, 1, 0) + _dot(Vt_i, Pt_i, 1, 0)
            Sp_i = _dot(Vt_r, Pt_i, 1, 0) - _dot(Vt_i, Pt_r, 1, 0)
            # U = T^H Sp
            U_r = _dot(Tr[t], Sp_r, 0, 0) + _dot(Ti[t], Sp_i, 0, 0)
            U_i = _dot(Tr[t], Sp_i, 0, 0) - _dot(Ti[t], Sp_r, 0, 0)
            # P -= V_math U = V^T . U (contract k)
            Pr[t, rs, :] = Pt_r - (_dot(Vt_r, U_r, 0, 0)
                                   - _dot(Vt_i, U_i, 0, 0))
            Pi[t, rs, :] = Pt_i - (_dot(Vt_r, U_i, 0, 0)
                                   + _dot(Vt_i, U_r, 0, 0))

    # Q = P^H; R = upper(B^T)
    Qr_out[...] = jnp.swapaxes(Pr[...], -1, -2)
    Qi_out[...] = -jnp.swapaxes(Pi[...], -1, -2)
    upper = rows2 <= cols2
    Rr_out[...] = jnp.where(upper, jnp.swapaxes(Br[...], -1, -2), 0.0)
    Ri_out[...] = jnp.where(upper, jnp.swapaxes(Bi[...], -1, -2), 0.0)


def _call_batched(BTr, BTi, *, interpret: bool):
    Bt, n, _ = BTr.shape
    T = 1
    for t in range(min(_max_tile(n, PANEL), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Bt, n, n), jnp.float32)
    scratch = ([pltpu.VMEM((T, n, n), jnp.float32)] * 4
               + [pltpu.VMEM((T, PANEL, n), jnp.float32)] * 2
               + [pltpu.VMEM((T, PANEL, PANEL), jnp.float32)] * 2)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(Bt // T,),
            out_shape=(shp,) * 4,
            in_specs=[mat(), mat()],
            out_specs=(mat(),) * 4,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(BTr, BTi)
    return outs


@functools.lru_cache(maxsize=None)
def _make_cqr(interpret: bool):
    @jax.custom_batching.custom_vmap
    def cqr(A):                                   # (Bt, 2, n, n) f32
        BTr = jnp.swapaxes(A[:, 0], -1, -2)
        BTi = jnp.swapaxes(A[:, 1], -1, -2)
        Qr, Qi, Rr, Ri = _call_batched(BTr, BTi, interpret=interpret)
        return (jnp.stack([Qr, Qi], axis=1),
                jnp.stack([Rr, Ri], axis=1))

    @cqr.def_vmap
    def _rule(axis_size, in_batched, A):
        if not in_batched[0]:
            A = jnp.broadcast_to(A[None], (axis_size, *A.shape))
        lead = A.shape[:-3]
        n = A.shape[-1]
        Q, R = cqr(A.reshape(-1, 2, n, n))
        return (Q.reshape(*lead, 2, n, n), R.reshape(*lead, 2, n, n)), \
            (True, True)

    return cqr


def cqr_wy(A, *, interpret: bool = False):
    """Batched complex f32 QR on pair matrices (..., 2, n, n) ->
    (Q, R) pairs via the blocked compact-WY algorithm (MXU trailing
    updates). Same Householder convention as pallas_cqr.cqr_big; any
    n % 8 == 0."""
    lead = A.shape[:-3]
    n = A.shape[-1]
    Q, R = _make_cqr(interpret)(A.reshape(-1, 2, n, n))
    return Q.reshape(*lead, 2, n, n), R.reshape(*lead, 2, n, n)
