"""Blocked (compact-WY) column-lane REAL f32 QR: MXU trailing updates.

Real twin of pallas_cqr_wy (see that module's docstring for the
algorithm and layout): panel of rank-1 Householder steps on the VPU,
then the accumulated block reflector I - V T^T V^T applied to the
trailing columns and the Q^T accumulator as 2-D MXU dots. Serves
udv.inv_refined / cudv's embedded paths at real dims above the lane
kernels' ceiling. (Reference parity: the UdV stabilization QR,
SURVEY.md §3.)
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
PANEL = 32

_HI = jax.lax.Precision.HIGHEST


def _max_tile(n: int, b: int) -> int:
    per = (5 * n * n + b * n) * 4      # 2 scratch + 3 io + V
    return max(1, min(MAX_TILE, VMEM_BUDGET // per))


def _dot(a, b_, ca: int, cb: int):
    return jax.lax.dot_general(
        a, b_, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)


def _kernel(BT_in, Q_out, R_out, B, P, V, Tm, *, n: int):
    f32 = Q_out.dtype
    B[...] = BT_in[...]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    P[...] = jnp.broadcast_to(eye, P.shape)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    b = PANEL

    for p0 in range(0, n, b):
        pb = min(b, n - p0)
        c0 = (p0 // CHUNK) * CHUNK
        szl = n - c0
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        ls = pl.ds(c0, szl)
        ps = pl.ds(p0, pb)
        V[...] = jnp.zeros_like(V)
        Tm[...] = jnp.zeros_like(Tm)
        krows = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
        kcols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

        def panel_step(kk, _, p0=p0, pb=pb, c0=c0, szl=szl, lane=lane,
                       ls=ls, ps=ps, krows=krows, kcols=kcols):
            j = jnp.int32(p0) + kk
            onehot = (lane == j).astype(f32)
            geq = lane >= j
            x = jnp.where(geq, B[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            norm = jnp.sqrt(jnp.sum(x * x, -1, keepdims=True))
            x0 = jnp.sum(x * onehot, -1, keepdims=True)
            sgn = jnp.where(x0 < 0, -1.0, 1.0).astype(f32)
            alpha = -sgn * norm
            v = x - alpha * onehot
            vtv = jnp.sum(v * v, -1, keepdims=True)
            guard = (vtv == 0).astype(f32)
            beta = 2.0 / (vtv + guard)

            Bb = B[:, ps, ls]
            col_in_panel = jax.lax.broadcasted_iota(
                jnp.int32, (1, pb, 1), 1) + p0
            act = (col_in_panel >= j).astype(f32)
            s = jnp.sum(v * Bb, -1, keepdims=True) * act
            B[:, ps, ls] = Bb - (beta * s) * v
            is_j = lane_full == j
            B[:, pl.ds(j, 1), :] = jnp.where(
                is_j, alpha, B[:, pl.ds(j, 1), :])

            Vb = V[:, :, ls]
            p_ = jnp.sum(Vb * v, -1, keepdims=True)
            ltk = (krows < kk).astype(f32)
            p_ = p_ * ltk
            # stack (concatenate) instead of .at[].set — scatter does
            # not lower in Mosaic TC kernels
            tcs = [_dot(Tm[t], p_[t], 1, 0) for t in range(Tm.shape[0])]
            tc = jnp.stack(tcs) if len(tcs) > 1 else tcs[0][None]
            tc = -beta * tc * ltk + beta * (krows == kk).astype(f32)
            sel = kcols == kk
            Tm[...] = jnp.where(sel, tc, Tm[...])
            selr = krows == kk
            V[:, :, ls] = jnp.where(selr, v, V[:, :, ls])
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(pb), panel_step, ())

        t0 = p0 + pb
        if t0 < n:
            cs_t = pl.ds(t0, n - t0)
            for t in range(B.shape[0]):
                Bt = B[t, cs_t, ls]                      # (szc, szl)
                Vt = V[t, :, ls]                         # (b, szl)
                S = _dot(Bt, Vt, 1, 1)                   # (szc, b)
                W = _dot(S, Tm[t], 1, 0)                 # W = S T
                B[t, cs_t, ls] = Bt - _dot(W, Vt, 1, 0)

        rs = pl.ds(p0, n - p0)
        for t in range(P.shape[0]):
            Pt = P[t, rs, :]
            Vt = V[t, :, rs]
            Sp = _dot(Vt, Pt, 1, 0)                      # V . P
            U = _dot(Tm[t], Sp, 0, 0)                    # T^T Sp
            P[t, rs, :] = Pt - _dot(Vt, U, 0, 0)

    Q_out[...] = jnp.swapaxes(P[...], -1, -2)
    upper = rows2 <= cols2
    R_out[...] = jnp.where(upper, jnp.swapaxes(B[...], -1, -2), 0.0)


def _call_batched(BT, *, interpret: bool):
    Bt, n, _ = BT.shape
    T = 1
    for t in range(min(_max_tile(n, PANEL), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Bt, n, n), jnp.float32)
    scratch = ([pltpu.VMEM((T, n, n), jnp.float32)] * 2
               + [pltpu.VMEM((T, PANEL, n), jnp.float32)]
               + [pltpu.VMEM((T, PANEL, PANEL), jnp.float32)])
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(Bt // T,),
            out_shape=(shp, shp),
            in_specs=[mat()],
            out_specs=(mat(), mat()),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(BT)
    return outs


@functools.lru_cache(maxsize=None)
def _make_qr(interpret: bool):
    @jax.custom_batching.custom_vmap
    def qr(A):                                   # (Bt, n, n) f32
        Q, R = _call_batched(jnp.swapaxes(A, -1, -2), interpret=interpret)
        return Q, R

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        if not in_batched[0]:
            A = jnp.broadcast_to(A[None], (axis_size, *A.shape))
        lead = A.shape[:-2]
        n = A.shape[-1]
        Q, R = qr(A.reshape(-1, n, n))
        return (Q.reshape(*lead, n, n), R.reshape(*lead, n, n)), \
            (True, True)

    return qr


def qr_wy(A, *, interpret: bool = False):
    """Batched real f32 QR: (..., n, n) -> (Q, R) via the blocked
    compact-WY algorithm (MXU trailing updates). Same Householder
    convention as pallas_qr_big; any n % 8 == 0."""
    lead = A.shape[:-2]
    n = A.shape[-1]
    Q, R = _make_qr(interpret)(A.reshape(-1, n, n))
    return Q.reshape(*lead, n, n), R.reshape(*lead, n, n)
