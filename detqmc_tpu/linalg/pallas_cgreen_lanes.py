"""Lane-batched COMPLEX df32 stabilization kernel (inner solve).

Complex analogue of pallas_green_lanes: computes mid = inner^{-1} diag(r1)
for the n x n COMPLEX inner stabilization matrix, carried as four f32
planes (re_hi, re_lo, im_hi, im_lo) — double-single (df32) complex
Householder QR + back-substitution, walkers in the 128-lane axis.

Why: the SDW fermion matrix is complex; on the real embedding the inner
solve runs at (2n)^3 real-df32 cost and dominates the sweep (measured
77% at the L=4 O(3) config). Native complex costs 4 half-size real
multiply streams = half the embedded op count, with identical numerics
(the embedded real QR and the complex QR compute the same G in exact
arithmetic).

Layout/algorithm mirror pallas_green_lanes exactly (8-column chunks,
triangular restriction, column-oriented in-place back-substitution);
every scalar step is the complex version:

    sigma = ||x|| (real);  u = x_j/|x_j| (phase, 1 at zero)
    alpha = -u sigma;  v = x - alpha e_j;  beta = 2/v^H v (real)
    B -= beta v (v^H B);  M -= beta v (v^H M)
    back-sub: X[j] = M[j] conj(alpha_j)/|alpha_j|^2;
              M[0:j] -= R[0:j, j] X[j]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detqmc_tpu.linalg import df32

WL = 128
CB = 8
# VMEM: ~12 resident (n, n, WL) f32 planes + live df32 temporaries;
# n = 64 ~ 35 MB. n = 96 is the measured-safe ceiling under the 100 MB cap.
MAX_N = 96


def _chs(a, b):
    """conj(a) * b for complex df32 pairs ((re,df),(im,df))."""
    (ar, ai), (br, bi) = a, b
    re = df32.add(df32.mul(ar, br), df32.mul(ai, bi))
    im = df32.sub(df32.mul(ar, bi), df32.mul(ai, br))
    return re, im


def _kernel(*refs, n: int, has_rhs: bool):
    """QR + solve with M initialized from diag(r1) (has_rhs=False) or a
    dense complex df32 RHS DMA'd from HBM (has_rhs=True — the
    time-displaced G path, where the RHS is d1min V1)."""
    it = iter(refs)
    A_hbm = [next(it) for _ in range(4)]
    R_hbm = [next(it) for _ in range(4)] if has_rhs else None
    r1_ref = None if has_rhs else next(it)
    outr_ref, outi_ref = next(it), next(it)
    Brh, Brl, Bih, Bil = (next(it) for _ in range(4))
    Mrl, Mil, Mrh2, Mih2 = (next(it) for _ in range(4))
    arh, arl, aih, ail = (next(it) for _ in range(4))
    sems = [next(it) for _ in range(8 if has_rhs else 4)]
    f32 = outr_ref.dtype
    g = pl.program_id(0)
    dsts = [Brh, Brl, Bih, Bil]
    srcs = list(A_hbm)
    if has_rhs:
        srcs += R_hbm
        dsts += [Mrh2, Mrl, Mih2, Mil]
    dmas = [pltpu.make_async_copy(src.at[pl.ds(g * n, n)], dst, sem)
            for src, dst, sem in zip(srcs, dsts, sems)]
    for d in dmas:
        d.start()
    if not has_rhs:
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        Mrh2[...] = (rows2 == cols2).astype(f32) * r1_ref[...]
        Mrl[...] = jnp.zeros_like(Mrl)
        Mih2[...] = jnp.zeros_like(Mih2)
        Mil[...] = jnp.zeros_like(Mil)
    for r in (arh, arl, aih, ail):
        r[...] = jnp.zeros_like(r)
    for d in dmas:
        d.wait()
    Mrh, Mih = Mrh2, Mih2

    # ---- complex df32 Householder QR ------------------------------------
    for a in range(0, n, CB):
        sz = n - a
        rows = a + jax.lax.broadcasted_iota(jnp.int32, (sz, 1, 1), 0)
        rs = pl.ds(a, sz)

        def qr_step(jj, _, a=a, sz=sz, rows=rows, rs=rs):
            j = jnp.int32(a) + jj
            geq = rows >= j
            onehot = (rows == j).astype(f32)
            xr = df32.mask((Brh[rs, pl.ds(j, 1), :],
                            Brl[rs, pl.ds(j, 1), :]), geq)
            xi = df32.mask((Bih[rs, pl.ds(j, 1), :],
                            Bil[rs, pl.ds(j, 1), :]), geq)
            norm2 = df32.reduce_axis0(
                df32.add(df32.mul(xr, xr), df32.mul(xi, xi)), sz)
            norm = df32.sqrt(norm2)                        # (1, 1, WL)
            x0r = df32.reduce_axis0(df32.scale_signed(xr, onehot), sz)
            x0i = df32.reduce_axis0(df32.scale_signed(xi, onehot), sz)
            a02 = df32.add(df32.mul(x0r, x0r), df32.mul(x0i, x0i))
            a0 = df32.sqrt(a02)
            g0 = (a0[0] == 0).astype(f32)
            inv0 = df32.recip((a0[0] + g0, a0[1]))
            ur = df32.add(df32.mul(x0r, inv0), (g0, jnp.zeros_like(g0)))
            ui = df32.mul(x0i, inv0)
            alr = df32.neg(df32.mul(ur, norm))             # alpha
            ali = df32.neg(df32.mul(ui, norm))
            vr = df32.sub(xr, (alr[0] * onehot, alr[1] * onehot))
            vi = df32.sub(xi, (ali[0] * onehot, ali[1] * onehot))
            vtv = df32.reduce_axis0(
                df32.add(df32.mul(vr, vr), df32.mul(vi, vi)), sz)
            guard = (vtv[0] == 0).astype(f32)
            beta = df32.mul_f32(df32.recip((vtv[0] + guard, vtv[1])), 2.0)
            vrp = df32.presplit(vr)
            vip = df32.presplit(vi)

            def house(Xrh, Xrl, Xih, Xil, cs):
                """X -= beta v (v^H X) on the (rs, cs) block."""
                XR = (Xrh[rs, cs, :], Xrl[rs, cs, :])
                XI = (Xih[rs, cs, :], Xil[rs, cs, :])
                # s = v^H X: re = vr.XR + vi.XI ; im = vr.XI - vi.XR
                s_re = df32.reduce_axis0(df32.add(
                    df32.mul_ps(XR, vrp), df32.mul_ps(XI, vip)),
                    sz)
                s_im = df32.reduce_axis0(df32.sub(
                    df32.mul_ps(XI, vrp), df32.mul_ps(XR, vip)),
                    sz)
                bsr = df32.mul(s_re, beta)                 # (1, k, WL)
                bsi = df32.mul(s_im, beta)
                # X -= v * bs (complex outer)
                newR = df32.sub(XR, df32.sub(df32.mul_ps(bsr, vrp),
                                             df32.mul_ps(bsi, vip)))
                newI = df32.sub(XI, df32.add(df32.mul_ps(bsi, vrp),
                                             df32.mul_ps(bsr, vip)))
                Xrh[rs, cs, :], Xrl[rs, cs, :] = newR
                Xih[rs, cs, :], Xil[rs, cs, :] = newI

            house(Brh, Brl, Bih, Bil, rs)
            house(Mrh, Mrl, Mih, Mil, pl.ds(0, n))
            arh[pl.ds(j, 1)], arl[pl.ds(j, 1)] = alr
            aih[pl.ds(j, 1)], ail[pl.ds(j, 1)] = ali
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, sz)), qr_step,
                          ())

    # ---- complex back-substitution, in place in M ------------------------
    for c in reversed(range(0, n, CB)):
        top = c + CB
        rows = jax.lax.broadcasted_iota(jnp.int32, (top, 1, 1), 0)

        def solve_step(jj, _, c=c, top=top, rows=rows):
            j = jnp.int32(top - 1) - jj
            alr = (arh[pl.ds(j, 1)], arl[pl.ds(j, 1)])
            ali = (aih[pl.ds(j, 1)], ail[pl.ds(j, 1)])
            a2 = df32.add(df32.mul(alr, alr), df32.mul(ali, ali))
            ia2 = df32.recip(a2)
            ivr = df32.mul(alr, ia2)                       # 1/alpha
            ivi = df32.neg(df32.mul(ali, ia2))
            MR = (Mrh[pl.ds(j, 1), :, :], Mrl[pl.ds(j, 1), :, :])
            MI = (Mih[pl.ds(j, 1), :, :], Mil[pl.ds(j, 1), :, :])
            x_re = df32.sub(df32.mul(MR, ivr), df32.mul(MI, ivi))
            x_im = df32.add(df32.mul(MR, ivi), df32.mul(MI, ivr))
            Mrh[pl.ds(j, 1), :, :], Mrl[pl.ds(j, 1), :, :] = x_re
            Mih[pl.ds(j, 1), :, :], Mil[pl.ds(j, 1), :, :] = x_im
            lt = rows < j
            RcR = df32.mask((Brh[pl.ds(0, top), pl.ds(j, 1), :],
                             Brl[pl.ds(0, top), pl.ds(j, 1), :]), lt)
            RcI = df32.mask((Bih[pl.ds(0, top), pl.ds(j, 1), :],
                             Bil[pl.ds(0, top), pl.ds(j, 1), :]), lt)
            RrP = df32.presplit(RcR)
            RiP = df32.presplit(RcI)
            MtR = (Mrh[pl.ds(0, top), :, :], Mrl[pl.ds(0, top), :, :])
            MtI = (Mih[pl.ds(0, top), :, :], Mil[pl.ds(0, top), :, :])
            newR = df32.sub(MtR, df32.sub(df32.mul_ps(x_re, RrP),
                                          df32.mul_ps(x_im, RiP)))
            newI = df32.sub(MtI, df32.add(df32.mul_ps(x_im, RrP),
                                          df32.mul_ps(x_re, RiP)))
            Mrh[pl.ds(0, top), :, :], Mrl[pl.ds(0, top), :, :] = newR
            Mih[pl.ds(0, top), :, :], Mil[pl.ds(0, top), :, :] = newI
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, n - c)),
                          solve_step, ())

    outr_ref[...] = Mrh[...] + Mrl[...]
    outi_ref[...] = Mih[...] + Mil[...]


def _call_lanes(planes, r1, *, interpret: bool, rhs_planes=None):
    Gn, n, _ = planes[0].shape
    G = Gn // n
    has_rhs = rhs_planes is not None
    mat = functools.partial(pl.BlockSpec, (n, n, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    vec = functools.partial(pl.BlockSpec, (n, 1, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pl.ANY)
    shp = jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32)
    n_dma = 8 if has_rhs else 4
    scratch = ([pltpu.VMEM((n, n, WL), jnp.float32) for _ in range(8)]
               + [pltpu.VMEM((n, 1, WL), jnp.float32) for _ in range(4)]
               + [pltpu.SemaphoreType.DMA] * n_dma)
    ins = (list(planes) + list(rhs_planes)) if has_rhs \
        else list(planes) + [r1]
    in_specs = [hbm()] * 8 if has_rhs else [hbm()] * 4 + [vec()]
    with jax.enable_x64(False):
        outr, outi = pl.pallas_call(
            functools.partial(_kernel, n=n, has_rhs=has_rhs),
            grid=(G,),
            out_shape=(shp, shp),
            in_specs=in_specs,
            out_specs=(mat(), mat()),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*ins)
    return outr, outi


@functools.lru_cache(maxsize=None)
def _make_solve(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(inner_rh, inner_rl, inner_ih, inner_il, r1):
        Bt, n, _ = inner_rh.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            z = jnp.zeros((pad, n, n), jnp.float32)
            inner_rh = jnp.concatenate([inner_rh, eye], axis=0)
            inner_rl = jnp.concatenate([inner_rl, z], axis=0)
            inner_ih = jnp.concatenate([inner_ih, z], axis=0)
            inner_il = jnp.concatenate([inner_il, z], axis=0)
            r1 = jnp.concatenate(
                [r1, jnp.ones((pad, n), jnp.float32)], axis=0)

        def to_lanes(x, w):
            x = x.reshape(G, WL, n, w)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, w, WL)

        planes = tuple(to_lanes(p, n) for p in
                       (inner_rh, inner_rl, inner_ih, inner_il))
        r1l = to_lanes(r1[:, :, None], 1)
        outr, outi = _call_lanes(planes, r1l, interpret=interpret)

        def from_lanes(x):
            x = x.reshape(G, n, n, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(G * WL, n, n)

        return jnp.stack([from_lanes(outr), from_lanes(outi)],
                         axis=1)[:Bt]

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        args = [bcast(x, b) for x, b in zip(args, in_batched)]
        lead = args[0].shape[:-2]
        n = args[0].shape[-1]
        out = solve(*[a.reshape(-1, *a.shape[len(lead):]) for a in args])
        return out.reshape(*lead, 2, n, n), True

    return solve


def solve_inner_complex(inner_rh, inner_rl, inner_ih, inner_il, r1, *,
                        interpret: bool = False):
    """mid = inner^{-1} diag(r1) for a complex inner matrix given as four
    (..., n, n) f32 planes; r1 (..., n) real f32. Returns (..., 2, n, n)
    pair matrices. vmap-safe (batch axes flatten into lane groups)."""
    lead = inner_rh.shape[:-2]
    n = inner_rh.shape[-1]
    out = _make_solve(interpret)(
        inner_rh.reshape(-1, n, n), inner_rl.reshape(-1, n, n),
        inner_ih.reshape(-1, n, n), inner_il.reshape(-1, n, n),
        r1.reshape(-1, n))
    return out.reshape(*lead, 2, n, n)


@functools.lru_cache(maxsize=None)
def _make_solve_rhs(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(inner_rh, inner_rl, inner_ih, inner_il,
              rhs_rh, rhs_rl, rhs_ih, rhs_il):
        Bt, n, _ = inner_rh.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            z = jnp.zeros((pad, n, n), jnp.float32)
            padded = []
            for a, fill in ((inner_rh, eye), (inner_rl, z),
                            (inner_ih, z), (inner_il, z),
                            (rhs_rh, z), (rhs_rl, z),
                            (rhs_ih, z), (rhs_il, z)):
                padded.append(jnp.concatenate([a, fill], axis=0))
            (inner_rh, inner_rl, inner_ih, inner_il,
             rhs_rh, rhs_rl, rhs_ih, rhs_il) = padded

        def to_lanes(x):
            x = x.reshape(G, WL, n, n)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, n, WL)

        planes = tuple(to_lanes(p) for p in
                       (inner_rh, inner_rl, inner_ih, inner_il))
        rhs = tuple(to_lanes(p) for p in
                    (rhs_rh, rhs_rl, rhs_ih, rhs_il))
        outr, outi = _call_lanes(planes, None, interpret=interpret,
                                 rhs_planes=rhs)

        def from_lanes(x):
            x = x.reshape(G, n, n, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(G * WL, n, n)

        return jnp.stack([from_lanes(outr), from_lanes(outi)],
                         axis=1)[:Bt]

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        args = [bcast(x, b) for x, b in zip(args, in_batched)]
        lead = args[0].shape[:-2]
        n = args[0].shape[-1]
        out = solve(*[a.reshape(-1, *a.shape[len(lead):]) for a in args])
        return out.reshape(*lead, 2, n, n), True

    return solve


def solve_inner_complex_rhs(inner_planes, rhs_planes, *,
                            interpret: bool = False):
    """X = inner^{-1} RHS for complex df32 inner and RHS, each given as
    four (..., n, n) f32 planes (re_hi, re_lo, im_hi, im_lo). Returns
    (..., 2, n, n) pair matrices. Used by the time-displaced Green path,
    where RHS = d1min V1 is dense (reference: time-displaced G support,
    SURVEY.md §3 "DQMC core" / §9 "Unequal-time")."""
    lead = inner_planes[0].shape[:-2]
    n = inner_planes[0].shape[-1]
    flat = [p.reshape(-1, n, n) for p in (*inner_planes, *rhs_planes)]
    out = _make_solve_rhs(interpret)(*flat)
    return out.reshape(*lead, 2, n, n)
