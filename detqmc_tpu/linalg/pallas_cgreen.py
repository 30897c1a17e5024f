"""Column-lane COMPLEX df32 stabilization kernel (inner solve, large n).

Computes mid = inner^{-1} diag(r1) for the n x n COMPLEX inner
stabilization matrix carried as four f32 planes (re_hi, re_lo, im_hi,
im_lo). The lane-batched complex solver (pallas_cgreen_lanes) keeps ~12
resident (n, n, 128) buffers and stops at n = 96; above that the native
chain used to fall back to the REAL df32 solver on the rho embedding —
(2n)^3 real-df32 work, 2x the complex op count. This kernel removes that
2x for the science-scale SDW dims (complex 256 at L = 8 full opdim-3,
512 at L = 11..12; reference sizes per SURVEY.md §1) by running the
complex df32 Householder QR + back-substitution in pallas_green's
column-lane layout: batch tiled in the grid, A-columns in sublanes,
A-rows in lanes, VMEM ~ 12 (T, n, n) buffers.

Algorithm = pallas_cgreen_lanes' complex df32 math in pallas_green's
layout and loop structure:

  B[t, c, r] = inner[r, c]^T planes (4x); M = diag(r1) accumulates
  U'^H diag(r1) through the left-applied reflectors; back-substitution
  runs column-oriented IN PLACE in M:
      X[j, :] = M[j, :] * conj(alpha_j)/|alpha_j|^2
      M[0:j, :] -= R[0:j, j] X[j, :]
  reading R's column j directly from B's sublane j (no transpose pass —
  in this layout R columns are lane-contiguous, which is why the
  column-oriented form is preferred over pallas_green's row-oriented
  one).

Same two-level triangular work restriction as pallas_green: sublane
chunks of 8 columns, lane ranges 128-aligned; the skipped regions are
exactly what the masks would zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detqmc_tpu.linalg import df32

MAX_TILE = 16
VMEM_BUDGET = 12 * 1024 * 1024  # ~12 scratch (T, n, n) f32 buffers
CHUNK = 128
SUBCHUNK = 8


def _max_tile(n: int, bufs: int = 12) -> int:
    return max(1, min(MAX_TILE, VMEM_BUDGET // (bufs * n * n * 4)))


def _kernel(*refs, n: int, has_rhs: bool):
    it = iter(refs)
    BTrh_in, BTrl_in, BTih_in, BTil_in = (next(it) for _ in range(4))
    R_in = [next(it) for _ in range(4)] if has_rhs else None
    r1_ref = None if has_rhs else next(it)
    outr_ref, outi_ref = next(it), next(it)
    Brh, Brl, Bih, Bil = (next(it) for _ in range(4))
    Mrh, Mrl, Mih, Mil = (next(it) for _ in range(4))
    arh, arl, aih, ail = (next(it) for _ in range(4))
    f32 = outr_ref.dtype
    Brh[...] = BTrh_in[...]
    Brl[...] = BTrl_in[...]
    Bih[...] = BTih_in[...]
    Bil[...] = BTil_in[...]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    if has_rhs:
        # dense complex df32 RHS (row-major: rows in sublanes like M)
        Mrh[...], Mrl[...], Mih[...], Mil[...] = (
            R_in[0][...], R_in[1][...], R_in[2][...], R_in[3][...])
    else:
        eye = (rows2 == cols2).astype(f32)               # (1, n, n)
        Mrh[...] = eye * r1_ref[...]                     # diag(r1)
        Mrl[...] = jnp.zeros_like(Mrl)
        Mih[...] = jnp.zeros_like(Mih)
        Mil[...] = jnp.zeros_like(Mil)
    for r in (arh, arl, aih, ail):
        r[...] = jnp.zeros_like(r)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    # ---- complex df32 Householder QR -----------------------------------
    b8 = min(SUBCHUNK, n)
    for a8 in range(0, n, b8):
        c0 = (a8 // CHUNK) * CHUNK
        szc = n - a8
        szl = n - c0
        cw = min(b8, szc)
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        cs = pl.ds(a8, szc)
        ls = pl.ds(c0, szl)

        def qr_step(jj, _, a8=a8, szc=szc, szl=szl, lane=lane, cs=cs,
                    ls=ls, c0=c0):
            j = jnp.int32(a8) + jj
            onehot = (lane == j).astype(f32)             # (1, 1, szl)
            geq = lane >= j
            XR = df32.mask((Brh[:, pl.ds(j, 1), :][:, :, c0:],
                            Brl[:, pl.ds(j, 1), :][:, :, c0:]), geq)
            XI = df32.mask((Bih[:, pl.ds(j, 1), :][:, :, c0:],
                            Bil[:, pl.ds(j, 1), :][:, :, c0:]), geq)
            norm2 = df32.reduce_last(
                df32.add(df32.mul(XR, XR), df32.mul(XI, XI)), szl)
            norm = df32.sqrt(norm2)                      # (T, 1, 1)
            x0r = df32.reduce_last(df32.scale_signed(XR, onehot), szl)
            x0i = df32.reduce_last(df32.scale_signed(XI, onehot), szl)
            a02 = df32.add(df32.mul(x0r, x0r), df32.mul(x0i, x0i))
            a0 = df32.sqrt(a02)
            g0 = (a0[0] == 0).astype(f32)
            inv0 = df32.recip((a0[0] + g0, a0[1]))
            ur = df32.add(df32.mul(x0r, inv0), (g0, jnp.zeros_like(g0)))
            ui = df32.mul(x0i, inv0)
            alr = df32.neg(df32.mul(ur, norm))           # alpha
            ali = df32.neg(df32.mul(ui, norm))
            vr = df32.sub(XR, (alr[0] * onehot, alr[1] * onehot))
            vi = df32.sub(XI, (ali[0] * onehot, ali[1] * onehot))
            vtv = df32.reduce_last(
                df32.add(df32.mul(vr, vr), df32.mul(vi, vi)), szl)
            guard = (vtv[0] == 0).astype(f32)
            beta = df32.mul_f32(df32.recip((vtv[0] + guard, vtv[1])), 2.0)
            vrp = df32.presplit(vr)
            vip = df32.presplit(vi)

            # B <- B - beta v (v^H B): s_c reduces over lanes (A-rows)
            BR = (Brh[:, cs, ls], Brl[:, cs, ls])        # (T, szc, szl)
            BI = (Bih[:, cs, ls], Bil[:, cs, ls])
            s_re = df32.reduce_last(df32.add(
                df32.mul_ps(BR, vrp), df32.mul_ps(BI, vip)), szl)
            s_im = df32.reduce_last(df32.sub(
                df32.mul_ps(BI, vrp), df32.mul_ps(BR, vip)), szl)
            bsr = df32.mul(s_re, beta)                   # (T, szc, 1)
            bsi = df32.mul(s_im, beta)
            newR = df32.sub(BR, df32.sub(df32.mul_ps(bsr, vrp),
                                         df32.mul_ps(bsi, vip)))
            newI = df32.sub(BI, df32.add(df32.mul_ps(bsi, vrp),
                                         df32.mul_ps(bsr, vip)))
            Brh[:, cs, ls], Brl[:, cs, ls] = newR
            Bih[:, cs, ls], Bil[:, cs, ls] = newI

            # M <- M - beta v (v^H M): v transposed into sublanes
            off = a8 - c0
            vcr = (jnp.swapaxes(vr[0], -1, -2)[:, off:, :],
                   jnp.swapaxes(vr[1], -1, -2)[:, off:, :])  # (T, szc, 1)
            vci = (jnp.swapaxes(vi[0], -1, -2)[:, off:, :],
                   jnp.swapaxes(vi[1], -1, -2)[:, off:, :])
            vcrp = df32.presplit(vcr)
            vcip = df32.presplit(vci)
            ms = pl.ds(a8, szc)
            MR = (Mrh[:, ms, :], Mrl[:, ms, :])          # (T, szc, n)
            MI = (Mih[:, ms, :], Mil[:, ms, :])
            t_re = df32.reduce_axis2(df32.add(
                df32.mul_ps(MR, vcrp), df32.mul_ps(MI, vcip)), szc)
            t_im = df32.reduce_axis2(df32.sub(
                df32.mul_ps(MI, vcrp), df32.mul_ps(MR, vcip)), szc)
            bvr = df32.mul(vcr, beta)                    # (T, szc, 1)
            bvi = df32.mul(vci, beta)
            bvrp = df32.presplit(bvr)
            bvip = df32.presplit(bvi)
            newMR = df32.sub(MR, df32.sub(df32.mul_ps(t_re, bvrp),
                                          df32.mul_ps(t_im, bvip)))
            newMI = df32.sub(MI, df32.add(df32.mul_ps(t_im, bvrp),
                                          df32.mul_ps(t_re, bvip)))
            Mrh[:, ms, :], Mrl[:, ms, :] = newMR
            Mih[:, ms, :], Mil[:, ms, :] = newMI

            # record alpha_j (lane-indexed vectors)
            accr = df32.add((arh[:, :, ls], arl[:, :, ls]),
                            (alr[0] * onehot, alr[1] * onehot))
            acci = df32.add((aih[:, :, ls], ail[:, :, ls]),
                            (ali[0] * onehot, ali[1] * onehot))
            arh[:, :, ls], arl[:, :, ls] = accr
            aih[:, :, ls], ail[:, :, ls] = acci
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), qr_step, ())

    # ---- complex back-substitution, in place in M -----------------------
    for a8 in reversed(range(0, n, b8)):
        c0 = (a8 // CHUNK) * CHUNK
        szl = n - c0
        cw = min(b8, n - a8)
        top = a8 + cw
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        ls = pl.ds(c0, szl)

        def solve_step(jj, _, a8=a8, cw=cw, top=top, lane=lane, ls=ls):
            j = jnp.int32(a8 + cw - 1) - jj              # descend in chunk
            onehot = lane == j
            ajr = df32.reduce_last(
                df32.mask((arh[:, :, ls], arl[:, :, ls]), onehot), szl)
            aji = df32.reduce_last(
                df32.mask((aih[:, :, ls], ail[:, :, ls]), onehot), szl)
            a2 = df32.add(df32.mul(ajr, ajr), df32.mul(aji, aji))
            ia2 = df32.recip(a2)
            ivr = df32.mul(ajr, ia2)                     # 1/alpha
            ivi = df32.neg(df32.mul(aji, ia2))
            MRr = (Mrh[:, pl.ds(j, 1), :], Mrl[:, pl.ds(j, 1), :])
            MIr = (Mih[:, pl.ds(j, 1), :], Mil[:, pl.ds(j, 1), :])
            x_re = df32.sub(df32.mul(MRr, ivr), df32.mul(MIr, ivi))
            x_im = df32.add(df32.mul(MRr, ivi), df32.mul(MIr, ivr))
            Mrh[:, pl.ds(j, 1), :], Mrl[:, pl.ds(j, 1), :] = x_re
            Mih[:, pl.ds(j, 1), :], Mil[:, pl.ds(j, 1), :] = x_im

            # R's column j = B's sublane-j row (lanes = A-rows), strictly
            # above the diagonal; transpose the value into sublanes
            lt = lane_full < j
            RcR = df32.mask((Brh[:, pl.ds(j, 1), :],
                             Brl[:, pl.ds(j, 1), :]), lt)
            RcI = df32.mask((Bih[:, pl.ds(j, 1), :],
                             Bil[:, pl.ds(j, 1), :]), lt)
            Rcr = (jnp.swapaxes(RcR[0], -1, -2)[:, :top, :],
                   jnp.swapaxes(RcR[1], -1, -2)[:, :top, :])  # (T, top, 1)
            Rci = (jnp.swapaxes(RcI[0], -1, -2)[:, :top, :],
                   jnp.swapaxes(RcI[1], -1, -2)[:, :top, :])
            RrP = df32.presplit(Rcr)
            RiP = df32.presplit(Rci)
            ts = pl.ds(0, top)
            MtR = (Mrh[:, ts, :], Mrl[:, ts, :])         # (T, top, n)
            MtI = (Mih[:, ts, :], Mil[:, ts, :])
            newR = df32.sub(MtR, df32.sub(df32.mul_ps(x_re, RrP),
                                          df32.mul_ps(x_im, RiP)))
            newI = df32.sub(MtI, df32.add(df32.mul_ps(x_im, RrP),
                                          df32.mul_ps(x_re, RiP)))
            Mrh[:, ts, :], Mrl[:, ts, :] = newR
            Mih[:, ts, :], Mil[:, ts, :] = newI
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), solve_step, ())

    outr_ref[...] = Mrh[...] + Mrl[...]
    outi_ref[...] = Mih[...] + Mil[...]


def _call_batched(planesT, r1, *, interpret: bool, rhs_planes=None):
    Bt, n, _ = planesT[0].shape
    has_rhs = rhs_planes is not None
    T = 1
    for t in range(min(_max_tile(n, 16 if has_rhs else 12), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    vec = functools.partial(pl.BlockSpec, (T, 1, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Bt, n, n), jnp.float32)
    scratch = ([pltpu.VMEM((T, n, n), jnp.float32) for _ in range(8)]
               + [pltpu.VMEM((T, 1, n), jnp.float32) for _ in range(4)])
    ins = (list(planesT) + list(rhs_planes)) if has_rhs \
        else list(planesT) + [r1]
    in_specs = [mat()] * 8 if has_rhs else [mat()] * 4 + [vec()]
    with jax.enable_x64(False):
        outr, outi = pl.pallas_call(
            functools.partial(_kernel, n=n, has_rhs=has_rhs),
            grid=(Bt // T,),
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
        n = inner_rh.shape[-1]
        planesT = tuple(jnp.swapaxes(p, -1, -2) for p in
                        (inner_rh, inner_rl, inner_ih, inner_il))
        outr, outi = _call_batched(planesT, r1[:, None, :],
                                   interpret=interpret)
        return jnp.stack([outr, outi], axis=1)

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


def solve_inner_complex_big(inner_rh, inner_rl, inner_ih, inner_il, r1, *,
                            interpret: bool = False):
    """mid = inner^{-1} diag(r1) for a complex inner matrix given as four
    (..., n, n) f32 planes; r1 (..., n) real f32. Returns (..., 2, n, n)
    pair matrices. Column-lane layout: any n % 8 == 0 (VMEM scales with
    the batch tile) — use pallas_cgreen_lanes below its MAX_N."""
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
        planesT = tuple(jnp.swapaxes(p, -1, -2) for p in
                        (inner_rh, inner_rl, inner_ih, inner_il))
        rhs = (rhs_rh, rhs_rl, rhs_ih, rhs_il)   # row-major, like M
        outr, outi = _call_batched(planesT, None, interpret=interpret,
                                   rhs_planes=rhs)
        return jnp.stack([outr, outi], axis=1)

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


def solve_inner_complex_big_rhs(inner_planes, rhs_planes, *,
                                interpret: bool = False):
    """X = inner^{-1} RHS for complex df32 inner and dense RHS, four
    (..., n, n) f32 planes each — the large-n twin of
    pallas_cgreen_lanes.solve_inner_complex_rhs (time-displaced G)."""
    lead = inner_planes[0].shape[:-2]
    n = inner_planes[0].shape[-1]
    flat = [p.reshape(-1, n, n) for p in (*inner_planes, *rhs_planes)]
    out = _make_solve_rhs(interpret)(*flat)
    return out.reshape(*lead, 2, n, n)
