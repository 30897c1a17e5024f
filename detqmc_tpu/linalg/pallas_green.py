"""Pallas TPU kernel: stabilized Green's function inner stage in df32.

Computes mid = V'^{-1} d'^{-1} U'^H D1 from the pre-assembled inner
stabilization matrix (see linalg/udv.green_from_two_udv):

    inner = U' d' V'  (QR),   G = (U2 D2) @ mid @ U1^H

The inner matrix's condition grows like e^{beta W}; plain f32 QR destroys
it, and XLA's f64-emulated QR costs ~90 ms *latency* per call (deep
sequential scalar chains), dominating the entire sweep. This kernel runs
Householder QR + the U'^H application + the triangular back-substitution
in double-single (df32, ~2^-48) arithmetic inside one Pallas program:
VPU instructions instead of XLA dispatches, walker-tiled like the
Metropolis kernel. Latency: ~1-2 ms per call instead of ~120 ms.

Algorithm (per batch element; A := inner, n x n):
  row-major trick: store B = A^T so columns of A are contiguous rows.
  For j = 0..n-1:
    x   = column j of A (= row j of B), masked to lanes >= j
    alpha = -sign(x_j) ||x||;  v = x - alpha e_j;  beta = 2 / v^T v
    A <- A - beta v (v^T A)      [B <- B - beta (B v) v^T; BT kept in sync]
    M <- M - beta v (v^T M)      [accumulates U'^H D1; M starts as diag(r1)]
    alpha_j recorded; R = upper(A) = d' V' with R_jj = alpha_j
  Back-substitution (V' unit-scaled by alpha): for j = n-1..0:
    X[j,:] = (M[j,:] - sum_{k>j} R_jk X[k,:]) / alpha_j

Mosaic survival notes: branchless arithmetic gating only, int32 loop
bounds, one-hot mask reductions for scalar picks, refs for all mutable
state (Mosaic cannot dynamically index values), explicit walker grid via
custom_vmap (see pallas_update.py for the full list of reasons).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detqmc_tpu.linalg import df32

MAX_TILE = 16  # batch elements per grid step (VMEM ~ 10*T*n^2*4B)
VMEM_BUDGET = 8 * 1024 * 1024  # scratch budget; kernel uses ~10*T*n^2*4B


def _max_tile(n: int) -> int:
    """Largest walker tile whose ~10 (T, n, n) f32 scratch buffers fit the
    VMEM budget (SDW dims reach 512 where even T=1 needs ~10 MB)."""
    return max(1, min(MAX_TILE, VMEM_BUDGET // (10 * n * n * 4)))


CHUNK = 128    # lane-slice alignment (Mosaic: "dynamic load with
               # unaligned indices" otherwise); A-rows live in lanes here
SUBCHUNK = 8   # column-chunk width: A-columns are sublanes, where static
               # 8-granular slicing is legal — finer triangular restriction


def _kernel(Bh_in, Bl_in, r1_ref, out_ref,
            Bh, Bl, BTh, BTl, Mh, Ml, Xh, Xl, ah, al,
            *, n: int):
    Bh[...] = Bh_in[...]
    Bl[...] = Bl_in[...]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows_i == cols_i).astype(Bh_in.dtype)         # (1, n, n)
    Mh[...] = eye * r1_ref[...]                          # diag(r1)
    Ml[...] = jnp.zeros_like(Ml)
    Xh[...] = jnp.zeros_like(Xh)
    Xl[...] = jnp.zeros_like(Xl)
    ah[...] = jnp.zeros_like(ah)
    al[...] = jnp.zeros_like(al)

    # Two-level triangular work restriction. In this layout A-columns are
    # SUBLANES (8-granular static slicing is legal) and A-rows are LANES
    # (slices must stay 128-aligned), so the column loop runs in static
    # chunks of SUBCHUNK = 8 columns: the step-j Householder vector has
    # support on A-rows >= j, confining B's update to sublanes/lanes
    # [a8, n) x [c0, n) and M's to sublanes [a8, n) — identical arithmetic
    # to the full-matrix masked form at ~2-3x fewer VPU slots (the skipped
    # regions are exactly what the masks zeroed).
    b8 = min(SUBCHUNK, n)
    for a8 in range(0, n, b8):
        c0 = (a8 // CHUNK) * CHUNK          # lane-aligned row start
        szc = n - a8                        # active columns (sublanes)
        szl = n - c0                        # active rows (lanes)
        cw = min(b8, szc)
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        cs = pl.ds(a8, szc)
        ls = pl.ds(c0, szl)

        def qr_step(jj, _, a8=a8, szc=szc, szl=szl, lane=lane, cs=cs,
                    ls=ls, c0=c0):
            j = jnp.int32(a8) + jj
            onehot = (lane == j).astype(Bh_in.dtype)     # (1, 1, szl)
            geq = lane >= j
            # dynamic sublane load must span full lanes (Mosaic rejects
            # dynamic load + partial lane slice); slice the value instead
            x_full = (Bh[:, pl.ds(j, 1), :], Bl[:, pl.ds(j, 1), :])
            x = (x_full[0][:, :, c0:], x_full[1][:, :, c0:])
            xm = df32.mask(x, geq)
            norm2 = df32.reduce_last(df32.mul(xm, xm), szl)  # (T, 1, 1)
            norm = df32.sqrt(norm2)
            x0 = df32.reduce_last(df32.scale_signed(xm, onehot), szl)
            sgn = 2.0 * (x0[0] >= 0).astype(Bh_in.dtype) - 1.0
            alpha = df32.scale_signed(norm, -sgn)        # (T, 1, 1)
            v = df32.sub(xm, (alpha[0] * onehot, alpha[1] * onehot))
            vtv = df32.reduce_last(df32.mul(v, v), szl)  # (T, 1, 1)
            # guard the (impossible for nonsingular input) zero column
            guard = (vtv[0] == 0).astype(Bh_in.dtype)
            vtv = (vtv[0] + guard, vtv[1])
            beta = df32.mul_f32(df32.recip(vtv), 2.0)    # (T, 1, 1)
            vp = df32.presplit(v)                        # reused below

            B = (Bh[:, cs, ls], Bl[:, cs, ls])           # (T, szc, szl)
            s_col = df32.reduce_last(df32.mul_ps(B, vp), szl)  # (T,szc,1)
            bs = df32.mul(s_col, beta)
            newB = df32.sub(B, df32.mul_ps(bs, vp))
            Bh[:, cs, ls], Bl[:, cs, ls] = newB

            # M rows = A-rows; v has support on rows >= j >= a8, so M's
            # update restricts to sublanes [a8, n) (8-granular) — slice
            # the transposed-v VALUE by the static offset a8 - c0
            off = a8 - c0
            v_col = (jnp.swapaxes(v[0], -1, -2)[:, off:, :],
                     jnp.swapaxes(v[1], -1, -2)[:, off:, :])  # (T, szc, 1)
            vcp = df32.presplit(v_col)
            ms = pl.ds(a8, szc)
            M = (Mh[:, ms, :], Ml[:, ms, :])             # (T, szc, n)
            vtM = df32.reduce_axis2(df32.mul_ps(M, vcp), szc)  # (T, 1, n)
            bv = df32.mul(v_col, beta)
            newM = df32.sub(M, df32.mul_ps(vtM, df32.presplit(bv)))
            Mh[:, ms, :], Ml[:, ms, :] = newM

            # record alpha_j
            acc = df32.add((ah[:, :, ls], al[:, :, ls]),
                           (alpha[0] * onehot, alpha[1] * onehot))
            ah[:, :, ls], al[:, :, ls] = acc
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), qr_step, ())

    # R rows for back-substitution live in B's columns: transpose once
    # (cheaper than keeping a synced BT through the QR loop)
    BTh[...] = jnp.swapaxes(Bh[...], -1, -2)
    BTl[...] = jnp.swapaxes(Bl[...], -1, -2)

    # reverse chunk order: row j's back-substitution reads only X rows > j,
    # so X/R restrict to sublanes [a8, n) (8-granular; the > j mask zeroes
    # the chunk-internal overshoot)
    for a8 in reversed(range(0, n, b8)):
        c0 = (a8 // CHUNK) * CHUNK
        szc = n - a8
        szl = n - c0
        cw = min(b8, szc)
        lane = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, szl), 2)
        ls = pl.ds(c0, szl)

        def solve_step(jj, _, a8=a8, szc=szc, szl=szl, cw=cw, lane=lane,
                       ls=ls, c0=c0):
            j = jnp.int32(a8 + cw - 1) - jj              # descend in chunk
            onehot = lane == j
            gt = lane > j
            Rrow_full = (BTh[:, pl.ds(j, 1), :], BTl[:, pl.ds(j, 1), :])
            Rrow = (Rrow_full[0][:, :, c0:], Rrow_full[1][:, :, c0:])
            Rrow = df32.mask(Rrow, gt)                   # strict upper
            off = a8 - c0
            Rcol = (jnp.swapaxes(Rrow[0], -1, -2)[:, off:, :],
                    jnp.swapaxes(Rrow[1], -1, -2)[:, off:, :])  # (T,szc,1)
            xs = pl.ds(a8, szc)
            X = (Xh[:, xs, :], Xl[:, xs, :])             # (T, szc, n)
            contrib = df32.reduce_axis2(
                df32.mul_ps(X, df32.presplit(Rcol)), szc)  # (T, 1, n)
            Mrow = (Mh[:, pl.ds(j, 1), :], Ml[:, pl.ds(j, 1), :])
            a_j = df32.reduce_last(
                df32.mask((ah[:, :, ls], al[:, :, ls]), onehot), szl)
            xrow = df32.mul(df32.sub(Mrow, contrib), df32.recip(a_j))
            Xh[:, pl.ds(j, 1), :] = xrow[0]
            Xl[:, pl.ds(j, 1), :] = xrow[1]
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), solve_step, ())
    out_ref[...] = Xh[...] + Xl[...]


def _call_batched(innerT_hi, innerT_lo, r1, *, interpret: bool):
    """B = inner^T: (Bt, n, n) batched over walkers*spins; r1: (Bt, 1, n)."""
    Bt, n, _ = innerT_hi.shape
    T = 1
    for t in range(min(_max_tile(n), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    vec = functools.partial(pl.BlockSpec, (T, 1, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    scratch = ([pltpu.VMEM((T, n, n), jnp.float32) for _ in range(8)]
               + [pltpu.VMEM((T, 1, n), jnp.float32) for _ in range(2)])
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(Bt // T,),
            out_shape=jax.ShapeDtypeStruct((Bt, n, n), jnp.float32),
            in_specs=[mat(), mat(), vec()],
            out_specs=mat(),
            scratch_shapes=scratch,
            # SDW dims reach n = 512, where even the T = 1 tile's blocks +
            # scratch exceed the default 16 MB scoped-VMEM budget
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(innerT_hi, innerT_lo, r1)
    return out


@functools.lru_cache(maxsize=None)
def _make_solve_inner(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(inner_hi, inner_lo, r1):
        innerT_hi = jnp.swapaxes(inner_hi, -1, -2)
        innerT_lo = jnp.swapaxes(inner_lo, -1, -2)
        return _call_batched(innerT_hi, innerT_lo, r1[:, None, :],
                             interpret=interpret)

    @solve.def_vmap
    def _rule(axis_size, in_batched, inner_hi, inner_lo, r1):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))
        inner_hi = bcast(inner_hi, in_batched[0])
        inner_lo = bcast(inner_lo, in_batched[1])
        r1 = bcast(r1, in_batched[2])
        lead = inner_hi.shape[:-2]
        n = inner_hi.shape[-1]
        out = solve(inner_hi.reshape(-1, n, n),
                    inner_lo.reshape(-1, n, n),
                    r1.reshape(-1, n))
        return out.reshape(*lead, n, n), True

    return solve


def solve_inner(inner_hi, inner_lo, r1, *, interpret: bool = False):
    """mid = inner^{-1} diag(r1) computed stably: (..., n, n) f32 pairs in,
    f32 out. Relative per-mode accuracy ~2^-48 of the df32 inputs.
    vmap-safe: batch axes flatten into the kernel grid.

    Dispatch: matrices up to pallas_green_lanes.MAX_N go to the
    lane-batched layout (walkers in the 128-lane axis: no lane padding at
    n <= 64, fine-grained triangular work restriction at any n); larger
    ones stay on this module's column-lane kernel, whose VMEM footprint
    scales with the tile rather than with n^2 * 128.
    """
    lead = inner_hi.shape[:-2]
    n = inner_hi.shape[-1]
    if n % 8 == 0:
        from detqmc_tpu.linalg.pallas_green_lanes import (
            MAX_N, solve_inner_lanes)

        if n <= MAX_N:
            out = solve_inner_lanes(
                inner_hi.reshape(-1, n, n), inner_lo.reshape(-1, n, n),
                r1.reshape(-1, n), interpret=interpret)
            return out.reshape(*lead, n, n)
    out = _make_solve_inner(interpret)(
        inner_hi.reshape(-1, n, n), inner_lo.reshape(-1, n, n),
        r1.reshape(-1, n))
    return out.reshape(*lead, n, n)
