"""Lane-batched df32 stabilization kernel: walkers ride the 128-lane axis.

Same contract as pallas_green.solve_inner — mid = inner^{-1} diag(r1) in
double-single (df32) Householder QR + back-substitution — but with the
data layout turned inside out. pallas_green._kernel tiles T walkers in the
LEADING axis and puts the matrix columns in lanes; for the Hubbard
headline size (n = 64) that pads half of every 128-wide vector register
with dead lanes, and its CHUNK=128 triangular work restriction never
engages below n = 128 at all. Here each grid step processes 128 problems
whose batch index IS the lane index:

    arrays are (n_rows, n_cols, 128): rows = plain leading axis (any-
    granularity slicing), cols = sublanes, lanes = independent walkers.

Wins over the column-lane layout for n <= 64:
- zero lane padding at any n (2x at n = 64);
- the Householder trailing updates and the back-substitution restrict to
  the active triangle at 8-column granularity (static chunk loop; ~2-3x
  fewer VPU slots at n = 64, where the old kernel processes the full
  square every step);
- per-lane scalars (norms, alphas, betas) need no one-hot lane masks —
  reductions run over the row axis, and masks are cheap row-iota selects
  (df32.mask: exact, no TwoProd) instead of mul_f32 chains.

VMEM bounds the lane batch: ~4 resident (n, n, 128) f32 buffers plus one
QR step's live df32 temporaries, under a raised 100 MB scoped cap —
n <= MAX_N (= 128, measured to compile and run); larger matrices (e.g.
L >= 8 SDW embedded dims) stay on pallas_green, whose VMEM footprint
scales with its walker tile instead of n^2 * 128. The dispatch lives in
pallas_green.solve_inner.

Algorithm and conventions (alpha sign, r1 seeding of M, strict-upper
back-substitution) match pallas_green._kernel exactly; the back-
substitution is column-oriented and in-place in M (X[j] = M[j]/alpha_j,
then M[0:j] -= R[0:j, j] X[j]) so M doubles as the output buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detqmc_tpu.linalg import df32

WL = 128     # lane batch: walkers per grid step
CB = 8       # column chunk (sublane granularity for triangular restriction)
# VMEM bound: ~4 resident (n, n, 128) f32 buffers + the live df32
# temporaries of one QR step; n = 128 compiles and runs under the raised
# 100 MB cap (measured; n = 256 would need ~4x that — stays on the
# column-lane kernel)
MAX_N = 128


def _kernel(*refs, n: int, has_rhs: bool):
    """QR + solve; M seeded from diag(r1), or from a dense df32 RHS
    DMA'd from HBM when has_rhs (the time-displaced G path)."""
    it = iter(refs)
    Ah_hbm, Al_hbm = next(it), next(it)
    if has_rhs:
        Rh_hbm, Rl_hbm = next(it), next(it)
        r1_ref = None
    else:
        r1_ref = next(it)
    out_ref = next(it)
    Bh, Bl, Ml, ah, al = (next(it) for _ in range(5))
    sems = [next(it) for _ in range(4 if has_rhs else 2)]
    f32 = out_ref.dtype
    # The (n, n, WL) inputs stay in HBM (memory_space=ANY) and are
    # DMA'd straight into the QR scratch: routing them through VMEM input
    # blocks would double-buffer ~4 MB past the 16 MB scoped-VMEM limit.
    g = pl.program_id(0)
    srcs = [Ah_hbm, Al_hbm]
    dsts = [Bh, Bl]
    if has_rhs:
        # out_ref doubles as Mh; RHS planes land directly in M
        srcs += [Rh_hbm, Rl_hbm]
        dsts += [out_ref, Ml]
    dmas = [pltpu.make_async_copy(src.at[pl.ds(g * n, n)], dst, sem)
            for src, dst, sem in zip(srcs, dsts, sems)]
    for d in dmas:
        d.start()
    if not has_rhs:
        # M = diag(r1): out_ref doubles as Mh (it is written fully below)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
        out_ref[...] = (rows2 == cols2).astype(f32) * r1_ref[...]
        Ml[...] = jnp.zeros_like(Ml)
    ah[...] = jnp.zeros_like(ah)
    al[...] = jnp.zeros_like(al)
    for d in dmas:
        d.wait()
    Mh = out_ref

    # ---- Householder QR, trailing updates restricted to rows/cols >= a ----
    for a in range(0, n, CB):
        sz = n - a
        rows = a + jax.lax.broadcasted_iota(jnp.int32, (sz, 1, 1), 0)
        rs = pl.ds(a, sz)

        def qr_step(jj, _, a=a, sz=sz, rows=rows, rs=rs):
            j = jnp.int32(a) + jj
            geq = rows >= j                               # (sz, 1, 1) bool
            onehot = (rows == j).astype(f32)
            x = (Bh[rs, pl.ds(j, 1), :], Bl[rs, pl.ds(j, 1), :])
            xm = df32.mask(x, geq)                        # (sz, 1, WL)
            norm2 = df32.reduce_axis0(df32.mul(xm, xm), sz)   # (1, 1, WL)
            norm = df32.sqrt(norm2)
            x0 = df32.reduce_axis0(df32.scale_signed(xm, onehot), sz)
            sgn = 2.0 * (x0[0] >= 0).astype(f32) - 1.0
            alpha = df32.scale_signed(norm, -sgn)         # (1, 1, WL)
            v = df32.sub(xm, (alpha[0] * onehot, alpha[1] * onehot))
            vtv = df32.reduce_axis0(df32.mul(v, v), sz)
            guard = (vtv[0] == 0).astype(f32)             # degenerate input
            beta = df32.mul_f32(df32.recip((vtv[0] + guard, vtv[1])), 2.0)
            vp = df32.presplit(v)                         # reused 4x below

            B = (Bh[rs, rs, :], Bl[rs, rs, :])            # (sz, sz, WL)
            s_row = df32.reduce_axis0(df32.mul_ps(B, vp), sz)  # (1,sz,WL)
            bs = df32.mul(s_row, beta)
            newB = df32.sub(B, df32.mul_ps(bs, vp))
            Bh[rs, rs, :], Bl[rs, rs, :] = newB

            M = (Mh[rs, :, :], Ml[rs, :, :])              # (sz, n, WL)
            sM = df32.reduce_axis0(df32.mul_ps(M, vp), sz)  # (1, n, WL)
            newM = df32.sub(M, df32.mul_ps(df32.mul(sM, beta), vp))
            Mh[rs, :, :], Ml[rs, :, :] = newM

            ah[pl.ds(j, 1)], al[pl.ds(j, 1)] = alpha      # record R_jj
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, sz)), qr_step, ())

    # ---- column-oriented back-substitution, in place in M -----------------
    # Processing j = n-1 .. 0: X[j] = M[j] / alpha_j, then subtract
    # R[0:j, j] X[j] from the rows above. Row j of M is final afterwards.
    for c in reversed(range(0, n, CB)):
        top = c + CB
        rows = jax.lax.broadcasted_iota(jnp.int32, (top, 1, 1), 0)

        def solve_step(jj, _, c=c, top=top, rows=rows):
            j = jnp.int32(top - 1) - jj
            a_j = (ah[pl.ds(j, 1)], al[pl.ds(j, 1)])      # (1, 1, WL)
            Mrow = (Mh[pl.ds(j, 1), :, :], Ml[pl.ds(j, 1), :, :])
            xrow = df32.mul(Mrow, df32.recip(a_j))        # (1, n, WL)
            Mh[pl.ds(j, 1), :, :], Ml[pl.ds(j, 1), :, :] = xrow
            lt = rows < j                                 # strict upper
            Rcol = df32.mask(
                (Bh[pl.ds(0, top), pl.ds(j, 1), :],
                 Bl[pl.ds(0, top), pl.ds(j, 1), :]), lt)  # (top, 1, WL)
            Rp = df32.presplit(Rcol)
            Mtop = (Mh[pl.ds(0, top), :, :], Ml[pl.ds(0, top), :, :])
            newM = df32.sub(Mtop, df32.mul_ps(xrow, Rp))
            Mh[pl.ds(0, top), :, :], Ml[pl.ds(0, top), :, :] = newM
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, n - c)),
                          solve_step, ())

    out_ref[...] = Mh[...] + Ml[...]


def _call_lanes(Ah, Al, r1, *, interpret: bool, rhs=None):
    """Ah/Al: (G*n, n, WL); r1: (G*n, 1, WL). Grid over G row-blocks."""
    Gn, n, _ = Ah.shape
    G = Gn // n
    has_rhs = rhs is not None
    mat = functools.partial(pl.BlockSpec, (n, n, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    vec = functools.partial(pl.BlockSpec, (n, 1, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pl.ANY)
    n_dma = 4 if has_rhs else 2
    scratch = ([pltpu.VMEM((n, n, WL), jnp.float32) for _ in range(3)]
               + [pltpu.VMEM((n, 1, WL), jnp.float32) for _ in range(2)]
               + [pltpu.SemaphoreType.DMA] * n_dma)
    ins = [Ah, Al] + (list(rhs) if has_rhs else [r1])
    in_specs = [hbm()] * 4 if has_rhs else [hbm(), hbm(), vec()]
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, n=n, has_rhs=has_rhs),
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32),
            in_specs=in_specs,
            out_specs=mat(),
            scratch_shapes=scratch,
            # the live (n, n, WL) df32 temporaries inside a QR step exceed
            # XLA's default 16 MB scoped-VMEM budget at n = 64; the chip
            # has far more physical VMEM, so raise the cap
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*ins)
    return out


@functools.lru_cache(maxsize=None)
def _make_solve_lanes_rhs(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(inner_hi, inner_lo, rhs_hi, rhs_lo):
        Bt, n, _ = inner_hi.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            z = jnp.zeros((pad, n, n), jnp.float32)
            inner_hi = jnp.concatenate([inner_hi, eye], axis=0)
            inner_lo = jnp.concatenate([inner_lo, z], axis=0)
            rhs_hi = jnp.concatenate([rhs_hi, z], axis=0)
            rhs_lo = jnp.concatenate([rhs_lo, z], axis=0)

        def to_lanes(x):
            x = x.reshape(G, WL, n, n)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, n, WL)

        out = _call_lanes(to_lanes(inner_hi), to_lanes(inner_lo), None,
                          interpret=interpret,
                          rhs=(to_lanes(rhs_hi), to_lanes(rhs_lo)))
        out = jnp.transpose(out.reshape(G, n, n, WL), (0, 3, 1, 2))
        return out.reshape(G * WL, n, n)[:Bt]

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        args = [bcast(x, b) for x, b in zip(args, in_batched)]
        lead = args[0].shape[:-2]
        n = args[0].shape[-1]
        out = solve(*[a.reshape(-1, n, n) for a in args])
        return out.reshape(*lead, n, n), True

    return solve


def solve_inner_lanes_rhs(inner_hi, inner_lo, rhs_hi, rhs_lo, *,
                          interpret: bool = False):
    """X = inner^{-1} RHS for df32 inner and dense df32 RHS (real) —
    the general-RHS twin of solve_inner_lanes, used by the
    time-displaced G path (RHS = d1min V1). Any leading batch shape
    (including none) flattens into the lane groups."""
    lead = inner_hi.shape[:-2]
    n = inner_hi.shape[-1]
    out = _make_solve_lanes_rhs(interpret)(
        inner_hi.reshape(-1, n, n), inner_lo.reshape(-1, n, n),
        rhs_hi.reshape(-1, n, n), rhs_lo.reshape(-1, n, n))
    return out.reshape(*lead, n, n)


@functools.lru_cache(maxsize=None)
def _make_solve_lanes(interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(inner_hi, inner_lo, r1):
        Bt, n, _ = inner_hi.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            inner_hi = jnp.concatenate([inner_hi, eye], axis=0)
            inner_lo = jnp.concatenate(
                [inner_lo, jnp.zeros((pad, n, n), jnp.float32)], axis=0)
            r1 = jnp.concatenate(
                [r1, jnp.ones((pad, n), jnp.float32)], axis=0)

        # (G*WL, n, n) -> (G, n, n, WL) -> (G*n, n, WL): batch into lanes
        def to_lanes(x, w):
            x = x.reshape(G, WL, n, w)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, w, WL)

        Ah = to_lanes(inner_hi, n)
        Al = to_lanes(inner_lo, n)
        r1l = to_lanes(r1[:, :, None], 1)
        out = _call_lanes(Ah, Al, r1l, interpret=interpret)
        out = jnp.transpose(out.reshape(G, n, n, WL), (0, 3, 1, 2))
        return out.reshape(G * WL, n, n)[:Bt]

    @solve.def_vmap
    def _rule(axis_size, in_batched, inner_hi, inner_lo, r1):
        # flatten vmap axes into the kernel's walker batch (the pallas
        # grid/lane layout absorbs any batch size)
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


def solve_inner_lanes(inner_hi, inner_lo, r1, *, interpret: bool = False):
    """mid = inner^{-1} diag(r1), df32-stable; (Bt, n, n) f32 pairs in,
    (Bt, n, n) f32 out. Batch is padded to a multiple of 128 with identity
    problems (harmless, sliced off). vmap-safe: batch axes flatten into
    the walker batch."""
    return _make_solve_lanes(interpret)(inner_hi, inner_lo, r1)
