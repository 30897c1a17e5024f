"""Column-lane COMPLEX f32 upper-triangular inverse (batched).

Support kernel for the mixed-precision "refined" stabilization solve
(linalg/cudv.cinv_refined): the green inner matrix is factored ONCE in
plain f32 by the complex QR kernels (pallas_cqr / pallas_cqr_lanes) and
this kernel inverts the resulting R, so that

    Z0 = R^{-1} Q^H,     Z_{k+1} = Z_k + R^{-1} Q^H (I - A Z_k)

turns every iterative-refinement step into two MXU matmuls (the residual
I - A Z rides the Ozaki bf16-limb f64 products). Replaces ~15-20x more
expensive df32 VPU arithmetic in the QR+backsub of pallas_cgreen with
one f32 QR + one f32 triangular inversion + MXU work.
(Reference parity: the stabilized Green inner solve, SURVEY.md §3 "DQMC
core" / expected `src/detmodelgc.h` greenFromUdV.)

Layout = pallas_cgreen's back-substitution half, minus df32:

  B[t, c, r] = R[r, c]  (transposed planes: R's column j is B's
                         sublane-j row, contiguous in lanes)
  X (the output block) doubles as the in-place RHS panel, seeded with
  the identity; per descending column j:

      X[j, :] *= 1/R_jj
      X[0:j, :] -= R[0:j, j] X[j, :]

The result X = R^{-1} is exactly upper triangular (rows keep their
leading zeros: every update to X[i, k] with k < i multiplies an exact
zero). Lane ranges are 128-chunk-restricted like the QR kernels: row j's
scale and the rank-1 update only touch lanes >= chunk(j), which is where
X's support lives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 16
VMEM_BUDGET = 8 * 1024 * 1024  # 4 resident (T, n, n) f32 blocks
CHUNK = 128
SUBCHUNK = 8


def _max_tile(n: int) -> int:
    return max(1, min(MAX_TILE, VMEM_BUDGET // (4 * n * n * 4)))


def _kernel(BTr_in, BTi_in, Xr_out, Xi_out, *, n: int):
    f32 = Xr_out.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    Xr_out[...] = jnp.broadcast_to(eye, Xr_out.shape)
    Xi_out[...] = jnp.zeros_like(Xi_out)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    b8 = min(SUBCHUNK, n)
    for a8 in reversed(range(0, n, b8)):
        cw = min(b8, n - a8)
        top = a8 + cw
        c0 = (a8 // CHUNK) * CHUNK
        szl = n - c0
        ls = pl.ds(c0, szl)

        def step(jj, _, a8=a8, cw=cw, top=top, ls=ls, c0=c0):
            j = jnp.int32(a8 + cw - 1) - jj          # descend in chunk
            onehot = lane_full == j
            Brow_r = BTr_in[:, pl.ds(j, 1), :]       # (T, 1, n)
            Brow_i = BTi_in[:, pl.ds(j, 1), :]
            ar = jnp.sum(jnp.where(onehot, Brow_r, 0.0), -1, keepdims=True)
            ai = jnp.sum(jnp.where(onehot, Brow_i, 0.0), -1, keepdims=True)
            a2 = ar * ar + ai * ai
            g = (a2 == 0).astype(f32)                # guard exact zeros
            ia2 = 1.0 / (a2 + g)
            ivr = ar * ia2                           # 1/alpha
            ivi = -ai * ia2
            # Dynamic-sublane loads/stores must span the FULL lane width
            # (Mosaic rejects a dynamic row index combined with a lane
            # offset: "dynamic load with unaligned indices"); restrict to
            # the chunk by slicing the register value instead.
            Mjr = Xr_out[:, pl.ds(j, 1), :]
            Mji = Xi_out[:, pl.ds(j, 1), :]
            xjr = Mjr * ivr - Mji * ivi
            xji = Mjr * ivi + Mji * ivr
            Xr_out[:, pl.ds(j, 1), :] = xjr
            Xi_out[:, pl.ds(j, 1), :] = xji
            # R[0:j, j]: B's sublane-j row, lanes < j, into sublanes
            lt = lane_full < j
            Rcr = jnp.swapaxes(
                jnp.where(lt, Brow_r, 0.0), -1, -2)[:, :top, :]
            Rci = jnp.swapaxes(
                jnp.where(lt, Brow_i, 0.0), -1, -2)[:, :top, :]
            ts = pl.ds(0, top)
            # full-width update: xj's lanes < c0 are exact zeros (row j
            # of the upper-triangular inverse has support on lanes >= j)
            # and Mosaic rejects broadcasts of offset-lane vectors.
            Xr_out[:, ts, :] = Xr_out[:, ts, :] - (Rcr * xjr - Rci * xji)
            Xi_out[:, ts, :] = Xi_out[:, ts, :] - (Rcr * xji + Rci * xjr)
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), step, ())


def _call_batched(BTr, BTi, *, interpret: bool):
    Bt, n, _ = BTr.shape
    T = 1
    for t in range(min(_max_tile(n), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Bt, n, n), jnp.float32)
    kern = _kernel_blocked if _use_blocked() else _kernel
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(kern, n=n),
            grid=(Bt // T,),
            out_shape=(shp, shp),
            in_specs=[mat(), mat()],
            out_specs=(mat(), mat()),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(BTr, BTi)
    return outs


BLOCK = 32
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b_, ca: int, cb: int):
    return jax.lax.dot_general(
        a, b_, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI)


def _kernel_blocked(BTr_in, BTi_in, Xr_out, Xi_out, *, n: int):
    """Blocked back-substitution: the per-column rank-1 updates stay
    inside a BLOCK-column panel (VPU, O(b^2 n) per panel); each panel's
    effect on all rows above lands as ONE complex MXU product
    M[0:J, :] -= R[0:J, Jcols] X[Jrows, :] — the triangular-solve
    analogue of the compact-WY QR split. O(b n^2) VPU + O(n^3/2) MXU."""
    f32 = Xr_out.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    Xr_out[...] = jnp.broadcast_to(eye, Xr_out.shape)
    Xi_out[...] = jnp.zeros_like(Xi_out)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    b = BLOCK

    for j0 in reversed(range(0, n, b)):
        jb = min(b, n - j0)
        c0 = (j0 // CHUNK) * CHUNK
        szl = n - c0
        ls = pl.ds(c0, szl)
        bs = pl.ds(j0, jb)                       # panel rows of X / M

        def step(kk, _, j0=j0, jb=jb, ls=ls, bs=bs, c0=c0):
            j = jnp.int32(j0 + jb - 1) - kk      # descend in panel
            onehot = lane_full == j
            Brow_r = BTr_in[:, pl.ds(j, 1), :]   # (T, 1, n)
            Brow_i = BTi_in[:, pl.ds(j, 1), :]
            ar = jnp.sum(jnp.where(onehot, Brow_r, 0.0), -1, keepdims=True)
            ai = jnp.sum(jnp.where(onehot, Brow_i, 0.0), -1, keepdims=True)
            a2 = ar * ar + ai * ai
            g = (a2 == 0).astype(f32)
            ia2 = 1.0 / (a2 + g)
            ivr = ar * ia2
            ivi = -ai * ia2
            # full-lane-width dynamic row access (see _kernel)
            Mjr = Xr_out[:, pl.ds(j, 1), :]
            Mji = Xi_out[:, pl.ds(j, 1), :]
            xjr = Mjr * ivr - Mji * ivi
            xji = Mjr * ivi + Mji * ivr
            Xr_out[:, pl.ds(j, 1), :] = xjr
            Xi_out[:, pl.ds(j, 1), :] = xji
            # within-panel rank-1: rows [j0, j) only
            j0i = jnp.int32(j0)
            in_panel_lt = (lane_full >= j0i) & (lane_full < j)
            Rcr = jnp.swapaxes(jnp.where(in_panel_lt, Brow_r, 0.0),
                               -1, -2)[:, j0:j0 + jb, :]     # (T, jb, 1)
            Rci = jnp.swapaxes(jnp.where(in_panel_lt, Brow_i, 0.0),
                               -1, -2)[:, j0:j0 + jb, :]
            Xr_out[:, bs, :] = Xr_out[:, bs, :] - (Rcr * xjr - Rci * xji)
            Xi_out[:, bs, :] = Xi_out[:, bs, :] - (Rcr * xji + Rci * xjr)
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(jb), step, ())

        # panel's effect on ALL rows above: one complex MXU product.
        # R[0:j0, Jcols] is B's panel sublanes restricted to lanes < j0
        # (a (jb, j0) slab); X[Jrows, :] has support on lanes >= c0.
        if j0 > 0:
            ts = pl.ds(0, j0)
            for t in range(Xr_out.shape[0]):
                Rbr = BTr_in[t, bs, :j0]         # (jb, j0) = R[0:j0, J]^T
                Rbi = BTi_in[t, bs, :j0]
                Xjr = Xr_out[t, bs, ls]          # (jb, szl)
                Xji = Xi_out[t, bs, ls]
                # U = R[0:j0, J] . X_J : contract panel dim (dim0 x dim0)
                U_r = _dot(Rbr, Xjr, 0, 0) - _dot(Rbi, Xji, 0, 0)
                U_i = _dot(Rbr, Xji, 0, 0) + _dot(Rbi, Xjr, 0, 0)
                Xr_out[t, ts, ls] = Xr_out[t, ts, ls] - U_r
                Xi_out[t, ts, ls] = Xi_out[t, ts, ls] - U_i


def _use_blocked() -> bool:
    # blocked (MXU panel updates) is the default — measured faster at
    # SDW L=8 with identical green_dev; DETQMC_TPU_TRINV=col opts back
    # into the pure column back-substitution kernel.
    import os

    return os.environ.get("DETQMC_TPU_TRINV", "") != "col"


@functools.lru_cache(maxsize=None)
def _make_ctrinv(interpret: bool):
    @jax.custom_batching.custom_vmap
    def ctrinv(R):                                  # (Bt, 2, n, n) f32
        BTr = jnp.swapaxes(R[:, 0], -1, -2)
        BTi = jnp.swapaxes(R[:, 1], -1, -2)
        Xr, Xi = _call_batched(BTr, BTi, interpret=interpret)
        return jnp.stack([Xr, Xi], axis=1)

    @ctrinv.def_vmap
    def _rule(axis_size, in_batched, R):
        if not in_batched[0]:
            R = jnp.broadcast_to(R[None], (axis_size, *R.shape))
        lead = R.shape[:-3]
        n = R.shape[-1]
        X = ctrinv(R.reshape(-1, 2, n, n))
        return X.reshape(*lead, 2, n, n), True

    return ctrinv


def ctrinv_big(R, *, interpret: bool = False):
    """X = R^{-1} for batched upper-triangular pair matrices
    (..., 2, n, n) f32, any n % 8 == 0. Column-lane layout: VMEM scales
    with the batch tile (4 resident (T, n, n) blocks)."""
    lead = R.shape[:-3]
    n = R.shape[-1]
    X = _make_ctrinv(interpret)(R.reshape(-1, 2, n, n))
    return X.reshape(*lead, 2, n, n)
