"""Column-lane REAL f32 Householder QR for large matrices.

Real twin of pallas_cqr: the lane-batched real QR (pallas_qr_lanes)
keeps its whole problem in VMEM and stops at n = 128; above that (SDW
embedded chains at L >= 8 run dim 512, Hubbard L = 12 gives N = 144)
this kernel runs the same factorization in the column-lane layout of
pallas_green — batch elements tiled in the grid, A-columns in sublanes,
A-rows in lanes — so VMEM scales with the tile size instead of
n^2 * 128. Primary consumer: udv.inv_refined's f32 factor for the
mixed-precision refined green solve at large real dims.
(Reference parity: the UdV stabilization QR, SURVEY.md §3 "UdV
decomposition" / expected `src/detmodelgc.h`.)

Layout and loop structure are pallas_cqr's with the imaginary plane
dropped:

  B[t, c, r] = A[r, c]   (working copy of A^T)
  P[t, k, i] = Q[i, k]   (P = Q^T accumulator; both B and P absorb each
                          reflector by the same left-application)
  Q = P^T,  R = upper(B^T)

Householder per step j: sigma = ||x||; alpha = -sign(x_j) sigma;
v = x - alpha e_j; beta = 2 / v^T v; R_jj = alpha written exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 16
VMEM_BUDGET = 8 * 1024 * 1024  # ~2 scratch + 4 io (T, n, n) f32 buffers
CHUNK = 128    # lane-slice alignment (A-rows live in lanes)
SUBCHUNK = 8   # sublane granularity (A-columns)


def _max_tile(n: int) -> int:
    return max(1, min(MAX_TILE, VMEM_BUDGET // (2 * n * n * 4)))


def _kernel(BT_in, Q_out, R_out, B, P, *, n: int):
    f32 = Q_out.dtype
    B[...] = BT_in[...]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    P[...] = jnp.broadcast_to(eye, P.shape)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

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
            onehot = (lane == j).astype(f32)             # (1, 1, szl)
            geq = lane >= j
            x = jnp.where(geq, B[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            x0 = jnp.sum(x * onehot, axis=-1, keepdims=True)
            sgn = jnp.where(x0 < 0, -1.0, 1.0).astype(f32)
            alpha = -sgn * norm                          # R_jj
            v = x - alpha * onehot
            vtv = jnp.sum(v * v, axis=-1, keepdims=True)
            guard = (vtv == 0).astype(f32)
            beta = 2.0 / (vtv + guard)                   # (T, 1, 1)

            # B <- B - beta v (v^T B): s_c reduces over lanes (A-rows)
            Bb = B[:, cs, ls]                            # (T, szc, szl)
            s = jnp.sum(v * Bb, axis=-1, keepdims=True)
            B[:, cs, ls] = Bb - (beta * s) * v
            # record R_jj = alpha exactly (sublane j, lane j)
            is_j = lane_full == j
            B[:, pl.ds(j, 1), :] = jnp.where(
                is_j, alpha, B[:, pl.ds(j, 1), :])

            # P <- P - beta v (v^T P): v indexed by A-rows -> sublanes
            off = a8 - c0
            vc = jnp.swapaxes(v, -1, -2)[:, off:, :]     # (T, szc, 1)
            ms = pl.ds(a8, szc)
            Pb = P[:, ms, :]                             # (T, szc, n)
            t = jnp.sum(vc * Pb, axis=-2, keepdims=True)
            P[:, ms, :] = Pb - vc * (beta * t)
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), qr_step, ())

    Q_out[...] = jnp.swapaxes(P[...], -1, -2)
    upper = rows2 <= cols2
    R_out[...] = jnp.where(upper, jnp.swapaxes(B[...], -1, -2), 0.0)


def _call_batched(BT, *, interpret: bool):
    Bt, n, _ = BT.shape
    T = 1
    for t in range(min(_max_tile(n), Bt), 0, -1):
        if Bt % t == 0:
            T = t
            break
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Bt, n, n), jnp.float32)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(Bt // T,),
            out_shape=(shp, shp),
            in_specs=[mat()],
            out_specs=(mat(), mat()),
            scratch_shapes=[pltpu.VMEM((T, n, n), jnp.float32)] * 2,
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


def qr_big(A, *, interpret: bool = False):
    """Batched real f32 QR: (..., n, n) -> (Q, R), column-lane layout,
    any n % 8 == 0 (use pallas_qr_lanes below its MAX_N — the lane
    layout wins when the whole problem fits VMEM)."""
    lead = A.shape[:-2]
    n = A.shape[-1]
    Q, R = _make_qr(interpret)(A.reshape(-1, n, n))
    return Q.reshape(*lead, n, n), R.reshape(*lead, n, n)
