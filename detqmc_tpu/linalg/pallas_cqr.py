"""Column-lane COMPLEX f32 Householder QR for large matrices.

The lane-batched complex QR (pallas_cqr_lanes) keeps 6 resident
(n, n, 128) f32 buffers and stops at n = 128; the SDW native-complex
chain at science scale needs complex dims up to 512 (L = 8..14 full
opdim-3, reference: DetSDW at `src/detsdwopdim.cpp` sizes, SURVEY.md §1).
This kernel runs the same complex Householder factorization in the
column-lane layout of pallas_green: batch elements tiled in the grid,
A-columns in sublanes, A-rows in lanes, so VMEM scales with the tile
size instead of n^2 * 128.

Layout and triangular work restriction follow pallas_green._kernel:

  B[t, c, r] = A[r, c]  (working copy of A^T: column j of A is the
                         sublane-j row of B, contiguous in lanes)
  P[t, k, i] = conj(Q[i, k])   (P = Q^H accumulator)

Both B and P absorb each reflector by the SAME left-application
X <- X - beta v (v^H X): for B that is the textbook QR step; for P it is
the transposed form of Q <- Q - beta (Q v) v^H, since
(Q - beta (Qv) v^H)^H = Q^H - beta v (v^H Q^H). Accumulating Q^H instead
of Q keeps every update row-major in this layout (no in-loop
transposes); the final outputs transpose once:

  Q = P^H  (Qr = Pr^T, Qi = -Pi^T),   R = upper(B^T).

Complex Householder per step j (pallas_cqr_lanes convention):
  sigma = ||x||;  u = x_j/|x_j| (1 at zero);  alpha = -u sigma
  v = x - alpha e_j;  beta = 2 / v^H v  (real)
  R_jj = alpha written exactly (the update only zeroes it approximately).

Plain f32 arithmetic: the chain QRs one well-conditioned interval block
per stabilization (column norms O(1)); all the ill-conditioning lives in
the d/V composition (log-domain, f64) and the green inner solve (df32,
pallas_cgreen) — same precision split as the real path (linalg/udv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 16
VMEM_BUDGET = 8 * 1024 * 1024  # ~4 scratch (T, n, n) f32 buffers
CHUNK = 128    # lane-slice alignment (A-rows live in lanes)
SUBCHUNK = 8   # sublane granularity (A-columns)


def _max_tile(n: int) -> int:
    return max(1, min(MAX_TILE, VMEM_BUDGET // (4 * n * n * 4)))


def _kernel(BTr_in, BTi_in, Qr_out, Qi_out, Rr_out, Ri_out,
            Br, Bi, Pr, Pi, *, n: int):
    f32 = Qr_out.dtype
    Br[...] = BTr_in[...]
    Bi[...] = BTi_in[...]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    Pr[...] = jnp.broadcast_to(eye, Pr.shape)
    Pi[...] = jnp.zeros_like(Pi)
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
            # dynamic sublane load spans full lanes; slice the value
            xr = jnp.where(geq, Br[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            xi = jnp.where(geq, Bi[:, pl.ds(j, 1), :][:, :, c0:], 0.0)
            norm2 = jnp.sum(xr * xr + xi * xi, axis=-1, keepdims=True)
            norm = jnp.sqrt(norm2)                       # (T, 1, 1)
            x0r = jnp.sum(xr * onehot, axis=-1, keepdims=True)
            x0i = jnp.sum(xi * onehot, axis=-1, keepdims=True)
            a0 = jnp.sqrt(x0r * x0r + x0i * x0i)
            g0 = (a0 == 0).astype(f32)
            inv0 = 1.0 / (a0 + g0)
            ur = x0r * inv0 + g0                         # phase u
            ui = x0i * inv0
            ar_ = -ur * norm                             # alpha = R_jj
            ai_ = -ui * norm
            vr = xr - ar_ * onehot
            vi = xi - ai_ * onehot
            vtv = jnp.sum(vr * vr + vi * vi, axis=-1, keepdims=True)
            guard = (vtv == 0).astype(f32)
            beta = 2.0 / (vtv + guard)                   # (T, 1, 1)

            # B <- B - beta v (v^H B): per A-column c (sublane),
            # s_c = sum_r conj(v_r) B[c, r] reduces over lanes
            Bbr = Br[:, cs, ls]                          # (T, szc, szl)
            Bbi = Bi[:, cs, ls]
            sr = jnp.sum(vr * Bbr + vi * Bbi, axis=-1, keepdims=True)
            si = jnp.sum(vr * Bbi - vi * Bbr, axis=-1, keepdims=True)
            bsr = beta * sr                              # (T, szc, 1)
            bsi = beta * si
            Br[:, cs, ls] = Bbr - (bsr * vr - bsi * vi)
            Bi[:, cs, ls] = Bbi - (bsi * vr + bsr * vi)
            # record R_jj = alpha exactly (sublane j, lane j)
            is_j = lane_full == j
            Br[:, pl.ds(j, 1), :] = jnp.where(
                is_j, ar_, Br[:, pl.ds(j, 1), :])
            Bi[:, pl.ds(j, 1), :] = jnp.where(
                is_j, ai_, Bi[:, pl.ds(j, 1), :])

            # P <- P - beta v (v^H P): v indexed by A-rows -> sublanes;
            # support on rows >= j >= a8 restricts to sublanes [a8, n)
            off = a8 - c0
            vcr = jnp.swapaxes(vr, -1, -2)[:, off:, :]   # (T, szc, 1)
            vci = jnp.swapaxes(vi, -1, -2)[:, off:, :]
            ms = pl.ds(a8, szc)
            Pbr = Pr[:, ms, :]                           # (T, szc, n)
            Pbi = Pi[:, ms, :]
            tr = jnp.sum(vcr * Pbr + vci * Pbi, axis=-2, keepdims=True)
            ti = jnp.sum(vcr * Pbi - vci * Pbr, axis=-2, keepdims=True)
            btr = beta * tr                              # (T, 1, n)
            bti = beta * ti
            Pr[:, ms, :] = Pbr - (vcr * btr - vci * bti)
            Pi[:, ms, :] = Pbi - (vcr * bti + vci * btr)
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), qr_step, ())

    # Q = P^H; R = upper(B^T) (B[c, r] = R[r, c]: junk below the
    # diagonal is exactly what the reflectors only approximately zeroed)
    Qr_out[...] = jnp.swapaxes(Pr[...], -1, -2)
    Qi_out[...] = -jnp.swapaxes(Pi[...], -1, -2)
    upper = rows2 <= cols2
    Rr_out[...] = jnp.where(upper, jnp.swapaxes(Br[...], -1, -2), 0.0)
    Ri_out[...] = jnp.where(upper, jnp.swapaxes(Bi[...], -1, -2), 0.0)


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
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(Bt // T,),
            out_shape=(shp,) * 4,
            in_specs=[mat(), mat()],
            out_specs=(mat(),) * 4,
            scratch_shapes=[pltpu.VMEM((T, n, n), jnp.float32)] * 4,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(BTr, BTi)
    return outs


@functools.lru_cache(maxsize=None)
def _make_cqr(interpret: bool):
    @jax.custom_batching.custom_vmap
    def cqr(A):                                   # (Bt, 2, n, n) f32
        n = A.shape[-1]
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


def cqr_big(A, *, interpret: bool = False):
    """Batched complex f32 QR on pair matrices (..., 2, n, n) ->
    (Q, R) pairs, column-lane layout: VMEM scales with the walker tile,
    valid for any n % 8 == 0 (use pallas_cqr_lanes below its MAX_N —
    the lane-batched layout wins when the whole problem fits VMEM)."""
    lead = A.shape[:-3]
    n = A.shape[-1]
    Q, R = _make_cqr(interpret)(A.reshape(-1, 2, n, n))
    return Q.reshape(*lead, 2, n, n), R.reshape(*lead, 2, n, n)
