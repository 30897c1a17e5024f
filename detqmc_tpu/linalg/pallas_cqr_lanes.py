"""Lane-batched COMPLEX f32 Householder QR: walkers in the 128-lane axis.

The SDW native-complex chain (models/sdw.py chain_repr="native") QRs one
well-conditioned complex interval block per stabilization. Doing this on
the real embedding costs (2n)^3 real flops and destroys the complex
structure; this kernel factors the n x n complex matrix directly as
(re, im) f32 planes — 4 n^3-class real multiply streams, half the
embedded arithmetic — with the pallas_qr_lanes layout (batch in lanes,
8-column static chunks, Q accumulated by right-applying reflectors).

Complex Householder per step j:
    x      = B[j:, j]                      (complex column)
    sigma  = ||x||;  u = x_j / |x_j|       (phase; u = 1 when x_j = 0)
    alpha  = -u * sigma                    (R_jj; |alpha| = sigma)
    v      = x - alpha e_j;  beta = 2 / v^H v   (beta real)
    B     -= beta v (v^H B);   Q <- Q - beta (Q v) v^H
H = 1 - beta v v^H is Hermitian and unitary; A = Q R with R upper
triangular and complex diagonal (the caller's sign-fix rotates the phase
into U so d = |R_jj| stays positive — udv sign convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WL = 128     # walkers per grid step (lane width)
CB = 8       # column chunk (sublane granularity)
MAX_N = 128  # VMEM bound (6 resident (n, n, WL) f32 buffers)


def _kernel(Ar_hbm, Ai_hbm, Qr_ref, Qi_ref, Rr_ref, Ri_ref, Br, Bi,
            sem_r, sem_i, *, n: int):
    f32 = Qr_ref.dtype
    g = pl.program_id(0)
    dma_r = pltpu.make_async_copy(Ar_hbm.at[pl.ds(g * n, n)], Br, sem_r)
    dma_i = pltpu.make_async_copy(Ai_hbm.at[pl.ds(g * n, n)], Bi, sem_i)
    dma_r.start()
    dma_i.start()
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    Qr_ref[...] = jnp.broadcast_to((rows2 == cols2).astype(f32),
                                   Qr_ref.shape)
    Qi_ref[...] = jnp.zeros_like(Qi_ref)
    dma_r.wait()
    dma_i.wait()

    for a in range(0, n, CB):
        sz = n - a
        rows = a + jax.lax.broadcasted_iota(jnp.int32, (sz, 1, 1), 0)
        rs = pl.ds(a, sz)

        def qr_step(jj, _, a=a, sz=sz, rows=rows, rs=rs):
            j = jnp.int32(a) + jj
            geq = rows >= j
            onehot = (rows == j).astype(f32)
            xr = jnp.where(geq, Br[rs, pl.ds(j, 1), :], 0.0)  # (sz,1,WL)
            xi = jnp.where(geq, Bi[rs, pl.ds(j, 1), :], 0.0)
            norm2 = jnp.sum(xr * xr + xi * xi, axis=0, keepdims=True)
            norm = jnp.sqrt(norm2)                            # (1,1,WL)
            x0r = jnp.sum(xr * onehot, axis=0, keepdims=True)
            x0i = jnp.sum(xi * onehot, axis=0, keepdims=True)
            a0 = jnp.sqrt(x0r * x0r + x0i * x0i)
            g0 = (a0 == 0).astype(f32)
            inv0 = 1.0 / (a0 + g0)
            ur = x0r * inv0 + g0                              # phase u
            ui = x0i * inv0
            ar_ = -ur * norm                                  # alpha
            ai_ = -ui * norm
            vr = xr - ar_ * onehot
            vi = xi - ai_ * onehot
            vtv = jnp.sum(vr * vr + vi * vi, axis=0, keepdims=True)
            guard = (vtv == 0).astype(f32)
            beta = 2.0 / (vtv + guard)

            Bbr = Br[rs, rs, :]                               # (sz,sz,WL)
            Bbi = Bi[rs, rs, :]
            # s = v^H B  (conj(v) dot rows)
            sr = jnp.sum(vr * Bbr + vi * Bbi, axis=0, keepdims=True)
            si = jnp.sum(vr * Bbi - vi * Bbr, axis=0, keepdims=True)
            bsr = beta * sr
            bsi = beta * si
            Br[rs, rs, :] = Bbr - (vr * bsr - vi * bsi)
            Bi[rs, rs, :] = Bbi - (vr * bsi + vi * bsr)
            # record R_jj = alpha exactly
            Br[rs, pl.ds(j, 1), :] = jnp.where(
                rows == j, ar_, Br[rs, pl.ds(j, 1), :])
            Bi[rs, pl.ds(j, 1), :] = jnp.where(
                rows == j, ai_, Bi[rs, pl.ds(j, 1), :])

            # Q <- Q - beta (Q v) v^H   (Q cols indexed by A-row)
            vr_s = jnp.swapaxes(vr, 0, 1)                     # (1,sz,WL)
            vi_s = jnp.swapaxes(vi, 0, 1)
            Qbr = Qr_ref[:, rs, :]                            # (n,sz,WL)
            Qbi = Qi_ref[:, rs, :]
            Qvr = jnp.sum(Qbr * vr_s - Qbi * vi_s, axis=1, keepdims=True)
            Qvi = jnp.sum(Qbr * vi_s + Qbi * vr_s, axis=1, keepdims=True)
            bQvr = beta * Qvr
            bQvi = beta * Qvi
            # (Qv) (v^H):  (Qv) * conj(v)^T
            Qr_ref[:, rs, :] = Qbr - (bQvr * vr_s + bQvi * vi_s)
            Qi_ref[:, rs, :] = Qbi - (bQvi * vr_s - bQvr * vi_s)
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, sz)), qr_step,
                          ())

    Rr_ref[...] = jnp.where(rows2 <= cols2, Br[...], 0.0)
    Ri_ref[...] = jnp.where(rows2 <= cols2, Bi[...], 0.0)


def _call_lanes(Ar, Ai, *, interpret: bool):
    Gn, n, _ = Ar.shape
    G = Gn // n
    mat = functools.partial(pl.BlockSpec, (n, n, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pl.ANY)
    shp = jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(G,),
            out_shape=(shp,) * 4,
            in_specs=[hbm(), hbm()],
            out_specs=(mat(),) * 4,
            scratch_shapes=[pltpu.VMEM((n, n, WL), jnp.float32)] * 2
            + [pltpu.SemaphoreType.DMA] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Ar, Ai)
    return outs


@functools.lru_cache(maxsize=None)
def _make_cqr(interpret: bool):
    @jax.custom_batching.custom_vmap
    def cqr(A):                                   # (Bt, 2, n, n) f32
        Bt, _, n, _ = A.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            pad_blk = jnp.stack(
                [eye, jnp.zeros_like(eye)], axis=1)
            A = jnp.concatenate([A, pad_blk], axis=0)

        def to_lanes(x):
            x = x.reshape(G, WL, n, n)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, n, WL)

        def from_lanes(x):
            x = x.reshape(G, n, n, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(G * WL, n, n)

        Qr, Qi, Rr, Ri = _call_lanes(to_lanes(A[:, 0]), to_lanes(A[:, 1]),
                                     interpret=interpret)
        Q = jnp.stack([from_lanes(Qr), from_lanes(Qi)], axis=1)[:Bt]
        R = jnp.stack([from_lanes(Rr), from_lanes(Ri)], axis=1)[:Bt]
        return Q, R

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


def cqr_lanes(A, *, interpret: bool = False):
    """Batched complex f32 QR on pair matrices: (..., 2, n, n) ->
    (Q, R) pairs. Valid for n % 8 == 0, n <= MAX_N."""
    lead = A.shape[:-3]
    n = A.shape[-1]
    Q, R = _make_cqr(interpret)(A.reshape(-1, 2, n, n))
    return Q.reshape(*lead, 2, n, n), R.reshape(*lead, 2, n, n)
