"""Lane-batched f32 Householder QR: walkers in the 128-lane axis.

The stack-advance refactor (linalg/udv.udv_refactor) QRs one
well-conditioned interval block per stabilization in plain f32 — XLA's
batched QR takes ~2.4 ms for a (256, 64, 64) batch on this chip, ~100 ms
per sweep pair at the headline config. This kernel runs the same
factorization with the pallas_green_lanes data layout (batch in lanes,
8-column static chunks restricting the trailing updates to the active
triangle) in straight f32 — no df32, no back-substitution — and
accumulates Q explicitly by applying the reflectors from the right.

Contract: qr_lanes(A) == jnp.linalg.qr(A) up to the usual column-sign
ambiguity; udv_decompose's sign-fixing normalizes both, so the UdV result
is identical. Output R's strict lower triangle is zeroed exactly.

Per step j (A-rows = leading axis, A-cols = sublanes, walkers = lanes):
    x     = B[j:, j, :] masked to rows >= j
    alpha = -sign(x_j) ||x||; v = x - alpha e_j; beta = 2 / v^T v
    B[a:, a:, :] -= beta v (v^T B)        (trailing update, chunked)
    Q[:, a:, :]  -= beta (Q v) v^T        (right-applied reflector)
    R_jj  = alpha
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WL = 128     # walkers per grid step (lane width)
CB = 8       # column chunk (sublane granularity)
MAX_N = 128  # VMEM bound (same reasoning as pallas_green_lanes)


def _kernel(A_hbm, Q_ref, R_ref, B, sem, *, n: int):
    f32 = Q_ref.dtype
    g = pl.program_id(0)
    dma = pltpu.make_async_copy(A_hbm.at[pl.ds(g * n, n)], B, sem)
    dma.start()
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    Q_ref[...] = jnp.broadcast_to((rows2 == cols2).astype(f32),
                                  Q_ref.shape)
    dma.wait()

    for a in range(0, n, CB):
        sz = n - a
        rows = a + jax.lax.broadcasted_iota(jnp.int32, (sz, 1, 1), 0)
        rs = pl.ds(a, sz)

        def qr_step(jj, _, a=a, sz=sz, rows=rows, rs=rs):
            j = jnp.int32(a) + jj
            geq = rows >= j
            onehot = (rows == j).astype(f32)
            x = jnp.where(geq, B[rs, pl.ds(j, 1), :], 0.0)  # (sz, 1, WL)
            norm2 = jnp.sum(x * x, axis=0, keepdims=True)   # (1, 1, WL)
            norm = jnp.sqrt(norm2)
            x0 = jnp.sum(x * onehot, axis=0, keepdims=True)
            sgn = 2.0 * (x0 >= 0).astype(f32) - 1.0
            alpha = -sgn * norm                             # (1, 1, WL)
            v = x - alpha * onehot                          # (sz, 1, WL)
            vtv = jnp.sum(v * v, axis=0, keepdims=True)
            guard = (vtv == 0).astype(f32)                  # degenerate col
            beta = 2.0 / (vtv + guard)

            Bblk = B[rs, rs, :]                             # (sz, sz, WL)
            s_row = jnp.sum(Bblk * v, axis=0, keepdims=True)  # (1, sz, WL)
            B[rs, rs, :] = Bblk - v * (beta * s_row)
            # record R_jj = alpha exactly (the update leaves rounding noise)
            B[rs, pl.ds(j, 1), :] = jnp.where(
                rows == j, alpha, B[rs, pl.ds(j, 1), :])

            # right-apply the reflector to Q: cols of Q = A-row index
            v_sub = jnp.swapaxes(v, 0, 1)                   # (1, sz, WL)
            Qblk = Q_ref[:, rs, :]                          # (n, sz, WL)
            Qv = jnp.sum(Qblk * v_sub, axis=1, keepdims=True)  # (n, 1, WL)
            Q_ref[:, rs, :] = Qblk - (beta * Qv) * v_sub
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(CB, sz)), qr_step,
                          ())

    # R = upper triangle of B (zero the reflector remnants exactly)
    R_ref[...] = jnp.where(rows2 <= cols2, B[...], 0.0)


def _call_lanes(A, *, interpret: bool):
    Gn, n, _ = A.shape
    G = Gn // n
    mat = functools.partial(pl.BlockSpec, (n, n, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    hbm = functools.partial(pl.BlockSpec, memory_space=pl.ANY)
    with jax.enable_x64(False):
        Q, R = pl.pallas_call(
            functools.partial(_kernel, n=n),
            grid=(G,),
            out_shape=(jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32),
                       jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32)),
            in_specs=[hbm()],
            out_specs=(mat(), mat()),
            scratch_shapes=[pltpu.VMEM((n, n, WL), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(A)
    return Q, R


@functools.lru_cache(maxsize=None)
def _make_qr(interpret: bool):
    @jax.custom_batching.custom_vmap
    def qr(A):                                    # (Bt, n, n) f32
        Bt, n, _ = A.shape
        G = -(-Bt // WL)
        pad = G * WL - Bt
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                   (pad, n, n))
            A = jnp.concatenate([A, eye], axis=0)

        def to_lanes(x):
            x = x.reshape(G, WL, n, n)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(G * n, n, WL)

        def from_lanes(x):
            x = x.reshape(G, n, n, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(G * WL, n, n)

        Q, R = _call_lanes(to_lanes(A), interpret=interpret)
        return from_lanes(Q)[:Bt], from_lanes(R)[:Bt]

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        if not in_batched[0]:
            A = jnp.broadcast_to(A[None], (axis_size, *A.shape))
        lead = A.shape[:-2]
        n = A.shape[-1]
        Q, R = qr(A.reshape(-1, n, n))
        return (Q.reshape(*lead, n, n), R.reshape(*lead, n, n)), (True,
                                                                  True)

    return qr


def qr_lanes(A, *, interpret: bool = False):
    """Batched f32 QR: (..., n, n) -> (Q, R); batch axes flatten into
    128-lane groups. Valid for n % 8 == 0, n <= MAX_N."""
    lead = A.shape[:-2]
    n = A.shape[-1]
    Q, R = _make_qr(interpret)(A.reshape(-1, n, n))
    return Q.reshape(*lead, n, n), R.reshape(*lead, n, n)
