"""Column-lane REAL f32 upper-triangular inverse (batched).

Real twin of pallas_ctrinv for the Hubbard chain's mixed-precision
refined green solve (linalg/udv.inv_refined): invert the R factor of the
plain-f32 QR once, so iterative refinement of the inner stabilization
solve becomes pure MXU matmul work. Same column-lane layout and
chunk-restricted update structure as pallas_ctrinv — see that module's
docstring for the algorithm; this one just drops the imaginary plane.
(Reference parity: the stabilized Green inner solve, SURVEY.md §3 "DQMC
core".)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 32
VMEM_BUDGET = 8 * 1024 * 1024  # 2 resident (T, n, n) f32 blocks
CHUNK = 128
SUBCHUNK = 8


def _max_tile(n: int) -> int:
    return max(1, min(MAX_TILE, VMEM_BUDGET // (2 * n * n * 4)))


def _kernel(BT_in, X_out, *, n: int):
    f32 = X_out.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    X_out[...] = jnp.broadcast_to(eye, X_out.shape)
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
            Brow = BT_in[:, pl.ds(j, 1), :]          # (T, 1, n)
            a = jnp.sum(jnp.where(onehot, Brow, 0.0), -1, keepdims=True)
            g = (a == 0).astype(f32)                 # guard exact zeros
            inv = 1.0 / (a + g)
            # Dynamic-sublane loads/stores must span the FULL lane width
            # (Mosaic rejects a dynamic row index combined with a lane
            # offset: "dynamic load with unaligned indices"); restrict to
            # the chunk by slicing the register value instead.
            xj = X_out[:, pl.ds(j, 1), :] * inv
            X_out[:, pl.ds(j, 1), :] = xj
            # R[0:j, j]: B's sublane-j row, lanes < j, into sublanes
            lt = lane_full < j
            Rc = jnp.swapaxes(
                jnp.where(lt, Brow, 0.0), -1, -2)[:, :top, :]
            ts = pl.ds(0, top)
            # full-width update: xj's lanes < c0 are exact zeros (row j
            # of the upper-triangular inverse has support on lanes >= j)
            # and Mosaic rejects broadcasts of offset-lane vectors.
            X_out[:, ts, :] = X_out[:, ts, :] - Rc * xj
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(cw), step, ())


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
    kern = _kernel_blocked if _use_blocked() else _kernel
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(kern, n=n),
            grid=(Bt // T,),
            out_shape=shp,
            in_specs=[mat()],
            out_specs=mat(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(BT)
    return out


BLOCK = 32
_HI = jax.lax.Precision.HIGHEST


def _kernel_blocked(BT_in, X_out, *, n: int):
    """Blocked back-substitution (real twin of pallas_ctrinv's blocked
    kernel): rank-1 updates stay inside a BLOCK-column panel; each
    panel's effect on all rows above is one MXU product."""
    f32 = X_out.dtype
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = (rows2 == cols2).astype(f32)
    X_out[...] = jnp.broadcast_to(eye, X_out.shape)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    b = BLOCK

    for j0 in reversed(range(0, n, b)):
        jb = min(b, n - j0)
        c0 = (j0 // CHUNK) * CHUNK
        szl = n - c0
        ls = pl.ds(c0, szl)
        bs = pl.ds(j0, jb)

        def step(kk, _, j0=j0, jb=jb, ls=ls, bs=bs, c0=c0):
            j = jnp.int32(j0 + jb - 1) - kk
            onehot = lane_full == j
            Brow = BT_in[:, pl.ds(j, 1), :]
            a = jnp.sum(jnp.where(onehot, Brow, 0.0), -1, keepdims=True)
            g = (a == 0).astype(f32)
            inv = 1.0 / (a + g)
            # full-lane-width dynamic row access (see _kernel)
            xj = X_out[:, pl.ds(j, 1), :] * inv
            X_out[:, pl.ds(j, 1), :] = xj
            j0i = jnp.int32(j0)
            in_panel_lt = (lane_full >= j0i) & (lane_full < j)
            Rc = jnp.swapaxes(jnp.where(in_panel_lt, Brow, 0.0),
                              -1, -2)[:, j0:j0 + jb, :]
            X_out[:, bs, :] = X_out[:, bs, :] - Rc * xj
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(jb), step, ())

        if j0 > 0:
            ts = pl.ds(0, j0)
            for t in range(X_out.shape[0]):
                Rb = BT_in[t, bs, :j0]           # (jb, j0) = R[0:j0, J]^T
                Xj = X_out[t, bs, ls]            # (jb, szl)
                U = jax.lax.dot_general(
                    Rb, Xj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI)
                X_out[t, ts, ls] = X_out[t, ts, ls] - U


def _use_blocked() -> bool:
    # blocked (MXU panel updates) is the default — measured faster at
    # SDW L=8 with identical green_dev; DETQMC_TPU_TRINV=col opts back
    # into the pure column back-substitution kernel.
    import os

    return os.environ.get("DETQMC_TPU_TRINV", "") != "col"


@functools.lru_cache(maxsize=None)
def _make_trinv(interpret: bool):
    @jax.custom_batching.custom_vmap
    def trinv(R):                                   # (Bt, n, n) f32
        X = _call_batched(jnp.swapaxes(R, -1, -2), interpret=interpret)
        return X

    @trinv.def_vmap
    def _rule(axis_size, in_batched, R):
        if not in_batched[0]:
            R = jnp.broadcast_to(R[None], (axis_size, *R.shape))
        lead = R.shape[:-2]
        n = R.shape[-1]
        X = trinv(R.reshape(-1, n, n))
        return X.reshape(*lead, n, n), True

    return trinv


def trinv_big(R, *, interpret: bool = False):
    """X = R^{-1} for batched real upper-triangular matrices (..., n, n)
    f32, any n % 8 == 0. Column-lane layout: VMEM scales with the batch
    tile (2 resident (T, n, n) blocks)."""
    lead = R.shape[:-2]
    n = R.shape[-1]
    X = _make_trinv(interpret)(R.reshape(-1, n, n))
    return X.reshape(*lead, n, n)
