"""Fused SDW wrap: G <- B G B^-1 (or B^-1 G B) in ONE HBM round trip.

The XLA wrap path (models/sdw.wrap_up/down) chains four separate
contractions — kinetic (per-orbital dense expK) and potential (per-site
q x q D_V blocks) on each side — so G and three temporaries round-trip
HBM between ops: measured ~98 ms/sweep at SDW L=8 W=128, about half of
chip HBM bandwidth, 10% of the sweep (BASELINE.md phase table; the
reference's equivalent is the per-slice B wrap in
`src/detsdwopdim.cpp`'s sweep, which it never needs to fuse because a
CPU's cache hierarchy does it implicitly).

This kernel walks the walker batch as the Pallas grid, keeps one
walker's G (2 x h x h complex pair, 512 KB at h=256) plus one temp
resident in VMEM, and applies all four factors in-register:

  up:    G' = D_V . ( E @ ( (G @ E^-1) . D_V^-1 ) )
  down:  G' = E^-1 @ ( D_V^-1 . ( (G . D_V) @ E ) )

- E / E^-1 are the per-orbital dense kinetic factors ((q, N, N) real,
  block-diagonal over orbitals in the dim = q*N basis): applied as
  per-orbital-block MXU dots at HIGHEST precision (full f32 — the
  3-pass bf16 wrap default was the BENCH_r03 green_dev regression).
- D_V / D_V^-1 are per-SITE q x q complex blocks ((2, N, q, q) pair):
  block-diagonal over sites, i.e. a contraction over the orbital index
  with per-site coefficient vectors — pure VPU elementwise work with
  (N,)-broadcast scalars, q^2 terms per side.

Layout contract matches the model: dim index = orbital * N + site, G
planes (re, im) at axis -3. Real single-plane variant (opdim-1 reduced
sector) drops the imag operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _mk_helpers(q, N, cplx):
    """Factor-apply helpers over (P, h, h) refs — shared by the wrap
    and the apply-left (absorb) kernels."""
    P = 2 if cplx else 1

    def kin_left(dst, src, e):
        # dst[o-block, :] = e[o] @ src[o-block, :], both planes
        for p in range(P):
            for o in range(q):
                rs = pl.ds(o * N, N)
                dst[p, rs, :] = _dot(e[o], src[p, rs, :])

    def kin_right(dst, src, e):
        for p in range(P):
            for o in range(q):
                cs = pl.ds(o * N, N)
                dst[p, :, cs] = _dot(src[p, :, cs], e[o])

    def dv_left(dst, src, d):
        # (D X)[a*N+i, c] = sum_b D[i,a,b] X[b*N+i, c]:
        # per-site row-scaling, complex
        for a in range(q):
            acc_re = None
            acc_im = None
            for b in range(q):
                dre = d[0, a, b, :][:, None]            # (N, 1)
                xre = src[0, pl.ds(b * N, N), :]        # (N, h)
                if cplx:
                    dim_ = d[1, a, b, :][:, None]
                    xim = src[1, pl.ds(b * N, N), :]
                    t_re = dre * xre - dim_ * xim
                    t_im = dre * xim + dim_ * xre
                else:
                    t_re, t_im = dre * xre, None
                acc_re = t_re if acc_re is None else acc_re + t_re
                if cplx:
                    acc_im = t_im if acc_im is None else acc_im + t_im
            dst[0, pl.ds(a * N, N), :] = acc_re
            if cplx:
                dst[1, pl.ds(a * N, N), :] = acc_im

    def dv_right(dst, src, d):
        # (X D)[r, b*N+i] = sum_a X[r, a*N+i] D[i,a,b]:
        # per-site column-scaling, complex
        for b in range(q):
            acc_re = None
            acc_im = None
            for a in range(q):
                dre = d[0, a, b, :][None, :]            # (1, N)
                xre = src[0, :, pl.ds(a * N, N)]        # (h, N)
                if cplx:
                    dim_ = d[1, a, b, :][None, :]
                    xim = src[1, :, pl.ds(a * N, N)]
                    t_re = dre * xre - dim_ * xim
                    t_im = dre * xim + dim_ * xre
                else:
                    t_re, t_im = dre * xre, None
                acc_re = t_re if acc_re is None else acc_re + t_re
                if cplx:
                    acc_im = t_im if acc_im is None else acc_im + t_im
            dst[0, :, pl.ds(b * N, N)] = acc_re
            if cplx:
                dst[1, :, pl.ds(b * N, N)] = acc_im

    return kin_left, kin_right, dv_left, dv_right


def _kernel(e_ref, einv_ref, d_ref, dinv_ref, g_in, g_out, t_ref, *,
            q, N, up, cplx):
    """One walker per grid step. g refs: (P, h, h) with P = 2 (re, im)
    or 1 (real). d refs: (P, q, q, N) — site axis minor so the
    per-site coefficient vectors are contiguous lane loads. e refs:
    (q, N, N)."""
    kin_left, kin_right, dv_left, dv_right = _mk_helpers(q, N, cplx)
    e = e_ref[...]
    einv = einv_ref[...]
    d = d_ref[...]
    dinv = dinv_ref[...]
    if up:
        kin_right(t_ref, g_in, einv)     # t = G @ E^-1
        dv_right(g_out, t_ref, dinv)     # g = t . D^-1
        kin_left(t_ref, g_out, e)        # t = E @ g
        dv_left(g_out, t_ref, d)         # G' = D . t
    else:
        dv_right(g_out, g_in, d)         # g = G . D
        kin_right(t_ref, g_out, e)       # t = g @ E
        dv_left(g_out, t_ref, dinv)      # g = D^-1 . t
        kin_left(t_ref, g_out, einv)     # t = E^-1 @ g
        g_out[...] = t_ref[...]


@functools.lru_cache(maxsize=None)
def _make_wrap(q, N, up, cplx, interpret):
    h = q * N
    P = 2 if cplx else 1

    def _batched(G, E, Einv, D, Dinv):
        W = G.shape[0]
        # None in block_shape squeezes the walker axis out of the ref
        g_spec = pl.BlockSpec((None, P, h, h), lambda w: (w, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        bc = lambda shape: pl.BlockSpec(  # noqa: E731 — broadcast block
            shape, lambda w: (0,) * len(shape), memory_space=pltpu.VMEM)
        d_spec = pl.BlockSpec((None, P, q, q, N),
                              lambda w: (w, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

        def kern(e_r, ei_r, d_r, di_r, gi_r, go_r, t_r):
            _kernel(e_r, ei_r, d_r, di_r, gi_r, go_r, t_r,
                    q=q, N=N, up=up, cplx=cplx)

        # enable_x64(False): the model runtime enables global x64 for
        # the f64 precision islands, which makes BlockSpec index maps
        # trace as i64 — Mosaic cannot legalize i64 index returns
        # ("failed to legalize func.return"; same guard as
        # pallas_sdw_update)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(W,),
                out_shape=jax.ShapeDtypeStruct((W, P, h, h),
                                               jnp.float32),
                in_specs=[bc((q, N, N)), bc((q, N, N)), d_spec, d_spec,
                          g_spec],
                out_specs=g_spec,
                input_output_aliases={4: 0},
                scratch_shapes=[pltpu.VMEM((P, h, h), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(E, Einv, D, Dinv, G)

    @jax.custom_batching.custom_vmap
    def wrap(G, E, Einv, D, Dinv):
        return _batched(G[None], E, Einv, D[None], Dinv[None])[0]

    @wrap.def_vmap
    def _rule(axis_size, in_batched, G, E, Einv, D, Dinv):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size, *x.shape))

        # E/Einv are model constants (never batched); G/D/Dinv batch
        G = bcast(G, in_batched[0])
        D = bcast(D, in_batched[3])
        Dinv = bcast(Dinv, in_batched[4])
        assert not (in_batched[1] or in_batched[2]), \
            "kinetic factors must be per-model constants"
        return _batched(G, E, Einv, D, Dinv), True

    return wrap


def fused_wrap(G, E, Einv, D, Dinv, *, up: bool,
               interpret: bool = False):
    """G: (P, h, h) pair (P=2) or real (P=1); E/Einv: (q, N, N); D/Dinv:
    (P, N, q, q) per-site blocks (model layout — transposed to site-
    minor internally). Leading walker axes vmap over G/D/Dinv; E/Einv
    are constants. Returns the wrapped G."""
    P, h = G.shape[-3], G.shape[-1]
    q, N = E.shape[0], E.shape[1]
    assert h == q * N and D.shape[-3:] == (N, q, q)
    Dt = jnp.moveaxis(D, -3, -1)          # (..., P, q, q, N)
    Dinvt = jnp.moveaxis(Dinv, -3, -1)
    fn = _make_wrap(q, N, bool(up), P == 2, bool(interpret))
    return fn(G, E, Einv, Dt, Dinvt)


# ---- fused one-sided B apply (the absorb phase) -----------------------------
def _apply_kernel(e_ref, d_ref, x_in, x_out, t_ref, *, q, N, dv_first,
                  cplx):
    """X := D . (E @ X) (dv_first=False: B apply, B = D_V expK) or
    X := E @ (D . X) (dv_first=True: B^H apply with E = expK^T and
    D = blocks^H passed by the caller)."""
    kin_left, _, dv_left, _ = _mk_helpers(q, N, cplx)
    e = e_ref[...]
    d = d_ref[...]
    if dv_first:
        dv_left(t_ref, x_in, d)
        kin_left(x_out, t_ref, e)
    else:
        kin_left(t_ref, x_in, e)
        dv_left(x_out, t_ref, d)


@functools.lru_cache(maxsize=None)
def _make_apply(q, N, dv_first, cplx, interpret):
    h = q * N
    P = 2 if cplx else 1

    def _batched(X, E, D):
        W = X.shape[0]
        x_spec = pl.BlockSpec((None, P, h, h), lambda w: (w, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        e_spec = pl.BlockSpec((q, N, N), lambda w: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        d_spec = pl.BlockSpec((None, P, q, q, N),
                              lambda w: (w, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

        def kern(e_r, d_r, xi_r, xo_r, t_r):
            _apply_kernel(e_r, d_r, xi_r, xo_r, t_r, q=q, N=N,
                          dv_first=dv_first, cplx=cplx)

        with jax.enable_x64(False):     # see the wrap kernel's note
            return pl.pallas_call(
                kern,
                grid=(W,),
                out_shape=jax.ShapeDtypeStruct((W, P, h, h),
                                               jnp.float32),
                in_specs=[e_spec, d_spec, x_spec],
                out_specs=x_spec,
                input_output_aliases={2: 0},
                scratch_shapes=[pltpu.VMEM((P, h, h), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(E, D, X)

    @jax.custom_batching.custom_vmap
    def apply_(X, E, D):
        return _batched(X[None], E, D[None])[0]

    @apply_.def_vmap
    def _rule(axis_size, in_batched, X, E, D):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None],
                                                (axis_size, *x.shape))

        X = bcast(X, in_batched[0])
        D = bcast(D, in_batched[2])
        assert not in_batched[1], "E must be a per-model constant"
        return _batched(X, E, D), True

    return apply_


def fused_apply_left(X, E, D, *, dv_first: bool,
                     interpret: bool = False):
    """One-HBM-round-trip B (or B^H) left apply to a SQUARE operand —
    the sweep's absorb phase (B-chain accumulation into the lazy U).
    X: (P, h, h); E: (q, N, N) (pass expK^T for the B^H case); D:
    (P, N, q, q) per-site blocks (pass blocks^H for B^H). Leading
    walker axes vmap over X/D."""
    P, h = X.shape[-3], X.shape[-1]
    q, N = E.shape[0], E.shape[1]
    assert h == q * N and D.shape[-3:] == (N, q, q)
    Dt = jnp.moveaxis(D, -3, -1)
    fn = _make_apply(q, N, bool(dv_first), P == 2, bool(interpret))
    return fn(X, E, Dt)
