"""Lane-batched fused Metropolis slice update: walkers in the lane axis.

Drop-in alternative to pallas_update.slice_update (same contract, same
arithmetic as models/hubbard._update_slice) with the data layout of
pallas_green_lanes: each grid step holds 128 walkers in the VPU lane
axis, G as (N_rows, N_cols, 128).

Why: the walker-tiled kernel (pallas_update) serializes walkers through
its grid (T per step) and pays one-hot lane-mask reductions per site; the
lax.scan path batches walkers per op but costs ~m*N sequential XLA op
dispatches per sweep (measured latency-bound: throughput flat in W). Here
every per-site quantity is a (1, 1, 128) per-lane scalar — no masks, no
reductions — and one site's whole rank-1 update is ~N^2*128/1024 VPU
slots, so a full slice is a few thousand VPU instructions for 128
walkers.

Per site i (reference: DetHubbard::updateInSlice, SURVEY.md §9
"Hubbard HS"):
    delta_c = exp(-2 sgn_c alpha s_i) - 1
    R_c     = 1 + delta_c (1 - G_c[i, i])
    accept  = u01_i < |R_up R_dn|      (ncomp=1: R^2/(1+delta), ph mode)
    G_c    -= (delta_c/R_c) * G_c[:, i] (x) (e_i - G_c[i, :])
    s_i    -> -s_i on accept; sign *= sign(R_tot)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WL = 128  # walkers per grid step (lane width)


def _kernel(*refs, alpha: float, n: int, ncomp: int):
    # refs: [field_in, u01, G_in x C, sign_in,
    #        field_out, G_out x C, sign_out, acc]
    it = iter(refs)
    field_in, u01_ref = next(it), next(it)
    G_in = [next(it) for _ in range(ncomp)]
    sign_in = next(it)
    field_out = next(it)
    Gs = [next(it) for _ in range(ncomp)]
    sign_ref, acc_ref = next(it), next(it)

    field_out[...] = field_in[...]
    for c in range(ncomp):
        Gs[c][...] = G_in[c][...]
    sign_ref[...] = sign_in[...]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    dt = field_in.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    def site_step(i, _):
        s_i = field_out[pl.ds(i, 1), :, :]            # (1, 1, WL)
        u_i = u01_ref[pl.ds(i, 1), :, :]
        oh_col = (col == i).astype(dt)                # (1, n, 1)

        deltas, ratios = [], []
        for c in range(ncomp):
            sgn = 1.0 if c == 0 else -1.0
            gii = Gs[c][pl.ds(i, 1), pl.ds(i, 1), :]  # (1, 1, WL)
            delta = jnp.exp(-2.0 * sgn * alpha * s_i) - 1.0
            deltas.append(delta)
            ratios.append(1.0 + delta * (1.0 - gii))
        if ncomp == 1:
            # particle-hole symmetric half filling:
            # R_dn = R_up / (1 + delta_up)
            r_tot = ratios[0] * ratios[0] / (1.0 + deltas[0])
        else:
            r_tot = ratios[0] * ratios[1]             # (1, 1, WL)
        gate = (u_i < jnp.abs(r_tot)).astype(dt)      # (1, 1, WL)

        for c in range(ncomp):
            Gc = Gs[c]
            coef = gate * (deltas[c] / ratios[c])     # (1, 1, WL)
            u = Gc[:, pl.ds(i, 1), :]                 # (n, 1, WL) col i
            w = oh_col - Gc[pl.ds(i, 1), :, :]        # (1, n, WL) e_i - row
            Gc[...] = Gc[...] - (coef * u) * w
        field_out[pl.ds(i, 1), :, :] = s_i * (1.0 - 2.0 * gate)
        r_sgn = jnp.sign(r_tot)
        sign_ref[...] = sign_ref[...] * (1.0 + gate * (r_sgn - 1.0))
        acc_ref[...] = acc_ref[...] + gate
        return ()

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), site_step, (),
                      unroll=False)


def _call_lanes(Gl, fl, u01l, sl, *, alpha, ncomp, n, interpret):
    """Lane-packed operands: Gl: list per comp of (G*n, n, WL); fl, u01l:
    (G*n, 1, WL); sl: (G, 1, WL)."""
    Gn = fl.shape[0]
    G = Gn // n
    mat = functools.partial(pl.BlockSpec, (n, n, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    vec = functools.partial(pl.BlockSpec, (n, 1, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    scl = functools.partial(pl.BlockSpec, (1, 1, WL),
                            lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    matS = jax.ShapeDtypeStruct((Gn, n, WL), jnp.float32)
    sclS = jax.ShapeDtypeStruct((G, 1, WL), jnp.float32)
    out_shape = tuple([jax.ShapeDtypeStruct((Gn, 1, WL), jnp.float32)]
                      + [matS] * ncomp + [sclS, sclS])
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, alpha=alpha, n=n, ncomp=ncomp),
            grid=(G,),
            out_shape=out_shape,
            in_specs=[vec(), vec()] + [mat()] * ncomp + [scl()],
            out_specs=tuple([vec()] + [mat()] * ncomp + [scl(), scl()]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(fl, u01l, *Gl, sl)
    return outs


@functools.lru_cache(maxsize=None)
def _make_slice_update(alpha: float, interpret: bool):
    @jax.custom_batching.custom_vmap
    def update(G, field_l, u01, sign):
        # unbatched single walker: delegate through the batched path
        Go, fo, so, ao = _batched(G[None], field_l[None], u01[None],
                                  sign[None])
        return Go[0], fo[0], so[0], ao[0]

    def _batched(G, field_l, u01, sign):
        W, ncomp, n, _ = G.shape
        Gp = -(-W // WL)
        pad = Gp * WL - W
        if pad:
            # inert pad walkers: u01 = +inf never accepts
            G = jnp.concatenate(
                [G, jnp.zeros((pad, ncomp, n, n), G.dtype)], axis=0)
            field_l = jnp.concatenate(
                [field_l, jnp.ones((pad, n), field_l.dtype)], axis=0)
            u01 = jnp.concatenate(
                [u01, jnp.full((pad, n), jnp.inf, u01.dtype)], axis=0)
            sign = jnp.concatenate(
                [sign, jnp.ones((pad,), sign.dtype)], axis=0)

        def to_lanes(x, w):
            x = x.reshape(Gp, WL, n, w)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(Gp * n, w, WL)

        Gl = [to_lanes(G[:, c], n) for c in range(ncomp)]
        fl = to_lanes(field_l[:, :, None], 1)
        ul = to_lanes(u01[:, :, None], 1)
        sl = sign.reshape(Gp, 1, WL)
        outs = _call_lanes(Gl, fl, ul, sl, alpha=alpha, ncomp=ncomp,
                           n=n, interpret=interpret)
        f_o = outs[0]
        G_o = outs[1:1 + ncomp]
        s_o, a_o = outs[-2], outs[-1]

        def from_lanes(x, w):
            x = x.reshape(Gp, n, w, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(Gp * WL, n, w)

        G_out = jnp.stack([from_lanes(g, n) for g in G_o], axis=1)[:W]
        f_out = from_lanes(f_o, 1)[:W, :, 0]
        s_out = s_o.reshape(Gp * WL)[:W]
        acc = a_o.reshape(Gp * WL)[:W] / jnp.asarray(n, jnp.float32)
        return G_out, f_out, s_out, acc

    @update.def_vmap
    def _rule(axis_size, in_batched, G, field_l, u01, sign):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        G = bcast(G, in_batched[0])
        field_l = bcast(field_l, in_batched[1])
        u01 = bcast(u01, in_batched[2])
        sign = bcast(sign, in_batched[3])
        return _batched(G, field_l, u01, sign), (True, True, True, True)

    return update


def slice_update(G, field_l, u01, sign, *, alpha: float,
                 interpret: bool = False):
    """Same contract as pallas_update.slice_update: f(G (C,N,N), field_l
    (N,), u01 (N,), sign scalar) -> (G', field_l', sign', acc_rate);
    vmap flattens the walker batch into lane groups of 128."""
    return _make_slice_update(alpha, interpret)(G, field_l, u01, sign)
