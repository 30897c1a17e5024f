"""Pallas TPU kernel: fused sequential Metropolis slice update.

The per-slice inner loop of BSS DQMC — for each site: determinant ratio
from G's diagonal, accept/reject, rank-1 update of G — is inherently
sequential (each site sees the previous sites' updates; reference:
DetHubbard::updateInSlice + delayed updates, SURVEY.md §4.1/§3).

Expressed as ``lax.scan`` over sites, every site costs one XLA dispatch
(~5k tiny ops per sweep — measured dispatch-bound: throughput flat in the
walker count). This kernel runs the whole site loop *inside one Pallas
program*, combining the two classic accelerations natively:

- a TILE of walkers per grid step, so every VPU instruction works on
  (tile, ...) operands — the site recursion is sequential per walker but
  embarrassingly parallel across walkers;
- DELAYED (block rank-k) updates: accepted rank-1 updates accumulate in
  (tile, k, N) buffers; the effective row/column of G needed per site is
  reconstructed on the fly (O(tile*k*N) VPU work instead of an
  O(tile*N^2) full-G rewrite), and every k sites the buffers flush into G
  with one MXU contraction (reference: updateMethod=delayed; here it cuts
  VMEM traffic ~N/k-fold).

TPU-shaped design notes (each learned the hard way on this toolchain):

- branchless: rejected proposals contribute zero-coefficient buffer rows —
  ``pl.when`` around ref updates inside a ``fori_loop`` and scalar
  ``jnp.where`` both fail/crawl in Mosaic ("failed to legalize
  arith.select"); everything is arithmetic gating on small vectors;
- per-spin G matrices are separate refs (4-D refs with dynamic-slice
  writes compile pathologically slowly);
- a transposed copy G^T is maintained (flushed with the swapped
  contraction) so both the row i and column i of G are contiguous reads;
- per-site scalars are extracted with one-hot mask reductions (Mosaic has
  no dynamic scalar indexing into VMEM values);
- ``fori_loop`` bounds are pinned int32 (an i64 index under x64 mode hits
  infinite recursion in Mosaic's convert lowering);
- walker batching is an EXPLICIT grid wired through
  ``jax.custom_batching.custom_vmap`` — jax's generic pallas vmap rule
  produces kernels this toolchain cannot legalize;
- uniforms come from the usual threefry stream outside the kernel, so
  results are reproducible across the scan and Pallas paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_TILE = 16   # walkers per grid step; VMEM ~ tile*4*N^2*4B (1MB @ N=64)
MAX_DELAY = 32  # rank-k buffer depth


def _pick_divisor(n: int, cap: int) -> int:
    for t in range(min(cap, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _kernel(field_ref, u01_ref, Gu_in, Gd_in, Gut_in, Gdt_in, sign_in,
            field_out, Gu, Gd, Gut, Gdt, sign_ref, acc_ref,
            Uu, Wu, Ud, Wd,
            *, alpha: float, n_sites: int, kd: int):
    field_out[...] = field_ref[...]
    Gu[...] = Gu_in[...]
    Gd[...] = Gd_in[...]
    Gut[...] = Gut_in[...]
    Gdt[...] = Gdt_in[...]
    sign_ref[...] = sign_in[...]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    n = n_sites
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    dnums = (((1,), (1,)), ((0,), (0,)))  # contract k, batch tile

    def block_step(b, _):
        Uu[...] = jnp.zeros_like(Uu)
        Wu[...] = jnp.zeros_like(Wu)
        Ud[...] = jnp.zeros_like(Ud)
        Wd[...] = jnp.zeros_like(Wd)

        def site_step(j, _):
            i = b * kd + j
            oh = (col_ids == i).astype(field_ref.dtype)      # (1, 1, N)
            frow = field_out[:, 0:1, :]                      # (T, 1, N)
            s_i = jnp.sum(frow * oh, axis=-1, keepdims=True)  # (T, 1, 1)
            u_i = jnp.sum(u01_ref[:, 0:1, :] * oh, axis=-1, keepdims=True)

            eff = []
            deltas = []
            ratios = []
            for c, (sgn, Gc, Gct, Ub, Wb) in (
                    (0, (1.0, Gu, Gut, Uu, Wu)),
                    (1, (-1.0, Gd, Gdt, Ud, Wd))):
                # effective row/col i of G including pending buffer updates
                g_row0 = Gc[:, pl.ds(i, 1), :]               # (T, 1, N)
                g_col0 = Gct[:, pl.ds(i, 1), :]
                u_at_i = jnp.sum(Ub[...] * oh, axis=-1, keepdims=True)
                w_at_i = jnp.sum(Wb[...] * oh, axis=-1, keepdims=True)
                g_row = g_row0 + jnp.sum(u_at_i * Wb[...], axis=1,
                                         keepdims=True)
                g_col = g_col0 + jnp.sum(w_at_i * Ub[...], axis=1,
                                         keepdims=True)
                gii = jnp.sum(g_row * oh, axis=-1, keepdims=True)
                delta = jnp.exp(-2.0 * sgn * alpha * s_i) - 1.0
                eff.append((g_row, g_col))
                deltas.append(delta)
                ratios.append(1.0 + delta * (1.0 - gii))
            r_tot = ratios[0] * ratios[1]                    # (T, 1, 1)
            gate = (u_i < jnp.abs(r_tot)).astype(frow.dtype)

            for c, (Ub, Wb) in ((0, (Uu, Wu)), (1, (Ud, Wd))):
                coef = gate * (-deltas[c] / ratios[c])       # (T, 1, 1)
                g_row, g_col = eff[c]
                Ub[:, pl.ds(j, 1), :] = coef * g_col
                Wb[:, pl.ds(j, 1), :] = gate * (oh - g_row)
            field_out[:, 0:1, :] = frow * (1.0 - 2.0 * gate * oh)
            r_sgn = jnp.sign(r_tot)
            sign_ref[...] = sign_ref[...] * (1.0 + gate * (r_sgn - 1.0))
            acc_ref[...] = acc_ref[...] + gate
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(kd), site_step, (),
                          unroll=False)

        # flush: G += sum_k u_k (x) w_k   (one MXU contraction per matrix)
        for Gc, Gct, Ub, Wb in ((Gu, Gut, Uu, Wu), (Gd, Gdt, Ud, Wd)):
            Gc[...] += jax.lax.dot_general(
                Ub[...], Wb[...], dnums,
                preferred_element_type=jnp.float32).astype(Gc.dtype)
            Gct[...] += jax.lax.dot_general(
                Wb[...], Ub[...], dnums,
                preferred_element_type=jnp.float32).astype(Gc.dtype)
        return ()

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_sites // kd), block_step,
                      (), unroll=False)


def _call_batched(G, field_l, u01, sign, *, alpha, interpret):
    """Explicit-grid batched kernel call. G: (W,2,N,N), field/u01: (W,N),
    sign: (W,)."""
    W, _, n, _ = G.shape
    dt = G.dtype
    T = _pick_divisor(W, MAX_TILE)
    kd = _pick_divisor(n, MAX_DELAY)
    Gu, Gd = G[:, 0], G[:, 1]
    Gut = jnp.swapaxes(Gu, -1, -2)
    Gdt = jnp.swapaxes(Gd, -1, -2)
    f3 = field_l[:, None, :]
    u3 = u01[:, None, :]
    s3 = sign.astype(dt)[:, None, None]

    vec = functools.partial(pl.BlockSpec, (T, 1, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    scl = functools.partial(pl.BlockSpec, (T, 1, 1),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((W, 1, n), dt),     # field
        jax.ShapeDtypeStruct((W, n, n), dt),     # Gu
        jax.ShapeDtypeStruct((W, n, n), dt),     # Gd
        jax.ShapeDtypeStruct((W, n, n), dt),     # Gut (discarded)
        jax.ShapeDtypeStruct((W, n, n), dt),     # Gdt (discarded)
        jax.ShapeDtypeStruct((W, 1, 1), dt),     # sign
        jax.ShapeDtypeStruct((W, 1, 1), dt),     # acc count
    )
    # trace/lower the kernel with x64 semantics OFF: all kernel dtypes are
    # explicit f32, but global x64 mode flips Mosaic's index defaults to
    # 64-bit, which fails to legalize ("func.return") on this toolchain
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, alpha=alpha, n_sites=n, kd=kd),
            grid=(W // T,),
            out_shape=out_shapes,
            in_specs=[vec(), vec(), mat(), mat(), mat(), mat(), scl()],
            out_specs=(vec(), mat(), mat(), mat(), mat(), scl(), scl()),
            scratch_shapes=[pltpu.VMEM((T, kd, n), jnp.float32)
                            for _ in range(4)],
            interpret=interpret,
        )(f3, u3, Gu, Gd, Gut, Gdt, s3)
    field_o, Gu_o, Gd_o, _, _, sign_o, acc_o = outs
    G_o = jnp.stack([Gu_o, Gd_o], axis=1)
    acc_rate = acc_o[:, 0, 0] / jnp.asarray(n, dt)
    return G_o, field_o[:, 0], sign_o[:, 0, 0], acc_rate


@functools.lru_cache(maxsize=None)
def make_slice_update(alpha: float, interpret: bool = False):
    """Fused Metropolis update of one time slice (both spins), vmappable.

    Returns f(G, field_l, u01, sign) -> (G', field_l', sign', acc_rate)
    with G: (2, N, N); field_l, u01: (N,); sign: scalar — semantics
    identical to the lax.scan reference implementation in models/hubbard.py.
    Under vmap, the batch axis becomes the Pallas grid.
    """

    @jax.custom_batching.custom_vmap
    def slice_update(G, field_l, u01, sign):
        G_o, f_o, s_o, a_o = _call_batched(
            G[None], field_l[None], u01[None], sign[None],
            alpha=alpha, interpret=interpret)
        return G_o[0], f_o[0], s_o[0], a_o[0]

    @slice_update.def_vmap
    def _rule(axis_size, in_batched, G, field_l, u01, sign):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))
        G = bcast(G, in_batched[0])
        field_l = bcast(field_l, in_batched[1])
        u01 = bcast(u01, in_batched[2])
        sign = bcast(sign, in_batched[3])
        outs = _call_batched(G, field_l, u01, sign,
                             alpha=alpha, interpret=interpret)
        return outs, (True, True, True, True)

    return slice_update


def slice_update(G, field_l, u01, sign, *, alpha: float,
                 interpret: bool = False):
    """Convenience single-walker entry point."""
    return make_slice_update(alpha, interpret)(G, field_l, u01, sign)
