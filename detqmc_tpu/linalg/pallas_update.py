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


def _kernel(*refs, alpha: float, n_sites: int, kd: int, ncomp: int):
    # refs layout: [field, u01, G_in x ncomp, Gt_in x ncomp, sign_in,
    #               field_out, G x ncomp, Gt x ncomp, sign, acc,
    #               (U, W) scratch x ncomp]
    it = iter(refs)
    field_ref, u01_ref = next(it), next(it)
    G_in = [next(it) for _ in range(ncomp)]
    Gt_in = [next(it) for _ in range(ncomp)]
    sign_in = next(it)
    field_out = next(it)
    Gs = [next(it) for _ in range(ncomp)]
    Gts = [next(it) for _ in range(ncomp)]
    sign_ref, acc_ref = next(it), next(it)
    Ubufs = [next(it) for _ in range(ncomp)]
    Wbufs = [next(it) for _ in range(ncomp)]
    field_out[...] = field_ref[...]
    for c in range(ncomp):
        Gs[c][...] = G_in[c][...]
        Gts[c][...] = Gt_in[c][...]
    sign_ref[...] = sign_in[...]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    n = n_sites
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    dnums = (((1,), (1,)), ((0,), (0,)))  # contract k, batch tile

    def block_step(b, _):
        for c in range(ncomp):
            Ubufs[c][...] = jnp.zeros_like(Ubufs[c])
            Wbufs[c][...] = jnp.zeros_like(Wbufs[c])

        def site_step(j, _):
            i = b * kd + j
            oh = (col_ids == i).astype(field_ref.dtype)      # (1, 1, N)
            frow = field_out[:, 0:1, :]                      # (T, 1, N)
            s_i = jnp.sum(frow * oh, axis=-1, keepdims=True)  # (T, 1, 1)
            u_i = jnp.sum(u01_ref[:, 0:1, :] * oh, axis=-1, keepdims=True)

            eff = []
            deltas = []
            ratios = []
            for c in range(ncomp):
                sgn = 1.0 if c == 0 else -1.0
                Gc, Gct, Ub, Wb = Gs[c], Gts[c], Ubufs[c], Wbufs[c]
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
            if ncomp == 1:
                # particle-hole symmetric half filling:
                # R_dn = R_up / (1 + delta_up)
                r_tot = ratios[0] * ratios[0] / (1.0 + deltas[0])
            else:
                r_tot = ratios[0] * ratios[1]                # (T, 1, 1)
            gate = (u_i < jnp.abs(r_tot)).astype(frow.dtype)

            for c in range(ncomp):
                Ub, Wb = Ubufs[c], Wbufs[c]
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
        for c in range(ncomp):
            Gc, Gct, Ub, Wb = Gs[c], Gts[c], Ubufs[c], Wbufs[c]
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
    """Explicit-grid batched kernel call. G: (W,ncomp,N,N), field/u01:
    (W,N), sign: (W,). ncomp = 1 is the particle-hole-symmetric mode."""
    W, ncomp, n, _ = G.shape
    dt = G.dtype
    T = _pick_divisor(W, MAX_TILE)
    kd = _pick_divisor(n, MAX_DELAY)
    Gcs = [G[:, c] for c in range(ncomp)]
    Gcts = [jnp.swapaxes(Gc, -1, -2) for Gc in Gcs]
    f3 = field_l[:, None, :]
    u3 = u01[:, None, :]
    s3 = sign.astype(dt)[:, None, None]

    vec = functools.partial(pl.BlockSpec, (T, 1, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    mat = functools.partial(pl.BlockSpec, (T, n, n),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    scl = functools.partial(pl.BlockSpec, (T, 1, 1),
                            lambda w: (w, 0, 0), memory_space=pltpu.VMEM)
    matNN = jax.ShapeDtypeStruct((W, n, n), dt)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((W, 1, n), dt)]         # field
        + [matNN] * (2 * ncomp)                       # G, Gt per component
        + [jax.ShapeDtypeStruct((W, 1, 1), dt)] * 2)  # sign, acc
    # trace/lower the kernel with x64 semantics OFF: all kernel dtypes are
    # explicit f32, but global x64 mode flips Mosaic's index defaults to
    # 64-bit, which fails to legalize ("func.return") on this toolchain
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, alpha=alpha, n_sites=n, kd=kd,
                              ncomp=ncomp),
            grid=(W // T,),
            out_shape=out_shapes,
            in_specs=[vec(), vec()] + [mat()] * (2 * ncomp) + [scl()],
            out_specs=tuple([vec()] + [mat()] * (2 * ncomp)
                            + [scl(), scl()]),
            scratch_shapes=[pltpu.VMEM((T, kd, n), jnp.float32)
                            for _ in range(2 * ncomp)],
            interpret=interpret,
        )(f3, u3, *Gcs, *Gcts, s3)
    field_o = outs[0]
    G_o = jnp.stack(outs[1:1 + ncomp], axis=1)
    sign_o, acc_o = outs[-2], outs[-1]
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
