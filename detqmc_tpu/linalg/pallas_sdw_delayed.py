"""Delayed (chunked rank-k) variant of the fused SDW slice update.

The immediate kernel (pallas_sdw_update) applies every accepted site's
rank-q Woodbury correction to the full (h, h) Green function on the VPU
— O(q h^2) lane ops per site, which dominates the update phase once the
green solve is refined. This variant is the TPU-native analogue of the
reference's ``updateMethod=delayed`` (DetSDW delayed-update buffers,
SURVEY.md SS3 "SDW model"), restructured so the O(h^2) work rides the
MXU instead:

- The slice's N sites are processed in chunks of K. For one chunk the
  kernel never sees G at all: XLA statically slices the chunk's Green
  COLUMN panel (h, Kq) and ROW panel (Kq, h) out of G (the site visit
  order is fixed 0..N-1, so the orbital indices are a reshape+slice,
  not a gather), and corrects them against the buffers of *previous*
  chunks with two skinny batched matmuls (precision=highest) — MXU
  work, negligible next to the VPU savings.
- Inside the kernel each site corrects its own q columns/rows against
  the *in-chunk* pending slots only: O(2 q h . jq) lane ops for site j
  instead of O(q h^2) — a ~h/(Kq) reduction of the per-site VPU cost.
  Accept math (closed-form complex det/adjugate, log-domain threshold,
  live neighbor gradient) is identical to the immediate kernel; the
  kernel emits the chunk's C = gate * (G cols . A^{-1} Delta) and
  R = (e_j - G rows) factor buffers instead of touching G.
- After all chunks, ONE rank-Nq batched matmul flushes the slice:
  G -= C_all @ R_all (precision=highest, MXU). Rejected slots carry
  C = 0, so they are inert everywhere by construction.

The Markov chain is algebraically identical to the immediate kernel and
the sequential scan path (same RNG stream, same accept thresholds);
only the floating-point summation order differs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detqmc_tpu.linalg.pallas_sdw_update import (
    WL, _adj2, _cadd, _cmul, _det2, _det_adj4,
)


def _static_slots() -> bool:
    """Escape hatch: loop over all Kq in-chunk slots with a static trip
    count instead of the data-dependent j*q bound (future slots are
    zero-initialized, so the extra iterations are no-ops). Use if the
    traced-bound fori_loop ever fails to lower on a Mosaic version."""
    return os.environ.get("DETQMC_TPU_DELAYED_STATIC_SLOTS", "0") == "1"


def _kernel(*refs, N, q, opdim, Kc, dtau, c_det, cplx, h):
    it = iter(refs)
    nb_ref = next(it)                       # (N, 4) int32 SMEM
    i0_ref = next(it)                       # (1,) int32 SMEM chunk offset
    cols_re = next(it)                      # (h, Kq, WL)
    cols_im = next(it) if cplx else None
    rows_re = next(it)                      # (Kq, h, WL)
    rows_im = next(it) if cplx else None
    phi_in, dphi_ref, lhs_ref = next(it), next(it), next(it)
    dre_ref = next(it)
    dim_ref = next(it) if cplx else None
    C_re = next(it)                         # out (h, Kq, WL)
    C_im = next(it) if cplx else None
    R_re = next(it)                         # out (Kq, h, WL)
    R_im = next(it) if cplx else None
    phi_ref = next(it)                      # out, aliased with phi_in
    acc_ref = next(it)                      # out (1, 1, WL)
    ccol_re = next(it)                      # scratch (h, q, WL)
    ccol_im = next(it) if cplx else None
    crow_re = next(it)                      # scratch (q, h, WL)
    crow_im = next(it) if cplx else None

    C_re[...] = jnp.zeros_like(C_re)
    R_re[...] = jnp.zeros_like(R_re)
    if cplx:
        C_im[...] = jnp.zeros_like(C_im)
        R_im[...] = jnp.zeros_like(R_im)
    phi_ref[...] = phi_in[...]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    Ns = h // q
    dt = jnp.float32
    i0 = i0_ref[0]

    def site_body(j, _):
        i = i0 + j
        nb_i = tuple(nb_ref[i, d] for d in range(4))
        lhs_i = lhs_ref[pl.ds(i, 1), :, :]                  # (1, 1, WL)
        dphi_i = dphi_ref[pl.ds(i, 1), :, :]                # (1, op, WL)
        snb = phi_ref[pl.ds(nb_i[0], 1), :, :]
        for d in range(1, 4):
            snb = snb + phi_ref[pl.ds(nb_i[d], 1), :, :]
        live = dtau * jnp.sum(dphi_i * snb, axis=1, keepdims=True)

        dre = dre_ref[pl.ds(i * q, q), :, :]                # (q, q, WL)
        dim_ = dim_ref[pl.ds(i * q, q), :, :] if cplx else None
        D = [[(dre[a:a + 1, b:b + 1, :],
               dim_[a:a + 1, b:b + 1, :] if cplx else None)
              for b in range(q)] for a in range(q)]

        # stage the site's chunk-start column/row panels into scratch
        ccol_re[:, :, :] = cols_re[:, pl.ds(j * q, q), :]
        crow_re[:, :, :] = rows_re[pl.ds(j * q, q), :, :]
        if cplx:
            ccol_im[:, :, :] = cols_im[:, pl.ds(j * q, q), :]
            crow_im[:, :, :] = rows_im[pl.ds(j * q, q), :, :]

        # subtract the in-chunk pending rank-1 slots (previous sites of
        # this chunk): cols[:, b] -= C[:, k] R[k, jb]; rows[b, :] -=
        # C[jb, k] R[k, :]. Slots k >= j*q are still zero.
        def slot_body(k, _):
            for b in range(q):
                jb = b * Ns + i
                ck = (C_re[:, pl.ds(k, 1), :],
                      C_im[:, pl.ds(k, 1), :] if cplx else None)
                rkb = (R_re[pl.ds(k, 1), pl.ds(jb, 1), :],
                       R_im[pl.ds(k, 1), pl.ds(jb, 1), :]
                       if cplx else None)
                pc = _cmul(ck, rkb)                          # (h, 1, WL)
                bs = pl.ds(b, 1)
                ccol_re[:, bs, :] = ccol_re[:, bs, :] - pc[0]
                if cplx:
                    ccol_im[:, bs, :] = ccol_im[:, bs, :] - pc[1]
                cjbk = (C_re[pl.ds(jb, 1), pl.ds(k, 1), :],
                        C_im[pl.ds(jb, 1), pl.ds(k, 1), :]
                        if cplx else None)
                rk = (R_re[pl.ds(k, 1), :, :],
                      R_im[pl.ds(k, 1), :, :] if cplx else None)
                pr = _cmul(cjbk, rk)                         # (1, h, WL)
                crow_re[bs, :, :] = crow_re[bs, :, :] - pr[0]
                if cplx:
                    crow_im[bs, :, :] = crow_im[bs, :, :] - pr[1]
            return ()

        upper = jnp.int32(Kc * q) if _static_slots() \
            else (j * q).astype(jnp.int32)
        jax.lax.fori_loop(jnp.int32(0), upper, slot_body, (),
                          unroll=False)

        # M = 1 - G_II from the corrected column scratch (pl.ds: the row
        # index a*Ns + i is traced)
        M = [[None] * q for _ in range(q)]
        for a in range(q):
            ja = a * Ns + i
            for b in range(q):
                g_re = ccol_re[pl.ds(ja, 1), pl.ds(b, 1), :]
                g_im = ccol_im[pl.ds(ja, 1), pl.ds(b, 1), :] \
                    if cplx else None
                one = 1.0 if a == b else 0.0
                M[a][b] = (one - g_re,
                           None if g_im is None else -g_im)
        A = [[None] * q for _ in range(q)]
        for a in range(q):
            for b in range(q):
                acc = _cmul(D[a][0], M[0][b])
                for k in range(1, q):
                    acc = _cadd(acc, _cmul(D[a][k], M[k][b]))
                if a == b:
                    acc = (acc[0] + 1.0, acc[1])
                A[a][b] = acc
        if q == 2:
            Rdet = _det2(A)
            adj = _adj2(A)
        else:
            Rdet, adj = _det_adj4(A)
        r2 = Rdet[0] * Rdet[0] if Rdet[1] is None \
            else Rdet[0] * Rdet[0] + Rdet[1] * Rdet[1]
        accept = lhs_i < c_det * jnp.log(r2) + live
        gate = accept.astype(dt)

        rs_re = Rdet[0] * gate + (1.0 - gate)
        rs_im = None if Rdet[1] is None else Rdet[1] * gate
        den = rs_re * rs_re if rs_im is None else \
            rs_re * rs_re + rs_im * rs_im
        inv_den = gate / den
        rinv = (rs_re * inv_den,
                None if rs_im is None else -rs_im * inv_den)
        T = [[None] * q for _ in range(q)]
        for a in range(q):
            for b in range(q):
                acc = _cmul(adj[a][0], D[0][b])
                for k in range(1, q):
                    acc = _cadd(acc, _cmul(adj[a][k], D[k][b]))
                T[a][b] = _cmul(acc, rinv)

        # corrected site columns/rows as values
        cols = [(ccol_re[:, b:b + 1, :],
                 ccol_im[:, b:b + 1, :] if cplx else None)
                for b in range(q)]
        for b in range(q):
            jb = b * Ns + i
            # C slot: gate * sum_a col_a T[a][b]  (gate -> rejected slots
            # vanish in every correction and in the flush)
            combo = _cmul(cols[0], T[0][b])
            for a in range(1, q):
                combo = _cadd(combo, _cmul(cols[a], T[a][b]))
            ss = pl.ds(j * q + b, 1)
            C_re[:, ss, :] = combo[0] * gate
            if cplx:
                C_im[:, ss, :] = combo[1] * gate
            # R slot: e_jb - G[jb, :] at the site's start state
            one = (col_iota == jb).astype(dt)                # (1, h, 1)
            R_re[ss, :, :] = one - crow_re[b:b + 1, :, :]
            if cplx:
                R_im[ss, :, :] = -crow_im[b:b + 1, :, :]

        phi_i = phi_ref[pl.ds(i, 1), :, :]
        phi_ref[pl.ds(i, 1), :, :] = phi_i + gate * dphi_i
        acc_ref[...] = acc_ref[...] + gate
        return ()

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(Kc), site_body, (),
                      unroll=False)


def _call_lanes(colr, coli, rowr, rowi, phil, dphil, lhsl, drel, diml,
                nb_arr, i0_arr, *, N, q, opdim, Kc, dtau, c_det, h,
                interpret):
    cplx = coli is not None
    Gp = lhsl.shape[0] // N
    Kq = Kc * q

    def spec(rows, w):
        return pl.BlockSpec((rows, w, WL), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    n_g = 2 if cplx else 1
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ins = ([nb_arr, i0_arr, colr] + ([coli] if cplx else [])
           + [rowr] + ([rowi] if cplx else [])
           + [phil, dphil, lhsl, drel] + ([diml] if cplx else []))
    in_specs = ([smem, smem] + [spec(h, Kq)] * n_g + [spec(Kq, h)] * n_g
                + [spec(N, opdim), spec(N, opdim), spec(N, 1),
                   spec(N * q, q)] + ([spec(N * q, q)] if cplx else []))
    out_shape = tuple(
        [jax.ShapeDtypeStruct((Gp * h, Kq, WL), jnp.float32)] * n_g
        + [jax.ShapeDtypeStruct((Gp * Kq, h, WL), jnp.float32)] * n_g
        + [jax.ShapeDtypeStruct((Gp * N, opdim, WL), jnp.float32),
           jax.ShapeDtypeStruct((Gp, 1, WL), jnp.float32)])
    out_specs = tuple([spec(h, Kq)] * n_g + [spec(Kq, h)] * n_g
                      + [spec(N, opdim), spec(1, 1)])
    # phi aliases its output (carried across the slice's chunk calls)
    phi_in_idx = 2 + 2 * n_g
    phi_out_idx = 2 * n_g
    # order must match _kernel's unpack: ccol re[, im], crow re[, im]
    scratch = ([pltpu.VMEM((h, q, WL), jnp.float32)] * n_g
               + [pltpu.VMEM((q, h, WL), jnp.float32)] * n_g)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, N=N, q=q, opdim=opdim, Kc=Kc,
                              dtau=dtau, c_det=c_det, cplx=cplx, h=h),
            grid=(Gp,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            input_output_aliases={phi_in_idx: phi_out_idx},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*ins)
    return outs


def _to_lanes(x, Gp, rows, w):
    x = x.reshape(Gp, WL, rows, w)
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(Gp * rows, w, WL)


def _from_lanes(x, Gp, rows, w):
    x = x.reshape(Gp, rows, w, WL)
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(Gp * WL, rows, w)


def _prec() -> str:
    """MXU precision of the XLA-side panel corrections and the flush.

    "highest" (default) = bf16x6 passes, full-f32 products. "float32" =
    bf16x3 (~1e-6 relative) — the same class of error the wrapped-G
    drift already carries between stabilizations, and ~2x cheaper; the
    green_dev monitor gates any regression. Trace-time env knob:
    DETQMC_TPU_DELAYED_PREC=float32|highest."""
    return os.environ.get("DETQMC_TPU_DELAYED_PREC", "highest")


def _flush_each() -> bool:
    """Flush G after EVERY chunk instead of deferring to one end-of-
    slice rank-Nq flush with cross-chunk panel corrections.

    FLOP accounting at SDW L=8 (h=256, N=64, q=4, W=128): the deferred
    scheme's cross-chunk panel corrections cost ~sum_c 2h(cKq)(Kq)W
    ~ h (Nq)^2 W MXU flops per slice — several times the flush itself —
    and at precision=highest that is the dominant term (consistent with
    round 4's neutral/negative delayed measurements). Flushing per
    chunk removes the corrections entirely at the price of one full-G
    HBM read+write per chunk; total flush flops are IDENTICAL
    (2 h^2 Nq W per slice either way). Default on; trace-time env knob
    DETQMC_TPU_DELAYED_FLUSH=defer opts back into the single-flush
    scheme for A/B."""
    return os.environ.get("DETQMC_TPU_DELAYED_FLUSH", "each") != "defer"


def _pmm(a, b):
    """Batched (re, im)-pair matmul (w, m, k) @ (w, k, n), f32-accurate
    (precision=highest -> bf16x6 passes on the MXU; see _prec)."""
    mm_ = functools.partial(jnp.einsum, "wmk,wkn->wmn",
                            precision=_prec())
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return mm_(ar, br), None
    return (mm_(ar, br) - mm_(ai, bi), mm_(ar, bi) + mm_(ai, br))


def _col_panel(X, i0, Kc, q, Ns):
    """(w, m, h)-shaped X -> its (w, m, Kc*q) column panel at sites
    [i0, i0+Kc), slots site-major (slot j*q + b <-> column b*Ns + i0+j)."""
    w, m_, h = X.shape
    Xo = X.reshape(w, m_, q, Ns)[:, :, :, i0:i0 + Kc]
    return jnp.transpose(Xo, (0, 1, 3, 2)).reshape(w, m_, Kc * q)


def _row_panel(X, i0, Kc, q, Ns):
    """(w, h, n)-shaped X -> its (w, Kc*q, n) row panel (site-major)."""
    w, h, n_ = X.shape
    Xo = X.reshape(w, q, Ns, n_)[:, :, i0:i0 + Kc, :]
    return jnp.transpose(Xo, (0, 2, 1, 3)).reshape(w, Kc * q, n_)


@functools.lru_cache(maxsize=None)
def _make_slice_update_delayed(N, q, opdim, nb, dtau, c_det, h, cplx,
                               delay, interpret):
    """Build the custom-vmap delayed slice updater (see module
    docstring). Same per-walker contract as pallas_sdw_update's
    _make_slice_update; `delay` = chunk size K in sites."""
    Ns = h // q
    K = max(1, min(delay, N))
    nb_np = nb

    def _batched(gre, gim, phil, phin, lhs, dre, dim_):
        W = lhs.shape[0]
        Gp = -(-W // WL)
        pad = Gp * WL - W
        if pad:
            def padw(x, fill=0.0):
                return jnp.concatenate(
                    [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)],
                    axis=0)

            gre = padw(gre)
            gim = padw(gim) if cplx else None
            phil, phin, dre = padw(phil), padw(phin), padw(dre)
            dim_ = padw(dim_) if cplx else None
            lhs = padw(lhs, jnp.inf)   # inert: +inf lhs never accepts
        Wp = Gp * WL

        f32 = jnp.float32
        gre32 = gre.astype(f32)
        gim32 = gim.astype(f32) if cplx else None
        dphi = phin - phil
        phil_l = _to_lanes(phil.astype(f32), Gp, N, opdim)
        dphil = _to_lanes(dphi.astype(f32), Gp, N, opdim)
        lhsl = _to_lanes(lhs.astype(f32)[:, :, None], Gp, N, 1)
        drel = _to_lanes(dre.astype(f32).reshape(-1, N * q, q),
                         Gp, N * q, q)
        diml = _to_lanes(dim_.astype(f32).reshape(-1, N * q, q),
                         Gp, N * q, q) if cplx else None
        nb_arr = jnp.asarray(nb_np, jnp.int32)

        flush_each = _flush_each()
        Ccat = None   # (Wp, h, kq_done) pair — previous chunks' buffers
        Rcat = None   # (Wp, kq_done, h) pair
        acc_total = jnp.zeros((Wp,), f32)
        i0 = 0
        while i0 < N:
            Kc = min(K, N - i0)
            colp = (_col_panel(gre32, i0, Kc, q, Ns),
                    _col_panel(gim32, i0, Kc, q, Ns) if cplx else None)
            rowp = (_row_panel(gre32, i0, Kc, q, Ns),
                    _row_panel(gim32, i0, Kc, q, Ns) if cplx else None)
            if Ccat is not None:
                # correct the panels for previous chunks' pending rank-1
                # slots: cols -= C R[:, J]; rows -= C[J, :] R
                Rsel = (_col_panel(Rcat[0], i0, Kc, q, Ns),
                        _col_panel(Rcat[1], i0, Kc, q, Ns)
                        if cplx else None)
                Csel = (_row_panel(Ccat[0], i0, Kc, q, Ns),
                        _row_panel(Ccat[1], i0, Kc, q, Ns)
                        if cplx else None)
                dc = _pmm(Ccat, Rsel)
                dr = _pmm(Csel, Rcat)
                colp = (colp[0] - dc[0],
                        colp[1] - dc[1] if cplx else None)
                rowp = (rowp[0] - dr[0],
                        rowp[1] - dr[1] if cplx else None)
            Kq = Kc * q
            colr_l = _to_lanes(colp[0], Gp, h, Kq)
            coli_l = _to_lanes(colp[1], Gp, h, Kq) if cplx else None
            rowr_l = _to_lanes(rowp[0], Gp, Kq, h)
            rowi_l = _to_lanes(rowp[1], Gp, Kq, h) if cplx else None
            i0_arr = jnp.asarray([i0], jnp.int32)
            outs = _call_lanes(colr_l, coli_l, rowr_l, rowi_l, phil_l,
                               dphil, lhsl, drel, diml, nb_arr, i0_arr,
                               N=N, q=q, opdim=opdim, Kc=Kc, dtau=dtau,
                               c_det=c_det, h=h, interpret=interpret)
            k = 0
            C_c = [_from_lanes(outs[k], Gp, h, Kq)]
            k += 1
            if cplx:
                C_c.append(_from_lanes(outs[k], Gp, h, Kq))
                k += 1
            R_c = [_from_lanes(outs[k], Gp, Kq, h)]
            k += 1
            if cplx:
                R_c.append(_from_lanes(outs[k], Gp, Kq, h))
                k += 1
            phil_l = outs[k]
            acc_total = acc_total + outs[k + 1].reshape(Wp)
            Cp = (C_c[0], C_c[1] if cplx else None)
            Rp = (R_c[0], R_c[1] if cplx else None)
            if flush_each:
                # immediate rank-Kq MXU flush: G stays current, so the
                # next chunk's panels need no corrections (see
                # _flush_each)
                fl = _pmm(Cp, Rp)
                gre32 = gre32 - fl[0]
                if cplx:
                    gim32 = gim32 - fl[1]
            elif Ccat is None:
                Ccat, Rcat = Cp, Rp
            else:
                Ccat = (jnp.concatenate([Ccat[0], C_c[0]], axis=2),
                        jnp.concatenate([Ccat[1], C_c[1]], axis=2)
                        if cplx else None)
                Rcat = (jnp.concatenate([Rcat[0], R_c[0]], axis=1),
                        jnp.concatenate([Rcat[1], R_c[1]], axis=1)
                        if cplx else None)
            i0 += Kc

        # deferred mode: one rank-Nq MXU flush for the whole slice
        if not flush_each:
            fl = _pmm(Ccat, Rcat)
            gre32 = gre32 - fl[0]
            if cplx:
                gim32 = gim32 - fl[1]
        gre_o = gre32[:W]
        gim_o = gim32[:W] if cplx else None
        phi_o = _from_lanes(phil_l, Gp, N, opdim)[:W]
        acc = acc_total[:W]
        if cplx:
            return gre_o, gim_o, phi_o, acc
        return gre_o, phi_o, acc

    if cplx:
        @jax.custom_batching.custom_vmap
        def update(gre, gim, phil, phin, lhs, dre, dim_):
            outs = _batched(gre[None], gim[None], phil[None], phin[None],
                            lhs[None], dre[None], dim_[None])
            return tuple(o[0] for o in outs)

        @update.def_vmap
        def _rule(axis_size, in_batched, *args):
            def bcast(x, b):
                return x if b else jnp.broadcast_to(
                    x[None], (axis_size, *x.shape))

            args = [bcast(x, b) for x, b in zip(args, in_batched)]
            return _batched(*args), (True,) * 4
    else:
        @jax.custom_batching.custom_vmap
        def update(gre, phil, phin, lhs, dre):
            outs = _batched(gre[None], None, phil[None], phin[None],
                            lhs[None], dre[None], None)
            return tuple(o[0] for o in outs)

        @update.def_vmap
        def _rule(axis_size, in_batched, *args):
            def bcast(x, b):
                return x if b else jnp.broadcast_to(
                    x[None], (axis_size, *x.shape))

            gre, phil, phin, lhs, dre = [
                bcast(x, b) for x, b in zip(args, in_batched)]
            return _batched(gre, None, phil, phin, lhs, dre, None), \
                (True,) * 3

    return update


def slice_update_sdw_delayed(gre, gim, phi_l, phi_new, lhs, delta_re,
                             delta_im, *, nb, dtau: float, c_det: float,
                             delay: int, interpret: bool = False):
    """Delayed-chunk fused SDW slice update (see module docstring).

    Same contract as pallas_sdw_update.slice_update_sdw, plus ``delay``
    = chunk size K (sites buffered between MXU flush points).
    """
    N, opdim = phi_l.shape[-2], phi_l.shape[-1]
    q = delta_re.shape[-1]
    h = gre.shape[-1]
    cplx = gim is not None
    fn = _make_slice_update_delayed(
        N, q, opdim, tuple(map(tuple, nb)), float(dtau), float(c_det),
        h, cplx, int(delay), bool(interpret))
    if cplx:
        return fn(gre, gim, phi_l, phi_new, lhs, delta_re, delta_im)
    gre_o, phi_o, acc = fn(gre, phi_l, phi_new, lhs, delta_re)
    return gre_o, None, phi_o, acc
