"""Lane-batched fused SDW slice update: walkers in the lane axis.

The SDW per-site Metropolis scan (reference: DetSDW::updateInSlice,
SURVEY.md §3 "SDW model") is the model's hot loop: N sequential sites per
slice, each an O(1) small-block determinant ratio plus a rank-q Woodbury
update of G. The lax.scan path dispatches ~m*N tiny XLA ops per sweep and
is latency-bound (~174 us/site through the device tunnel); this kernel
runs the whole slice for 128 walkers in one Pallas program, every
per-site quantity a (1, 1, 128) per-lane vector — the SDW analogue of
pallas_update_lanes.

TPU-native design decisions:

- NATIVE COMPLEX in (re, im) f32 pairs. The model's TPU representation is
  the real embedding rho(G) = [[Re G, -Im G], [Im G, Re G]] (the axon
  backend has no complex ops); operating on the (Re, Im) quadrants
  directly halves both arithmetic and VMEM versus the embedded form, and
  the q x q block determinant/adjugate are closed-form complex scalar
  expressions (q = 2 for the reduced opdim <= 2 sectors, q = 4 for full
  opdim 3) — no LU, no solve, branch-free.
- EVERYTHING PRECOMPUTABLE IS PRECOMPUTED outside (batched XLA ops):
  each site is visited exactly once per slice, so proposals phi_new, the
  Delta = e^{-dtau V(new)} e^{+dtau V(old)} - 1 blocks, and the static
  part of the boson-action difference depend only on the PRE-scan field
  and are built for all sites at once. The only live inputs are G itself
  and the spatial-gradient term through already-updated neighbors, which
  enters as dtau * dphi_i . sum_d phi[nb_d] — four row loads per site.
- The accept test runs in the log domain (lhs = log u01 - jac +
  dS_static precomputed; rhs = c_det * log|R|^2 + live gradient term), so
  the kernel needs one log and zero exp per site.
- The site loop is unrolled (neighbor indices and block offsets become
  static slices); G quadrants are input/output aliased so L = 8 (h = 256)
  fits VMEM.

Weight conventions (matching models/sdw.update_slice): reduced sectors
accept on |R_A|^2 (conjugate sector B contributes conj R_A) -> c_det = 1;
the full 4x4 complex block accepts on |R| (real non-negative by the
model's antiunitary symmetry) -> c_det = 1/2; opdim = 1 is the real
q = 2 case with weight R^2 -> c_det = 1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WL = 128  # walkers per grid step (lane width)


def _profile_skip() -> str:
    """PROFILING-ONLY knob (breaks the physics; never set in production):
    DETQMC_TPU_SDW_PROFILE=noupdate skips the per-site rank-q G
    read-modify-write, =nodet replaces the det/adjugate accept chain with
    an always-reject gate. Used by scripts/phase_sdw8b.py to attribute
    the update phase's per-site cost on chip (trace-time read)."""
    return os.environ.get("DETQMC_TPU_SDW_PROFILE", "")


# ---- branch-free complex scalar helpers ((re, im) pairs; im None = real) ----
def _cmul(a, b):
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return (ar * br, None)
    if ai is None:
        return (ar * br, ar * bi)
    if bi is None:
        return (ar * br, ai * br)
    return (ar * br - ai * bi, ar * bi + ai * br)


def _cadd(a, b):
    ar, ai = a
    br, bi = b
    if ai is None and bi is None:
        return (ar + br, None)
    if ai is None:
        return (ar + br, bi)
    if bi is None:
        return (ar + br, ai)
    return (ar + br, ai + bi)


def _csub(a, b):
    return _cadd(a, _cneg(b))


def _cneg(a):
    ar, ai = a
    return (-ar, None if ai is None else -ai)


def _det2(A):
    return _csub(_cmul(A[0][0], A[1][1]), _cmul(A[0][1], A[1][0]))


def _adj2(A):
    return [[A[1][1], _cneg(A[0][1])],
            [_cneg(A[1][0]), A[0][0]]]


def _det_adj4(A):
    """Closed-form det + adjugate of a complex 4x4 via the 12 2x2 minors
    (the standard row-pair Laplace scheme): ~30 + 48 complex mults,
    branch-free, no divisions."""
    a = A
    s0 = _det2([[a[0][0], a[0][1]], [a[1][0], a[1][1]]])
    s1 = _det2([[a[0][0], a[0][2]], [a[1][0], a[1][2]]])
    s2 = _det2([[a[0][0], a[0][3]], [a[1][0], a[1][3]]])
    s3 = _det2([[a[0][1], a[0][2]], [a[1][1], a[1][2]]])
    s4 = _det2([[a[0][1], a[0][3]], [a[1][1], a[1][3]]])
    s5 = _det2([[a[0][2], a[0][3]], [a[1][2], a[1][3]]])
    c5 = _det2([[a[2][2], a[2][3]], [a[3][2], a[3][3]]])
    c4 = _det2([[a[2][1], a[2][3]], [a[3][1], a[3][3]]])
    c3 = _det2([[a[2][1], a[2][2]], [a[3][1], a[3][2]]])
    c2 = _det2([[a[2][0], a[2][3]], [a[3][0], a[3][3]]])
    c1 = _det2([[a[2][0], a[2][2]], [a[3][0], a[3][2]]])
    c0 = _det2([[a[2][0], a[2][1]], [a[3][0], a[3][1]]])
    det = _cadd(
        _cadd(_csub(_cmul(s0, c5), _cmul(s1, c4)), _cmul(s2, c3)),
        _cadd(_csub(_cmul(s3, c2), _cmul(s4, c1)), _cmul(s5, c0)))

    def alt3(p, x, q_, y, r_, z, neg):
        """+- (p x - q y + r z): every adjugate entry has this shape with
        a checkerboard overall sign."""
        t = _cadd(_csub(_cmul(p, x), _cmul(q_, y)), _cmul(r_, z))
        return _cneg(t) if neg else t

    b = [[None] * 4 for _ in range(4)]
    b[0][0] = alt3(a[1][1], c5, a[1][2], c4, a[1][3], c3, False)
    b[0][1] = alt3(a[0][1], c5, a[0][2], c4, a[0][3], c3, True)
    b[0][2] = alt3(a[3][1], s5, a[3][2], s4, a[3][3], s3, False)
    b[0][3] = alt3(a[2][1], s5, a[2][2], s4, a[2][3], s3, True)
    b[1][0] = alt3(a[1][0], c5, a[1][2], c2, a[1][3], c1, True)
    b[1][1] = alt3(a[0][0], c5, a[0][2], c2, a[0][3], c1, False)
    b[1][2] = alt3(a[3][0], s5, a[3][2], s2, a[3][3], s1, True)
    b[1][3] = alt3(a[2][0], s5, a[2][2], s2, a[2][3], s1, False)
    b[2][0] = alt3(a[1][0], c4, a[1][1], c2, a[1][3], c0, False)
    b[2][1] = alt3(a[0][0], c4, a[0][1], c2, a[0][3], c0, True)
    b[2][2] = alt3(a[3][0], s4, a[3][1], s2, a[3][3], s0, False)
    b[2][3] = alt3(a[2][0], s4, a[2][1], s2, a[2][3], s0, True)
    b[3][0] = alt3(a[1][0], c3, a[1][1], c1, a[1][2], c0, True)
    b[3][1] = alt3(a[0][0], c3, a[0][1], c1, a[0][2], c0, False)
    b[3][2] = alt3(a[3][0], s3, a[3][1], s1, a[3][2], s0, True)
    b[3][3] = alt3(a[2][0], s3, a[2][1], s1, a[2][2], s0, False)
    return det, b


def _kernel(*refs, N, q, opdim, nb, dtau, c_det, cplx, h, unroll, big):
    it = iter(refs)
    nb_ref = None if unroll else next(it)      # (N, 4) int32 in SMEM
    gre_in = next(it)
    gim_in = next(it) if cplx else None
    phi_in, dphi_ref, lhs_ref = next(it), next(it), next(it)
    dre_ref = next(it)
    dim_ref = next(it) if cplx else None
    gre_out = next(it)
    gim_out = next(it) if cplx else None
    phi_ref = next(it)
    acc_ref = next(it)
    if big:
        # large h: the (h, h, WL) G planes stay in HBM (ANY) and are
        # DMA'd into scratch once per grid step — VMEM block specs would
        # double-buffer ~4x h^2*WL*4B past the 128 MB chip budget
        n_g = 2 if cplx else 1
        bufs = [next(it) for _ in range(n_g)]
        sems = [next(it) for _ in range(n_g)]
        gre = bufs[0]
        gim = bufs[1] if cplx else None
        g = pl.program_id(0)
        dma_r = pltpu.make_async_copy(
            gre_in.at[pl.ds(g * h, h)], gre, sems[0])
        dma_r.start()
        if cplx:
            dma_i = pltpu.make_async_copy(
                gim_in.at[pl.ds(g * h, h)], gim, sems[1])
            dma_i.start()
            dma_i.wait()
        dma_r.wait()
    else:
        gre = gre_out
        gim = gim_out
        gre[...] = gre_in[...]
        if cplx:
            gim[...] = gim_in[...]
    phi_ref[...] = phi_in[...]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    Ns = h // q
    dt = jnp.float32

    def site_body(i, nb_i):
        lhs_i = lhs_ref[pl.ds(i, 1), :, :]                  # (1, 1, WL)
        dphi_i = dphi_ref[pl.ds(i, 1), :, :]                # (1, op, WL)
        # live spatial-gradient term through already-updated neighbors
        snb = phi_ref[pl.ds(nb_i[0], 1), :, :]
        for d in range(1, 4):
            snb = snb + phi_ref[pl.ds(nb_i[d], 1), :, :]
        live = dtau * jnp.sum(dphi_i * snb, axis=1, keepdims=True)

        dre = dre_ref[pl.ds(i * q, q), :, :]                # (q, q, WL)
        dim_ = dim_ref[pl.ds(i * q, q), :, :] if cplx else None
        D = [[(dre[a:a + 1, b:b + 1, :],
               dim_[a:a + 1, b:b + 1, :] if cplx else None)
              for b in range(q)] for a in range(q)]

        # current G columns at the site's orbital indices (o*Ns + i)
        cols = []
        for b in range(q):
            j = b * Ns + i
            cre = gre[:, pl.ds(j, 1), :]                    # (h, 1, WL)
            cim = gim[:, pl.ds(j, 1), :] if cplx else None
            cols.append((cre, cim))
        # M = 1 - G_II. Unrolled mode: static slices of the loaded
        # columns. Rolled mode: Mosaic has no dynamic_slice on VALUES, so
        # the scalars come straight off the G refs with pl.ds on both
        # dims (cols were read before any write this site — same values).
        if _profile_skip() == "nodet":
            # profiling only: skip the det/adjugate accept chain; a
            # runtime-dependent tiny T (not constant-foldable) keeps the
            # rank-q G update executing, gate = 0 keeps phi/acc inert
            t0 = 0.01 * dphi_i[:, 0:1, :]
            T = [[(t0, t0 if cplx else None) for _ in range(q)]
                 for _ in range(q)]
            gate = jnp.zeros_like(lhs_i)
        else:
            M = [[None] * q for _ in range(q)]
            for a in range(q):
                ja = a * Ns + i
                for b in range(q):
                    if isinstance(i, int):
                        g_re = cols[b][0][ja:ja + 1, :, :]
                        g_im = cols[b][1][ja:ja + 1, :, :] \
                            if cplx else None
                    else:
                        jb = b * Ns + i
                        g_re = gre[pl.ds(ja, 1), pl.ds(jb, 1), :]
                        g_im = gim[pl.ds(ja, 1), pl.ds(jb, 1), :] \
                            if cplx else None
                    one = 1.0 if a == b else 0.0
                    M[a][b] = (one - g_re,
                               None if g_im is None else -g_im)
            # A = 1 + Delta (1 - G_II)
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
                R = _det2(A)
                adj = _adj2(A)
            else:
                R, adj = _det_adj4(A)
            r2 = R[0] * R[0] if R[1] is None \
                else R[0] * R[0] + R[1] * R[1]
            accept = lhs_i < c_det * jnp.log(r2) + live
            gate = accept.astype(dt)

            # T = gate * adj(A) Delta / R  (division gated: R_safe = 1
            # when rejected, so a tiny rejected R never produces inf * 0)
            rs_re = R[0] * gate + (1.0 - gate)
            rs_im = None if R[1] is None else R[1] * gate
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

        # rows: e_j - G[j, :]  (read BEFORE the update below)
        rows = []
        for b in range(q):
            jb = b * Ns + i
            one = (col_iota == jb).astype(dt)                # (1, h, 1)
            rre = one - gre[pl.ds(jb, 1), :, :]
            rim = -gim[pl.ds(jb, 1), :, :] if cplx else None
            rows.append((rre, rim))
        # G -= sum_b (sum_a col_a T[a][b]) (x) row_b. The outer product is
        # an (h, h, WL) value; at h = 256 a single full-array expression
        # costs 32 MB of live vector registers and the Mosaic register
        # allocator spills ~224 MB (measured; still 115 MB when chunked
        # at 128 rows — the q complex product temporaries stack up).
        # Chunk the update over small row blocks: each chunk keeps one
        # (rb, h, WL) accumulator pair plus one term's products live
        # (~20 MB at rb = 32, h = 256) while G is still read-modified-
        # written exactly once.
        combos = []
        for b in range(q):
            combo = _cmul(cols[0], T[0][b])
            for a in range(1, q):
                combo = _cadd(combo, _cmul(cols[a], T[a][b]))
            combos.append(combo)                            # (h, 1, WL)
        rb = h if h <= 128 else 32
        row_range = () if _profile_skip() == "noupdate" else \
            range(0, h, rb)
        for r0 in row_range:
            cw_ = min(rb, h - r0)      # tail chunk when h % rb != 0
            upd_re = None
            upd_im = None
            for b in range(q):
                cchunk = (combos[b][0][r0:r0 + cw_],
                          None if combos[b][1] is None
                          else combos[b][1][r0:r0 + cw_])
                term_re, term_im = _cmul(cchunk, rows[b])
                upd_re = term_re if upd_re is None else upd_re + term_re
                if cplx:
                    upd_im = term_im if upd_im is None \
                        else upd_im + term_im
            rs_ = pl.ds(r0, cw_)
            gre[rs_, :, :] = gre[rs_, :, :] - upd_re
            if cplx:
                gim[rs_, :, :] = gim[rs_, :, :] - upd_im

        phi_i = phi_ref[pl.ds(i, 1), :, :]
        phi_ref[pl.ds(i, 1), :, :] = phi_i + gate * dphi_i
        acc_ref[...] = acc_ref[...] + gate

    if unroll:
        # small N: static neighbor indices -> static slices everywhere
        for i in range(N):
            site_body(i, nb[i])
    else:
        # large N: one rolled loop (Mosaic compile time scales with code
        # size; the unrolled 64-site body never finished compiling);
        # neighbor indices come from the SMEM table
        def loop_body(i, _):
            site_body(i, tuple(nb_ref[i, d] for d in range(4)))
            return ()

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(N), loop_body, (),
                          unroll=False)

    if big:
        dma_r = pltpu.make_async_copy(
            gre, gre_out.at[pl.ds(g * h, h)], sems[0])
        dma_r.start()
        if cplx:
            dma_i = pltpu.make_async_copy(
                gim, gim_out.at[pl.ds(g * h, h)], sems[1])
            dma_i.start()
            dma_i.wait()
        dma_r.wait()


def _call_lanes(gre, gim, phil, dphil, lhsl, drel, diml, nb_arr, *, N, q,
                opdim, nb, dtau, c_det, h, unroll, interpret):
    cplx = gim is not None
    Gp = lhsl.shape[0] // N

    def spec(rows, w):
        return pl.BlockSpec((rows, w, WL), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    big = h > 128
    n_g = 2 if cplx else 1
    g_spec = (pl.BlockSpec(memory_space=pl.ANY) if big
              else spec(h, h))
    ins = [gre] + ([gim] if cplx else []) + [phil, dphil, lhsl, drel] \
        + ([diml] if cplx else [])
    in_specs = [g_spec] * n_g + [
        spec(N, opdim), spec(N, opdim), spec(N, 1), spec(N * q, q)] \
        + ([spec(N * q, q)] if cplx else [])
    if not unroll:
        ins = [nb_arr] + ins
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    out_shape = tuple(
        [jax.ShapeDtypeStruct((Gp * h, h, WL), jnp.float32)]
        * (2 if cplx else 1)
        + [jax.ShapeDtypeStruct((Gp * N, opdim, WL), jnp.float32),
           jax.ShapeDtypeStruct((Gp, 1, WL), jnp.float32)])
    out_specs = tuple([g_spec] * n_g + [spec(N, opdim), spec(1, 1)])
    # G quadrants + phi alias onto their outputs: halves VMEM/HBM footprint
    # (L = 8 full-opdim quadrants are 33 MB each) and skips a copy
    off = 0 if unroll else 1   # rolled variant prepends the SMEM nb table
    aliases = {k + off: k for k in range(n_g + 1)}  # G planes + phi
    scratch = []
    if big:
        scratch = ([pltpu.VMEM((h, h, WL), jnp.float32)] * n_g
                   + [pltpu.SemaphoreType.DMA] * n_g)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kernel, N=N, q=q, opdim=opdim, nb=nb,
                              dtau=dtau, c_det=c_det, cplx=cplx, h=h,
                              unroll=unroll, big=big),
            grid=(Gp,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            input_output_aliases=aliases,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(120 if big else 100) * 1024 * 1024),
            interpret=interpret,
        )(*ins)
    return outs


@functools.lru_cache(maxsize=None)
def _make_slice_update(N, q, opdim, nb, dtau, c_det, h, cplx, interpret):
    """Build the custom-vmap slice updater for one static configuration.

    Contract per walker (complex variant): f(g_re (h,h), g_im (h,h),
    phi_l (N,opdim), phi_new (N,opdim), lhs (N,), delta_re (N,q,q),
    delta_im (N,q,q)) -> (g_re', g_im', phi_l', acc_count); the real
    variant drops the im operands/outputs. vmap flattens the walker batch
    into 128-lane groups.
    """

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

        def to_lanes(x, rows, w):
            x = x.reshape(Gp, WL, rows, w)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(
                Gp * rows, w, WL)

        dphi = phin - phil
        grel = to_lanes(gre, h, h)
        giml = to_lanes(gim, h, h) if cplx else None
        phil_l = to_lanes(phil, N, opdim)
        dphil = to_lanes(dphi, N, opdim)
        lhsl = to_lanes(lhs[:, :, None], N, 1)
        drel = to_lanes(dre.reshape(-1, N * q, q), N * q, q)
        diml = to_lanes(dim_.reshape(-1, N * q, q), N * q, q) \
            if cplx else None
        unroll = N <= 16
        nb_arr = jnp.asarray(nb, jnp.int32)
        outs = _call_lanes(grel, giml, phil_l, dphil, lhsl, drel, diml,
                           nb_arr, N=N, q=q, opdim=opdim, nb=nb,
                           dtau=dtau, c_det=c_det, h=h, unroll=unroll,
                           interpret=interpret)

        def from_lanes(x, rows, w):
            x = x.reshape(Gp, rows, w, WL)
            return jnp.transpose(x, (0, 3, 1, 2)).reshape(
                Gp * WL, rows, w)

        k = 0
        gre_o = from_lanes(outs[k], h, h)[:W]
        k += 1
        if cplx:
            gim_o = from_lanes(outs[k], h, h)[:W]
            k += 1
        else:
            gim_o = None
        phi_o = from_lanes(outs[k], N, opdim)[:W]
        acc = outs[k + 1].reshape(Gp * WL)[:W]
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


def slice_update_sdw(gre, gim, phi_l, phi_new, lhs, delta_re, delta_im,
                     *, nb, dtau: float, c_det: float,
                     interpret: bool = False):
    """Fused SDW slice update (see module docstring).

    gre/gim: (h, h) native-complex Green quadrants (gim None => real
    opdim-1 case); phi_l/phi_new: (N, opdim); lhs: (N,) precomputed
    log-domain accept threshold; delta_re/im: (N, q, q). nb: tuple of
    4-tuples of neighbor site indices. Returns (gre', gim', phi_l',
    accept_count) — gim' omitted in the real variant. All leading axes
    vmap over walkers.
    """
    N, opdim = phi_l.shape[-2], phi_l.shape[-1]
    q = delta_re.shape[-1]
    h = gre.shape[-1]
    cplx = gim is not None
    fn = _make_slice_update(N, q, opdim, tuple(map(tuple, nb)),
                            float(dtau), float(c_det), h, cplx,
                            bool(interpret))
    if cplx:
        return fn(gre, gim, phi_l, phi_new, lhs, delta_re, delta_im)
    gre_o, phi_o, acc = fn(gre, phi_l, phi_new, lhs, delta_re)
    return gre_o, None, phi_o, acc
