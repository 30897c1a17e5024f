"""Ozaki-scheme f64 matmul on the MXU: exact bf16 limb products.

XLA emulates an f64 matmul on TPU with double-word VPU arithmetic
(~2.9 ms for a (256, 64, 64) batch — the stabilization pipeline's V·V^H
and V-compose products spend ~200 ms/sweep-pair there at the headline
bench config). This module computes the same product to ~2^-48 relative
accuracy out of bf16 MXU matmuls whose accumulations are EXACT by
construction (Ozaki et al.'s error-free splitting):

1. scale: rows of A (columns of B) are scaled by the power of two just
   above their max |element|, making every element a signed fraction in
   [-1, 1]; powers of two are exact, the scales come back out at the end.
2. split: each scaled element is cut into `L` limbs of `s` significant
   bits aligned to the fixed grid 2^{-s(t+1)} — each limb is an integer
   multiple of its grid step with at most s bits, hence EXACTLY
   representable in bf16 (8 significand bits, s <= 8).
3. multiply: for limb pair (t, u), the products are integers times the
   fixed per-(i, j) scale 2^{e_i + f_j - s(t+u+2)} with at most 2s bits;
   summing k of them stays below 2^{2s + ceil(log2 k)} <= 2^24, so the
   MXU's f32 accumulation is EXACT — each bf16 matmul is error-free.
4. combine: partial products with the same t+u share magnitude level and
   add exactly in f32; the <= L level sums combine with compensated
   (TwoSum) f32 arithmetic, preserving ~2^-48 — only the final cast back
   to f64 touches emulated-f64 ops (one add per element).

Limb width: s = min(8, floor((24 - ceil(log2 k)) / 2)); L chosen so
L*s >= 48. For k <= 256: s = 8, L = 6, and limb pairs t+u <= L-1 give 21
bf16 matmuls (~0.03 ms each on the MXU) — ~2-3x faster than emulation,
with accuracy ~2^-48 relative to row/column norms (the same class as a
true f64 matmul's backward error).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from detqmc_tpu.linalg import df32


def _pow2_above(x, tiny):
    """Smallest power of two >= x (elementwise), clamped away from 0.

    The exponent is clipped to the f32-representable range: the TPU's
    emulated-f64 exp2 bottoms out at 2^-126 (measured: exp2(-300) == 0),
    so an unclamped scale for an all-zero row/column (e.g. the imaginary
    plane of an identity pair matrix) NaN-poisons the whole product.
    Rows with |max| in [2^-126, 2^127] — everything the stabilized chain
    produces — are normalized exactly as before."""
    e = jnp.ceil(jnp.log2(jnp.maximum(x, tiny)))
    return jnp.exp2(jnp.clip(e, -126.0, 127.0))


def matmul_f64(A: jax.Array, B: jax.Array, limbs: int | None = None
               ) -> jax.Array:
    """A @ B for f64 inputs (..., m, k) x (..., k, n) -> f64, computed
    from exact bf16 MXU limb products (~2^-48 relative accuracy)."""
    assert A.dtype == jnp.float64 and B.dtype == jnp.float64
    k = A.shape[-1]
    if k >= 2 ** 20:
        # s degrades as k grows (exactness needs 2s + log2(k) <= 24); by
        # k ~ 2^22 the limb count explodes and at 2^24 s hits 0 — far
        # beyond any DQMC contraction. Fail loudly instead of silently
        # emitting hundreds of matmuls.
        raise ValueError(
            f"ozaki.matmul_f64: contraction dim k={k} unsupported "
            "(needs k < 2^20 for exact bf16 limb accumulation); use the "
            "emulated-f64 path")
    s = min(8, (24 - max(1, math.ceil(math.log2(max(k, 2))))) // 2)
    L = limbs if limbs is not None else -(-48 // s)
    tiny = jnp.float64(2.0 ** -126)

    sa = _pow2_above(jnp.max(jnp.abs(A), axis=-1, keepdims=True), tiny)
    sb = _pow2_above(jnp.max(jnp.abs(B), axis=-2, keepdims=True), tiny)

    def split_classic(x, sx):
        """s-bit limb slices extracted in f64 arithmetic (exact to any
        L). On TPU every round/div/sub here is an emulated-f64 pass —
        ~90% of this function's measured wall time (scripts/
        ozaki_anatomy.py) — so it is only used past the pair-split's
        precision range."""
        out = []
        r = x / sx                                # |r| <= 1, rows scaled
        for t in range(L):
            step = jnp.float64(2.0 ** (-s * (t + 1)))
            limb = jnp.round(r / step) * step     # s-bit slice, exact
            r = r - limb
            out.append(limb.astype(jnp.bfloat16))  # exact: <= s <= 8 bits
        return out

    def split_pair(x, sx):
        """Same limb slices, but extracted in pure f32 from the float
        pair (hi, lo) = (f32(x), f32(x - hi)) — two cheap casts + one
        f64 subtract instead of ~4L emulated-f64 passes.

        Exactness: sx is a power of two, so hi/s32 and the Dekker-style
        round/subtract chain are exact in f32 (round-to-nearest, step a
        power of two). When s divides 24, the first 24/s limbs consume
        hi exactly, the remainder is 0 at the lo fold-in, and the single
        f32 add rounds at ~2^-49 relative to the row scale — below the
        L*s-bit truncation this path is gated to (L*s <= 40), so
        accuracy matches the classic split (tests/test_ozaki.py
        pair-vs-classic parity at k=96/512). When s does NOT divide 24
        (s=7), the fold-in misaligns with the grid and the limbs
        overflow bf16 — auto excludes that case (see routing below)."""
        s32 = sx.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        lo = (x - x32.astype(jnp.float64)).astype(jnp.float32) / s32
        r = x32 / s32
        nb = -(-24 // s)                          # limbs covered by hi
        out = []
        for t in range(L):
            step = jnp.float32(2.0 ** (-s * (t + 1)))
            limb = jnp.round(r / step) * step
            r = r - limb
            if t + 1 == nb:
                r = r + lo
            out.append(limb.astype(jnp.bfloat16))
        return out

    # the pair split serves the hot chain/residual tiers (L*s <= 40
    # bits: chain 4-5, residual 5 at s=8). Full-accuracy products
    # (default 6 limbs = 48 bits) keep the exact f64 extraction: at 48
    # bits the pair's own ~2^-49 fold-in rounding would sit exactly at
    # the truncation floor and measurably shift it (test_ozaki green
    # floor checks). The pair split is only exact when the hi word's 24
    # mantissa bits land on the s-bit limb grid, i.e. s | 24 (s = 8, 6,
    # 4, ...): at s = 7 (k in 257..1024) the lo fold-in happens after
    # nb = 4 limbs have consumed 28 grid bits, the ~2^-25 residual
    # overflows the grid step and limb integers exceed bf16's 8 bits —
    # measured 1.9-3.4x worse than classic at the capped tiers
    # (ADVICE r4) — so auto excludes it. Auto also excludes the 4-limb
    # tier even at s=8: measured 1.5x worse than classic there (k=96
    # limbs=4: 7.7e-10 vs 5.1e-10) — enough to shift the refined-G
    # chain-tier floor on graded chains (test_chain_limbs_green_floor)
    # — while the 5-limb residual tier is equivalent (0.8-1.0x). So
    # auto-pair requires L*s in (32, 40] on an s | 24 grid; `pair`
    # forces it everywhere for A/B.
    mode = os.environ.get("DETQMC_TPU_OZAKI_SPLIT", "auto")
    if mode not in ("auto", "pair", "classic"):
        raise ValueError(
            f"DETQMC_TPU_OZAKI_SPLIT={mode!r}: expected auto|pair|classic")
    use_pair = (mode == "pair") or (
        mode == "auto" and 32 < L * s <= 40 and s * (-(-24 // s)) == 24)
    split = split_pair if use_pair else split_classic

    Als = split(A, sa)
    Bls = split(B, sb)

    # each bf16 matmul is exact; combining them is where rounding could
    # re-enter, so every add is a compensated (TwoSum) f32-pair add —
    # partials joined in ascending t+u (descending magnitude)
    acc = None
    for c in range(L):
        for t in range(c + 1):
            u = c - t
            p = jax.lax.dot_general(
                Als[t], Bls[u],
                ((((Als[t].ndim - 1),), ((Bls[u].ndim - 2),)),
                 (tuple(range(Als[t].ndim - 2)),
                  tuple(range(Bls[u].ndim - 2)))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = df32.df(p) if acc is None else df32.add(acc, df32.df(p))
    out = acc[0].astype(jnp.float64) + acc[1].astype(jnp.float64)
    return out * sa * sb


def _use_ozaki() -> bool:
    # escape hatch for debugging accuracy regressions: the Ozaki path is
    # ~2^-44..2^-48 relative-to-norm vs emulated-f64's ~2^-53; set
    # DETQMC_TPU_NO_OZAKI=1 to force the exact emulated path. Checked per
    # call (cheap) so tests can flip it mid-process.
    import os

    if os.environ.get("DETQMC_TPU_NO_OZAKI"):
        return False
    return jax.default_backend() == "tpu"


def mm_f64(A: jax.Array, B: jax.Array, limbs: int | None = None
           ) -> jax.Array:
    """f64 matmul on the fastest valid path: Ozaki bf16-limb MXU products
    on TPU, a plain HIGHEST-precision dot elsewhere (or when
    DETQMC_TPU_NO_OZAKI is set). `limbs` caps the limb count (accuracy
    ~2^{-8*limbs} relative to row/col norms at s=8) for consumers that
    need less than the full ~2^-48 — e.g. Newton-refinement residuals."""
    if A.dtype == jnp.float64 and B.dtype == jnp.float64 and _use_ozaki():
        return matmul_f64(A, B, limbs=limbs)
    from detqmc_tpu.precision import mm

    return mm(A, B)


def chain_limbs(requested: int | None = None) -> int:
    """Limb count for the structural f64 chain products: the UdV V-chain
    accumulation (udv.udv_refactor / cudv counterpart) and the V1 V2^H
    cross product of the range-split green inner matrix.

    These need "beyond-f32" accuracy (f32 measured 5x worse G — see
    _green_inner_real) but usually nowhere near the full ~2^-48: the
    V-chain's capped-product errors accumulate linearly (K ~ 10-80
    products -> K * 2^-32 ~ 2e-8 at 4 limbs) and the VVh error enters
    the green solve amplified by the range-split inner matrix's
    conditioning. That conditioning is model-dependent, so the tier is
    a per-caller choice (`requested`; models thread their config's
    value):

    - SDW native chain (inner cond ~2e4): 4 limbs sits AT the refined-G
      floor of the full 6 on 40-product graded chains (4.3e-7 real /
      1.24e-5 vs 1.23e-5 complex, cond up to ~4e12 — BASELINE.md) while
      3 limbs degrades it 2.5-100x; on the chip 4 limbs took SDW L=8
      from 85.0 to 91.4 sweeps/s with green_dev unchanged.
    - Hubbard beta=8 (inner cond ~9e5, df32 kernel solve): 4 limbs
      measured green_dev med 1.7e-2 (gate 6e-3) — the 2^-32 VVh error
      times cond exceeds the wrapped-drift budget; 5 limbs holds
      (med 1.55e-3) and is still faster than 6 (1929 vs 1874 sweeps/s).

    4 limbs = 10 bf16 matmuls, 5 = 15, 6 (full) = 21. Env override
    DETQMC_TPU_CHAIN_LIMBS beats everything (A/B hook)."""
    import os

    v = os.environ.get("DETQMC_TPU_CHAIN_LIMBS")
    if v:
        return int(v)
    return 4 if requested is None else requested


def residual_limbs() -> int:
    """Limb count for iterative-refinement residual products (I - A Z).

    The residual only needs enough accuracy to not pollute the refined
    solve's f32-storage floor (~1e-7): measured on the graded inner
    class (cond 4e3-2e7, n 64-512), 5 limbs (15 bf16 matmuls) lands
    IDENTICAL converged error to the full 6 (21 matmuls) at realistic
    conditioning (the stabilized range-split inner measures cond ~2e4),
    while 4 limbs degrades the floor ~8x and stalls convergence beyond
    cond ~1e7. Env override DETQMC_TPU_RESIDUAL_LIMBS for A/B."""
    import os

    return int(os.environ.get("DETQMC_TPU_RESIDUAL_LIMBS", "5"))
