"""Double-single ("df32") arithmetic: ~2^-48 precision from f32 pairs.

The stabilized Green's-function recompute needs ~f64 precision in exactly
one place — the inner UdV factorization whose condition grows like
e^{beta W} (see linalg/udv.py). XLA's f64 emulation on TPU works but its
QR has ~90 ms latency (deep sequential chains of emulated scalar ops),
which dominates the whole sweep. These helpers implement error-free
transformations (Knuth TwoSum, Dekker split TwoProd) on f32 pairs
(hi, lo), written in plain jnp so they lower inside Pallas kernels
(VPU instructions, no dispatch) and are unit-testable on CPU.

All functions are elementwise and broadcast like jnp; a value is a
(hi, lo) tuple of same-shaped f32 arrays with |lo| <= ulp(hi)/2.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

DF = Tuple[jnp.ndarray, jnp.ndarray]

_SPLIT = 4097.0  # 2^12 + 1 (f32 has 24-bit mantissa; 12/12 split)


def two_sum(a, b) -> DF:
    """Exact a + b = s + err (Knuth, no magnitude assumption)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b) -> DF:
    """Exact a + b = s + err assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a) -> DF:
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> DF:
    """Exact a * b = p + err (Dekker split; no FMA assumption)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df(hi, lo=None) -> DF:
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, lo


def from_f64(x) -> DF:
    """Split an f64 array into an f32 (hi, lo) pair (host/XLA side)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(a: DF):
    return a[0].astype(jnp.float64) + a[1].astype(jnp.float64)


def add(a: DF, b: DF) -> DF:
    s, e = two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return quick_two_sum(s, e)


def neg(a: DF) -> DF:
    return -a[0], -a[1]


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    p, e = two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    return quick_two_sum(p, e)


def presplit(b: DF):
    """Cache the Dekker split of b's hi part for repeated products
    (Householder vectors multiply O(n) other elements per step — the
    split is 3 of TwoProd's 14 ops and is operand-invariant)."""
    bh, bl = _split(b[0])
    return (b[0], b[1], bh, bl)


def mul_ps(a: DF, bp) -> DF:
    """a * b with b pre-split (presplit). Returns an UNNORMALIZED pair
    (still an exact value + error representation with |lo| <~ 2^-22|hi|,
    safe for add/sub/reduce_*, whose TwoSum does not require normalized
    inputs) — skips b's split and the final renormalization: 15 f32 ops
    instead of mul's 21."""
    b0, b1, bh, bl = bp
    p = a[0] * b0
    ah, al = _split(a[0])
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    e = err + a[0] * b1 + a[1] * b0
    return p, e


def mul_f32(a: DF, b) -> DF:
    """a * b with plain-f32 b (e.g. 0/1 masks, signs: exact when b exact)."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def mask(a: DF, m) -> DF:
    """a * m for a boolean mask m: exact and cheap (select, no TwoProd)."""
    zero = jnp.zeros((), a[0].dtype)
    return jnp.where(m, a[0], zero), jnp.where(m, a[1], zero)


def scale_signed(a: DF, s) -> DF:
    """a * s for s in {-1, 0, +1} (or any power of two): the products are
    exact, so no TwoProd/renormalization is needed."""
    return a[0] * s, a[1] * s


def recip(a: DF) -> DF:
    """1 / a via one Newton step from the f32 estimate."""
    x0 = 1.0 / a[0]
    # e = 1 - a*x0 computed in df; x = x0 + x0*e
    ax = mul_f32(a, x0)
    e = add(df(jnp.ones_like(x0)), neg(ax))
    corr = mul_f32(e, x0)
    return add(df(x0), corr)


def div(a: DF, b: DF) -> DF:
    return mul(a, recip(b))


def sqrt(a: DF) -> DF:
    """sqrt(a) via one Newton step; a >= 0 (guard zero)."""
    s0 = jnp.sqrt(a[0])
    safe = jnp.where(s0 > 0, s0, 1.0)
    # err = (a - s0^2) / (2 s0)
    s2 = two_prod(safe, safe)
    diff = add(a, neg(s2))
    corr = diff[0] / (2.0 * safe)
    out = quick_two_sum(safe, corr)
    zero = (a[0] <= 0).astype(a[0].dtype)
    return out[0] * (1 - zero), out[1] * (1 - zero)


def reduce_last(a: DF, n: int) -> DF:
    """Accurate sum over the last axis (length n, power-of-two padded by
    caller or any n: uses halving with a tail add). Returns shape (..., 1).
    """
    h, l = a
    length = n
    while length > 1:
        half = length // 2
        even = (h[..., :half], l[..., :half])
        odd = (h[..., half:2 * half], l[..., half:2 * half])
        s = add(even, odd)
        if length % 2 == 1:
            tail = (h[..., 2 * half:length], l[..., 2 * half:length])
            s = add(s, (jnp.pad(tail[0], [(0, 0)] * (tail[0].ndim - 1)
                                 + [(0, half - 1)]),
                        jnp.pad(tail[1], [(0, 0)] * (tail[1].ndim - 1)
                                + [(0, half - 1)])))
        h, l = s
        length = half
    return h, l


def reduce_axis0(a: DF, n: int) -> DF:
    """Accurate sum over axis 0 (length n). Returns shape (1, ...)."""
    h, l = a
    length = n
    while length > 1:
        half = length // 2
        even = (h[:half], l[:half])
        odd = (h[half:2 * half], l[half:2 * half])
        s = add(even, odd)
        if length % 2 == 1:
            tail_h = h[2 * half:length]
            tail_l = l[2 * half:length]
            pad = [(0, half - 1)] + [(0, 0)] * (tail_h.ndim - 1)
            s = add(s, (jnp.pad(tail_h, pad), jnp.pad(tail_l, pad)))
        h, l = s
        length = half
    return h, l


def reduce_axis2(a: DF, n: int) -> DF:
    """Accurate sum over axis -2 (length n). Returns shape (..., 1, k)."""
    h, l = a
    length = n
    while length > 1:
        half = length // 2
        even = (h[..., :half, :], l[..., :half, :])
        odd = (h[..., half:2 * half, :], l[..., half:2 * half, :])
        s = add(even, odd)
        if length % 2 == 1:
            tail_h = h[..., 2 * half:length, :]
            tail_l = l[..., 2 * half:length, :]
            pad = [(0, 0)] * (tail_h.ndim - 2) + [(0, half - 1), (0, 0)]
            s = add(s, (jnp.pad(tail_h, pad), jnp.pad(tail_l, pad)))
        h, l = s
        length = half
    return h, l
