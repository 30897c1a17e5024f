"""Anatomy of ozaki.matmul_f64 cost at the Hubbard V-chain shape.

The walker-scaling attribution (phase_hubbard.py) pinned the W=1024
sag on the refactor V-chain product. This times each internal stage of
matmul_f64 honestly on the relay runtime: R reps chained through a
carried scalar inside ONE jit (defeats runtime dedup — see the
qr_gflops notes in bench.py), scalar output (no lazy-transfer skew),
host-fetched once.

Usage: python scripts/ozaki_anatomy.py [W] [n] [limbs]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
LIMBS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
REPS = 20

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()

jax.config.update("jax_enable_x64", True)

from detqmc_tpu.linalg import df32, ozaki  # noqa: E402

s = min(8, (24 - max(1, math.ceil(math.log2(max(n, 2))))) // 2)
tiny = jnp.float64(2.0 ** -126)


def split(x):
    out = []
    r = x
    for t in range(LIMBS):
        step = jnp.float64(2.0 ** (-s * (t + 1)))
        limb = jnp.round(r / step) * step
        r = r - limb
        out.append(limb.astype(jnp.bfloat16))
    return out


def stage_full(A, B, eps):
    return ozaki.matmul_f64(A + eps, B, limbs=LIMBS)[..., 0, 0].sum()


def stage_scale(A, B, eps):
    A = A + eps
    sa = ozaki._pow2_above(jnp.max(jnp.abs(A), axis=-1, keepdims=True),
                           tiny)
    sb = ozaki._pow2_above(jnp.max(jnp.abs(B + eps), axis=-2,
                                   keepdims=True), tiny)
    return ((A / sa)[..., 0, 0].sum() + ((B + eps) / sb)[..., 0, 0].sum()
            + sa.sum() + sb.sum())


def stage_split(A, B, eps):
    return sum(l.astype(jnp.float32)[..., 0, 0].sum()
               for l in split(A + eps) + split(B + eps))


def stage_matmuls(A, B, eps):
    # limb tensors derived cheaply (bf16 casts) so only the dots cost
    Als = [(A + eps).astype(jnp.bfloat16) for _ in range(LIMBS)]
    Bls = [B.astype(jnp.bfloat16) for _ in range(LIMBS)]
    tot = jnp.zeros((), jnp.float32)
    for c in range(LIMBS):
        for t in range(c + 1):
            p = jax.lax.dot_general(
                Als[t], Bls[c - t],
                ((((2,), (1,))), (((0,), (0,)))),
                preferred_element_type=jnp.float32)
            tot = tot + p[..., 0, 0].sum()
    return tot


def stage_accum(A, B, eps):
    nmm = LIMBS * (LIMBS + 1) // 2
    ps = [(A + (eps + i)).astype(jnp.float32) for i in range(nmm)]
    acc = None
    for p in ps:
        acc = df32.df(p) if acc is None else df32.add(acc, df32.df(p))
    return acc[0][..., 0, 0].sum() + acc[1][..., 0, 0].sum()


def stage_f32mm(A, B, eps):
    return ((A.astype(jnp.float32) + eps.astype(jnp.float32))
            @ B.astype(jnp.float32))[..., 0, 0].sum()


def stage_f64pass(A, B, eps):
    return (A * (1.0 + eps) + jnp.float64(1e-30))[..., 0, 0].sum()


STAGES = dict(full=stage_full, scale=stage_scale, split=stage_split,
              matmuls=stage_matmuls, accum=stage_accum,
              f32mm=stage_f32mm, f64pass=stage_f64pass)


def timeit(label, fn, A, B):
    def reps(A, B):
        def body(c, i):
            return c + fn(A, B, c * jnp.float64(1e-300)
                          + i * jnp.float64(1e-290)), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float64),
                              jnp.arange(REPS))
        return out

    f = jax.jit(reps)
    np.asarray(f(A, B))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(f(A, B))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:10s} W={W} n={n} L={LIMBS}: {dt * 1e3:9.3f} ms/call",
          flush=True)
    return dt


def main():
    k1, k2 = jax.random.split(jax.random.key(0))
    A = jax.random.normal(k1, (W, n, n), dtype=jnp.float32
                          ).astype(jnp.float64)
    B = jax.random.normal(k2, (W, n, n), dtype=jnp.float32
                          ).astype(jnp.float64)
    for name in sys.argv[4].split(",") if len(sys.argv) > 4 else STAGES:
        timeit(name, STAGES[name], A, B)


if __name__ == "__main__":
    main()
