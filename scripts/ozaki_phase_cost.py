"""Phase attribution of ozaki.matmul_f64 on the chip.

matmul_f64 = scale (f64 elementwise) + split (L rounds of emulated-f64
round/sub) + L(L+1)/2 bf16 MXU matmuls + compensated f32 combine + f64
rescale. Times the full product vs stubs at the refine-residual shape
(W=128 batch of 256x256, 4 real products per complex residual) to find
where the ~ms go. Usage: python scripts/ozaki_phase_cost.py [n] [W]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # f64 inputs for matmul_f64
import jax.numpy as jnp
import numpy as np

from detqmc_tpu import compile_cache
compile_cache.enable()

from detqmc_tpu.linalg import df32  # noqa: E402
from detqmc_tpu.linalg.ozaki import _pow2_above, matmul_f64  # noqa: E402

# tolerate a non-numeric argv[1] (tpu_measure drivers pass their own
# section name through)
def _int_arg(i, default):
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


n = _int_arg(1, 256)
W = _int_arg(2, 128)


def bench(fn, label, *args, n_timed=20):
    try:
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_timed
        print(f"{label:44s} {dt * 1e3:8.3f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
        return float("nan")


def split_only(A, L=6, s=8):
    tiny = jnp.float64(2.0 ** -126)
    sa = _pow2_above(jnp.max(jnp.abs(A), axis=-1, keepdims=True), tiny)
    Ar = A / sa
    out = []
    r = Ar
    for t in range(L):
        step = jnp.float64(2.0 ** (-s * (t + 1)))
        limb = jnp.round(r / step) * step
        r = r - limb
        out.append(limb.astype(jnp.bfloat16))
    return out


def matmuls_only(Als, Bls, L=6):
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
            acc = p if acc is None else acc + p          # plain f32 adds
    return acc


def matmuls_twosum(Als, Bls, L=6):
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
    return acc


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((W, n, n)))
    B = jnp.asarray(rng.standard_normal((W, n, n)))
    print(f"shape ({W}, {n}, {n}) f64; L=6 s=8 -> 21 bf16 matmuls",
          flush=True)
    t_full = bench(matmul_f64, "matmul_f64 (full, L=6)", A, B)
    t_l5 = bench(lambda a, b: matmul_f64(a, b, limbs=5),
                 "matmul_f64 (limbs=5)", A, B)
    t_l4 = bench(lambda a, b: matmul_f64(a, b, limbs=4),
                 "matmul_f64 (limbs=4)", A, B)
    t_split = bench(lambda a: split_only(a), "split only (A, emulated f64)", A)
    Als = [jax.device_put(x) for x in jax.jit(split_only)(A)]
    Bls = [jax.device_put(x)
           for x in jax.jit(lambda b: split_only(
               jnp.swapaxes(b, -1, -2)))(B)]
    Bls = [jnp.swapaxes(x, -1, -2) for x in Bls]
    t_mm = bench(matmuls_only, "21 bf16 matmuls + f32 adds", Als, Bls)
    t_ts = bench(matmuls_twosum, "21 bf16 matmuls + TwoSum combine",
                 Als, Bls)
    # reference points
    A32, B32 = A.astype(jnp.float32), B.astype(jnp.float32)
    bench(lambda a, b: a @ b, "one f32 matmul", A32, B32)
    bench(lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST),
          "one f64 emulated matmul (XLA)", A, B)
    bench(lambda a: df32.from_f64(a), "f64 -> df32 pair cast", A)
    print(f"attribution: split(A)+split(B) ~ {2 * t_split * 1e3:.2f} ms, "
          f"matmuls+TwoSum {t_ts * 1e3:.2f} ms, "
          f"TwoSum overhead {(t_ts - t_mm) * 1e3:.2f} ms, "
          f"full-vs-parts gap {(t_full - 2 * t_split - t_ts) * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
