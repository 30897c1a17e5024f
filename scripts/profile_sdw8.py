"""Phase profile of the science-scale SDW O(3) L=8 sweep on the TPU.

Variant-substitution timing (per-op TPU timings are useless at the
~25 ms dispatch floor): time the full jitted sweep_pair, then re-time
with individual phases disabled/stubbed to attribute cost.

Usage: python scripts/profile_sdw8.py [L] [W]
"""

from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache
compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def timed(model, W, label, n_timed=3, measure=True):
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st,
                                                        measure=measure)))
    t0 = time.perf_counter()
    out = step(states)
    states = jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0
    obs = out[1]
    t0 = time.perf_counter()
    for _ in range(n_timed):
        states, obs = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    dev = float(np.median(np.asarray(states.green_dev)))
    print(f"{label:34s} {W * n_timed * 2 / dt:8.1f} sweeps/s   "
          f"{dt / n_timed * 1e3:8.1f} ms/pair   green_dev {dev:.2e}   "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt / n_timed


def main():
    # NOTE: DETQMC_TPU_QR=wy / DETQMC_TPU_TRINV=blocked select the
    # MXU-blocked QR / triangular-inverse kernels — set in the
    # environment BEFORE launching to profile those variants.
    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=True)
    model = SDWModel(SDWConfig(**base))
    print(f"L={L} W={W} m=40 s=4 opdim=3  repr={model.cfg.fermion_repr} "
          f"native={model.native}")
    t_full = timed(model, W, "full sweep_pair (measure=True)")
    t_nomeas = timed(model, W, "measure=False")
    # df32 green kernel instead of the refined solve
    m5 = SDWModel(SDWConfig(**{**base, "green_kernel": "df32"}))
    timed(m5, W, "df32 green (no refine)")
    # delayed-chunk update kernel (MXU flushes) vs immediate
    for K in (8, 16):
        m7 = SDWModel(SDWConfig(**{**base, "update_kernel": "delayed",
                                   "delay": K}))
        timed(m7, W, f"delayed update kernel K={K}")
    # refinement-iteration sensitivity
    m6 = SDWModel(SDWConfig(**{**base, "green_refine_iters": 1}))
    timed(m6, W, "refine n_iter=1")
    # dense hopping instead of checkerboard
    m2 = SDWModel(SDWConfig(**{**base, "checkerboard": False}))
    timed(m2, W, "dense hopping (no checkerboard)")
    # embedded chain instead of native pairs
    m4 = SDWModel(SDWConfig(**{**base, "fermion_repr": "real_embed"}))
    timed(m4, W, "embedded rho chain")
    # scan update path (embed only) instead of the fused kernel
    m3 = SDWModel(SDWConfig(**{**base, "fermion_repr": "real_embed",
                               "update_kernel": "scan"}))
    timed(m3, W, "embed + scan update (no kernel)")
    print(f"measure cost: {(t_full - t_nomeas) * 1e3:.1f} ms/pair")


if __name__ == "__main__":
    main()
