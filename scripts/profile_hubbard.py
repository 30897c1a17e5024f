"""Phase profile of the headline Hubbard L=8 beta=8 sweep on the TPU.

Variant-substitution timing, like profile_sdw8: time the full jitted
sweep_pair, then re-time with phases swapped/disabled to attribute cost
and find the next lever past ~1900 sweeps/s.

Usage: python scripts/profile_hubbard.py [W]
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

from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def timed(model, W, label, n_timed=5, measure=True):
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st,
                                                        measure=measure)))
    t0 = time.perf_counter()
    out = step(states)
    states = jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0
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
    base = dict(L=8, U=4.0, beta=8.0, m=80, s=4, dtype="float32")
    model = HubbardModel(HubbardConfig(**base))
    print(f"Hubbard L=8 beta=8 m=80 s=4 W={W}")
    t_full = timed(model, W, "full sweep_pair (measure=True)")
    t_nomeas = timed(model, W, "measure=False", measure=False)
    timed(HubbardModel(HubbardConfig(**{**base, "green_kernel": "refine"})),
          W, "refine green")
    timed(HubbardModel(HubbardConfig(
        **{**base, "green_kernel": "refine", "green_refine_iters": 1})),
        W, "refine green n_iter=1")
    # stabilization-interval sensitivity (green solves per sweep ~ m/s)
    for s_ in (2, 8):
        m2 = HubbardModel(HubbardConfig(**{**base, "s": s_,
                                           "m": 80}))
        timed(m2, W, f"s={s_}")
    # delayed rank-k scan updates instead of the fused kernel
    m3 = HubbardModel(HubbardConfig(**{**base, "delay": 16}))
    timed(m3, W, "delayed scan updates K=16")
    print(f"measure cost: {(t_full - t_nomeas) * 1e3:.1f} ms/pair")


if __name__ == "__main__":
    main()
