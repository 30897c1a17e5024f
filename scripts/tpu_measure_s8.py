"""Session-8 TPU queue: refine-iters default flip confirmation.

Each section is isolated in-process only by try/except (one bad variant
cannot kill the batch). Usage: python scripts/tpu_measure_s8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache
compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402


def timed(model, W, label, n_timed=3):
    try:
        keys = jax.random.split(jax.random.key(1), W)
        states = jax.jit(jax.vmap(model.init_state))(keys)
        step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
        t0 = time.perf_counter()
        states = jax.block_until_ready(step(states)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_timed):
            states, _ = step(states)
        jax.block_until_ready(states.G)
        dt = time.perf_counter() - t0
        dev = float(np.median(np.asarray(states.green_dev)))
        print(f"{label:34s} {W * n_timed * 2 / dt:8.1f} sweeps/s   "
              f"{dt / n_timed * 1e3:8.1f} ms/pair   green_dev {dev:.2e}   "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    for L, W in ((4, 128), (8, 128)):
        base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                    dtype="float32", checkerboard=(L >= 8))
        print(f"=== SDW O(3) L={L} W={W} ===", flush=True)
        timed(SDWModel(SDWConfig(**base)), W, f"default (refine n_iter=1) L={L}")
        if L == 8:
            m0 = SDWModel(SDWConfig(**{**base, "green_refine_iters": 0}))
            timed(m0, W, "refine n_iter=0 (no residual)")


if __name__ == "__main__":
    main()
