"""Session-10 queue: stabilization-interval scan at SDW L=8.

s controls the stabilization cadence (m/s green solves + refactors per
sweep). green_dev 8.8e-6 at s=4 has ~10x headroom against the 1e-4
bench gate, so fewer/larger segments may win wall-clock at acceptable
drift. m=40 requires s | m.

Usage: python scripts/tpu_measure_s10.py <section>
  sections: s4 s5 s8 s10
(one process per section — relay drop isolation.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

section = sys.argv[1]
S = int(section[1:])

import jax  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()


def main():
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    W = 128
    model = SDWModel(SDWConfig(L=8, opdim=3, r=0.5, beta=4.0, m=40, s=S,
                               dtype="float32", checkerboard=True))
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    t0 = time.perf_counter()
    states = jax.block_until_ready(step(states)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_timed = 3
    for _ in range(n_timed):
        states, _ = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    dev = float(np.median(np.asarray(states.green_dev)))
    devmax = float(np.max(np.asarray(states.green_dev)))
    print(f"SDW L=8 W=128 s={S}: {W * n_timed * 2 / dt:8.1f} sweeps/s   "
          f"{dt / n_timed * 1e3:8.1f} ms/pair   green_dev med {dev:.2e} "
          f"max {devmax:.2e}   (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
