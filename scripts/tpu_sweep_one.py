"""Time ONE full SDW sweep_pair config on the chip (own process so a
relay drop can't kill a batch of variants).

Usage: python scripts/tpu_sweep_one.py L W s update_kernel delay [n_timed]
  update_kernel: auto | pallas | delayed
Prints one line: sweeps/s, ms/pair, green_dev median.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = int(sys.argv[1])
W = int(sys.argv[2])
S = int(sys.argv[3])
UPD = sys.argv[4]
DELAY = int(sys.argv[5])
N_TIMED = int(sys.argv[6]) if len(sys.argv) > 6 else 3

import jax  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402


def main():
    model = SDWModel(SDWConfig(
        L=L, opdim=3, r=0.5, beta=4.0, m=40, s=S, dtype="float32",
        checkerboard=(L >= 8), update_kernel=UPD, delay=DELAY))
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    t0 = time.perf_counter()
    states = jax.block_until_ready(step(states)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        states, _ = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    dev = float(np.median(np.asarray(states.green_dev)))
    print(f"L={L} W={W} s={S} upd={UPD}/{DELAY}: "
          f"{W * N_TIMED * 2 / dt:8.1f} sweeps/s   "
          f"{dt / N_TIMED * 1e3:8.1f} ms/pair   green_dev {dev:.2e}   "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
