"""Session-9 queue: chain-limb A/B (V-chain + VVh Ozaki products) at
SDW L=8 and the Hubbard headline config.

Usage: python scripts/tpu_measure_s9.py <section>
  sections: s8_chain5 s8_chain6 s8_chain4 hub_chain5 hub_chain6
(one process per section — the relay sometimes drops mid-run, and the
limb count is baked into the jitted program via ozaki.chain_limbs.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

section = sys.argv[1]
os.environ["DETQMC_TPU_CHAIN_LIMBS"] = section[-1]

import jax  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()


def timed(model, W, label):
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
    print(f"{label}: {W * n_timed * 2 / dt:8.1f} sweeps/s   "
          f"{dt / n_timed * 1e3:8.1f} ms/pair   green_dev med {dev:.2e} "
          f"max {devmax:.2e}   (compile {compile_s:.0f}s)", flush=True)


def main():
    if section.startswith("s8"):
        from detqmc_tpu.models.sdw import SDWConfig, SDWModel
        model = SDWModel(SDWConfig(L=8, opdim=3, r=0.5, beta=4.0, m=40,
                                   s=4, dtype="float32",
                                   checkerboard=True))
        timed(model, 128, f"SDW L=8 W=128 {section}")
    else:
        from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel
        model = HubbardModel(HubbardConfig(L=8, U=4.0, beta=8.0, m=80,
                                           s=4, dtype="float32"))
        timed(model, 256, f"Hubbard L=8 W=256 {section}")


if __name__ == "__main__":
    main()
