"""SDW science-regime (L=8, beta=8, opdim=3) kernel-route scan on the
chip: green kernel x refine iters x chain limbs x s, measuring
green_dev (median/max over walkers) and sweeps/s per variant.

The beta=8 equilibrium inner cond measures med 1.6e7 / p90 3.8e8
(scripts/sdw_inner_cond.py) — 3 orders past beta=4's ~2e4 — and the
beta=4 defaults (refine n_iter=1, chain_limbs=4) measured green_dev
0.33 there: broken. This scan finds the working route per the round-4
protocol (route by measured conditioning regime, not by model).

Usage: python scripts/sdw_b8_scan.py [variant ...]
  variant = name:green_kernel:n_iter:chain_limbs:s
  default set: df32 and refine at s=8/s=4, limbs 4/5
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache

compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402

W = int(os.environ.get("B8_W", "64"))
N_EQ = int(os.environ.get("B8_EQ", "8"))
N_TIMED = int(os.environ.get("B8_TIMED", "4"))

DEFAULT = [
    "df32_l5_s8:df32:0:5:8",
    "df32_l4_s8:df32:0:4:8",
    "ref3_l5_s8:refine:3:5:8",
    "df32_l5_s4:df32:0:5:4",
    "ref2_l5_s4:refine:2:5:4",
]


def run_variant(spec: str) -> None:
    name, gk, n_iter, limbs, s = spec.split(":")
    cfg = SDWConfig(L=8, opdim=3, r=0.5, beta=8.0, m=80, s=int(s),
                    dtype="float32", checkerboard=True,
                    green_kernel=gk, green_refine_iters=int(n_iter),
                    ozaki_chain_limbs=int(limbs))
    model = SDWModel(cfg)
    keys = jax.random.split(jax.random.key(11), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, False)[0]))
    t0 = time.time()
    states = step(states)
    np.asarray(states.green_dev)
    print(f"{name}: compile+pair1 {time.time() - t0:.0f}s", flush=True)
    for i in range(N_EQ - 1):
        states = step(states)
        np.asarray(states.green_dev)
        print(f"{name}: eq pair {i + 2}/{N_EQ} "
              f"t={time.time() - t0:.0f}s", flush=True)
    t_eq = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        states = step(states)
    dev = np.asarray(states.green_dev)      # host fetch inside window
    dt = time.perf_counter() - t0
    sps = W * N_TIMED * 2 / dt
    print(f"{name:14s} dev med {np.median(dev):.3e} max {dev.max():.3e}"
          f"  {sps:7.1f} sweeps/s   (eq {t_eq:.0f}s)", flush=True)


def main() -> None:
    specs = sys.argv[1:] or DEFAULT
    for spec in specs:
        try:
            run_variant(spec)
        except Exception as e:  # keep scanning
            print(f"{spec}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
