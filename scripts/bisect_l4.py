"""One-config probe for the SDW L=4 on-chip green_dev regression
(BENCH_r03 gate trip: med 2.16e-4 > 1e-4 on both refine and df32).

Runs the exact bench.py L=4 section under the current environment and
prints a single JSON line with green_dev median/max and sweeps/s, so a
shell loop over env combos bisects the round-3 default flips:
  DETQMC_TPU_CHAIN_LIMBS=6, DETQMC_TPU_QR=panel, DETQMC_TPU_TRINV=col,
  and greenRefineIters=2 (pass via argv: --iters 2), kernel via
  --kernel {auto,refine,df32}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache

compile_cache.enable()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=4)
    p.add_argument("--W", type=int, default=128)
    p.add_argument("--s", type=int, default=4)
    p.add_argument("--kernel", default="auto")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--n-timed", type=int, default=3)
    p.add_argument("--checkerboard", action="store_true")
    args = p.parse_args()

    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    kw = dict(L=args.L, opdim=3, r=0.5, beta=4.0, m=40, s=args.s,
              dtype="float32", checkerboard=args.checkerboard,
              green_kernel=args.kernel)
    if args.iters is not None:
        kw["green_refine_iters"] = args.iters
    cfg = SDWConfig(**kw)
    model = SDWModel(cfg)
    keys = jax.random.split(jax.random.key(1), args.W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    states, obs = jax.block_until_ready(step(states))
    t0 = time.perf_counter()
    for _ in range(args.n_timed):
        states, obs = step(states)
    # host fetch inside the window: block_until_ready can return before
    # dispatched work executes on this runtime (bench.py note)
    dev = np.asarray(states.green_dev)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "L": args.L, "W": args.W, "s": args.s, "kernel": args.kernel,
        "iters": args.iters,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("DETQMC_TPU_")},
        "sweeps_per_sec": round(args.W * args.n_timed * 2 / dt, 1),
        "green_dev_med": float(np.median(dev)),
        "green_dev_max": float(dev.max()),
    }))


if __name__ == "__main__":
    main()
