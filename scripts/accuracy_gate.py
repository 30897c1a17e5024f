"""Always-run on-chip accuracy gate for the bench shapes.

The CPU suite runs fp64 and cannot see TPU-kernel accuracy (round 3
shipped default flips A/B'd at one shape and regressed another: the
bf16 wrap default tripped the SDW L=4 green_dev gate that no CPU test
could catch). This script sweeps each bench shape a few pairs on the
real chip and asserts the green_dev medians — ~2-3 min warm-cache.

RUN THIS BEFORE COMMITTING ANY DEFAULT FLIP (precision, kernel route,
limb tier). Workflow note lives in STATUS.md; BASELINE.md records that
defaults only flip with a pass attached.

Usage: python scripts/accuracy_gate.py            # all shapes
       python scripts/accuracy_gate.py sdw4 sdw8  # subset
Exit 0 iff every requested shape passes its gate.
"""

from __future__ import annotations

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

# shape -> (builder, gate). Gates match bench.py's GATES. sdw8b8 is
# the conditioning-regime shape (equilibrium inner cond ~1.6e7 at
# beta=8 vs ~2e4 at beta=4) where the round-3/4 lessons say precision
# failures actually live — every default flip must pass it too.
GATES = {"hubbard": 6e-3, "sdw4": 1e-4, "sdw8": 1e-4, "sdw8b8": 1e-4}


def _hubbard():
    from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel

    cfg = HubbardConfig(L=8, U=4.0, beta=8.0, m=80, s=4, dtype="float32")
    model = HubbardModel(cfg)
    states = jax.jit(jax.vmap(model.init_state))(
        jax.random.split(jax.random.key(0), 256))
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, True)))
    for _ in range(3):
        states, _ = step(states)
    jax.block_until_ready(states.G)
    return float(np.median(np.asarray(states.green_dev)))


def _sdw(L, s, checkerboard, beta=4.0, m=40):
    # W=128 + measure=True matches scripts/bisect_l4.py — the sweep
    # program is already in the persistent compile cache
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    cfg = SDWConfig(L=L, opdim=3, r=0.5, beta=beta, m=m, s=s,
                    dtype="float32", checkerboard=checkerboard)
    model = SDWModel(cfg)
    states = jax.jit(jax.vmap(model.init_state))(
        jax.random.split(jax.random.key(1), 128))
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, True)))
    for _ in range(3):
        states, _ = step(states)
    jax.block_until_ready(states.G)
    return float(np.median(np.asarray(states.green_dev)))


SHAPES = {
    "hubbard": _hubbard,
    "sdw4": lambda: _sdw(4, 4, False),
    "sdw8": lambda: _sdw(8, 8, True),
    "sdw8b8": lambda: _sdw(8, 8, True, beta=8.0, m=80),
}


def main() -> int:
    want = sys.argv[1:] or list(SHAPES)
    rc = 0
    for name in want:
        t0 = time.perf_counter()
        try:
            dev = SHAPES[name]()
            ok = dev < GATES[name]
        except Exception as e:  # noqa: BLE001 — report, keep gating rest
            dev, ok = None, False
            print(f"# {name} raised {type(e).__name__}: {e}",
                  file=sys.stderr)
        rc |= 0 if ok else 1
        print(json.dumps({
            "shape": name, "green_dev_med": dev, "gate": GATES[name],
            "pass": ok, "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
