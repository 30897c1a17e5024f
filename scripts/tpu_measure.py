"""Parameterized on-chip measurement entry (supersedes the frozen
tpu_measure_s*.py session scripts — those stay as lab history; THIS is
the operational tool; VERDICT r4 item 10).

One config per invocation, fully key=value-driven:

  python scripts/tpu_measure.py model=sdw L=8 beta=4.0 m=40 s=8 W=128 \
      checkerboard=1 [greenKernel=refine] [greenRefineIters=2] \
      [ozakiChainLimbs=5] [updateKernel=delayed] [delay=16] \
      [wrapKernel=fused] [n_eq=4] [n_timed=4] [seed=1]

  python scripts/tpu_measure.py model=hubbard L=8 beta=8.0 m=80 s=4 \
      W=256 [greenKernel=..] [n_timed=5]

Reports compile time, equilibrated sweeps/s (host-fetch-timed per the
round-4 rules), green_dev median/max, and one physics scalar. A/B by
invoking twice with different knobs (+ DETQMC_TPU_* env overrides).
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

MEAS_KEYS = {"W": 128, "n_eq": 4, "n_timed": 4, "seed": 1,
             "measure": 1}


def main() -> int:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    model_name = kv.pop("model", "sdw")
    meas = {k: int(kv.pop(k, d)) for k, d in MEAS_KEYS.items()}

    def typed(k, v):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                continue
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        return v

    # config-file key -> dataclass field spellings (same map the CLI
    # uses); everything else passes through verbatim
    remap = {"greenKernel": "green_kernel", "updateKernel":
             "update_kernel", "greenRefineIters": "green_refine_iters",
             "ozakiChainLimbs": "ozaki_chain_limbs", "wrapKernel":
             "wrap_kernel", "wrapPrec": "wrap_prec", "cbApply":
             "cb_apply", "fermionRepr": "fermion_repr", "staggerH":
             "stagger_h", "boxLength": "box_width",
             "spinProposalMethod": "spinProposalMethod"}
    cfg_kw = {}
    for k, v in kv.items():
        vv = typed(k, v)
        if k == "checkerboard":
            vv = bool(int(v)) if v in ("0", "1") else vv
        cfg_kw[remap.get(k, k)] = vv
    cfg_kw.setdefault("dtype", "float32")

    if model_name == "sdw":
        from detqmc_tpu.models.sdw import SDWConfig, SDWModel

        cfg_kw.setdefault("opdim", 3)
        cfg_kw.setdefault("r", 0.5)
        model = SDWModel(SDWConfig(**cfg_kw))
    elif model_name == "hubbard":
        from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel

        cfg_kw.setdefault("U", 4.0)
        model = HubbardModel(HubbardConfig(**cfg_kw))
    else:
        print(f"unknown model {model_name!r}", file=sys.stderr)
        return 2

    W, n_eq, n_timed = meas["W"], meas["n_eq"], meas["n_timed"]
    take = bool(meas["measure"])
    keys = jax.random.split(jax.random.key(meas["seed"]), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, take)))
    t0 = time.perf_counter()
    states, obs = step(states)
    np.asarray(states.green_dev)
    print(f"compile+first pair {time.perf_counter() - t0:.0f}s",
          flush=True)
    for _ in range(max(0, n_eq - 1)):
        states, obs = step(states)
    np.asarray(states.green_dev)

    t0 = time.perf_counter()
    for _ in range(n_timed):
        states, obs = step(states)
    dev = np.asarray(states.green_dev)       # host fetch inside window
    dt = time.perf_counter() - t0
    phys = None
    for name in ("occupancy", "phiSquared"):
        if hasattr(obs, name):
            phys = (name, float(np.asarray(getattr(obs, name)).mean()))
            break
    env = {k: v for k, v in os.environ.items()
           if k.startswith("DETQMC_TPU_")}
    print(f"{model_name} {cfg_kw}  W={W}", flush=True)
    if env:
        print(f"  env: {env}", flush=True)
    print(f"  {W * n_timed * 2 / dt:8.1f} sweeps/s   "
          f"{dt / n_timed * 1e3:7.1f} ms/pair   "
          f"green_dev med {np.median(dev):.3e} max {dev.max():.3e}"
          + (f"   {phys[0]}={phys[1]:.4f}" if phys else ""), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
