"""TPU validation of the mixed-precision refined green solve.

Compares G from green_kernel="refine" against the df32 kernel on the
SAME stacks/field at the science-scale SDW config, then times both
sweep_pair programs. Usage: python scripts/validate_refine.py [L] [W].
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

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
            dtype="float32", checkerboard=(L >= 8),
            fermion_repr="native_pair")
m_df32 = SDWModel(SDWConfig(**base, green_kernel="df32"))
m_ref = SDWModel(SDWConfig(**base, green_kernel="refine",
                           green_refine_iters=ITERS))
print(f"L={L} W={W} refine_iters={ITERS} dim={m_df32.dim}")

keys = jax.random.split(jax.random.key(1), W)
st0 = jax.jit(jax.vmap(m_df32.init_state))(keys)

# same field/stacks -> G comparison isolates the green solve
t0 = time.perf_counter()
g_df = jax.jit(jax.vmap(m_df32.refresh_from_field))(st0)
g_df = jax.block_until_ready(g_df.G)
print(f"df32 refresh compile+run {time.perf_counter() - t0:.0f}s")
t0 = time.perf_counter()
g_rf = jax.jit(jax.vmap(m_ref.refresh_from_field))(st0)
g_rf = jax.block_until_ready(g_rf.G)
print(f"refine refresh compile+run {time.perf_counter() - t0:.0f}s")
d = np.abs(np.asarray(g_df) - np.asarray(g_rf))
scale = np.abs(np.asarray(g_df)).max()
print(f"G diff: max {d.max():.3e}  (G scale {scale:.3e})")


def timed(model, label, n_timed=3):
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    t0 = time.perf_counter()
    states, obs = jax.block_until_ready(step(states))
    print(f"{label}: compile+warm {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(n_timed):
        states, obs = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    dev = float(np.median(np.asarray(states.green_dev)))
    dmax = float(np.max(np.asarray(states.green_dev)))
    print(f"{label:18s} {W * n_timed * 2 / dt:8.1f} sweeps/s  "
          f"{dt / n_timed * 1e3:7.1f} ms/pair  green_dev med {dev:.2e} "
          f"max {dmax:.2e}")


timed(m_ref, "refine")
timed(m_df32, "df32")
