"""Direct phase micro-benchmarks of the SDW L=8 sweep on the chip.

The relay does not support jax.profiler tracing (start_trace hangs),
so each phase is timed as its own small jitted program over the same
W-batched state shapes the real sweep uses:

  wraps     40x (exp_v_blocks old+inv, wrap_up)            per sweep
  update    40x update_slice (fused kernel)                per sweep
  absorb    40x (exp_v_blocks new, b_mult_left lazy_U)     per sweep
  refactor  (m/s)x _refactor of the interval product       per sweep
  green     (m/s)x _green of two stack entries             per sweep
  measure   (m/s)x measure(G, phi)                         per sweep

Usage: python scripts/phase_sdw8b.py <section> [L] [W] [s] [update_kernel] [delay]
  sections: wraps update absorb refactor green measure
  update_kernel: auto (default) | pallas | delayed; delay = chunk K
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

section = sys.argv[1]
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W = int(sys.argv[3]) if len(sys.argv) > 3 else 128
S = int(sys.argv[4]) if len(sys.argv) > 4 else 8
UPD = sys.argv[5] if len(sys.argv) > 5 else "auto"
DELAY = int(sys.argv[6]) if len(sys.argv) > 6 else 0

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()

from detqmc_tpu.linalg.udv import UDV  # noqa: E402
from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402


def main():
    model = SDWModel(SDWConfig(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=S,
                               dtype="float32", checkerboard=True,
                               update_kernel=UPD, delay=DELAY))
    cfg = model.cfg
    m, K = cfg.m, cfg.n_stack
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    states = jax.block_until_ready(states)

    def wraps(st):
        def body(G, l):
            blocks = model.exp_v_blocks(st.phi[l - 1])
            blocks_inv = model.exp_v_blocks(st.phi[l - 1], sign=+1.0)
            return model.wrap_up(G, blocks, blocks_inv), None
        G, _ = jax.lax.scan(body, st.G, jnp.arange(1, m + 1))
        return G

    def update(st):
        def body(c, l):
            G, phi, key, phase = c
            G, phi, key, phase, acc = model.update_slice(
                G, phi, l, key, phase, st.box_width, st.r, alt=0)
            return (G, phi, key, phase), acc
        (G, phi, key, phase), acc = jax.lax.scan(
            body, (st.G, st.phi, st.key, st.phase),
            jnp.arange(1, m + 1))
        return G, acc

    def absorb(st):
        def body(lazy_U, l):
            blocks = model.exp_v_blocks(st.phi[l - 1])
            return model.b_mult_left(blocks, lazy_U), None
        U0 = model._eye_mixed().U.astype(model.cdtype)
        out, _ = jax.lax.scan(body, U0, jnp.arange(1, m + 1))
        return out

    def refactor(st):
        f0 = UDV(st.stack_U[1], st.stack_d[1], st.stack_V[1])

        def body(f, _):
            f2 = model._refactor(f.U.astype(model.cdtype), f.d, f.V,
                                 compose_dtype=model.stab_dtype_eff)
            return f2, None
        f, _ = jax.lax.scan(body, f0, None, length=K)
        return f.V

    def green(st):
        def body(c, k):
            left = UDV(st.stack_U[k], st.stack_d[k], st.stack_V[k])
            right = UDV(st.stack_U[k + 1], st.stack_d[k + 1],
                        st.stack_V[k + 1])
            G = model._green(left, right)
            return c + G.sum(), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(K))
        return tot

    def measure_fn(st):
        def body(c, _):
            obs = model.measure(st.G, st.phi, st.phase,
                                jnp.zeros((), cfg.jdtype))
            return jax.tree.map(jnp.add, c, obs), None
        zero = jax.tree.map(
            jnp.zeros_like,
            model.measure(st.G, st.phi, st.phase,
                          jnp.zeros((), cfg.jdtype)))
        out, _ = jax.lax.scan(body, zero, None, length=K)
        return out

    fns = dict(wraps=wraps, update=update, absorb=absorb,
               refactor=refactor, green=green, measure=measure_fn)
    fn = jax.jit(jax.vmap(fns[section]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(states))
    compile_s = time.perf_counter() - t0
    n_timed = 5
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = fn(states)
    jax.block_until_ready(out)
    # host fetch: on this runtime block_until_ready alone can return
    # before small-output micro-bench work executes (see bench.py's
    # qr_gflops notes); fetching a leaf forces completion. The phase
    # numbers cross-check against the real sweep time (sum 980 vs 986
    # ms measured), so the big-output sections were already honest.
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n_timed
    tag = f" upd={UPD}/{DELAY}" if UPD != "auto" else ""
    print(f"{section:10s} L={L} W={W} s={S}:{tag} {dt * 1e3:8.1f} "
          f"ms/sweep-equiv   (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
