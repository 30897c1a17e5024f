"""Direct phase micro-benchmarks of the Hubbard L=8 beta=8 sweep.

Same method as phase_sdw8b.py (the relay cannot run jax.profiler):
each phase of the sweep is timed as its own jitted program over the
W-batched state shapes the real sweep uses, so walker-scaling loss
(BASELINE.md "Walker scaling": 1910 -> 1634 aggregate sweeps/s at
W=256 -> 1024) can be attributed to a phase instead of guessed at.

  wraps     m x (exp_v old, wrap_up)                    per sweep
  update    m x update_slice (lane Metropolis kernel)   per sweep
  absorb    m x (exp_v new, b_mult_left lazy_U)         per sweep
  refactor  (m/s) x udv_refactor of the interval product per sweep
  green     (m/s) x _green of two stack entries          per sweep
  measure   (m/s) x measure_equal_time                   per sweep

Usage: python scripts/phase_hubbard.py <section> [W] [L] [s]
  sections: wraps update absorb refactor green measure all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

section = sys.argv[1] if len(sys.argv) > 1 else "all"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
L = int(sys.argv[3]) if len(sys.argv) > 3 else 8
S = int(sys.argv[4]) if len(sys.argv) > 4 else 4

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from detqmc_tpu import compile_cache  # noqa: E402
compile_cache.enable()

from detqmc_tpu.linalg import bchain  # noqa: E402
from detqmc_tpu.linalg.udv import UDV  # noqa: E402
from detqmc_tpu.models.hubbard import (  # noqa: E402
    HubbardConfig, HubbardModel, udv_refactor)


def main():
    model = HubbardModel(HubbardConfig(L=L, U=4.0, beta=8.0, m=80, s=S,
                                       dtype="float32"))
    cfg = model.cfg
    m, K = cfg.m, cfg.n_stack
    cb = model.cb_sparse
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    states = jax.block_until_ready(states)

    def wraps(st):
        def body(G, l):
            e_old = model.exp_v(st.field[l - 1])
            return model.wrap_up(G, e_old), None
        G, _ = jax.lax.scan(body, st.G, jnp.arange(1, m + 1))
        return G

    def update(st):
        key, sweep_key = jax.random.split(st.key)
        u01 = jax.random.uniform(sweep_key, (m, cfg.n_sites),
                                 dtype=cfg.jdtype)

        def body(c, l):
            G, field, sign = c
            G, fl_new, sign, acc = model.update_slice(
                G, field[l - 1], u01[l - 1], sign)
            field = field.at[l - 1].set(fl_new)
            return (G, field, sign), acc
        (G, field, sign), acc = jax.lax.scan(
            body, (st.G, st.field, st.sign), jnp.arange(1, m + 1))
        return G, acc

    def absorb(st):
        def body(lazy_U, l):
            e_new = model.exp_v(st.field[l - 1])
            return bchain.b_mult_left(model.prop, e_new, lazy_U,
                                      checkerboard=cb), None
        U0 = model._eye_mixed().U
        out, _ = jax.lax.scan(body, U0, jnp.arange(1, m + 1))
        return out

    def refactor(st):
        f0 = UDV(st.stack.U[1], st.stack.d[1], st.stack.V[1])

        def body(f, _):
            f2 = udv_refactor(f.U.astype(cfg.jdtype), f.d, f.V,
                              compose_dtype=cfg.stab_jdtype,
                              chain_limbs=cfg.ozaki_chain_limbs)
            return f2, None
        f, _ = jax.lax.scan(body, f0, None, length=K)
        return f.V

    def refactor_qr(st):
        # the lane-QR component of udv_refactor alone
        from detqmc_tpu.linalg.udv import udv_decompose

        def body(Mx, _):
            g = udv_decompose(Mx)
            return g.U + g.V, None
        out, _ = jax.lax.scan(body, st.stack.U[1].astype(cfg.jdtype),
                              None, length=K)
        return out

    def refactor_vchain(st):
        # the Ozaki f64 V-chain product component alone
        from detqmc_tpu.linalg import ozaki

        def body(Vx, _):
            V2 = ozaki.mm_f64(Vx, st.stack.V[2],
                              limbs=ozaki.chain_limbs(
                                  cfg.ozaki_chain_limbs))
            return V2, None
        out, _ = jax.lax.scan(body, st.stack.V[1], None, length=K)
        return out

    def green(st):
        def body(c, k):
            left = UDV(st.stack.U[k], st.stack.d[k], st.stack.V[k])
            right = UDV(st.stack.U[k + 1], st.stack.d[k + 1],
                        st.stack.V[k + 1])
            G = model._green(left, right)
            return c + G.sum(), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(K))
        return tot

    def measure_fn(st):
        def body(c, _):
            obs = model.measure_equal_time(st.G, jnp.zeros((), cfg.jdtype),
                                           st.sign)
            return jax.tree.map(jnp.add, c, obs), None
        zero = jax.tree.map(
            jnp.zeros_like,
            model.measure_equal_time(st.G, jnp.zeros((), cfg.jdtype),
                                     st.sign))
        out, _ = jax.lax.scan(body, zero, None, length=K)
        return out

    fns = dict(wraps=wraps, update=update, absorb=absorb,
               refactor=refactor, refactor_qr=refactor_qr,
               refactor_vchain=refactor_vchain,
               green=green, measure=measure_fn)
    names = list(fns) if section == "all" else [section]
    for name in names:
        fn = jax.jit(jax.vmap(fns[name]))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(states))
        compile_s = time.perf_counter() - t0
        n_timed = 5
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = fn(states)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0])  # host fetch (see phase_sdw8b)
        dt = (time.perf_counter() - t0) / n_timed
        print(f"{name:10s} L={L} W={W} s={S}: {dt * 1e3:8.1f} "
              f"ms/sweep-equiv  ({dt * 1e6 / W:6.1f} us/walker)"
              f"   (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
