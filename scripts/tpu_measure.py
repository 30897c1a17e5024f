"""One-shot TPU measurement batch for the refine work.

Runs (1) SDW refine-vs-df32 validation+timing at L=8 and L=4,
(2) Hubbard refine-vs-df32 timing at the headline bench config.
Prints results incrementally (no buffering) so progress is visible.
Usage: python scripts/tpu_measure.py [quick]
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

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"


def say(*a):
    print(*a, flush=True)


def timed_sweeps(model, W, label, n_timed=3, seed=1):
    keys = jax.random.split(jax.random.key(seed), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    t0 = time.perf_counter()
    states, obs = jax.block_until_ready(step(states))
    say(f"  [{label}] compile+warm {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    for _ in range(n_timed):
        states, obs = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    dev = np.asarray(states.green_dev)
    say(f"  [{label}] {W * n_timed * 2 / dt:8.1f} sweeps/s  "
        f"{dt / n_timed * 1e3:7.1f} ms/pair  "
        f"green_dev med {np.median(dev):.2e} max {dev.max():.2e}")
    return W * n_timed * 2 / dt


def sdw_compare(L, W):
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=(L >= 8),
                fermion_repr="native_pair")
    say(f"== SDW O(3) L={L} W={W} ==")
    m_rf = SDWModel(SDWConfig(**base))               # auto -> refine
    m_df = SDWModel(SDWConfig(**base, green_kernel="df32"))
    keys = jax.random.split(jax.random.key(1), W)
    st0 = jax.jit(jax.vmap(m_df.init_state))(keys)
    g_df = jax.block_until_ready(
        jax.jit(jax.vmap(m_df.refresh_from_field))(st0).G)
    g_rf = jax.block_until_ready(
        jax.jit(jax.vmap(m_rf.refresh_from_field))(st0).G)
    d = np.abs(np.asarray(g_df) - np.asarray(g_rf)).max()
    say(f"  refresh G diff refine-vs-df32: {d:.3e}")
    r = timed_sweeps(m_rf, W, f"refine L={L}")
    if not QUICK:
        timed_sweeps(m_df, W, f"df32   L={L}")
    return r


def sdw_delayed_compare(L, W, delays=(8, 16)):
    """Immediate vs delayed-chunk update kernel A/B at the bench config
    (native chain, refine green): the delayed kernel trades the per-site
    O(h^2) VPU update for O(h*Kq) corrections + MXU flushes."""
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=(L >= 8),
                fermion_repr="native_pair")
    say(f"== SDW O(3) L={L} W={W} update-kernel A/B ==")
    m_im = SDWModel(SDWConfig(**base))
    keys = jax.random.split(jax.random.key(1), W)
    st0 = jax.jit(jax.vmap(m_im.init_state))(keys)
    g_im = jax.block_until_ready(jax.jit(jax.vmap(
        lambda st: m_im.sweep_pair(st, measure=False)[0].G))(st0))
    r_im = timed_sweeps(m_im, W, f"immediate L={L}")
    for K in delays:
        m_dl = SDWModel(SDWConfig(**base, update_kernel="delayed",
                                  delay=K))
        g_dl = jax.block_until_ready(jax.jit(jax.vmap(
            lambda st: m_dl.sweep_pair(st, measure=False)[0].G))(st0))
        d = np.abs(np.asarray(g_im) - np.asarray(g_dl)).max()
        say(f"  one-pair G diff delayed(K={K})-vs-immediate: {d:.3e}")
        r_dl = timed_sweeps(m_dl, W, f"delayed K={K} L={L}")
        say(f"  speedup delayed(K={K})/immediate: {r_dl / r_im:.2f}x")


def hubbard_compare():
    from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel

    say("== Hubbard L=8 beta=8 W=256 ==")
    base = dict(L=8, U=4.0, beta=8.0, m=80, s=4, dtype="float32")
    m_rf = HubbardModel(HubbardConfig(**base, green_kernel="refine"))
    m_df = HubbardModel(HubbardConfig(**base))       # auto -> df32 kernel
    r1 = timed_sweeps(m_rf, 256, "refine", n_timed=5)
    r2 = timed_sweeps(m_df, 256, "df32", n_timed=5)
    say(f"  speedup refine/df32: {r1 / r2:.2f}x")


def sdw_cb_apply_compare(L=8, W=128):
    """cb_apply dense-vs-sparse A/B at the checkerboard bench config: the
    dense-product apply turns every kinetic apply (wraps + stack
    extensions) into one MXU matmul instead of 4 serial gather+axpy
    passes."""
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=True,
                fermion_repr="native_pair")
    say(f"== SDW O(3) L={L} W={W} cb_apply A/B ==")
    r_d = timed_sweeps(SDWModel(SDWConfig(**base)), W, "cb dense")
    r_s = timed_sweeps(SDWModel(SDWConfig(**base, cb_apply="sparse")), W,
                       "cb sparse")
    say(f"  speedup dense/sparse: {r_d / r_s:.2f}x")


def hubbard_cb_compare(W=256):
    """Checkerboard Hubbard at the headline shape: dense-product vs
    sparse apply (and both against the round-2 dense-exponential
    number in BASELINE.md)."""
    from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel

    say(f"== Hubbard L=8 beta=8 W={W} checkerboard cb_apply A/B ==")
    base = dict(L=8, U=4.0, beta=8.0, m=80, s=4, dtype="float32",
                checkerboard=True)
    r_d = timed_sweeps(HubbardModel(HubbardConfig(**base)), W, "cb dense",
                       n_timed=5)
    r_s = timed_sweeps(HubbardModel(HubbardConfig(**base,
                                                  cb_apply="sparse")), W,
                       "cb sparse", n_timed=5)
    say(f"  speedup dense/sparse: {r_d / r_s:.2f}x")


def sdw_walker_scaling(L=4, Ws=(128, 256, 512)):
    """Aggregate sweeps/s vs walker count on the native chain: the lane
    kernels pad to 128-lane groups, so W > 128 runs Gp > 1 grid steps —
    fixed per-call costs amortize until HBM/VMEM pressure bites."""
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=(L >= 8),
                fermion_repr="native_pair")
    say(f"== SDW O(3) L={L} walker scaling ==")
    model = SDWModel(SDWConfig(**base))
    for W in Ws:
        timed_sweeps(model, W, f"W={W}")


def main():
    say(jax.devices())
    sections = [
        ("sdw L=4", lambda: sdw_compare(4, 128)),
        ("sdw L=8", lambda: sdw_compare(8, 128)),
        ("hubbard", hubbard_compare),
        ("delayed L=8", lambda: sdw_delayed_compare(8, 128)),
        ("delayed L=4", lambda: sdw_delayed_compare(4, 128, delays=(8,))),
        ("cb_apply L=8", lambda: sdw_cb_apply_compare(8, 128)),
    ]
    if not QUICK:
        sections += [
            ("hubbard cb", hubbard_cb_compare),
            ("walker scaling", sdw_walker_scaling),
        ]
    failed = []
    for name, fn in sections:
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — keep the batch going
            import traceback

            say(f"!! section {name!r} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
            failed.append(name)
    say(f"batch done; failed sections: {failed or 'none'}")


if __name__ == "__main__":
    main()
