"""Headline benchmark: DQMC sweeps/sec/chip, 8x8 Hubbard at beta=8.

Matches BASELINE.md's driver-defined target: full sweep pairs (up+down,
every site Metropolis-updated, QR/UdV stabilization every s slices,
measurements on) batched over vmapped walkers on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": sweeps/sec/chip, "unit": "sweeps/s",
   "vs_baseline": value / single-core-C++-equivalent}

The baseline denominator is the single-core fp64 CPU implementation in
native/baseline (same algorithm: dense wraps, rank-1 SM updates, QR
stabilization), measured on this machine — see BASELINE.md. A sweep here
= one full pass over all m time slices (reference semantics).
"""

from __future__ import annotations

import json
import time

import jax

from detqmc_tpu import compile_cache
compile_cache.enable()
import numpy as np

from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel

# single-core C++ baseline (native/baseline/dqmc_baseline.cpp) measured on
# this machine; see BASELINE.md "Measured baseline denominator".
# (Re-measured 2026-08-19 on an idle machine — the earlier 25.5 was
# depressed by background load; the honest denominator is the best the
# baseline achieves.)
BASELINE_SWEEPS_PER_SEC = 27.2

L, BETA, M, S = 8, 8.0, 80, 4
N_WALKERS = 256
N_TIMED_PAIRS = 5

# BASELINE.json config #3: the O(3) SDW metal (detqmcsdw path). The
# denominators are native/baseline/sdw_baseline.cpp — a single-core fp64
# C++ implementation of the same full-complex opdim-3 algorithm (zgemm
# wraps, rank-4 Woodbury updates, complex QR/UdV stabilization),
# selftest-pinned to the model's G at 1e-12 (tests/test_sdw_baseline.py)
# and measured on this machine (BASELINE.md). Two sizes: L=4 and the
# science-scale L=8 (complex dim 256; the SDW papers run L = 8-14) —
# both on the native-complex chain (complex QR + complex df32 green
# kernels, rolled/chunked fused update kernel, L=8 adds checkerboard).
SDW_L, SDW_BETA, SDW_M, SDW_S, SDW_W = 4, 4.0, 40, 4, 128
# idle-machine re-measurement 2026-08-19 (earlier 52.6 / 1.58 were
# load-depressed). The L=8 line runs s=8 (the session-10 stabilization
# scan: dev med 2.2e-5, 5x gate headroom, 1.42x over s=4; f32-vs-f64
# ensemble bias validated at s=8 — BASELINE.md) and is divided by the
# C++ baseline at the SAME s.
SDW_BASELINE_SWEEPS_PER_SEC = {4: 67.6, 8: 3.41}
SDW8_S = 8
# W=128 fills the 128-lane kernels (W=64 padded them to half occupancy;
# the fused update kernel's cost is W-independent up to 128 lanes).
# Memory: ~17 MB/walker * 128 ~ 2.2 GB << 16 GB HBM.
SDW8_W = 128


def _bench_hubbard():
    cfg = HubbardConfig(L=L, U=4.0, beta=BETA, m=M, s=S, dtype="float32")
    model = HubbardModel(cfg)
    keys = jax.random.split(jax.random.key(0), N_WALKERS)
    states = jax.jit(jax.vmap(model.init_state))(keys)

    def block(sts):
        def body(s_, _):
            s_, obs = model.sweep_pair(s_, measure=True)
            return s_, obs.occupancy
        sts, occ = jax.lax.scan(body, sts, None, length=N_TIMED_PAIRS)
        return sts, occ

    step = jax.jit(jax.vmap(block))
    states, occ = jax.block_until_ready(step(states))  # compile + warmup

    t0 = time.perf_counter()
    states, occ = jax.block_until_ready(step(states))
    dt = time.perf_counter() - t0

    sweeps = N_WALKERS * N_TIMED_PAIRS * 2  # pair = 2 sweeps
    value = sweeps / dt
    # sanity: physics must hold or the number is meaningless
    occ_mean = float(np.asarray(occ).mean())
    assert abs(occ_mean - 1.0) < 1e-3, f"unphysical occupancy {occ_mean}"
    # green_dev is the wrapped-vs-freshly-stabilized drift *before* each
    # replacement; the measured G is always the stabilized one (~1e-5
    # accurate via the df32 kernel). The walker median gates the run; the
    # max has a sporadic tail from near-singular Metropolis ratios.
    # Measured median ~1.8e-3 at beta=8: the 6e-3 gate catches any >~3x
    # stabilization regression.
    dev_med = float(np.median(np.asarray(states.green_dev)))
    assert dev_med < 6e-3, f"stabilization broken: green_dev={dev_med}"
    return value


def _bench_sdw_o3(L, W, n_timed=3, checkerboard=False,
                  green_kernel="auto", s=SDW_S):
    from detqmc_tpu.models.sdw import SDWConfig, SDWModel

    cfg = SDWConfig(L=L, opdim=3, r=0.5, beta=SDW_BETA, m=SDW_M,
                    s=s, dtype="float32", checkerboard=checkerboard,
                    green_kernel=green_kernel)
    model = SDWModel(cfg)
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    states, obs = jax.block_until_ready(step(states))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n_timed):
        states, obs = step(states)
    jax.block_until_ready(states.G)
    dt = time.perf_counter() - t0
    value = W * n_timed * 2 / dt
    dev_med = float(np.median(np.asarray(states.green_dev)))
    assert dev_med < 1e-4, f"SDW stabilization broken: green_dev={dev_med}"
    assert np.isfinite(float(np.asarray(obs.phiSquared).mean()))
    return value


def _sdw_with_fallback(L, W, **kw):
    """Native auto = the refined mixed-precision solve; if it fails on
    this chip (compile or accuracy gate), fall back to the df32 kernels
    — a bench number always lands."""
    try:
        return _bench_sdw_o3(L, W, **kw)
    except Exception as e:  # noqa: BLE001 — any failure falls back
        import sys

        print(f"# refine path failed at L={L} ({type(e).__name__}); "
              "falling back to green_kernel=df32", file=sys.stderr)
        return _bench_sdw_o3(L, W, green_kernel="df32", **kw)


def main() -> None:
    value = _bench_hubbard()
    sdw_value = _sdw_with_fallback(SDW_L, SDW_W)
    sdw8_value = _sdw_with_fallback(8, SDW8_W, checkerboard=True,
                                    s=SDW8_S)

    print(json.dumps({
        "metric": f"hubbard_L{L}_beta{int(BETA)}_sweeps_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(value / BASELINE_SWEEPS_PER_SEC, 2),
        f"sdw_o3_L{SDW_L}_beta{int(SDW_BETA)}_sweeps_per_sec": round(
            sdw_value, 2),
        f"sdw_o3_L{SDW_L}_vs_baseline": round(
            sdw_value / SDW_BASELINE_SWEEPS_PER_SEC[SDW_L], 2),
        f"sdw_o3_L8_beta{int(SDW_BETA)}_sweeps_per_sec": round(
            sdw8_value, 2),
        "sdw_o3_L8_vs_baseline": round(
            sdw8_value / SDW_BASELINE_SWEEPS_PER_SEC[8], 2),
    }))


if __name__ == "__main__":
    main()
