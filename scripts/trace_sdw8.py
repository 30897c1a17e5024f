"""Capture a jax.profiler trace of the SDW O(3) L=8 sweep_pair on the
chip, with a perfetto trace.json.gz for offline parsing (no tensorboard
needed: the gzipped JSON event list carries per-op device timings).

NOTE: on the remote-relay TPU (axon) this HANGS at start_trace — the
relay does not support device trace collection (observed 2026-08-19,
session 10). Use scripts/phase_sdw8b.py (direct phase micro-benchmarks)
for attribution there; keep this for real local TPU hosts.

Usage: python scripts/trace_sdw8.py [outdir] [L] [W]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache
compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel  # noqa: E402

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_sdw8"
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W = int(sys.argv[3]) if len(sys.argv) > 3 else 128


def main():
    model = SDWModel(SDWConfig(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                               dtype="float32", checkerboard=True))
    keys = jax.random.split(jax.random.key(1), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, measure=True)))
    t0 = time.perf_counter()
    states = jax.block_until_ready(step(states)[0])
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
    # warm pair outside the trace
    states = jax.block_until_ready(step(states)[0])
    jax.profiler.start_trace(outdir, create_perfetto_trace=True)
    states, _ = step(states)
    jax.block_until_ready(states.G)
    jax.profiler.stop_trace()
    dev = float(np.median(np.asarray(states.green_dev)))
    print(f"traced one pair -> {outdir}   green_dev med {dev:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
