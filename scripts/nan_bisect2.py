"""On-chip bisect for the TPU-jit NaN in vmapped SDW refresh_from_field.

tpu_measure.sdw_compare observed: init_state (which itself ends in
refresh_from_field) is finite at W=128, but a separate
jit(vmap(refresh_from_field)) on the resulting states returns NaN G —
same phi, different compiled program. This script reproduces that exact
call at the failing shape and then bisects by stage inside the same
vmapped-program structure, reporting per-walker finiteness so we can see
whether the poison is all-walkers (program bug) or data-dependent.

Usage: python scripts/nan_bisect2.py [L] [W] [cpu]
(the trailing "cpu" runs the same f32 program with the kernels in
interpret mode — sitecustomize pre-registers the axon plugin, so
JAX_PLATFORMS env is ignored and we must config.update before use)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from detqmc_tpu import compile_cache
compile_cache.enable()

from detqmc_tpu.models.sdw import SDWConfig, SDWModel
from detqmc_tpu.linalg.udv import UDV

L = int(sys.argv[1]) if len(sys.argv) > 1 else 4
W = int(sys.argv[2]) if len(sys.argv) > 2 else 128

base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
            dtype="float32", checkerboard=(L >= 8),
            fermion_repr="native_pair")
model = SDWModel(SDWConfig(**base, green_kernel="df32"))


def say(*a):
    print(*a, flush=True)


def walkers_nonfinite(x, name):
    a = np.asarray(x)
    bad = ~np.isfinite(a).reshape(a.shape[0], -1).all(axis=1)
    say(f"  {name}: {bad.sum()}/{a.shape[0]} walkers non-finite"
        + (f"  (first bad: {np.nonzero(bad)[0][:8].tolist()})" if bad.any() else ""))
    return bad


say("backend:", jax.default_backend(), jax.devices())

keys = jax.random.split(jax.random.key(1), W)
st0 = jax.block_until_ready(jax.jit(jax.vmap(model.init_state))(keys))
say("== init_state (nested refresh) ==")
bad0 = walkers_nonfinite(st0.G, "st0.G")
walkers_nonfinite(st0.stack_d, "st0.stack_d")

say("== standalone jit(vmap(refresh_from_field)) ==")
st1 = jax.block_until_ready(jax.jit(jax.vmap(model.refresh_from_field))(st0))
bad1 = walkers_nonfinite(st1.G, "st1.G")
walkers_nonfinite(st1.stack_d, "st1.stack_d")
walkers_nonfinite(st1.stack_U, "st1.stack_U")
walkers_nonfinite(st1.stack_V, "st1.stack_V")

if not bad1.any():
    say("standalone refresh FINITE — NaN did not reproduce; exiting")
    sys.exit(0)

say("== stage bisect (same vmap+jit structure, phi from st0) ==")
phi = st0.phi


def stage_stack(phi_):
    st = model._build_right_stack(phi_)
    return st.U, st.d, st.V


U, d, V = jax.block_until_ready(jax.jit(jax.vmap(stage_stack))(phi))
walkers_nonfinite(U, "stack.U")
badd = walkers_nonfinite(d, "stack.d")
walkers_nonfinite(V, "stack.V")


def stage_green(U0, d0, V0):
    return model._green(model._eye_mixed(), UDV(U0, d0, V0))


G = jax.block_until_ready(
    jax.jit(jax.vmap(stage_green))(U[:, 0], d[:, 0], V[:, 0]))
badg = walkers_nonfinite(G, "green(eye, stack[0])")

if badg.any():
    w = int(np.nonzero(badg)[0][0])
    say(f"== walker {w}: green NaN — dump inner pieces ==")
    np.save("/tmp/nan_U0.npy", np.asarray(U[w, 0]))
    np.save("/tmp/nan_d0.npy", np.asarray(d[w, 0]))
    np.save("/tmp/nan_V0.npy", np.asarray(V[w, 0]))
    say("  d0 range:", float(np.asarray(d[w, 0]).min()),
        float(np.asarray(d[w, 0]).max()))
    # single-walker jit (no vmap): does the same data NaN without vmap?
    G1 = jax.block_until_ready(
        jax.jit(stage_green)(U[w, 0], d[w, 0], V[w, 0]))
    say("  single-walker jit finite:", bool(np.isfinite(np.asarray(G1)).all()))
    # vmap over just the bad walker replicated 128x
    Gr = jax.block_until_ready(jax.jit(jax.vmap(stage_green))(
        jnp.broadcast_to(U[w, 0], U[:, 0].shape),
        jnp.broadcast_to(d[w, 0], d[:, 0].shape),
        jnp.broadcast_to(V[w, 0], V[:, 0].shape)))
    walkers_nonfinite(Gr, "replicated-bad-walker green")
    # Ozaki discrimination: env is read at trace time, so a fresh lambda
    # forces a retrace with the emulated-f64 path instead
    os.environ["DETQMC_TPU_NO_OZAKI"] = "1"
    Gn = jax.block_until_ready(
        jax.jit(jax.vmap(lambda a, b, c: stage_green(a, b, c)))(
            U[:, 0], d[:, 0], V[:, 0]))
    del os.environ["DETQMC_TPU_NO_OZAKI"]
    walkers_nonfinite(Gn, "green with NO_OZAKI (emulated f64)")
elif badd.any():
    say("NaN enters in the stack build — bisect the refactor scan next")
else:
    say("stages finite in isolation — NaN needs full refresh program; "
        "bisect by replacing _green with identity next")
say("done")
