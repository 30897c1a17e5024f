"""Measure the SDW science-regime (L=8, beta=8, opdim=3) range-split
inner conditioning at equilibrium + refine viability, on the chip.

Round 4 proved (Hubbard: initial-field cond 9e5 vs equilibrium 4.9e9)
that only an equilibrated on-chip measurement decides the
refine-vs-df32 routing. Every SDW number ever measured lives at beta=4
(inner cond ~2e4); the reference's science runs
(Gerlach-Schattner-Trebst-Berg, SURVEY.md §1; src/detsdwopdim.cpp) are
beta ~ 8-20. This script:
  1. equilibrates W walkers of the native-complex SDW chain at
     L=8 beta=8 m=80 on the chip (sweep pairs, no measurements),
  2. pulls the UdV stabilization stacks to the host,
  3. forms each interior anchor pair's range-split inner matrix in
     complex128 (the exact cudv._green_inner formula) and its cond,
  4. simulates the f32-QR + Newton refine in numpy per anchor and
     reports its converged error vs the exact inverse.

Verdict rule (BASELINE.md round 4): refine is viable while
cond * eps_f32 << 1 (cond <~ 1e6 comfortable); past ~1e8 the f32 cast
destroys the small singular values and df32 kernels are the design.

Usage: python scripts/sdw_inner_cond.py [n_sweep_pairs] [W] [s] [beta]
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

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
S = int(sys.argv[3]) if len(sys.argv) > 3 else 8
BETA = float(sys.argv[4]) if len(sys.argv) > 4 else 8.0


def _to_c128(x):
    """(…, 2, n, n) re/im pair or complex array -> complex128."""
    x = np.asarray(x)
    if x.ndim >= 3 and x.shape[-3] == 2 and not np.iscomplexobj(x):
        return x[..., 0, :, :].astype(np.float64) \
            + 1j * x[..., 1, :, :].astype(np.float64)
    return x.astype(np.complex128)


def main() -> None:
    m = int(round(BETA / 0.1))
    cfg = SDWConfig(L=8, opdim=3, r=0.5, beta=BETA, m=m, s=S,
                    dtype="float32", checkerboard=True)
    model = SDWModel(cfg)
    keys = jax.random.split(jax.random.key(11), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, False)[0]))
    t0 = time.time()
    for i in range(N_PAIRS):
        states = step(states)
        if i == 0:
            np.asarray(states.green_dev)
            print(f"compile+first pair {time.time() - t0:.0f}s",
                  flush=True)
    dev = np.asarray(states.green_dev)
    print(f"{N_PAIRS} pairs in {time.time() - t0:.0f}s; green_dev "
          f"med {np.median(dev):.2e} max {dev.max():.2e}", flush=True)

    U = _to_c128(states.stack_U)     # (W, K+1, n, n)
    d = np.asarray(states.stack_d, np.float64)
    V = _to_c128(states.stack_V)
    K = U.shape[1] - 1
    conds, errs, frozen = [], [], 0
    for w in range(W):
        for k in range(1, K):
            U1, d1, V1 = U[w, k], d[w, k], V[w, k]
            U2, d2, V2 = U[w, k + 1], d[w, k + 1], V[w, k + 1]
            d1max, d1min = np.maximum(d1, 1), np.minimum(d1, 1)
            d2max, d2min = np.maximum(d2, 1), np.minimum(d2, 1)
            inner = ((U1.conj().T @ U2) / d1max[:, None] / d2max[None, :]
                     + (V1 @ V2.conj().T) * d1min[:, None]
                     * d2min[None, :])
            sv = np.linalg.svd(inner, compute_uv=False)
            cond = sv[0] / max(sv[-1], 1e-300)
            conds.append(cond)
            # simulated f32-seeded Newton refine (the refine kernel's
            # math: f32 QR factorization seed + f64-residual updates)
            A32 = inner.astype(np.complex64)
            Q, R = np.linalg.qr(A32)
            try:
                Rinv = np.linalg.inv(R)
            except np.linalg.LinAlgError:
                frozen += 1
                continue
            Z = (Rinv @ Q.conj().T).astype(np.complex64)
            eye = np.eye(len(inner))
            froze = False
            for _ in range(3):
                Sm = (eye - inner @ Z.astype(np.complex128)
                      ).astype(np.complex64)
                if np.abs(Sm).max() >= 1.0:
                    froze = True
                    break
                Z = (Z + Z @ Sm).astype(np.complex64)
            frozen += froze
            Zex = np.linalg.inv(inner)
            errs.append(np.abs(Z - Zex).max() / np.abs(Zex).max())
    conds, errs = np.asarray(conds), np.asarray(errs)
    print(f"anchors={len(conds)} cond med {np.median(conds):.3e} "
          f"p90 {np.percentile(conds, 90):.3e} max {conds.max():.3e}")
    if len(errs):
        print(f"f32-refine rel err med {np.median(errs):.3e} "
              f"p90 {np.percentile(errs, 90):.3e} max {errs.max():.3e} "
              f"frozen {frozen}")


if __name__ == "__main__":
    main()
