"""Measure the Hubbard beta=8 range-split inner conditioning + refine
viability on the chip.

Round 3 found the refined green diverged at Hubbard L=8 beta=8
(green_dev max ~4e6) while SDW converged; the suspected cause is inner
cond (median ~9e5) with a heavy anchor/walker tail. This script:
  1. equilibrates a few walkers on the chip (short sweep run),
  2. pulls the stabilization stacks to the host,
  3. computes each anchor pair's range-split inner matrix in fp64
     numpy (the exact _green_inner_real formula) and its cond,
  4. reports the cond distribution + the refined-solve (f32 QR +
     Newton-Schulz, simulated in numpy) error per anchor vs fp64.

This tells us which regime we're in: NS-refine converges (cond <~1e8,
f32 info preserved) or the f32 cast of the inner destroys the solve
(cond >~1e8 -> keep df32 kernels / need a structural split).

Usage: python scripts/hubbard_inner_cond.py [n_sweep_pairs] [W]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from detqmc_tpu import compile_cache

compile_cache.enable()

from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel  # noqa: E402

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
W = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    cfg = HubbardConfig(L=8, U=4.0, beta=8.0, m=80, s=4, dtype="float32")
    model = HubbardModel(cfg)
    keys = jax.random.split(jax.random.key(5), W)
    states = jax.jit(jax.vmap(model.init_state))(keys)
    step = jax.jit(jax.vmap(lambda st: model.sweep_pair(st, False)[0]))
    for _ in range(N_PAIRS):
        states = step(states)
    jax.block_until_ready(states.G)

    # host-side: stack entries -> per-anchor inner matrices in fp64
    U = np.asarray(states.stack.U, np.float64)   # (W, K+1, C, N, N)
    d = np.asarray(states.stack.d, np.float64)
    V = np.asarray(states.stack.V, np.float64)
    K = U.shape[1] - 1
    conds, errs, frozen = [], [], 0
    for w in range(W):
        for k in range(1, K):          # interior anchors (pair formula)
            for c in range(U.shape[2]):
                # left = entry k (B_ks..B_1), right_t = entry... the
                # sweep pairs left stack k against right stack k: use
                # (k, k) — representative of what _green sees
                U1, d1, V1 = U[w, k, c], d[w, k, c], V[w, k, c]
                U2, d2, V2 = U[w, k + 1, c], d[w, k + 1, c], V[w, k + 1, c]
                d1max, d1min = np.maximum(d1, 1), np.minimum(d1, 1)
                d2max, d2min = np.maximum(d2, 1), np.minimum(d2, 1)
                inner = ((U1.T @ U2) / d1max[:, None] / d2max[None, :]
                         + (V1 @ V2.T) * d1min[:, None] * d2min[None, :])
                s = np.linalg.svd(inner, compute_uv=False)
                cond = s[0] / max(s[-1], 1e-300)
                conds.append(cond)
                # simulated NS-refine in f32
                A32 = inner.astype(np.float32)
                Q, R = np.linalg.qr(A32)
                try:
                    Rinv = np.linalg.inv(R)
                except np.linalg.LinAlgError:
                    frozen += 1
                    continue
                Z = (Rinv @ Q.T).astype(np.float32)
                eye = np.eye(len(inner))
                froze = False
                for _ in range(3):
                    S = (eye - inner @ Z.astype(np.float64)
                         ).astype(np.float32)
                    if np.abs(S).max() >= 1.0:
                        froze = True
                        break
                    Z = (Z + Z @ S).astype(np.float32)
                frozen += froze
                Zex = np.linalg.inv(inner)
                errs.append(np.abs(Z - Zex).max() / np.abs(Zex).max())
    conds, errs = np.asarray(conds), np.asarray(errs)
    print(f"anchors={len(conds)} cond med {np.median(conds):.3e} "
          f"p90 {np.percentile(conds, 90):.3e} max {conds.max():.3e}")
    print(f"NS-refine rel err med {np.median(errs):.3e} "
          f"p90 {np.percentile(errs, 90):.3e} max {errs.max():.3e} "
          f"frozen {frozen}")


if __name__ == "__main__":
    main()
