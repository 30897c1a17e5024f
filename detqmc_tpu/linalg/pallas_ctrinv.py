"""Column-lane COMPLEX f32 upper-triangular inverse (batched).

Entry point for the mixed-precision "refined" stabilization solve
(linalg/cudv.cinv_refined): the green inner matrix is factored ONCE in
plain f32 by the complex QR kernels and this inverts the resulting R,
so Z_{k+1} = Z_k + R^{-1} Q^H (I - A Z_k) turns every refinement step
into MXU matmuls. The kernel body lives in the shared real/complex
template (pallas_trinv_common) — this module only adapts the (re, im)
pair calling convention. (Reference parity: the stabilized Green inner
solve, SURVEY.md §3 "DQMC core" / expected src/detmodelgc.h
greenFromUdV.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from detqmc_tpu.linalg import pallas_trinv_common as _common


@functools.lru_cache(maxsize=None)
def _make_ctrinv(interpret: bool):
    @jax.custom_batching.custom_vmap
    def ctrinv(R):                                  # (Bt, 2, n, n) f32
        Xr, Xi = _common.call_batched(
            (jnp.swapaxes(R[:, 0], -1, -2),
             jnp.swapaxes(R[:, 1], -1, -2)), interpret=interpret)
        return jnp.stack([Xr, Xi], axis=1)

    @ctrinv.def_vmap
    def _rule(axis_size, in_batched, R):
        if not in_batched[0]:
            R = jnp.broadcast_to(R[None], (axis_size, *R.shape))
        lead = R.shape[:-3]
        n = R.shape[-1]
        X = ctrinv(R.reshape(-1, 2, n, n))
        return X.reshape(*lead, 2, n, n), True

    return ctrinv


def ctrinv_big(R, *, interpret: bool = False):
    """X = R^{-1} for batched upper-triangular pair matrices
    (..., 2, n, n) f32, any n % 8 == 0. Column-lane layout: VMEM scales
    with the batch tile."""
    lead = R.shape[:-3]
    n = R.shape[-1]
    X = _make_ctrinv(interpret)(R.reshape(-1, 2, n, n))
    return X.reshape(*lead, 2, n, n)
