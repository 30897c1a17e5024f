"""Column-lane REAL f32 upper-triangular inverse (batched).

Entry point for the Hubbard chain's mixed-precision refined green solve
(linalg/udv.inv_refined). The kernel body lives in the shared
real/complex template (pallas_trinv_common) — this module only adapts
the real (single-plane) calling convention. (Reference parity: the
stabilized Green inner solve, SURVEY.md §3 "DQMC core".)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from detqmc_tpu.linalg import pallas_trinv_common as _common


@functools.lru_cache(maxsize=None)
def _make_trinv(interpret: bool):
    @jax.custom_batching.custom_vmap
    def trinv(R):                                   # (Bt, n, n) f32
        (X,) = _common.call_batched(
            (jnp.swapaxes(R, -1, -2),), interpret=interpret)
        return X

    @trinv.def_vmap
    def _rule(axis_size, in_batched, R):
        if not in_batched[0]:
            R = jnp.broadcast_to(R[None], (axis_size, *R.shape))
        lead = R.shape[:-2]
        n = R.shape[-1]
        X = trinv(R.reshape(-1, n, n))
        return X.reshape(*lead, n, n), True

    return trinv


def trinv_big(R, *, interpret: bool = False):
    """X = R^{-1} for batched real upper-triangular matrices (..., n, n)
    f32, any n % 8 == 0. Column-lane layout: VMEM scales with the batch
    tile."""
    lead = R.shape[:-2]
    n = R.shape[-1]
    X = _make_trinv(interpret)(R.reshape(-1, n, n))
    return X.reshape(*lead, n, n)
