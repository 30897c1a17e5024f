"""Complex-pair matrix helpers: (re, im) stacked in a leading axis 2.

The axon TPU backend implements no complex ops, and the real embedding
rho(M) = [[Re, -Im], [Im, Re]] costs 2x arithmetic and destroys the
complex structure at the first real QR. The SDW native-complex chain
(models/sdw.py, chain_repr="native") therefore carries every complex
matrix as a real array with a leading re/im axis: X[0] = Re, X[1] = Im.
These helpers are the XLA-level ops of that representation; the
factorization kernels live in pallas_cqr_lanes / pallas_cgreen_lanes.

Complex matmuls cost 4 real matmuls of HALF the embedded dimension —
half the embedded flops; the f64-island products route each part
through the exact bf16-limb Ozaki path (linalg/ozaki).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from detqmc_tpu.precision import mm


def pack(re, im):
    return jnp.stack([re, im], axis=0)


def cmm(A, B, mm_fn=mm):
    """(2, n, k) @ (2, k, m) complex product -> (2, n, m)."""
    re = mm_fn(A[0], B[0]) - mm_fn(A[1], B[1])
    im = mm_fn(A[0], B[1]) + mm_fn(A[1], B[0])
    return jnp.stack([re, im], axis=0)


def cmm_f64(A, B):
    from detqmc_tpu.linalg.ozaki import mm_f64

    return cmm(A, B, mm_fn=mm_f64)


def conjT(A):
    """Conjugate transpose of a pair matrix."""
    return jnp.stack([jnp.swapaxes(A[0], -1, -2),
                      -jnp.swapaxes(A[1], -1, -2)], axis=0)


def to_rho(A):
    """Pair -> real embedding [[re, -im], [im, re]] (2n x 2n)."""
    top = jnp.concatenate([A[0], -A[1]], axis=-1)
    bot = jnp.concatenate([A[1], A[0]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def from_rho(M):
    """Real embedding -> pair (projects onto the rho manifold by reading
    the (Re, Im) quadrants; exact for exactly-embedded inputs)."""
    h = M.shape[-1] // 2
    return jnp.stack([M[..., :h, :h], M[..., h:, :h]], axis=0)


def ceye(n, dtype, batch_shape=()):
    re = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (*batch_shape, n, n))
    return jnp.stack([re, jnp.zeros_like(re)], axis=0)


def scale_rows(s, A):
    """diag(s) @ A for REAL s: scales both parts."""
    return s[None, ..., :, None] * A


def scale_cols(A, s):
    return A * s[None, ..., None, :]
